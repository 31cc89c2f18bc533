"""
Quality trimming, poly-A trimming and expected-error computation
(host implementations; batched device kernels live in
:mod:`cutadapt_tpu.ops.qualtrim_batch`).

Semantics follow the reference engine
(/root/reference/src/cutadapt/qualtrim.pyx and expected_errors.h):

- quality_trim_index: the BWA algorithm — from each end, accumulate
  cutoff - (q - base), stop when the partial sum drops below zero, and
  cut at the position of the maximal partial sum.
- nextseq_trim_index: same for the 3' end, but G bases count as
  quality cutoff-1 (two-color dark-cycle artifacts).
- poly_a_trim_index: score scan (+1 for A / T-head, -2 otherwise) with
  a 0.2 maximum error rate and minimum tail length 3.
- expected_errors: sum of phred error probabilities.
"""

from typing import Tuple


class HasNoQualities(Exception):
    pass


def quality_trim_index(
    qualities: str, cutoff_front: int, cutoff_back: int, base: int = 33
) -> Tuple[int, int]:
    """Return (start, stop) of the good-quality segment."""
    if qualities is None:
        raise HasNoQualities(
            "Cannot do quality trimming when no qualities are available"
        )
    n = len(qualities)
    start = 0
    stop = n

    # 5' end
    s = 0
    max_qual = 0
    for i in range(n):
        s += cutoff_front - (ord(qualities[i]) - base)
        if s < 0:
            break
        if s > max_qual:
            max_qual = s
            start = i + 1

    # 3' end
    s = 0
    max_qual = 0
    for i in reversed(range(n)):
        s += cutoff_back - (ord(qualities[i]) - base)
        if s < 0:
            break
        if s > max_qual:
            max_qual = s
            stop = i
    if start >= stop:
        start, stop = 0, 0
    return (start, stop)


def nextseq_trim_index(sequence, cutoff: int, base: int = 33) -> int:
    """3' quality trim for two-color chemistry (G = dark cycle)."""
    bases = sequence.sequence
    qualities = sequence.qualities
    if qualities is None:
        raise HasNoQualities()
    s = 0
    max_qual = 0
    max_i = len(qualities)
    for i in reversed(range(max_i)):
        q = ord(qualities[i]) - base
        if bases[i] == "G":
            q = cutoff - 1
        s += cutoff - q
        if s < 0:
            break
        if s > max_qual:
            max_qual = s
            max_i = i
    return max_i


def poly_a_trim_index(s: str, revcomp: bool = False) -> int:
    """Start index of the poly-A tail (or end of poly-T head if revcomp).

    Tails/heads shorter than 3 are ignored; maximum error rate 0.2.
    """
    n = len(s)
    best_score = 0
    score = 0
    errors = 0
    if revcomp:
        best_index = 0
        for i in range(n):
            if s[i] == "T":
                score += 1
            else:
                score -= 2
                errors += 1
            if score > best_score and errors * 5 <= i + 1:
                best_score = score
                best_index = i + 1
        if best_index < 3:
            best_index = 0
    else:
        best_index = n
        for i in reversed(range(n)):
            if s[i] == "A":
                score += 1
            else:
                score -= 2
                errors += 1
            if score > best_score and errors * 5 <= n - i:
                best_score = score
                best_index = i
        if best_index > n - 3:
            best_index = n
    return best_index


# Phred score -> error probability, for scores 0..93.
_SCORE_TO_ERROR_RATE = [10 ** (-q / 10) for q in range(94)]


def expected_errors(qualities: str, base: int = 33) -> float:
    """
    Number of expected errors from ASCII-encoded qualities, following
    Edgar et al. (2015), section 2.2.
    """
    max_phred = 126 - base
    table = _SCORE_TO_ERROR_RATE
    n = len(qualities)
    # Four-lane accumulation (matches the reference's float summation
    # order exactly, expected_errors.h:103-140).
    e0 = e1 = e2 = e3 = 0.0
    i = 0
    while i + 4 <= n:
        p0 = ord(qualities[i]) - base
        p1 = ord(qualities[i + 1]) - base
        p2 = ord(qualities[i + 2]) - base
        p3 = ord(qualities[i + 3]) - base
        if (
            p0 < 0 or p0 > max_phred
            or p1 < 0 or p1 > max_phred
            or p2 < 0 or p2 > max_phred
            or p3 < 0 or p3 > max_phred
        ):
            _raise_bad_phred(qualities, base)
        e0 += table[p0]
        e1 += table[p1]
        e2 += table[p2]
        e3 += table[p3]
        i += 4
    while i < n:
        phred = ord(qualities[i]) - base
        if phred < 0 or phred > max_phred:
            _raise_bad_phred(qualities, base)
        e0 += table[phred]
        i += 1
    return e0 + e1 + e2 + e3


def _raise_bad_phred(qualities: str, base: int):
    for q in qualities:
        if ord(q) < base or ord(q) > 126:
            raise ValueError(
                f"Not a valid phred value {ord(q)} for character {q}"
            )
    raise ValueError("Invalid phred values")
