"""
Semi-global hybrid cost/score alignment (host reference implementation).

This module provides the exact matching semantics of the reference
engine's alignment kernel (/root/reference/src/cutadapt/_align.pyx):

- unit-cost edit distance fills the DP matrix (configurable indel cost),
- a parallel score (match +1, mismatch -1, indel -2) and an ``origin``
  (where the alignment started) are carried through the DP,
- semi-global behaviour is controlled with four EndSkip flags,
- Ukkonen's trick restricts each column to the prefix whose costs can
  still be at most k,
- candidates are collected from the last row (in column order, leftmost
  first) and from the last column (bottom up), with the reference's
  exact acceptance and preference rules.

The scalar implementation here is the *oracle*: it is used for small
inputs, for index construction and for validating the batched
JAX/Pallas kernels in :mod:`cutadapt_tpu.ops`, which implement the same
mathematics over padded read batches.
"""

from enum import IntFlag
from typing import Iterator, Optional, Tuple

from .ops.tables import ACGT_TABLE, IUPAC_TABLE, UPPER_TABLE, translate

__all__ = [
    "EndSkip",
    "Aligner",
    "PrefixComparer",
    "SuffixComparer",
    "hamming_sphere",
    "hamming_environment",
    "edit_environment",
    "edit_distance",
    "naive_edit_environment",
    "slow_edit_environment",
    "py_edit_environment",
]

MATCH_SCORE = 1
MISMATCH_SCORE = -1
INSERTION_SCORE = -2
DELETION_SCORE = -2


class EndSkip(IntFlag):
    """Which ends of reference/query may be skipped at no cost.

    Setting all four flags yields standard semiglobal alignment.
    (Reference: src/cutadapt/align.py:24-34)
    """

    REFERENCE_START = 1  # a prefix of the reference may be skipped at no cost
    QUERY_START = 2  # a prefix of the query may be skipped at no cost
    REFERENCE_END = 4  # a suffix of the reference may be skipped at no cost
    QUERY_STOP = 8  # a suffix of the query may be skipped at no cost
    SEMIGLOBAL = 15


class DPMatrix:
    """Full DP matrix representation, only populated in debug mode."""

    def __init__(self, reference: str, query: str):
        m = len(reference)
        n = len(query)
        self._rows = [[None] * (n + 1) for _ in range(m + 1)]
        self.reference = reference
        self.query = query

    def set_entry(self, i: int, j: int, cost) -> None:
        self._rows[i][j] = cost

    def __str__(self):
        rows = ["     " + " ".join(c.rjust(2) for c in self.query)]
        for c, row in zip(" " + self.reference, self._rows):
            r = c + " " + " ".join(
                "  " if v is None else "{:2d}".format(v) for v in row
            )
            rows.append(r)
        return "\n".join(rows)


class Aligner:
    """
    Find a full or partial occurrence of a query within a reference,
    allowing errors, with the reference engine's exact semantics
    (see module docstring; reference: _align.pyx:93-591).

    locate(query) returns
    (ref_start, ref_stop, query_start, query_stop, score, errors)
    or None if there is no acceptable match.
    """

    def __init__(
        self,
        reference: str,
        max_error_rate: float,
        flags: int = 15,
        wildcard_ref: bool = False,
        wildcard_query: bool = False,
        indel_cost: int = 1,
        min_overlap: int = 1,
    ):
        self.max_error_rate = float(max_error_rate)
        flags = int(flags)
        self.start_in_reference = bool(flags & 1)
        self.start_in_query = bool(flags & 2)
        self.stop_in_reference = bool(flags & 4)
        self.stop_in_query = bool(flags & 8)
        self.wildcard_ref = bool(wildcard_ref)
        self.wildcard_query = bool(wildcard_query)
        self._min_overlap = int(min_overlap)
        self.debug = False
        self._dpmatrix: Optional[DPMatrix] = None
        self._scorematrix: Optional[DPMatrix] = None
        if indel_cost < 1:
            raise ValueError("indel_cost must be at least 1")
        self._insertion_cost = int(indel_cost)
        self._deletion_cost = int(indel_cost)
        self._set_reference(reference)
        # C++ fast path for the per-read hot loop (exact same results;
        # the Python implementation below remains the debug-mode path
        # and the porting oracle)
        self._native = None
        from . import native as _native_mod

        if _native_mod.AVAILABLE:
            self._native = _native_mod.ScalarAligner(
                self._reference,
                self.n_counts,
                self.effective_length,
                self.max_error_rate,
                self._compute_flags(),
                not (self.wildcard_ref or self.wildcard_query),
                self.wildcard_ref,
                self._insertion_cost,
                self._min_overlap,
            )

    def _compute_flags(self) -> int:
        flags = 0
        if self.start_in_reference:
            flags |= 1
        if self.start_in_query:
            flags |= 2
        if self.stop_in_reference:
            flags |= 4
        if self.stop_in_query:
            flags |= 8
        return flags

    def __reduce__(self):
        return (
            Aligner,
            (
                self.reference,
                self.max_error_rate,
                self._compute_flags(),
                self.wildcard_ref,
                self.wildcard_query,
                self._insertion_cost,
                self._min_overlap,
            ),
        )

    def __repr__(self):
        return (
            f"Aligner(reference='{self.reference}', max_error_rate={self.max_error_rate}, "
            f"flags={self._compute_flags()}, wildcard_ref={self.wildcard_ref}, "
            f"wildcard_query={self.wildcard_query}, indel_cost={self._insertion_cost}, "
            f"min_overlap={self._min_overlap})"
        )

    def _set_reference(self, reference: str) -> None:
        self.m = m = len(reference)
        self.effective_length = m
        # n_counts[i] == number of N characters in reference[:i]
        n_counts = [0] * (m + 1)
        count = 0
        for i, ch in enumerate(reference):
            n_counts[i] = count
            if ch in "nN":
                count += 1
        n_counts[m] = count
        self.n_counts = n_counts
        if self.wildcard_ref:
            self.effective_length = m - count
            if self.effective_length == 0:
                raise ValueError("Cannot have only N wildcards in the sequence")
            self._reference = translate(reference, IUPAC_TABLE)
        elif self.wildcard_query:
            self._reference = translate(reference, ACGT_TABLE)
        else:
            self._reference = reference.encode("ascii")
        self.reference = reference

    @property
    def dpmatrix(self):
        return self._dpmatrix

    @property
    def scorematrix(self):
        return self._scorematrix

    def enable_debug(self) -> None:
        """Store the DP matrices during locate() for inspection."""
        self.debug = True

    def locate(
        self, query: str
    ) -> Optional[Tuple[int, int, int, int, int, int]]:
        if self.wildcard_query:
            s2 = translate(query, IUPAC_TABLE)
        elif self.wildcard_ref:
            s2 = translate(query, ACGT_TABLE)
        else:
            s2 = translate(query, UPPER_TABLE)
        if self._native is not None and not self.debug:
            return self._native.locate(s2)
        return self._locate_py(query, s2)

    def _locate_py(
        self, query: str, s2: bytes
    ) -> Optional[Tuple[int, int, int, int, int, int]]:
        s1 = self._reference
        m = self.m
        n = len(query)
        max_error_rate = self.max_error_rate
        stop_in_query = self.stop_in_query
        compare_ascii = not (self.wildcard_ref or self.wildcard_query)

        # maximum number of errors (note: truncating conversion)
        k = int(max_error_rate * m)

        # Determine largest and smallest column we need to compute.
        max_n = n
        min_n = 0
        if not self.start_in_query:
            # costs can only get worse after column m + k
            max_n = min(n, m + k)
        if not self.stop_in_query:
            min_n = max(0, n - m - k)

        deletion_cost = self._deletion_cost
        insertion_cost = self._insertion_cost

        # Fill column min_n. Four cases depending on which starts are free.
        cost = [0] * (m + 1)
        score = [0] * (m + 1)
        origin = [0] * (m + 1)
        if not self.start_in_reference and not self.start_in_query:
            for i in range(m + 1):
                score[i] = i * DELETION_SCORE
                cost[i] = max(i, min_n) * deletion_cost
                origin[i] = 0
        elif self.start_in_reference and not self.start_in_query:
            for i in range(m + 1):
                score[i] = 0
                cost[i] = min_n * deletion_cost
                origin[i] = min(0, min_n - i)
        elif not self.start_in_reference and self.start_in_query:
            for i in range(m + 1):
                score[i] = i * DELETION_SCORE
                cost[i] = i * deletion_cost
                origin[i] = max(0, min_n - i)
        else:
            for i in range(m + 1):
                score[i] = 0
                cost[i] = min(i, min_n) * deletion_cost
                origin[i] = min_n - i

        if self.debug:
            self._dpmatrix = DPMatrix(self.reference, query)
            self._scorematrix = DPMatrix(self.reference, query)
            for i in range(m + 1):
                self._dpmatrix.set_entry(i, min_n, cost[i])
                self._scorematrix.set_entry(i, min_n, score[i])

        best_ref_stop = m
        best_query_stop = n
        best_cost = m + n + 1
        best_origin = 0
        best_score = 0

        # Ukkonen's trick: index of the last cell whose cost is at most k
        last = min(m, k + 1)
        if self.start_in_reference:
            last = m

        last_filled_i = 0
        origin_increment = 1 if self.start_in_query else 0
        insertion_cost_increment = 0 if self.start_in_query else insertion_cost
        insertion_score_increment = 0 if self.start_in_query else INSERTION_SCORE
        # Mirrors the (possibly stale) local `origin` variable of the
        # reference kernel, which the final-column scan reads without
        # refreshing (_align.pyx:565).
        cur_origin = 0

        for j in range(min_n + 1, max_n + 1):
            # remember first entry before overwriting
            diag_cost = cost[0]
            diag_score = score[0]
            diag_origin = origin[0]

            origin[0] += origin_increment
            cost[0] += insertion_cost_increment
            score[0] += insertion_score_increment
            qc = s2[j - 1]
            for i in range(1, last + 1):
                if compare_ascii:
                    characters_equal = s1[i - 1] == qc
                else:
                    characters_equal = (s1[i - 1] & qc) != 0
                if characters_equal:
                    # Characters match: costs for insertion and deletion
                    # are at least as high, so only inherit the diagonal.
                    cur_cost = diag_cost
                    cur_origin = diag_origin
                    cur_score = diag_score + MATCH_SCORE
                else:
                    cost_diag = diag_cost + 1
                    cost_insertion = cost[i] + insertion_cost
                    cost_deletion = cost[i - 1] + deletion_cost
                    if cost_diag <= cost_deletion and cost_diag <= cost_insertion:
                        # MISMATCH
                        cur_cost = cost_diag
                        cur_origin = diag_origin
                        cur_score = diag_score + MISMATCH_SCORE
                    elif cost_deletion <= cost_insertion:
                        # DELETION
                        cur_cost = cost_deletion
                        cur_origin = origin[i - 1]
                        cur_score = score[i - 1] + DELETION_SCORE
                    else:
                        # INSERTION
                        cur_cost = cost_insertion
                        cur_origin = origin[i]
                        cur_score = score[i] + INSERTION_SCORE

                diag_cost = cost[i]
                diag_score = score[i]
                diag_origin = origin[i]

                cost[i] = cur_cost
                origin[i] = cur_origin
                score[i] = cur_score
            last_filled_i = last
            if self.debug:
                for i in range(last + 1):
                    self._dpmatrix.set_entry(i, j, cost[i])
                    self._scorematrix.set_entry(i, j, score[i])
            while last >= 0 and cost[last] > k:
                last -= 1
            if last < m:
                last += 1
            elif stop_in_query:
                # Found a candidate in the last row.
                cand_cost = cost[m]
                cand_score = score[m]
                cand_origin = origin[m]
                cur_origin = cand_origin
                length = m + min(cand_origin, 0)
                cur_effective_length = length
                if self.wildcard_ref:
                    if length < m:
                        # Only count the matching part of the reference.
                        cur_effective_length = length - (
                            self.n_counts[m] - self.n_counts[m - length]
                        )
                    else:
                        cur_effective_length = self.effective_length
                is_acceptable = (
                    length >= self._min_overlap
                    and cand_cost <= cur_effective_length * max_error_rate
                )
                best_length = m + min(best_origin, 0)
                # Update if this is the first occurrence, or it overlaps
                # the previous best sufficiently with a higher score, or
                # it is longer with a higher score.
                if is_acceptable and (
                    best_cost == m + n + 1
                    or (
                        cand_origin <= best_origin + m // 2
                        and cand_score > best_score
                    )
                    or (length > best_length and cand_score > best_score)
                ):
                    best_score = cand_score
                    best_cost = cand_cost
                    best_origin = cand_origin
                    best_ref_stop = m
                    best_query_stop = j
                    if cand_cost == 0 and cand_origin >= 0:
                        # exact match, stop early
                        break

        if max_n == n:
            first_i = 0 if self.stop_in_reference else m
            # Search the last column, bottom up.
            for i in range(last_filled_i, first_i - 1, -1):
                length = i + min(origin[i], 0)
                cand_cost = cost[i]
                cand_score = score[i]
                if self.wildcard_ref:
                    if length < m:
                        ref_start = -min(origin[i], 0)
                        cur_effective_length = length - (
                            self.n_counts[i] - self.n_counts[ref_start]
                        )
                    else:
                        cur_effective_length = self.effective_length
                else:
                    cur_effective_length = length

                is_acceptable = (
                    length >= self._min_overlap
                    and cand_cost <= cur_effective_length * max_error_rate
                )
                best_length = best_ref_stop + min(best_origin, 0)

                # NB: the overlap test deliberately uses the stale
                # `cur_origin` from the column loop, matching the
                # reference kernel (_align.pyx:563-567).
                if is_acceptable and (
                    best_cost == m + n + 1
                    or (
                        cur_origin <= best_origin + m // 2
                        and cand_score > best_score
                    )
                    or (length > best_length and cand_score > best_score)
                ):
                    best_score = cand_score
                    best_cost = cand_cost
                    best_origin = origin[i]
                    best_ref_stop = i
                    best_query_stop = n

        if best_cost == m + n + 1:
            # No alignment within the allowed error rate was found.
            return None

        if best_origin >= 0:
            ref_start = 0
            query_start = best_origin
        else:
            ref_start = -best_origin
            query_start = 0

        return (
            ref_start,
            best_ref_stop,
            query_start,
            best_query_stop,
            best_score,
            best_cost,
        )


class PrefixComparer:
    """
    Anchored 5' matching without indels: count mismatches over the
    common prefix. (Reference: _align.pyx:594-693)
    """

    def __init__(
        self,
        reference: str,
        max_error_rate: float,
        wildcard_ref: bool = False,
        wildcard_query: bool = False,
        min_overlap: int = 1,
    ):
        self.wildcard_ref = bool(wildcard_ref)
        self.wildcard_query = bool(wildcard_query)
        self.m = len(reference)
        self.effective_length = self.m
        if self.wildcard_ref:
            # NB: reference subtracts count('N') - count('n'); with the
            # uppercased sequences used in practice this equals the N count.
            self.effective_length -= reference.count("N") - reference.count("n")
            if self.effective_length == 0:
                raise ValueError("Cannot have only N wildcards in the sequence")
        if not (0 <= max_error_rate <= 1.0):
            raise ValueError("max_error_rate must be between 0 and 1")
        self.max_k = int(max_error_rate * self.effective_length)
        if min_overlap < 1:
            raise ValueError("min_overlap must be at least 1")
        self.min_overlap = min_overlap
        if self.wildcard_ref:
            self.reference = translate(reference, IUPAC_TABLE)
        elif self.wildcard_query:
            self.reference = translate(reference, ACGT_TABLE)
        else:
            self.reference = translate(reference, UPPER_TABLE)

    def __repr__(self):
        return (
            "{}(reference={!r}, max_k={}, wildcard_ref={}, "
            "wildcard_query={})".format(
                self.__class__.__name__,
                self.reference,
                self.max_k,
                self.wildcard_ref,
                self.wildcard_query,
            )
        )

    def locate(self, query: str):
        n = len(query)
        length = min(self.m, n)
        if self.wildcard_query:
            qb = translate(query, IUPAC_TABLE)
        elif self.wildcard_ref:
            qb = translate(query, ACGT_TABLE)
        else:
            qb = translate(query, UPPER_TABLE)
        r = self.reference
        errors = 0
        if not (self.wildcard_ref or self.wildcard_query):
            for i in range(length):
                if r[i] != qb[i]:
                    errors += 1
        else:
            for i in range(length):
                if (r[i] & qb[i]) == 0:
                    errors += 1
        if errors > self.max_k or length < self.min_overlap:
            return None
        score = (length - errors) * MATCH_SCORE + errors * MISMATCH_SCORE
        return (0, length, 0, length, score, errors)


class SuffixComparer(PrefixComparer):
    """Anchored 3' matching without indels (reversed prefix compare)."""

    def __init__(
        self,
        reference: str,
        max_error_rate: float,
        wildcard_ref: bool = False,
        wildcard_query: bool = False,
        min_overlap: int = 1,
    ):
        super().__init__(
            reference[::-1],
            max_error_rate,
            wildcard_ref,
            wildcard_query,
            min_overlap,
        )

    def locate(self, query: str):
        n = len(query)
        result = super().locate(query[::-1])
        if result is None:
            return None
        _, length, _, _, score, errors = result
        return (self.m - length, self.m, n - length, n, score, errors)


def edit_distance(s: str, t: str) -> int:
    """Return the edit distance between strings s and t."""
    m = len(s)
    n = len(t)
    costs = list(range(m + 1))
    for j in range(1, n + 1):
        prev = costs[0]
        costs[0] += 1
        for i in range(1, m + 1):
            match = int(s[i - 1] == t[j - 1])
            c = min(prev + 1 - match, costs[i] + 1, costs[i - 1] + 1)
            prev = costs[i]
            costs[i] = c
    return costs[-1]


def hamming_sphere(s: str, k: int) -> Iterator[str]:
    """
    Yield all strings t at hamming distance exactly k from s over the
    alphabet A, C, G, T, in the reference's enumeration order
    (position-major, then ACGT order). The order matters for adapter
    index construction (later entries overwrite earlier ones).
    """
    if k == 0:
        yield s
        return
    n = len(s)
    if k == 1:
        for i in range(n):
            for ch in "ACGT":
                if s[i] == ch:
                    continue
                yield s[:i] + ch + s[i + 1 :]
        return
    if k == 2:
        for i in range(n):
            for ch1 in "ACGT":
                if s[i] == ch1:
                    continue
                for j in range(i + 1, n):
                    for ch2 in "ACGT":
                        if s[j] == ch2:
                            continue
                        yield s[:i] + ch1 + s[i + 1 : j] + ch2 + s[j + 1 :]
        return
    # Recursive solution for k > 2; i is the first position that is varied.
    for i in range(n - k + 1):
        prefix = s[:i]
        c = s[i]
        suffix = s[i + 1 :]
        for pch in "ACGT":
            if pch == c:
                continue
            for t in hamming_sphere(suffix, k - 1):
                yield prefix + pch + t


def hamming_environment(s: str, k: int) -> Iterator[Tuple[str, int, int]]:
    """
    Yield (t, e, m) for all strings t with hamming distance e <= k from s,
    where m is the number of matching characters.
    """
    n = len(s)
    for e in range(k + 1):
        for t in hamming_sphere(s, e):
            yield t, e, n - e


_EDIT_ALPHABET = "ACGT"


def edit_environment(t_str: str, k: int) -> Iterator[Tuple[str, int, int]]:
    """
    Yield (s, e, m) for all strings s whose edit distance e to t is at
    most k, with m the number of matches in the optimal alignment, in
    the reference's DFS enumeration order (_align.pyx:785-882).
    """
    codes = [_EDIT_ALPHABET.index(c) for c in t_str.upper()]
    n = len(t_str)
    big = (k + 1) * 0x01010101  # effectively infinity, like the memset fill

    width = n + 1
    rows = n + k + 1
    costs = [big] * (width * (rows))
    matches = [0] * (width * rows)
    for i in range(rows):
        costs[i * width] = i
    for j in range(width):
        costs[j] = j

    s = [0] * rows
    i = 0
    while True:
        if i > 0:
            ch = s[i - 1]
            min_cost = 999999999
            base = i * width
            prev_base = (i - 1) * width
            for j in range(max(1, i - k), min(n + 1, i + k + 1)):
                match = 0 if codes[j - 1] == ch else 1
                diag = costs[prev_base + j - 1] + match
                left = costs[base + j - 1] + 1
                up = costs[prev_base + j] + 1
                if diag <= left and diag <= up:
                    c = diag
                    mm = matches[prev_base + j - 1] + (1 - match)
                elif left <= up:
                    c = left
                    mm = matches[base + j - 1]
                else:
                    c = up
                    mm = matches[prev_base + j]
                costs[base + j] = c
                matches[base + j] = mm
                if c < min_cost:
                    min_cost = c
        else:
            min_cost = 0

        if costs[i * width + n] <= k:
            yield (
                "".join(_EDIT_ALPHABET[c] for c in s[:i]),
                costs[i * width + n],
                matches[i * width + n],
            )

        if min_cost <= k and i < n + k:
            # Descend: extend the prefix with 'A'.
            s[i] = 0
            i += 1
        else:
            # Backtrack to the last position that can be incremented.
            while True:
                if i == 0:
                    return
                i -= 1
                ch = s[i]
                if ch < 3:
                    break
            s[i] = ch + 1
            i += 1


def naive_edit_environment(s: str, k: int) -> Iterator[str]:
    """Apply all possible edits up to distance k (with duplicates)."""
    yield s
    if k == 0:
        return
    for s in naive_edit_environment(s, k - 1):
        n = len(s)
        for ch in "ACGT":
            for i in range(n):
                prefix = s[:i] + ch
                yield prefix + s[i:]  # insertion
                yield prefix + s[i + 1 :]  # substitution
            yield s + ch  # insertion at the end
        for i in range(n):
            yield s[:i] + s[i + 1 :]  # deletion


def py_edit_environment(s: str, k: int) -> Iterator[Tuple[str, int, int]]:
    """
    Like edit_environment, but computed through the Aligner; used for
    cross-validation in tests.
    """
    rate = k / len(s) if s else 0
    aligner = Aligner(s, max_error_rate=rate, flags=0, min_overlap=len(s))
    seen = set()
    for t in naive_edit_environment(s, k):
        if t in seen:
            continue
        seen.add(t)
        result = aligner.locate(t)
        score, errors = result[-2:]
        yield t, errors, score


def slow_edit_environment(s: str, k: int) -> Iterator[Tuple[str, int, int]]:
    """
    Row-by-row DFS edit environment (testing oracle).
    Yields (t, e, m) like edit_environment, in a different order.
    """
    n = len(s)
    alphabet = "TGCA"
    work_stack = [("", list(range(n + 1)), [0] * (n + 1))]
    while work_stack:
        t, costs, matches = work_stack.pop()
        i = len(t)
        if costs[-1] <= k:
            yield t, costs[-1], matches[-1]
        if i == n + k:
            continue
        if min(costs) > k:
            continue
        for ch in alphabet:
            next_costs = [0] * (n + 1)
            next_costs[0] = len(t) + 1
            next_matches = [0] * (n + 1)
            for j in range(1, n + 1):
                match = 0 if s[j - 1] == ch else 1
                diag = costs[j - 1] + match
                left = next_costs[j - 1] + 1
                up = costs[j] + 1
                if diag <= left and diag <= up:
                    c, mm = diag, matches[j - 1] + (1 - match)
                elif left <= up:
                    c, mm = left, next_matches[j - 1]
                else:
                    c, mm = up, matches[j]
                next_costs[j] = c
                next_matches[j] = mm
            work_stack.append((t + ch, next_costs, next_matches))
