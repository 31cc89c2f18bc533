"""
Cross-validation of the batched JAX alignment kernel against the scalar
host oracle: both must produce identical 6-tuples (or identical
rejections) for every read, across adapter types, wildcards, error
rates and the no-indels mode.

Runs on the JAX CPU backend (set in tests/conftest via environment).
"""

import os
import random

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import pytest

from cutadapt_tpu.align import Aligner
from cutadapt_tpu.adapters import Where
from cutadapt_tpu.ops.align_batch import (
    AlignerSpec,
    encode_queries,
    make_batch_locate,
    query_lut,
)

FLAG_SETS = [
    Where.BACK.value,
    Where.FRONT.value,
    Where.PREFIX.value,
    Where.SUFFIX.value,
    Where.FRONT_NOT_INTERNAL.value,
    Where.BACK_NOT_INTERNAL.value,
    Where.ANYWHERE.value,
]


def random_seq(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(alphabet) for _ in range(n))


def run_both(spec: AlignerSpec, reads):
    aligner = Aligner(
        spec.reference,
        spec.max_error_rate,
        flags=spec.flags,
        wildcard_ref=spec.wildcard_ref,
        wildcard_query=spec.wildcard_query,
        indel_cost=spec.indel_cost,
        min_overlap=spec.min_overlap,
    )
    expected = [aligner.locate(r) for r in reads]

    lut = query_lut(spec)
    queries, lengths = encode_queries(reads, lut)
    locate = make_batch_locate(spec)
    out = {k: np.asarray(v) for k, v in locate(queries, lengths).items()}
    actual = []
    for b in range(len(reads)):
        if not out["found"][b]:
            actual.append(None)
        else:
            actual.append(
                (
                    int(out["ref_start"][b]),
                    int(out["ref_stop"][b]),
                    int(out["query_start"][b]),
                    int(out["query_stop"][b]),
                    int(out["score"][b]),
                    int(out["errors"][b]),
                )
            )
    return expected, actual


@pytest.mark.parametrize("flags", FLAG_SETS)
def test_batch_locate_matches_oracle_random(flags):
    rng = random.Random(flags * 1000 + 7)
    adapter = random_seq(rng, rng.randint(4, 20))
    spec = AlignerSpec(
        reference=adapter,
        max_error_rate=rng.choice([0.0, 0.1, 0.2, 0.3]),
        flags=flags,
        min_overlap=rng.choice([1, 3]),
    )
    reads = []
    for _ in range(200):
        n = rng.randint(0, 50)
        read = random_seq(rng, n)
        # sometimes embed a mutated copy of the adapter
        if rng.random() < 0.6 and n > 4:
            insert = list(adapter)
            for _ in range(rng.randint(0, 2)):
                op = rng.choice("mid")
                p = rng.randrange(len(insert))
                if op == "m":
                    insert[p] = rng.choice("ACGT")
                elif op == "i":
                    insert.insert(p, rng.choice("ACGT"))
                elif len(insert) > 1:
                    del insert[p]
            pos = rng.randrange(n)
            read = read[:pos] + "".join(insert) + read[pos:]
        reads.append(read)
    expected, actual = run_both(spec, reads)
    for r, e, a in zip(reads, expected, actual):
        assert e == a, (spec, r)


@pytest.mark.parametrize("flags", [Where.BACK.value, Where.FRONT.value])
@pytest.mark.parametrize("wildcard_ref,wildcard_query", [(True, False), (False, True), (True, True)])
def test_batch_locate_matches_oracle_wildcards(flags, wildcard_ref, wildcard_query):
    rng = random.Random(42 + flags)
    alphabet = "ACGTN" if wildcard_ref else "ACGT"
    adapter = "A" + random_seq(rng, 11, alphabet) + "C"
    spec = AlignerSpec(
        reference=adapter,
        max_error_rate=0.2,
        flags=flags,
        wildcard_ref=wildcard_ref,
        wildcard_query=wildcard_query,
        min_overlap=3,
    )
    read_alphabet = "ACGTNRYSWKM" if wildcard_query else "ACGTX"
    reads = [random_seq(rng, rng.randint(0, 40), read_alphabet) for _ in range(150)]
    reads += [
        random_seq(rng, 10) + adapter.replace("N", "G") + random_seq(rng, 5)
        for _ in range(20)
    ]
    expected, actual = run_both(spec, reads)
    for r, e, a in zip(reads, expected, actual):
        assert e == a, (spec, r)


@pytest.mark.parametrize("flags", FLAG_SETS)
def test_batch_locate_pack2_matches_oracle(flags):
    """The 2-bit packed lane (4 class ids per wire byte) must match
    the oracle bit-exactly for ACGT-clean reads across every adapter
    type (dirty reads never reach this kernel — the dispatcher splits
    them off via native.windows_clean)."""
    from cutadapt_tpu.ops.align_batch import query_class_info

    rng = random.Random(flags * 77 + 5)
    adapter = random_seq(rng, rng.randint(4, 20))
    spec = AlignerSpec(
        reference=adapter,
        max_error_rate=rng.choice([0.0, 0.1, 0.2]),
        flags=flags,
        min_overlap=rng.choice([1, 3]),
    )
    reads = []
    for _ in range(150):
        n = rng.randint(0, 50)
        read = random_seq(rng, n)
        if rng.random() < 0.6 and n > 4:
            pos = rng.randrange(n)
            read = read[:pos] + adapter + read[pos:]
        reads.append(read)

    aligner = Aligner(
        spec.reference, spec.max_error_rate, flags=spec.flags,
        min_overlap=spec.min_overlap,
    )
    expected = [aligner.locate(r) for r in reads]

    cls_lut, _ = query_class_info(spec)
    lens = np.array([len(r) for r in reads], np.int32)
    L = (int(lens.max()) + 3) // 4 * 4
    cls = np.zeros((len(reads), L), np.uint8)
    for i, r in enumerate(reads):
        cls[i, : len(r)] = cls_lut[np.frombuffer(r.encode(), np.uint8)]
    assert (cls < 4).all()
    packed2 = (
        cls[:, 0::4] | (cls[:, 1::4] << 2)
        | (cls[:, 2::4] << 4) | (cls[:, 3::4] << 6)
    ).astype(np.uint8)
    out = {
        k: np.asarray(v)
        for k, v in make_batch_locate(spec, pack2=True)(
            packed2, lens
        ).items()
    }
    for b, (r, e) in enumerate(zip(reads, expected)):
        if not out["found"][b]:
            assert e is None, (spec, r)
            continue
        got = (
            int(out["ref_start"][b]), int(out["ref_stop"][b]),
            int(out["query_start"][b]), int(out["query_stop"][b]),
            int(out["score"][b]), int(out["errors"][b]),
        )
        assert e == got, (spec, r)


@pytest.mark.parametrize("flags", FLAG_SETS)
def test_batch_locate_matches_oracle_no_indels(flags):
    rng = random.Random(flags)
    adapter = random_seq(rng, 10)
    spec = AlignerSpec(
        reference=adapter,
        max_error_rate=0.2,
        flags=flags,
        indel_cost=100000,
        min_overlap=3,
    )
    reads = [random_seq(rng, rng.randint(0, 40)) for _ in range(150)]
    expected, actual = run_both(spec, reads)
    for r, e, a in zip(reads, expected, actual):
        assert e == a, (spec, r)


def test_batch_locate_adversarial_short_reads():
    # Reads shorter, equal and longer than the adapter; poly-repeats
    # exercise tie-breaking heavily.
    spec = AlignerSpec("TTTT", 0.25, Where.BACK.value, min_overlap=1)
    reads = ["", "T", "TT", "CCTTTT", "TTTTTT", "CTCTCT", "TTTCTTT", "ACGT"]
    expected, actual = run_both(spec, reads)
    assert expected == actual


def test_batch_locate_known_case():
    spec = AlignerSpec(
        "GCCGAACTTCTTAGACTGCCTTAAGGACGT", 0.1, Where.BACK.value, min_overlap=1
    )
    reads = ["CAAATCACCAGAAGGCGCCTAACTTCTTAGACTGCC"]
    expected, actual = run_both(spec, reads)
    assert actual[0] == (0, 20, 16, 36, 18, 1)
