"""
Byte-parity of the generalized batched pipeline engine against the
per-read host pipeline, across stage combinations: cuts, quality /
NextSeq trimming, multi-adapter matching (3'/5'/anywhere, wildcards,
times), poly-A trimming, shortening, and filters.
"""

import os
import random

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import pytest

from cutadapt_tpu.adapters import (
    AnywhereAdapter,
    BackAdapter,
    FrontAdapter,
    NonInternalBackAdapter,
    NonInternalFrontAdapter,
    PrefixAdapter,
    RightmostBackAdapter,
    RightmostFrontAdapter,
    SuffixAdapter,
)
from cutadapt_tpu.io.chunks import parse_fastq_chunk
from cutadapt_tpu.batch_pipeline import (
    AdapterStage,
    AdapterTask,
    BatchPipelineEngine,
    CutStage,
    FilterSpec,
    NextseqStage,
    PolyAStage,
    QualityStage,
    ShortenStage,
    assemble_window,
)
from cutadapt_tpu.info import ModificationInfo
from cutadapt_tpu.modifiers import (
    AdapterCutter,
    NextseqQualityTrimmer,
    PolyATrimmer,
    QualityTrimmer,
    Shortener,
    UnconditionalCutter,
)
from cutadapt_tpu.io.fastq import parse_fastq


def make_reads(rng, n, adapters, with_tail=False):
    recs = []
    for i in range(n):
        L = rng.randint(1, 90)
        s = "".join(rng.choice("ACGT") for _ in range(L))
        r = rng.random()
        if adapters and r < 0.5:
            ad = adapters[rng.randrange(len(adapters))]
            take = rng.randint(4, len(ad))
            p = rng.randint(0, max(0, L - take))
            s = (s[:p] + ad[:take] + s[p + take:])[:L]
        if with_tail and rng.random() < 0.3:
            s = (s + "A" * rng.randint(3, 15))[:90]
        L = len(s)
        q = "".join(chr(rng.randint(35, 74)) for _ in range(L))
        recs.append(f"@r{i} x\n{s}\n+\n{q}\n")
    return "".join(recs).encode()


def host_expected(data, modifiers, keep_fn):
    out = []
    for rec in parse_fastq(__import__("io").BytesIO(data)):
        info = ModificationInfo(rec)
        r = rec
        for mod in modifiers:
            r = mod(r, info)
        if keep_fn(r, info):
            out.append(r.fastq_bytes())
    return b"".join(out)


def run_engine(data, stages, filters=()):
    # single DP shape (128) keeps per-test compile count at one per spec
    engine = BatchPipelineEngine(
        stages, filters, min_dp_batch=128, max_dp_batch=128
    )
    parsed = parse_fastq_chunk(data)
    ws, we, keep, stats = engine.process_parsed(parsed)
    return assemble_window(parsed, ws, we, keep), stats


ADAPTER = "AGATCGGAAGAGC"


def test_quality_and_back_adapter_and_minlen():
    rng = random.Random(10)
    data = make_reads(rng, 500, [ADAPTER])
    back = BackAdapter(ADAPTER, max_errors=0.1, min_overlap=3)
    cutter = AdapterCutter([back])
    qt = QualityTrimmer(0, 20)
    expected = host_expected(
        data, [qt, cutter], lambda r, info: len(r) >= 10
    )
    got, stats = run_engine(
        data,
        [
            QualityStage(0, 20),
            AdapterStage([AdapterTask(back, "back", 0)]),
        ],
        [FilterSpec("too_short", 10)],
    )
    assert got == expected
    assert stats["with_adapters"] == cutter.with_adapters


def sprinkle_n(data: bytes, rng, fraction: float) -> bytes:
    """Replace a base with 'N' in ~fraction of the records."""
    recs = data.decode().splitlines()
    for i in range(0, len(recs), 4):
        seq = recs[i + 1]
        if seq and rng.random() < fraction:
            p = rng.randrange(len(seq))
            recs[i + 1] = seq[:p] + "N" + seq[p + 1 :]
    return ("\n".join(recs) + "\n").encode()


@pytest.mark.parametrize("n_fraction,pack2_env", [
    (0.05, "1"),   # few dirty reads -> host-scalar tail lane
    (0.6, "1"),    # many dirty reads -> 4-bit device lane
    (0.3, "0"),    # control: 2-bit packing disabled
])
def test_pack2_lane_split_parity(n_fraction, pack2_env, monkeypatch):
    """The 2-bit clean / dirty lane split (and the host-scalar tail)
    must be invisible in the results."""
    monkeypatch.setenv("CUTADAPT_TPU_PACK2", pack2_env)
    rng = random.Random(int(n_fraction * 100))
    data = sprinkle_n(make_reads(rng, 400, [ADAPTER]), rng, n_fraction)
    back = BackAdapter(ADAPTER, max_errors=0.1, min_overlap=3)
    cutter = AdapterCutter([back])
    expected = host_expected(data, [cutter], lambda r, info: True)
    got, stats = run_engine(
        data, [AdapterStage([AdapterTask(back, "back", 0)])]
    )
    assert got == expected
    assert stats["with_adapters"] == cutter.with_adapters


def test_multi_adapter_best_by_score():
    rng = random.Random(11)
    a1 = "AGATCGGAAGAGC"
    a2 = "TTAGACATATCTCCGTCG"
    data = make_reads(rng, 500, [a1, a2])
    b1 = BackAdapter(a1, max_errors=0.1, min_overlap=3)
    b2 = BackAdapter(a2, max_errors=0.2, min_overlap=4)
    cutter = AdapterCutter([b1, b2])
    expected = host_expected(data, [cutter], lambda r, info: True)
    got, stats = run_engine(
        data,
        [AdapterStage([AdapterTask(b1, "back", 0),
                       AdapterTask(b2, "back", 1)])],
    )
    assert got == expected


def test_front_and_anywhere():
    rng = random.Random(12)
    af = "CTGATCGGACT"
    data = make_reads(rng, 500, [af])
    for make_host, kind in [
        (lambda: FrontAdapter(af, max_errors=0.1, min_overlap=3), "front"),
        (lambda: AnywhereAdapter(af, max_errors=0.1, min_overlap=3),
         "anywhere"),
    ]:
        host_a = make_host()
        cutter = AdapterCutter([host_a])
        expected = host_expected(data, [cutter], lambda r, info: True)
        got, _ = run_engine(
            data, [AdapterStage([AdapterTask(make_host(), kind, 0)])]
        )
        assert got == expected, kind


def test_wildcard_adapter():
    rng = random.Random(13)
    aw = "AGANCGGANGAGC"
    data = make_reads(rng, 400, ["AGATCGGATGAGC", "AGACCGGACGAGC"])
    host_a = BackAdapter(aw, max_errors=0.1, min_overlap=3)
    cutter = AdapterCutter([host_a])
    expected = host_expected(data, [cutter], lambda r, info: True)
    got, _ = run_engine(
        data,
        [AdapterStage([AdapterTask(
            BackAdapter(aw, max_errors=0.1, min_overlap=3), "back", 0)])],
    )
    assert got == expected


def test_times_2():
    rng = random.Random(14)
    data = make_reads(rng, 400, [ADAPTER])
    host_a = BackAdapter(ADAPTER, max_errors=0.1, min_overlap=3)
    cutter = AdapterCutter([host_a], times=2)
    expected = host_expected(data, [cutter], lambda r, info: True)
    got, _ = run_engine(
        data,
        [AdapterStage(
            [AdapterTask(BackAdapter(ADAPTER, max_errors=0.1, min_overlap=3),
                         "back", 0)],
            times=2,
        )],
    )
    assert got == expected


def test_cut_nextseq_polya_shorten():
    rng = random.Random(15)
    data = make_reads(rng, 500, [ADAPTER], with_tail=True)
    back = BackAdapter(ADAPTER, max_errors=0.1, min_overlap=3)
    mods = [
        UnconditionalCutter(2),
        UnconditionalCutter(-1),
        NextseqQualityTrimmer(20),
        AdapterCutter([back]),
        PolyATrimmer(),
        Shortener(60),
    ]
    expected = host_expected(data, mods, lambda r, info: True)
    got, _ = run_engine(
        data,
        [
            CutStage(2),
            CutStage(-1),
            NextseqStage(20),
            AdapterStage([AdapterTask(
                BackAdapter(ADAPTER, max_errors=0.1, min_overlap=3),
                "back", 0)]),
            PolyAStage(),
            ShortenStage(60),
        ],
    )
    assert got == expected


@pytest.mark.parametrize(
    "factory,kind",
    [
        (lambda a: NonInternalFrontAdapter(a, max_errors=0.2, min_overlap=3),
         "noninternal_front"),
        (lambda a: NonInternalBackAdapter(a, max_errors=0.2, min_overlap=3),
         "noninternal_back"),
        (lambda a: PrefixAdapter(a, max_errors=0.2), "prefix"),
        (lambda a: SuffixAdapter(a, max_errors=0.2), "suffix"),
        (lambda a: PrefixAdapter(a, max_errors=0.2, indels=False),
         "prefix_cmp"),
        (lambda a: SuffixAdapter(a, max_errors=0.2, indels=False),
         "suffix_cmp"),
        (lambda a: RightmostFrontAdapter(a, max_errors=0.1, min_overlap=3),
         "rightmost_front"),
        (lambda a: RightmostBackAdapter(a, max_errors=0.1, min_overlap=3),
         "rightmost_back"),
    ],
)
def test_adapter_type_matrix(factory, kind):
    rng = random.Random(hash(kind) % 100000)
    a = "CTGATCGGACTAA"
    data = make_reads(rng, 400, [a])
    cutter = AdapterCutter([factory(a)], index=False)
    expected = host_expected(data, [cutter], lambda r, info: True)
    got, stats = run_engine(
        data, [AdapterStage([AdapterTask(factory(a), kind, 0)])]
    )
    assert got == expected, kind
    assert stats["with_adapters"] == cutter.with_adapters, kind


def test_adapter_type_matrix_wildcards():
    rng = random.Random(77)
    a = "CTGANCGGANTAA"
    data = make_reads(rng, 300, ["CTGATCGGACTAA", "CTGACCGGAGTAA"])
    for factory, kind in [
        (lambda s: NonInternalBackAdapter(s, max_errors=0.2, min_overlap=3),
         "noninternal_back"),
        (lambda s: PrefixAdapter(s, max_errors=0.2, indels=False),
         "prefix_cmp"),
        (lambda s: RightmostBackAdapter(s, max_errors=0.2, min_overlap=3),
         "rightmost_back"),
    ]:
        cutter = AdapterCutter([factory(a)], index=False)
        expected = host_expected(data, [cutter], lambda r, info: True)
        got, _ = run_engine(
            data, [AdapterStage([AdapterTask(factory(a), kind, 0)])]
        )
        assert got == expected, kind


@pytest.mark.parametrize("front_required,back_required", [
    (True, True), (True, False), (False, True), (False, False),
])
def test_linked_adapter(front_required, back_required):
    from cutadapt_tpu.adapters import LinkedAdapter, PrefixAdapter

    rng = random.Random(front_required * 2 + back_required)
    f, b = "CTGTCTCTTATA", "AGATCGGAAGAGC"
    # reads with front at the start and/or back inside
    recs = []
    for i in range(400):
        L = rng.randint(1, 80)
        s = "".join(rng.choice("ACGT") for _ in range(L))
        if rng.random() < 0.6:
            s = f[: rng.randint(6, len(f))] + s
        if rng.random() < 0.6 and len(s) > 20:
            p = rng.randint(12, len(s) - 5)
            s = s[:p] + b[: rng.randint(4, len(b))] + s[p:]
        s = s[:90]
        q = "".join(chr(rng.randint(35, 70)) for _ in s)
        recs.append(f"@r{i}\n{s}\n+\n{q}\n")
    data = "".join(recs).encode()

    def make():
        front = (
            PrefixAdapter(f, max_errors=0.1)
            if front_required
            else FrontAdapter(f, max_errors=0.1, min_overlap=3)
        )
        back = BackAdapter(b, max_errors=0.1, min_overlap=3)
        return LinkedAdapter(
            front, back, front_required, back_required, name="lnk"
        )

    cutter = AdapterCutter([make()], index=False)
    expected = host_expected(data, [cutter], lambda r, info: True)
    linked = make()
    got, stats = run_engine(
        data, [AdapterStage([AdapterTask(linked, "linked", 0)])]
    )
    assert got == expected
    assert stats["with_adapters"] == cutter.with_adapters


def test_linked_adapter_stats_match_host():
    from collections import defaultdict

    from cutadapt_tpu.adapters import LinkedAdapter, PrefixAdapter

    rng = random.Random(42)
    f, b = "CTGTCTCTTATA", "AGATCGGAAGAGC"
    data = make_reads(rng, 300, [f + "ACGTACGTAC" + b])

    def make():
        return LinkedAdapter(
            PrefixAdapter(f, max_errors=0.1),
            BackAdapter(b, max_errors=0.1, min_overlap=3),
            True, False, name="lnk",
        )

    host_a = make()
    cutter = AdapterCutter([host_a], index=False)
    host_expected(data, [cutter], lambda r, info: True)
    host_stats = cutter.adapter_statistics[host_a]

    linked = make()
    got, stats = run_engine(
        data, [AdapterStage([AdapterTask(linked, "linked", 0)])]
    )
    front = defaultdict(lambda: defaultdict(int))
    back = defaultdict(lambda: defaultdict(int))
    for ev in stats["adapter_events"]:
        for rem, er, asf in zip(ev["removed"], ev["errors"], ev["as_front"]):
            (front if asf else back)[int(rem)][int(er)] += 1
    assert {k: dict(v) for k, v in front.items()} == {
        k: dict(v) for k, v in host_stats.front.errors.items()
    }
    assert {k: dict(v) for k, v in back.items()} == {
        k: dict(v) for k, v in host_stats.back.errors.items()
    }


@pytest.mark.parametrize("indels", [False, True])
@pytest.mark.parametrize("prefix", [True, False])
def test_indexed_adapters(prefix, indels):
    from cutadapt_tpu.adapters import (
        IndexedPrefixAdapters,
        IndexedSuffixAdapters,
        PrefixAdapter,
        SuffixAdapter,
    )

    rng = random.Random(900 + prefix * 2 + indels)
    barcodes = ["ACGTACGTAC", "TTGACCGGAA", "GGATCCATGC", "ACGTACGAAC"]
    cls = PrefixAdapter if prefix else SuffixAdapter
    recs = []
    for i in range(400):
        L = rng.randint(1, 60)
        s = "".join(rng.choice("ACGTN") for _ in range(L))
        if rng.random() < 0.7:
            bc = list(barcodes[rng.randrange(len(barcodes))])
            if rng.random() < 0.3:  # add an error
                bc[rng.randrange(len(bc))] = rng.choice("ACGT")
            bc = "".join(bc)
            s = bc + s if prefix else s + bc
        q = "J" * len(s)
        recs.append(f"@r{i}\n{s}\n+\n{q}\n")
    data = "".join(recs).encode()

    def make_adapters():
        return [
            cls(b, max_errors=1, indels=indels, name=f"bc{i}")
            for i, b in enumerate(barcodes)
        ]

    host_adapters = make_adapters()
    cutter = AdapterCutter(host_adapters, index=True)
    expected = host_expected(data, [cutter], lambda r, info: True)

    eng_adapters = make_adapters()
    indexed = (
        IndexedPrefixAdapters(eng_adapters)
        if prefix
        else IndexedSuffixAdapters(eng_adapters)
    )
    kind = "indexed_prefix" if prefix else "indexed_suffix"
    got, stats = run_engine(
        data, [AdapterStage([AdapterTask(indexed, kind, 0)])]
    )
    assert got == expected
    assert stats["with_adapters"] == cutter.with_adapters
    # per-sub-adapter routing ids must identify the same winners
    gids = stats["last_adapter_gid"]
    import io as _io

    from cutadapt_tpu.info import ModificationInfo
    from cutadapt_tpu.io.fastq import parse_fastq

    for rec, gid in zip(parse_fastq(_io.BytesIO(data)), gids):
        info = ModificationInfo(rec)
        cutter2 = AdapterCutter(host_adapters, index=True)
        # reuse the already-built host cutter result instead
        m = cutter.adapters.match_to(rec.sequence)
        if m is None:
            assert gid == -1
        else:
            assert gid >= 0
            assert eng_adapters[gid].name == m.adapter.name


def test_discard_trimmed_untrimmed_and_maxlen():
    rng = random.Random(16)
    data = make_reads(rng, 500, [ADAPTER])
    for filt, keep_fn_maker in [
        (FilterSpec("discard_trimmed"),
         lambda cutter: lambda r, info: not info.matches),
        (FilterSpec("discard_untrimmed"),
         lambda cutter: lambda r, info: bool(info.matches)),
        (FilterSpec("too_long", 50),
         lambda cutter: lambda r, info: len(r) <= 50),
    ]:
        back = BackAdapter(ADAPTER, max_errors=0.1, min_overlap=3)
        cutter = AdapterCutter([back])
        expected = host_expected(data, [cutter], keep_fn_maker(cutter))
        got, _ = run_engine(
            data,
            [AdapterStage([AdapterTask(
                BackAdapter(ADAPTER, max_errors=0.1, min_overlap=3),
                "back", 0)])],
            [filt],
        )
        assert got == expected, filt.kind


def test_adapter_event_stats_match_host():
    rng = random.Random(17)
    data = make_reads(rng, 600, [ADAPTER])
    back_host = BackAdapter(ADAPTER, max_errors=0.1, min_overlap=3)
    cutter = AdapterCutter([back_host])
    host_expected(data, [cutter], lambda r, info: True)
    host_end = cutter.adapter_statistics[back_host].end

    back_dev = BackAdapter(ADAPTER, max_errors=0.1, min_overlap=3)
    got, stats = run_engine(
        data, [AdapterStage([AdapterTask(back_dev, "back", 0)])]
    )
    # rebuild the (removed_length -> errors) histogram from events
    from collections import defaultdict

    errors = defaultdict(lambda: defaultdict(int))
    adjacent = {"A": 0, "C": 0, "G": 0, "T": 0, "": 0}
    for ev in stats["adapter_events"]:
        assert ev["task"] == 0
        for rem, er, asf, adj in zip(
            ev["removed"], ev["errors"], ev["as_front"], ev["adjacent"]
        ):
            assert not asf
            errors[int(rem)][int(er)] += 1
            ch = chr(adj) if adj else ""
            adjacent[ch if ch in "ACGT" and ch else ""] += 1
    assert {k: dict(v) for k, v in errors.items()} == {
        k: dict(v) for k, v in host_end.errors.items()
    }
    assert adjacent == host_end.adjacent_bases


def test_long_reads_use_wide_result_format():
    """Reads >= 2**14 bp overflow the packed 14-bit trim coordinates;
    the engine must route them through the unpacked wide format and
    still match the per-read host oracle (regression: a 20000 bp read
    with the adapter at 17000 was trimmed to 616 bp)."""
    rng = random.Random(99)
    bases = "ACGT"
    reads = []
    # one read with the adapter deep past the 14-bit boundary, one
    # unmatched long read, and a couple of short reads mixed in
    long1 = "".join(rng.choice(bases) for _ in range(20000))
    long1 = long1[:17000] + ADAPTER + long1[17000 + len(ADAPTER):]
    long2 = "".join(rng.choice(bases) for _ in range(20000))
    short = "".join(rng.choice(bases) for _ in range(60)) + ADAPTER
    for i, s in enumerate([long1, long2, short]):
        reads.append(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
    data = "".join(reads).encode()

    back_host = BackAdapter(ADAPTER, max_errors=0.1, min_overlap=3)
    cutter = AdapterCutter([back_host])
    expected = host_expected(data, [cutter], lambda r, info: True)

    back_dev = BackAdapter(ADAPTER, max_errors=0.1, min_overlap=3)
    got, _ = run_engine(
        data, [AdapterStage([AdapterTask(back_dev, "back", 0)])]
    )
    assert got == expected


def test_scalar_tail_lane_parity(monkeypatch):
    """The decomposition-remainder scalar lane (CUTADAPT_TPU_SCALAR_TAIL)
    must be invisible: same output and found-geometry as padded device
    dispatch of the tail rows."""
    from cutadapt_tpu.batch_pipeline import (
        reset_xfer_counters, xfer_counters,
    )

    rng = random.Random(23)
    data = make_reads(rng, 400, [ADAPTER])
    back = BackAdapter(ADAPTER, max_errors=0.1, min_overlap=3)
    outs = {}
    rows = {}
    for tail in ("0", "100"):
        monkeypatch.setenv("CUTADAPT_TPU_SCALAR_TAIL", tail)
        reset_xfer_counters()
        outs[tail] = run_engine(
            data,
            [AdapterStage([AdapterTask(
                BackAdapter(ADAPTER, max_errors=0.1, min_overlap=3),
                "back", 0)])],
        )[0]
        rows[tail] = xfer_counters()["dp_rows"]
    assert outs["0"] == outs["100"]
    assert rows["100"] < rows["0"], rows  # the tail actually engaged
    expected = host_expected(
        data, [AdapterCutter([back])], lambda r, info: True
    )
    assert outs["100"] == expected
