"""
Parity tests for the native (C++) host ops against their NumPy
reference implementations, and for the packed (4-bit) device kernel
against the unpacked one.
"""

import os
import random

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import pytest

from cutadapt_tpu import native
from cutadapt_tpu.adapters import Where
from cutadapt_tpu.batch_pipeline import (
    AdapterStage,
    AdapterTask,
    BatchPipelineEngine,
    process_chunks_pipelined,
)
from cutadapt_tpu.io.chunks import (
    ParsedChunk,
    _assemble_fastq_np,
    _parse_fastq_chunk_np,
    pad_rows,
    parse_fastq_chunk,
)
from cutadapt_tpu.kmer_finder import KmerFinder
from cutadapt_tpu.kmer_heuristic import create_positions_and_kmers
from cutadapt_tpu.ops.align_batch import (
    AlignerSpec,
    make_batch_locate,
    query_class_info,
    query_lut,
)

pytestmark = pytest.mark.skipif(
    not native.AVAILABLE, reason="native host ops not built"
)


def make_fastq(rng, n, crlf=False, long_plus=False, final_newline=True):
    eol = "\r\n" if crlf else "\n"
    recs = []
    for i in range(n):
        L = rng.randint(0, 60)
        seq = "".join(rng.choice("ACGTN") for _ in range(L))
        qual = "".join(chr(rng.randint(33, 73)) for _ in range(L))
        plus = "+extra comment" if long_plus else "+"
        recs.append(f"@read{i} c{i}{eol}{seq}{eol}{plus}{eol}{qual}{eol}")
    data = "".join(recs)
    if not final_newline and data:
        data = data[:-1]
    return data.encode()


@pytest.mark.parametrize("crlf", [False, True])
@pytest.mark.parametrize("final_newline", [False, True])
def test_parse_parity(crlf, final_newline):
    rng = random.Random(1)
    data = make_fastq(rng, 37, crlf=crlf, final_newline=final_newline)
    buf = np.frombuffer(data, np.uint8)
    a = native.fastq_parse(buf)
    b = _parse_fastq_chunk_np(buf)
    assert (a[0] == b.head_start).all()
    assert (a[1] == b.head_end).all()
    assert (a[2] == b.seq_start).all()
    assert (a[3] == b.seq_len).all()
    assert (a[4] == b.qual_start).all()
    assert a[5] == b.has_cr


def test_parse_rejects_partial_record():
    buf = np.frombuffer(b"@r\nACGT\n+\n", np.uint8)
    with pytest.raises(ValueError):
        native.fastq_parse(buf)


def test_parse_rejects_length_mismatch():
    buf = np.frombuffer(b"@r\nACGT\n+\nIII\n", np.uint8)
    with pytest.raises(ValueError):
        native.fastq_parse(buf)


@pytest.mark.parametrize("crlf", [False, True])
def test_assemble_parity(crlf):
    rng = random.Random(2)
    data = make_fastq(rng, 53, crlf=crlf, long_plus=True)
    chunk = parse_fastq_chunk(data)
    stops = np.array(
        [rng.randint(0, L) for L in chunk.seq_len], np.int64
    )
    a = native.assemble_fastq(
        chunk.buf, chunk.head_start, chunk.head_end, chunk.seq_start,
        chunk.qual_start, stops,
    )
    b = _assemble_fastq_np(chunk, stops)
    assert a == b


@pytest.mark.parametrize("adapter", ["AGATCGGAAGAGC", "ANGATNA", "ACGT"])
def test_prefilter_matches_kmer_finder(adapter):
    rng = random.Random(3)
    wildcards = not set(adapter) <= set("ACGT")
    pk = create_positions_and_kmers(adapter, 3, 0.1, True, False, True)
    kf = KmerFinder(pk, ref_wildcards=wildcards)
    tables = native.PrefilterTables(kf)
    seqs = []
    for _ in range(300):
        L = rng.randint(0, 80)
        s = "".join(rng.choice("ACGTN") for _ in range(L))
        if rng.random() < 0.3 and L > len(adapter):
            p = rng.randint(0, L - len(adapter))
            s = s[:p] + adapter + s[p + len(adapter):]
        seqs.append(s)
    flat = "".join(seqs).encode()
    buf = np.frombuffer(flat, np.uint8)
    lens = np.array([len(s) for s in seqs], np.int32)
    starts = (np.cumsum(lens, dtype=np.int64) - lens).astype(np.int64)
    got = native.kmer_prefilter(buf, starts, lens, tables)
    want = np.array([kf.kmers_present(s) for s in seqs], np.uint8)
    assert (got == want).all()


@pytest.mark.parametrize("pack", [None, "pack4", "pack2"])
def test_pad_encode_parity(pack):
    rng = np.random.RandomState(4)
    alphabet = b"ACGTNacgtXK" if pack != "pack2" else b"ACGTacgt"
    buf = rng.choice(
        np.frombuffer(alphabet, np.uint8), size=5000
    ).astype(np.uint8)
    lens = rng.randint(0, 70, size=60).astype(np.int32)
    starts = (np.cumsum(lens.astype(np.int64)) - lens).astype(np.int64)
    sel = np.flatnonzero(rng.rand(60) < 0.5).astype(np.int64)
    width = 80
    lut = query_lut(AlignerSpec("ACGT", 0.1))
    if pack is not None:
        lut = query_class_info(AlignerSpec("ACGT", 0.1))[0]
    got = native.pad_encode(
        buf, starts, lens, sel, width, lut,
        pack4=pack == "pack4", pack2=pack == "pack2",
    )
    exp = lut[pad_rows(buf, starts[sel], lens[sel], width)]
    # encoded padding is literal 0 (kernels never read past `length`)
    exp[np.arange(width)[None, :] >= lens[sel][:, None]] = 0
    if pack == "pack4":
        exp = (exp[:, 0::2] | (exp[:, 1::2] << 4)).astype(np.uint8)
    elif pack == "pack2":
        exp = (
            exp[:, 0::4] | (exp[:, 1::4] << 2)
            | (exp[:, 2::4] << 4) | (exp[:, 3::4] << 6)
        ).astype(np.uint8)
    assert (got == exp).all()


def test_windows_clean():
    rng = np.random.RandomState(5)
    buf = rng.choice(
        np.frombuffer(b"ACGTNacgtn", np.uint8), size=3000
    ).astype(np.uint8)
    lens = rng.randint(0, 50, size=80).astype(np.int32)
    starts = (np.cumsum(lens.astype(np.int64)) - lens).astype(np.int64)
    lut = query_class_info(AlignerSpec("ACGT", 0.1))[0]
    got = native.windows_clean(buf, starts, lens, 64, lut)
    for i in range(80):
        window = buf[starts[i] : starts[i] + lens[i]]
        assert got[i] == bool((lut[window] < 4).all())
    # reversed truncation takes the window's tail
    got_r = native.windows_clean(buf, starts, lens, 8, lut, reverse=True)
    for i in range(80):
        window = buf[starts[i] : starts[i] + lens[i]][-8:]
        assert got_r[i] == bool((lut[window] < 4).all())


def test_query_class_info_matches_semantics():
    for ref, wc in [("AGATCGGAAGAGC", False), ("ANGNTC", True)]:
        spec = AlignerSpec(ref, 0.1, wildcard_ref=wc)
        lut = query_lut(spec)
        cls, row_masks = query_class_info(spec)
        enc_ref = np.frombuffer(ref.encode(), np.uint8)
        from cutadapt_tpu.ops.align_batch import encode_reference

        er = encode_reference(spec)
        for b in range(256):
            q = lut[b]
            want = (er == q) if not wc else ((er & q) != 0)
            got = (row_masks >> int(cls[b])) & 1
            assert (got.astype(bool) == want).all(), (ref, b)


def test_packed_kernel_parity():
    rng = np.random.RandomState(5)
    for ref, wc in [("AGATCGGAAGAGC", False), ("ANGNTCGGANG", True)]:
        spec = AlignerSpec(
            reference=ref, max_error_rate=0.2, flags=Where.BACK.value,
            wildcard_ref=wc, indel_cost=1, min_overlap=3,
        )
        lut = query_lut(spec)
        cls_lut, _ = query_class_info(spec)
        loc_u = make_batch_locate(spec)
        loc_p = make_batch_locate(spec, packed=True)
        B, L = 48, 40
        raw = rng.choice(np.frombuffer(b"ACGTNacgtX", np.uint8), size=(B, L))
        lens = rng.randint(0, L + 1, B).astype(np.int32)
        for i in range(B):
            raw[i, lens[i]:] = 0
        out_u = loc_u(lut[raw], lens)
        cls = cls_lut[raw]
        packed = (cls[:, 0::2] | (cls[:, 1::2] << 4)).astype(np.uint8)
        out_p = loc_p(packed, lens)
        found = np.asarray(out_u["found"])
        assert (found == np.asarray(out_p["found"])).all()
        for k in out_u:
            a, b = np.asarray(out_u[k]), np.asarray(out_p[k])
            assert (a[found] == b[found]).all(), (ref, k)


def test_engine_pipelined_byte_parity():
    """The pipelined batch engine must byte-match the per-read oracle."""
    import io as _io

    from cutadapt_tpu.adapters import BackAdapter
    from cutadapt_tpu.io.fastq import parse_fastq

    rng = random.Random(6)
    adapter = "AGATCGGAAGAGC"
    recs = []
    for i in range(400):
        L = rng.randint(1, 90)
        s = "".join(rng.choice("ACGT") for _ in range(L))
        if rng.random() < 0.4 and L > 20:
            p = rng.randint(0, L - 14)
            s = s[:p] + adapter[: rng.randint(4, 13)] + s[p:]
            s = s[:L]
        q = "".join(chr(rng.randint(35, 70)) for _ in s)
        recs.append(f"@r{i}\n{s}\n+\n{q}\n")
    data = "".join(recs).encode()

    back = BackAdapter(adapter, max_errors=0.1, min_overlap=3)
    expected = []
    for rec in parse_fastq(_io.BytesIO(data)):
        m = back.match_to(rec.sequence)
        expected.append((m.trimmed(rec) if m else rec).fastq_bytes())
    expected = b"".join(expected)

    engine = BatchPipelineEngine(
        [AdapterStage([AdapterTask(back, "back", 0)])],
        min_dp_batch=64,
        max_dp_batch=256,
    )
    # split into several chunks to exercise the pipeline
    quarters = len(recs) // 4
    chunks = []
    pos = 0
    text = data.decode()
    lines = text.splitlines(keepends=True)
    for c in range(4):
        chunk_lines = lines[c * quarters * 4 : (c + 1) * quarters * 4]
        chunks.append("".join(chunk_lines).encode())
    got = b"".join(
        out for out, _ in process_chunks_pipelined(engine, chunks)
    )
    assert got == expected


def test_check_pair_names_matches_python_predicate():
    """The C fast path must agree with record_names_match, including
    headers with leading whitespace (regression: IDs extracted from
    byte 0 made whitespace-led headers compare as zero-length IDs)."""
    from cutadapt_tpu.io.records import record_names_match

    cases = [
        ("a/1", "a/2", True),
        ("a x", "a y", True),
        ("a", "b", False),
        (" abc r", " abd r", False),  # leading whitespace, differing IDs
        (" abc r", " abc s", True),
        ("\tq1 z", "\tq2 z", True),  # mate-number suffix after tab skip
    ]
    for h1, h2, expected in cases:
        assert record_names_match(h1, h2) is expected, (h1, h2)
        b1 = f"@{h1}\nAC\n+\nII\n".encode()
        b2 = f"@{h2}\nAC\n+\nII\n".encode()
        p1 = parse_fastq_chunk(b1)
        p2 = parse_fastq_chunk(b2)
        bad = native.check_pair_names(
            p1.buf, p1.head_start, p1.head_end,
            p2.buf, p2.head_start, p2.head_end,
        )
        assert (bad == -1) is expected, (h1, h2, bad)
