"""
Batched (TPU) execution engine for the flagship configuration:
single-end 3' adapter trimming (`-a ADAPTER`), the reference's headline
benchmark case.

Data flow per chunk (designed for a device behind a slow/high-latency
link — transfers are the scarce resource, so only reads that truly
need the DP ever cross the wire, packed two bases per byte):

1. Host (C++): FASTQ chunk structure scan into offset arrays.
2. Host (C++): k-mer shift-and prefilter (identical predicate to the
   reference's KmerFinder) -> candidate read indices. Typically
   rejects ~70-95% of reads right on the host, so their bytes never
   cross the wire.
3. Host (C++): gather candidate reads into padded batches, encoding
   each byte to a 4-bit query equivalence class, two per byte.
4. Device: the exact-semantics alignment kernel
   (:mod:`cutadapt_tpu.ops.align_batch`, packed mode) -> per-read trim
   coordinates identical to the scalar engine, returned as ONE packed
   int32 array per sub-batch (stop | errors<<14 | found<<30).
5. Host (C++): assembly of the trimmed FASTQ bytes (order preserved).

``submit()``/``collect()`` are split so a run loop can overlap chunk
i's device work with chunk i±1's host work. Every stage has a pure
NumPy/JAX fallback when the native library is unavailable; output is
byte-identical either way (bench.py asserts this against the per-read
host oracle on every run).
"""

import os
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .adapters import Where
from .kmer_finder import KmerFinder
from .kmer_heuristic import create_positions_and_kmers
from .ops.align_batch import (
    AlignerSpec,
    make_batch_locate,
    query_class_info,
    query_lut,
)
from .ops.kmer_batch import make_batch_prefilter
from . import native

NEWLINE = 10
CARRIAGE = 13

# packed DP result layout (must fit int32)
_STOP_BITS = 14
_ERR_SHIFT = _STOP_BITS
_ERR_BITS = 16
_FOUND_SHIFT = 30


class ParsedChunk:
    """Offset views into one FASTQ chunk buffer."""

    __slots__ = (
        "buf",
        "head_start",
        "head_end",
        "seq_start",
        "seq_len",
        "qual_start",
        "n_records",
        "has_cr",
    )

    def __init__(
        self, buf, head_start, head_end, seq_start, seq_len, qual_start,
        has_cr=False,
    ):
        self.buf = buf
        self.head_start = head_start
        self.head_end = head_end
        self.seq_start = seq_start
        self.seq_len = seq_len
        self.qual_start = qual_start
        self.n_records = len(seq_len)
        self.has_cr = has_cr


def parse_fastq_chunk(data) -> ParsedChunk:
    """Parse a record-aligned FASTQ chunk into offset arrays.

    Malformed chunks raise FastqFormatError so the CLI reports them
    like the per-read reader does (clean message, exit code 1)."""
    from .io.records import FastqFormatError

    buf = np.frombuffer(data, dtype=np.uint8)
    try:
        if native.AVAILABLE:
            hs, he, ss, sl, qs, has_cr = native.fastq_parse(buf)
            return ParsedChunk(buf, hs, he, ss, sl, qs, has_cr=has_cr)
        return _parse_fastq_chunk_np(buf)
    except ValueError as e:
        raise FastqFormatError(str(e), line=None) from None


def _parse_fastq_chunk_np(buf: np.ndarray) -> ParsedChunk:
    """Vectorized NumPy fallback parser."""
    nl = np.flatnonzero(buf == NEWLINE)
    if len(nl) % 4 != 0:
        # trailing record without final newline
        if len(buf) and buf[-1] != NEWLINE:
            nl = np.append(nl, len(buf))
        if len(nl) % 4 != 0:
            raise ValueError("FASTQ chunk does not contain whole records")
    starts = np.empty_like(nl)
    starts[0] = 0
    starts[1:] = nl[:-1] + 1
    ends = nl.copy()
    # tolerate CRLF
    cr = buf[np.clip(ends - 1, 0, max(len(buf) - 1, 0))] == CARRIAGE
    ends = ends - cr
    head_start = starts[0::4] + 1  # skip '@'
    head_end = ends[0::4]
    seq_start = starts[1::4]
    seq_len = ends[1::4] - seq_start
    qual_start = starts[3::4]
    qual_len = ends[3::4] - qual_start
    if np.any(qual_len != seq_len):
        raise ValueError("Length of sequence and qualities differ")
    return ParsedChunk(
        buf, head_start, head_end, seq_start, seq_len.astype(np.int32),
        qual_start, has_cr=bool(cr.any()),
    )


def pad_rows(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray, width: int
) -> np.ndarray:
    """Gather variable-length slices of buf into a zero-padded matrix."""
    B = len(starts)
    if B == 0:
        return np.zeros((0, width), dtype=np.uint8)
    # int32 index math and a zero-padded tail keep this a single flat
    # gather plus one masked multiply
    buf_pad = np.concatenate([buf, np.zeros(width, np.uint8)])
    idx = starts.astype(np.int64)[:, None] + np.arange(width, dtype=np.int64)
    out = buf_pad[idx]
    out *= np.arange(width, dtype=np.int32)[None, :] < lens[:, None]
    return out


def _scatter_ranges(out, dst_starts, src_starts, lens, src_buf):
    """out[dst_starts[i] : +lens[i]] = src_buf[src_starts[i] : +lens[i]]."""
    lens = lens.astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return
    reps = np.repeat(np.arange(len(lens)), lens)
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    out[dst_starts[reps] + offs] = src_buf[src_starts[reps] + offs]


def assemble_fastq(chunk: ParsedChunk, stops: np.ndarray) -> bytes:
    """Build trimmed FASTQ bytes: '@header\\nseq[:stop]\\n+\\nqual[:stop]\\n'."""
    if native.AVAILABLE:
        return native.assemble_fastq(
            chunk.buf, chunk.head_start, chunk.head_end, chunk.seq_start,
            chunk.qual_start, stops,
        )
    return _assemble_fastq_np(chunk, stops)


def _assemble_fastq_np(chunk: ParsedChunk, stops: np.ndarray) -> bytes:
    """Vectorized NumPy fallback assembly via range scatters."""
    head_len = chunk.head_end - chunk.head_start
    stops = stops.astype(np.int64)
    rec_len = 1 + head_len + 1 + stops + 3 + stops + 1
    out_total = int(rec_len.sum())
    out = np.empty(out_total, dtype=np.uint8)
    rec_start = np.cumsum(rec_len) - rec_len

    pos = rec_start
    out[pos] = ord("@")
    pos = pos + 1
    _scatter_ranges(out, pos, chunk.head_start, head_len, chunk.buf)
    pos = pos + head_len
    out[pos] = NEWLINE
    pos = pos + 1
    _scatter_ranges(out, pos, chunk.seq_start, stops, chunk.buf)
    pos = pos + stops
    out[pos] = NEWLINE
    out[pos + 1] = ord("+")
    out[pos + 2] = NEWLINE
    pos = pos + 3
    _scatter_ranges(out, pos, chunk.qual_start, stops, chunk.buf)
    pos = pos + stops
    out[pos] = NEWLINE
    return out.tobytes()


class PendingChunk:
    """In-flight device work for one chunk (created by submit())."""

    __slots__ = ("parsed", "cand", "lens", "futures")

    def __init__(self, parsed, cand, lens, futures):
        self.parsed = parsed
        self.cand = cand
        self.lens = lens
        self.futures = futures  # list of (offset, count, device array)


class Back3pBatchEngine:
    """
    TPU engine for `-a ADAPTER` (regular 3' adapter, action=trim,
    times=1). Produces per-read trim positions and mergeable statistics
    tensors.
    """

    def __init__(
        self,
        adapter: str,
        max_error_rate: float = 0.1,
        min_overlap: int = 3,
        indels: bool = True,
        length_bucket: int = 64,
        min_dp_batch: int = 4096,
        max_dp_batch: int = 131072,
        prefilter_bucket: int = 8192,
        max_read_length: int = 1024,
        prefilter: bool = True,
    ):
        self.prefilter_bucket = prefilter_bucket
        adapter = adapter.upper().replace("U", "T").replace("I", "N")
        wildcards = not set(adapter) <= set("ACGT")
        self.adapter = adapter
        self.spec = AlignerSpec(
            reference=adapter,
            max_error_rate=max_error_rate,
            flags=Where.BACK.value,
            wildcard_ref=wildcards,
            wildcard_query=False,
            indel_cost=1 if indels else 100000,
            min_overlap=min_overlap,
        )
        self.m = len(adapter)
        self.length_bucket = length_bucket
        self.min_dp_batch = min_dp_batch
        self.max_dp_batch = max_dp_batch
        self.max_read_length = max_read_length
        self.use_prefilter = prefilter

        # --- DP input encoding: packed 4-bit classes when possible ---
        info = query_class_info(self.spec)
        self._packed = (
            info is not None
            and os.environ.get("CUTADAPT_TPU_PACK", "1") != "0"
        )
        if self._packed:
            self._query_lut = info[0]
        else:
            self._query_lut = query_lut(self.spec)
        locate = make_batch_locate(self.spec, packed=self._packed)

        def _locate_step(encoded, lengths):
            out = locate(encoded, lengths)
            # Trim coordinate: a 3' match removes read[rstart:]
            stops = jnp.where(out["found"], out["query_start"], lengths)
            return (
                stops
                | (out["errors"] << _ERR_SHIFT)
                | (out["found"].astype(jnp.int32) << _FOUND_SHIFT)
            )

        self._jit_locate = jax.jit(_locate_step)

        # --- prefilter: host C++ shift-and, else device shifted-compare ---
        self._pf_tables = None
        self._jit_prefilter = None
        if prefilter:
            positions_and_kmers = create_positions_and_kmers(
                adapter,
                min_overlap,
                max_error_rate,
                back_adapter=True,
                front_adapter=False,
                internal=True,
            )
            if native.AVAILABLE:
                kf = KmerFinder(
                    positions_and_kmers,
                    ref_wildcards=wildcards,
                    query_wildcards=False,
                )
                self._pf_tables = native.PrefilterTables(kf)
            else:
                pf = make_batch_prefilter(
                    adapter,
                    min_overlap,
                    max_error_rate,
                    back_adapter=True,
                    front_adapter=False,
                    internal=True,
                    ref_wildcards=wildcards,
                    query_wildcards=False,
                )
                self._prefilter_builder = pf.fn
                self._code_lut = pf.code_lut
                self._jit_prefilter = jax.jit(pf.fn)

    # --- host orchestration ----------------------------------------------

    def _bucket_length(self, max_len: int) -> int:
        b = self.length_bucket
        return max(b, (int(max_len) + b - 1) // b * b)

    def _dp_sizes(self, n: int) -> List[int]:
        """One power-of-two-sized dispatch (plus max-size batches for
        huge chunks): device->host round-trip latency dominates wasted
        lanes, so fewer/larger dispatches win, and the shape set stays
        small enough to precompile (see warmup())."""
        sizes = []
        while n > self.max_dp_batch:
            sizes.append(self.max_dp_batch)
            n -= self.max_dp_batch
        s = self.min_dp_batch
        while s < n:
            s *= 2
        sizes.append(s)
        return sizes

    def warmup(self, max_len: int) -> None:
        """Compile the DP program for every batch shape that can occur
        for reads up to max_len (results go to jax's persistent cache)."""
        width = self._bucket_length(max_len)
        w_in = width // 2 if self._packed else width
        s = self.min_dp_batch
        while s <= self.max_dp_batch:
            self._jit_locate(
                np.zeros((s, w_in), np.uint8), np.zeros(s, np.int32)
            ).block_until_ready()
            s *= 2

    def _candidates(self, chunk: ParsedChunk, lens, width) -> np.ndarray:
        if not self.use_prefilter:
            return np.arange(chunk.n_records)
        if self._pf_tables is not None:
            mask = native.kmer_prefilter(
                chunk.buf, chunk.seq_start, lens, self._pf_tables
            )
            return np.flatnonzero(mask)
        # device fallback: ship all read bytes, fetch the mask
        raw = pad_rows(chunk.buf, chunk.seq_start, lens, width)
        pb = self.prefilter_bucket
        B = chunk.n_records
        B_pad = (B + pb - 1) // pb * pb
        codes = self._code_lut[raw]
        if B_pad != B:
            codes_p = np.full((B_pad, width), self._code_lut[0], np.uint8)
            codes_p[:B] = codes
            lens_p = np.zeros(B_pad, np.int32)
            lens_p[:B] = lens
        else:
            codes_p, lens_p = codes, lens
        mask = np.asarray(self._jit_prefilter(codes_p, lens_p))[:B]
        return np.flatnonzero(mask)

    def _encode_batch(self, chunk, sel, rows, width):
        """(rows, width[/2]) uint8 batch holding `sel`'s reads encoded
        (and nibble-packed when the packed kernel is active)."""
        lens = chunk.seq_len
        if native.AVAILABLE:
            w_out = width // 2 if self._packed else width
            out = np.zeros((rows, w_out), np.uint8)
            native.pad_encode(
                chunk.buf, chunk.seq_start, lens, sel, width,
                self._query_lut, pack4=self._packed, out=out,
            )
            return out
        raw = pad_rows(chunk.buf, chunk.seq_start[sel], lens[sel], width)
        enc = self._query_lut[raw]
        if self._packed:
            enc = (enc[:, 0::2] | (enc[:, 1::2] << 4)).astype(np.uint8)
        if len(sel) < rows:
            enc = np.concatenate(
                [enc, np.zeros((rows - len(sel), enc.shape[1]), np.uint8)]
            )
        return enc

    def submit(self, chunk: ParsedChunk) -> PendingChunk:
        """Prefilter + encode on host; dispatch all DP sub-batches."""
        B = chunk.n_records
        lens = np.ascontiguousarray(chunk.seq_len, np.int32)
        if B == 0:
            return PendingChunk(chunk, np.arange(0), lens, [])
        width = self._bucket_length(lens.max())
        cand = self._candidates(chunk, lens, width)
        futures = []
        if len(cand):
            off = 0
            for size in self._dp_sizes(len(cand)):
                sel = cand[off : off + size]
                enc = self._encode_batch(chunk, sel, size, width)
                sub_len = np.zeros(size, np.int32)
                sub_len[: len(sel)] = lens[sel]
                fut = self._jit_locate(enc, sub_len)
                try:
                    # queue the D2H copy right behind the compute so
                    # collect() never waits a full wire round-trip
                    fut.copy_to_host_async()
                except Exception:
                    pass
                futures.append((off, len(sel), fut))
                off += size
        return PendingChunk(chunk, cand, lens, futures)

    def collect(self, pending: PendingChunk) -> Tuple[np.ndarray, dict]:
        """Fetch device results; return (stops (B,) int64, stats)."""
        chunk = pending.parsed
        cand, lens = pending.cand, pending.lens
        B = chunk.n_records
        stops = lens.astype(np.int64)
        stats = {}
        if B == 0:
            stats.update(
                n=0, total_bp=0, with_adapters=0,
                written_lengths=np.zeros(0, np.int64),
            )
            return stops, stats
        n_cand = len(cand)
        if n_cand:
            found_all = np.zeros(n_cand, dtype=bool)
            stops_all = np.zeros(n_cand, dtype=np.int32)
            errors_all = np.zeros(n_cand, dtype=np.int32)
            for off, count, fut in pending.futures:
                arr = np.asarray(fut)[:count]
                stops_all[off : off + count] = arr & ((1 << _STOP_BITS) - 1)
                errors_all[off : off + count] = (arr >> _ERR_SHIFT) & (
                    (1 << _ERR_BITS) - 1
                )
                found_all[off : off + count] = (arr >> _FOUND_SHIFT) & 1
            stops[cand] = stops_all
            removed = lens[cand] - stops_all
            stats["with_adapters"] = int(found_all.sum())
            if found_all.any():
                fidx = cand[found_all]
                rem = removed[found_all]
                err = errors_all[found_all]
                stats["removed_len_errors"] = np.stack([rem, err], axis=1)
                # adjacent base: read[rstart - 1] (empty if rstart == 0)
                rstart = stops_all[found_all]
                prev_pos = chunk.seq_start[fidx] + rstart - 1
                adjacent = np.where(
                    rstart > 0, chunk.buf[np.clip(prev_pos, 0, None)], 0
                )
                stats["adjacent_bases"] = adjacent
        else:
            stats["with_adapters"] = 0
        stats["n"] = B
        stats["total_bp"] = int(lens.sum())
        stats["written_lengths"] = np.bincount(stops)
        return stops, stats

    def process_parsed(self, chunk: ParsedChunk) -> Tuple[np.ndarray, dict]:
        return self.collect(self.submit(chunk))

    def process_chunk(self, data) -> Tuple[bytes, dict]:
        chunk = parse_fastq_chunk(data)
        stops, stats = self.process_parsed(chunk)
        return assemble_fastq(chunk, stops), stats


def process_chunks_pipelined(engine, chunks):
    """Yield (trimmed_bytes, stats) per chunk, in order, overlapping
    chunk i's device work (transfers + DP) with chunk i-1's host
    assembly and chunk i+1's parse/prefilter/encode."""
    pending = None
    for data in chunks:
        nxt = engine.submit(parse_fastq_chunk(data))
        if pending is not None:
            stops, stats = engine.collect(pending)
            yield assemble_fastq(pending.parsed, stops), stats
        pending = nxt
    if pending is not None:
        stops, stats = engine.collect(pending)
        yield assemble_fastq(pending.parsed, stops), stats
