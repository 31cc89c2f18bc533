"""
Batched (TPU) execution engine for the flagship configuration:
single-end 3' adapter trimming (`-a ADAPTER`), the reference's headline
benchmark case.

Data flow per chunk:

1. Host: vectorized FASTQ chunk parsing (NumPy) into offset arrays and
   a padded (B, L) byte matrix.
2. Device: shift-and k-mer prefilter over the whole batch -> bool mask
   of reads that could contain the adapter (typically a small
   fraction).
3. Host: compact the passing reads into fixed-size DP batches.
4. Device: the exact banded-semantics alignment kernel
   (:mod:`cutadapt_tpu.ops.align_batch`) -> per-read trim coordinates
   identical to the scalar engine.
5. Device: per-chunk statistics tensors ((length, errors) histograms,
   adjacent-base counts, written-length histogram) — these are the
   fixed-shape counters that `psum` reduces across a device mesh in
   multi-chip runs.
6. Host: vectorized assembly of the trimmed FASTQ bytes (order
   preserved).

The engine produces byte-identical output to the per-read host
pipeline; `bench.py` asserts this on every run.
"""

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .adapters import Where
from .ops.align_batch import AlignerSpec, make_batch_locate, query_lut
from .ops.kmer_batch import make_batch_prefilter

NEWLINE = 10
CARRIAGE = 13


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
    """Vectorized FASTQ parsing of a record-aligned chunk."""
    buf = np.frombuffer(data, dtype=np.uint8)
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
        buf, head_start, head_end, seq_start, seq_len, qual_start,
        has_cr=bool(cr.any()),
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
    idx = starts.astype(np.int32)[:, None] + np.arange(width, dtype=np.int32)
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
    """Build trimmed FASTQ bytes: '@header\\nseq[:stop]\\n+\\nqual[:stop]\\n'.

    Fast path: records whose bytes are unchanged (untrimmed, bare '+'
    separator, LF line endings) are copied in contiguous runs straight
    from the input buffer; only trimmed records are rebuilt.
    """
    if chunk.has_cr:
        return _assemble_fastq_scatter(chunk, stops)
    buf = chunk.buf
    mv = memoryview(buf)
    stops = np.asarray(stops, dtype=np.int64)
    seq_len = chunk.seq_len
    seq_start = chunk.seq_start
    qual_start = chunk.qual_start
    head_start = chunk.head_start
    n = chunk.n_records

    # record start offsets ('@' position) and exclusive ends
    rec_begin = head_start - 1
    rec_end = np.empty(n, dtype=np.int64)
    rec_end[:-1] = rec_begin[1:]
    if n:
        rec_end[-1] = len(buf)

    # A record can be copied verbatim when nothing was trimmed and its
    # on-disk form already equals what the writer would emit.
    plus_is_bare = (qual_start - seq_start - seq_len) == 3  # "\n+\n"
    last_ok = rec_end - qual_start == seq_len + 1
    unchanged = (stops == seq_len) & plus_is_bare & last_ok

    parts = []
    append = parts.append
    i = 0
    changed_idx = np.flatnonzero(~unchanged)
    prev = 0
    for i in changed_idx:
        if prev < i:
            append(mv[rec_begin[prev] : rec_begin[i]])
        stop = int(stops[i])
        ss = int(seq_start[i])
        qs = int(qual_start[i])
        append(mv[rec_begin[i] : ss + stop])
        append(b"\n+\n")
        append(mv[qs : qs + stop])
        append(b"\n")
        prev = i + 1
    if prev < n:
        append(mv[rec_begin[prev] : rec_end[n - 1]])
    return b"".join(parts)


def _assemble_fastq_scatter(chunk: ParsedChunk, stops: np.ndarray) -> bytes:
    """General (CRLF-tolerant) vectorized assembly via range scatters."""
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
        dp_batch: int = 4096,
        prefilter_bucket: int = 8192,
        max_read_length: int = 1024,
        prefilter: bool = True,
        donate: bool = True,
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
        self.dp_batch = dp_batch
        self.max_read_length = max_read_length
        self.use_prefilter = prefilter
        # byte translation happens on the host (numpy take is fast;
        # TPU gathers are not)
        self._query_lut = query_lut(self.spec)
        self._locate_builder = make_batch_locate(self.spec)
        if prefilter:
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
        self._jit_prefilter = jax.jit(self._prefilter_step) if prefilter else None
        self._jit_locate = jax.jit(self._locate_step)

    # --- jitted device programs -----------------------------------------

    def _prefilter_step(self, codes, lengths):
        return self._prefilter_builder(codes, lengths)

    def _locate_step(self, encoded, lengths):
        out = self._locate_builder(encoded, lengths)
        # Trim coordinate: a 3' match removes read[rstart:]
        stops = jnp.where(out["found"], out["query_start"], lengths)
        return stops, out["found"], out["errors"], out["score"], out["query_start"]

    # --- host orchestration ----------------------------------------------

    def _bucket_length(self, max_len: int) -> int:
        b = self.length_bucket
        return max(b, (int(max_len) + b - 1) // b * b)

    def process_parsed(self, chunk: ParsedChunk) -> Tuple[np.ndarray, dict]:
        """Return (stops (B,) int64, stats dict of numpy arrays)."""
        B = chunk.n_records
        lens = chunk.seq_len.astype(np.int32)
        stops = lens.astype(np.int64).copy()
        stats = {}
        if B == 0:
            return stops, stats
        width = self._bucket_length(lens.max() if B else 0)
        raw = pad_rows(chunk.buf, chunk.seq_start, lens, width)

        if self.use_prefilter:
            # pad the batch to a bucketed size so the prefilter program
            # compiles for a small number of distinct shapes
            pb = self.prefilter_bucket
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
            cand = np.flatnonzero(mask)
        else:
            cand = np.arange(B)

        if len(cand):
            D = self.dp_batch
            n_cand = len(cand)
            padded_count = (n_cand + D - 1) // D * D
            found_all = np.zeros(n_cand, dtype=bool)
            stops_all = np.zeros(n_cand, dtype=np.int32)
            errors_all = np.zeros(n_cand, dtype=np.int32)
            encoded = self._query_lut[raw]
            # dispatch all sub-batches asynchronously and convert the
            # results afterwards: every host<->device round-trip pays
            # real latency (especially over a device tunnel)
            pending = []
            for off in range(0, padded_count, D):
                sel = cand[off : off + D]
                sub_raw = encoded[sel]
                sub_len = lens[sel]
                if len(sel) < D:
                    pad = D - len(sel)
                    sub_raw = np.concatenate(
                        [sub_raw, np.zeros((pad, width), np.uint8)]
                    )
                    sub_len = np.concatenate([sub_len, np.zeros(pad, np.int32)])
                pending.append(
                    (off, len(sel), self._jit_locate(sub_raw, sub_len))
                )
            for off, count, (s, f, e, sc, qs) in pending:
                found_all[off : off + count] = np.asarray(f)[:count]
                stops_all[off : off + count] = np.asarray(s)[:count]
                errors_all[off : off + count] = np.asarray(e)[:count]
            stops[cand] = stops_all
            removed = lens[cand] - stops_all
            found = found_all
            stats["with_adapters"] = int(found.sum())
            if found.any():
                fidx = cand[found]
                rem = removed[found]
                err = errors_all[found]
                stats["removed_len_errors"] = np.stack([rem, err], axis=1)
                # adjacent base: read[rstart - 1] (empty if rstart == 0)
                rstart = stops_all[found]
                prev_pos = chunk.seq_start[fidx] + rstart - 1
                adjacent = np.where(
                    rstart > 0, chunk.buf[np.clip(prev_pos, 0, None)], 0
                )
                stats["adjacent_bases"] = adjacent
        else:
            stats["with_adapters"] = 0
        stats["n"] = B
        stats["total_bp"] = int(lens.sum())
        stats["written_lengths"] = np.bincount(stops.astype(np.int64))
        return stops, stats

    def process_chunk(self, data) -> Tuple[bytes, dict]:
        chunk = parse_fastq_chunk(data)
        stops, stats = self.process_parsed(chunk)
        return assemble_fastq(chunk, stops), stats
