"""
Record-aligned FASTQ chunk parsing and assembly (batch-path I/O).

A *parsed chunk* is a structure-of-arrays view over one record-aligned
FASTQ byte buffer: per-record offsets for header/sequence/quality plus
sequence lengths. The batch engine operates on these offset arrays —
reads are never materialized as Python objects on the fast path.

Assembly is the inverse: given per-read windows [win_start, win_stop)
into each original sequence and a keep-mask, emit the trimmed FASTQ
bytes in input order. Both directions have a C++ implementation
(native/hostops.cpp fastq_parse / assemble_fastq*) and a vectorized
NumPy fallback with byte-identical output.

Reference parity: the chunk contract matches dnaio's read_chunks
record-boundary splitting (used at /root/reference/src/cutadapt/
runners.py:116-126); parsing accepts the same record shapes as dnaio's
FASTQ parser (CRLF, missing final newline, '+' comment lines).
"""

from typing import Optional

import numpy as np

from .. import native

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
    """Parse a record-aligned FASTQ chunk into offset arrays.

    Malformed chunks raise FastqFormatError so the CLI reports them
    like the per-read reader does (clean message, exit code 1)."""
    from .records import FastqFormatError

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


def assemble_window(chunk, win_start, win_stop, keep) -> bytes:
    """Assemble kept records' [win_start, win_stop) sequence/quality
    windows into trimmed FASTQ bytes, preserving input order."""
    if native.AVAILABLE:
        return native.assemble_fastq_window(
            chunk.buf, chunk.head_start, chunk.head_end, chunk.seq_start,
            chunk.qual_start, win_start, win_stop, keep,
        )
    # NumPy fallback: compress to kept records and reuse the flat
    # scatter assembler with shifted sequence starts
    idx = np.flatnonzero(keep)
    sub = ParsedChunk(
        chunk.buf,
        chunk.head_start[idx],
        chunk.head_end[idx],
        chunk.seq_start[idx] + win_start[idx],
        (win_stop[idx] - win_start[idx]).astype(np.int32),
        chunk.qual_start[idx] + win_start[idx],
        has_cr=chunk.has_cr,
    )
    return _assemble_fastq_np(sub, (win_stop[idx] - win_start[idx]))
