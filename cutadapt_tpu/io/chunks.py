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


def zero_cap_chunk(chunk: ParsedChunk, quality_base: int) -> ParsedChunk:
    """A ParsedChunk whose quality bytes below `quality_base` are
    raised to it (ZeroCapper), leaving all other bytes untouched."""
    lut = np.arange(256, dtype=np.uint8)
    lut[:quality_base] = quality_base
    buf = chunk.buf.copy()
    lens = chunk.seq_len.astype(np.int64)
    total = int(lens.sum())
    if total:
        reps = np.repeat(np.arange(chunk.n_records), lens)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        idx = chunk.qual_start[reps] + offs
        buf[idx] = lut[buf[idx]]
    return ParsedChunk(
        buf, chunk.head_start, chunk.head_end, chunk.seq_start,
        chunk.seq_len, chunk.qual_start, has_cr=chunk.has_cr,
    )


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
    if out_total == 0:
        return b""
    out_obj, out = native._fresh_bytes(out_total)
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
    return out_obj


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


_WS_TABLE = np.zeros(256, bool)
for _b in b"\t\x0b\x0c\r ":
    _WS_TABLE[_b] = True


def parse_fasta_chunk(data, first_line: int = 0) -> ParsedChunk:
    """Parse a record-aligned FASTA chunk into a ParsedChunk.

    Semantics mirror the per-record FASTA reader (io/fastq.parse_fasta):
    every line is whitespace-stripped at both ends, '#' lines are
    comments, blank lines are ignored, sequences may span lines.
    The multi-line sequences are compacted into a contiguous region
    appended to the chunk buffer, so all window/assembly machinery
    works unchanged; quality offsets alias the sequence (FASTA has
    none — quality-dependent stages must not run).

    first_line -- absolute line number of the chunk's first line, used
    for error messages matching the streaming reader's.
    """
    from .records import FastaFormatError

    buf = np.frombuffer(data, dtype=np.uint8)
    n_bytes = len(buf)
    if n_bytes == 0:
        empty64 = np.zeros(0, np.int64)
        return ParsedChunk(buf, empty64, empty64, empty64,
                           np.zeros(0, np.int32), empty64)
    nl = np.flatnonzero(buf == NEWLINE)
    if len(nl) == 0 or nl[-1] != n_bytes - 1:
        nl = np.append(nl, n_bytes)
    starts = np.empty_like(nl)
    starts[0] = 0
    starts[1:] = nl[:-1] + 1
    ends = nl.copy()

    # strip both line ends; only lines with edge whitespace need work
    lo = starts.copy()
    hi = ends.copy()
    nonempty = hi > lo
    edge_ws = nonempty.copy()
    edge_ws[nonempty] = (
        _WS_TABLE[buf[lo[nonempty]]] | _WS_TABLE[buf[hi[nonempty] - 1]]
    )
    for li in np.flatnonzero(edge_ws):
        s, e = int(lo[li]), int(hi[li])
        while s < e and _WS_TABLE[buf[s]]:
            s += 1
        while e > s and _WS_TABLE[buf[e - 1]]:
            e -= 1
        lo[li], hi[li] = s, e

    blank = hi <= lo
    first_ch = buf[np.minimum(lo, n_bytes - 1)]
    is_comment = ~blank & (first_ch == ord("#"))
    is_header = ~blank & (first_ch == ord(">"))
    is_seq = ~blank & ~is_comment & ~is_header
    record_of = np.cumsum(is_header) - 1
    stray = is_seq & (record_of < 0)
    if stray.any():
        raise FastaFormatError(
            "Expected '>' at beginning of record",
            line=first_line + int(np.flatnonzero(stray)[0]),
        )

    header_lines = np.flatnonzero(is_header)
    n_records = len(header_lines)
    head_start = (lo[header_lines] + 1).astype(np.int64)
    head_end = hi[header_lines].astype(np.int64)

    seq_lines = np.flatnonzero(is_seq)
    line_lens = (hi - lo)[seq_lines].astype(np.int64)
    seq_len = np.bincount(
        record_of[seq_lines], weights=line_lens, minlength=n_records
    ).astype(np.int32)

    total = int(line_lens.sum())
    if total:
        dst0 = np.cumsum(line_lens) - line_lens
        reps = np.repeat(np.arange(len(seq_lines)), line_lens)
        offs = np.arange(total, dtype=np.int64) - np.repeat(dst0, line_lens)
        compact = buf[lo[seq_lines][reps] + offs]
    else:
        compact = np.zeros(0, np.uint8)
    seq_len64 = seq_len.astype(np.int64)
    seq_start = n_bytes + np.cumsum(seq_len64) - seq_len64
    combined = np.concatenate([buf, compact])
    return ParsedChunk(
        combined, head_start, head_end, seq_start, seq_len,
        seq_start.copy(),
    )


def assemble_fasta_window(chunk, win_start, win_stop, keep) -> bytes:
    """Assemble kept records as unwrapped FASTA ('>header\\nseq\\n')."""
    idx = np.flatnonzero(keep)
    head_len = (chunk.head_end - chunk.head_start)[idx]
    seq_len = (win_stop[idx] - win_start[idx]).astype(np.int64)
    rec_len = 1 + head_len + 1 + seq_len + 1
    total_out = int(rec_len.sum())
    if total_out == 0:
        return b""
    out_obj, out = native._fresh_bytes(total_out)
    pos = np.cumsum(rec_len) - rec_len
    out[pos] = ord(">")
    pos = pos + 1
    _scatter_ranges(out, pos, chunk.head_start[idx], head_len, chunk.buf)
    pos = pos + head_len
    out[pos] = NEWLINE
    pos = pos + 1
    _scatter_ranges(
        out, pos, chunk.seq_start[idx] + win_start[idx], seq_len, chunk.buf
    )
    pos = pos + seq_len
    out[pos] = NEWLINE
    return out_obj


_TO_UPPER = np.arange(256, dtype=np.uint8)
_TO_UPPER[ord("a"):ord("z") + 1] -= 32
_TO_LOWER = np.arange(256, dtype=np.uint8)
_TO_LOWER[ord("A"):ord("Z") + 1] += 32


def assemble_fasta_transform(
    chunk, win_start, win_stop, rem_start, rem_stop, keep, mode
) -> bytes:
    """assemble_fasta_window with the mask/lowercase adapter-action
    transform: records keep their full [win_start, win_stop) extent,
    positions outside the remainder interval [rem_start, rem_stop)
    become 'N' (mode 1, 'mask') or lowercase with the remainder
    uppercased (mode 2, 'lowercase') — the FASTA-output counterpart of
    native assemble_fastq_transform (reference modifiers.py:163-189)."""
    idx = np.flatnonzero(keep)
    head_len = (chunk.head_end - chunk.head_start)[idx]
    seq_len = (win_stop[idx] - win_start[idx]).astype(np.int64)
    rec_len = 1 + head_len + 1 + seq_len + 1
    total_out = int(rec_len.sum())
    if total_out == 0:
        return b""
    out_obj, out = native._fresh_bytes(total_out)
    pos = np.cumsum(rec_len) - rec_len
    out[pos] = ord(">")
    pos = pos + 1
    _scatter_ranges(out, pos, chunk.head_start[idx], head_len, chunk.buf)
    pos = pos + head_len
    out[pos] = NEWLINE
    pos = pos + 1
    _scatter_ranges(
        out, pos, chunk.seq_start[idx] + win_start[idx], seq_len, chunk.buf
    )
    total = int(seq_len.sum())
    if total:
        reps = np.repeat(np.arange(len(idx)), seq_len)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(seq_len) - seq_len, seq_len
        )
        in_read = win_start[idx][reps] + offs
        inside = (in_read >= rem_start[idx][reps]) & (
            in_read < rem_stop[idx][reps]
        )
        oidx = pos[reps] + offs
        if mode == 1:
            out[oidx[~inside]] = ord("N")
        else:
            out[oidx[inside]] = _TO_UPPER[out[oidx[inside]]]
            out[oidx[~inside]] = _TO_LOWER[out[oidx[~inside]]]
    pos = pos + seq_len
    out[pos] = NEWLINE
    return out_obj


_BAM_CODES = np.frombuffer(b"=ACMGRSVTWYHKDBN", np.uint8)
_BAM_NIBBLES = np.zeros((256, 2), np.uint8)
for _b in range(256):
    _BAM_NIBBLES[_b, 0] = _BAM_CODES[_b >> 4]
    _BAM_NIBBLES[_b, 1] = _BAM_CODES[_b & 0xF]


def parse_bam_chunk(data, quals_required: bool = True) -> ParsedChunk:
    """Parse a chunk of raw BAM alignment records (no header) into a
    ParsedChunk with decoded ASCII sequences and phred+33 qualities.

    Semantics mirror the streaming reader (io/fastq.parse_bam_records):
    4-bit sequence codes decode through '=ACMGRSVTWYHKDBN',
    reverse-strand records (flag 0x10) are reverse-complemented with
    reversed qualities, and a leading 0xFF quality byte means the
    record has no qualities — an error when the output needs them
    (quals_required), mirroring the FASTQ writer's message."""
    import struct

    from .records import BamFormatError, reverse_complement

    raw = np.frombuffer(data, np.uint8)
    view = bytes(data) if not isinstance(data, (bytes, bytearray)) else data
    n_bytes = len(raw)

    names = []  # (start, length) into raw
    seqs = []  # (packed_start, l_seq)
    quals = []  # start of raw phred bytes
    offset = 0
    unpack = struct.unpack_from
    while offset < n_bytes:
        if offset + 4 > n_bytes:
            raise BamFormatError("Truncated BAM record", line=None)
        (block_size,) = unpack("<i", view, offset)
        start = offset + 4
        if start + block_size > n_bytes:
            raise BamFormatError("Truncated BAM record", line=None)
        l_read_name = view[start + 8]
        (n_cigar_op,) = unpack("<H", view, start + 12)
        (flag,) = unpack("<H", view, start + 14)
        (l_seq,) = unpack("<i", view, start + 16)
        pos = start + 32
        names.append((pos, l_read_name - 1))
        pos += l_read_name + n_cigar_op * 4
        seqs.append((pos, l_seq))
        pos += (l_seq + 1) // 2
        quals.append(pos)
        offset = start + block_size

    n_records = len(names)
    name_start = np.array([n[0] for n in names], np.int64)
    name_len = np.array([n[1] for n in names], np.int64)
    seq_len = np.array([s[1] for s in seqs], np.int64)

    # output layout: [headers][sequences][qualities]
    head_start = np.cumsum(name_len) - name_len
    head_end = head_start + name_len
    seq_base = int(head_end[-1]) if n_records else 0
    seq_start = seq_base + np.cumsum(seq_len) - seq_len
    qual_base = seq_base + int(seq_len.sum())
    qual_start = qual_base + (seq_start - seq_base)
    out = np.empty(qual_base + int(seq_len.sum()), np.uint8)

    _scatter_ranges(out, head_start, name_start, name_len, raw)
    for i in range(n_records):
        p0, l_seq = seqs[i]
        decoded = _BAM_NIBBLES[
            raw[p0 : p0 + (l_seq + 1) // 2]
        ].reshape(-1)[:l_seq]
        q0 = quals[i]
        qraw = raw[q0 : q0 + l_seq]
        if l_seq and qraw[0] == 0xFF:
            if quals_required:
                name = bytes(raw[names[i][0] : sum(names[i])]).decode(
                    "latin-1"
                )
                raise ValueError(
                    f"Record {name!r} has no qualities, cannot be "
                    "written to FASTQ"
                )
            qbytes = np.full(l_seq, ord("I"), np.uint8)  # placeholder
        else:
            qbytes = qraw + 33
        (flag,) = unpack("<H", view, names[i][0] - 32 + 14)
        if flag & 16:  # stored reverse-complemented
            decoded = np.frombuffer(
                reverse_complement(
                    decoded.tobytes().decode("latin-1")
                ).encode("latin-1"),
                np.uint8,
            )
            qbytes = qbytes[::-1]
        out[seq_start[i] : seq_start[i] + l_seq] = decoded
        out[qual_start[i] : qual_start[i] + l_seq] = qbytes

    return ParsedChunk(
        out, head_start, head_end, seq_start,
        seq_len.astype(np.int32), qual_start,
    )
