"""
Multi-host data parallelism: per-host input shards, ordered output,
cross-host statistics merge.

The single-host engine is data-parallel over read chunks; a pod slice
adds one more level of the same thing: every host process takes a
CONTIGUOUS record-aligned byte range of the input, drives its own
chunk pipeline (with its local chips as the shard mesh), and writes
its own output shard. Because the ranges are contiguous in input
order, concatenating the host output shards in host order reproduces
the single-host byte stream exactly — the multi-host form of the
reference's OrderedChunkWriter invariant
(/root/reference/src/cutadapt/runners.py:224-245).

Statistics reduce on two rails, matching the single-host design:
- device counter tensors psum over the global mesh
  (parallel/stats.DeviceStatsReducer — jax collectives span hosts
  when the mesh does);
- the host-side Statistics objects merge with the same ``+=`` chain
  the reference sends over worker pipes (runners.py:203-211), here
  serialized per host (CUTADAPT_TPU_STATS_PICKLE) and folded by
  ``merge_statistics``.

Shard planning makes one streaming pass over the input to find exact
record boundaries (the same cost class as the reference's single
reader process, which also streams every byte through one process).
Compressed single-file inputs are not byte-addressable; shard them by
file instead (one of N files per host) or decompress ahead.

Driving it: CUTADAPT_TPU_BYTE_RANGE="start:end[,start2:end2]" limits
a CLI run to the given range of each input file. A coordinator (or
each host, deterministically) computes the plan with
``plan_shards``/``plan_paired_shards``, every host runs the same argv
plus its range and per-host output paths, and host 0 concatenates
outputs and merges statistics.
"""

import pickle
from typing import BinaryIO, List, Optional, Sequence, Tuple

import numpy as np

_SCAN_BLOCK = 8 * 1024 * 1024


def _record_start_blocks(path: str, fmt: str):
    """Yield (block_base_offset, record_start_offsets_in_block) numpy
    batches for one streaming pass, then a final (file_size, None)
    sentinel — per-block vectorized, never one Python object per
    record."""
    nl = 10
    offset = 0
    line_count = 0  # lines seen (fastq: record starts at line % 4 == 0)
    at_line_start = True
    with open(path, "rb") as f:
        while True:
            block = f.read(_SCAN_BLOCK)
            if not block:
                break
            buf = np.frombuffer(block, np.uint8)
            # line starts in this block: after every newline, plus the
            # block start when the previous block ended a line
            line_starts = np.flatnonzero(buf == nl) + 1
            if at_line_start:
                line_starts = np.concatenate(([0], line_starts))
            line_starts = line_starts[line_starts < len(buf)]
            if fmt == "fastq":
                recs = line_starts[
                    (line_count + np.arange(len(line_starts))) % 4 == 0
                ]
            else:  # fasta: records start at '>' in column 0
                recs = line_starts[buf[line_starts] == ord(">")]
            yield offset, recs
            line_count += len(line_starts)
            at_line_start = bool(len(buf)) and buf[-1] == nl
            offset += len(buf)
    yield offset, None


def _count_records(path: str, fmt: str) -> Tuple[int, int]:
    """(record count, file size) in one streaming pass, O(1) memory."""
    n = 0
    for base, recs in _record_start_blocks(path, fmt):
        if recs is None:
            return n, base
        n += len(recs)
    return n, 0


def _offsets_at(path: str, fmt: str, targets: Sequence[int]) -> List[int]:
    """Byte offsets of the record starts at the given (sorted) record
    indexes — one streaming pass holding only the current block."""
    out = []
    pos = 0
    seen = 0
    for base, recs in _record_start_blocks(path, fmt):
        if recs is None or pos >= len(targets):
            break
        while pos < len(targets) and targets[pos] < seen + len(recs):
            out.append(base + int(recs[targets[pos] - seen]))
            pos += 1
        seen += len(recs)
    return out


def plan_shards(
    path: str, n_hosts: int, fmt: str = "fastq"
) -> List[Tuple[int, int]]:
    """Contiguous record-aligned byte ranges splitting `path` into
    n_hosts near-equal record counts. Two vectorized streaming passes
    (count, then the n_hosts boundary offsets) with O(n_hosts) memory
    — pod-scale inputs never materialize per-record state."""
    n, size = _count_records(path, fmt)
    if n == 0:
        bounds = [0] * n_hosts + [size]
    else:
        targets = [(n * h) // n_hosts for h in range(n_hosts)]
        bounds = _offsets_at(path, fmt, targets) + [size]
    return [(bounds[h], bounds[h + 1]) for h in range(n_hosts)]


def plan_paired_shards(
    path1: str, path2: str, n_hosts: int, fmt: str = "fastq"
) -> List[Tuple[Tuple[int, int], Tuple[int, int]]]:
    """Per-host ((start1, end1), (start2, end2)) ranges with EQUAL
    record counts on both sides (required for pair synchronization)."""
    counts = [_count_records(p, fmt) for p in (path1, path2)]
    n = min(c[0] for c in counts)
    # boundary record indexes 0..n (index n maps to file size)
    targets = [(n * h) // n_hosts for h in range(n_hosts + 1)]
    sides = []
    for path, (n_side, size) in zip((path1, path2), counts):
        inner = [t for t in targets if t < n_side]
        offs = _offsets_at(path, fmt, inner)
        offs += [size] * (len(targets) - len(inner))
        sides.append(offs)
    return [
        ((sides[0][h], sides[0][h + 1]), (sides[1][h], sides[1][h + 1]))
        for h in range(n_hosts)
    ]


class RangeReader:
    """A binary file restricted to [start, end) — the per-host input
    shard view the chunk readers consume. Supports every access
    pattern the readers use: block ``read`` (chunk pipeline),
    ``readline``/iteration (per-read host parser), ``readinto``."""

    def __init__(self, file: BinaryIO, start: int, end: int):
        self._file = file
        self._end = end
        file.seek(start)

    def _remaining(self) -> int:
        return self._end - self._file.tell()

    def read(self, n: int = -1) -> bytes:
        remaining = self._remaining()
        if remaining <= 0:
            return b""
        if n is None or n < 0 or n > remaining:
            n = remaining
        return self._file.read(n)

    def readline(self, limit: int = -1) -> bytes:
        remaining = self._remaining()
        if remaining <= 0:
            return b""
        if limit is None or limit < 0 or limit > remaining:
            limit = remaining
        return self._file.readline(limit)

    def readinto(self, b) -> int:
        remaining = self._remaining()
        if remaining <= 0:
            return 0
        if len(b) > remaining:
            b = memoryview(b)[:remaining]
        return self._file.readinto(b)

    def __iter__(self):
        # iteration must respect the range end: type-level special
        # method lookup would bypass __getattr__ delegation, so the
        # host parser's `for line in file` needs this explicitly
        return iter(self.readline, b"")

    def close(self):
        self._file.close()

    def __getattr__(self, name):
        return getattr(self._file, name)


def maybe_range_readers(files, env_value: Optional[str]):
    """Wrap open input streams in their CUTADAPT_TPU_BYTE_RANGE shard
    views when the env is set; pass through otherwise. Every input
    opener (in-process and the reader process) must go through this so
    the shard contract holds on all execution paths."""
    if not env_value:
        return files
    return [
        RangeReader(f, *rng)
        for f, rng in zip(files, parse_byte_range_env(env_value))
    ]


def parse_byte_range_env(value: str) -> List[Tuple[int, int]]:
    """'start:end[,start2:end2]' -> per-input-file ranges."""
    ranges = []
    for part in value.split(","):
        start, _, end = part.partition(":")
        ranges.append((int(start), int(end)))
    return ranges


def merge_statistics(paths: Sequence[str]):
    """Fold per-host pickled Statistics (CUTADAPT_TPU_STATS_PICKLE)
    into one, in host order — the cross-host form of the reference's
    worker-pipe stats merge."""
    total = None
    for path in paths:
        with open(path, "rb") as f:
            stats = pickle.load(f)
        if total is None:
            total = stats
        else:
            total += stats
    return total
