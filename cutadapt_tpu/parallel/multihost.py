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


def _record_starts_stream(path: str, fmt: str):
    """Yield (record_index, byte_offset) for every record start, plus
    a final (n_records, file_size) sentinel. One streaming pass."""
    nl = 10
    offset = 0
    rec = 0
    line_count = 0  # lines seen (fastq: record starts at line % 4 == 0)
    at_line_start = True
    with open(path, "rb") as f:
        while True:
            block = f.read(_SCAN_BLOCK)
            if not block:
                break
            buf = np.frombuffer(block, np.uint8)
            newlines = np.flatnonzero(buf == nl)
            # line starts in this block: after every newline, plus the
            # block start when the previous block ended a line
            line_starts = newlines + 1
            if at_line_start:
                line_starts = np.concatenate(([0], line_starts))
            line_starts = line_starts[line_starts < len(buf)]
            if fmt == "fastq":
                idx = (line_count + np.arange(len(line_starts))) % 4 == 0
                for p in line_starts[idx]:
                    yield rec, offset + int(p)
                    rec += 1
            else:  # fasta: records start at '>' in column 0
                hits = line_starts[buf[line_starts] == ord(">")]
                for p in hits:
                    yield rec, offset + int(p)
                    rec += 1
            line_count += len(line_starts)
            at_line_start = bool(len(buf)) and buf[-1] == nl
            offset += len(buf)
    yield rec, offset


def plan_shards(
    path: str, n_hosts: int, fmt: str = "fastq"
) -> List[Tuple[int, int]]:
    """Contiguous record-aligned byte ranges splitting `path` into
    n_hosts near-equal record counts. Needs one counting pass first
    (record totals), then reuses the same pass's boundary offsets."""
    # single pass: collect every record offset's running count at the
    # fractions once the total is known -> two passes are avoided by
    # sampling all offsets into an array
    offsets = [off for _, off in _record_starts_stream(path, fmt)]
    size = offsets[-1]
    offsets = offsets[:-1]  # drop the sentinel
    n = len(offsets)
    bounds = [offsets[(n * h) // n_hosts] if n else 0
              for h in range(n_hosts)] + [size]
    return [(bounds[h], bounds[h + 1]) for h in range(n_hosts)]


def plan_paired_shards(
    path1: str, path2: str, n_hosts: int, fmt: str = "fastq"
) -> List[Tuple[Tuple[int, int], Tuple[int, int]]]:
    """Per-host ((start1, end1), (start2, end2)) ranges with EQUAL
    record counts on both sides (required for pair synchronization)."""
    plans = []
    for path in (path1, path2):
        offsets = [off for _, off in _record_starts_stream(path, fmt)]
        size = offsets[-1]
        offsets = offsets[:-1]
        plans.append((offsets, size))
    n = min(len(plans[0][0]), len(plans[1][0]))
    out = []
    for h in range(n_hosts):
        lo, hi = (n * h) // n_hosts, (n * (h + 1)) // n_hosts
        rng = []
        for offsets, size in plans:
            start = offsets[lo] if lo < len(offsets) else size
            end = offsets[hi] if hi < len(offsets) else size
            rng.append((start, end))
        out.append((rng[0], rng[1]))
    return out


class RangeReader:
    """A binary file restricted to [start, end) — the per-host input
    shard view the chunk readers consume."""

    def __init__(self, file: BinaryIO, start: int, end: int):
        self._file = file
        self._end = end
        file.seek(start)

    def read(self, n: int = -1) -> bytes:
        remaining = self._end - self._file.tell()
        if remaining <= 0:
            return b""
        if n is None or n < 0 or n > remaining:
            n = remaining
        return self._file.read(n)

    def close(self):
        self._file.close()

    def __getattr__(self, name):
        return getattr(self._file, name)


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
