"""
Multi-host data parallelism contract (parallel/multihost.py):
contiguous record-aligned input shards, per-host output files that
concatenate to the single-host byte stream, and a cross-host
Statistics merge that renders the identical report.

Runs every "host" in this one process (the sharding contract is pure
data flow; jax.distributed only changes where the psum runs).
"""

import json
import logging
import os
import random

import pytest

from cutadapt_tpu.cli import main
from cutadapt_tpu.parallel.multihost import (
    merge_statistics,
    plan_paired_shards,
    plan_shards,
)
from cutadapt_tpu.report import full_report

ADAPTER = "AGATCGGAAGAGCACACGTC"


def _write_fastq(path, n, rng, adapter):
    with open(path, "w") as f:
        for i in range(n):
            L = rng.randint(8, 90)
            s = "".join(rng.choice("ACGT") for _ in range(L))
            if rng.random() < 0.5 and L > 25:
                p = rng.randint(0, L - 20)
                s = (s[:p] + adapter + s[p:])[:L]
            q = "".join(chr(rng.randint(35, 72)) for _ in s)
            f.write(f"@r{i} c\n{s}\n+\n{q}\n")


def _run(argv, env):
    for k, v in env.items():
        os.environ[k] = v
    try:
        stats = main(argv)
    finally:
        for k in env:
            os.environ.pop(k, None)
        logging.root.handlers.clear()
    return stats


def test_single_end_shards_concatenate(tmp_path):
    inp = os.fspath(tmp_path / "in.fastq")
    _write_fastq(inp, 3001, random.Random(5), ADAPTER)

    base = ["--quiet", "-a", f"ad={ADAPTER}", "-q", "12", "-m", "10"]
    full_out = os.fspath(tmp_path / "full.fastq")
    full_json = os.fspath(tmp_path / "full.json")
    stats_full = _run(
        base + ["-o", full_out, "--json", full_json, inp],
        {"CUTADAPT_TPU_BATCH": "1"},
    )

    n_hosts = 3
    shards = plan_shards(inp, n_hosts, "fastq")
    assert shards[0][0] == 0 and shards[-1][1] == os.path.getsize(inp)
    assert all(a[1] == b[0] for a, b in zip(shards, shards[1:]))

    parts = []
    pickles = []
    for h, (start, end) in enumerate(shards):
        out = os.fspath(tmp_path / f"part{h}.fastq")
        pkl = os.fspath(tmp_path / f"part{h}.stats")
        _run(
            base + ["-o", out, inp],
            {
                "CUTADAPT_TPU_BATCH": "1",
                "CUTADAPT_TPU_BYTE_RANGE": f"{start}:{end}",
                "CUTADAPT_TPU_STATS_PICKLE": pkl,
            },
        )
        parts.append(out)
        pickles.append(pkl)

    merged_bytes = b"".join(open(p, "rb").read() for p in parts)
    assert merged_bytes == open(full_out, "rb").read()
    assert merged_bytes  # not vacuous

    merged = merge_statistics(pickles)
    assert full_report(merged, 0.0, 0.5) == full_report(stats_full, 0.0, 0.5)
    assert merged.as_json() == stats_full.as_json()


def test_paired_shards_concatenate(tmp_path):
    r1 = os.fspath(tmp_path / "r1.fastq")
    r2 = os.fspath(tmp_path / "r2.fastq")
    rng = random.Random(9)
    _write_fastq(r1, 2000, rng, ADAPTER)
    _write_fastq(r2, 2000, rng, "CTGTCTCTTATACACATCT")

    base = [
        "--quiet", "-a", f"a1={ADAPTER}",
        "-A", "a2=CTGTCTCTTATACACATCT", "-m", "12",
    ]
    fo1 = os.fspath(tmp_path / "f1.fastq")
    fo2 = os.fspath(tmp_path / "f2.fastq")
    stats_full = _run(
        base + ["-o", fo1, "-p", fo2, r1, r2],
        {"CUTADAPT_TPU_BATCH": "1"},
    )

    shards = plan_paired_shards(r1, r2, 2, "fastq")
    parts1, parts2, pickles = [], [], []
    for h, ((s1, e1), (s2, e2)) in enumerate(shards):
        o1 = os.fspath(tmp_path / f"p1-{h}.fastq")
        o2 = os.fspath(tmp_path / f"p2-{h}.fastq")
        pkl = os.fspath(tmp_path / f"p{h}.stats")
        _run(
            base + ["-o", o1, "-p", o2, r1, r2],
            {
                "CUTADAPT_TPU_BATCH": "1",
                "CUTADAPT_TPU_BYTE_RANGE": f"{s1}:{e1},{s2}:{e2}",
                "CUTADAPT_TPU_STATS_PICKLE": pkl,
            },
        )
        parts1.append(o1)
        parts2.append(o2)
        pickles.append(pkl)

    for full, parts in ((fo1, parts1), (fo2, parts2)):
        assert b"".join(
            open(p, "rb").read() for p in parts
        ) == open(full, "rb").read()
    merged = merge_statistics(pickles)
    assert merged.as_json() == stats_full.as_json()


def test_plan_shards_fasta(tmp_path):
    inp = os.fspath(tmp_path / "in.fasta")
    rng = random.Random(3)
    with open(inp, "w") as f:
        for i in range(101):
            s = "".join(rng.choice("ACGT") for _ in range(rng.randint(5, 60)))
            if rng.random() < 0.4:  # multi-line records
                s = s[:5] + "\n" + s[5:]
            f.write(f">r{i}\n{s}\n")
    shards = plan_shards(inp, 4, "fasta")
    assert shards[0][0] == 0 and shards[-1][1] == os.path.getsize(inp)
    data = open(inp, "rb").read()
    for start, end in shards[1:]:
        # every boundary is a record start
        assert data[start:start + 1] == b">"
        assert data[start - 1:start] == b"\n"


@pytest.mark.parametrize("mode", ["host_serial", "host_multiproc"])
def test_shards_on_fallback_paths(tmp_path, mode):
    """The byte-range shard contract must hold on EVERY execution
    path, not only the batch engine: the per-read host fallback
    (batch off) and the multiprocessing runner (-j 2, whose reader
    process re-opens the raw paths) must both respect the range and
    concatenate to the single-run byte stream."""
    inp = os.fspath(tmp_path / "in.fastq")
    _write_fastq(inp, 1501, random.Random(7), ADAPTER)

    base = ["--quiet", "-a", f"ad={ADAPTER}", "-q", "12", "-m", "10"]
    if mode == "host_multiproc":
        base = ["-j", "2"] + base
    full_out = os.fspath(tmp_path / "full.fastq")
    _run(
        base + ["-o", full_out, inp],
        {"CUTADAPT_TPU_BATCH": "0"},
    )

    shards = plan_shards(inp, 3, "fastq")
    parts = []
    for h, (start, end) in enumerate(shards):
        out = os.fspath(tmp_path / f"fb{h}.fastq")
        _run(
            base + ["-o", out, inp],
            {
                "CUTADAPT_TPU_BATCH": "0",
                "CUTADAPT_TPU_BYTE_RANGE": f"{start}:{end}",
            },
        )
        parts.append(out)

    merged = b"".join(open(p, "rb").read() for p in parts)
    assert merged == open(full_out, "rb").read()
    assert merged  # not vacuous
