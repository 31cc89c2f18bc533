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


def test_shard_option_single_end(tmp_path):
    """--shard INDEX/COUNT computes the byte range itself and writes a
    mergeable stats pickle next to its output."""
    inp = os.fspath(tmp_path / "in.fastq")
    _write_fastq(inp, 1201, random.Random(11), ADAPTER)
    base = ["--quiet", "-a", f"ad={ADAPTER}", "-m", "5"]
    full_out = os.fspath(tmp_path / "full.fastq")
    stats_full = _run(base + ["-o", full_out, inp], {})

    parts, pickles = [], []
    for h in range(3):
        out = os.fspath(tmp_path / f"s{h}.fastq")
        _run(base + ["-o", out, "--shard", f"{h}/3", inp], {})
        parts.append(out)
        pickles.append(f"{out}.shard-stats.pickle")
        assert os.path.exists(pickles[-1])
    merged = b"".join(open(p, "rb").read() for p in parts)
    assert merged == open(full_out, "rb").read()
    assert merge_statistics(pickles).as_json() == stats_full.as_json()
    assert "CUTADAPT_TPU_BYTE_RANGE" not in os.environ  # env restored


def test_shard_option_paired(tmp_path):
    r1 = os.fspath(tmp_path / "r1.fastq")
    r2 = os.fspath(tmp_path / "r2.fastq")
    rng = random.Random(13)
    _write_fastq(r1, 900, rng, ADAPTER)
    _write_fastq(r2, 900, rng, "CTGTCTCTTATACACATCT")
    base = [
        "--quiet", "-a", ADAPTER, "-A", "CTGTCTCTTATACACATCT", "-m", "8",
    ]
    fo1 = os.fspath(tmp_path / "f1.fastq")
    fo2 = os.fspath(tmp_path / "f2.fastq")
    _run(base + ["-o", fo1, "-p", fo2, r1, r2], {})
    parts1, parts2 = [], []
    for h in range(2):
        o1 = os.fspath(tmp_path / f"s1-{h}.fastq")
        o2 = os.fspath(tmp_path / f"s2-{h}.fastq")
        _run(
            base + ["-o", o1, "-p", o2, "--shard", f"{h}/2", r1, r2], {}
        )
        parts1.append(o1)
        parts2.append(o2)
    for full, parts in ((fo1, parts1), (fo2, parts2)):
        assert b"".join(
            open(p, "rb").read() for p in parts
        ) == open(full, "rb").read()


def test_shard_option_interleaved_keeps_pairs(tmp_path):
    """Interleaved input boundaries must never split an R1/R2 pair."""
    inp = os.fspath(tmp_path / "il.fastq")
    rng = random.Random(17)
    with open(inp, "w") as f:
        for i in range(301):
            for side in (1, 2):
                L = rng.randint(20, 60)
                s = "".join(rng.choice("ACGT") for _ in range(L))
                f.write(f"@p{i}/{side}\n{s}\n+\n{'I' * L}\n")
    base = ["--quiet", "--interleaved", "-a", ADAPTER, "-A", ADAPTER]
    full_out = os.fspath(tmp_path / "full.fastq")
    _run(base + ["-o", full_out, inp], {})
    parts = []
    for h in range(3):
        out = os.fspath(tmp_path / f"il{h}.fastq")
        _run(base + ["-o", out, "--shard", f"{h}/3", inp], {})
        parts.append(open(out, "rb").read())
    assert b"".join(parts) == open(full_out, "rb").read()


def test_shard_option_bam(tmp_path):
    """BAM sharding: record-aligned byte ranges + header replay on
    every non-first shard (parallel/multihost.plan_bam_shards)."""
    import gzip

    from utils import datapath

    raw = gzip.open(datapath("small.bam"), "rb").read()
    inp = os.fspath(tmp_path / "small_raw.bam")
    with open(inp, "wb") as f:
        f.write(raw)
    base = ["--quiet", "-a", "TTAGACATAT"]
    full_out = os.fspath(tmp_path / "full.fastq")
    _run(base + ["-o", full_out, inp], {})
    parts = []
    for h in range(2):
        out = os.fspath(tmp_path / f"b{h}.fastq")
        _run(base + ["-o", out, "--shard", f"{h}/2", inp], {})
        parts.append(open(out, "rb").read())
    assert all(parts)  # both shards got records
    assert b"".join(parts) == open(full_out, "rb").read()


def test_shard_option_rejects_compressed(tmp_path):
    import gzip

    inp = os.fspath(tmp_path / "in.fastq.gz")
    with gzip.open(inp, "wb") as f:
        f.write(b"@r0\nACGT\n+\nIIII\n")
    with pytest.raises(SystemExit):
        _run(
            [
                "--quiet", "-a", ADAPTER,
                "-o", os.fspath(tmp_path / "o.fastq"),
                "--shard", "0/2", inp,
            ],
            {},
        )


def test_plan_file_shards_balances_by_size(tmp_path):
    from cutadapt_tpu.parallel.multihost import plan_file_shards

    paths = []
    for i, size in enumerate([100, 90, 10, 9, 8, 1]):
        p = os.fspath(tmp_path / f"f{i}.fastq.gz")
        with open(p, "wb") as f:
            f.write(b"x" * size)
        paths.append(p)
    plan = plan_file_shards(paths, 2)
    assert sorted(sum(plan, [])) == sorted(paths)  # partition
    loads = [sum(os.path.getsize(p) for p in host) for host in plan]
    assert abs(loads[0] - loads[1]) <= 10  # balanced
    assert plan == plan_file_shards(paths, 2)  # deterministic


def test_coordinator_tool(tmp_path):
    """tools/multihost_run.py end-to-end: gz output shards concatenate
    to a valid multi-member gzip identical (decompressed) to serial."""
    import gzip
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inp = os.fspath(tmp_path / "in.fastq")
    _write_fastq(inp, 800, random.Random(23), ADAPTER)
    serial_out = os.fspath(tmp_path / "serial.fastq.gz")
    _run(["--quiet", "-a", ADAPTER, "-o", serial_out, inp], {})

    coord_out = os.fspath(tmp_path / "coord.fastq.gz")
    r = subprocess.run(
        [
            sys.executable, os.path.join(repo, "tools", "multihost_run.py"),
            "-n", "2", "--sequential", "--",
            "-a", ADAPTER, "-o", coord_out, inp,
        ],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr
    assert "Summary" in r.stdout or "reads" in r.stdout  # merged report
    assert gzip.open(coord_out, "rb").read() == gzip.open(
        serial_out, "rb"
    ).read()
    assert not [p for p in os.listdir(tmp_path) if "shard" in p]


def test_distributed_init_single_process():
    """CUTADAPT_TPU_DIST_COORDINATOR wires jax.distributed.initialize
    (idempotent, failure-tolerant). Exercised as a 1-process world."""
    import jax

    from cutadapt_tpu.accel import _maybe_init_distributed

    os.environ["CUTADAPT_TPU_DIST_COORDINATOR"] = "localhost:59999"
    os.environ["CUTADAPT_TPU_DIST_NPROCS"] = "1"
    os.environ["CUTADAPT_TPU_DIST_PID"] = "0"
    try:
        _maybe_init_distributed(jax)
        _maybe_init_distributed(jax)  # second call must not raise
        assert jax.process_count() == 1
    finally:
        for k in ("CUTADAPT_TPU_DIST_COORDINATOR",
                  "CUTADAPT_TPU_DIST_NPROCS", "CUTADAPT_TPU_DIST_PID"):
            os.environ.pop(k, None)
