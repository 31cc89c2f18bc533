"""
Golden suites with the batch (TPU) path forced on — in strict mode.

The auto-activation threshold keeps the tiny golden inputs on the host
path by default, so without this lane nothing would continuously prove
the claim that the full golden suite passes through the batch engine.
Runs the two end-to-end suites in a subprocess with
CUTADAPT_TPU_BATCH=require — the mode in which any engine fallback is
an ERROR, not a silent host-path pass — so the zero-fallback property
is enforced, not just asserted in docs. (Compile results come from the
persistent test cache, so the second run is cheap.) Once on the serial
drive (full matrix) and once with the pooled 3-worker drive, which
must be byte-identical.

Latency budget: the pooled lane re-runs a rotating THIRD of the golden
cases per run; the rotation is derived from the HEAD commit SHA (so a
CI failure replays deterministically — the chosen bucket is also in
the assertion message) and falls back to the date outside a git
checkout. Three consecutive commits/days cover the matrix;
CUTADAPT_TPU_CI_FULL=1 forces the full pooled matrix — the
nightly/CI-forced mode. The serial lane always runs in full, so
batch-path coverage itself never shrinks.
"""

import datetime
import os
import subprocess
import sys

import pytest


def _rotation_bucket() -> int:
    """Reproducible 0..2 bucket: HEAD SHA when in git, else date."""
    here = os.path.dirname(__file__)
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=here, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        if sha:
            return int(sha[:8], 16) % 3
    except Exception:
        pass
    return datetime.date.today().toordinal() % 3


@pytest.mark.timeout(1800)
@pytest.mark.parametrize("workers", ["1", "3"])
def test_golden_suites_with_batch_forced(workers):
    here = os.path.dirname(__file__)
    env = {
        **os.environ,
        "CUTADAPT_TPU_BATCH": "require",
        "CUTADAPT_TPU_WORKERS": workers,
    }
    sample = "full"
    if workers != "1" and os.environ.get("CUTADAPT_TPU_CI_FULL") != "1":
        sample = f"{_rotation_bucket()}/3"
        env["CUTADAPT_TPU_GOLDEN_SAMPLE"] = sample
    proc = subprocess.run(
        [
            sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
            os.path.join(here, "test_commandline.py"),
            os.path.join(here, "test_paired.py"),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=1700,
    )
    assert proc.returncode == 0, (
        f"CUTADAPT_TPU_GOLDEN_SAMPLE={sample}\n"
        + proc.stdout[-4000:] + proc.stderr[-2000:]
    )
