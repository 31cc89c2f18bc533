"""
Golden suites with the batch (TPU) path forced on.

The auto-activation threshold keeps the tiny golden inputs on the host
path by default, so without this lane nothing would continuously prove
the claim that the full golden suite passes through the batch engine.
Runs the two end-to-end suites in a subprocess with
CUTADAPT_TPU_BATCH=1 (compile results come from the persistent test
cache, so the second run is cheap) — once on the serial drive (full
matrix) and once with the pooled 3-worker drive, which must be
byte-identical.

Latency budget: the pooled lane re-runs a rotating THIRD of the golden
cases per run (the rotation advances daily, so three consecutive days
cover the matrix); CUTADAPT_TPU_CI_FULL=1 forces the full pooled
matrix — the nightly/CI-forced mode. The serial lane always runs in
full, so batch-path coverage itself never shrinks.
"""

import datetime
import os
import subprocess
import sys

import pytest


@pytest.mark.timeout(1800)
@pytest.mark.parametrize("workers", ["1", "3"])
def test_golden_suites_with_batch_forced(workers):
    here = os.path.dirname(__file__)
    env = {
        **os.environ,
        "CUTADAPT_TPU_BATCH": "1",
        "CUTADAPT_TPU_WORKERS": workers,
    }
    if workers != "1" and os.environ.get("CUTADAPT_TPU_CI_FULL") != "1":
        rotation = datetime.date.today().toordinal() % 3
        env["CUTADAPT_TPU_GOLDEN_SAMPLE"] = f"{rotation}/3"
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
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
