"""
On-hardware Pallas <-> XLA parity, as part of the regular suite.

The rest of the suite runs the Pallas kernel in interpret mode on CPU
(tests/conftest.py pins this process to the CPU backend); compiled-
kernel parity on the real chip otherwise rides only bench.py. This
test closes that gap: when a TPU backend is configured AND reachable,
it runs tools/verify_pallas_tpu.py — the 13-spec matrix at the
production block_b=1024 plus a 512 bp long-read pass — in a
subprocess with the TPU environment intact, and skips cleanly when
the tunnel is down.
"""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_configured() -> bool:
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS")) or os.environ.get(
        "JAX_PLATFORMS", ""
    ).split(",")[0] in ("axon", "tpu")


def _tpu_env() -> dict:
    env = dict(os.environ)
    # the subprocess must NOT inherit the suite's CPU pinning
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.skipif(
    not _tpu_configured(), reason="no TPU backend configured"
)
def test_pallas_parity_on_tpu():
    env = _tpu_env()
    try:
        probe = subprocess.run(
            [
                sys.executable, "-c",
                "import jax; print(jax.devices()[0].platform)",
            ],
            env=env, capture_output=True, text=True, timeout=180,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU backend init timed out (tunnel down)")
    if probe.returncode != 0 or probe.stdout.strip() in ("", "cpu"):
        pytest.skip(
            f"TPU backend not reachable: {probe.stderr.strip()[-200:]}"
        )
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(_ROOT, "tools", "verify_pallas_tpu.py"),
            "--long",
        ],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert result.returncode == 0, result.stderr[-4000:]
