import os

# Tests run JAX on a virtual 8-device CPU mesh: hermetic, fast
# (no tunnel round-trips/compiles), and it exercises the same sharded
# code paths the driver validates via __graft_entry__.dryrun_multichip.
# The axon sitecustomize pins jax_platforms="axon,cpu" through the
# config API (which overrides the env var), so undo it the same way —
# before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
_xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _xla_flags:
    os.environ["XLA_FLAGS"] = (
        _xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
try:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: kernel compiles on this 1-core host
    # take 1-30s each and dominate suite runtime otherwise
    _jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("CUTADAPT_TPU_TEST_CACHE",
                       "/tmp/cutadapt_tpu_test_jax_cache"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

import pytest

from utils import assert_files_equal, cutpath, datapath

from cutadapt_tpu.cli import main
from cutadapt_tpu.report import Statistics


@pytest.fixture(params=[1, 2])
def cores(request):
    return request.param


@pytest.fixture
def run(tmp_path):
    def _run(params, expected, inpath) -> Statistics:
        if type(params) is str:
            params = params.split()
        params += ["--json", os.fspath(tmp_path / "stats.cutadapt.json")]
        tmp_fastaq = tmp_path / expected
        params += ["-o", tmp_fastaq]
        params += [datapath(inpath)]
        stats = main([str(p) for p in params])
        assert_files_equal(cutpath(expected), tmp_fastaq)
        return stats

    return _run


@pytest.fixture
def run_paired(tmp_path):
    def _run(params, in1, in2, expected1, expected2, cores):
        if type(params) is str:
            params = params.split()
        params += ["--cores", str(cores), "--buffer-size=512"]
        params += ["--json", os.fspath(tmp_path / "stats.cutadapt.json")]
        (tmp_path / "r1").mkdir()
        (tmp_path / "r2").mkdir()
        path1 = os.fspath(tmp_path / "r1" / expected1)
        path2 = os.fspath(tmp_path / "r2" / expected2)
        params += ["-o", path1, "-p", path2]
        params += [datapath(in1), datapath(in2)]
        stats = main(params)
        assert_files_equal(cutpath(expected1), path1)
        assert_files_equal(cutpath(expected2), path2)
        return stats

    return _run


def pytest_configure(config):
    # Persist compiled XLA programs across test runs (the batched-kernel
    # cross-validation tests compile many specs).
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/cutadapt_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    config.addinivalue_line(
        "markers",
        "timeout(seconds): per-test wall-clock budget "
        "(SIGALRM-enforced; default %ds)" % DEFAULT_TEST_TIMEOUT,
    )


# --- per-test timeout discipline -------------------------------------------
# The reference bounds every test at 10 s (reference pyproject.toml:
# 50-56 via pytest-timeout). That plugin isn't in this image, so this
# is the signal-method equivalent: a SIGALRM fires in the main thread
# and raises inside the hung test. The default budget is generous
# (this single-core host pays 1-30 s kernel compiles on cold caches);
# the point is catching hangs and unbounded drift, not enforcing 10 s.
DEFAULT_TEST_TIMEOUT = int(os.environ.get("CUTADAPT_TPU_TEST_TIMEOUT", 300))


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    import signal

    marker = item.get_closest_marker("timeout")
    seconds = int(marker.args[0]) if marker else DEFAULT_TEST_TIMEOUT

    def _on_alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded its {seconds}s wall-clock budget "
            f"(mark with @pytest.mark.timeout(N) to extend)"
        )

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(seconds)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


# --- golden-case sampling ---------------------------------------------------
# CUTADAPT_TPU_GOLDEN_SAMPLE="i/n" keeps only every test whose node id
# hashes to bucket i of n — used by the forced-batch pooled lane to run
# a rotating third of the golden suites per run (full matrix with
# CUTADAPT_TPU_CI_FULL=1; see tests/test_batch_forced.py).
def pytest_collection_modifyitems(config, items):
    spec = os.environ.get("CUTADAPT_TPU_GOLDEN_SAMPLE")
    if not spec:
        return
    import zlib

    idx_s, n_s = spec.split("/")
    idx, n = int(idx_s), int(n_s)
    keep_set = {
        id(it) for it in items
        if zlib.crc32(it.nodeid.encode()) % n == idx
    }
    keep = [it for it in items if id(it) in keep_set]
    drop = [it for it in items if id(it) not in keep_set]
    if drop:
        config.hook.pytest_deselected(items=drop)
        items[:] = keep
