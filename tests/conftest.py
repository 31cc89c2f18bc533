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
