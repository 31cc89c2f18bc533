"""
Multi-chip sharded execution tests on a virtual 8-device CPU mesh.

The driver validates the same path via __graft_entry__.dryrun_multichip;
this keeps it covered by the regular suite.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from cutadapt_tpu.adapters import Where
from cutadapt_tpu.ops.align_batch import (
    AlignerSpec,
    make_batch_locate,
    query_lut,
)
from cutadapt_tpu.parallel import make_mesh, make_sharded_trim_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

ADAPTER = "AGATCGGAAGAGC"


def _spec():
    return AlignerSpec(
        reference=ADAPTER,
        max_error_rate=0.1,
        flags=Where.BACK.value,
        min_overlap=3,
    )


def _batch(rng, batch, length):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = bases[rng.randint(0, 4, size=(batch, length))]
    ad = np.frombuffer(ADAPTER.encode(), np.uint8)
    for i in range(0, batch, 3):
        pos = rng.randint(0, length - 4)
        take = min(len(ad), length - pos)
        reads[i, pos : pos + take] = ad[:take]
    lengths = np.full((batch,), length, np.int32)
    return reads, lengths


def test_sharded_step_matches_single_device():
    rng = np.random.RandomState(7)
    spec = _spec()
    mesh = make_mesh(jax.devices()[:8])
    length = 64
    batch = 16 * 8
    step = make_sharded_trim_step(spec, mesh, max_len=length)
    reads, lengths = _batch(rng, batch, length)
    stops, found, stats = step(reads, lengths)
    stops, found = np.asarray(stops), np.asarray(found)

    # single-device reference
    locate = make_batch_locate(spec)
    out = locate(query_lut(spec)[reads], lengths)
    ref_found = np.asarray(out["found"])
    ref_stops = np.where(
        ref_found, np.asarray(out["query_start"]), lengths
    )
    assert (found == ref_found).all()
    assert (stops == ref_stops).all()

    # psum-reduced counters must count every read exactly once
    hist = np.asarray(stats["length_error_histogram"])
    assert int(hist.sum()) == int(ref_found.sum())
    assert int(np.asarray(stats["with_adapters"])) == int(ref_found.sum())
    assert int(np.asarray(stats["total_bp"])) == int(lengths.sum())
    wl = np.asarray(stats["written_lengths"])
    assert int(wl.sum()) == batch
    np.testing.assert_array_equal(
        wl, np.bincount(ref_stops, minlength=length + 1)
    )
    adj = np.asarray(stats["adjacent_bases"])
    assert int(adj.sum()) == int(ref_found.sum())


def test_engine_sharded_dispatch_matches_single_device():
    """BatchPipelineEngine with an active shard mesh must produce
    byte-identical output to single-device execution."""
    import random

    from cutadapt_tpu.adapters import BackAdapter, FrontAdapter
    from cutadapt_tpu.batch_pipeline import (
        AdapterStage,
        AdapterTask,
        BatchPipelineEngine,
        FilterSpec,
        QualityStage,
        set_shard_mesh,
    )
    from cutadapt_tpu.io.chunks import assemble_window, parse_fastq_chunk

    rng = random.Random(21)
    recs = []
    for i in range(600):
        L = rng.randint(5, 90)
        s = "".join(rng.choice("ACGT") for _ in range(L))
        if rng.random() < 0.4 and L > 20:
            p = rng.randint(0, L - 14)
            s = (s[:p] + ADAPTER + s[p:])[:L]
        q = "".join(chr(rng.randint(35, 70)) for _ in s)
        recs.append(f"@r{i} c\n{s}\n+\n{q}\n")
    data = "".join(recs).encode()

    def run(mesh):
        set_shard_mesh(mesh)
        try:
            engine = BatchPipelineEngine(
                [
                    QualityStage(0, 12),
                    AdapterStage([
                        AdapterTask(
                            BackAdapter(ADAPTER, max_errors=0.1,
                                        min_overlap=3), "back", 0),
                        AdapterTask(
                            FrontAdapter("TTGGCCAA", max_errors=0.1,
                                         min_overlap=3), "front", 1),
                    ]),
                ],
                [FilterSpec("too_short", 10)],
                min_dp_batch=64,
                max_dp_batch=256,
            )
            parsed = parse_fastq_chunk(data)
            ws, we, keep, stats = engine.process_parsed(parsed)
            return assemble_window(parsed, ws, we, keep), stats
        finally:
            set_shard_mesh(None)

    out_single, stats_single = run(None)
    out_sharded, stats_sharded = run(make_mesh(jax.devices()[:8]))
    assert out_sharded == out_single
    assert stats_sharded["with_adapters"] == stats_single["with_adapters"]
    assert stats_sharded["filter_counts"] == stats_single["filter_counts"]


@pytest.mark.parametrize("use_mesh", [False, True])
def test_device_stats_reducer(use_mesh):
    """The production device-reduced statistics accumulator: keyed
    hist2d / hist1d / count buffers, psum'd over the mesh, growing
    with the observed value range, folded once into host callbacks."""
    from cutadapt_tpu.parallel import DeviceStatsReducer

    mesh = make_mesh(jax.devices()[:8]) if use_mesh else None
    red = DeviceStatsReducer(mesh)
    rng = np.random.RandomState(3)

    got = {}
    rows1 = rng.randint(0, 40, 500)
    cols1 = rng.randint(0, 3, 500)
    red.add_hist2d("h2", rows1, cols1, lambda h: got.__setitem__("h2", h))
    # second add grows both dimensions (beyond the 64-step rounding)
    rows2 = rng.randint(0, 200, 77)
    cols2 = rng.randint(0, 90, 77)
    red.add_hist2d("h2", rows2, cols2, lambda h: None)

    vals = rng.randint(0, 130, 999)
    red.add_hist1d("h1", vals, lambda h: got.__setitem__("h1", h))
    red.add_hist1d("h1", np.array([], np.int32), lambda h: None)

    mask = rng.rand(1000) < 0.3
    red.add_count("c", mask, lambda n: got.__setitem__("c", n))
    red.add_count("c", mask[:10], lambda n: None)

    red.fold()

    exp2 = np.zeros((256, 128), np.int64)
    np.add.at(exp2, (rows1, cols1), 1)
    np.add.at(exp2, (rows2, cols2), 1)
    assert got["h2"].shape[0] >= 200 and got["h2"].shape[1] >= 90
    r, c = got["h2"].shape
    np.testing.assert_array_equal(got["h2"], exp2[:r, :c])
    exp1 = np.bincount(vals, minlength=len(got["h1"]))
    np.testing.assert_array_equal(got["h1"], exp1)
    assert got["c"] == int(mask.sum()) + int(mask[:10].sum())
    assert not red._bufs  # cleared after fold
