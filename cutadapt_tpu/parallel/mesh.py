"""
Sharded multi-chip execution of the trimming step.

The workload is embarrassingly parallel over reads, which maps to a
1-D device mesh with the batch axis sharded ("dp" in DL terms — the
reference engine's only parallelism is likewise data parallelism over
read chunks, see /root/reference/src/cutadapt/runners.py:38-140).
Tensor/pipeline/sequence parallelism do not apply: there are no
weight matrices to shard and each read is only a few hundred bases.

The production engine shards exactly this way: with an active mesh
(batch_pipeline.set_shard_mesh / CUTADAPT_TPU_DEVICES), every DP
dispatch runs data-parallel over the devices (jit shardings for the
XLA formulation, shard_map around the Pallas kernel), and the engine's
statistics accumulate in psum-reduced device buffers through
parallel/stats.DeviceStatsReducer — the production form of the
on-device reduction contract. This module keeps the self-contained
single-step demonstration (make_sharded_trim_step) used by the
driver's dryrun and by docs/tests.

What *is* communicated between chips are the fixed-shape statistics
counters: the per-adapter (trimmed-length × error-count) histogram,
the adjacent-base counts and the written-length histogram are reduced
with ``psum`` over the mesh so every host can render the final report
without gathering per-read data. This mirrors the reference's
mergeable-Statistics reduction contract (report.py:81-126) with XLA
collectives instead of pickled objects over pipes.
"""

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.align_batch import AlignerSpec, make_batch_locate, query_lut


def make_mesh(devices: Optional[Sequence] = None, n_devices: Optional[int] = None):
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def make_sharded_trim_step(
    spec: AlignerSpec,
    mesh: Mesh,
    max_len: int,
    jit: bool = True,
    min_length: int = 0,
):
    """
    Build a sharded step: (queries (B, L) uint8 raw, lengths (B,)) ->
    (stops (B,), found (B,), stats dict of replicated counter tensors).

    B must be divisible by the mesh size. Statistics tensors are
    psum-reduced over the mesh, so each shard returns the global
    counters.
    """
    locate = make_batch_locate(spec)
    lut = jnp.asarray(query_lut(spec))
    m = len(spec.reference)
    k = int(spec.max_error_rate * m)
    n_err = k + 2  # 0..k plus one slack bucket

    base_a, base_c, base_g, base_t = (ord(c) for c in "ACGT")

    def shard_fn(queries, lengths):
        encoded = lut[queries]
        out = locate(encoded, lengths)
        found = out["found"]
        stops = jnp.where(found, out["query_start"], lengths)
        removed = jnp.where(found, lengths - stops, 0)

        # (removed_length, errors) histogram for reads with a match
        flat = jnp.clip(removed, 0, max_len) * n_err + jnp.clip(
            out["errors"], 0, n_err - 1
        )
        hist = jnp.zeros(((max_len + 1) * n_err,), jnp.int32)
        hist = hist.at[flat].add(found.astype(jnp.int32))
        hist = hist.reshape(max_len + 1, n_err)

        # adjacent base (the base preceding the removed part)
        prev_idx = jnp.clip(stops - 1, 0, queries.shape[1] - 1)
        prev_base = jnp.take_along_axis(queries, prev_idx[:, None], axis=1)[:, 0]
        counts = []
        for b in (base_a, base_c, base_g, base_t):
            counts.append(
                jnp.sum(found & (stops > 0) & (prev_base == b)).astype(jnp.int32)
            )
        known = counts[0] + counts[1] + counts[2] + counts[3]
        other = jnp.sum(found).astype(jnp.int32) - known
        adjacent = jnp.stack(counts + [other])

        # filter counters + written length histogram over kept reads
        too_short = stops < min_length
        kept = ~too_short
        wl = jnp.zeros((max_len + 1,), jnp.int32)
        wl = wl.at[jnp.clip(stops, 0, max_len)].add(kept.astype(jnp.int32))

        hist = jax.lax.psum(hist, "data")
        adjacent = jax.lax.psum(adjacent, "data")
        wl = jax.lax.psum(wl, "data")
        n_too_short = jax.lax.psum(
            jnp.sum(too_short).astype(jnp.int32), "data"
        )
        written_bp = jax.lax.psum(
            jnp.sum(jnp.where(kept, stops, 0), dtype=jnp.int32), "data"
        )
        # per-step bp fits int32 (batch * max_len); the host-side
        # accumulator holds the unbounded total as a Python int
        total_bp = jax.lax.psum(jnp.sum(lengths, dtype=jnp.int32), "data")
        n_with = jax.lax.psum(jnp.sum(found).astype(jnp.int32), "data")
        stats = dict(
            length_error_histogram=hist,
            adjacent_bases=adjacent,
            written_lengths=wl,
            total_bp=total_bp,
            written_bp=written_bp,
            with_adapters=n_with,
            filtered_too_short=n_too_short,
        )
        return stops, found, stats

    stats_specs = dict(
        length_error_histogram=P(),
        adjacent_bases=P(),
        written_lengths=P(),
        total_bp=P(),
        written_bp=P(),
        with_adapters=P(),
        filtered_too_short=P(),
    )
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data", None), P("data")),
        out_specs=(P("data"), P("data"), stats_specs),
    )
    if jit:
        fn = jax.jit(fn)
    return fn
