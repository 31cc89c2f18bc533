"""
Device-reduced statistics for the batch engine (production form).

When a device mesh is active, the engine's mergeable statistics —
per-adapter-end (removed-length x errors) histograms, adjacent-base
counts, written-length histograms and filter counters — accumulate in
device-resident buffers. Per-chunk event arrays are uploaded sharded
over the mesh's batch axis and every device bins its own shard into
its own partial buffer — the per-chunk accumulate programs contain NO
collective, so they never rendezvous with the engine's in-flight
asynchronous DP dispatches (an all-reduce launched while the device
queue holds other multi-device programs can starve waiting for
partition threads — observed as an XLA:CPU InProcessCommunicator
termination abort on the 8-virtual-device test mesh). One
``jax.lax.psum`` per buffer at ``fold()`` time — after the drive has
drained, when the device is quiescent — reduces the partials, and one
device-to-host transfer folds the totals into the same host
Statistics objects the single-device path uses
(EndStatistics.record_removal(count=...) etc.), so report rendering
is identical.

This is the multi-host reduction contract: per-read data never leaves
its shard; only fixed-shape counter tensors ride the collective, and
only once per run. It mirrors the reference's mergeable-Statistics
pipe protocol (/root/reference/src/cutadapt/report.py:81-126,
runners.py:275-412) with an XLA collective instead of pickled objects
over pipes.
"""

from typing import Callable, Dict, Optional, Tuple

import numpy as np

_MIN_BATCH = 256


def _pad_batch(n: int, mesh) -> int:
    """Upload size: power of two >= n (bounded jit cache), padded to
    the mesh so the batch axis shards evenly."""
    size = _MIN_BATCH
    while size < n:
        size *= 2
    if mesh is not None and mesh.size > 1:
        m = mesh.size
        size = (size + m - 1) // m * m
    return size


def _round_dim(n: int) -> int:
    """Buffer dimensions grow in steps of 64 (bounded recompiles)."""
    return (n + 63) // 64 * 64


class DeviceStatsReducer:
    """Accumulates keyed count tensors on device; psum over `mesh`.

    Keys are arbitrary hashables; the first `add_*` for a key fixes
    its kind and fold callback. ``fold()`` fetches every buffer once
    and calls each key's callback with the final numpy array.
    """

    def __init__(self, mesh=None):
        import jax

        self._jax = jax
        self.mesh = mesh
        self._bufs: Dict[object, object] = {}
        self._folds: Dict[object, Callable] = {}
        self._shapes: Dict[object, Tuple[int, ...]] = {}
        self._fns: Dict[Tuple, Callable] = {}
        self._fold_fns: Dict[int, Callable] = {}

    # --- jitted accumulate programs ------------------------------------

    def _acc(self, kind: str, batch: int, shape: Tuple[int, ...]):
        key = (kind, batch, shape)
        fn = self._fns.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp

        mesh = self.mesh
        # With a mesh, `buf` carries a leading per-device partial axis
        # (sharded over the mesh); each shard_map block sees [1, *shape]
        # and adds only its local shard's bins. No collective here —
        # these programs run concurrently with async DP dispatches, and
        # a per-add all-reduce can deadlock against them (see module
        # docstring). The cross-device psum happens once, in fold().

        if kind == "hist2d":

            def body(buf, rows, cols, valid):
                local = (
                    jnp.zeros(buf.shape[buf.ndim - 2:], buf.dtype)
                    .at[rows, cols].add(valid)
                )
                return buf + (local if mesh is None else local[None])

        elif kind == "hist1d":

            def body(buf, rows, valid):
                local = (
                    jnp.zeros(buf.shape[buf.ndim - 1:], buf.dtype)
                    .at[rows].add(valid)
                )
                return buf + (local if mesh is None else local[None])

        else:  # count

            def body(buf, valid):
                return buf + jnp.sum(valid, dtype=jnp.int32)

        if mesh is None:
            fn = jax.jit(body, donate_argnums=0)
        else:
            from jax.sharding import PartitionSpec as P

            ax = mesh.axis_names[0]
            nones = (None,) * len(shape)
            n_in = {"hist2d": 3, "hist1d": 2, "count": 1}[kind]
            fn = jax.jit(
                jax.shard_map(
                    body,
                    mesh=mesh,
                    in_specs=(P(ax, *nones),) + (P(ax),) * n_in,
                    out_specs=P(ax, *nones),
                ),
                donate_argnums=0,
            )
        self._fns[key] = fn
        return fn

    def _fold_fn(self, ndim: int):
        """One psum per buffer at fold() time (device quiescent): the
        sharded [devices, *shape] partials reduce to a replicated
        total. This is the only collective the reducer runs."""
        fn = self._fold_fns.get(ndim)
        if fn is not None:
            return fn
        import jax
        from jax.sharding import PartitionSpec as P

        mesh = self.mesh
        ax = mesh.axis_names[0]
        nones = (None,) * ndim

        def body(block):
            return jax.lax.psum(block, ax)

        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(ax, *nones),),
                out_specs=P(None, *nones),
            )
        )
        self._fold_fns[ndim] = fn
        return fn

    # --- buffer management ---------------------------------------------

    def _buffer(self, key, shape: Tuple[int, ...], fold: Callable):
        """The running buffer for `key`, grown to cover `shape`.
        `shape` is the logical histogram shape; with a mesh the
        physical buffer carries a leading per-device partial axis."""
        import jax.numpy as jnp

        m = self.mesh.size if self.mesh is not None else 0
        cur = self._bufs.get(key)
        if cur is None:
            self._folds[key] = fold
            self._shapes[key] = shape
            phys = ((m,) + shape) if m else shape
            buf = jnp.zeros(phys, jnp.int32)
            if m:
                buf = self._shard_partials(buf, shape)
            self._bufs[key] = buf
            return buf
        old_shape = self._shapes[key]
        if all(n <= o for n, o in zip(shape, old_shape)):
            return cur
        new_shape = tuple(
            max(n, o) for n, o in zip(shape, old_shape)
        )
        grown = np.zeros(((m,) + new_shape) if m else new_shape,
                         np.int32)
        region = tuple(slice(0, o) for o in old_shape)
        if m:
            region = (slice(None),) + region
        grown[region] = np.asarray(cur)
        buf = jnp.asarray(grown)
        if m:
            buf = self._shard_partials(buf, new_shape)
        self._bufs[key] = buf
        self._shapes[key] = new_shape
        return buf

    def _shard_partials(self, arr, shape: Tuple[int, ...]):
        """Per-device partial buffers: leading axis over the mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        ax = self.mesh.axis_names[0]
        return self._jax.device_put(
            arr,
            NamedSharding(self.mesh, P(ax, *([None] * len(shape)))),
        )

    def _shard(self, arr):
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        return self._jax.device_put(
            arr, NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
        )

    # --- public accumulation API ----------------------------------------

    def add_hist2d(self, key, rows, cols, fold: Callable) -> None:
        """buffer[rows[i], cols[i]] += 1 for every i."""
        n = len(rows)
        if n == 0:
            # register the fold so zero-event adapters still render
            self._buffer(key, (_round_dim(1), _round_dim(1)), fold)
            return
        rows = np.asarray(rows, np.int32)
        cols = np.asarray(cols, np.int32)
        shape = (
            _round_dim(int(rows.max()) + 1),
            _round_dim(int(cols.max()) + 1),
        )
        buf = self._buffer(key, shape, fold)
        B = _pad_batch(n, self.mesh)
        r = np.zeros(B, np.int32)
        c = np.zeros(B, np.int32)
        v = np.zeros(B, np.int32)
        r[:n], c[:n], v[:n] = rows, cols, 1
        self._bufs[key] = self._acc(
            "hist2d", B, self._shapes[key]
        )(buf, self._shard(r), self._shard(c), self._shard(v))

    def add_hist1d(self, key, values, fold: Callable) -> None:
        """buffer[values[i]] += 1 for every i."""
        n = len(values)
        if n == 0:
            self._buffer(key, (_round_dim(1),), fold)
            return
        values = np.asarray(values, np.int32)
        shape = (_round_dim(int(values.max()) + 1),)
        buf = self._buffer(key, shape, fold)
        B = _pad_batch(n, self.mesh)
        r = np.zeros(B, np.int32)
        v = np.zeros(B, np.int32)
        r[:n], v[:n] = values, 1
        self._bufs[key] = self._acc("hist1d", B, self._shapes[key])(
            buf, self._shard(r), self._shard(v)
        )

    def add_count(self, key, mask, fold: Callable) -> None:
        """buffer += popcount(mask)."""
        n = len(mask)
        buf = self._buffer(key, (), fold)
        if n == 0:
            return
        B = _pad_batch(n, self.mesh)
        v = np.zeros(B, np.int32)
        v[:n] = np.asarray(mask, np.int32)
        self._bufs[key] = self._acc("count", B, ())(
            buf, self._shard(v)
        )

    # --- final fold -------------------------------------------------------

    def fold(self) -> None:
        """One psum (mesh only) + one D2H fetch per buffer; fold
        totals into the host objects and clear. Every fold callback
        receives a numpy array (or a python int for 'count' keys).
        Callers invoke this after the drive has drained, so the
        fold-time collective never competes with in-flight work."""
        for key, buf in self._bufs.items():
            if self.mesh is not None:
                ndim = len(self._shapes[key])
                arr = np.asarray(self._fold_fn(ndim)(buf))[0]
            else:
                arr = np.asarray(buf)
            self._folds[key](arr if arr.ndim else int(arr))
        self._bufs.clear()
        self._folds.clear()
        self._shapes.clear()
