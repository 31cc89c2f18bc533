"""
Generalized batched (TPU) pipeline engine.

Executes a whole *pipeline* of eligible modifiers over read batches:
unconditional cuts, quality/NextSeq trimming, multi-adapter
3'/5'/anywhere cutting (with `times` rounds), poly-A/poly-T trimming,
shortening, and the length/content/trimmed-state filters — with
byte-identical semantics to the per-read host pipeline.

Design: each read carries a current window [win_start, win_stop) into
its original bytes. Host stages (cuts, quality scans — memory-bound
byte work, see native/hostops.cpp) update windows directly; the
adapter stage runs the exact-semantics DP on device over the *current
windows* of prefilter-passing reads only, so the bytes that cross the
(slow) host<->device link are exactly the candidate windows. Matches
update windows per adapter kind; `times > 1` re-runs matched reads.
Filters produce a keep-mask; the final FASTQ is assembled from
(window, keep) without ever materializing intermediate reads.

Per-read trimming never changes relative base order, so a window +
keep-mask is a complete representation of any trim-action pipeline
(mask/lowercase actions rewrite bytes and stay on the host path).

Reference semantics: modifiers at
/root/reference/src/cutadapt/modifiers.py, selection order of
MultipleAdapters.match_to at adapters.py:1265-1286.
"""

import os
import threading
from functools import lru_cache
from typing import List, Optional, Sequence

import numpy as np

from . import native
from .adapters import Where
from .io.chunks import assemble_window  # re-export for engine callers
from .ops.align_batch import (
    AlignerSpec,
    make_batch_locate,
    query_class_info,
    query_lut,
)

_QS_BITS = 14
_QSTOP_SHIFT = 14
_FOUND_SHIFT = 28
_SCORE_BIAS = 32768

# device mesh the DP dispatches shard over (None = single device)
_ACTIVE_MESH = None
_MESH_AXIS = "reads"


def set_shard_mesh(mesh) -> None:
    """Shard subsequent DP dispatches over `mesh` (1-D, any axis name;
    the batch axis is split across its devices). Pass None to return
    to single-device execution."""
    global _ACTIVE_MESH
    if mesh is not None and len(mesh.axis_names) != 1:
        raise ValueError("expected a 1-D mesh")
    _ACTIVE_MESH = mesh


_WARNED_UNSHARDED = False


def active_mesh_for(batch: int):
    """The active mesh if the batch divides evenly over it. Engine
    dispatch sizes are padded to the mesh (see _dp_sizes), so an
    indivisible batch here means a non-engine caller — warn once
    instead of silently degrading to one device."""
    global _WARNED_UNSHARDED
    mesh = _ACTIVE_MESH
    if mesh is None or mesh.size <= 1:
        return None
    if batch % mesh.size != 0:
        if not _WARNED_UNSHARDED:
            _WARNED_UNSHARDED = True
            import logging

            logging.getLogger(__name__).warning(
                "DP batch of %d does not divide over the %d-device "
                "mesh; running this dispatch on one device",
                batch, mesh.size,
            )
        return None
    return mesh


def mesh_padded(size: int) -> int:
    """`size` rounded up to a multiple of the active mesh size, so
    every dispatch batch shards evenly over the device mesh."""
    mesh = _ACTIVE_MESH
    if mesh is None or mesh.size <= 1:
        return size
    m = mesh.size
    return (size + m - 1) // m * m


def get_shard_mesh():
    """The active shard mesh, or None (single device)."""
    return _ACTIVE_MESH


# Wire/work accounting (always on — one int add per dispatch). These
# decompose the perf story into tunnel-variance-stable ratios:
# bytes-on-wire per read and DP rows per candidate are properties of
# the code, not of the link's mood. bench.py reports them.
XFER = {"h2d_bytes": 0, "d2h_bytes": 0, "candidates": 0, "dp_rows": 0}
# dispatches may run on several driver worker threads; += on dict
# entries is not atomic under the GIL
_XFER_LOCK = threading.Lock()


def _xfer_add(h2d=0, d2h=0, candidates=0, dp_rows=0) -> None:
    with _XFER_LOCK:
        XFER["h2d_bytes"] += h2d
        XFER["d2h_bytes"] += d2h
        XFER["candidates"] += candidates
        XFER["dp_rows"] += dp_rows


def reset_xfer_counters() -> None:
    for k in XFER:
        XFER[k] = 0


def xfer_counters() -> dict:
    return dict(XFER)


def _wire_lengths(vals: np.ndarray, size: int, wide: bool,
                  width: Optional[int] = None) -> np.ndarray:
    """Window lengths as they ride the wire: int16 rows in the packed
    result format (whose windows are < 2**14 by construction, so the
    cast is lossless and halves this array's H2D bytes), int32 in wide
    mode (long reads can exceed int16). On the exact-wire path a batch
    whose width fits uint8 ships one byte per row. Kernels cast back
    to int32 on device."""
    if wide:
        dt = np.int32
    elif width is not None and width < 256:
        dt = np.uint8
    else:
        dt = np.int16
    sub_len = np.zeros(size, dt)
    sub_len[: len(vals)] = vals
    return sub_len


def _pack2_on() -> bool:
    """2-bit candidate packing (halves the 4-bit lane's H2D bytes;
    reads with N/IUPAC bytes split off to the 4-bit or host-scalar
    lane). CUTADAPT_TPU_PACK2=0 disables for A/B measurement."""
    return os.environ.get("CUTADAPT_TPU_PACK2", "1") != "0"


def _device_prefilter_on() -> bool:
    """CUTADAPT_TPU_DEVICE_PREFILTER=1: skip the host-side k-mer scan
    and ship EVERY read's window to the device — the DP itself
    performs the rejection (the prefilter is one-sided, so this is
    semantically identical; reference kmer_heuristic.py:129-141).

    Trade-off (measured in BASELINE.md): ~3x the wire bytes and DP
    rows on adapter-sparse data, in exchange for zero host prefilter
    cycles — the right side of the trade only when the attach is fast
    (>=10 GB/s PCIe/ICI) AND the host, not the device, is the
    bottleneck. Default off."""
    return os.environ.get("CUTADAPT_TPU_DEVICE_PREFILTER") == "1"


def _exact_wire_on() -> bool:
    """Exact-wire mode: DP rows ship at each batch's own max window
    length (rounded only to the packing step) instead of the
    chunk-level 64-bucket width, with candidates length-sorted so the
    binary-decomposition batches get progressively narrower; the
    jitted step pads rows back to the kernels' 8-byte alignment ON
    DEVICE (_pad_rows8), so the trimmed columns are pure wire win
    (~20-30% of H2D on typical window-length mixes — the former
    bucket-padding share measured in BASELINE.md). Semantically
    invisible: padding columns beyond each row's length were always
    zero and masked by the length vector.

    Default on for TPU backends, where the wire is the scarce
    resource; off elsewhere so CPU test runs keep the bounded
    compile-shape set of bucketed widths. CUTADAPT_TPU_EXACT_WIRE=1/0
    overrides."""
    env = os.environ.get("CUTADAPT_TPU_EXACT_WIRE")
    if env is not None:
        return env != "0"
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _scalar_tail_max() -> int:
    """Decomposition-tail threshold: a lane remainder of at most this
    many rows after the full device batches routes to the zero-wire
    C++ scalar aligner instead of padding a min_dp_batch-row dispatch
    (the last bite of batch padding: a 68-row tail otherwise ships as
    4096 rows). 0 disables; applies only after at least one full
    device batch so small runs keep exercising the device kernels."""
    return int(os.environ.get("CUTADAPT_TPU_SCALAR_TAIL", 512))


def _eff_width(bmax: int, width: int, pack2: bool, packed: bool) -> int:
    """Exact-wire row width for a batch whose longest window is bmax:
    rounded up to the packing step (2-bit: 4 bases/byte; 4-bit: 2;
    byte lane: 1) with a floor of 16 columns, capped at the bucketed
    stage width."""
    step = 4 if pack2 else (2 if packed else 1)
    w = max(16, (int(bmax) + step - 1) // step * step)
    return min(w, width)


@lru_cache(maxsize=128)
def _make_locate_step(
    spec: AlignerSpec,
    packed: bool,
    backend: str = "xla",
    wide: bool = False,
    mesh=None,
    pack2: bool = False,
):
    """Jitted locate returning a (2, B) int32: row0 = query_start |
    query_stop<<14 | found<<28; row1 = errors | (score+bias)<<16.

    backend 'pallas' uses the VMEM-resident Pallas kernel (packed mode
    only; same bit-exact results, ~16x faster to compile); 'xla' the
    lax.scan formulation.

    wide=True (XLA only) returns an unpacked (7, B) int32 of
    [found, query_start, query_stop, errors, score, ref_start,
    ref_stop] — used for long reads whose coordinates would overflow
    the 14-bit packed fields (window length >= 2**14) and whenever
    adapter-side coordinates are needed (--wildcard-file).

    With a mesh, the dispatch is data-parallel over its devices: the
    XLA formulation shards through jit in/out shardings, the Pallas
    kernel runs per-shard under shard_map. The batch size must divide
    the mesh size (callers check via active_mesh_for)."""
    import jax
    import jax.numpy as jnp

    def _pad_rows8(enc):
        """Exact-wire rows arrive trimmed to the batch max window; the
        kernels read rows in aligned 8-byte blocks, so restore the
        alignment ON DEVICE (pads with zeros — the same value the host
        encoder always used beyond each row's length, masked by the
        length vector)."""
        pad = (-enc.shape[1]) % 8
        if pad:
            enc = jnp.pad(enc, ((0, 0), (0, pad)))
        return enc

    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        by_read = P(axis)
        by_read_rows = P(axis, None)
        result_cols = P(None, axis)

    if backend == "pallas":
        if wide:
            raise ValueError("pallas backend is packed-format only")
        if not packed:
            raise ValueError("pallas backend requires packed inputs")
        from .ops.align_pallas import make_pallas_locate

        if mesh is None:
            kernel = make_pallas_locate(spec, pack2=pack2)
            # lengths arrive int16 (wire format); the kernel wants int32
            return jax.jit(
                lambda enc, lengths: kernel(
                    _pad_rows8(enc), lengths.astype(jnp.int32)
                )
            )
        # per-shard kernel execution; results are concatenated on the
        # batch axis. The kernel declares its output varying over the
        # mesh axis (vma on the pallas_call out_shape), so shard_map's
        # varying-axes type check stays enabled.
        kernel = make_pallas_locate(spec, pack2=pack2, vma_axis=axis)
        sharded = jax.shard_map(
            kernel,
            mesh=mesh,
            in_specs=(by_read_rows, by_read),
            out_specs=result_cols,
        )
        return jax.jit(
            lambda enc, lengths: sharded(
                _pad_rows8(enc), lengths.astype(jnp.int32)
            )
        )

    locate = make_batch_locate(spec, packed=packed, pack2=pack2)

    if wide:

        def step(enc, lengths):
            out = locate(_pad_rows8(enc), lengths)
            return jnp.stack(
                [
                    out["found"].astype(jnp.int32),
                    out["query_start"],
                    out["query_stop"],
                    out["errors"],
                    out["score"],
                    out["ref_start"],
                    out["ref_stop"],
                ]
            )

    else:

        def step(enc, lengths):
            out = locate(_pad_rows8(enc), lengths)
            r0 = (
                out["query_start"]
                | (out["query_stop"] << _QSTOP_SHIFT)
                | (out["found"].astype(jnp.int32) << _FOUND_SHIFT)
            )
            r1 = out["errors"] | ((out["score"] + _SCORE_BIAS) << 16)
            return jnp.stack([r0, r1])

    if mesh is None:
        return jax.jit(step)
    return jax.jit(
        step,
        in_shardings=(
            NamedSharding(mesh, by_read_rows),
            NamedSharding(mesh, by_read),
        ),
        out_shardings=NamedSharding(mesh, result_cols),
    )


def _pick_backend(packed: bool) -> str:
    """Pallas on real TPU backends (when packed); XLA elsewhere. The
    CUTADAPT_TPU_PALLAS env var forces it on (1) or off (0)."""
    env = os.environ.get("CUTADAPT_TPU_PALLAS")
    if env == "0" or not packed:
        return "xla"
    if env == "1":
        return "pallas"
    try:
        import jax

        if jax.default_backend() == "tpu":
            return "pallas"
    except Exception:
        pass
    return "xla"


def _unpack_result(arr: np.ndarray):
    """(2, B) int32 -> (found, qstart, qstop, errors, score)."""
    r0 = arr[0].view(np.uint32)
    r1 = arr[1].view(np.uint32)
    qstart = (r0 & ((1 << _QS_BITS) - 1)).astype(np.int32)
    qstop = ((r0 >> _QSTOP_SHIFT) & ((1 << _QS_BITS) - 1)).astype(np.int32)
    found = ((r0 >> _FOUND_SHIFT) & 1).astype(bool)
    errors = (r1 & 0xFFFF).astype(np.int32)
    score = (r1 >> 16).astype(np.int32) - _SCORE_BIAS
    return found, qstart, qstop, errors, score


def adapter_kind(adapter) -> Optional[str]:
    """Map a host adapter object to its AdapterTask kind (None when
    the batch engine has no implementation for it). Adapter classes
    declare their kind; the anchored no-indel variants divert to the
    vectorized comparer implementations."""
    if getattr(adapter, "_force_anywhere", False):
        return None
    kind = getattr(adapter, "kind", None)
    if kind in ("prefix", "suffix") and not adapter.indels:
        return kind + "_cmp"
    if kind in _KIND_INFO or kind in (
        "linked", "indexed_prefix", "indexed_suffix"
    ):
        return kind
    return None


# kind -> (Where flags or None=host comparer, reversed alignment,
#          trim mode: 'before' | 'after' | 'auto')
_KIND_INFO = {
    "back": (Where.BACK.value, False, "after"),
    "front": (Where.FRONT.value, False, "before"),
    "anywhere": (Where.ANYWHERE.value, False, "auto"),
    "noninternal_front": (Where.FRONT_NOT_INTERNAL.value, False, "before"),
    "noninternal_back": (Where.BACK_NOT_INTERNAL.value, False, "after"),
    "prefix": (Where.PREFIX.value, False, "before"),
    "suffix": (Where.SUFFIX.value, False, "after"),
    "rightmost_front": (Where.BACK.value, True, "before"),
    "rightmost_back": (Where.FRONT.value, True, "after"),
    "prefix_cmp": (None, False, "before"),
    "suffix_cmp": (None, True, "after"),
}


class AdapterTask:
    """Device-side matching program for one adapter.

    The trim mode mirrors Remove{Before,After}Match (reference
    adapters.py:427-493): 'after' trims [qstart:], 'before' trims
    [:qstop], 'auto' (anywhere) picks 'before' when the match starts
    at read position 0. Rightmost variants align the reversed window
    (reversed reference, mirrored coordinates — adapters.py:657-786);
    the *_cmp kinds are the anchored no-indel Prefix/SuffixComparer
    scans, evaluated vectorized on the host.
    """

    def __init__(self, adapter, kind: str, index: int):
        from .kmer_finder import KmerFinder

        self.adapter = adapter
        self.kind = kind
        self.index = index
        self.indexed = kind in ("indexed_prefix", "indexed_suffix")
        self.adapters = [adapter]  # flattened identities for routing
        if self.indexed:
            # anchored multi-adapter dict index (host lookups with the
            # exact AdapterIndex semantics, reference adapters.py:
            # 1396-1533); one task stands for many adapters
            self.trim = "before" if kind == "indexed_prefix" else "after"
            self.reverse = False
            self.comparer = False
            self.packed = False
            self.pf_tables = None
            self.spec = None
            self.adapter_index = adapter._index
            self.adapters = list(adapter._index._adapters)
            self._sub_of = {id(a): i for i, a in enumerate(self.adapters)}
            # vectorized single-length lookup: the index dict as a
            # sorted fixed-width key array + payload columns, queried
            # with searchsorted (reads with N or shorter than the key
            # length take the exact per-read path)
            self._fast_len = None
            idx = self.adapter_index
            if len(idx._lengths) == 1:
                L = idx._lengths[0]
                items = sorted(idx._index.items())
                if items:
                    self._fast_len = L
                    self._fast_keys = np.array(
                        [k.encode("ascii") for k, _ in items], dtype=f"S{L}"
                    )
                    self._fast_sub = np.array(
                        [self._sub_of[id(v[0])] for _, v in items], np.int32
                    )
                    self._fast_err = np.array(
                        [v[1] for _, v in items], np.int32
                    )
                    self._fast_score = np.array(
                        [v[2] for _, v in items], np.int32
                    )
            return
        if kind == "linked":
            # 5' phase trims first, 3' phase searches the remainder
            # (reference adapters.py:1064-1178)
            self.trim = "linked"
            self.reverse = False
            self.comparer = False
            fk = adapter_kind(adapter.front_adapter)
            bk = adapter_kind(adapter.back_adapter)
            if fk is None or bk is None or fk == "linked" or bk == "linked":
                raise ValueError("linked sub-adapter not batchable")
            self.front_task = AdapterTask(adapter.front_adapter, fk, 0)
            self.back_task = AdapterTask(adapter.back_adapter, bk, 1)
            if (
                self.front_task.trim != "before"
                or self.back_task.trim != "after"
            ):
                raise ValueError("linked sub-adapter trim modes unsupported")
            self.front_required = adapter.front_required
            self.back_required = adapter.back_required
            return
        flags, self.reverse, self.trim = _KIND_INFO[kind]
        self.comparer = flags is None
        if self.comparer:
            # anchored no-indels comparer: vectorized Hamming on host
            cmp_ = adapter.aligner  # Prefix/SuffixComparer instance
            self.cmp_ref = np.frombuffer(cmp_.reference, np.uint8)
            self.cmp_max_k = cmp_.max_k
            self.cmp_min_overlap = cmp_.min_overlap
            self.cmp_wildcards = cmp_.wildcard_ref or cmp_.wildcard_query
            if cmp_.wildcard_query:
                from .ops.tables import IUPAC_LUT as _lut
            elif cmp_.wildcard_ref:
                from .ops.tables import ACGT_LUT as _lut
            else:
                from .ops.tables import UPPER_LUT as _lut
            self.lut = _lut
            self.packed = False
            self.pf_tables = None
            self.spec = None
            return
        reference = adapter.sequence[::-1] if self.reverse else adapter.sequence
        self.spec = AlignerSpec(
            reference=reference,
            max_error_rate=adapter.max_error_rate,
            flags=flags,
            wildcard_ref=adapter.adapter_wildcards,
            wildcard_query=adapter.read_wildcards,
            indel_cost=1 if adapter.indels else 100000,
            min_overlap=adapter.min_overlap,
        )
        info = query_class_info(self.spec)
        self.packed = info is not None
        self.lut = info[0] if self.packed else query_lut(self.spec)
        self.pf_tables = None
        if native.AVAILABLE and isinstance(adapter.kmer_finder, KmerFinder):
            self.pf_tables = native.PrefilterTables(adapter.kmer_finder)
        self._backend = _pick_backend(self.packed)
        self._scalar = None  # lazy C++ per-read aligner (dirty lane)

    def run_scalar(self, chunk, starts, lens):
        """Per-read C++ DP over explicit windows — the zero-wire lane
        for small counts of 2-bit-dirty reads. Results are identical
        to the device kernel's for the same (possibly reversed)
        window bytes, including reversed-frame coordinates."""
        if self._scalar is None:
            from .ops.align_batch import (
                effective_length, encode_reference, n_counts,
            )

            spec = self.spec
            # ScalarAligner.locate is thread-safe (thread-local
            # scratch); publish _byte_lut before _scalar so a
            # concurrent driver worker never sees the aligner
            # without its lut
            self._byte_lut = query_lut(spec)
            self._scalar = native.ScalarAligner(
                encode_reference(spec).tobytes(),
                n_counts(spec),
                effective_length(spec),
                spec.max_error_rate,
                spec.flags,
                not (spec.wildcard_ref or spec.wildcard_query),
                spec.wildcard_ref,
                spec.indel_cost,
                spec.min_overlap,
            )
        n = len(starts)
        found = np.zeros(n, bool)
        qs = np.zeros(n, np.int32)
        qe = np.zeros(n, np.int32)
        er = np.zeros(n, np.int32)
        sc = np.zeros(n, np.int32)
        astart = np.zeros(n, np.int32)
        astop = np.zeros(n, np.int32)
        buf, lut = chunk.buf, self._byte_lut
        locate = self._scalar.locate
        for i in range(n):
            win = buf[starts[i] : starts[i] + lens[i]]
            if self.reverse:
                win = win[::-1]
            r = locate(lut[win].tobytes())
            if r is None:
                continue
            found[i] = True
            astart[i], astop[i], qs[i], qe[i], sc[i], er[i] = r
        return found, qs, qe, er, sc, astart, astop

    def run_index(self, chunk, starts, lens):
        """Per-read AdapterIndex lookups over the current windows.
        Returns (found, qstart, qstop, errors, score, sub)."""
        n = len(starts)
        found = np.zeros(n, bool)
        qs = np.zeros(n, np.int32)
        qe = np.zeros(n, np.int32)
        er = np.zeros(n, np.int32)
        sc = np.zeros(n, np.int32)
        sub = np.zeros(n, np.int32)
        slow = np.arange(n)
        if self._fast_len is not None and native.AVAILABLE and n:
            L = self._fast_len
            ok = np.flatnonzero(lens >= L)
            if len(ok):
                aff_starts = starts[ok]
                if self.kind == "indexed_suffix":
                    aff_starts = aff_starts + (lens[ok] - L)
                from .ops.tables import UPPER_LUT

                aff = native.pad_encode(
                    chunk.buf, aff_starts.astype(np.int64),
                    np.full(len(ok), L, np.int32),
                    np.arange(len(ok), dtype=np.int64), L, UPPER_LUT,
                )
                has_n = (aff == ord("N")).any(axis=1)
                queries = np.ascontiguousarray(aff).view(f"S{L}").ravel()
                pos = np.searchsorted(self._fast_keys, queries)
                pos_c = np.minimum(pos, len(self._fast_keys) - 1)
                hit = (self._fast_keys[pos_c] == queries) & ~has_n
                hi = ok[hit]
                found[hi] = True
                er[hi] = self._fast_err[pos_c[hit]]
                sc[hi] = self._fast_score[pos_c[hit]]
                sub[hi] = self._fast_sub[pos_c[hit]]
                if self.kind == "indexed_prefix":
                    qs[hi] = 0
                    qe[hi] = L
                else:
                    qs[hi] = lens[hi] - L
                    qe[hi] = lens[hi]
                # N-containing affixes need the wildcard-aware re-
                # alignment path; everything else is fully resolved
                slow = ok[has_n]
        buf = chunk.buf
        match_to = self.adapter_index.match_to
        sub_of = self._sub_of
        for i in slow:
            s = bytes(
                buf[starts[i] : starts[i] + lens[i]]
            ).decode("latin-1")
            m = match_to(s)
            if m is None:
                continue
            found[i] = True
            qs[i] = m.rstart
            qe[i] = m.rstop
            er[i] = m.errors
            sc[i] = m.score
            sub[i] = sub_of[id(m.adapter)]
        return found, qs, qe, er, sc, sub

    def run_comparer(self, enc, lens):
        """Vectorized Prefix/SuffixComparer over encoded windows
        (suffix windows arrive reversed). enc is (B, m')."""
        m = len(self.cmp_ref)
        length = np.minimum(lens, m)
        cols = enc[:, :m]
        if self.cmp_wildcards:
            mism = (cols & self.cmp_ref[None, :]) == 0
        else:
            mism = cols != self.cmp_ref[None, :]
        in_prefix = np.arange(m)[None, :] < length[:, None]
        errors = (mism & in_prefix).sum(axis=1).astype(np.int32)
        found = (errors <= self.cmp_max_k) & (length >= self.cmp_min_overlap)
        score = (length - 2 * errors).astype(np.int32)
        if self.kind == "prefix_cmp":
            qstart = np.zeros_like(length)
            qstop = length.astype(np.int32)
        else:  # suffix: fwd coords (n - length, n)
            qstart = (lens - length).astype(np.int32)
            qstop = lens.astype(np.int32)
        return found, qstart, qstop, errors, score

    def step(self, enc, lengths, wide: bool = False, pack2: bool = False):
        """Dispatch the DP; drops to the XLA kernel if the Pallas
        backend fails to build/compile for this spec or shape. With
        wide=True, uses the unpacked XLA formulation whose result
        fields are full int32 (long reads); pack2=True reads the
        4-per-byte 2-bit encoding. When a shard mesh is active and the
        batch divides over it, the dispatch is data-parallel across
        its devices."""
        mesh = active_mesh_for(len(lengths))
        if wide:
            return _make_locate_step(
                self.spec, self.packed, "xla", True, mesh, pack2
            )(enc, lengths)
        if self._backend == "pallas":
            try:
                return _make_locate_step(
                    self.spec, self.packed, "pallas", False, mesh, pack2
                )(enc, lengths)
            except Exception:
                self._backend = "xla"
        return _make_locate_step(
            self.spec, self.packed, "xla", False, mesh, pack2
        )(enc, lengths)


class Stage:
    pass


class CutStage(Stage):
    """UnconditionalCutter (-u): remove first n (n>0) / last n (n<0)."""

    def __init__(self, length: int, modifier=None):
        self.length = length
        self.modifier = modifier


class QualityStage(Stage):
    def __init__(self, cutoff_front: int, cutoff_back: int, base: int = 33,
                 modifier=None):
        self.cutoff_front = cutoff_front
        self.cutoff_back = cutoff_back
        self.base = base
        self.modifier = modifier


class NextseqStage(Stage):
    def __init__(self, cutoff: int, base: int = 33, modifier=None):
        self.cutoff = cutoff
        self.base = base
        self.modifier = modifier


class PolyAStage(Stage):
    """--poly-a: A-tail trimming, or T-head trimming in revcomp mode
    (the R2 side of paired data)."""

    def __init__(self, modifier=None, revcomp: bool = False):
        self.modifier = modifier
        self.revcomp = revcomp


class NEndStage(Stage):
    """NEndTrimmer (--trim-n): strip N runs from both read ends."""

    def __init__(self, modifier=None):
        self.modifier = modifier


class ShortenStage(Stage):
    def __init__(self, length: int, modifier=None):
        self.length = length
        self.modifier = modifier


class AdapterStage(Stage):
    def __init__(self, tasks: Sequence[AdapterTask], times: int = 1,
                 modifier=None, action: Optional[str] = "trim"):
        assert action in ("trim", None, "retain", "crop", "mask", "lowercase")
        if action in ("retain", "crop"):
            assert times == 1  # enforced by AdapterCutter as well
        self.tasks = list(tasks)
        self.times = times
        self.modifier = modifier
        self.action = action
        # flattened adapter ids for routing (demultiplexing)
        self.gid_base = []
        off = 0
        for t in self.tasks:
            self.gid_base.append(off)
            off += len(t.adapters)
        self.flat_adapters = [a for t in self.tasks for a in t.adapters]


class RevcompStage(AdapterStage):
    """--revcomp: try forward and reverse-complement, keep the better
    (reference ReverseComplementer, modifiers.py:237-279). The wrapped
    cutter's action may be trim (windows shrink) or mask/lowercase
    (windows keep the chosen orientation's extent; the trimmed-window
    remainder drives the transform assembler)."""

    def __init__(self, tasks, times=1, modifier=None, suffix=" rc",
                 action="trim"):
        super().__init__(tasks, times=times, modifier=modifier,
                         action=action)
        self.suffix = suffix
        # FASTA chunks alias their quality offsets to the sequence, so
        # the rc copy must not reverse "qualities" there (the driver
        # clears this for FASTA input)
        self.has_quals = True


def _complement_table() -> np.ndarray:
    from .io.records import _COMPLEMENT_TABLE

    tbl = np.arange(256, dtype=np.uint8)
    for k, v in _COMPLEMENT_TABLE.items():
        tbl[k] = ord(v)
    return tbl


def _revcomp_sequences_only(rc_buf: np.ndarray, parsed) -> None:
    """Reverse-complement each record's sequence bytes in rc_buf,
    leaving everything else untouched — for FASTA chunks, whose
    quality offsets alias the sequence region."""
    lens = parsed.seq_len.astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return
    reps = np.repeat(np.arange(len(lens)), lens)
    offs = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    starts = parsed.seq_start[reps]
    src = starts + offs
    dst = starts + (lens[reps] - 1 - offs)
    rc_buf[dst] = _complement_table()[parsed.buf[src]]


class FilterSpec:
    """One filtering step: 'too_short', 'too_long', 'discard_trimmed',
    'discard_untrimmed', 'too_many_n', 'too_many_expected_errors',
    'too_high_average_error_rate' or 'casava', with its threshold;
    counts how many reads it drops."""

    def __init__(self, kind: str, threshold=None, step=None):
        self.kind = kind
        self.threshold = threshold
        self.step = step


def filter_condition(kind, threshold, chunk, win_start, win_stop,
                     lengths, matched, mask_remainder=None):
    """Per-read boolean 'predicate holds' vector for one filter kind,
    with exact host-predicate semantics (predicates.py).

    `mask_remainder` is the (start, stop) remainder interval of the
    mask action's adapter stage, when one ran: the host predicate sees
    the masked read, whose bytes outside the remainder are all 'N', so
    the N count is the remainder's N count plus the masked byte count.
    (Only too_many_n needs this: lowercase leaves 'n'/'N' counts
    unchanged, and the quality string is never transformed.)"""
    if kind == "too_short":
        return lengths < threshold
    if kind == "too_long":
        return lengths > threshold
    if kind == "discard_trimmed":
        return matched
    if kind == "discard_untrimmed":
        return ~matched
    if kind == "too_many_n":
        if mask_remainder is not None:
            rs, re_ = mask_remainder
            nc = native.count_n(chunk.buf, chunk.seq_start, rs, re_)
            nc = nc + (lengths - (re_ - rs))
        else:
            nc = native.count_n(
                chunk.buf, chunk.seq_start, win_start, win_stop
            )
        if threshold < 1.0:  # proportion of the read length
            out = np.zeros(len(lengths), bool)
            nz = lengths > 0
            out[nz] = nc[nz] / lengths[nz] > threshold
            return out
        return nc > threshold
    if kind in ("too_many_expected_errors", "too_high_average_error_rate"):
        from .qualtrim import _SCORE_TO_ERROR_RATE, expected_errors

        ee = native.expected_errors_win(
            chunk.buf, chunk.qual_start, win_start, win_stop,
            np.asarray(_SCORE_TO_ERROR_RATE, np.float64),
        )
        for i in np.flatnonzero(ee < 0):
            # invalid phred: raise the host path's exact error
            q = bytes(
                chunk.buf[
                    chunk.qual_start[i] + win_start[i] :
                    chunk.qual_start[i] + win_stop[i]
                ]
            ).decode("latin-1")
            expected_errors(q)
        if kind == "too_many_expected_errors":
            return ee > threshold
        out = np.zeros(len(lengths), bool)
        nz = lengths > 0
        out[nz] = ee[nz] / lengths[nz] > threshold
        return out
    if kind == "casava_filtered":
        return native.casava_filtered(
            chunk.buf, chunk.head_start, chunk.head_end
        ).astype(bool)
    raise ValueError(kind)


class PendingBatch:
    __slots__ = (
        "parsed", "win_start", "win_stop", "stats",
        "adapter_stage", "adapter_round", "post_stages", "filters_state",
        "dp_futures", "width",
    )

    def __init__(self, parsed, win_start, win_stop, stats, adapter_stage,
                 post_stages, dp_futures, width):
        self.parsed = parsed
        self.win_start = win_start
        self.win_stop = win_stop
        self.stats = stats
        self.adapter_stage = adapter_stage
        self.post_stages = post_stages
        self.dp_futures = dp_futures
        self.width = width


class BatchPipelineEngine:
    """Executes stages then filters over parsed FASTQ chunks."""

    def __init__(
        self,
        stages: Sequence[Stage],
        filters: Sequence[FilterSpec] = (),
        length_bucket: int = 64,
        min_dp_batch: int = 4096,
        max_dp_batch: int = 131072,
        want_ref_coords: bool = False,
        qual_cap_base: Optional[int] = None,
    ):
        self.stages = list(stages)
        self.filters = list(filters)
        # adapter-side [astart, astop) spans are only carried by the
        # wide result format (--wildcard-file needs them)
        self.want_ref_coords = want_ref_coords
        # a trailing ZeroCapper runs before the filter steps on the
        # host, so expected-error filters must see capped qualities
        self.qual_cap_base = qual_cap_base
        # optional (chunk, stats, ws, we) -> chunk header-edit hook:
        # name-edit modifiers run before the filter steps on the host,
        # so a casava filter must see the edited headers; the edited
        # chunk is handed back to the caller via stats["edited_chunk"]
        self.pre_filter_edit = None
        self.length_bucket = length_bucket
        self.min_dp_batch = min_dp_batch
        self.max_dp_batch = max_dp_batch
        # split stages at the (single) adapter stage: everything after
        # it depends on DP results and runs in collect()
        self._adapter_pos = next(
            (i for i, s in enumerate(self.stages)
             if isinstance(s, AdapterStage)),
            None,
        )
        if sum(isinstance(s, AdapterStage) for s in self.stages) > 1:
            raise ValueError("at most one adapter stage is supported")

    # --- host stages -------------------------------------------------------

    def _apply_host_stage(self, si, stage, chunk, win_start, win_stop, stats):
        if isinstance(stage, CutStage):
            n = stage.length
            if n > 0:
                win_start = np.minimum(win_start + n, win_stop)
            else:
                win_stop = np.maximum(win_stop + n, win_start)
        elif isinstance(stage, QualityStage):
            # both passes always run, like the host's
            # quality_trim_index: a cutoff of 0 still trims bytes
            # below the quality base (negative scores)
            rs, re_ = native.quality_trim(
                chunk.buf, chunk.qual_start, win_start, win_stop,
                stage.cutoff_front, stage.cutoff_back, stage.base,
            )
            trimmed = (win_stop - win_start) - (re_ - rs)
            stats.setdefault("quality_trimmed", {})[si] = int(trimmed.sum())
            new_start = win_start + rs
            win_stop = win_start + re_
            win_start = new_start
        elif isinstance(stage, NextseqStage):
            re_ = native.nextseq_trim(
                chunk.buf, chunk.seq_start, chunk.qual_start,
                win_start, win_stop, stage.cutoff, stage.base,
            )
            trimmed = (win_stop - win_start) - re_
            stats.setdefault("quality_trimmed", {})[si] = int(trimmed.sum())
            win_stop = win_start + re_
        elif isinstance(stage, PolyAStage):
            idx = native.poly_a_trim(
                chunk.buf, chunk.seq_start, win_start, win_stop,
                revcomp=stage.revcomp,
            )
            if stage.revcomp:  # poly-T head: idx = head length removed
                stats.setdefault("poly_a_removed", {})[si] = idx
                win_start = win_start + idx
            else:
                removed = (win_stop - win_start) - idx
                stats.setdefault("poly_a_removed", {})[si] = removed
                win_stop = win_start + idx
        elif isinstance(stage, NEndStage):
            rs, re_ = native.trim_n_ends(
                chunk.buf, chunk.seq_start, win_start, win_stop
            )
            new_start = win_start + rs
            win_stop = win_start + re_
            win_start = new_start
        elif isinstance(stage, ShortenStage):
            n = stage.length
            if n >= 0:
                win_stop = np.minimum(win_start + n, win_stop)
            else:
                win_start = np.maximum(win_stop + n, win_start)
        else:
            raise TypeError(f"not a host stage: {stage}")
        return win_start, win_stop

    # --- adapter stage -----------------------------------------------------

    def _bucket_length(self, max_len: int) -> int:
        b = self.length_bucket
        return max(b, (int(max_len) + b - 1) // b * b)

    def _dp_sizes(self, n: int) -> List[int]:
        """Dispatch batch sizes covering n reads: power-of-two buckets
        (bounded compile count), padded to the active mesh so every
        dispatch shards evenly over its devices.

        The cover is the BINARY DECOMPOSITION of n (floored at
        min_dp_batch), not a single round-up bucket: padding — wasted
        wire bytes and DP rows — is bounded by min_dp_batch per chunk
        instead of by the next power of two (up to 2x the remainder).
        Same compiled-shape set either way."""
        sizes = []
        big = mesh_padded(self.max_dp_batch)
        while n > big:
            sizes.append(big)
            n -= big
        s = self.max_dp_batch
        while n > 0:
            cap = mesh_padded(s)
            if n >= cap or s <= self.min_dp_batch:
                sizes.append(cap)
                n -= cap
            else:
                s //= 2
        return sizes

    def warmup(self, max_len: int) -> None:
        """Compile every adapter task's DP program for each batch shape
        that can occur for reads up to max_len — with the exact runtime
        signatures: int16 length rows in the packed (non-wide) result
        format, and BOTH wire lanes of a 2-bit task (dirty N/IUPAC
        batches overflow to a 4-bit device lane)."""
        width = self._bucket_length(max_len)
        wide = self.want_ref_coords or width >= (1 << _QS_BITS)
        exact = _exact_wire_on()
        for stage in self.stages:
            if not isinstance(stage, AdapterStage):
                continue
            for task in stage.tasks:
                subtasks = (
                    [task.front_task, task.back_task]
                    if task.kind == "linked" else [task]
                )
                for t in subtasks:
                    if t.comparer:
                        continue
                    lanes = []  # (pack2, row bytes, wire width)
                    for p2 in (
                        (True, False)
                        if t.packed and native.AVAILABLE and _pack2_on()
                        else ((False,) if t.packed else (None,))
                    ):
                        if p2 is None:  # byte lane
                            w = (
                                _eff_width(max_len, width, False, False)
                                if exact else width
                            )
                            lanes.append((False, w, w))
                        else:
                            w = (
                                _eff_width(max_len, width, p2, True)
                                if exact else width
                            )
                            lanes.append((p2, w // 4 if p2 else w // 2, w))
                    s = self.min_dp_batch
                    while s <= self.max_dp_batch:
                        sp = mesh_padded(s)
                        for p2, w_in, w in lanes:
                            if wide:
                                len_dt = np.int32
                            elif exact and w < 256:
                                len_dt = np.uint8
                            else:
                                len_dt = np.int16
                            t.step(
                                np.zeros((sp, w_in), np.uint8),
                                np.zeros(sp, len_dt),
                                wide=wide, pack2=p2,
                            ).block_until_ready()
                        s *= 2

    def _encode(self, task, chunk, starts, lens, sel, rows, width,
                pack2: bool = False):
        """(rows, width[/2 or /4]) uint8 batch of the selected windows."""
        if pack2:
            w_in = width // 4
        elif task.packed:
            w_in = width // 2
        else:
            w_in = width
        enc = np.zeros((rows, w_in), np.uint8)
        take = len(sel)
        if native.AVAILABLE:
            native.pad_encode(
                chunk.buf, starts, lens, sel, width, task.lut,
                pack4=task.packed and not pack2, pack2=pack2,
                out=enc, reverse=task.reverse,
            )
        else:
            from .io.chunks import pad_rows

            raw = pad_rows(chunk.buf, starts[sel], lens[sel], width)
            if task.reverse:
                # reverse each row's first len bytes
                rev = np.zeros_like(raw)
                for pos, (row, ln) in enumerate(zip(raw, lens[sel])):
                    rev[pos, :ln] = row[:ln][::-1]
                raw = rev
            e = task.lut[raw]
            if pack2:
                e = (
                    e[:, 0::4] | (e[:, 1::4] << 2)
                    | (e[:, 2::4] << 4) | (e[:, 3::4] << 6)
                ).astype(np.uint8)
            elif task.packed:
                e = (e[:, 0::2] | (e[:, 1::2] << 4)).astype(np.uint8)
            enc[:take] = e
        return enc

    def _dispatch_stage(self, stage, chunk, subset, win_start, win_stop,
                        width):
        """Dispatch all of a stage's tasks, sharing one upload of the
        candidate windows between DP tasks that can read the same
        encoding (same wildcard flags and orientation).

        Rationale: per-task dispatch uploads each task's candidate
        subset separately; with n adapters that is n transfers of
        nearly the same bytes over a link where transfers are the
        scarce resource. Grouped tasks instead take the union of their
        prefilter candidates, encode once with the shared unpacked
        byte LUT, place the batch on device once, and run each task's
        kernel against the resident array — correct because the
        prefilter is one-sided (a prefilter-rejected read can never
        align, so running the DP on another task's candidates only
        produces found=False). CUTADAPT_TPU_SHARED_UPLOAD=0 disables.
        """
        tasks = stage.tasks
        per_task = lambda: [
            self._dispatch_task(t, chunk, subset, win_start, win_stop,
                                width)
            for t in tasks
        ]
        if (
            os.environ.get("CUTADAPT_TPU_SHARED_UPLOAD", "1") == "0"
            or _ACTIVE_MESH is not None
        ):
            return per_task()
        groups = {}
        for i, t in enumerate(tasks):
            if t.comparer or t.indexed or t.kind == "linked":
                continue
            if t.packed and native.AVAILABLE and _pack2_on():
                # tasks with byte-identical query-class LUTs can share
                # one *packed* upload (every plain-ACGT adapter set
                # lands in one group): 2-8x fewer wire bytes than the
                # unpacked byte sharing below
                key = ("cls", t.reverse, t.lut.tobytes())
            else:
                key = (
                    "byte", t.spec.wildcard_ref, t.spec.wildcard_query,
                    t.reverse,
                )
            groups.setdefault(key, []).append(i)
        if not any(len(members) > 1 for members in groups.values()):
            return per_task()

        import jax

        from .ops.tables import ACGT_LUT, IUPAC_LUT, UPPER_LUT

        disp = [None] * len(tasks)
        starts = (
            chunk.seq_start[subset] + win_start[subset]
        ).astype(np.int64)
        lens = (win_stop[subset] - win_start[subset]).astype(np.int32)
        n = len(starts)
        for key, members in groups.items():
            if len(members) < 2:
                continue
            reverse = key[1] if key[0] == "cls" else key[3]
            union = np.zeros(n, bool)
            for i in members:
                t = tasks[i]
                if (
                    t.pf_tables is not None and native.AVAILABLE
                    and not _device_prefilter_on()
                ):
                    union |= native.kmer_prefilter(
                        chunk.buf, starts, lens, t.pf_tables,
                        reverse=t.reverse,
                    ).astype(bool)
                else:
                    union[:] = True
                    break
            sel = np.flatnonzero(union)
            if len(sel) == 0:
                for i in members:
                    disp[i] = ("single", sel, [])
                continue
            c_starts, c_lens = starts[sel], lens[sel]
            wide = (
                int(c_lens.max()) >= (1 << _QS_BITS)
                or self.want_ref_coords
            )
            futures = {i: [] for i in members}
            if key[0] == "cls":
                t0 = tasks[members[0]]
                lanes = [(len(sel), False)]
                clean = native.windows_clean(
                    chunk.buf, c_starts, c_lens, width, t0.lut,
                    reverse=reverse,
                )
                n_clean = int(clean.sum())
                n_dirty = len(sel) - n_clean
                if n_dirty == 0:
                    lanes = [(len(sel), True)]
                elif n_clean > 0:
                    order = np.concatenate(
                        [np.flatnonzero(clean), np.flatnonzero(~clean)]
                    )
                    sel = sel[order]
                    c_starts = c_starts[order]
                    c_lens = c_lens[order]
                    lanes = [(n_clean, True), (n_dirty, False)]
                exact = _exact_wire_on()
                if exact and len(sel) > 1:
                    parts, seg_base = [], 0
                    for count, _p2 in lanes:
                        seg = np.arange(seg_base, seg_base + count)
                        parts.append(
                            seg[np.argsort(-c_lens[seg], kind="stable")]
                        )
                        seg_base += count
                    perm = np.concatenate(parts)
                    sel = sel[perm]
                    c_starts = c_starts[perm]
                    c_lens = c_lens[perm]
                tail_max = _scalar_tail_max() if native.AVAILABLE else 0
                base = 0
                for count, p2 in lanes:
                    dev_count = count
                    if 0 < tail_max < count:
                        covered = 0
                        for size in self._dp_sizes(count):
                            if covered + size <= count:
                                covered += size
                            else:
                                break
                        rem = count - covered
                        if covered and 0 < rem <= tail_max:
                            dev_count = covered
                    off = 0
                    for size in self._dp_sizes(dev_count):
                        take = min(size, dev_count - off)
                        if take <= 0:
                            break
                        if exact:
                            bmax = int(
                                c_lens[base + off : base + off + take].max()
                            )
                            b_w = _eff_width(bmax, width, p2, t0.packed)
                        else:
                            b_w = width
                        enc = self._encode(
                            t0, chunk, c_starts, c_lens,
                            np.arange(base + off, base + off + take,
                                      dtype=np.int64),
                            size, b_w, pack2=p2,
                        )
                        sub_len = _wire_lengths(
                            c_lens[base + off : base + off + take],
                            size, wide,
                            width=b_w if exact else None,
                        )
                        _xfer_add(h2d=enc.nbytes + sub_len.nbytes,
                                  candidates=take,
                                  dp_rows=size * len(members))
                        dev_enc = jax.device_put(enc)
                        dev_len = jax.device_put(sub_len)
                        for i in members:
                            fut = tasks[i].step(
                                dev_enc, dev_len, wide=wide, pack2=p2
                            )
                            try:
                                fut.copy_to_host_async()
                            except Exception:
                                pass
                            futures[i].append(
                                (base + off, take, fut, wide)
                            )
                        off += size
                    if dev_count < count:
                        s0, s1 = base + dev_count, base + count
                        _xfer_add(candidates=count - dev_count)
                        for i in members:
                            futures[i].append(
                                ("host_range", s0)
                                + tasks[i].run_scalar(
                                    chunk, c_starts[s0:s1], c_lens[s0:s1]
                                )
                            )
                    base += count
                for i in members:
                    disp[i] = ("single", sel, futures[i])
                continue
            _, wc_ref, wc_query, reverse = key
            if wc_query:
                lut = IUPAC_LUT
            elif wc_ref:
                lut = ACGT_LUT
            else:
                lut = UPPER_LUT
            exact = _exact_wire_on()
            if exact and len(sel) > 1:
                order = np.argsort(-c_lens, kind="stable")
                sel = sel[order]
                c_starts = c_starts[order]
                c_lens = c_lens[order]
            off = 0
            for size in self._dp_sizes(len(sel)):
                take = min(size, len(sel) - off)
                if take <= 0:
                    break
                b_w = (
                    _eff_width(int(c_lens[off : off + take].max()),
                               width, False, False)
                    if exact else width
                )
                enc = np.zeros((size, b_w), np.uint8)
                if native.AVAILABLE:
                    native.pad_encode(
                        chunk.buf, c_starts, c_lens,
                        np.arange(off, off + take, dtype=np.int64),
                        b_w, lut, pack4=False, out=enc, reverse=reverse,
                    )
                else:
                    from .io.chunks import pad_rows

                    raw = pad_rows(
                        chunk.buf, c_starts[off : off + take],
                        c_lens[off : off + take], b_w,
                    )
                    if reverse:
                        rev = np.zeros_like(raw)
                        for pos, (row, ln) in enumerate(
                            zip(raw, c_lens[off : off + take])
                        ):
                            rev[pos, :ln] = row[:ln][::-1]
                        raw = rev
                    enc[:take] = lut[raw]
                sub_len = _wire_lengths(
                    c_lens[off : off + take], size, wide,
                    width=b_w if exact else None,
                )
                _xfer_add(h2d=enc.nbytes + sub_len.nbytes,
                          candidates=take, dp_rows=size * len(members))
                dev_enc = jax.device_put(enc)
                dev_len = jax.device_put(sub_len)
                for i in members:
                    fut = _make_locate_step(
                        tasks[i].spec, False, "xla", wide, None,
                    )(dev_enc, dev_len)
                    try:
                        fut.copy_to_host_async()
                    except Exception:
                        pass
                    futures[i].append((off, take, fut, wide))
                off += size
            for i in members:
                disp[i] = ("single", sel, futures[i])
        for i, t in enumerate(tasks):
            if disp[i] is None:
                disp[i] = self._dispatch_task(
                    t, chunk, subset, win_start, win_stop, width
                )
        return disp

    def _dispatch_task(self, task, chunk, subset, win_start, win_stop, width):
        """Prefilter + encode + dispatch for `subset` (read indices)
        over their current windows. Returns ('single', sel, futures)
        or, for linked adapters, ('linked', starts, lens, front_disp)
        where positions are relative to `subset`."""
        starts = (chunk.seq_start[subset] + win_start[subset]).astype(np.int64)
        lens = (win_stop[subset] - win_start[subset]).astype(np.int32)
        if task.kind == "linked":
            fd = self._dispatch_windows(
                task.front_task, chunk, starts, lens, width
            )
            return ("linked", starts, lens, fd)
        sel, futures = self._dispatch_windows(task, chunk, starts, lens, width)
        return ("single", sel, futures)

    def _dispatch_windows(self, task, chunk, starts, lens, width):
        """Like _dispatch_task but over explicit (starts, lens) window
        arrays; returns (sel positions into starts, futures)."""
        if (
            task.pf_tables is not None and native.AVAILABLE
            and not _device_prefilter_on()
        ):
            mask = native.kmer_prefilter(
                chunk.buf, starts, lens, task.pf_tables, reverse=task.reverse
            ).astype(bool)
            sel = np.flatnonzero(mask)
        else:
            # no prefilter (MockKmerFinder, comparers, native lib
            # unavailable, or device-prefilter mode): every read is a
            # candidate — never different
            sel = np.arange(len(starts))
        futures = []
        if len(sel) == 0:
            return sel, futures
        c_starts = starts[sel]
        c_lens = lens[sel]
        if task.indexed:
            futures.append(
                ("host",) + task.run_index(chunk, c_starts, c_lens)
            )
            return sel, futures
        if task.comparer:
            m_w = (len(task.cmp_ref) + 1) // 2 * 2
            enc = self._encode(
                task, chunk, c_starts, c_lens,
                np.arange(len(sel), dtype=np.int64), len(sel), m_w,
            )
            futures.append(("host",) + task.run_comparer(enc, c_lens))
            return sel, futures
        # windows >= 2**14 bp would overflow the packed 14-bit
        # coordinate fields: use the unpacked wide result format
        wide = (
            int(c_lens.max()) >= (1 << _QS_BITS) or self.want_ref_coords
        )
        # 2-bit lane split: reads whose window is ACGT-class-only ride
        # the 2-bit encoding (half the 4-bit lane's wire bytes); the
        # rare N/IUPAC-containing reads take the host scalar aligner
        # (zero wire) when few, or a 4-bit device lane otherwise
        lanes = [(len(sel), False)]  # (count, pack2) over sel's order
        host_tail = 0
        if task.packed and native.AVAILABLE and _pack2_on():
            clean = native.windows_clean(
                chunk.buf, c_starts, c_lens, width, task.lut,
                reverse=task.reverse,
            )
            n_clean = int(clean.sum())
            n_dirty = len(sel) - n_clean
            if n_dirty == 0:
                lanes = [(len(sel), True)]
            elif n_clean > 0:
                order = np.concatenate(
                    [np.flatnonzero(clean), np.flatnonzero(~clean)]
                )
                sel = sel[order]
                c_starts = c_starts[order]
                c_lens = c_lens[order]
                if n_dirty <= max(64, len(sel) >> 6):
                    lanes = [(n_clean, True)]
                    host_tail = n_dirty
                else:
                    lanes = [(n_clean, True), (n_dirty, False)]
        exact = _exact_wire_on()
        if exact and len(sel) > 1:
            # length-sort each lane segment (descending) so the
            # binary-decomposition batches after the first get
            # progressively narrower exact-wire widths
            parts, seg_base = [], 0
            for count, _p2 in lanes:
                seg = np.arange(seg_base, seg_base + count)
                parts.append(seg[np.argsort(-c_lens[seg], kind="stable")])
                seg_base += count
            if seg_base < len(sel):  # host-scalar tail, order kept
                parts.append(np.arange(seg_base, len(sel)))
            perm = np.concatenate(parts)
            sel = sel[perm]
            c_starts = c_starts[perm]
            c_lens = c_lens[perm]
        tail_max = _scalar_tail_max() if native.AVAILABLE else 0
        base = 0
        for count, p2 in lanes:
            dev_count = count
            if 0 < tail_max < count:
                covered = 0
                for size in self._dp_sizes(count):
                    if covered + size <= count:
                        covered += size
                    else:
                        break  # the padded tail batch
                rem = count - covered
                if covered and 0 < rem <= tail_max:
                    # decomposition remainder: zero-wire scalar lane
                    # instead of a padded min_dp_batch dispatch
                    dev_count = covered
            off = 0
            for size in self._dp_sizes(dev_count):
                take = min(size, dev_count - off)
                if take <= 0:
                    break
                if exact:
                    bmax = int(c_lens[base + off : base + off + take].max())
                    b_w = _eff_width(bmax, width, p2, task.packed)
                else:
                    b_w = width
                enc = self._encode(
                    task, chunk, c_starts, c_lens,
                    np.arange(base + off, base + off + take,
                              dtype=np.int64),
                    size, b_w, pack2=p2,
                )
                sub_len = _wire_lengths(
                    c_lens[base + off : base + off + take], size, wide,
                    width=b_w if exact else None,
                )
                _xfer_add(h2d=enc.nbytes + sub_len.nbytes,
                          candidates=take, dp_rows=size)
                fut = task.step(enc, sub_len, wide=wide, pack2=p2)
                try:
                    fut.copy_to_host_async()
                except Exception:
                    pass
                futures.append((base + off, take, fut, wide))
                off += size
            if dev_count < count:
                s0, s1 = base + dev_count, base + count
                _xfer_add(candidates=count - dev_count)
                futures.append(
                    ("host_range", s0)
                    + task.run_scalar(
                        chunk, c_starts[s0:s1], c_lens[s0:s1]
                    )
                )
            base += count
        if host_tail:
            futures.append(
                ("host_range", base)
                + task.run_scalar(chunk, c_starts[base:], c_lens[base:])
            )
        return sel, futures

    def _fetch_windows(self, task, sel, futures, lens, ref_coords=False):
        """Fetch one task's results; returns arrays over `sel`'s
        positions with coordinates mirrored to forward orientation.
        With `ref_coords`, also returns the adapter-side [astart,
        astop) spans (requires want_ref_coords dispatches so the wide
        result format carried them) — same mirroring as
        _adapter_round."""
        f, qs, qe, er, sc, _, as_, ae = self._fetch_task(len(sel), futures)
        if task.reverse and not task.comparer:
            L = lens[sel]
            qs, qe = L - qe, L - qs
            if ref_coords:
                m_len = len(task.spec.reference)
                as_, ae = m_len - ae, m_len - as_
        if ref_coords:
            if task.comparer:
                # anchored comparers always report the full span
                as_ = np.zeros_like(qs)
                ae = np.full_like(qs, len(task.cmp_ref))
            return f, qs, qe, er, sc, as_, ae
        return f, qs, qe, er, sc

    def _resolve_linked(self, task, chunk, starts, lens, front_disp, width):
        """Run the two-phase linked matching; returns a dict of arrays
        over the subset positions (window-relative coordinates; back
        coordinates are relative to the post-front-trim window)."""
        n = len(starts)
        sel_f, fut_f = front_disp
        ff, fqs, fqe, fer, fsc = self._fetch_windows(
            task.front_task, sel_f, fut_f, lens
        )
        front_found = np.zeros(n, bool)
        front_found[sel_f] = ff
        front_qs = np.zeros(n, np.int32)
        front_qs[sel_f] = np.where(ff, fqs, 0)
        front_qe = np.zeros(n, np.int32)
        front_qe[sel_f] = np.where(ff, fqe, 0)
        front_er = np.zeros(n, np.int32)
        front_er[sel_f] = np.where(ff, fer, 0)
        front_sc = np.zeros(n, np.int32)
        front_sc[sel_f] = np.where(ff, fsc, 0)

        if task.front_required:
            el = np.flatnonzero(front_found)
        else:
            el = np.arange(n)
        back_found = np.zeros(n, bool)
        back_qs = np.zeros(n, np.int32)
        back_qe = np.zeros(n, np.int32)
        back_er = np.zeros(n, np.int32)
        back_sc = np.zeros(n, np.int32)
        if len(el):
            starts_b = starts[el] + front_qe[el]
            lens_b = lens[el] - front_qe[el]
            sel_b, fut_b = self._dispatch_windows(
                task.back_task, chunk, starts_b, lens_b, width
            )
            bf, bqs, bqe, ber, bsc = self._fetch_windows(
                task.back_task, sel_b, fut_b, lens_b
            )
            hit = el[sel_b]
            back_found[hit] = bf
            back_qs[hit] = np.where(bf, bqs, 0)
            back_qe[hit] = np.where(bf, bqe, 0)
            back_er[hit] = np.where(bf, ber, 0)
            back_sc[hit] = np.where(bf, bsc, 0)

        found = (front_found | (not task.front_required)) & (
            back_found | (front_found & (not task.back_required))
        )
        return dict(
            found=found,
            score=front_sc + back_sc,
            errors=front_er + back_er,
            front_found=front_found,
            front_qs=front_qs,
            front_qe=front_qe,
            front_errors=front_er,
            back_found=back_found,
            back_qs=back_qs,
            back_qe=back_qe,
            back_errors=back_er,
        )

    def _fetch_task(self, n_cand, futures):
        found = np.zeros(n_cand, bool)
        qstart = np.zeros(n_cand, np.int32)
        qstop = np.zeros(n_cand, np.int32)
        errors = np.zeros(n_cand, np.int32)
        score = np.zeros(n_cand, np.int32)
        sub = np.zeros(n_cand, np.int32)
        astart = np.zeros(n_cand, np.int32)
        astop = np.zeros(n_cand, np.int32)
        for fut in futures:
            if fut[0] == "host":  # comparer/index result, complete
                if len(fut) == 7:  # indexed: carries sub-adapter ids
                    (_, found[:], qstart[:], qstop[:], errors[:],
                     score[:], sub[:]) = fut
                else:
                    (_, found[:], qstart[:], qstop[:], errors[:],
                     score[:]) = fut
                continue
            if fut[0] == "host_range":  # scalar-aligner dirty tail
                _, off, f, qs, qe, er, sc, as_, ae_ = fut
                end = off + len(f)
                found[off:end] = f
                qstart[off:end] = qs
                qstop[off:end] = qe
                errors[off:end] = er
                score[off:end] = sc
                astart[off:end] = as_
                astop[off:end] = ae_
                continue
            off, count, dev, wide = fut
            arr = np.asarray(dev)
            _xfer_add(d2h=arr.nbytes)
            if wide:
                f = arr[0, :count].astype(bool)
                qs, qe, er, sc = (
                    arr[1, :count], arr[2, :count],
                    arr[3, :count], arr[4, :count],
                )
                astart[off : off + count] = arr[5, :count]
                astop[off : off + count] = arr[6, :count]
            else:
                f, qs, qe, er, sc = _unpack_result(arr[:, :count])
            found[off : off + count] = f
            qstart[off : off + count] = qs
            qstop[off : off + count] = qe
            errors[off : off + count] = er
            score[off : off + count] = sc
        return found, qstart, qstop, errors, score, sub, astart, astop

    def _adapter_round(self, stage, chunk, subset, win_start, win_stop,
                       width, dispatched=None, last_gid=None,
                       score_acc=None):
        """One matching round over `subset`. Returns (matched_mask_over_
        subset, events) and updates windows (and last_gid/score_acc)
        in place."""
        B = chunk.n_records
        if dispatched is None:
            dispatched = self._dispatch_stage(
                stage, chunk, subset, win_start, win_stop, width
            )
        # combine: best score, then fewer errors, then first adapter
        best_found = np.zeros(B, bool)
        best_score = np.zeros(B, np.int32)
        best_errors = np.zeros(B, np.int32)
        best_qstart = np.zeros(B, np.int32)
        best_qstop = np.zeros(B, np.int32)
        best_astart = np.zeros(B, np.int32)
        best_astop = np.zeros(B, np.int32)
        best_task = np.full(B, -1, np.int32)
        best_sub = np.zeros(B, np.int32)
        linked_results = {}
        for t_i, (task, disp) in enumerate(zip(stage.tasks, dispatched)):
            sub = None
            if disp[0] == "linked":
                _, starts, lens, front_disp = disp
                res = self._resolve_linked(
                    task, chunk, starts, lens, front_disp, width
                )
                linked_results[t_i] = res
                cand = subset
                f, er, sc = res["found"], res["errors"], res["score"]
                qs = qe = as_ = ae = np.zeros(len(subset), np.int32)
            else:
                _, sel, futures = disp
                if len(sel) == 0:
                    continue
                cand = subset[sel]
                lens = (win_stop[cand] - win_start[cand]).astype(np.int32)
                f, qs, qe, er, sc, sub, as_, ae = self._fetch_task(
                    len(sel), futures
                )
                if task.reverse and not task.comparer:
                    # mirror reversed coordinates to forward orientation
                    qs, qe = lens - qe, lens - qs
                    m_len = len(task.spec.reference)
                    as_, ae = m_len - ae, m_len - as_
                if task.comparer:
                    # anchored comparers always report the full span
                    as_ = np.zeros_like(qs)
                    ae = np.full_like(qs, len(task.cmp_ref))
                elif task.indexed:
                    as_ = np.zeros_like(qs)
                    ae = np.array(
                        [len(a.sequence) for a in task.adapters], np.int32
                    )[sub]
            better = f & (
                ~best_found[cand]
                | (sc > best_score[cand])
                | ((sc == best_score[cand]) & (er < best_errors[cand]))
            )
            upd = cand[better]
            best_found[upd] = True
            best_score[upd] = sc[better]
            best_errors[upd] = er[better]
            best_qstart[upd] = qs[better]
            best_qstop[upd] = qe[better]
            best_astart[upd] = as_[better]
            best_astop[upd] = ae[better]
            best_task[upd] = t_i
            best_sub[upd] = sub[better] if sub is not None else 0

        matched = best_found[subset]
        # routing ids for demultiplexing: the LAST match decides
        if last_gid is not None:
            idx = np.flatnonzero(best_found)
            last_gid[idx] = (
                np.asarray(stage.gid_base, np.int32)[best_task[idx]]
                + best_sub[idx]
            )
        if score_acc is not None:
            idx = np.flatnonzero(best_found)
            score_acc[idx] += best_score[idx]
        events = []
        for t_i, task in enumerate(stage.tasks):
            hit = np.flatnonzero(best_found & (best_task == t_i))
            if len(hit) == 0:
                continue
            if task.trim == "linked":
                res = linked_results[t_i]
                pos = np.searchsorted(subset, hit)
                ws0 = win_start[hit].copy()
                we0 = win_stop[hit].copy()
                ffm = res["front_found"][pos]
                bfm = res["back_found"][pos]
                f_qe_all = res["front_qe"][pos]
                # 5' phase event (removed = front.rstop); match
                # geometry carries the ";1" info-row name suffix
                fh = hit[ffm]
                if len(fh):
                    events.append(
                        dict(task=t_i, reads=fh, removed=f_qe_all[ffm],
                             errors=res["front_errors"][pos][ffm],
                             as_front=np.ones(len(fh), bool),
                             adjacent=np.zeros(len(fh), np.uint8),
                             sub=np.zeros(len(fh), np.int32),
                             suffix=";1",
                             # per-read stats (on_reverse_complement)
                             # credit one LinkedMatch per read per
                             # round, not one per phase: the 5' phase
                             # event is the primary, the 3' phase
                             # event only for back-only matches
                             primary=np.ones(len(fh), bool),
                             qs=res["front_qs"][pos][ffm],
                             qe=f_qe_all[ffm],
                             ws=ws0[ffm], we=we0[ffm])
                    )
                # 3' phase event (coordinates relative to the
                # post-front window; adjacent base from that window)
                bh = hit[bfm]
                if len(bh):
                    b_qs = res["back_qs"][pos][bfm]
                    post_ws = ws0[bfm] + f_qe_all[bfm]
                    cur_len = (we0[bfm] - post_ws).astype(np.int32)
                    adj_pos = chunk.seq_start[bh] + post_ws + b_qs - 1
                    adjacent = np.where(
                        b_qs > 0, chunk.buf[np.clip(adj_pos, 0, None)], 0
                    )
                    events.append(
                        dict(task=t_i, reads=bh, removed=cur_len - b_qs,
                             errors=res["back_errors"][pos][bfm],
                             as_front=np.zeros(len(bh), bool),
                             adjacent=adjacent,
                             sub=np.zeros(len(bh), np.int32),
                             suffix=";2",
                             primary=(~ffm)[bfm],
                             qs=b_qs,
                             qe=res["back_qe"][pos][bfm],
                             ws=post_ws, we=we0[bfm])
                    )
                if stage.action == "retain":
                    # retained interval on the original read:
                    # [front.rstart, front.rstop + back.rstop)
                    # (reference adapters.py:1027-1037)
                    win_start[hit] = np.where(
                        ffm, ws0 + res["front_qs"][pos], ws0
                    )
                    win_stop[hit] = np.where(
                        bfm, ws0 + f_qe_all + res["back_qe"][pos], we0
                    )
                else:  # trim (or None, restored later)
                    win_start[hit] = np.where(ffm, ws0 + f_qe_all, ws0)
                    win_stop[hit] = np.where(
                        bfm,
                        win_start[hit] + res["back_qs"][pos],
                        we0,
                    )
                continue
            qs = best_qstart[hit]
            qe = best_qstop[hit]
            er = best_errors[hit]
            cur_len = (win_stop[hit] - win_start[hit]).astype(np.int32)
            if task.trim == "before":
                as_front = np.ones(len(hit), bool)
            elif task.trim == "after":
                as_front = np.zeros(len(hit), bool)
            else:  # 'auto' (anywhere): 5' iff match begins at read start
                as_front = qs == 0
            # removed lengths + adjacent base (3' side only)
            removed = np.where(as_front, qe, cur_len - qs)
            adj_pos = chunk.seq_start[hit] + win_start[hit] + qs - 1
            adjacent = np.where(
                ~as_front & (qs > 0),
                chunk.buf[np.clip(adj_pos, 0, None)],
                0,
            )
            events.append(
                dict(task=t_i, reads=hit, removed=removed, errors=er,
                     as_front=as_front, adjacent=adjacent,
                     sub=best_sub[hit],
                     # match geometry for side-channel writers: the
                     # window the match was found in, its window-
                     # relative [qs, qe) read coordinates, and the
                     # adapter-side [astart, astop) alignment span
                     qs=qs, qe=qe,
                     astart=best_astart[hit], astop=best_astop[hit],
                     ws=win_start[hit].copy(), we=win_stop[hit].copy())
            )
            # apply the action's window update
            if stage.action == "retain":
                # keep the matched adapter: RemoveBefore -> [rstart, n),
                # RemoveAfter -> [0, rstop) (reference adapters.py:
                # 409-435)
                fr = hit[as_front]
                win_start[fr] = win_start[fr] + qs[as_front]
                bk = hit[~as_front]
                win_stop[bk] = win_start[bk] + qe[~as_front]
            elif stage.action == "crop":
                ns = win_start[hit] + qs
                ne = win_start[hit] + qe
                win_start[hit] = ns
                win_stop[hit] = ne
            else:  # trim (or None, restored later)
                fr = hit[as_front]
                win_start[fr] = win_start[fr] + qe[as_front]
                bk = hit[~as_front]
                win_stop[bk] = win_start[bk] + qs[~as_front]
        return matched, events

    # --- public API --------------------------------------------------------

    def submit(self, parsed) -> PendingBatch:
        B = parsed.n_records
        win_start = np.zeros(B, np.int32)
        win_stop = parsed.seq_len.astype(np.int32).copy()
        stats = dict(n=B, total_bp=int(parsed.seq_len.sum()))
        pos = self._adapter_pos if self._adapter_pos is not None else len(
            self.stages
        )
        for si, stage in enumerate(self.stages[:pos]):
            win_start, win_stop = self._apply_host_stage(
                si, stage, parsed, win_start, win_stop, stats
            )
        dp_futures = None
        width = 0
        if self._adapter_pos is not None and B > 0:
            stage = self.stages[self._adapter_pos]
            width = self._bucket_length(int((win_stop - win_start).max()))
            subset = np.arange(B)
            if isinstance(stage, RevcompStage):
                # a reverse-complemented copy of the chunk shares all
                # offsets, so the same tasks match the rc reads
                rc_buf = parsed.buf.copy()
                if stage.has_quals:
                    native.reverse_complement_records(
                        rc_buf, parsed.seq_start, parsed.seq_len,
                        parsed.qual_start, _complement_table(),
                    )
                else:
                    _revcomp_sequences_only(rc_buf, parsed)
                from .io.chunks import ParsedChunk

                rc_chunk = ParsedChunk(
                    rc_buf, parsed.head_start, parsed.head_end,
                    parsed.seq_start, parsed.seq_len, parsed.qual_start,
                    has_cr=parsed.has_cr,
                )
                full = parsed.seq_len.astype(np.int32)
                rc_ws = full - win_stop
                rc_we = full - win_start
                fwd_disp = self._dispatch_stage(
                    stage, parsed, subset, win_start, win_stop, width
                )
                rc_disp = self._dispatch_stage(
                    stage, rc_chunk, subset, rc_ws, rc_we, width
                )
                dp_futures = (rc_chunk, rc_ws, rc_we, fwd_disp, rc_disp)
            else:
                dp_futures = self._dispatch_stage(
                    stage, parsed, subset, win_start, win_stop, width
                )
        post = (
            self.stages[pos + 1 :] if self._adapter_pos is not None else []
        )
        return PendingBatch(
            parsed, win_start, win_stop, stats,
            self.stages[self._adapter_pos]
            if self._adapter_pos is not None else None,
            post, dp_futures, width,
        )

    def _run_rounds(self, stage, chunk, win_start, win_stop, width,
                    dispatched, last_gid, score_acc):
        """Run all `times` matching rounds; mutates windows/last_gid/
        score_acc in place; returns (matched_any mask, events)."""
        B = chunk.n_records
        events_all = []
        subset = np.arange(B)
        matched, events = self._adapter_round(
            stage, chunk, subset, win_start, win_stop, width,
            dispatched=dispatched, last_gid=last_gid, score_acc=score_acc,
        )
        events_all.extend(events)
        matched_any = self._scatter_mask(subset, matched, B)
        active = subset[matched]
        for _ in range(1, stage.times):
            if len(active) == 0:
                break
            matched, events = self._adapter_round(
                stage, chunk, active, win_start, win_stop, width,
                last_gid=last_gid, score_acc=score_acc,
            )
            events_all.extend(events)
            active = active[matched]
        return matched_any, events_all

    def _run_revcomp(self, stage, pending, win_start, win_stop, last_gid,
                     stats):
        """--revcomp: match the forward read and its reverse complement
        with full rounds each, keep whichever direction scored higher
        (strictly, like ReverseComplementer — modifiers.py:237-279).
        Events carry ev['rc']; stats gain is_rc/rc_chunk for assembly."""
        chunk = pending.parsed
        B = chunk.n_records
        rc_chunk, rc_ws, rc_we, fwd_disp, rc_disp = pending.dp_futures
        ws_f, we_f = win_start.copy(), win_stop.copy()
        # mask/lowercase/--no-trim keep the chosen orientation's input
        # extent; for the transforms the trimmed windows become the
        # transform remainder
        keep_windows = stage.action in (None, "mask", "lowercase")
        if keep_windows:
            rc_ws0, rc_we0 = rc_ws.copy(), rc_we.copy()
        score_f = np.zeros(B, np.int32)
        gid_f = np.full(B, -1, np.int32)
        matched_f, events_f = self._run_rounds(
            stage, chunk, ws_f, we_f, pending.width, fwd_disp,
            gid_f, score_f,
        )
        score_r = np.zeros(B, np.int32)
        gid_r = np.full(B, -1, np.int32)
        matched_r, events_r = self._run_rounds(
            stage, rc_chunk, rc_ws, rc_we, pending.width, rc_disp,
            gid_r, score_r,
        )
        use_rc = score_r > score_f
        matched_any = np.where(use_rc, matched_r, matched_f)
        if keep_windows:
            if stage.action is not None:
                stats["remainder"] = (
                    np.where(use_rc, rc_ws, ws_f),
                    np.where(use_rc, rc_we, we_f),
                )
                stats["transform_action"] = stage.action
            # win_start/win_stop are the unmutated forward extents
            pending.win_start[:] = np.where(use_rc, rc_ws0, win_start)
            pending.win_stop[:] = np.where(use_rc, rc_we0, win_stop)
        else:
            pending.win_start[:] = np.where(use_rc, rc_ws, ws_f)
            pending.win_stop[:] = np.where(use_rc, rc_we, we_f)
        last_gid[:] = np.where(use_rc, gid_r, gid_f)
        events = []
        for evs, mask, rc in ((events_f, ~use_rc, False),
                              (events_r, use_rc, True)):
            for ev in evs:
                sel = mask[ev["reads"]]
                if not sel.any():
                    continue
                # keep every per-hit field (geometry, adapter-side
                # spans, linked-phase suffixes) — they are valid in
                # the chosen orientation's chunk, which is what the
                # side-channel writers and {match_sequence} slice
                out = {"task": ev["task"], "rc": rc}
                for k, v in ev.items():
                    if k != "task":
                        out[k] = v[sel] if isinstance(v, np.ndarray) else v
                events.append(out)
        stats["is_rc"] = use_rc
        stats["rc_chunk"] = rc_chunk
        stats["revcomped"] = int((use_rc & matched_any).sum())
        return matched_any, events

    def collect(self, pending: PendingBatch):
        chunk = pending.parsed
        B = chunk.n_records
        win_start, win_stop = pending.win_start, pending.win_stop
        stats = pending.stats
        matched_any = np.zeros(B, bool)
        last_gid = np.full(B, -1, np.int32)
        if pending.adapter_stage is not None and B > 0:
            stage = pending.adapter_stage
            if isinstance(stage, RevcompStage):
                matched_any, events_all = self._run_revcomp(
                    stage, pending, win_start, win_stop, last_gid, stats
                )
                win_start, win_stop = pending.win_start, pending.win_stop
            else:
                keep_windows = stage.action in (None, "mask", "lowercase")
                if keep_windows:
                    # match-only / byte-rewriting modes: rounds still
                    # trim their working windows (later rounds search
                    # the remainder), but the output keeps the input
                    # extent; for mask/lowercase the final windows
                    # become the remainder interval the transform
                    # assembler uses
                    saved = (win_start.copy(), win_stop.copy())
                matched_any, events_all = self._run_rounds(
                    stage, chunk, win_start, win_stop, pending.width,
                    pending.dp_futures, last_gid, None,
                )
                if keep_windows:
                    if stage.action in ("mask", "lowercase"):
                        stats["remainder"] = (
                            win_start.copy(), win_stop.copy()
                        )
                        stats["transform_action"] = stage.action
                    win_start, win_stop = saved
                    pending.win_start, pending.win_stop = saved
            stats["adapter_events"] = events_all
            stats["with_adapters"] = int(matched_any.sum())
        stats["matched_mask"] = matched_any
        stats["last_adapter_gid"] = last_gid
        base_si = (self._adapter_pos + 1) if self._adapter_pos is not None else 0
        for j, stage in enumerate(pending.post_stages):
            win_start, win_stop = self._apply_host_stage(
                base_si + j, stage, chunk, win_start, win_stop, stats
            )
        # filters (first matching filter claims the read, like the
        # host step order)
        if self.pre_filter_edit is not None:
            chunk = self.pre_filter_edit(chunk, stats, win_start, win_stop)
            stats["edited_chunk"] = chunk
        keep = np.ones(B, bool)
        filter_counts = []
        filter_dropped = []
        lengths = win_stop - win_start
        capped = {}
        # content-reading predicates must see the chosen orientation's
        # bytes under --revcomp: evaluate on both chunks, select per
        # read (the rc copy shares all offsets, so the same windows
        # apply)
        content_kinds = (
            "too_many_n", "too_many_expected_errors",
            "too_high_average_error_rate",
        )
        is_rc = stats.get("is_rc")
        rc_chunk = stats.get("rc_chunk")

        def cond(f, src):
            fchunk = src
            if self.qual_cap_base is not None and f.kind in (
                "too_many_expected_errors", "too_high_average_error_rate"
            ):
                if id(src) not in capped:
                    from .io.chunks import zero_cap_chunk

                    capped[id(src)] = zero_cap_chunk(
                        src, self.qual_cap_base
                    )
                fchunk = capped[id(src)]
            return filter_condition(
                f.kind, f.threshold, fchunk, win_start, win_stop,
                lengths, matched_any,
                mask_remainder=(
                    stats["remainder"]
                    if stats.get("transform_action") == "mask"
                    else None
                ),
            )

        for f in self.filters:
            drop = cond(f, chunk)
            if is_rc is not None and f.kind in content_kinds:
                drop = np.where(is_rc, cond(f, rc_chunk), drop)
            newly = drop & keep
            filter_counts.append(int(newly.sum()))
            filter_dropped.append(newly)
            keep &= ~drop
        stats["filter_counts"] = filter_counts
        stats["filter_dropped_masks"] = filter_dropped
        stats["written"] = int(keep.sum())
        kept_lengths = lengths[keep]
        stats["written_lengths"] = np.bincount(kept_lengths)
        # raw values for device-reduced statistics (parallel/stats.py)
        stats["written_len_values"] = kept_lengths
        stats["written_bp"] = int(kept_lengths.sum())
        return win_start, win_stop, keep, stats

    @staticmethod
    def _scatter_mask(subset, mask, n):
        out = np.zeros(n, bool)
        out[subset[mask]] = True
        return out

    def process_parsed(self, parsed):
        return self.collect(self.submit(parsed))


def process_chunks_pipelined(engine: BatchPipelineEngine, chunks):
    """Yield (trimmed_bytes, stats) per chunk in order, overlapping
    device work with neighboring chunks' host work."""
    from .io.chunks import assemble_window, parse_fastq_chunk

    pending = None
    for data in chunks:
        nxt = engine.submit(parse_fastq_chunk(data))
        if pending is not None:
            ws, we, keep, stats = engine.collect(pending)
            yield assemble_window(pending.parsed, ws, we, keep), stats
        pending = nxt
    if pending is not None:
        ws, we, keep, stats = engine.collect(pending)
        yield assemble_window(pending.parsed, ws, we, keep), stats
