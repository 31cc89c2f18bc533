"""
Parity of the Pallas aligner kernel against the XLA kernel (and thus,
transitively, the scalar oracle) — run in interpreter mode on CPU.
On-TPU parity of compiled output is asserted by bench.py on every run.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from cutadapt_tpu.adapters import Where
from cutadapt_tpu.batch_pipeline import _make_locate_step, _unpack_result
from cutadapt_tpu.ops.align_batch import (
    AlignerSpec,
    make_batch_locate,
    query_class_info,
)
from cutadapt_tpu.ops.align_pallas import make_pallas_locate

CASES = [
    ("AGATCGGAAGAGC", False, Where.BACK.value, 0.1),
    ("ANGNTCGGANG", True, Where.BACK.value, 0.2),
    ("CTGATCGGACT", False, Where.FRONT.value, 0.2),
    ("ACGTACGTAA", False, Where.ANYWHERE.value, 0.2),
    ("AGATCGGAAGAGC", False, Where.BACK.value, 0.0),
]


@pytest.mark.parametrize("ref,wc,flags,rate", CASES)
def test_pallas_matches_xla(ref, wc, flags, rate):
    spec = AlignerSpec(
        reference=ref, max_error_rate=rate, flags=flags,
        wildcard_ref=wc, indel_cost=1, min_overlap=3,
    )
    cls_lut, _ = query_class_info(spec)
    rng = np.random.RandomState(hash((ref, flags)) % 2**31)
    B, L = 128, 48
    raw = rng.choice(np.frombuffer(b"ACGTNacgtX", np.uint8), size=(B, L))
    lens = rng.randint(0, L + 1, B).astype(np.int32)
    for i in range(B):
        raw[i, lens[i]:] = 0
    cls = cls_lut[raw]
    packed = (cls[:, 0::2] | (cls[:, 1::2] << 4)).astype(np.uint8)

    ref_out = make_batch_locate(spec, packed=True)(packed, lens)
    pal = make_pallas_locate(spec, block_b=128, interpret=True)
    f, qs, qe, er, sc = _unpack_result(np.asarray(pal(packed, lens)))

    rf = np.asarray(ref_out["found"])
    assert (f == rf).all()
    for got, key in [(qs, "query_start"), (qe, "query_stop"),
                     (er, "errors"), (sc, "score")]:
        assert (got[rf] == np.asarray(ref_out[key])[rf]).all(), key


@pytest.mark.parametrize("ref,wc,flags,rate", CASES)
def test_pallas_pack2_matches_xla(ref, wc, flags, rate):
    """2-bit lane: four class ids per byte, ACGT-clean reads only
    (dirty reads are routed to the 4-bit or host-scalar lane by the
    dispatcher)."""
    spec = AlignerSpec(
        reference=ref, max_error_rate=rate, flags=flags,
        wildcard_ref=wc, indel_cost=1, min_overlap=3,
    )
    cls_lut, _ = query_class_info(spec)
    rng = np.random.RandomState(hash((ref, flags, 2)) % 2**31)
    B, L = 128, 64
    raw = rng.choice(np.frombuffer(b"ACGTacgt", np.uint8), size=(B, L))
    lens = rng.randint(0, L + 1, B).astype(np.int32)
    for i in range(B):
        raw[i, lens[i]:] = 0
    cls = cls_lut[raw]
    cls[np.arange(L)[None, :] >= lens[:, None]] = 0
    assert (cls < 4).all()
    packed4 = (cls[:, 0::2] | (cls[:, 1::2] << 4)).astype(np.uint8)
    packed2 = (
        cls[:, 0::4] | (cls[:, 1::4] << 2)
        | (cls[:, 2::4] << 4) | (cls[:, 3::4] << 6)
    ).astype(np.uint8)

    ref_out = make_batch_locate(spec, packed=True)(packed4, lens)
    pal = make_pallas_locate(spec, block_b=128, interpret=True, pack2=True)
    f, qs, qe, er, sc = _unpack_result(np.asarray(pal(packed2, lens)))

    rf = np.asarray(ref_out["found"])
    assert (f == rf).all()
    for got, key in [(qs, "query_start"), (qe, "query_stop"),
                     (er, "errors"), (sc, "score")]:
        assert (got[rf] == np.asarray(ref_out[key])[rf]).all(), key


@pytest.mark.parametrize("pack2", [False, True])
def test_pallas_shard_map_vma_typed(pack2):
    """The production mesh dispatch wraps the (Mosaic, non-interpret)
    Pallas kernel in shard_map WITHOUT check_vma=False: the kernel's
    loop carries and its declared out_shape vma must satisfy the
    varying-axes type check. eval_shape runs exactly that trace."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    spec = AlignerSpec(
        reference="AGATCGGAAGAGC", max_error_rate=0.15,
        flags=Where.BACK.value, min_overlap=3,
    )
    kernel = make_pallas_locate(
        spec, block_b=128, interpret=False, pack2=pack2,
        vma_axis="reads",
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("reads",))
    f = jax.jit(
        jax.shard_map(
            kernel, mesh=mesh,
            in_specs=(P("reads", None), P("reads")),
            out_specs=P(None, "reads"),
        )
    )
    out = jax.eval_shape(
        f,
        jax.ShapeDtypeStruct((1024, 16), jnp.uint8),
        jax.ShapeDtypeStruct((1024,), jnp.int32),
    )
    assert out.shape == (2, 1024) and out.dtype == jnp.int32
