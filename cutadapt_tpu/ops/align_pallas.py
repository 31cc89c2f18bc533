"""
Pallas TPU kernel for the batched semi-global aligner.

Same semantics as :func:`cutadapt_tpu.ops.align_batch.make_batch_locate`
(packed mode), but the whole DP state — the (m+1, Bt) cost/score/origin
column plus band/best trackers — lives in VMEM for the entire scan.
The XLA `lax.scan` formulation streams its carry (~MBs) through HBM on
every one of the L columns; here HBM traffic is exactly "queries in,
packed results out", and each grid program owns a lane tile of reads.

Layout: grid over batch tiles of ``block_b`` lanes. Per program:
queries arrive as a (Wp, Bt) uint8 block (two 4-bit query classes per
byte, already transposed so columns are rows); the column loop is a
``fori_loop`` over packed rows, unpacking two DP columns per
iteration. Matching is `(row_masks >> class) & 1` against per-row
constants (shipped as a small replicated table input — Pallas kernels
cannot capture array constants); the intra-column deletion cascade is
the same associative (min,+) Hillis-Steele ladder as the XLA kernel,
with `pltpu.roll` supplying the static sublane shifts.

Mosaic constraints shaping the code: per-lane state is kept 2-D
(1, Bt) int32 (1-D/bool loop carries fail to legalize), and uint8
row reads go through an aligned 8-row block + one-hot select (int8
VMEM tiles require sublane-aligned vector loads).

Outputs are packed into one (2, B) int32 array:
row0 = query_start | query_stop << 14 | found << 28,
row1 = errors | (score + 32768) << 16
(the layout batch_pipeline._unpack_result expects).

Reference semantics: /root/reference/src/cutadapt/_align.pyx:298-587.
"""

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .align_batch import (
    AlignerSpec,
    BIG_NEG,
    DELETION_SCORE,
    INF_COST,
    INSERTION_SCORE,
    MATCH_SCORE,
    MISMATCH_SCORE,
    effective_length,
    min_length_table,
    n_counts,
    query_class_info,
)

_QSTOP_SHIFT = 14
_FOUND_SHIFT = 28
_SCORE_BIAS = 32768


def _key_min(a, b):
    """Lexicographic min over (cost, cls, pos) with payloads."""
    ac, acls, apos, ascore, aorig = a
    bc, bcls, bpos, bscore, borig = b
    a_wins = (ac < bc) | (
        (ac == bc) & ((acls < bcls) | ((acls == bcls) & (apos <= bpos)))
    )
    pick = lambda x, y: jnp.where(a_wins, x, y)
    return (pick(ac, bc), pick(acls, bcls), pick(apos, bpos),
            pick(ascore, bscore), pick(aorig, borig))


@lru_cache(maxsize=64)
def make_pallas_locate(
    spec: AlignerSpec,
    block_b: int = 1024,
    interpret: bool = False,
    pack2: bool = False,
    vma_axis: str = None,
):
    """Build locate(packed_queries (B, Wp) uint8, lengths (B,) int32)
    -> (2, B) int32 packed results. B must be a multiple of block_b,
    Wp a multiple of 8.

    With ``pack2=True`` each wire byte carries four 2-bit query class
    ids (lowest pair = earliest position) instead of two 4-bit ids;
    callers must route any read containing a class id > 3 (N/IUPAC
    bytes) to the 4-bit kernel instead (native.windows_clean).

    ``vma_axis`` names the mesh axis the batch dimension varies over
    when the kernel runs under shard_map (so shard_map's varying-axes
    type check stays enabled); None outside shard_map."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = len(spec.reference)
    if m == 0:
        raise ValueError("pallas aligner requires a non-empty reference")
    info = query_class_info(spec)
    if info is None:
        raise ValueError("pallas aligner needs <= 16 query classes")
    _, row_masks_np = info

    k = int(spec.max_error_rate * m)
    minlen_np = min_length_table(spec)
    ncnt_np = n_counts(spec)
    eff_len = effective_length(spec)

    start_in_reference = spec.start_in_reference
    start_in_query = spec.start_in_query
    stop_in_query = spec.stop_in_query
    stop_in_reference = spec.stop_in_reference
    ins_cost = del_cost = int(spec.indel_cost)
    min_overlap = int(spec.min_overlap)

    origin_increment = 1 if start_in_query else 0
    ins_cost_inc = 0 if start_in_query else ins_cost
    ins_score_inc = 0 if start_in_query else INSERTION_SCORE
    init_last = m if start_in_reference else min(m, k + 1)
    first_i = 0 if stop_in_reference else m

    R = m + 1  # DP rows
    n_minlen = len(minlen_np)
    cost_cap = n_minlen - 1

    # per-row constant tables, stacked into one replicated VMEM input:
    # rows [0, m) row_masks; [m, m+R) n-counts; [m+R, +n_minlen) minlen
    tab_np = np.concatenate(
        [row_masks_np.astype(np.int32), ncnt_np.astype(np.int32),
         minlen_np.astype(np.int32)]
    )
    T = len(tab_np)
    tab_in = np.repeat(tab_np[:, None], 128, axis=1)  # (T, 128)

    def kernel(q_ref, len_ref, tab_ref, out_ref):
        Bt = q_ref.shape[1]
        Wp = q_ref.shape[0]
        n = len_ref[0:1, :].astype(jnp.int32)  # (1, Bt)

        if vma_axis is not None:
            # under shard_map's varying-axes type check the kernel body
            # is traced as JAX ops: loop carries must be uniformly
            # varying over the mesh axis, and constant-derived inits
            # (iotas, zeros) are not — pvary marks them. The mesh-
            # varying type then checks end to end on the Mosaic path;
            # interpret mode additionally needs check_vma=False at the
            # shard_map because its HLO lowering drops vma inside scan
            # carries (JAX asks for exactly that workaround in its
            # error message; jax-ml/jax hlo_interpreter
            # resolve_physical_types).
            _pv = lambda t: jax.tree.map(
                lambda x: jax.lax.pvary(x, (vma_axis,)), t
            )
        else:
            _pv = lambda t: t

        rm = tab_ref[0:m, 0:1]  # (m, 1) row match masks
        ncnt_t = tab_ref[m : m + R, 0:1]  # (R, 1)
        minlen_t = tab_ref[m + R : m + R + n_minlen, 0:1]  # (n_minlen, 1)

        i_col = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)  # 0..m
        pos = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) + 1  # 1..m
        io_minlen = jax.lax.broadcasted_iota(jnp.int32, (n_minlen, 1), 0)
        io8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

        def minlen_lookup(cost):
            """cost (1, Bt) -> minlen[min(cost, cap)] (1, Bt)."""
            cc = jnp.minimum(cost, cost_cap)
            return jnp.sum(
                jnp.where(io_minlen == cc, minlen_t, 0), axis=0,
                keepdims=True,
            )

        def ncnt_lookup(idx):
            return jnp.sum(
                jnp.where(i_col == idx, ncnt_t, 0), axis=0, keepdims=True
            )

        def row_select(mat, idx):
            """mat (R, Bt), idx (1, Bt) -> (1, Bt)."""
            return jnp.sum(
                jnp.where(i_col == idx, mat, 0), axis=0, keepdims=True
            )

        def prefix_combine(kk, cc):
            elems = (kk, cc)
            d = 1
            fills = (INF_COST, 3, 0, 0, 0)
            # Band-limited ladder: every in-column link costs at least
            # del_cost (or INF at match rows), so any chain longer
            # than k+1 links is already over the error budget and can
            # never be part of an accepted alignment — and a truncated
            # running sum still counts >= k+2 links' worth of cost for
            # deeper rows, so no dead path can masquerade as live.
            # ceil(log2(k+2)) passes instead of ceil(log2(m)): ~3x
            # less ladder work for the flagship m=33, k=3.
            limit = min(m, k + 2) if del_cost >= 1 else m
            while d < limit:
                top = pos <= d  # rows that fall off the shift
                shifted_k = tuple(
                    jnp.where(top, f, pltpu.roll(a, d, 0))
                    for a, f in zip(elems[0], fills)
                )
                shifted_c = tuple(
                    jnp.where(top, 0, pltpu.roll(a, d, 0))
                    for a in elems[1]
                )
                k1, c1 = shifted_k, shifted_c
                k2, c2 = elems
                c2_cost, c2_score = c2
                k1c, k1cls, k1pos, k1s, k1o = k1
                prop = (
                    jnp.minimum(k1c + c2_cost, INF_COST),
                    k1cls, k1pos, k1s + c2_score, k1o,
                )
                kk2 = _key_min(k2, prop)
                cc2 = (
                    jnp.minimum(c1[0] + c2_cost, INF_COST),
                    c1[1] + c2_score,
                )
                elems = (kk2, cc2)
                d *= 2
            return elems

        if start_in_query:
            max_n = n
        else:
            max_n = jnp.minimum(n, m + k)
        if stop_in_query:
            min_n = jnp.zeros_like(n)
        else:
            min_n = jnp.maximum(0, n - m - k)

        mn = min_n  # (1, Bt)
        if not start_in_reference and not start_in_query:
            score0 = i_col * DELETION_SCORE + jnp.zeros_like(mn)
            cost0 = jnp.maximum(i_col, mn) * del_cost
            origin0 = jnp.zeros_like(i_col + mn)
        elif start_in_reference and not start_in_query:
            score0 = jnp.zeros_like(i_col + mn)
            cost0 = mn * del_cost + jnp.zeros_like(i_col)
            origin0 = jnp.minimum(0, mn - i_col)
        elif not start_in_reference and start_in_query:
            score0 = i_col * DELETION_SCORE + jnp.zeros_like(mn)
            cost0 = i_col * del_cost + jnp.zeros_like(mn)
            origin0 = jnp.maximum(0, mn - i_col)
        else:
            score0 = jnp.zeros_like(i_col + mn)
            cost0 = jnp.minimum(i_col, mn) * del_cost
            origin0 = mn - i_col
        broad = lambda x: jnp.broadcast_to(x, (R, Bt)).astype(jnp.int32)
        lane0 = jnp.zeros((1, Bt), jnp.int32)

        state0 = _pv((
            broad(cost0), broad(score0), broad(origin0),
            lane0 + init_last,          # last
            lane0,                      # last_filled
            lane0,                      # stale_origin
            lane0,                      # best_found (0/1)
            lane0 + INF_COST,           # best_cost
            lane0,                      # best_score
            lane0,                      # best_origin
            lane0 + m,                  # best_ref_stop
            # NOT n: every update writes this before it is read
            # (contents undefined unless found), and n's aval carries
            # the mesh-varying tag from the length ref, which ops do
            # not re-propagate inside the kernel trace — an n init
            # would make the loop carry's type unsatisfiable under
            # shard_map's check_vma
            lane0,                      # best_query_stop
            lane0,                      # done (0/1)
        ))

        def one_column(j, qc, state):
            """j: scalar 1-based column index; qc: (1, Bt) class ids."""
            (cost, score, origin, last, last_filled, stale,
             best_found, best_cost, best_score, best_origin,
             best_ref_stop, best_query_stop, done) = state
            active = (j > min_n) & (j <= max_n)  # (1, Bt) bool
            eq = ((rm >> qc) & 1) != 0  # (m, Bt)

            v0c = cost[0:1] + ins_cost_inc  # (1, Bt)
            v0s = score[0:1] + ins_score_inc
            v0o = origin[0:1] + origin_increment

            diag_c, diag_s, diag_o = cost[:-1], score[:-1], origin[:-1]
            prev_c, prev_s, prev_o = cost[1:], score[1:], origin[1:]

            dc = jnp.where(eq, diag_c, diag_c + 1)
            ds = jnp.where(eq, diag_s + MATCH_SCORE, diag_s + MISMATCH_SCORE)
            ic = prev_c + ins_cost
            is_ = prev_s + INSERTION_SCORE
            posb = jnp.broadcast_to(pos, eq.shape).astype(jnp.int32)
            zero = jnp.zeros_like(posb)
            diag_leaf = (dc, zero, -posb, ds, diag_o)
            ins_leaf = (ic, zero + 1, posb, is_, prev_o)
            k_leaf = _key_min(diag_leaf, ins_leaf)
            k_leaf = tuple(
                jnp.where(eq, d, o) for d, o in zip(diag_leaf, k_leaf)
            )
            c_cost = jnp.where(eq, INF_COST, del_cost).astype(jnp.int32)
            c_score = jnp.full_like(c_cost, DELETION_SCORE)

            kk, cc = prefix_combine(k_leaf, (c_cost, c_score))
            seed_cost = jnp.minimum(v0c + cc[0], INF_COST)
            seed = (
                seed_cost,
                jnp.ones_like(seed_cost),
                jnp.full_like(seed_cost, BIG_NEG),
                v0s + cc[1],
                jnp.broadcast_to(v0o, seed_cost.shape),
            )
            final = _key_min(kk, seed)
            new_cost = jnp.concatenate([v0c, final[0]], axis=0)
            new_score = jnp.concatenate([v0s, final[3]], axis=0)
            new_origin = jnp.concatenate([v0o, final[4]], axis=0)

            new_cost = jnp.where(active, new_cost, cost)
            new_score = jnp.where(active, new_score, score)
            new_origin = jnp.where(active, new_origin, origin)

            # band update (Ukkonen)
            fill_end = last  # (1, Bt)
            within = (i_col <= fill_end) & (new_cost <= k)
            shrunk = jnp.max(
                jnp.where(within, i_col, -1), axis=0, keepdims=True
            )
            new_last = jnp.where(shrunk < m, shrunk + 1, m)
            new_last = jnp.where(active, new_last, last)
            new_last_filled = jnp.where(active, fill_end, last_filled)
            edge_origin = row_select(new_origin, fill_end)
            new_stale = jnp.where(active & (fill_end >= 1), edge_origin, stale)

            if stop_in_query:
                cand_mask = active & (shrunk == m) & (done == 0)
                cand_cost = new_cost[m : m + 1]
                cand_score = new_score[m : m + 1]
                cand_origin = new_origin[m : m + 1]
                length = m + jnp.minimum(cand_origin, 0)
                if spec.wildcard_ref:
                    tail_n = int(ncnt_np[m]) - ncnt_lookup(
                        jnp.clip(m - length, 0, m)
                    )
                    cur_eff = jnp.where(length < m, length - tail_n, eff_len)
                else:
                    cur_eff = length
                need_len = minlen_lookup(cand_cost)
                acceptable = (length >= min_overlap) & (cur_eff >= need_len)
                best_length = m + jnp.minimum(best_origin, 0)
                update = (
                    cand_mask
                    & acceptable
                    & (
                        (best_found == 0)
                        | (
                            (cand_origin <= best_origin + m // 2)
                            & (cand_score > best_score)
                        )
                        | (
                            (length > best_length)
                            & (cand_score > best_score)
                        )
                    )
                )
                best_found = jnp.where(update, 1, best_found)
                best_cost = jnp.where(update, cand_cost, best_cost)
                best_score = jnp.where(update, cand_score, best_score)
                best_origin = jnp.where(update, cand_origin, best_origin)
                best_ref_stop = jnp.where(update, m, best_ref_stop)
                best_query_stop = jnp.where(update, j, best_query_stop)
                done = jnp.where(
                    update & (cand_cost == 0) & (cand_origin >= 0), 1, done
                )

            return _pv((
                new_cost, new_score, new_origin, new_last, new_last_filled,
                new_stale, best_found, best_cost, best_score, best_origin,
                best_ref_stop, best_query_stop, done,
            ))

        # int8 VMEM tiles want sublane-aligned loads: fetch the aligned
        # 8-row block around row r, then one-hot-select row r (keeps
        # the loop body small — two or four DP columns per iteration)
        def packed_row_step(r, state):
            base = pl.multiple_of((r // 8) * 8, 8)
            block = q_ref[pl.ds(base, 8), :].astype(jnp.int32)  # (8, Bt)
            byte = jnp.sum(
                jnp.where(io8 == (r % 8), block, 0), axis=0, keepdims=True
            )  # (1, Bt)
            if pack2:
                state = one_column(4 * r + 1, byte & 3, state)
                state = one_column(4 * r + 2, (byte >> 2) & 3, state)
                state = one_column(4 * r + 3, (byte >> 4) & 3, state)
                state = one_column(4 * r + 4, byte >> 6, state)
            else:
                state = one_column(2 * r + 1, byte & 0xF, state)
                state = one_column(2 * r + 2, byte >> 4, state)
            return state

        state = jax.lax.fori_loop(0, Wp, packed_row_step, state0)

        (cost, score, origin, last, last_filled, stale,
         best_found, best_cost, best_score, best_origin,
         best_ref_stop, best_query_stop, done) = state

        # final-column scan (bottom-up, rows m..first_i)
        scan_applies = max_n == n  # (1, Bt)

        def final_row_step(t, best):
            (b_found, b_cost, b_score, b_origin, b_ref_stop,
             b_query_stop) = best
            i = m - t  # scalar row index
            row = i_col == i  # (R, 1)
            pick = lambda mat: jnp.sum(
                jnp.where(row, mat, 0), axis=0, keepdims=True
            )
            cand_cost = pick(cost)
            cand_score = pick(score)
            cand_origin = pick(origin)
            length = i + jnp.minimum(cand_origin, 0)
            if spec.wildcard_ref:
                ref_start = -jnp.minimum(cand_origin, 0)
                ncnt_i = ncnt_lookup(jnp.full_like(cand_cost, i))
                span_n = ncnt_i - ncnt_lookup(jnp.clip(ref_start, 0, m))
                cur_eff = jnp.where(length < m, length - span_n, eff_len)
            else:
                cur_eff = length
            need_len = minlen_lookup(cand_cost)
            acceptable = (length >= min_overlap) & (cur_eff >= need_len)
            mask = scan_applies & (i <= last_filled) & acceptable
            best_length = b_ref_stop + jnp.minimum(b_origin, 0)
            update = mask & (
                (b_found == 0)
                | ((stale <= b_origin + m // 2) & (cand_score > b_score))
                | ((length > best_length) & (cand_score > b_score))
            )
            return _pv((
                jnp.where(update, 1, b_found),
                jnp.where(update, cand_cost, b_cost),
                jnp.where(update, cand_score, b_score),
                jnp.where(update, cand_origin, b_origin),
                jnp.where(update, i, b_ref_stop),
                jnp.where(update, n, b_query_stop),
            ))

        best = _pv((best_found, best_cost, best_score, best_origin,
                    best_ref_stop, best_query_stop))
        best = jax.lax.fori_loop(0, m - first_i + 1, final_row_step, best)
        (best_found, best_cost, best_score, best_origin,
         best_ref_stop, best_query_stop) = best

        query_start = jnp.where(best_origin >= 0, best_origin, 0)
        r0 = (
            query_start
            | (best_query_stop << _QSTOP_SHIFT)
            | (best_found << _FOUND_SHIFT)
        )
        r1 = best_cost | ((best_score + _SCORE_BIAS) << 16)
        out_ref[0:1, :] = r0
        out_ref[1:2, :] = r1

    def locate(packed_queries, lengths):
        B, Wp = packed_queries.shape
        assert B % block_b == 0, (B, block_b)
        assert Wp % 8 == 0, Wp  # aligned 8-row block reads
        qt = jnp.asarray(packed_queries).T  # (Wp, B)
        lens2 = jnp.asarray(lengths, jnp.int32)[None, :]  # (1, B)
        grid = (B // block_b,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (2, B), jnp.int32,
                vma=frozenset((vma_axis,)) if vma_axis else frozenset(),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (Wp, block_b), lambda i: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, block_b), lambda i: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (2, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(qt, lens2, jnp.asarray(tab_in))

    return locate
