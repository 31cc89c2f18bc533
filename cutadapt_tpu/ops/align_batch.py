"""
Batched semi-global alignment kernel (JAX, TPU-first).

Computes, for a whole batch of padded/encoded reads at once, exactly
what the scalar host oracle (:class:`cutadapt_tpu.align.Aligner`)
computes per read — including the reference engine's subtle selection
semantics:

- the hybrid cost/score DP with the diag > deletion > insertion
  tie-break precedence,
- Ukkonen band tracking (needed only to reproduce the "stale origin"
  the final-column scan uses for its overlap tie-break),
- the column-window restriction (min_n/max_n) for adapter types that
  must consume the query to its end,
- leftmost-preference candidate folding over last-row candidates and
  the bottom-up final-column scan.

Design notes (TPU):

- The kernel is a ``lax.scan`` over query columns. The DP column is the
  carried state, laid out (m+1, B): the batch axis B maps onto vector
  lanes (full lane utilization for B >= 128), the small adapter axis
  onto sublanes.
- Within a column, the deletion transition is a loop-carried
  dependency along the adapter axis. It is solved exactly with an
  associative (min, +) prefix combine: each cell contributes an affine
  map v -> min(K_i, v + D) on (cost, tie-class, position, score,
  origin) tuples; the tie-class/key encodes the reference's if-chain
  precedence so even deferred ties resolve exactly as the sequential
  kernel would. The prefix combine is a manual Hillis-Steele ladder
  with static shifts (log2(m) rounds of pure elementwise work — no
  dynamic slicing, no gathers).
- There are NO gather/scatter ops anywhere in the hot loop: all value
  lookups (acceptance thresholds, band-edge reads, N-count tables) are
  one-hot compare+select reductions along the small sublane axis.
- Acceptance thresholds ``cost <= effective_length * max_error_rate``
  are precomputed on the host in float64 as per-length integer bounds,
  so the device kernel never touches floating point.

Reference semantics: /root/reference/src/cutadapt/_align.pyx:298-587.
"""

from functools import lru_cache
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from .tables import ACGT_LUT, IUPAC_LUT, UPPER_LUT

MATCH_SCORE = 1
MISMATCH_SCORE = -1
INSERTION_SCORE = -2
DELETION_SCORE = -2

INF_COST = 1 << 28
BIG_NEG = -(1 << 28)


class AlignerSpec(NamedTuple):
    """Static description of one aligner (hashable; used as jit key)."""

    reference: str
    max_error_rate: float
    flags: int = 15
    wildcard_ref: bool = False
    wildcard_query: bool = False
    indel_cost: int = 1
    min_overlap: int = 1

    @property
    def start_in_reference(self) -> bool:
        return bool(self.flags & 1)

    @property
    def start_in_query(self) -> bool:
        return bool(self.flags & 2)

    @property
    def stop_in_reference(self) -> bool:
        return bool(self.flags & 4)

    @property
    def stop_in_query(self) -> bool:
        return bool(self.flags & 8)


def encode_reference(spec: AlignerSpec) -> np.ndarray:
    raw = np.frombuffer(spec.reference.encode("ascii"), dtype=np.uint8)
    if spec.wildcard_ref:
        return IUPAC_LUT[raw]
    elif spec.wildcard_query:
        return ACGT_LUT[raw]
    else:
        return UPPER_LUT[raw]


def query_lut(spec: AlignerSpec) -> np.ndarray:
    """LUT with which raw read bytes must be encoded for this spec."""
    if spec.wildcard_query:
        return IUPAC_LUT
    elif spec.wildcard_ref:
        return ACGT_LUT
    else:
        return UPPER_LUT


def query_class_info(spec: AlignerSpec):
    """Equivalence-class encoding of query bytes for the packed kernel.

    Two query bytes are equivalent iff they match exactly the same set
    of reference positions; there are at most (distinct ref chars + 1)
    such classes for plain comparison and at most 16 for IUPAC codes.
    Returns (class_lut uint8[256], row_masks int32[m]) with
    ``row_masks[i] >> class & 1`` equal to "query byte of that class
    matches reference position i", or None if more than 16 classes are
    needed (then the packed 4-bit path cannot be used).

    Class ids are ordered so the classes of the plain bases
    'A','C','G','T' come first: any byte whose class id is < 4 can be
    carried by the 2-bit packed lane (four query positions per wire
    byte), and in practice that is every read without N/IUPAC bytes.
    """
    ref = encode_reference(spec)  # (m,)
    lut = query_lut(spec)
    compare_ascii = not (spec.wildcard_ref or spec.wildcard_query)
    q = lut[np.arange(256)]
    if compare_ascii:
        behave = ref[None, :] == q[:, None]  # (256, m)
    else:
        behave = (ref[None, :] & q[:, None]) != 0
    uniq, class_ids = np.unique(behave, axis=0, return_inverse=True)
    if len(uniq) > 16:
        return None
    # remap so the A/C/G/T byte classes occupy the low ids (2-bit lane)
    first = []
    for b in b"ACGT":
        c = int(class_ids[b])
        if c not in first:
            first.append(c)
    perm = np.concatenate(
        [first, np.delete(np.arange(len(uniq)), first)]
    ).astype(np.int64)
    remap = np.empty(len(uniq), np.int64)
    remap[perm] = np.arange(len(uniq))
    class_ids = remap[class_ids]
    uniq = uniq[perm]
    row_masks = np.zeros(len(ref), np.int32)
    for c in range(len(uniq)):
        row_masks |= uniq[c].astype(np.int32) << c
    return class_ids.astype(np.uint8), row_masks


def n_counts(spec: AlignerSpec) -> np.ndarray:
    """n_counts[i] = number of N/n in reference[:i]."""
    counts = np.zeros(len(spec.reference) + 1, dtype=np.int32)
    c = 0
    for i, ch in enumerate(spec.reference):
        counts[i] = c
        if ch in "nN":
            c += 1
    counts[len(spec.reference)] = c
    return counts


def effective_length(spec: AlignerSpec) -> int:
    m = len(spec.reference)
    if spec.wildcard_ref:
        return m - int(n_counts(spec)[m])
    return m


def acceptance_table(spec: AlignerSpec) -> np.ndarray:
    """thr[L] = max cost acceptable for effective length L (exact float64)."""
    m = len(spec.reference)
    return np.floor(
        np.arange(m + 1, dtype=np.float64) * spec.max_error_rate
    ).astype(np.int32)


def min_length_table(spec: AlignerSpec) -> np.ndarray:
    """minlen[c] = smallest effective length whose error budget admits
    cost c (INF for c > k). Exact inverse of acceptance_table — lets
    the kernel test `cost <= floor(len*e)` as `len >= minlen[cost]`
    with a (k+2)-entry lookup instead of an (m+1)-entry one."""
    thr = acceptance_table(spec)
    k = int(thr[-1])
    out = np.empty(k + 2, np.int32)
    out[: k + 1] = np.searchsorted(thr, np.arange(k + 1), side="left")
    out[k + 1] = INF_COST
    return out


def _key_min(a, b):
    """Lexicographic min over (cost, cls, pos) tuples with payloads."""
    ac, acls, apos, ascore, aorig = a
    bc, bcls, bpos, bscore, borig = b
    a_wins = (ac < bc) | (
        (ac == bc) & ((acls < bcls) | ((acls == bcls) & (apos <= bpos)))
    )
    return (
        jnp.where(a_wins, ac, bc),
        jnp.where(a_wins, acls, bcls),
        jnp.where(a_wins, apos, bpos),
        jnp.where(a_wins, ascore, bscore),
        jnp.where(a_wins, aorig, borig),
    )


def _combine(left, right):
    """Compose two affine min-plus segments (associative)."""
    k1, c1 = left
    k2, c2 = right
    c2_cost, c2_score = c2
    k1c, k1cls, k1pos, k1s, k1o = k1
    # Propagate the left segment's candidate through the right
    # segment's deletions; its tie class/key stay those of its origin
    # cell (where a deferred tie is actually resolved).
    prop = (
        jnp.minimum(k1c + c2_cost, INF_COST),
        k1cls,
        k1pos,
        k1s + c2_score,
        k1o,
    )
    k = _key_min(k2, prop)
    c1_cost, c1_score = c1
    c = (jnp.minimum(c1_cost + c2_cost, INF_COST), c1_score + c2_score)
    return (k, c)


def _shift_down(arr, d, fill):
    """Shift rows down by d along axis 0, filling the top with `fill`."""
    top = jnp.full((d,) + arr.shape[1:], fill, arr.dtype)
    return jnp.concatenate([top, arr[:-d]], axis=0)


def _prefix_combine(k, c, m):
    """Inclusive prefix combine along axis 0 (Hillis-Steele ladder)."""
    elems = (k, c)
    d = 1
    while d < m:
        shifted_k = tuple(
            _shift_down(a, d, f)
            for a, f in zip(elems[0], (INF_COST, 3, 0, 0, 0))
        )
        shifted_c = tuple(_shift_down(a, d, 0) for a in elems[1])
        combined = _combine((shifted_k, shifted_c), elems)
        elems = combined
        d *= 2
    return elems


def _onehot_select(values_col, index, iota_col):
    """values_col[(index)] per lane, via one-hot select (no gathers).

    values_col: (m+1, B); index: (B,); iota_col: (m+1, 1) int32."""
    onehot = iota_col == index[None, :]
    return jnp.sum(jnp.where(onehot, values_col, 0), axis=0)


def _table_lookup(table_col, index, iota_col):
    """table_col: (m+1, 1) constant; index: (B,) -> (B,)."""
    onehot = iota_col == index[None, :]
    return jnp.sum(jnp.where(onehot, table_col, 0), axis=0)


@lru_cache(maxsize=64)
def make_batch_locate(
    spec: AlignerSpec,
    interpret: bool = False,
    packed: bool = False,
    pack2: bool = False,
):
    """
    Build a jittable function
        locate(queries, lengths) -> dict of (B,) arrays
    where `queries` is (B, L) uint8 already encoded through
    query_lut(spec) (positions >= length must be 0) and `lengths` is
    (B,) int32.

    With ``packed=True`` the queries argument is instead a (B, L/2)
    uint8 array holding two 4-bit query *class ids* per byte (low
    nibble = even position), as produced by encoding through
    query_class_info(spec)[0]; the kernel unpacks on device and
    compares via per-row class bitmasks. This halves host->device
    transfer volume, which dominates when the device is reached over a
    slow link.

    With ``pack2=True`` the queries are (B, L/4) uint8 with four 2-bit
    class ids per byte (lowest pair = earliest position). Only class
    ids 0-3 are representable — reads whose window contains any other
    class (N/IUPAC bytes) must take the 4-bit lane; callers split via
    native.windows_clean. Same bit-exact results, half the 4-bit
    lane's wire bytes.

    Returned fields: found (bool), ref_start, ref_stop, query_start,
    query_stop, score, errors (all int32; contents undefined where
    found is False).
    """
    m = len(spec.reference)
    if m == 0:
        raise ValueError("batched aligner requires a non-empty reference")
    ref_np = encode_reference(spec)
    if packed or pack2:
        info = query_class_info(spec)
        if info is None:
            raise ValueError("packed mode needs <= 16 query classes")
        _, row_masks_np = info
    k = int(spec.max_error_rate * m)
    minlen_np = min_length_table(spec)
    ncnt_np = n_counts(spec)
    eff_len = effective_length(spec)

    compare_ascii = not (spec.wildcard_ref or spec.wildcard_query)
    start_in_reference = spec.start_in_reference
    start_in_query = spec.start_in_query
    stop_in_reference = spec.stop_in_reference
    stop_in_query = spec.stop_in_query
    ins_cost = del_cost = int(spec.indel_cost)
    min_overlap = int(spec.min_overlap)

    origin_increment = 1 if start_in_query else 0
    ins_cost_inc = 0 if start_in_query else ins_cost
    ins_score_inc = 0 if start_in_query else INSERTION_SCORE
    init_last = m if start_in_reference else min(m, k + 1)
    first_i = 0 if stop_in_reference else m

    idx_col = np.arange(m + 1, dtype=np.int32)[:, None]  # (m+1, 1)
    pos_col = np.arange(1, m + 1, dtype=np.int32)[:, None]  # (m, 1)

    def init_column(min_n):
        """Initial (cost, score, origin) column, shaped (m+1, B).

        Zeros are written as `x * 0` on purpose: deriving them from
        the data keeps the scan carry's varying-axes type consistent
        when the whole program runs per-shard under shard_map
        (jnp.zeros_like would produce unvarying constants and trip
        the carry type check)."""
        i = jnp.asarray(idx_col)  # (m+1, 1)
        mn = min_n[None, :]  # (1, B)
        if not start_in_reference and not start_in_query:
            score = i * DELETION_SCORE + mn * 0
            cost = jnp.maximum(i, mn) * del_cost
            origin = (i + mn) * 0
        elif start_in_reference and not start_in_query:
            score = (i + mn) * 0
            cost = mn * del_cost + i * 0
            origin = jnp.minimum(0, mn - i)
        elif not start_in_reference and start_in_query:
            score = i * DELETION_SCORE + mn * 0
            cost = i * del_cost + mn * 0
            origin = jnp.maximum(0, mn - i)
        else:
            score = (i + mn) * 0
            cost = jnp.minimum(i, mn) * del_cost
            origin = mn - i
        B = min_n.shape[0]
        broad = lambda x: jnp.broadcast_to(x, (m + 1, B)).astype(jnp.int32)
        return broad(cost), broad(score), broad(origin)

    def locate(queries: jnp.ndarray, lengths: jnp.ndarray):
        queries = jnp.asarray(queries, dtype=jnp.uint8)
        lengths = jnp.asarray(lengths, dtype=jnp.int32)
        if pack2:
            B, Lp = queries.shape
            L = 4 * Lp
            pt = queries.T  # (Lp, B)
            queries_t = jnp.stack(
                [
                    pt & jnp.uint8(3),
                    (pt >> 2) & jnp.uint8(3),
                    (pt >> 4) & jnp.uint8(3),
                    pt >> 6,
                ],
                axis=1,
            ).reshape(L, B)
            row_masks = jnp.asarray(row_masks_np)[:, None]  # (m, 1)
        elif packed:
            B, Lp = queries.shape
            L = 2 * Lp
            pt = queries.T  # (Lp, B)
            queries_t = jnp.stack(
                [pt & jnp.uint8(0xF), pt >> 4], axis=1
            ).reshape(L, B)
            row_masks = jnp.asarray(row_masks_np)[:, None]  # (m, 1)
        else:
            B, L = queries.shape
            queries_t = queries.T  # (L, B): per-column access is static-ish
        ref = jnp.asarray(ref_np)[:, None]  # (m, 1)
        minlen_col = jnp.asarray(minlen_np)[:, None]  # (k+2, 1)
        iota_k = jnp.asarray(
            np.arange(len(minlen_np), dtype=np.int32)[:, None]
        )
        cost_cap = jnp.int32(len(minlen_np) - 1)  # k+1 -> INF bucket
        iota = jnp.asarray(idx_col)  # (m+1, 1)
        pos = jnp.asarray(pos_col)  # (m, 1)
        if spec.wildcard_ref:
            ncnt_col = jnp.asarray(ncnt_np)[:, None]  # (m+1, 1)

        n = lengths
        if start_in_query:
            max_n = n
        else:
            max_n = jnp.minimum(n, m + k)
        if stop_in_query:
            min_n = n * 0
        else:
            min_n = jnp.maximum(0, n - m - k)

        cost0, score0, origin0 = init_column(min_n)
        # per-read zero derived from the input: see init_column's note
        # on shard_map carry typing
        zero_b = n * 0
        carry = dict(
            cost=cost0,
            score=score0,
            origin=origin0,
            last=zero_b + init_last,
            last_filled=zero_b,
            stale_origin=zero_b,
            best_found=zero_b.astype(bool),
            best_cost=zero_b + INF_COST,
            best_score=zero_b,
            best_origin=zero_b,
            best_ref_stop=zero_b + m,
            best_query_stop=n,
            done=zero_b.astype(bool),
        )

        def column_step(carry, j):
            # j is the 1-based column index
            active = (j > min_n) & (j <= max_n)  # (B,)
            qc = queries_t[j - 1]  # (B,)
            if packed or pack2:
                eq = (
                    (row_masks >> qc[None, :].astype(jnp.int32)) & 1
                ) != 0  # (m, B)
            elif compare_ascii:
                eq = ref == qc[None, :]  # (m, B)
            else:
                eq = (ref & qc[None, :]) != 0

            cost, score, origin = carry["cost"], carry["score"], carry["origin"]
            # top row of the new column
            v0c = cost[0] + ins_cost_inc  # (B,)
            v0s = score[0] + ins_score_inc
            v0o = origin[0] + origin_increment

            diag_c, diag_s, diag_o = cost[:-1], score[:-1], origin[:-1]
            prev_c, prev_s, prev_o = cost[1:], score[1:], origin[1:]

            # Leaf candidates for cells 1..m
            dc = jnp.where(eq, diag_c, diag_c + 1)
            ds = jnp.where(eq, diag_s + MATCH_SCORE, diag_s + MISMATCH_SCORE)
            ic = prev_c + ins_cost
            is_ = prev_s + INSERTION_SCORE
            posb = jnp.broadcast_to(pos, eq.shape).astype(jnp.int32)
            zero = jnp.zeros_like(posb)
            diag_leaf = (dc, zero, -posb, ds, diag_o)
            ins_leaf = (ic, zero + 1, posb, is_, prev_o)
            k_leaf = _key_min(diag_leaf, ins_leaf)
            # matching cells inherit the diagonal unconditionally and
            # suppress the deletion chain entirely (C = INF below)
            k_leaf = tuple(
                jnp.where(eq, d, other) for d, other in zip(diag_leaf, k_leaf)
            )
            c_cost = jnp.where(eq, INF_COST, del_cost).astype(jnp.int32)
            c_score = jnp.full_like(c_cost, DELETION_SCORE)

            kk, cc = _prefix_combine(k_leaf, (c_cost, c_score), m)
            # apply the seed (new top row) through the prefix deletions
            seed_cost = jnp.minimum(v0c[None, :] + cc[0], INF_COST)
            seed = (
                seed_cost,
                jnp.ones_like(seed_cost),
                jnp.full_like(seed_cost, BIG_NEG),
                v0s[None, :] + cc[1],
                jnp.broadcast_to(v0o[None, :], seed_cost.shape),
            )
            final = _key_min(kk, seed)
            new_cost = jnp.concatenate([v0c[None, :], final[0]], axis=0)
            new_score = jnp.concatenate([v0s[None, :], final[3]], axis=0)
            new_origin = jnp.concatenate([v0o[None, :], final[4]], axis=0)

            act = active[None, :]
            new_cost = jnp.where(act, new_cost, cost)
            new_score = jnp.where(act, new_score, score)
            new_origin = jnp.where(act, new_origin, origin)

            # --- band update (Ukkonen) ---
            fill_end = carry["last"]  # (B,)
            within = (iota <= fill_end[None, :]) & (new_cost <= k)
            shrunk = jnp.max(jnp.where(within, iota, -1), axis=0).astype(
                jnp.int32
            )
            new_last = jnp.where(shrunk < m, shrunk + 1, m)
            new_last = jnp.where(active, new_last, carry["last"])
            new_last_filled = jnp.where(active, fill_end, carry["last_filled"])
            edge_origin = _onehot_select(new_origin, fill_end, iota)
            new_stale = jnp.where(
                active & (fill_end >= 1), edge_origin, carry["stale_origin"]
            )

            # --- last-row candidate ---
            if stop_in_query:
                cand_mask = active & (shrunk == m) & ~carry["done"]
                cand_cost = new_cost[m]
                cand_score = new_score[m]
                cand_origin = new_origin[m]
                length = m + jnp.minimum(cand_origin, 0)
                if spec.wildcard_ref:
                    # effective length counts only non-N positions of
                    # the last `length` reference characters
                    tail_n = ncnt_np[m] - _table_lookup(
                        ncnt_col, jnp.clip(m - length, 0, m), iota
                    )
                    cur_eff = jnp.where(length < m, length - tail_n, eff_len)
                else:
                    cur_eff = length
                need_len = _table_lookup(
                    minlen_col, jnp.minimum(cand_cost, cost_cap), iota_k
                )
                acceptable = (length >= min_overlap) & (cur_eff >= need_len)
                best_length = m + jnp.minimum(carry["best_origin"], 0)
                update = (
                    cand_mask
                    & acceptable
                    & (
                        ~carry["best_found"]
                        | (
                            (cand_origin <= carry["best_origin"] + m // 2)
                            & (cand_score > carry["best_score"])
                        )
                        | (
                            (length > best_length)
                            & (cand_score > carry["best_score"])
                        )
                    )
                )
                best_found = carry["best_found"] | update
                best_cost = jnp.where(update, cand_cost, carry["best_cost"])
                best_score = jnp.where(update, cand_score, carry["best_score"])
                best_origin = jnp.where(update, cand_origin, carry["best_origin"])
                best_ref_stop = jnp.where(update, m, carry["best_ref_stop"])
                best_query_stop = jnp.where(update, j, carry["best_query_stop"])
                done = carry["done"] | (
                    update & (cand_cost == 0) & (cand_origin >= 0)
                )
            else:
                best_found = carry["best_found"]
                best_cost = carry["best_cost"]
                best_score = carry["best_score"]
                best_origin = carry["best_origin"]
                best_ref_stop = carry["best_ref_stop"]
                best_query_stop = carry["best_query_stop"]
                done = carry["done"]

            new_carry = dict(
                cost=new_cost,
                score=new_score,
                origin=new_origin,
                last=new_last,
                last_filled=new_last_filled,
                stale_origin=new_stale,
                best_found=best_found,
                best_cost=best_cost,
                best_score=best_score,
                best_origin=best_origin,
                best_ref_stop=best_ref_stop,
                best_query_stop=best_query_stop,
                done=done,
            )
            return new_carry, None

        if L > 0:
            carry, _ = jax.lax.scan(
                column_step, carry, jnp.arange(1, L + 1, dtype=jnp.int32)
            )

        # --- final-column scan (bottom-up), where max_n == n ---
        # A lax.scan over the row axis (reversed, consuming the already
        # materialized column as xs — no dynamic slicing) so compile
        # time is O(1) in the adapter length; an unrolled loop here
        # made XLA compile time blow up for longer adapters.
        scan_applies = max_n == n
        st = carry
        stale_le = st["stale_origin"]
        last_filled = st["last_filled"]

        row_ids = np.arange(m, first_i - 1, -1, dtype=np.int32)  # desc
        cost_rows = st["cost"][first_i:][::-1]
        score_rows = st["score"][first_i:][::-1]
        origin_rows = st["origin"][first_i:][::-1]
        if spec.wildcard_ref:
            ncnt_rows = ncnt_np[row_ids]  # (R,)

        def final_row_step(best, xs):
            if spec.wildcard_ref:
                i, cand_cost, cand_score, cand_origin, ncnt_i = xs
            else:
                i, cand_cost, cand_score, cand_origin = xs
            (b_found, b_cost, b_score, b_origin, b_ref_stop,
             b_query_stop) = best
            length = i + jnp.minimum(cand_origin, 0)
            if spec.wildcard_ref:
                ref_start = -jnp.minimum(cand_origin, 0)
                span_n = ncnt_i - _table_lookup(
                    ncnt_col, jnp.clip(ref_start, 0, m), iota
                )
                cur_eff = jnp.where(length < m, length - span_n, eff_len)
            else:
                cur_eff = length
            need_len = _table_lookup(
                minlen_col, jnp.minimum(cand_cost, cost_cap), iota_k
            )
            acceptable = (length >= min_overlap) & (cur_eff >= need_len)
            mask = scan_applies & (i <= last_filled) & acceptable
            best_length = b_ref_stop + jnp.minimum(b_origin, 0)
            update = mask & (
                ~b_found
                | (
                    (stale_le <= b_origin + m // 2)
                    & (cand_score > b_score)
                )
                | ((length > best_length) & (cand_score > b_score))
            )
            new_best = (
                b_found | update,
                jnp.where(update, cand_cost, b_cost),
                jnp.where(update, cand_score, b_score),
                jnp.where(update, cand_origin, b_origin),
                jnp.where(update, i, b_ref_stop),
                jnp.where(update, n, b_query_stop),
            )
            return new_best, None

        best0 = (
            st["best_found"], st["best_cost"], st["best_score"],
            st["best_origin"], st["best_ref_stop"], st["best_query_stop"],
        )
        xs = (jnp.asarray(row_ids), cost_rows, score_rows, origin_rows)
        if spec.wildcard_ref:
            xs = xs + (jnp.asarray(ncnt_rows),)
        best, _ = jax.lax.scan(final_row_step, best0, xs)
        st = dict(st)
        (st["best_found"], st["best_cost"], st["best_score"],
         st["best_origin"], st["best_ref_stop"],
         st["best_query_stop"]) = best
        carry = st

        best_origin = carry["best_origin"]
        ref_start = jnp.where(best_origin >= 0, 0, -best_origin)
        query_start = jnp.where(best_origin >= 0, best_origin, 0)
        return dict(
            found=carry["best_found"],
            ref_start=ref_start.astype(jnp.int32),
            ref_stop=carry["best_ref_stop"].astype(jnp.int32),
            query_start=query_start.astype(jnp.int32),
            query_stop=carry["best_query_stop"].astype(jnp.int32),
            score=carry["best_score"].astype(jnp.int32),
            errors=carry["best_cost"].astype(jnp.int32),
        )

    return locate


def encode_queries(
    sequences, lut: np.ndarray, length: int = None
) -> "tuple[np.ndarray, np.ndarray]":
    """Encode a list of ASCII strings into a padded (B, L) uint8 array
    plus a lengths vector. Padding positions are 0 (matches nothing)."""
    lengths = np.array([len(s) for s in sequences], dtype=np.int32)
    L = (
        int(length)
        if length is not None
        else (int(lengths.max()) if len(sequences) else 0)
    )
    out = np.zeros((len(sequences), L), dtype=np.uint8)
    for i, s in enumerate(sequences):
        raw = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
        out[i, : len(raw)] = lut[raw]
    return out, lengths
