"""
Batched shift-and k-mer prefilter (JAX).

The host prefilter (:mod:`cutadapt_tpu.kmer_finder`) packs multiple
k-mers into one 64-bit word; on device the word is represented as two
uint32 lanes (TPU int64 is off by default). The scan runs over the
batch at once: one ``lax.scan`` step per sequence position, with each
search entry's positional window applied as an activity mask (the
shift register is held at zero outside its window).

A read passes the filter if ANY entry hits — only those reads need the
alignment DP, which is the reference engine's key throughput heuristic
(reference: _kmer_finder.pyx:241-257, kmer_heuristic.py:120-164).
"""

from functools import lru_cache
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..kmer_heuristic import create_positions_and_kmers
from .tables import matches_lookup

MAX_WORD = 64


class KmerEntry:
    """One packed search word with its positional window."""

    __slots__ = ("start", "stop", "init_lo", "init_hi", "found_lo", "found_hi", "masks")

    def __init__(self, start, stop, init_mask, found_mask, masks64):
        self.start = start
        self.stop = stop  # None = to end of sequence
        self.init_lo = np.uint32(init_mask & 0xFFFFFFFF)
        self.init_hi = np.uint32(init_mask >> 32)
        self.found_lo = np.uint32(found_mask & 0xFFFFFFFF)
        self.found_hi = np.uint32(found_mask >> 32)
        # (256, 2) uint32: per raw byte, (lo, hi) of the 64-bit mask
        self.masks = masks64


def build_entries(
    positions_and_kmers, ref_wildcards: bool, query_wildcards: bool
) -> List[KmerEntry]:
    match_lookup = matches_lookup(ref_wildcards, query_wildcards)
    entries = []
    for start, stop, kmers in positions_and_kmers:
        index = 0
        while index < len(kmers):
            offset = 0
            init_mask = 0
            found_mask = 0
            word_chars: List[Tuple[int, int]] = []
            while index < len(kmers):
                kmer = kmers[index].encode("ascii")
                if len(kmer) > MAX_WORD:
                    raise ValueError("kmer too long for the shift-and word")
                if offset + len(kmer) > MAX_WORD:
                    break
                init_mask |= 1 << offset
                for p, ch in enumerate(kmer):
                    word_chars.append((offset + p, ch))
                found_mask |= 1 << (offset + len(kmer) - 1)
                offset += len(kmer)
                index += 1
            masks = np.zeros((256, 2), dtype=np.uint32)
            for p, ch in word_chars:
                bit = 1 << p
                for qc in match_lookup[ch]:
                    if bit < 1 << 32:
                        masks[qc, 0] |= np.uint32(bit)
                    else:
                        masks[qc, 1] |= np.uint32(bit >> 32)
            entries.append(KmerEntry(start, stop, init_mask, found_mask, masks))
    return entries


class BatchPrefilter:
    """A device prefilter program plus its host byte->code LUT."""

    def __init__(self, fn, code_lut: np.ndarray):
        self.fn = fn
        self.code_lut = code_lut

    def __call__(self, codes, lengths):
        return self.fn(codes, lengths)


@lru_cache(maxsize=64)
def make_batch_prefilter(
    adapter: str,
    min_overlap: int,
    error_rate: float,
    back_adapter: bool,
    front_adapter: bool,
    internal: bool = True,
    ref_wildcards: bool = False,
    query_wildcards: bool = False,
):
    """
    Build a BatchPrefilter whose ``fn(codes (B, L) uint8, lengths)``
    returns a (B,) bool mask: True where a read may contain the adapter
    (needs the DP). ``codes`` must be raw read bytes translated through
    the returned ``code_lut`` (a cheap numpy np.take on the host);
    pad positions must be code_lut[0].
    """
    positions_and_kmers = create_positions_and_kmers(
        adapter, min_overlap, error_rate, back_adapter, front_adapter, internal
    )
    entries = build_entries(positions_and_kmers, ref_wildcards, query_wildcards)
    if not entries:
        return BatchPrefilter(
            lambda queries, lengths: jnp.ones(queries.shape[0], bool),
            np.zeros(256, dtype=np.uint8),
        )

    E = len(entries)
    # The 256-entry byte->mask tables collapse to a handful of distinct
    # mask columns (the bytes occurring in the k-mers, case folded).
    # Precompute a byte->code LUT on the host and use a short static
    # select chain on device instead of a gather (TPU gathers are slow).
    all_masks = np.stack([e.masks for e in entries])  # (E, 256, 2)
    byte_cols = all_masks.transpose(1, 0, 2).reshape(256, -1)  # (256, E*2)
    uniq, codes = np.unique(byte_cols, axis=0, return_inverse=True)
    n_codes = len(uniq)
    code_lut_np = codes.astype(np.uint8)  # (256,)
    code_masks = uniq.reshape(n_codes, E, 2)  # (n_codes, E, 2)
    code_lo = jnp.asarray(code_masks[:, :, 0])  # (n_codes, E) uint32
    code_hi = jnp.asarray(code_masks[:, :, 1])
    init_lo = jnp.asarray(np.array([e.init_lo for e in entries]))  # (E,)
    init_hi = jnp.asarray(np.array([e.init_hi for e in entries]))
    found_lo = jnp.asarray(np.array([e.found_lo for e in entries]))
    found_hi = jnp.asarray(np.array([e.found_hi for e in entries]))
    starts = np.array([e.start for e in entries], dtype=np.int32)
    stops = np.array(
        [0 if e.stop is None else e.stop for e in entries], dtype=np.int32
    )
    stop_is_end = np.array([e.stop is None for e in entries])

    def prefilter(queries: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        queries = jnp.asarray(queries, jnp.uint8)
        lengths = jnp.asarray(lengths, jnp.int32)
        B, L = queries.shape
        queries_codes_t = queries.T  # caller passes byte codes already
        n = lengths[:, None]  # (B, 1)

        st = jnp.asarray(starts)[None, :]  # (1, E)
        sp = jnp.asarray(stops)[None, :]
        # resolve per-read windows exactly like the host prefilter
        start_resolved = jnp.where(st < 0, jnp.maximum(n + st, 0), st)
        skip_start = (st >= 0) & (st > n)
        stop_resolved = jnp.where(
            jnp.asarray(stop_is_end)[None, :],
            n,
            jnp.where(sp < 0, n + sp, sp),
        )
        stop_resolved = jnp.minimum(stop_resolved, n)
        skip = skip_start | (stop_resolved <= 0) | (stop_resolved - start_resolved <= 0)

        # host-side byte->code translation is done by the caller passing
        # raw bytes; we translate here once on device via the same short
        # select chain (codes fit in very few distinct values)
        codes_t = queries_codes_t  # (L, B) uint8, set below

        def step(carry, j):
            r_lo, r_hi, hit = carry  # (B, E) uint32 each
            c = codes_t[j]  # (B,) uint8 code
            m_lo = jnp.zeros((c.shape[0], E), jnp.uint32)
            m_hi = jnp.zeros((c.shape[0], E), jnp.uint32)
            for code in range(n_codes):
                sel = (c == code)[:, None]
                m_lo = jnp.where(sel, code_lo[code][None, :], m_lo)
                m_hi = jnp.where(sel, code_hi[code][None, :], m_hi)
            active = (j >= start_resolved) & (j < stop_resolved) & ~skip
            # 64-bit shift left by 1 across two uint32 lanes
            carry_bit = r_lo >> 31
            new_lo = ((r_lo << 1) | init_lo[None, :]) & m_lo
            new_hi = ((r_hi << 1) | carry_bit | init_hi[None, :]) & m_hi
            new_lo = jnp.where(active, new_lo, 0)
            new_hi = jnp.where(active, new_hi, 0)
            hit = hit | (
                active
                & (
                    ((new_lo & found_lo[None, :]) != 0)
                    | ((new_hi & found_hi[None, :]) != 0)
                )
            )
            return (new_lo, new_hi, hit), None

        r0 = jnp.zeros((B, E), jnp.uint32)
        hit0 = jnp.zeros((B, E), bool)
        (_, _, hit), _ = jax.lax.scan(
            step, (r0, r0, hit0), jnp.arange(L, dtype=jnp.int32)
        )
        return jnp.any(hit, axis=1)

    return BatchPrefilter(prefilter, code_lut_np)
