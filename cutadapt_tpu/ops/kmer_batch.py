"""
Batched k-mer prefilter (JAX, TPU-first).

The host prefilter scans each read once with a shift-and register
(inherently sequential in the read position). On TPU the same exact
predicate — "does any of these k-mers occur inside its positional
window?" — is evaluated with *shifted compares* instead: for a k-mer of
length q, position p matches iff codes[:, p+t] matches kmer[t] for all
t < q. That is q static slices, compares and ANDs over the whole
(B, L) batch — no scan, no gathers, fully fusable elementwise work.

A read passes the filter if ANY k-mer hits inside its window — only
those reads need the alignment DP, which is the reference engine's key
throughput heuristic (reference: _kmer_finder.pyx:241-257,
kmer_heuristic.py:120-164). The predicate is bit-identical to the host
KmerFinder.
"""

from functools import lru_cache
from typing import List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..kmer_heuristic import create_positions_and_kmers
from .tables import matches_lookup


class BatchPrefilter:
    """A device prefilter program plus its host byte->code LUT."""

    def __init__(self, fn, code_lut: np.ndarray):
        self.fn = fn
        self.code_lut = code_lut

    def __call__(self, codes, lengths):
        return self.fn(codes, lengths)


def _build_code_lut(kmer_chars, match_lookup):
    """Map raw bytes to small codes such that bytes with identical
    matching behaviour (w.r.t. every k-mer character) share a code."""
    chars = sorted(kmer_chars)
    behave = np.zeros((256, len(chars)), dtype=bool)
    for ci, ch in enumerate(chars):
        for b in match_lookup[ch]:
            behave[b, ci] = True
    uniq, codes = np.unique(behave, axis=0, return_inverse=True)
    code_lut = codes.astype(np.uint8)
    # per kmer char: the set of codes that match it
    char_codes = {
        ch: np.flatnonzero(uniq[:, ci]).astype(np.int32)
        for ci, ch in enumerate(chars)
    }
    return code_lut, char_codes


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
    the returned ``code_lut`` (a cheap numpy np.take on the host); pad
    positions must be ``code_lut[0]``.
    """
    positions_and_kmers = create_positions_and_kmers(
        adapter, min_overlap, error_rate, back_adapter, front_adapter, internal
    )
    match_lookup = matches_lookup(ref_wildcards, query_wildcards)

    kmer_chars = set()
    searches: List[Tuple[int, Optional[int], str]] = []
    for start, stop, kmers in positions_and_kmers:
        for kmer in kmers:
            searches.append((start, stop, kmer))
            kmer_chars.update(kmer.encode("ascii"))
    if not searches:
        return BatchPrefilter(
            lambda codes, lengths: jnp.ones(codes.shape[0], bool),
            np.zeros(256, dtype=np.uint8),
        )
    code_lut, char_codes = _build_code_lut(kmer_chars, match_lookup)

    # Pre-resolve per-search constants
    compiled = []
    for start, stop, kmer in searches:
        kb = kmer.encode("ascii")
        code_sets = [char_codes[ch] for ch in kb]
        compiled.append((start, stop, len(kb), code_sets))

    def prefilter(codes: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        codes = jnp.asarray(codes, jnp.uint8)
        lengths = jnp.asarray(lengths, jnp.int32)
        B, L = codes.shape
        n = lengths[:, None]  # (B, 1)
        hit = jnp.zeros((B,), bool)
        for start, stop, q, code_sets in compiled:
            if q > L:
                continue
            P = L - q + 1  # candidate start positions
            acc = None
            for t, cset in enumerate(code_sets):
                window = codes[:, t : t + P]
                m = window == np.uint8(cset[0])
                for c in cset[1:]:
                    m = m | (window == np.uint8(c))
                acc = m if acc is None else (acc & m)
            p = jnp.arange(P, dtype=jnp.int32)[None, :]  # (1, P)
            # resolve the positional window per read, exactly like the
            # host prefilter (negative start = from the read end;
            # stop None = to the end; out-of-range windows are skipped)
            if start < 0:
                start_resolved = jnp.maximum(n + start, 0)
                start_skip = jnp.zeros_like(n, dtype=bool)
            else:
                start_resolved = jnp.full_like(n, start)
                start_skip = start > n
            if stop is None:
                stop_resolved = n
                stop_skip = jnp.zeros_like(n, dtype=bool)
            elif stop < 0:
                stop_resolved = n + stop
                stop_skip = stop_resolved <= 0
            else:
                stop_resolved = jnp.minimum(jnp.full_like(n, stop), n)
                stop_skip = jnp.zeros_like(n, dtype=bool)
            stop_resolved = jnp.minimum(stop_resolved, n)
            skip = start_skip | stop_skip | (stop_resolved - start_resolved <= 0)
            in_window = (p >= start_resolved) & (p + q <= stop_resolved) & ~skip
            hit = hit | jnp.any(acc & in_window, axis=1)
        return hit

    return BatchPrefilter(prefilter, code_lut)
