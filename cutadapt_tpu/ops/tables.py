"""
Nucleotide encoding tables.

The matching semantics follow the reference implementation
(/root/reference/src/cutadapt/_match_tables.py:4-98):

- ACGT table: A/C/G/T (and U as T) map to one of the four low bits;
  every other byte maps to 0x80 so that it only matches an N wildcard.
- IUPAC table: every IUPAC code maps to the union of its bases;
  N additionally carries the 0x80 bit so it matches non-ACGT bytes
  that were encoded with the ACGT table.
- UPPER table: ASCII uppercasing, used when no wildcards are in play
  and plain byte equality decides a match.

Two encoded characters x, y match iff (x & y) != 0 (wildcard mode)
or x == y (plain mode).
"""

import operator
from functools import lru_cache

import numpy as np

_BASE_BITS = {"A": 1, "C": 2, "G": 4, "T": 8, "U": 8}

_IUPAC_BITS = {
    "X": 0,
    "A": 1,
    "C": 2,
    "G": 4,
    "T": 8,
    "U": 8,
    "R": 1 | 4,
    "Y": 2 | 8,
    "S": 4 | 2,
    "W": 1 | 8,
    "K": 4 | 8,
    "M": 1 | 2,
    "B": 2 | 4 | 8,
    "D": 1 | 4 | 8,
    "H": 1 | 2 | 8,
    "V": 1 | 2 | 4,
    # N matches everything, including non-ACGT bytes (0x80 flag).
    # NB: the reference computes A|C|G|(T + 0x80) == 0x8F.
    "N": 1 | 2 | 4 | 8 | 0x80,
}


def acgt_table() -> bytes:
    t = bytearray([0x80]) * 256
    for c, v in _BASE_BITS.items():
        t[ord(c)] = v
        t[ord(c.lower())] = v
    return bytes(t)


def iupac_table() -> bytes:
    t = bytearray(256)
    for c, v in _IUPAC_BITS.items():
        t[ord(c)] = v
        t[ord(c.lower())] = v
    return bytes(t)


def upper_table() -> bytes:
    return bytes(range(256)).upper()


ACGT_TABLE = acgt_table()
IUPAC_TABLE = iupac_table()
UPPER_TABLE = upper_table()

# NumPy views for vectorized encoding of whole read batches.
ACGT_LUT = np.frombuffer(ACGT_TABLE, dtype=np.uint8)
IUPAC_LUT = np.frombuffer(IUPAC_TABLE, dtype=np.uint8)
UPPER_LUT = np.frombuffer(UPPER_TABLE, dtype=np.uint8)


def translate(string: str, table: bytes) -> bytes:
    """Translate an ASCII string through a 256-byte table."""
    raw = string.encode("ascii")  # raises on non-ASCII like the reference
    return raw.translate(table)


def encode_array(data: bytes, lut: np.ndarray) -> np.ndarray:
    """Encode raw ASCII bytes through a lookup table into a uint8 array."""
    arr = np.frombuffer(data, dtype=np.uint8)
    return lut[arr]


def _all_matches(ref_table: bytes, query_table: bytes, comp_op):
    """For each possible reference byte, the string of query bytes matching it.

    Mirrors the semantics of the reference's matches_lookup
    (/root/reference/src/cutadapt/_match_tables.py:69-98): only ASCII
    query characters (0..127) are considered and NUL never matches.
    """
    result = []
    for ref_char in ref_table:
        matches = []
        for j in range(128):
            query_char = query_table[j]
            if comp_op(ref_char, query_char) and j != 0:
                matches.append(j)
        result.append(bytes(matches).replace(b"\x00", b""))
    return result


@lru_cache(maxsize=None)
def matches_lookup(ref_wildcards: bool, query_wildcards: bool):
    if not ref_wildcards and not query_wildcards:
        return _all_matches(UPPER_TABLE, UPPER_TABLE, operator.eq)
    elif ref_wildcards and not query_wildcards:
        return _all_matches(IUPAC_TABLE, ACGT_TABLE, operator.and_)
    elif not ref_wildcards and query_wildcards:
        return _all_matches(ACGT_TABLE, IUPAC_TABLE, operator.and_)
    else:
        return _all_matches(IUPAC_TABLE, IUPAC_TABLE, operator.and_)
