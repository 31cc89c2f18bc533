"""
Transparent compressed-file opening (own equivalent of the reference's
external ``xopen`` dependency; usage mirrored from
/root/reference/src/cutadapt/files.py:22-92).

Supported: .gz (zlib, deterministic header), .bz2, .xz; '-' means
stdin/stdout. The ``threads`` argument is accepted for API
compatibility; compression happens in-process.
"""

import bz2
import gzip
import io
import lzma
import os
import sys
from typing import Optional


def _resolve(path) -> str:
    return os.fspath(path)


class _DeterministicGzipFile(gzip.GzipFile):
    """GzipFile with fixed mtime and no filename for reproducible output."""

    def __init__(self, filename=None, mode=None, compresslevel=1, fileobj=None):
        super().__init__(
            filename=None,
            mode=mode,
            compresslevel=compresslevel,
            fileobj=fileobj if fileobj is not None else open(filename, mode + "b" if "b" not in mode else mode),
            mtime=0,
        )


def xopen(
    path,
    mode: str = "rb",
    compresslevel: int = 1,
    threads: Optional[int] = None,
):
    """Open a possibly-compressed file.

    mode may be 'rb', 'wb', 'rt', 'wt', 'ab', 'r', 'w'.
    """
    del threads  # in-process compression only
    if mode in ("r", "w", "a"):
        mode += "t"
    binary = "b" in mode
    base_mode = mode.replace("t", "").replace("b", "") + "b"

    if isinstance(path, (str, os.PathLike)):
        name = _resolve(path)
    else:
        # Already a file-like object
        fileobj = path
        if binary:
            return fileobj
        return io.TextIOWrapper(fileobj)

    if name == "-":
        if "r" in mode:
            raw = sys.stdin.buffer
        else:
            raw = sys.stdout.buffer
        if binary:
            return raw
        return io.TextIOWrapper(raw, write_through=True)

    lowered = name.lower()
    if lowered.endswith(".gz"):
        if "r" in mode:
            f = gzip.open(name, base_mode)
        else:
            f = _DeterministicGzipFile(
                fileobj=open(name, base_mode),
                mode=base_mode,
                compresslevel=compresslevel,
            )
    elif lowered.endswith(".bz2"):
        f = bz2.open(
            name,
            base_mode,
            compresslevel=compresslevel if "w" in mode else 9,
        )
    elif lowered.endswith((".xz", ".lzma")):
        f = lzma.open(name, base_mode)
    elif lowered.endswith(".zst"):
        try:
            from compression import zstd  # Python 3.14+
        except ImportError:
            raise OSError(
                "zstandard compression is not available in this build"
            )
        f = zstd.open(name, base_mode)
    else:
        f = open(name, base_mode)

    if binary:
        return f
    return io.TextIOWrapper(f)
