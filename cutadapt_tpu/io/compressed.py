"""
Transparent compressed-file opening (own equivalent of the reference's
external ``xopen`` dependency; usage mirrored from
/root/reference/src/cutadapt/files.py:22-92).

Reading detects the compression format from the file content (magic
bytes), so e.g. BGZF-compressed BAM works regardless of extension.
Writing picks the format from the file name extension. '-' means
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


class _DeterministicGzipFile(gzip.GzipFile):
    """GzipFile with fixed mtime and no filename for reproducible output."""

    def __init__(self, fileobj, mode, compresslevel=1):
        super().__init__(
            filename="",
            mode=mode,
            compresslevel=compresslevel,
            fileobj=fileobj,
            mtime=0,
        )
        self._outer_fileobj = fileobj

    def close(self):
        super().close()
        if not self._outer_fileobj.closed:
            self._outer_fileobj.close()


def _open_for_reading(name: str, binary: bool):
    raw = open(name, "rb")
    magic = raw.read(4)
    raw.seek(0)
    if magic[:2] == b"\x1f\x8b":
        f = gzip.open(raw, "rb")
    elif magic[:3] == b"BZh":
        f = bz2.open(raw, "rb")
    elif magic[:4] == b"\xfd7zX":
        f = lzma.open(raw, "rb")
    else:
        f = raw
    if binary:
        return f
    return io.TextIOWrapper(f)


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

    if not isinstance(path, (str, os.PathLike)):
        # Already a file-like object
        fileobj = path
        if binary:
            return fileobj
        return io.TextIOWrapper(fileobj)
    name = os.fspath(path)

    if name == "-":
        if "r" in mode:
            raw = sys.stdin.buffer
        else:
            raw = sys.stdout.buffer
        if binary:
            return raw
        return io.TextIOWrapper(raw, write_through=True)

    if "r" in mode:
        return _open_for_reading(name, binary)

    lowered = name.lower()
    if lowered.endswith(".gz"):
        f = _DeterministicGzipFile(
            fileobj=open(name, base_mode),
            mode=base_mode,
            compresslevel=compresslevel,
        )
    elif lowered.endswith(".bz2"):
        f = bz2.open(name, base_mode, compresslevel=compresslevel)
    elif lowered.endswith((".xz", ".lzma")):
        f = lzma.open(name, base_mode)
    else:
        f = open(name, base_mode)

    if binary:
        return f
    return io.TextIOWrapper(f)
