"""
File management: input paths/files, on-demand output files, and the
proxy writers that carry output across process boundaries.

Proxy writers are the multicore transport: workers write records into
in-memory buffers, ``drain()`` hands the accumulated bytes to the main
process (which writes them in chunk-index order), and pickling a proxy
re-creates an empty one in the worker — so the same pipeline object
graph works serial and parallel.

Capability parity: /root/reference/src/cutadapt/files.py:22-333
(incl. the open-files rlimit bump and magic-byte format detection).
"""

import errno
import io
import os
import sys
from abc import ABC
from enum import Enum
from pathlib import Path
from typing import Any, BinaryIO, Dict, List, Optional, TextIO

from ..utils import logger
from .compressed import xopen
from .fastq import open_sequence_file
from .records import UnknownFileFormat

try:
    import resource
except ImportError:  # Windows
    resource = None  # type: ignore


def raise_open_files_limit(n: int) -> None:
    """Raise the soft open-files rlimit by n (capped at the hard limit)."""
    if resource is None:
        return
    soft, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
    resource.setrlimit(resource.RLIMIT_NOFILE, (min(soft + n, hard), hard))


def open_raise_limit(func, *args, **kwargs):
    """Call an open()-like function; on EMFILE bump the rlimit and retry."""
    try:
        return func(*args, **kwargs)
    except OSError as e:
        if e.errno != errno.EMFILE:  # not "Too many open files"
            raise
        logger.debug("Too many open files, attempting to raise soft limit")
        raise_open_files_limit(8)
        return func(*args, **kwargs)


def xopen_rb_raise_limit(path: str):
    """Open a (possibly compressed) file for binary reading, raising
    the open-files limit if needed."""
    f = open_raise_limit(xopen, path, "rb", threads=0)
    logger.debug("Opening '%s', mode 'rb' resulted in %s", path, f)
    return f


class FileOpener:
    """Carries the output compression settings (level, background
    compression threads) applied to every opened output file."""

    def __init__(self, compression_level: int = 1, threads: Optional[int] = None):
        self.compression_level = compression_level
        self.threads = threads

    def xopen(self, path, mode):
        return open_raise_limit(
            xopen,
            path,
            mode,
            compresslevel=self.compression_level,
            threads=self.threads if "w" in mode else 0,
        )

    def sequence_open(self, *args, **kwargs):
        return open_sequence_file(*args, **kwargs)


class InputFiles:
    """One or two open input streams plus their read-mode settings."""

    def __init__(
        self,
        *files: BinaryIO,
        interleaved: bool = False,
        fileformat: Optional[str] = None,
    ):
        assert all(f is not None for f in files)
        self._files = files
        self.interleaved = interleaved
        self.fileformat = fileformat

    def open(self):
        return open_sequence_file(
            *self._files,
            interleaved=self.interleaved,
            mode="r",
            fileformat=self.fileformat,
        )

    def close(self) -> None:
        for f in self._files:
            f.close()


class InputPaths:
    def __init__(self, *paths: str, interleaved: bool = False):
        self.paths = paths
        self.interleaved = interleaved

    def open(self) -> InputFiles:
        files = [xopen_rb_raise_limit(p) for p in self.paths]
        byte_range = os.environ.get("CUTADAPT_TPU_BYTE_RANGE")
        if byte_range:
            # multi-host input sharding: this process reads only its
            # record-aligned byte range of each input (see
            # parallel/multihost.py for the plan/merge contract)
            from ..parallel.multihost import (
                RangeReader,
                parse_byte_range_env,
            )

            ranges = parse_byte_range_env(byte_range)
            files = [
                RangeReader(f, *rng) for f, rng in zip(files, ranges)
            ]
        return InputFiles(*files, interleaved=self.interleaved)


class ProxyWriter(ABC):
    """A writer over in-memory buffers whose bytes are periodically
    drained and shipped elsewhere. Pickling resets the buffers."""

    _buffers: List[io.BytesIO]

    def drain(self) -> List[bytes]:
        """Return and clear the accumulated bytes, one blob per
        underlying output."""
        self._flush()
        blobs = []
        for buf in self._buffers:
            blobs.append(buf.getvalue())
            buf.seek(0)
            buf.truncate()
        return blobs

    def _flush(self) -> None:
        pass


class ProxyTextFile(ProxyWriter):
    """A text-mode file object backed by an in-memory buffer."""

    def __init__(self):
        self._buffers = [io.BytesIO()]
        self._file = io.TextIOWrapper(self._buffers[0])

    def write(self, text):
        self._file.write(text)

    def _flush(self) -> None:
        self._file.flush()

    def __getstate__(self):
        return True  # ensure __setstate__ is called

    def __setstate__(self, state):
        self.__init__()


class ProxyRecordWriter(ProxyWriter):
    """A record writer backed by in-memory buffers (one per output
    path); the path names only determine the output format."""

    def __init__(self, paths: List[Path], **kwargs):
        self._paths = paths
        self._kwargs = kwargs
        self._buffers = []
        for path in paths:
            buf = io.BytesIO()
            buf.name = os.fspath(path)  # format detection reads .name
            self._buffers.append(buf)
        self._writer = open_raise_limit(
            open_sequence_file, *self._buffers, mode="w", **kwargs
        )

    def write(self, *args, **kwargs):
        self._writer.write(*args, **kwargs)

    def __getstate__(self):
        return (self._paths, self._kwargs)

    def __setstate__(self, state):
        paths, kwargs = state
        self.__init__(paths, **kwargs)


class OutputFiles:
    """
    Open output files on demand. In "proxied" (multicore) mode each
    open returns a proxy writing into memory; the real binary files
    stay in the main process, which writes drained proxy bytes to them
    in chunk-index order.
    """

    def __init__(
        self,
        *,
        proxied: bool,
        qualities: bool,
        interleaved: bool,
        file_opener: Optional[FileOpener] = None,
    ):
        self._file_opener = file_opener if file_opener is not None else FileOpener()
        self._binary_files: List[BinaryIO] = []
        self._binary_files_to_close: List[BinaryIO] = []
        self._text_files: List[TextIO] = []
        self._writers: List[Any] = []
        self._proxy_files: List[ProxyWriter] = []
        self._proxied = proxied
        self._qualities = qualities
        self._interleaved = interleaved

    def _open_binary(self, path) -> BinaryIO:
        f = self._file_opener.xopen(path, "wb")
        self._binary_files.append(f)
        self._binary_files_to_close.append(f)
        return f

    def open_text(self, path):
        if not self._proxied:
            f = self._file_opener.xopen(path, "wt")
            self._text_files.append(f)
            return f
        self._open_binary(path)
        proxy = ProxyTextFile()
        self._proxy_files.append(proxy)
        return proxy

    def open_record_writer(
        self, *paths, interleaved: bool = False, force_fasta: bool = False
    ):
        if len(paths) not in (1, 2):
            raise ValueError("Expected one or two paths")
        if interleaved and len(paths) != 1:
            raise ValueError("Cannot write to two files when interleaved is True")
        kwargs: Dict[str, Any] = dict(
            qualities=self._qualities, interleaved=interleaved
        )
        if len(paths) == 1 and paths[0] == "-" and force_fasta:
            kwargs["fileformat"] = "fasta"
        if paths == (None,):
            paths = ("-",)
        assert all(path is not None for path in paths)
        binary_files = [self._open_binary(path) for path in paths]
        if self._proxied:
            proxy = ProxyRecordWriter([Path(p) for p in paths], **kwargs)
            self._proxy_files.append(proxy)
            return proxy
        writer = self._file_opener.sequence_open(
            *binary_files, mode="w", **kwargs
        )
        self._writers.append(writer)
        return writer

    def open_stdout_record_writer(
        self, interleaved: bool = False, force_fasta: bool = False
    ):
        self._binary_files.append(sys.stdout.buffer)
        kwargs: Dict[str, Any] = dict(
            qualities=self._qualities, interleaved=interleaved
        )
        if force_fasta:
            kwargs["fileformat"] = "fasta"
        if self._proxied:
            proxy = ProxyRecordWriter([Path("-")], **kwargs)
            self._proxy_files.append(proxy)
            return proxy
        writer = self._file_opener.sequence_open(
            sys.stdout.buffer, mode="w", **kwargs
        )
        self._writers.append(writer)
        return writer

    def binary_files(self) -> List[BinaryIO]:
        return self._binary_files[:]

    def proxy_files(self) -> List[ProxyWriter]:
        return self._proxy_files

    def close(self) -> None:
        """Close all output files that are not stdout."""
        if not self._proxied:
            for f in self._text_files:
                f.close()
            for w in self._writers:
                w.close()
        for f in self._binary_files_to_close:
            f.close()


class FileFormat(Enum):
    FASTA = 1
    FASTQ = 2
    BAM = 3

    def has_qualities(self) -> bool:
        return self in (FileFormat.FASTQ, FileFormat.BAM)


# first bytes -> detected format; '@' doubles as the empty-input default
_MAGIC_PREFIXES = (
    (b"@", FileFormat.FASTQ),
    (b">", FileFormat.FASTA),
    (b"#", FileFormat.FASTA),  # some FASTA variants allow comments
    (b"BAM\x01", FileFormat.BAM),
)


def detect_file_format(file: BinaryIO) -> FileFormat:
    if file.seekable():
        pos = file.tell()
        magic = file.read(4)
        file.seek(pos)
    else:
        magic = file.peek(4)[0:4]  # type: ignore
    if magic == b"":
        # pretend FASTQ for empty input
        return FileFormat.FASTQ
    for prefix, fileformat in _MAGIC_PREFIXES:
        if magic.startswith(prefix):
            return fileformat
    raise UnknownFileFormat(
        f"Input file format not recognized. The file starts with {magic!r}, "
        "but files in supported formats start with '>' (FASTA), '@' (FASTQ) "
        "or 'BAM'"
    )
