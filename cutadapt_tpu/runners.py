"""
Pipeline runners.

Serial mode first offers the run to the batched device engine
(accel.try_run_accelerated) and only falls back to the per-read loop
for ineligible configurations. Parallel mode is host data parallelism
over record-aligned chunks: one reader process feeds whichever worker
asks next (dynamic balancing), workers stream their output buffers
back, and the main process writes them strictly in chunk-index order —
output is byte-identical for any worker count. That ordering plus the
mergeable Statistics contract is the same reduction scheme the
multi-chip TPU path uses (shards reduce, host writes in order).

Wire protocol (per connection): a non-negative int is a chunk index;
CHUNK_DONE ends a stream (workers follow it with their Statistics);
CHUNK_FAILED is followed by (exception, formatted traceback) and
terminates the run on the receiving side.

Reference parity: runners.py:38-473 of /root/reference/src/cutadapt.
"""

import io
import logging
import multiprocessing
import os
import sys
import traceback
from abc import ABC, abstractmethod
from contextlib import ExitStack
from multiprocessing.connection import Connection
from typing import Iterator, List, Optional, Sequence, Tuple

from .io.fastq import read_chunks, read_paired_chunks
from .io.files import (
    FileFormat,
    InputFiles,
    InputPaths,
    OutputFiles,
    ProxyWriter,
    detect_file_format,
    xopen_rb_raise_limit,
)
from .pipeline import Pipeline
from .report import Statistics
from .utils import Progress

logger = logging.getLogger()

mpctx = multiprocessing.get_context()

CHUNK_DONE = -1
CHUNK_FAILED = -2


def send_failure(connection: Connection, exc: BaseException) -> None:
    """Ship an exception over a connection (tracebacks cannot be
    pickled, so the formatted text travels alongside)."""
    connection.send(CHUNK_FAILED)
    connection.send((exc, traceback.format_exc()))


def receive_checked(connection: Connection):
    """Receive one control value; re-raise a shipped failure after
    terminating all children."""
    value = connection.recv()
    if value == CHUNK_FAILED:
        exc, tb_text = connection.recv()
        logger.debug("%s", tb_text)
        for child in multiprocessing.active_children():
            child.terminate()
        raise exc
    return value


class ReaderProcess(mpctx.Process):
    """
    Reads record-aligned chunks (single or paired) and sends each to
    whichever worker requests work next. Detects the input file format
    first and ships it back over a dedicated pipe (inputs may be
    non-seekable pipes, so only this process can look at the bytes).
    """

    def __init__(
        self,
        *paths: str,
        file_format_connection: Connection,
        connections: Sequence[Connection],
        queue: multiprocessing.Queue,
        buffer_size: int,
        stdin_fd,
    ):
        super().__init__()
        if not 1 <= len(paths) <= 2:
            raise ValueError("Reading requires one or two input files")
        self._paths = paths
        self._file_format_connection = file_format_connection
        self.connections = connections
        self.queue = queue
        self.buffer_size = buffer_size
        self.stdin_fd = stdin_fd

    def run(self):
        if self.stdin_fd != -1:
            # stdin was replaced by the parent; reattach it
            sys.stdin.close()
            sys.stdin = os.fdopen(self.stdin_fd)
        try:
            with ExitStack() as stack:
                try:
                    files = [
                        stack.enter_context(xopen_rb_raise_limit(path))
                        for path in self._paths
                    ]
                    detected = detect_file_format(files[0])
                except Exception as e:
                    send_failure(self._file_format_connection, e)
                    raise
                self._file_format_connection.send(detected)
                for index, chunks in enumerate(self._chunk_stream(files)):
                    self._dispatch(index, chunks)
            # orderly end: one poison pill per worker
            for _ in range(len(self.connections)):
                self.connections[self.queue.get()].send(CHUNK_DONE)
        except Exception as e:
            for connection in self.connections:
                send_failure(connection, e)

    def _chunk_stream(self, files) -> Iterator[Tuple[memoryview, ...]]:
        if len(files) == 2:
            yield from read_paired_chunks(files[0], files[1], self.buffer_size)
        else:
            for chunk in read_chunks(files[0], self.buffer_size):
                yield (chunk,)

    def _dispatch(self, index: int, chunks: Tuple[memoryview, ...]) -> None:
        connection = self.connections[self.queue.get()]
        connection.send(index)
        for chunk in chunks:
            connection.send_bytes(chunk)


class WorkerProcess(mpctx.Process):
    """
    Requests chunks, runs its own copy of the pipeline over each, and
    streams the proxied output buffers back tagged with the chunk
    index; finishes with CHUNK_DONE plus its accumulated Statistics.
    """

    def __init__(
        self,
        id_: int,
        pipeline: Pipeline,
        inpaths: InputPaths,
        proxy_files: List[ProxyWriter],
        read_pipe: Connection,
        write_pipe: Connection,
        need_work_queue: multiprocessing.Queue,
        file_format,
    ):
        super().__init__()
        self._id = id_
        self._pipeline = pipeline
        self._n_input_files = len(inpaths.paths)
        self._interleaved_input = inpaths.interleaved
        self._read_pipe = read_pipe
        self._write_pipe = write_pipe
        self._need_work_queue = need_work_queue
        self._proxy_files = proxy_files
        self._file_format = file_format

    def run(self):
        try:
            stats = Statistics()
            while True:
                self._need_work_queue.put(self._id)
                chunk_index = self._read_pipe.recv()
                if chunk_index == CHUNK_DONE:
                    break
                if chunk_index == CHUNK_FAILED:
                    exc, tb_text = self._read_pipe.recv()
                    logger.error("%s", tb_text)
                    raise exc
                stats += self._process_chunk(chunk_index)

            # counters living in the pipeline objects are collected once
            stats += Statistics().collect(
                0,
                0,
                0 if self._pipeline.paired else None,
                self._pipeline._modifiers,
                self._pipeline._steps,
            )
            self._write_pipe.send(CHUNK_DONE)
            self._write_pipe.send(stats)
        except Exception as e:
            send_failure(self._write_pipe, e)

    def _process_chunk(self, chunk_index: int) -> Statistics:
        """Run the pipeline over one received chunk and ship the
        resulting output bytes."""
        buffers = [
            io.BytesIO(self._read_pipe.recv_bytes())
            for _ in range(self._n_input_files)
        ]
        infiles = InputFiles(
            *buffers,
            interleaved=self._interleaved_input,
            fileformat=self._file_format,
        )
        (n, bp1, bp2) = self._pipeline.process_reads(infiles)
        self._write_pipe.send(chunk_index)
        self._write_pipe.send(n)
        for proxy in self._proxy_files:
            for blob in proxy.drain():
                self._write_pipe.send_bytes(blob)
        return Statistics().collect(n, bp1, bp2, [], [])


class OrderedChunkWriter:
    """
    Accept chunks in any order, write them strictly by chunk index
    (deterministic output independent of scheduling).
    """

    def __init__(self, outfile):
        self._pending = {}
        self._next_index = 0
        self._outfile = outfile

    def write(self, data: bytes, index: int):
        self._pending[index] = data
        while self._next_index in self._pending:
            self._outfile.write(self._pending.pop(self._next_index))
            self._next_index += 1

    def wrote_everything(self):
        return not self._pending


class PipelineRunner(ABC):
    """A read-processing pipeline runner."""

    @abstractmethod
    def run(self, pipeline, progress: Progress, outfiles: OutputFiles) -> Statistics:
        pass

    @abstractmethod
    def close(self):
        pass

    @abstractmethod
    def input_file_format(self) -> FileFormat:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()


class ParallelPipelineRunner(PipelineRunner):
    """
    Reader process -> n worker processes -> in-order main-process
    writer. The whole pipeline object graph is pickled into each
    worker; outputs must be proxied.
    """

    def __init__(
        self,
        inpaths: InputPaths,
        n_workers: int,
        buffer_size: Optional[int] = None,
    ):
        self._n_workers = n_workers
        self._inpaths = inpaths
        self._buffer_size = 4 * 1024**2 if buffer_size is None else buffer_size
        self._need_work_queue: multiprocessing.Queue = mpctx.Queue()
        # pipes the workers receive their chunks on
        receive_ends, send_ends = zip(
            *(mpctx.Pipe(duplex=False) for _ in range(n_workers))
        )
        self._connections = receive_ends
        try:
            stdin_fd = sys.stdin.fileno()
        except io.UnsupportedOperation:
            # stdin replaced by an object without a file descriptor
            stdin_fd = -1
        format_recv, format_send = mpctx.Pipe(duplex=False)
        self._reader_process = ReaderProcess(
            *inpaths.paths,
            file_format_connection=format_send,
            connections=send_ends,
            queue=self._need_work_queue,
            buffer_size=self._buffer_size,
            stdin_fd=stdin_fd,
        )
        self._reader_process.daemon = True
        self._reader_process.start()
        self._input_file_format: FileFormat = receive_checked(format_recv)
        if self._input_file_format is FileFormat.BAM:
            # individual BAM record chunks carry no header
            self._format_string = "bam_no_header"
        else:
            self._format_string = self._input_file_format.name.lower()

    def _launch_workers(
        self, pipeline, proxy_files
    ) -> Tuple[List[WorkerProcess], List[Connection]]:
        workers = []
        result_connections = []
        for index in range(self._n_workers):
            recv_end, send_end = mpctx.Pipe(duplex=False)
            worker = WorkerProcess(
                index,
                pipeline,
                self._inpaths,
                proxy_files,
                self._connections[index],
                send_end,
                self._need_work_queue,
                file_format=self._format_string,
            )
            worker.daemon = True
            worker.start()
            workers.append(worker)
            result_connections.append(recv_end)
        return workers, result_connections

    def run(self, pipeline, progress, outfiles: OutputFiles) -> Statistics:
        workers, connections = self._launch_workers(
            pipeline, outfiles.proxy_files()
        )
        writers = [OrderedChunkWriter(f) for f in outfiles.binary_files()]
        stats = Statistics()
        while connections:
            for connection in multiprocessing.connection.wait(connections):
                chunk_index = receive_checked(connection)
                if chunk_index == CHUNK_DONE:
                    stats += receive_checked(connection)
                    connections.remove(connection)
                    continue
                n_reads = receive_checked(connection)
                progress.update(n_reads)
                for writer in writers:
                    writer.write(connection.recv_bytes(), chunk_index)
        assert all(writer.wrote_everything() for writer in writers)
        for worker in workers:
            worker.join()
        self._reader_process.join()
        progress.close()
        return stats

    def close(self) -> None:
        pass

    def input_file_format(self) -> FileFormat:
        return self._input_file_format


class SerialPipelineRunner(PipelineRunner):
    """Run a pipeline in-process (device engine when eligible)."""

    def __init__(self, infiles: InputFiles, cores: int = 1):
        self._infiles = infiles
        self._cores = cores

    def run(
        self, pipeline: Pipeline, progress: Progress, outfiles: OutputFiles
    ) -> Statistics:
        from .accel import try_run_accelerated

        stats = try_run_accelerated(
            pipeline, self._infiles, progress, cores=self._cores
        )
        if stats is not None:
            return stats
        (n, bp1, bp2) = pipeline.process_reads(self._infiles, progress=progress)
        if progress is not None:
            progress.close()
        return Statistics().collect(
            n, bp1, bp2, pipeline._modifiers, pipeline._steps
        )

    def close(self):
        self._infiles.close()

    def input_file_format(self) -> FileFormat:
        return detect_file_format(self._infiles._files[0])


def make_runner(
    inpaths: InputPaths,
    cores: int,
    buffer_size: Optional[int] = None,
) -> PipelineRunner:
    """
    Return a SerialPipelineRunner if cores == 1, else a
    ParallelPipelineRunner with `cores` worker processes.
    """
    if cores > 1:
        return ParallelPipelineRunner(
            inpaths, n_workers=cores, buffer_size=buffer_size
        )
    return SerialPipelineRunner(inpaths.open())
