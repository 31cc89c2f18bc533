"""
Pipeline runners: serial and multi-process (reader → N workers →
ordered writer). The multicore runner splits input into record-aligned
chunks, distributes them to workers via dynamic work stealing, and
reassembles output in chunk-index order so results are byte-identical
regardless of core count.
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
from typing import Any, List, Optional, Sequence, Tuple, Iterator, TYPE_CHECKING

from .io.fastq import read_chunks, read_paired_chunks
from .io.files import (
    InputFiles,
    OutputFiles,
    InputPaths,
    xopen_rb_raise_limit,
    detect_file_format,
    FileFormat,
    ProxyWriter,
)
from .pipeline import Pipeline
from .report import Statistics
from .utils import Progress

logger = logging.getLogger()

mpctx = multiprocessing.get_context()

if TYPE_CHECKING:
    mpctx_Process = multiprocessing.Process  # pragma: no cover
else:
    mpctx_Process = mpctx.Process


class ReaderProcess(mpctx_Process):
    """
    Read chunks of FASTA/FASTQ/BAM data (single-end or paired) and send
    each to whichever worker asks for work next. Sends the stop token
    -1 to all workers at the end, or -2 followed by a pickled exception
    on error.
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
        if len(paths) > 2:
            raise ValueError("Reading from more than two files currently not supported")
        if not paths:
            raise ValueError("Must provide at least one file")
        self._paths = paths
        self._file_format_connection = file_format_connection
        self.connections = connections
        self.queue = queue
        self.buffer_size = buffer_size
        self.stdin_fd = stdin_fd

    def run(self):
        if self.stdin_fd != -1:
            sys.stdin.close()
            sys.stdin = os.fdopen(self.stdin_fd)
        try:
            with ExitStack() as stack:
                try:
                    files = [
                        stack.enter_context(xopen_rb_raise_limit(path))
                        for path in self._paths
                    ]
                    file_format = detect_file_format(files[0])
                except Exception as e:
                    self._file_format_connection.send(-2)
                    self._file_format_connection.send((e, traceback.format_exc()))
                    raise
                self._file_format_connection.send(file_format)
                for index, chunks in enumerate(self._read_chunks(*files)):
                    self.send_to_worker(index, *chunks)
            self.shutdown()
        except Exception as e:
            # Propagate the failure to every worker.
            for connection in self.connections:
                connection.send(-2)
                connection.send((e, traceback.format_exc()))

    def _read_chunks(self, *files) -> Iterator[Tuple[memoryview, ...]]:
        if len(files) == 1:
            for chunk in read_chunks(files[0], self.buffer_size):
                yield (chunk,)
        elif len(files) == 2:
            for chunks in read_paired_chunks(files[0], files[1], self.buffer_size):
                yield chunks
        else:
            raise NotImplementedError

    def send_to_worker(self, chunk_index, chunk1, chunk2=None):
        worker_index = self.queue.get()
        connection = self.connections[worker_index]
        connection.send(chunk_index)
        connection.send_bytes(chunk1)
        if chunk2 is not None:
            connection.send_bytes(chunk2)

    def shutdown(self):
        # Send poison pills to all workers
        for _ in range(len(self.connections)):
            worker_index = self.queue.get()
            self.connections[worker_index].send(-1)


class WorkerProcess(mpctx_Process):
    """
    Repeatedly request a chunk, run the pipeline over it, and send the
    processed output chunks and a final Statistics object back.
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
                # Notify the reader that we need data
                self._need_work_queue.put(self._id)
                chunk_index = self._read_pipe.recv()
                if chunk_index == -1:
                    # reader is done
                    break
                elif chunk_index == -2:
                    # An exception has occurred in the reader
                    e, tb_str = self._read_pipe.recv()
                    logger.error("%s", tb_str)
                    raise e

                files = [
                    io.BytesIO(self._read_pipe.recv_bytes())
                    for _ in range(self._n_input_files)
                ]
                infiles = InputFiles(
                    *files,
                    interleaved=self._interleaved_input,
                    fileformat=self._file_format,
                )
                (n, bp1, bp2) = self._pipeline.process_reads(infiles)
                stats += Statistics().collect(n, bp1, bp2, [], [])
                self._send_outfiles(chunk_index, n)

            stats += Statistics().collect(
                0,
                0,
                0 if self._pipeline.paired else None,
                self._pipeline._modifiers,
                self._pipeline._steps,
            )
            self._write_pipe.send(-1)
            self._write_pipe.send(stats)
        except Exception as e:
            self._write_pipe.send(-2)
            self._write_pipe.send((e, traceback.format_exc()))

    def _send_outfiles(self, chunk_index: int, n_reads: int):
        self._write_pipe.send(chunk_index)
        self._write_pipe.send(n_reads)
        for pf in self._proxy_files:
            for chunk in pf.drain():
                self._write_pipe.send_bytes(chunk)


class OrderedChunkWriter:
    """
    Buffer chunks arriving out of order and write them strictly in
    chunk-index order (guarantees deterministic output).
    """

    def __init__(self, outfile):
        self._chunks = dict()
        self._current_index = 0
        self._outfile = outfile

    def write(self, data: bytes, index: int):
        self._chunks[index] = data
        while self._current_index in self._chunks:
            self._outfile.write(self._chunks[self._current_index])
            del self._chunks[self._current_index]
            self._current_index += 1

    def wrote_everything(self):
        return not self._chunks


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
    Run a pipeline in parallel: a reader process feeds record-aligned
    chunks to worker processes through per-worker pipes; the main
    process reassembles output chunks in order and merges statistics.
    """

    def __init__(
        self,
        inpaths: InputPaths,
        n_workers: int,
        buffer_size: Optional[int] = None,
    ):
        self._n_workers = n_workers
        self._need_work_queue: multiprocessing.Queue = mpctx.Queue()
        self._buffer_size = 4 * 1024**2 if buffer_size is None else buffer_size
        self._inpaths = inpaths
        # the workers read from these connections
        connections = [mpctx.Pipe(duplex=False) for _ in range(self._n_workers)]
        self._connections, connw = zip(*connections)
        try:
            fileno = sys.stdin.fileno()
        except io.UnsupportedOperation:
            # stdin has been replaced by an object without a file
            # descriptor (e.g. during tests)
            fileno = -1

        file_format_connection_r, file_format_connection_w = mpctx.Pipe(duplex=False)
        self._reader_process = ReaderProcess(
            *inpaths.paths,
            file_format_connection=file_format_connection_w,
            connections=connw,
            queue=self._need_work_queue,
            buffer_size=self._buffer_size,
            stdin_fd=fileno,
        )
        self._reader_process.daemon = True
        self._reader_process.start()
        self._input_file_format: FileFormat = self._try_receive(
            file_format_connection_r
        )
        self._file_format_string = self._input_file_format.name.lower()
        if self._file_format_string == "bam":
            # Individual BAM record chunks have no header
            self._file_format_string = "bam_no_header"

    def _start_workers(
        self, pipeline, proxy_files
    ) -> Tuple[List[WorkerProcess], List[Connection]]:
        workers = []
        connections = []
        for index in range(self._n_workers):
            conn_r, conn_w = mpctx.Pipe(duplex=False)
            connections.append(conn_r)
            worker = WorkerProcess(
                index,
                pipeline,
                self._inpaths,
                proxy_files,
                self._connections[index],
                conn_w,
                self._need_work_queue,
                file_format=self._file_format_string,
            )
            worker.daemon = True
            worker.start()
            workers.append(worker)
        return workers, connections

    def run(self, pipeline, progress, outfiles: OutputFiles) -> Statistics:
        workers, connections = self._start_workers(pipeline, outfiles.proxy_files())
        chunk_writers = []
        for f in outfiles.binary_files():
            chunk_writers.append(OrderedChunkWriter(f))
        stats = Statistics()
        while connections:
            ready_connections: List[Any] = multiprocessing.connection.wait(connections)
            for connection in ready_connections:
                chunk_index: int = self._try_receive(connection)
                if chunk_index == -1:
                    # this worker is done
                    cur_stats = self._try_receive(connection)
                    stats += cur_stats
                    connections.remove(connection)
                    continue
                number_of_reads: int = self._try_receive(connection)
                progress.update(number_of_reads)
                for writer in chunk_writers:
                    data = connection.recv_bytes()
                    writer.write(data, chunk_index)
        for writer in chunk_writers:
            assert writer.wrote_everything()
        for w in workers:
            w.join()
        self._reader_process.join()
        progress.close()
        return stats

    @staticmethod
    def _try_receive(connection):
        """Receive from `connection`; re-raise shipped exceptions."""
        result = connection.recv()
        if result == -2:
            # An exception occurred on the other end; the traceback is
            # shipped as a string because tracebacks cannot be pickled.
            e, tb_str = connection.recv()
            logger.debug("%s", tb_str)
            for child in multiprocessing.active_children():
                child.terminate()
            raise e
        return result

    def close(self) -> None:
        pass

    def input_file_format(self) -> FileFormat:
        return self._input_file_format


class SerialPipelineRunner(PipelineRunner):
    """Run a pipeline on a single core."""

    def __init__(self, infiles: InputFiles):
        self._infiles = infiles

    def run(
        self, pipeline: Pipeline, progress: Progress, outfiles: OutputFiles
    ) -> Statistics:
        from .accel import try_run_accelerated

        stats = try_run_accelerated(pipeline, self._infiles, progress)
        if stats is not None:
            return stats
        (n, total1_bp, total2_bp) = pipeline.process_reads(
            self._infiles, progress=progress
        )
        if progress is not None:
            progress.close()
        modifiers = getattr(pipeline, "_modifiers", None)
        assert modifiers is not None
        return Statistics().collect(
            n, total1_bp, total2_bp, modifiers, pipeline._steps  # type: ignore[attr-defined]
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
    Return a SerialPipelineRunner if cores == 1 else a
    ParallelPipelineRunner with `cores` worker processes.
    """
    runner: PipelineRunner
    if cores > 1:
        runner = ParallelPipelineRunner(
            inpaths,
            n_workers=cores,
            buffer_size=buffer_size,
        )
    else:
        runner = SerialPipelineRunner(inpaths.open())
    return runner
