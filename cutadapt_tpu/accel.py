"""
Accelerated execution path: route eligible pipelines through the
batched TPU engine while producing byte-identical output and identical
statistics to the per-read host pipeline.

Eligible today: single-end FASTQ input, exactly one regular 3' adapter
(`-a ADAPTER`), action=trim, times=1, no other modifiers/filters, one
output sink. The host path handles everything else. (The eligible set
widens as more batched kernels land.)

Activation policy: the fast path activates when the environment
variable CUTADAPT_TPU_BATCH=1, or automatically when the input file is
large enough that device compile time amortizes (and is skipped when
CUTADAPT_TPU_BATCH=0). jax is imported lazily so that small runs never
pay for it.
"""

import os
from typing import Optional

from .report import Statistics

AUTO_SIZE_THRESHOLD = 64 * 1024 * 1024  # bytes
CHUNK_RECORDS_BYTES = 64 * 1024 * 1024


def _eligible_pipeline(pipeline):
    """Return the (cutter, adapter, sink) triple or None."""
    from .adapters import BackAdapter, MultipleAdapters
    from .kmer_finder import MockKmerFinder
    from .modifiers import AdapterCutter
    from .pipeline import SingleEndPipeline
    from .steps import SingleEndSink
    from .io.fastq import FastqWriter

    if not isinstance(pipeline, SingleEndPipeline):
        return None
    if len(pipeline._modifiers) != 1 or len(pipeline._steps) != 1:
        return None
    cutter = pipeline._modifiers[0]
    sink = pipeline._steps[0]
    if not isinstance(cutter, AdapterCutter) or not isinstance(sink, SingleEndSink):
        return None
    if cutter.action != "trim" or cutter.times != 1:
        return None
    adapters = cutter.adapters
    if not isinstance(adapters, MultipleAdapters) or len(adapters) != 1:
        return None
    adapter = adapters[0]
    if type(adapter) is not BackAdapter:
        return None
    if adapter._force_anywhere or adapter.read_wildcards:
        return None
    if not isinstance(sink.writer, FastqWriter):
        return None
    prefilter = not isinstance(adapter.kmer_finder, MockKmerFinder)
    return cutter, adapter, sink, prefilter


def _activation_allowed(infile) -> bool:
    env = os.environ.get("CUTADAPT_TPU_BATCH")
    if env == "1":
        return True
    if env == "0":
        return False
    # auto mode: only for large inputs (compile time must amortize)
    name = getattr(infile, "name", None)
    try:
        if isinstance(name, (str, bytes)) and os.path.getsize(name) >= (
            AUTO_SIZE_THRESHOLD
        ):
            return True
    except OSError:
        pass
    return False


def try_run_accelerated(pipeline, infiles, progress) -> Optional[Statistics]:
    """
    Run the pipeline through the batched engine if eligible; return the
    collected Statistics, or None if the configuration is not eligible
    (caller falls back to the host path).
    """
    triple = _eligible_pipeline(pipeline)
    if triple is None:
        return None
    if infiles.interleaved or len(infiles._files) != 1:
        return None
    infile = infiles._files[0]
    if not _activation_allowed(infile):
        return None
    from .io.files import detect_file_format, FileFormat

    try:
        if detect_file_format(infile) != FileFormat.FASTQ:
            return None
    except Exception:
        return None

    cutter, adapter, sink, prefilter = triple

    import jax  # lazy; only on the accelerated path

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("CUTADAPT_TPU_CACHE", "/tmp/cutadapt_tpu_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from .batch import Back3pBatchEngine, process_chunks_pipelined
    from .io.fastq import read_chunks

    engine = Back3pBatchEngine(
        adapter.sequence,
        max_error_rate=adapter.max_error_rate,
        min_overlap=adapter.min_overlap,
        indels=adapter.indels,
        prefilter=prefilter,
    )

    out_file = sink.writer._file
    end_stats = cutter.adapter_statistics[adapter].end
    written_lengths = sink._statistics._written_lengths1
    n = 0
    total_bp = 0
    chunks = read_chunks(infile, CHUNK_RECORDS_BYTES)
    for out_bytes, stats in process_chunks_pipelined(engine, chunks):
        out_file.write(out_bytes)
        n += stats["n"]
        total_bp += stats["total_bp"]
        cutter.with_adapters += stats.get("with_adapters", 0)
        if "removed_len_errors" in stats:
            for rem, err in stats["removed_len_errors"]:
                end_stats.errors[int(rem)][int(err)] += 1
        if "adjacent_bases" in stats:
            for b in stats["adjacent_bases"]:
                ch = chr(b)
                if ch in "ACGT":
                    end_stats.adjacent_bases[ch] += 1
                else:
                    end_stats.adjacent_bases[""] += 1
        for length, count in enumerate(stats["written_lengths"]):
            if count:
                written_lengths[int(length)] += int(count)
        if progress is not None:
            progress.update(stats["n"])
    infiles.close()
    if progress is not None:
        progress.close()
    return Statistics().collect(
        n, total_bp, None, pipeline._modifiers, pipeline._steps
    )
