"""
Accelerated execution path: route eligible pipelines through the
batched TPU engine while producing byte-identical output and identical
statistics to the per-read host pipeline.

Eligible today (single-end FASTQ input, FASTQ output):

- modifiers, in any order: -u cuts, -q quality trimming,
  --nextseq-trim, one AdapterCutter with any mix of regular
  3'/5'/anywhere adapters (IUPAC wildcards on either side, --no-indels,
  --times N, action=trim), --poly-a, --length shortening
- steps: length filters (-m/-M) with optional --too-short/long-output,
  --discard-trimmed / --discard-untrimmed, final sink

Anything else falls back to the per-read host pipeline. The engine
updates the very same modifier/step statistics objects the host path
would, so reports are identical.

Activation policy: CUTADAPT_TPU_BATCH=1 forces it on, =0 off; auto
mode activates for inputs large enough that device compile time
amortizes. jax imports lazily so small runs never pay for it.
"""

import os
from typing import Optional

from .report import Statistics

AUTO_SIZE_THRESHOLD = 64 * 1024 * 1024  # bytes
CHUNK_RECORDS_BYTES = 64 * 1024 * 1024


def _translate_adapter(adapter):
    """Return the AdapterTask kind for a host adapter, or None."""
    from .adapters import AnywhereAdapter, BackAdapter, FrontAdapter

    if type(adapter) is BackAdapter and not adapter._force_anywhere:
        return "back"
    if type(adapter) is FrontAdapter and not adapter._force_anywhere:
        return "front"
    if type(adapter) is AnywhereAdapter:
        return "anywhere"
    return None


def _translate_pipeline(pipeline):
    """Map an eligible host pipeline to (stages, filters, cutter, sink,
    stage_modifiers) or return None."""
    from .batch_pipeline import (
        AdapterStage,
        AdapterTask,
        CutStage,
        FilterSpec,
        NextseqStage,
        PolyAStage,
        QualityStage,
        ShortenStage,
    )
    from .modifiers import (
        AdapterCutter,
        NextseqQualityTrimmer,
        PolyATrimmer,
        QualityTrimmer,
        Shortener,
        UnconditionalCutter,
    )
    from .pipeline import SingleEndPipeline
    from .predicates import IsTrimmed, IsUntrimmed, TooLong, TooShort
    from .steps import SingleEndFilter, SingleEndSink
    from .io.fastq import FastqWriter

    if not isinstance(pipeline, SingleEndPipeline):
        return None

    stages = []
    cutter = None
    for mod in pipeline._modifiers:
        if isinstance(mod, UnconditionalCutter):
            stages.append(CutStage(mod.length, mod))
        elif isinstance(mod, QualityTrimmer):
            stages.append(
                QualityStage(mod.cutoff_front, mod.cutoff_back, mod.base, mod)
            )
        elif isinstance(mod, NextseqQualityTrimmer):
            stages.append(NextseqStage(mod.cutoff, mod.base, mod))
        elif isinstance(mod, Shortener):
            stages.append(ShortenStage(mod.length, mod))
        elif isinstance(mod, PolyATrimmer):
            if mod.revcomp:
                return None
            stages.append(PolyAStage(mod))
        elif isinstance(mod, AdapterCutter):
            if cutter is not None or mod.action != "trim":
                return None
            tasks = []
            for i, adapter in enumerate(mod.adapters):
                kind = _translate_adapter(adapter)
                if kind is None:
                    return None
                tasks.append((adapter, kind, i))
            cutter = mod
            stages.append(
                AdapterStage(
                    [AdapterTask(a, kind, i) for a, kind, i in tasks],
                    times=mod.times,
                    modifier=mod,
                )
            )
        else:
            return None

    filters = []
    sink = None
    for step in pipeline._steps:
        if isinstance(step, SingleEndSink):
            if sink is not None or not isinstance(step.writer, FastqWriter):
                return None
            sink = step
            continue
        if sink is not None or not isinstance(step, SingleEndFilter):
            return None  # steps after the sink / non-filter steps
        pred = step._predicate
        if step._writer is not None and not isinstance(
            step._writer, FastqWriter
        ):
            return None
        if isinstance(pred, TooShort):
            filters.append(
                FilterSpec("too_short", pred.minimum_length, step)
            )
        elif isinstance(pred, TooLong):
            filters.append(FilterSpec("too_long", pred.maximum_length, step))
        elif isinstance(pred, IsTrimmed):
            filters.append(FilterSpec("discard_trimmed", None, step))
        elif isinstance(pred, IsUntrimmed):
            filters.append(FilterSpec("discard_untrimmed", None, step))
        else:
            return None
    if sink is None:
        return None
    return stages, filters, cutter, sink


def _apply_stats(stats, stages, filters, cutter, sink):
    """Fold one chunk's engine stats into the host pipeline objects."""
    import numpy as np

    for si, n in stats.get("quality_trimmed", {}).items():
        stages[si].modifier.trimmed_bases += n
    for si, removed in stats.get("poly_a_removed", {}).items():
        mod = stages[si].modifier
        for length, count in enumerate(np.bincount(removed)):
            if count:
                mod.trimmed_bases[int(length)] += int(count)
    if cutter is not None:
        cutter.with_adapters += stats.get("with_adapters", 0)
        stage = next(s for s in stages if hasattr(s, "tasks"))
        for ev in stats.get("adapter_events", ()):
            task = stage.tasks[ev["task"]]
            astats = cutter.adapter_statistics[task.adapter]
            if task.kind == "anywhere":
                front_end, back_end = astats.front, astats.back
            elif task.kind == "front":
                front_end, back_end = astats.end, None
            else:
                front_end, back_end = None, astats.end
            for rem, err, asf, adj in zip(
                ev["removed"], ev["errors"], ev["as_front"], ev["adjacent"]
            ):
                if asf:
                    front_end.errors[int(rem)][int(err)] += 1
                else:
                    back_end.errors[int(rem)][int(err)] += 1
                    ch = chr(adj) if adj else ""
                    if ch in back_end.adjacent_bases and ch:
                        back_end.adjacent_bases[ch] += 1
                    else:
                        back_end.adjacent_bases[""] += 1
    for f, count in zip(filters, stats.get("filter_counts", ())):
        f.step._filtered += count
    written_lengths = sink._statistics._written_lengths1
    for length, count in enumerate(stats["written_lengths"]):
        if count:
            written_lengths[int(length)] += int(count)


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

    translated = _translate_pipeline(pipeline)
    if translated is None:
        return None
    stages, filters, cutter, sink = translated

    import jax  # lazy; only on the accelerated path

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("CUTADAPT_TPU_CACHE", "/tmp/cutadapt_tpu_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from .batch import parse_fastq_chunk
    from .batch_pipeline import BatchPipelineEngine, assemble_window
    from .io.fastq import read_chunks

    engine = BatchPipelineEngine(stages, filters)

    out_file = sink.writer._file
    filter_files = [
        f.step._writer._file if f.step._writer is not None else None
        for f in filters
    ]
    n = 0
    total_bp = 0

    def emit(pending):
        nonlocal n, total_bp
        ws, we, keep, stats = engine.collect(pending)
        chunk = pending.parsed
        out_file.write(assemble_window(chunk, ws, we, keep))
        # routed filter outputs (--too-short-output etc.): records a
        # filter dropped, in input order, with their state at drop time
        for ff, newly in zip(filter_files, stats["filter_dropped_masks"]):
            if ff is not None and newly.any():
                ff.write(assemble_window(chunk, ws, we, newly))
        _apply_stats(stats, stages, filters, cutter, sink)
        n += stats["n"]
        total_bp += stats["total_bp"]
        if progress is not None:
            progress.update(stats["n"])

    pending = None
    for data in read_chunks(infile, CHUNK_RECORDS_BYTES):
        nxt = engine.submit(parse_fastq_chunk(data))
        if pending is not None:
            emit(pending)
        pending = nxt
    if pending is not None:
        emit(pending)
    infiles.close()
    if progress is not None:
        progress.close()
    return Statistics().collect(
        n, total_bp, None, pipeline._modifiers, pipeline._steps
    )
