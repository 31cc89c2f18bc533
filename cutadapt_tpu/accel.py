"""
Accelerated execution path: route eligible pipelines through the
batched TPU engine while producing byte-identical output and identical
statistics to the per-read host pipeline.

Eligible today (FASTQ/FASTA in and out, BAM in, plain or gzip;
single-end, paired-end, and interleaved):

- modifiers, in any order: -u cuts, -q quality trimming,
  --nextseq-trim, one AdapterCutter per side with any mix of adapter
  types (regular/anywhere/non-internal/anchored/rightmost/linked,
  IUPAC wildcards on either side, --no-indels, --times N, indexed
  anchored multi-adapter sets), every action (trim/retain/crop/mask/
  lowercase/--no-trim), --revcomp (single and paired), --pair-adapters,
  --poly-a (both orientations), --length shortening, --trim-n,
  --rename single and paired (incl. {match_sequence}), --strip-suffix,
  -x/-y with {name}, --length-tag, --zero-cap
- steps: --rest-file, --info-file (+ --info-file-paired) and
  --wildcard-file (single and paired, non-linked), length filters
  (-m/-M) with routed outputs, --discard-trimmed/untrimmed (all
  pair-filter modes), --max-n/--max-ee/--max-aer/--discard-casava,
  {name} / paired / combinatorial demultiplexing, sinks

Cross-feature combos ride the engine too: side files with mask/
lowercase actions, --revcomp (single and paired) with name edits /
--rename / --zero-cap / demultiplexing / content predicates /
interleaved IO / FASTA input / mask+lowercase+--no-trim actions
(orientation-selected chunks before the edits; cut bytes recovered
from the physical sides), single-end --revcomp with side files, mask/
lowercase actions with content predicates (masked bytes count as N),
--rename, name edits, and interleaved IO — all stackable with the
paired swap — casava + --revcomp + name edits (the pre-filter hook
selects the orientation before editing), and --pair-adapters with
--wildcard-file, and paired --revcomp with side files (the reference
info-row quirk — walking the physical side's read reverse-
complemented while the matches came from the swapped partner — is
reproduced via _rc_walk_chunk), and per-side ReverseComplementer
stages in paired pipelines (API-only; the CLI builds
PairedReverseComplementer) with side files / demux / name edits /
interleaved IO stacked on top (tests/test_accel_perside_rc.py). The
one remaining host-only combination is noted at its gate and is not
CLI-constructible: side files after a filter step. The engine
updates the very same modifier/step statistics objects the host path
would, so reports are identical; tests/test_accel.py asserts this per
configuration (plus tools/fuzz_parity.py over randomized configs),
and the whole golden suite passes with CUTADAPT_TPU_BATCH=1 forced
(tests/test_batch_forced.py keeps that true in CI).

Activation policy: CUTADAPT_TPU_BATCH=1 forces it on, =0 off;
=require forces it on AND raises BatchRequiredError instead of
silently falling back (the CI enforcement mode — see FALLBACK_COUNT);
auto mode activates for inputs large enough that device compile time
amortizes. jax imports lazily so small runs never pay for it.

Drivers: at -j 1 a 3-stage thread pipeline (reader / dispatch /
in-order emit); at -j N a pool of N host workers each running the
full chunk pipeline with an in-order write committer (_pooled_drive)
— the batch-path analog of the reference's multicore runner, with
the alignment moved to the device and the workers parallelizing the
device-feeding stages instead. CUTADAPT_TPU_WORKERS overrides N.
"""

import logging
import os
import queue
import threading
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

from .report import Statistics


class BatchRequiredError(Exception):
    """CUTADAPT_TPU_BATCH=require was set but the run cannot ride the
    batch engine. Raised instead of silently taking the (byte-identical)
    host path, so CI lanes can *enforce* the zero-fallback property
    rather than staying green when a gate regresses."""


# Fallback accounting: bumped whenever try_run_accelerated declines a
# run that the activation policy admitted (the caller then takes the
# host path). Exposed so tests and bench can assert the zero-fallback
# property instead of trusting the docs; reset-free by design — read a
# before/after delta.
FALLBACK_COUNT = 0
LAST_FALLBACK: Optional[str] = None


def _fallback(reason: str) -> None:
    """Record a batch-engine fallback and return None (the host path
    runs instead). Under CUTADAPT_TPU_BATCH=require, escalate to
    BatchRequiredError instead."""
    global FALLBACK_COUNT, LAST_FALLBACK
    FALLBACK_COUNT += 1
    LAST_FALLBACK = reason
    logger.debug("batch engine fallback: %s", reason)
    if os.environ.get("CUTADAPT_TPU_BATCH") == "require":
        raise BatchRequiredError(
            "CUTADAPT_TPU_BATCH=require, but this run cannot ride the "
            "batch engine: " + reason
        )
    return None

# Auto-activation: inputs at least this large (estimated DECOMPRESSED
# bytes, see _estimated_raw_size) take the device path without
# CUTADAPT_TPU_BATCH=1. 32 MiB of FASTQ is ~130k reads: ~1-2 s of
# single-core host work, which is where saved host time starts beating
# device init + warmup with the persistent compile cache
# (_setup_jax) — the previous 64 MiB-of-file threshold parked typical
# multi-million-read gzipped inputs on the host path.
AUTO_SIZE_THRESHOLD = 32 * 1024 * 1024  # estimated decompressed bytes
# Streaming chunk size: small enough that several chunks are in flight
# (the 3-stage thread pipeline needs >= 3 chunks to overlap), large
# enough that per-dispatch device round-trip latency amortizes.
def _chunk_bytes() -> int:
    """Chunk size for the engine's record-aligned input chunks; read
    per run so CUTADAPT_TPU_CHUNK_BYTES works regardless of when this
    module was first imported."""
    return int(os.environ.get("CUTADAPT_TPU_CHUNK_BYTES", 16 * 1024 * 1024))

_STAGE_END = object()

# Multi-worker drive support: emit() bodies route every output-file
# write through _write(); in the worker pool each chunk's writes are
# captured into a thread-local list and replayed in input order by the
# committer thread, so N workers produce byte-identical files to the
# serial drive. All statistics folds are order-independent merges
# (+= on counters and histograms) and run in the workers under
# _STATS_LOCK.
_CAPTURE = threading.local()
_STATS_LOCK = threading.RLock()

# Pooled-drive contention metrics: every _STATS_LOCK acquisition is
# timed (wait to acquire + time held, outermost acquisition only), and
# each pooled worker's per-chunk wall vs thread-CPU time is recorded.
# thread-CPU ~= time the thread was RUNNABLE-and-scheduled; for the
# emit/submit path that is "GIL held or C++ compute", while
# (wall - cpu) is blocking (device waits, lock waits, preemption) —
# together with lock_wait_s this replaces the former unmeasured
# "C++/numpy releases the GIL" assertion (see BASELINE.md).
_POOL_METRICS_LOCK = threading.Lock()
_POOL_METRICS = {
    "lock_wait_s": 0.0,
    "lock_held_s": 0.0,
    "lock_acquisitions": 0,
    "chunk_wall_s": 0.0,
    "chunk_cpu_s": 0.0,
    "chunks": 0,
}
_LOCK_DEPTH = threading.local()


# Chunks-in-flight gauge: a chunk counts as in flight from device
# dispatch (submit) until its results are emitted. `max` is the
# high-water mark per run — the pipelining-depth evidence bench.py
# publishes (wire/latency overlap needs >= 3 chunks concurrently
# dispatched-or-emitting; see BASELINE.md).
_FLIGHT = {"now": 0, "max": 0}


def _flight_delta(d: int) -> None:
    with _POOL_METRICS_LOCK:
        _FLIGHT["now"] += d
        if _FLIGHT["now"] > _FLIGHT["max"]:
            _FLIGHT["max"] = _FLIGHT["now"]


def reset_flight_metrics() -> None:
    with _POOL_METRICS_LOCK:
        _FLIGHT["now"] = 0
        _FLIGHT["max"] = 0


def flight_metrics() -> dict:
    with _POOL_METRICS_LOCK:
        return dict(_FLIGHT)


def reset_pool_metrics() -> None:
    with _POOL_METRICS_LOCK:
        for k in _POOL_METRICS:
            _POOL_METRICS[k] = 0.0 if k.endswith("_s") else 0


def pool_metrics() -> dict:
    with _POOL_METRICS_LOCK:
        return dict(_POOL_METRICS)


class _stats_lock:
    """`with _stats_lock():` — _STATS_LOCK plus wait/held accounting
    (outermost acquisition only; the lock is reentrant)."""

    def __enter__(self):
        depth = getattr(_LOCK_DEPTH, "d", 0)
        _LOCK_DEPTH.d = depth + 1
        if depth:
            _STATS_LOCK.acquire()
            self._t0 = None
            return self
        t = time.perf_counter()
        _STATS_LOCK.acquire()
        self._t0 = t
        self._t1 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        _LOCK_DEPTH.d -= 1
        _STATS_LOCK.release()
        if self._t0 is not None:
            t2 = time.perf_counter()
            with _POOL_METRICS_LOCK:
                _POOL_METRICS["lock_wait_s"] += self._t1 - self._t0
                _POOL_METRICS["lock_held_s"] += t2 - self._t1
                _POOL_METRICS["lock_acquisitions"] += 1
        return False


def _write(fh, data) -> None:
    """Write `data` to output handle `fh` — immediately on the serial
    drive, deferred to the in-order committer on the pooled drive."""
    cap = getattr(_CAPTURE, "items", None)
    if cap is None:
        fh.write(data)
    else:
        cap.append((fh, data))


def _drive(producer, submit, emit, cores: int = 1) -> None:
    """Run the chunk pipeline with the driver matching `cores`:
    the 3-stage thread pipeline at 1 core (reader / dispatch /
    in-order emit), or a pool of `cores` full-pipeline workers with
    an in-order write committer (host parse/encode/DP-collect/assembly
    parallelize across cores; see BASELINE.md "Local-PCIe plateau").
    CUTADAPT_TPU_WORKERS overrides the worker count."""
    env = os.environ.get("CUTADAPT_TPU_WORKERS")
    workers = int(env) if env else cores
    if workers <= 1:
        _pipelined_drive(producer, submit, emit)
    else:
        _pooled_drive(producer, submit, emit, workers)


def _pooled_drive(producer, submit, emit, workers: int,
                  depth: Optional[int] = None) -> None:
    """Drive the batch pipeline with `workers` threads, each running
    the full host side for its chunk: submit (prefilter + encode +
    device dispatch) then emit (result fetch, assembly, stats folds,
    captured writes). The committer (this thread) replays each chunk's
    captured output writes strictly in input order, so files are
    byte-identical to the serial drive; statistics folds commute and
    run in the workers under _STATS_LOCK.

    The device stays fed because a worker blocking on its chunk's DP
    results leaves the other workers' dispatch/encode running; the
    hot host work is C++/numpy that releases the GIL, so the stages
    genuinely overlap on a multi-core host. This is the batch-path
    analog of the reference's multi-worker runner (reference
    runners.py:275-412) with DP work moved to the device: workers
    parallelize the device-feeding stages instead of the alignment.
    """
    if depth is None:
        depth = workers + 2
    work_q: queue.Queue = queue.Queue(maxsize=depth)
    done = {}
    cv = threading.Condition()
    total = [None]  # chunk count, set once the producer is exhausted
    stop = threading.Event()

    def read_stage():
        seq = 0
        try:
            for item in producer:
                if stop.is_set():
                    break
                work_q.put((seq, item))
                seq += 1
        except BaseException as e:  # noqa: BLE001 - forwarded in order
            with cv:
                done[seq] = ("err", e)
            seq += 1
        finally:
            with cv:
                total[0] = seq
                cv.notify_all()
            work_q.put(_STAGE_END)

    def work_stage():
        while True:
            got = work_q.get()
            if got is _STAGE_END:
                work_q.put(_STAGE_END)  # release sibling workers
                return
            seq, item = got
            if stop.is_set():
                res = ("skip", None)
            else:
                cap = []
                _CAPTURE.items = cap
                w0 = time.perf_counter()
                c0 = time.thread_time()
                _flight_delta(+1)
                try:
                    emit(submit(item))
                    res = ("ok", cap)
                except BaseException as e:  # noqa: BLE001
                    res = ("err", e)
                finally:
                    _flight_delta(-1)
                    _CAPTURE.items = None
                    with _POOL_METRICS_LOCK:
                        _POOL_METRICS["chunk_wall_s"] += (
                            time.perf_counter() - w0
                        )
                        _POOL_METRICS["chunk_cpu_s"] += (
                            time.thread_time() - c0
                        )
                        _POOL_METRICS["chunks"] += 1
            with cv:
                done[seq] = res
                cv.notify_all()

    reader = threading.Thread(target=read_stage, daemon=True)
    pool = [
        threading.Thread(target=work_stage, daemon=True)
        for _ in range(workers)
    ]
    reader.start()
    for t in pool:
        t.start()
    failure = None
    next_seq = 0
    while True:
        with cv:
            while next_seq not in done and (
                total[0] is None or next_seq < total[0]
            ):
                cv.wait()
            if next_seq not in done:
                break  # every produced chunk has been committed
            kind, payload = done.pop(next_seq)
        next_seq += 1
        if kind == "ok" and failure is None:
            for fh, data in payload:
                fh.write(data)
        elif kind == "err" and failure is None:
            # first error in input order wins, like the serial drive;
            # later chunks drain without committing
            failure = payload
            stop.set()
    reader.join()
    for t in pool:
        t.join()
    if failure is not None:
        raise failure


def _pipelined_drive(producer, submit, emit, depth: Optional[int] = None
                     ) -> None:
    """Run the three pipeline stages on separate threads:

      reader thread:  iterate `producer` (file I/O + chunk parsing)
      main thread:    `submit` each item (prefilter/encode/device dispatch)
      writer thread:  `emit` each submitted item, in order (device
                      result fetch, FASTQ assembly, file writes, stats)

    The hot host work on all three stages is C++/IO that releases the
    GIL, so the stages genuinely overlap; bounded queues keep at most
    `depth` chunks in flight per hand-off (so up to depth+1 chunks are
    dispatched-but-unemitted: the emit queue plus the one being
    emitted — enough to hide round-trip latency on high-latency
    links). CUTADAPT_TPU_PIPELINE_DEPTH overrides the default of 3.
    Exceptions from any stage propagate to the caller with
    cross-thread shutdown handled here.
    """
    if depth is None:
        depth = int(os.environ.get("CUTADAPT_TPU_PIPELINE_DEPTH", 3))
    parsed_q: queue.Queue = queue.Queue(maxsize=depth)
    emit_q: queue.Queue = queue.Queue(maxsize=depth)
    failures = []

    def read_stage():
        try:
            for item in producer:
                parsed_q.put(item)
                if failures:
                    break
        except BaseException as e:  # noqa: BLE001 - forwarded to caller
            failures.append(e)
        finally:
            parsed_q.put(_STAGE_END)

    def write_stage():
        while True:
            item = emit_q.get()
            if item is _STAGE_END:
                return
            if failures:
                _flight_delta(-1)
                continue  # drain without emitting
            try:
                emit(item)
            except BaseException as e:  # noqa: BLE001
                failures.append(e)
            finally:
                _flight_delta(-1)

    reader = threading.Thread(target=read_stage, daemon=True)
    writer = threading.Thread(target=write_stage, daemon=True)
    reader.start()
    writer.start()
    try:
        while True:
            item = parsed_q.get()
            if item is _STAGE_END:
                break
            if failures:
                continue  # keep draining so the reader can finish
            _flight_delta(+1)  # in flight: dispatch start -> emitted
            try:
                emit_q.put(submit(item))
            except BaseException as e:  # noqa: BLE001
                _flight_delta(-1)
                failures.append(e)
    finally:
        emit_q.put(_STAGE_END)
        writer.join()
        # the reader stops after at most one more item (bounded queue)
        while reader.is_alive():
            try:
                parsed_q.get(timeout=0.05)
            except queue.Empty:
                pass
        reader.join()
    if failures:
        raise failures[0]


@dataclass
class SingleTranslation:
    """An eligible single-end pipeline, translated for the engine."""

    stages: list
    filters: list
    cutter: object
    sink: object  # SingleEndSink or Demultiplexer
    rename: object  # trailing Renamer, if any
    side: dict  # rest/info/wildcard text files
    name_edits: list  # trailing name-edit ops, in order
    zero_cap: object  # ZeroCapper quality base, if any


@dataclass
class PairedTranslation:
    """An eligible paired-end pipeline, translated for the engine."""

    stages1: list
    stages2: list
    cutters: list
    pair_filters: list
    sink: object
    pair_stage: object  # --pair-adapters construct, if any
    rc_pair: object  # paired --revcomp construct, if any
    post_stages: list  # host stages after the revcomp swap, per slot
    rename: object  # trailing PairedEndRenamer, if any
    side_edits: list  # trailing per-side name-edit ops
    zero_caps: list  # per-side ZeroCapper quality bases
    side: dict  # side-channel files: rest/info/wildcard (R1), info2 (R2)


def _translate_tasks(cutter):
    """AdapterTask list for an AdapterCutter, or None."""
    from .batch_pipeline import AdapterTask, adapter_kind

    tasks = []
    for i, adapter in enumerate(cutter.adapters):
        kind = adapter_kind(adapter)
        if kind is None:
            return None
        if kind == "linked" and cutter.action == "crop":
            return None
        try:
            tasks.append(AdapterTask(adapter, kind, i))
        except ValueError:  # e.g. non-batchable linked sub-adapter
            return None
    return tasks


def _translate_modifier(mod, has_cutter):
    """Return (stage, cutter_or_None) for an eligible single-end
    modifier, or None if the modifier is not batchable."""
    from .batch_pipeline import (
        AdapterStage,
        CutStage,
        NEndStage,
        NextseqStage,
        PolyAStage,
        QualityStage,
        RevcompStage,
        ShortenStage,
    )
    from .modifiers import (
        AdapterCutter,
        NEndTrimmer,
        NextseqQualityTrimmer,
        PolyATrimmer,
        QualityTrimmer,
        ReverseComplementer,
        Shortener,
        UnconditionalCutter,
    )

    from . import native as _nat

    if isinstance(mod, NEndTrimmer):
        if not _nat.AVAILABLE:
            return None
        return NEndStage(mod), None

    if isinstance(mod, UnconditionalCutter):
        return CutStage(mod.length, mod), None
    if isinstance(mod, QualityTrimmer):
        return (
            QualityStage(mod.cutoff_front, mod.cutoff_back, mod.base, mod),
            None,
        )
    if isinstance(mod, NextseqQualityTrimmer):
        return NextseqStage(mod.cutoff, mod.base, mod), None
    if isinstance(mod, Shortener):
        return ShortenStage(mod.length, mod), None
    if isinstance(mod, PolyATrimmer):
        if not _nat.AVAILABLE:
            return None
        return PolyAStage(mod, revcomp=mod.revcomp), None
    if isinstance(mod, ReverseComplementer):
        from . import native

        inner = mod.adapter_cutter
        if (
            has_cutter
            or inner.action not in ("trim", None, "mask", "lowercase")
            or not native.AVAILABLE
        ):
            return None
        tasks = _translate_tasks(inner)
        if tasks is None:
            return None
        return (
            RevcompStage(
                tasks, times=inner.times, modifier=mod,
                suffix=mod._suffix, action=inner.action,
            ),
            inner,
        )
    if isinstance(mod, AdapterCutter):
        from . import native

        supported = ("trim", None, "retain", "crop")
        if native.AVAILABLE:  # transform assembly is native-only
            supported += ("mask", "lowercase")
        if has_cutter or mod.action not in supported:
            return None
        tasks = _translate_tasks(mod)
        if tasks is None:
            return None
        return (
            AdapterStage(
                tasks, times=mod.times, modifier=mod, action=mod.action
            ),
            mod,
        )
    return None


def _translate_predicate(pred):
    from . import native
    from .predicates import Predicate

    if not isinstance(pred, Predicate) or not pred.kind:
        return None
    if pred.needs_native_scan and not native.AVAILABLE:
        return None
    return (pred.kind, pred.threshold)


def _translate_single(pipeline, fasta: bool = False):
    """Map an eligible single-end host pipeline to (stages, filters,
    cutter, sink_or_demux, renamer) or None. The final step may be a
    plain sink or a Demultiplexer; every writer must be a Fastq- or
    FastaWriter (FASTA input requires FASTA output — a FASTQ writer
    would raise on the host path, which must stay in charge of that
    error)."""
    from .batch_pipeline import CutStage, FilterSpec
    from .modifiers import (
        LengthTagModifier,
        PrefixSuffixAdder,
        Renamer,
        SuffixRemover,
        ZeroCapper,
    )
    from .steps import (
        Demultiplexer,
        InfoFileWriter,
        RestFileWriter,
        SingleEndFilter,
        SingleEndSink,
        WildcardFileWriter,
    )
    from .io.fastq import FastaWriter, FastqWriter

    writer_classes = (FastaWriter,) if fasta else (FastqWriter, FastaWriter)

    modifiers = list(pipeline._modifiers)
    rename = None
    used = set()
    if modifiers and type(modifiers[-1]) is Renamer:
        rename = modifiers.pop()
        used = {text for is_field, text in rename._parts if is_field}

    # trailing name/quality edit modifiers (the CLI emits them after
    # every window-modifying stage; enforce that ordering here)
    edit_types = (SuffixRemover, LengthTagModifier, PrefixSuffixAdder,
                  ZeroCapper)
    split = next(
        (k for k, mod in enumerate(modifiers)
         if isinstance(mod, edit_types)),
        len(modifiers),
    )
    name_edits = []
    zero_cap = None
    for mod in modifiers[split:]:
        if isinstance(mod, SuffixRemover):
            name_edits.append(("strip", mod.suffix))
        elif isinstance(mod, LengthTagModifier):
            name_edits.append(("lentag", mod))
        elif isinstance(mod, PrefixSuffixAdder):
            name_edits.append(("presuf", mod.prefix, mod.suffix))
        elif isinstance(mod, ZeroCapper):
            zero_cap = mod.quality_base
        else:
            return None  # window stage after a name edit
    modifiers = modifiers[:split]

    stages = []
    cutter = None
    for mod in modifiers:
        t = _translate_modifier(mod, cutter is not None)
        if t is None:
            return None
        stage, stage_cutter = t
        if stage_cutter is not None:
            cutter = stage_cutter
        stages.append(stage)

    if rename is not None:
        if "match_sequence" in used and any(
            t.kind == "linked"
            for st in stages if hasattr(st, "tasks")
            for t in st.tasks
        ):
            return None  # linked events carry no match geometry
        if {"cut_prefix", "cut_suffix"} & used:
            # cut bytes are recovered from the original reads, which
            # requires the cuts to run before any other stage
            past_cuts = False
            for s in stages:
                if isinstance(s, CutStage):
                    if past_cuts:
                        return None
                else:
                    past_cuts = True
    rc_stage = _revcomp_stage(stages)
    if _transform_action(stages) is not None or rc_stage is not None:
        from .batch_pipeline import AdapterStage

        if fasta and rc_stage is not None:
            # FASTA chunks alias quality offsets to the sequence: the
            # rc copy must complement sequences only
            rc_stage.has_quals = False
        # later stages would see un-transformed / forward bytes
        if not isinstance(stages[-1], AdapterStage):
            return None
    if fasta:
        from .batch_pipeline import NextseqStage, QualityStage

        # FASTA carries no qualities; the host path owns the error
        # (including ZeroCapper's reference-exact AttributeError)
        if any(isinstance(s, (QualityStage, NextseqStage)) for s in stages):
            return None
        if zero_cap is not None:
            return None

    def writer_ok(w):
        return isinstance(w, writer_classes)

    filters = []
    sink = None
    side = {"rest": None, "info": None, "wildcard": None}
    for step in pipeline._steps:
        if isinstance(
            step, (RestFileWriter, InfoFileWriter, WildcardFileWriter)
        ):
            # side-channel rows come from match events and must run
            # before any filter (reference step order). mask/lowercase
            # actions are fine: rounds trim their working windows the
            # same way, so the recorded match geometry is identical,
            # and the rows never read transformed bytes (info rows
            # slice the original read, rest/wildcard rows the match
            # window). --revcomp is fine too: rows slice the
            # orientation-selected chunk and info rows carry the
            # '1'/'0' is_rc column.
            if filters or sink is not None:
                return None
            has_linked = any(
                t.kind == "linked"
                for st in stages if hasattr(st, "tasks")
                for t in st.tasks
            )
            if isinstance(step, InfoFileWriter):
                if fasta:
                    return None  # info rows include quality columns
                key = "info"
            elif isinstance(step, WildcardFileWriter):
                key = "wildcard"
            else:
                key = "rest"
            if has_linked and key != "info":
                # matches the reference, whose rest()/wildcards() have
                # no linked implementation (steps.py TODOs): the host
                # path owns that failure; linked info rows work
                return None
            if side[key] is not None:
                return None
            side[key] = step._file
            continue
        if isinstance(step, SingleEndSink):
            if sink is not None or not writer_ok(step.writer):
                return None
            sink = step
            continue
        if isinstance(step, Demultiplexer):
            if sink is not None or cutter is None:
                return None
            writers = list(step._writers.values())
            if step._untrimmed_writer is not None:
                writers.append(step._untrimmed_writer)
            if not all(writer_ok(w) for w in writers):
                return None
            sink = step
            continue
        if sink is not None or not isinstance(step, SingleEndFilter):
            return None
        if step._writer is not None and not writer_ok(step._writer):
            return None
        t = _translate_predicate(step._predicate)
        if t is None:
            return None
        if fasta and t[0] in (
            "too_many_expected_errors", "too_high_average_error_rate",
        ):
            return None  # quality-based predicates need FASTQ
        filters.append(FilterSpec(t[0], t[1], step))
    if sink is None:
        return None
    return SingleTranslation(
        stages, filters, cutter, sink, rename, side, name_edits, zero_cap
    )


def _transform_action(stages):
    """The mask/lowercase action of the stage list's adapter stage, if
    any (these need the transform assembler and must be last)."""
    from .batch_pipeline import AdapterStage

    for s in stages:
        if isinstance(s, AdapterStage) and s.action in ("mask", "lowercase"):
            return s.action
    return None


def _revcomp_stage(stages):
    from .batch_pipeline import RevcompStage

    for s in stages:
        if isinstance(s, RevcompStage):
            return s
    return None


def _stages_assembler(stages):
    """Per-chunk assembler honoring a mask/lowercase adapter action or
    a --revcomp stage."""
    from .io.chunks import assemble_window

    rc_stage = _revcomp_stage(stages)
    if rc_stage is not None:
        from . import native

        suffix = (rc_stage.suffix or "").encode("ascii")

        def fn(chunk, ws, we, mask, stats):
            if stats and stats.get("rc_selected"):
                # the paired drive materialized the chosen-orientation
                # chunk already (per-side rc with downstream
                # consumers); assemble it plain, honoring a
                # mask/lowercase rc action via the published remainder
                tm = _TRANSFORM_MODES.get(stats.get("transform_action"))
                if tm is not None:
                    rs, re_ = stats["remainder"]
                    return native.assemble_fastq_transform(
                        chunk.buf, chunk.head_start, chunk.head_end,
                        chunk.seq_start, chunk.qual_start,
                        ws, we, rs, re_, mask, tm,
                    )
                return assemble_window(chunk, ws, we, mask)
            return native.assemble_fastq_window_rc(
                chunk.buf, stats["rc_chunk"].buf, chunk.head_start,
                chunk.head_end, chunk.seq_start, chunk.qual_start,
                ws, we, mask, stats["is_rc"], suffix,
            )

        return fn
    action = _transform_action(stages)
    if action is None:
        # no static transform stage — but the paired --revcomp stage
        # lives outside the per-side stage lists and publishes its
        # mask/lowercase action through the stats, so check at runtime
        def plain(chunk, ws, we, mask, stats):
            tm = _TRANSFORM_MODES.get(
                (stats or {}).get("transform_action")
            )
            if tm is not None:
                from . import native

                rs, re_ = stats["remainder"]
                return native.assemble_fastq_transform(
                    chunk.buf, chunk.head_start, chunk.head_end,
                    chunk.seq_start, chunk.qual_start,
                    ws, we, rs, re_, mask, tm,
                )
            return assemble_window(chunk, ws, we, mask)

        return plain
    from . import native

    mode = 1 if action == "mask" else 2

    def fn(chunk, ws, we, mask, stats):
        rs, re_ = stats["remainder"]
        return native.assemble_fastq_transform(
            chunk.buf, chunk.head_start, chunk.head_end, chunk.seq_start,
            chunk.qual_start, ws, we, rs, re_, mask, mode,
        )

    return fn


_TRANSFORM_MODES = {"mask": 1, "lowercase": 2}


def _make_stats_reducer():
    """A DeviceStatsReducer when device-reduced statistics apply:
    automatically with an active shard mesh (the multi-host reduction
    contract — per-read stat arrays stay on their shard, only psum'd
    counter tensors cross devices), or forced single-device with
    CUTADAPT_TPU_DEVICE_STATS=1 (testing); =0 disables."""
    env = os.environ.get("CUTADAPT_TPU_DEVICE_STATS")
    if env == "0":
        return None
    from .batch_pipeline import get_shard_mesh

    mesh = get_shard_mesh()
    if mesh is None and env != "1":
        return None
    from .parallel.stats import DeviceStatsReducer

    return DeviceStatsReducer(mesh)


def _locked(fn):
    """Serialize a stats-folding helper under _STATS_LOCK (reentrant:
    _apply_side_stats calls the _record_* helpers)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        with _stats_lock():
            return fn(*a, **kw)

    return wrapper


_ADJ_KEYS = ("A", "C", "G", "T", "")
_ADJ_CODE = np.full(256, 4, np.int8)
for _b_i, _b in enumerate(b"ACGT"):
    _ADJ_CODE[_b] = _b_i


@_locked
def _record_removals(end, removed, errors, reducer=None):
    """Fold a removal event batch into EndStatistics — via the device
    reducer when given, else host-side per unique (length, errors).
    Like every _record_* helper, serialized by _STATS_LOCK: the pooled
    drive folds from several worker threads (order-independent +=
    merges, so only exclusion is needed, not ordering)."""
    if reducer is not None:
        def fold(hist, end=end):
            for ln, er in zip(*np.nonzero(hist)):
                end.record_removal(int(ln), int(er), int(hist[ln, er]))

        reducer.add_hist2d(("rm", id(end)), removed, errors, fold)
        return
    base = int(errors.max(initial=0)) + 1
    enc = removed.astype(np.int64) * base + errors
    uniq, counts = np.unique(enc, return_counts=True)
    for p, c in zip(uniq, counts):
        end.record_removal(int(p // base), int(p % base), int(c))


@_locked
def _record_adjacent(end, adj_bytes, reducer=None):
    """Adjacent-base tallies (byte 0 and non-ACGT count as '')."""
    codes = _ADJ_CODE[np.asarray(adj_bytes, np.uint8)]
    if reducer is not None:
        def fold(h, end=end):
            for i, c in enumerate(h[:5]):
                if c:
                    end.adjacent_bases[_ADJ_KEYS[i]] += int(c)

        reducer.add_hist1d(("adj", id(end)), codes, fold)
        return
    cnt = np.bincount(codes, minlength=5)
    for i, c in enumerate(cnt[:5]):
        if c:
            end.adjacent_bases[_ADJ_KEYS[i]] += int(c)


@_locked
def _record_written(wl, side, reducer=None, values=None, hist=None):
    """Written-length histogram for one side: values (per-read kept
    lengths) ride the reducer; hist is the precomputed host bincount."""
    if reducer is not None:
        def fold(h, wl=wl, side=side):
            wl.add_histogram(h, side=side)

        if values is None:
            values = _hist_to_values(hist)
        reducer.add_hist1d(("wl", id(wl), side), values, fold)
        return
    if hist is None:
        hist = np.bincount(values)
    wl.add_histogram(hist, side=side)


def _hist_to_values(hist):
    return np.repeat(np.arange(len(hist)), hist)


@_locked
def _record_filtered(step, mask, reducer=None):
    """Filter counter for one step: psum'd popcount on the reducer."""
    if reducer is not None:
        def fold(n, step=step):
            step._filtered += n

        reducer.add_count(("flt", id(step)), mask, fold)
        return
    step._filtered += int(mask.sum())


@_locked
def _apply_side_stats(stats, stages, cutter, written_lengths,
                      reducer=None):
    """Fold one chunk's engine stats for one side into the host
    pipeline objects (with `reducer`, the mergeable histograms and
    counters accumulate in mesh-reduced device buffers instead and
    fold once at end of run). Returns total_bp of the side."""
    for si, n in stats.get("quality_trimmed", {}).items():
        stages[si].modifier.trimmed_bases += n
    for si, removed in stats.get("poly_a_removed", {}).items():
        mod = stages[si].modifier
        for length, count in enumerate(np.bincount(removed)):
            if count:
                mod.trimmed_bases[int(length)] += int(count)
    rc_stage = _revcomp_stage(stages)
    if rc_stage is not None and "revcomped" in stats:
        rc_stage.modifier.reverse_complemented += stats["revcomped"]
    if cutter is not None:
        cutter.with_adapters += stats.get("with_adapters", 0)
        stage = next(s for s in stages if hasattr(s, "tasks"))
        for ev in stats.get("adapter_events", ()):
            task = stage.tasks[ev["task"]]
            ev_rc = bool(ev.get("rc"))
            sub = np.asarray(ev["sub"])
            asf = np.asarray(ev["as_front"], bool)
            rem = np.asarray(ev["removed"])
            err = np.asarray(ev["errors"])
            adj = np.asarray(ev["adjacent"])
            # linked adapters emit two events per round (one per
            # phase) but the host path credits reverse_complemented
            # once per LinkedMatch; `primary` marks the per-read row
            prim = (
                np.asarray(ev["primary"], bool) if "primary" in ev else None
            )
            for s in (np.unique(sub) if len(sub) else ()):
                m = sub == s
                astats = cutter.adapter_statistics[task.adapters[int(s)]]
                if ev_rc:
                    astats.reverse_complemented += int(
                        m.sum() if prim is None else (m & prim).sum()
                    )
                fm = m & asf
                bm = m & ~asf
                if fm.any():
                    _record_removals(
                        astats.front, rem[fm], err[fm], reducer
                    )
                if bm.any():
                    _record_removals(
                        astats.back, rem[bm], err[bm], reducer
                    )
                    _record_adjacent(astats.back, adj[bm], reducer)
    if written_lengths is not None:
        _record_written(
            written_lengths, 1, reducer,
            values=stats.get("written_len_values"),
            hist=stats["written_lengths"],
        )
    return stats["total_bp"]


def _emit_side_files(rest_fh, info_fh, wildcard_fh, chunk, stats, stage,
                     final_ws, final_we, precap_chunk=None,
                     rc_flags=None, walk_chunk=None):
    """Write --rest-file / --info-file / --wildcard-file rows for one
    chunk from the
    engine's match events (reference formats: steps.py RestFileWriter
    and InfoFileWriter). Events carry each match's window and
    window-relative coordinates; rows appear in read order, a read's
    matches in round order, with the reference's exact field layout
    (including the trailing is_rc column on match rows and the
    4-column -1 rows for unmatched reads).

    With --zero-cap, match rows slice info.original_read on the host —
    captured before the trailing ZeroCapper ran — while unmatched -1
    rows show the current (capped) read: `precap_chunk` supplies the
    uncapped quality bytes for the match rows (same offsets).

    With --revcomp, `chunk` is the orientation-selected chunk (the
    host slices info.original_read.reverse_complement() for rc-chosen
    reads) and `rc_flags` is the per-read is_rc array: info match rows
    then carry '1'/'0' in the trailing is_rc column (InfoFileWriter.
    RC_MAP; reference steps.py) instead of the empty string.

    With paired --revcomp, the info-row walk buffer differs from the
    match buffer: the reference walks the PHYSICAL side's original
    read (reverse-complemented when rc was chosen) while the matches
    were found on the swapped partner — `walk_chunk` supplies that
    buffer (see _rc_walk_chunk); rest/wildcard rows keep slicing
    `chunk` because Match.rest()/wildcards() read the matched read's
    own bytes (reference adapters.py:430-470, 378-393)."""
    buf = chunk.buf
    match_qual_buf = (precap_chunk or chunk).buf
    hs, he = chunk.head_start, chunk.head_end
    ss, qo = chunk.seq_start, chunk.qual_start

    def text(start, a, b):
        return bytes(buf[start + a : start + b]).decode("latin-1")

    def qtext(start, a, b):
        return bytes(match_qual_buf[start + a : start + b]).decode("latin-1")

    # info-row slice sources: the walk chunk when given (paired
    # --revcomp), else the current chunk (seq) + pre-zero-cap (qual)
    if walk_chunk is not None:
        w_buf, w_qbuf = walk_chunk.buf, walk_chunk.buf
        w_ss, w_qo = walk_chunk.seq_start, walk_chunk.qual_start
        w_sl = walk_chunk.seq_len
    else:
        w_buf, w_qbuf = buf, match_qual_buf
        w_ss, w_qo = ss, qo
        w_sl = chunk.seq_len

    def wtext(start, a, b):
        return bytes(w_buf[start + a : start + b]).decode("latin-1")

    def wqtext(start, a, b):
        return bytes(w_qbuf[start + a : start + b]).decode("latin-1")

    matches_of = {}
    for ev in stats.get("adapter_events", ()):
        task = stage.tasks[ev["task"]]
        reads = ev["reads"]
        for j in range(len(reads)):
            matches_of.setdefault(int(reads[j]), []).append((task, ev, j))

    if rest_fh is not None:
        for r, match_list in sorted(matches_of.items()):
            task, ev, j = match_list[-1]
            w0, w1 = int(ev["ws"][j]), int(ev["we"][j])
            if ev["as_front"][j]:
                lo, hi = w0, w0 + int(ev["qs"][j])
            else:
                lo, hi = w0 + int(ev["qe"][j]), w1
            if hi > lo:
                _write(
                    rest_fh,
                    f"{text(ss[r], lo, hi)} {text(hs[r], 0, he[r] - hs[r])}\n",
                )

    if wildcard_fh is not None:
        for r, match_list in sorted(matches_of.items()):
            task, ev, j = match_list[-1]
            adapter_seq = task.adapters[int(ev["sub"][j])].sequence
            w0, w1 = int(ev["ws"][j]), int(ev["we"][j])
            rel = int(ev["qs"][j])
            astart, astop = int(ev["astart"][j]), int(ev["astop"][j])
            window_len = w1 - w0
            chars = [
                chr(buf[ss[r] + w0 + rel + i])
                for i in range(astop - astart)
                if adapter_seq[astart + i] == "N" and rel + i < window_len
            ]
            _write(
                wildcard_fh,
                f"{''.join(chars)} {text(hs[r], 0, he[r] - hs[r])}\n",
            )

    if info_fh is not None:
        rows = []
        for r in range(chunk.n_records):
            name = text(hs[r], 0, he[r] - hs[r])
            match_list = matches_of.get(r)
            if not match_list:
                w0, w1 = int(final_ws[r]), int(final_we[r])
                rows.append(
                    f"{name}\t-1\t{text(ss[r], w0, w1)}"
                    f"\t{text(qo[r], w0, w1)}\n"
                )
                continue
            # The reference slices the ORIGINAL read with coordinates
            # taken from the modified one (InfoFileWriter walks
            # info.original_read through match.trimmed) — emulate that
            # walk exactly, including its clipping.
            lo, hi = 0, int(w_sl[r])
            for task, ev, j in match_list:
                rel_a, rel_b = int(ev["qs"][j]), int(ev["qe"][j])
                a = min(lo + rel_a, hi)
                b = min(lo + rel_b, hi)
                adapter = task.adapters[int(ev["sub"][j])]
                rows.append(
                    "\t".join(
                        (
                            name,
                            str(int(ev["errors"][j])),
                            str(rel_a),
                            str(rel_b),
                            wtext(w_ss[r], lo, a),
                            wtext(w_ss[r], a, b),
                            wtext(w_ss[r], b, hi),
                            # linked phases carry a ";1"/";2" name
                            # suffix (reference adapters.py:1157-1171)
                            adapter.name + ev.get("suffix", ""),
                            wqtext(w_qo[r], lo, a),
                            wqtext(w_qo[r], a, b),
                            wqtext(w_qo[r], b, hi),
                            # is_rc column: ''  without --revcomp,
                            # '1'/'0' with it
                            "" if rc_flags is None
                            else ("1" if rc_flags[r] else "0"),
                        )
                    )
                    + "\n"
                )
                if ev["as_front"][j]:
                    lo = b
                else:
                    hi = a
        _write(info_fh, "".join(rows))


def _make_name_editor(edits, rename, chunk, stats, adapter_names,
                      cut_lengths, final_ws, final_we, cut_chunk=None):
    """Per-read header-edit function for the trailing name modifiers
    (SuffixRemover, LengthTagModifier, PrefixSuffixAdder) and the
    --rename template, with host-path semantics and ordering.

    With --revcomp, `chunk` is the orientation-selected chunk (so
    {match_sequence} slices the bytes the match was found in) while
    `cut_chunk` stays the forward-parsed one: -u cuts ran before the
    orientation choice, so {cut_prefix}/{cut_suffix} show forward
    bytes (host order: UnconditionalCutter records them before the
    ReverseComplementer runs)."""
    buf = chunk.buf
    ss, sl = chunk.seq_start, chunk.seq_len
    if cut_chunk is None:
        cut_chunk = chunk
    gids = stats["last_adapter_gid"]
    is_rc = stats.get("is_rc")
    names = [name.encode("latin-1") for name in adapter_names]
    final_len = (final_we - final_ws).astype(np.int64)

    def adapter_name_of(i):
        g = int(gids[i])
        return names[g] if g >= 0 else b"no_adapter"

    steps = []
    for op in edits:
        if op[0] == "strip":
            suffix = op[1].encode("latin-1")

            def step(i, header, _sfx=suffix):
                if _sfx and header.endswith(_sfx):
                    return header[: -len(_sfx)]
                return header

        elif op[0] == "lentag":
            mod = op[1]
            tag = mod.length_tag

            def step(i, header, _mod=mod, _tag=tag):
                text = header.decode("latin-1")
                if _tag in text:
                    text = _mod.regex.sub(
                        f"{_tag}{int(final_len[i])}", text
                    )
                return text.encode("latin-1")

        else:  # presuf
            prefix, suffix = op[1], op[2]

            def step(i, header, _pre=prefix, _suf=suffix):
                name = adapter_name_of(i).decode("latin-1")
                return (
                    _pre.replace("{name}", name).encode("latin-1")
                    + header
                    + _suf.replace("{name}", name).encode("latin-1")
                )

        steps.append(step)

    if rename is not None:
        parts = [
            (is_field, text if is_field else text.encode("latin-1"))
            for is_field, text in rename._parts
        ]
        used = {text for is_field, text in rename._parts if is_field}
        geometry = (
            _last_match_geometry(stats, chunk.n_records)
            if "match_sequence" in used else None
        )
        need_cuts = bool({"cut_prefix", "cut_suffix"} & used)

        def render(i, header):
            values = {
                "header": header,
                "rc": b"rc" if is_rc is not None and is_rc[i] else b"",
            }
            if geometry is not None:
                has, a, b = geometry
                values["match_sequence"] = (
                    bytes(buf[ss[i] + a[i] : ss[i] + b[i]])
                    if has[i] else b""
                )
            fields = header.split(None, 1)
            values["id"] = fields[0] if fields else b""
            values["comment"] = fields[1] if len(fields) == 2 else b""
            if "adapter_name" in used:
                values["adapter_name"] = adapter_name_of(i)
            if need_cuts:
                cbuf, css = cut_chunk.buf, cut_chunk.seq_start
                start, end = 0, int(cut_chunk.seq_len[i])
                cut_prefix = cut_suffix = b""
                for length in cut_lengths:
                    if length > 0:
                        stop = min(start + length, end)
                        cut_prefix = bytes(
                            cbuf[css[i] + start : css[i] + stop]
                        )
                        start = stop
                    elif length < 0:
                        begin = max(end + length, start)
                        cut_suffix = bytes(
                            cbuf[css[i] + begin : css[i] + end]
                        )
                        end = begin
                values["cut_prefix"] = cut_prefix
                values["cut_suffix"] = cut_suffix
            return b"".join(
                values[text] if is_field else text
                for is_field, text in parts
            )

        steps.append(render)

    def edit(i, header):
        for step in steps:
            header = step(i, header)
        return header

    return edit


def _edit_headers(chunk, editor):
    """A ParsedChunk whose headers are rewritten by `editor`, appended
    to the original buffer so sequence/quality offsets stay valid and
    every assembler works unchanged."""
    from .io.chunks import ParsedChunk

    buf, hs, he = chunk.buf, chunk.head_start, chunk.head_end
    new_heads = [
        editor(i, bytes(buf[hs[i] : he[i]]))
        for i in range(chunk.n_records)
    ]
    head_bytes = b"".join(new_heads)
    lens = np.array([len(h) for h in new_heads], np.int64)
    ends = np.cumsum(lens)
    base = len(buf)
    combined = np.concatenate([buf, np.frombuffer(head_bytes, np.uint8)])
    return ParsedChunk(
        combined, base + ends - lens, base + ends, chunk.seq_start,
        chunk.seq_len, chunk.qual_start, has_cr=chunk.has_cr,
    )


def _zero_cap_chunk(chunk, quality_base):
    """ZeroCapper as a chunk transform (io.chunks.zero_cap_chunk)."""
    from .io.chunks import zero_cap_chunk

    return zero_cap_chunk(chunk, quality_base)


def _last_match_geometry(stats, n_records):
    """Per-read absolute [a, b) window coordinates of the LAST adapter
    match (later rounds overwrite earlier ones) plus a has-match mask,
    for the {match_sequence} rename field."""
    has = np.zeros(n_records, bool)
    a = np.zeros(n_records, np.int32)
    b = np.zeros(n_records, np.int32)
    for ev in stats.get("adapter_events", ()):
        reads = ev["reads"]
        has[reads] = True
        a[reads] = ev["ws"] + ev["qs"]
        b[reads] = ev["ws"] + ev["qe"]
    return has, a, b


def _paired_rename_headers(
    chunks, rename, gids_pair, names_pair, cuts_pair, geometry_pair,
    cut_chunks=None,
):
    """Renamed header chunks for both sides of a pair under
    PairedEndRenamer semantics (reference modifiers.py:700-803):
    {rn} is the read number, {r1.x}/{r2.x} address a specific side,
    bare fields default to the side being renamed, and the renamed
    IDs of a pair must still match (InvalidTemplate otherwise)."""
    from .io.chunks import ParsedChunk
    from .io.records import record_names_match
    from .modifiers import InvalidTemplate

    parts = [
        (is_field, text if is_field else text.encode("latin-1"))
        for is_field, text in rename._parts
    ]
    used = {text for is_field, text in rename._parts if is_field}
    plain_used = {field.split(".", 1)[-1] for field in used}
    need_split = bool({"id", "comment"} & plain_used) or True  # id check
    need_cuts = bool({"cut_prefix", "cut_suffix"} & plain_used)

    def side_values(chunk, i, gids, names, cuts, geometry, cut_chunk):
        buf = chunk.buf
        header = bytes(
            buf[chunk.head_start[i] : chunk.head_end[i]]
        )
        values = {"header": header}
        if "match_sequence" in plain_used:
            has, a, b = geometry
            ss0 = int(chunk.seq_start[i])
            values["match_sequence"] = (
                bytes(buf[ss0 + a[i] : ss0 + b[i]]) if has[i] else b""
            )
        if need_split:
            fields = header.split(None, 1)
            values["id"] = fields[0] if fields else b""
            values["comment"] = fields[1] if len(fields) == 2 else b""
        if "adapter_name" in plain_used:
            g = int(gids[i])
            values["adapter_name"] = (
                names[g].encode("latin-1") if g >= 0 else b"no_adapter"
            )
        if need_cuts:
            cbuf = cut_chunk.buf
            ss = int(cut_chunk.seq_start[i])
            start, end = 0, int(cut_chunk.seq_len[i])
            prefix = suffix = b""
            for length in cuts:
                if length > 0:
                    stop = min(start + length, end)
                    prefix = bytes(cbuf[ss + start : ss + stop])
                    start = stop
                elif length < 0:
                    begin = max(end + length, start)
                    suffix = bytes(cbuf[ss + begin : ss + end])
                    end = begin
            values["cut_prefix"] = prefix
            values["cut_suffix"] = suffix
        return values

    if cut_chunks is None:
        cut_chunks = chunks
    n = chunks[0].n_records
    new_heads = ([], [])
    for i in range(n):
        sides = tuple(
            side_values(chunks[k], i, gids_pair[k], names_pair[k],
                        cuts_pair[k], geometry_pair[k], cut_chunks[k])
            for k in (0, 1)
        )

        def render(rn):
            out = []
            for is_field, text in parts:
                if not is_field:
                    out.append(text)
                    continue
                prefix, dot, key = text.partition(".")
                if dot and prefix in ("r1", "r2"):
                    out.append(sides[0 if prefix == "r1" else 1][key])
                elif text == "rn":
                    out.append(str(rn).encode())
                else:
                    out.append(sides[rn - 1][text])
            return b"".join(out)

        name1, name2 = render(1), render(2)
        if not record_names_match(
            name1.decode("latin-1"), name2.decode("latin-1")
        ):
            new_id1 = name1.split(None, 1)[0].decode("latin-1") if name1 else ""
            new_id2 = name2.split(None, 1)[0].decode("latin-1") if name2 else ""
            old_id = sides[0]["id"].decode("latin-1")
            raise InvalidTemplate(
                "After renaming R1 and R2, their IDs are no longer "
                f"identical: '{new_id1}' != '{new_id2}'. "
                f"Original read ID: '{old_id}'. "
            )
        new_heads[0].append(name1)
        new_heads[1].append(name2)

    out_chunks = []
    for k in (0, 1):
        chunk = chunks[k]
        blob = b"".join(new_heads[k])
        lens = np.array([len(h) for h in new_heads[k]], np.int64)
        ends = np.cumsum(lens)
        base = len(chunk.buf)
        combined = np.concatenate(
            [chunk.buf, np.frombuffer(blob, np.uint8)]
        )
        out_chunks.append(
            ParsedChunk(
                combined, base + ends - lens, base + ends,
                chunk.seq_start, chunk.seq_len, chunk.qual_start,
                has_cr=chunk.has_cr,
            )
        )
    return out_chunks[0], out_chunks[1]


def _estimated_raw_size(name) -> int:
    """Estimated DECOMPRESSED input size. gzip stores the raw length
    mod 2^32 in the trailing ISIZE word — read it so a compressed
    FASTQ is judged by the work it contains, not its wire size (a
    20 MB .gz is ~70 MB of reads and firmly worth the device). For
    bz2/xz (no cheap length field) assume the ~4x text ratio."""
    size = os.path.getsize(name)
    lowered = os.fsdecode(name).lower()
    if lowered.endswith(".gz"):
        try:
            with open(name, "rb") as f:
                f.seek(-4, 2)
                isize = int.from_bytes(f.read(4), "little")
            # ISIZE is mod 2^32; trust it only when consistent with
            # the compressed size (>= 1x, <= 30x)
            if size <= isize <= size * 30:
                return isize
        except OSError:
            pass
        return size * 4
    if lowered.endswith((".bz2", ".xz", ".lzma", ".zst")):
        return size * 4
    return size


def _activation_allowed(infile) -> bool:
    env = os.environ.get("CUTADAPT_TPU_BATCH")
    if env in ("1", "require"):
        return True
    if env == "0":
        return False
    # auto mode: only when the input is large enough that device init
    # + (cached) compile amortizes against the saved host time; sized
    # on the estimated decompressed bytes
    name = getattr(infile, "name", None)
    try:
        if isinstance(name, (str, bytes)) and _estimated_raw_size(
            name
        ) >= AUTO_SIZE_THRESHOLD:
            return True
    except OSError:
        pass
    return False


def _setup_jax():
    import jax  # lazy; only on the accelerated path

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("CUTADAPT_TPU_CACHE", "/tmp/cutadapt_tpu_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    _maybe_init_distributed(jax)
    _setup_mesh(jax)


def _maybe_init_distributed(jax) -> None:
    """Opt-in multi-process jax runtime (CUTADAPT_TPU_DIST_COORDINATOR
    = 'host:port', plus _DIST_NPROCS/_DIST_PID when the platform can't
    auto-detect them). The multi-host design does NOT need this — each
    host runs an independent process over its input shard
    (parallel/multihost.py) and no cross-host collective runs during
    processing — but pod-slice TPU runtimes require every co-located
    process to join one jax.distributed world before any of them can
    initialize its local chips; this hook makes the shard contract
    usable there. Idempotent; failures fall back to single-process."""
    coord = os.environ.get("CUTADAPT_TPU_DIST_COORDINATOR")
    if not coord:
        return
    kwargs = {"coordinator_address": coord}
    nprocs = os.environ.get("CUTADAPT_TPU_DIST_NPROCS")
    pid = os.environ.get("CUTADAPT_TPU_DIST_PID")
    if nprocs is not None:
        kwargs["num_processes"] = int(nprocs)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            logger.warning(
                "jax.distributed.initialize failed (%s); continuing "
                "as an independent single process", e,
            )


def _setup_mesh(jax) -> None:
    """Shard DP dispatches over the visible devices. The engine is
    data-parallel over reads; CUTADAPT_TPU_DEVICES limits how many
    devices participate ('1' disables sharding, unset = all)."""
    from .batch_pipeline import set_shard_mesh

    want = os.environ.get("CUTADAPT_TPU_DEVICES", "all")
    if want == "1":
        set_shard_mesh(None)
        return
    devices = jax.devices()
    if want != "all":
        devices = devices[: int(want)]
    if len(devices) <= 1:
        set_shard_mesh(None)
        return
    from jax.sharding import Mesh

    set_shard_mesh(Mesh(np.array(devices), ("reads",)))


def _input_format(infile) -> Optional[str]:
    """'fastq' / 'fasta' when the batch path can parse this input."""
    from .io.files import detect_file_format, FileFormat

    try:
        detected = detect_file_format(infile)
    except Exception:
        return None
    if detected == FileFormat.FASTQ:
        return "fastq"
    if detected == FileFormat.FASTA:
        return "fasta"
    if detected == FileFormat.BAM:
        return "bam"
    return None


def try_run_accelerated(
    pipeline, infiles, progress, cores: int = 1
) -> Optional[Statistics]:
    """
    Run the pipeline through the batched engine if eligible; return the
    collected Statistics, or None if the configuration is not eligible
    (caller falls back to the host path). `cores` (the CLI's -j) sets
    the host worker count feeding the device — see _pooled_drive.
    """
    from .pipeline import PairedEndPipeline, SingleEndPipeline

    if isinstance(pipeline, SingleEndPipeline):
        return _run_single(pipeline, infiles, progress, cores)
    if isinstance(pipeline, PairedEndPipeline):
        return _run_paired(pipeline, infiles, progress, cores)
    return _fallback(f"unsupported pipeline type {type(pipeline).__name__}")


def _run_single(
    pipeline, infiles, progress, cores: int = 1
) -> Optional[Statistics]:
    if infiles.interleaved or len(infiles._files) != 1:
        return _fallback("single-end pipeline over interleaved/multi-file input")
    infile = infiles._files[0]
    if not _activation_allowed(infile):
        return None  # auto-mode policy decline (small input), not a fallback
    fmt = _input_format(infile)
    if fmt is None:
        return _fallback("input is not a parseable FASTQ/FASTA/BAM file")
    fasta_in = fmt == "fasta"
    translated = _translate_single(pipeline, fasta=fasta_in)
    if translated is None:
        return _fallback(
            "a modifier/step combination the engine does not express "
            "(single-end; run with --debug to see the gate)"
        )
    stages, filters, cutter = (
        translated.stages, translated.filters, translated.cutter
    )
    sink, rename, side = translated.sink, translated.rename, translated.side
    name_edits, zero_cap = translated.name_edits, translated.zero_cap
    _setup_jax()

    from .io.chunks import (
        assemble_fasta_window,
        assemble_window,
        parse_bam_chunk,
        parse_fasta_chunk,
        parse_fastq_chunk,
    )
    from .batch_pipeline import BatchPipelineEngine
    from .io.fastq import FastaWriter, read_chunks

    engine = BatchPipelineEngine(
        stages, filters, want_ref_coords=side["wildcard"] is not None,
        qual_cap_base=zero_cap,
    )

    from .steps import Demultiplexer

    def out_of(writer):
        """(file, writes_fasta) for one record writer."""
        return (writer._file, isinstance(writer, FastaWriter))

    demux = sink if isinstance(sink, Demultiplexer) else None
    out_file, out_fasta = (None, False) if demux else out_of(sink.writer)
    filter_files = [
        out_of(f.step._writer) if f.step._writer is not None else None
        for f in filters
    ]
    if demux is not None:
        # gid (flattened adapter position) -> output file
        stage = next(s for s in stages if hasattr(s, "flat_adapters"))
        demux_files = [
            out_of(demux._writers[a.name]) for a in stage.flat_adapters
        ]
        untrimmed_file = (
            out_of(demux._untrimmed_writer)
            if demux._untrimmed_writer is not None else None
        )
    n = 0
    total_bp = 0

    assemble = _stages_assembler(stages)

    if rename is not None or name_edits:
        from .batch_pipeline import CutStage

        adapter_stage = next(
            (s for s in stages if hasattr(s, "flat_adapters")), None
        )
        rename_names = (
            [a.name for a in adapter_stage.flat_adapters]
            if adapter_stage is not None else []
        )
        rename_cuts = [
            s.length for s in stages if isinstance(s, CutStage)
        ]
        if any(f.kind == "casava_filtered" for f in filters):
            # host order is modifiers before steps, so the casava
            # filter must read the EDITED headers: hand the engine a
            # hook that edits before its filter pass (emit() then
            # picks the edited chunk up from stats). With --revcomp
            # the edits must in turn see the chosen orientation's
            # ' rc' suffix, so the hook selects the orientation chunk
            # first (the hook runs after the rc stage — stats already
            # carry is_rc)
            def _prefilter_edit(chunk, stats, ws, we):
                original = chunk
                if "is_rc" in stats:
                    rc = stats["rc_chunk"]
                    chunk = _select_paired_chunk(
                        chunk, 0, rc, len(chunk.buf),
                        np.concatenate([chunk.buf, rc.buf]),
                        stats["is_rc"], rc_stage_obj.suffix or "",
                    )
                    stats["rc_selected"] = True
                return _edit_headers(
                    chunk,
                    _make_name_editor(
                        name_edits, rename, chunk, stats, rename_names,
                        rename_cuts, ws, we, cut_chunk=original,
                    ),
                )

            engine.pre_filter_edit = _prefilter_edit

    transform_mode = {"mask": 1, "lowercase": 2}.get(
        _transform_action(stages)
    )
    rc_stage_obj = _revcomp_stage(stages)
    # with name edits / --rename / --zero-cap after --revcomp, the
    # orientation choice must happen BEFORE those edits (host modifier
    # order): select the chosen-orientation chunk once per batch in
    # emit() instead of using the suffix-at-write rc assembler
    rc_select = rc_stage_obj is not None and (
        rename is not None or name_edits or zero_cap is not None
        or any(side.values()) or transform_mode is not None
    )

    def render(chunk, ws, we, mask, stats, writes_fasta):
        if writes_fasta:
            if transform_mode is not None:
                from .io.chunks import assemble_fasta_transform

                rs, re_ = stats["remainder"]
                return assemble_fasta_transform(
                    chunk, ws, we, rs, re_, mask, transform_mode
                )
            if rc_stage_obj is not None and not stats.get("rc_selected"):
                # pick each read's chosen orientation (the rc copy
                # shares all offsets), appending the rc name suffix —
                # built once per chunk (demux calls render per output
                # file, so cache the selected chunk in the stats)
                sel = stats.get("rc_fasta_selected")
                if sel is None:
                    rc = stats["rc_chunk"]
                    sel = _select_paired_chunk(
                        chunk, 0, rc, len(chunk.buf),
                        np.concatenate([chunk.buf, rc.buf]),
                        stats["is_rc"], rc_stage_obj.suffix or "",
                    )
                    stats["rc_fasta_selected"] = sel
                return assemble_fasta_window(sel, ws, we, mask)
            return assemble_fasta_window(chunk, ws, we, mask)
        if stats.get("rc_selected"):
            if transform_mode is not None:
                # the remainder coordinates are per-read relative, so
                # they hold against the orientation-selected chunk
                from . import native as _native

                rs, re_ = stats["remainder"]
                return _native.assemble_fastq_transform(
                    chunk.buf, chunk.head_start, chunk.head_end,
                    chunk.seq_start, chunk.qual_start,
                    ws, we, rs, re_, mask, transform_mode,
                )
            return assemble_window(chunk, ws, we, mask)
        return assemble(chunk, ws, we, mask, stats)

    side_stage = next(
        (s for s in stages if hasattr(s, "flat_adapters")), None
    )

    reducer = _make_stats_reducer()

    def emit(pending):
        nonlocal n, total_bp
        ws, we, keep, stats = engine.collect(pending)
        chunk = stats.pop("edited_chunk", None)
        if chunk is None:
            chunk = pending.parsed
            if rc_select and "is_rc" in stats:
                rc = stats["rc_chunk"]
                chunk = _select_paired_chunk(
                    chunk, 0, rc, len(chunk.buf),
                    np.concatenate([chunk.buf, rc.buf]),
                    stats["is_rc"], rc_stage_obj.suffix or "",
                )
                stats["rc_selected"] = True
            if rename is not None or name_edits:
                chunk = _edit_headers(
                    chunk,
                    _make_name_editor(
                        name_edits, rename, chunk, stats, rename_names,
                        rename_cuts, ws, we, cut_chunk=pending.parsed,
                    ),
                )
        precap = chunk
        if zero_cap is not None:
            chunk = _zero_cap_chunk(chunk, zero_cap)
        if any(side.values()):
            _emit_side_files(
                side["rest"], side["info"], side["wildcard"],
                chunk, stats, side_stage, ws, we, precap_chunk=precap,
                rc_flags=(
                    stats.get("is_rc") if rc_stage_obj is not None
                    else None
                ),
            )
        written_lengths = None
        if demux is None:
            _write(
                out_file, render(chunk, ws, we, keep, stats, out_fasta)
            )
            written_lengths = sink._statistics
        else:
            gids = stats["last_adapter_gid"]
            dl = demux._statistics
            lens_out = we - ws
            # merge gids sharing one output file (duplicate adapter
            # names) so records stay in input order within each file
            per_file = {}
            for gid, out in enumerate(demux_files):
                mask = keep & (gids == gid)
                if id(out[0]) in per_file:
                    prev = per_file[id(out[0])]
                    per_file[id(out[0])] = (out, prev[1] | mask)
                else:
                    per_file[id(out[0])] = (out, mask)
            if untrimmed_file is not None:
                per_file.setdefault(
                    id(untrimmed_file[0]), (untrimmed_file, None)
                )
                untr = keep & (gids == -1)
                ff, mask = per_file[id(untrimmed_file[0])]
                per_file[id(untrimmed_file[0])] = (
                    ff, untr if mask is None else (mask | untr)
                )
            else:
                _record_filtered(demux, keep & (gids == -1), reducer)
            for (ff, writes_fasta), mask in per_file.values():
                if mask is not None and mask.any():
                    _write(
                        ff, render(chunk, ws, we, mask, stats, writes_fasta)
                    )
                    _record_written(
                        dl, 1, reducer, values=lens_out[mask]
                    )
        # routed filter outputs (--too-short-output etc.): records a
        # filter dropped, in input order, with their state at drop time
        for out, newly in zip(filter_files, stats["filter_dropped_masks"]):
            if out is not None and newly.any():
                _write(out[0], render(chunk, ws, we, newly, stats, out[1]))
        if reducer is None:
            with _stats_lock():
                for f, count in zip(
                    filters, stats.get("filter_counts", ())
                ):
                    f.step._filtered += count
        else:
            for f, newly in zip(filters, stats["filter_dropped_masks"]):
                _record_filtered(f.step, newly, reducer)
        with _stats_lock():
            total_bp += _apply_side_stats(
                stats, stages, cutter, written_lengths, reducer
            )
            n += stats["n"]
            if progress is not None:
                progress.update(stats["n"])

    if fasta_in:
        def producer():
            line = 0
            for data in read_chunks(infile, _chunk_bytes()):
                yield parse_fasta_chunk(data, first_line=line)
                line += int(
                    (np.frombuffer(data, np.uint8) == 10).sum()
                )
        chunks_iter = producer()
    elif fmt == "bam":
        # qualities may be absent per record (0xFF); that is an error
        # exactly when some output actually needs them
        fasta_outputs = [f[1] for f in filter_files if f is not None]
        if demux is None:
            fasta_outputs.append(out_fasta)
        else:
            fasta_outputs += [writes for _, writes in demux_files]
            if untrimmed_file is not None:
                fasta_outputs.append(untrimmed_file[1])
        quals_required = not all(fasta_outputs) or side["info"] is not None
        chunks_iter = (
            parse_bam_chunk(data, quals_required)
            for data in read_chunks(infile, _chunk_bytes())
        )
    else:
        chunks_iter = (
            parse_fastq_chunk(data)
            for data in read_chunks(infile, _chunk_bytes())
        )
    _drive(chunks_iter, engine.submit, emit, cores)
    if reducer is not None:
        reducer.fold()  # one D2H of the psum'd counters
    infiles.close()
    if progress is not None:
        progress.close()
    return Statistics().collect(
        n, total_bp, None, pipeline._modifiers, pipeline._steps
    )


# --- paired-end --------------------------------------------------------------


def _translate_paired(pipeline, interleaved=False, fasta=False):
    """Map an eligible paired-end pipeline to per-side stage lists plus
    pair filters, or None. With FASTA input (`fasta`), outputs must be
    FASTA too (a FASTQ writer would raise on the host path, which must
    stay in charge of that error) and quality-reading stages/filters
    keep the pipeline on the host."""
    from .modifiers import PairedEndModifierWrapper
    from .steps import PairedEndFilter, PairedEndSink
    from .io.fastq import (
        FastqWriter,
        InterleavedSequenceWriter,
        PairedSequenceWriter,
    )

    def writer_ok(w):
        from .io.fastq import FastaWriter

        sub_classes = (FastaWriter,) if fasta else (FastqWriter, FastaWriter)
        if isinstance(w, PairedSequenceWriter):
            return all(
                isinstance(x, sub_classes)
                for x in (w._writer1, w._writer2)
            )
        if isinstance(w, InterleavedSequenceWriter):
            # allowed for both input arities: the drive interleaves the
            # per-side chunks when the input came as two files
            return isinstance(w._writer, sub_classes)
        return False

    from .batch_pipeline import AdapterStage, adapter_kind, AdapterTask
    from .modifiers import (
        LengthTagModifier,
        PairedAdapterCutter,
        PairedEndRenamer,
        PairedReverseComplementer,
        PrefixSuffixAdder,
        SuffixRemover,
        ZeroCapper,
    )

    edit_types = (SuffixRemover, LengthTagModifier, PrefixSuffixAdder,
                  ZeroCapper)

    modifiers = list(pipeline._modifiers)
    rename = None
    if modifiers and type(modifiers[-1]) is PairedEndRenamer:
        rename = modifiers.pop()
        rename_fields = {
            text.split(".", 1)[-1]
            for is_field, text in rename._parts if is_field
        }

    stages1, stages2 = [], []
    cutters = [None, None]
    pair_stage = None
    rc_pair = None
    post_stages = [[], []]  # host stages after the paired-revcomp swap
    side_edits = [[], []]  # trailing per-side name edits
    zero_caps = [None, None]
    for mod in modifiers:
        if pair_stage is not None:
            return None  # --pair-adapters must be the last modifier
        if isinstance(mod, PairedReverseComplementer):
            if rc_pair is not None or cutters != [None, None]:
                return None
            rc_stages = []
            for c in (mod.adapter_cutter1, mod.adapter_cutter2):
                if c is None:
                    rc_stages.append(None)
                    continue
                if c.action not in ("trim", None, "mask", "lowercase"):
                    return None
                if c.action in ("mask", "lowercase"):
                    from . import native

                    if not native.AVAILABLE:
                        return None  # transform assembly is native-only
                tasks = _translate_tasks(c)
                if tasks is None:
                    return None
                rc_stages.append(
                    AdapterStage(tasks, times=c.times, modifier=c,
                                 action=c.action)
                )
            rc_pair = (rc_stages[0], rc_stages[1], mod)
            continue
        if isinstance(mod, PairedAdapterCutter):
            if cutters != [None, None] or rc_pair is not None:
                return None
            if mod.action not in ("trim", None, "retain"):
                return None
            tasks = [[], []]
            for side, adapters in enumerate(
                zip(*mod._adapter_pairs)
            ):
                for i, a in enumerate(adapters):
                    kind = adapter_kind(a)
                    if kind is None or kind in (
                        "linked", "indexed_prefix", "indexed_suffix"
                    ):
                        return None
                    tasks[side].append(AdapterTask(a, kind, i))
            pair_stage = (tasks[0], tasks[1], mod)
            continue
        if not isinstance(mod, PairedEndModifierWrapper):
            return None
        for side, m in enumerate((mod._modifier1, mod._modifier2)):
            if m is None:
                continue
            if isinstance(m, edit_types):
                if isinstance(m, SuffixRemover):
                    side_edits[side].append(("strip", m.suffix))
                elif isinstance(m, LengthTagModifier):
                    side_edits[side].append(("lentag", m))
                elif isinstance(m, PrefixSuffixAdder):
                    side_edits[side].append(("presuf", m.prefix, m.suffix))
                else:
                    zero_caps[side] = m.quality_base
                continue
            if side_edits[side] or zero_caps[side] is not None:
                return None  # window stage after a name edit
            t = _translate_modifier(
                m, cutters[side] is not None or rc_pair is not None
            )
            if t is None:
                return None
            stage, stage_cutter = t
            if rc_pair is not None:
                # stages after the swap apply to the mixed output slots
                if stage_cutter is not None:
                    return None
                if rc_pair[side] is not None and rc_pair[side].action in (
                    "mask", "lowercase"
                ):
                    from .batch_pipeline import NEndStage, PolyAStage

                    # sequence-reading post stages must see the
                    # TRANSFORMED bytes (host order: the rc cutter
                    # masks/lowercases first, then --trim-n/--poly-a
                    # run — 'n'/masked-N bytes behave differently);
                    # the engine's window stages read original bytes,
                    # so these combinations stay host-path
                    if isinstance(stage, (NEndStage, PolyAStage)):
                        return None
                post_stages[side].append(stage)
                continue
            if stage_cutter is not None:
                cutters[side] = stage_cutter
            (stages1 if side == 0 else stages2).append(stage)
    from .batch_pipeline import AdapterStage

    for st in (stages1, stages2):
        rc_side = _revcomp_stage(st) is not None
        has_special = _transform_action(st) is not None or rc_side
        # later stages would see un-transformed / forward bytes
        if has_special and not isinstance(st[-1], AdapterStage):
            return None
        # (transforms with interleaved input are fine: renders and the
        # interleaved writer read the remainder from the stats; per-
        # side rc is fine too — the drive materializes the selected
        # chunk, so the combined chunk is rebuilt from it)
    if fasta:
        from .batch_pipeline import NextseqStage, QualityStage

        # FASTA carries no qualities; the host path owns the error
        if any(
            isinstance(s, (QualityStage, NextseqStage))
            for st in (stages1, stages2) for s in st
        ):
            return None
        if any(z is not None for z in zero_caps):
            return None
        for st in (stages1, stages2):
            rc_st = _revcomp_stage(st)
            if rc_st is not None:
                # FASTA chunks alias quality offsets to the sequence:
                # the rc copy must complement sequences only
                rc_st.has_quals = False

    from .steps import (
        CombinatorialDemultiplexer,
        InfoFileWriter,
        PairedDemultiplexer,
        PairedInfoFileWriter,
        PairedSingleEndStep,
        RestFileWriter,
        WildcardFileWriter,
    )

    def _linked_on(st):
        return any(
            t.kind == "linked"
            for x in st if hasattr(x, "tasks")
            for t in x.tasks
        )

    pair_filters = []  # (step, kind1/None, thr1, kind2/None, thr2, mode)
    sink = None
    side_files = {"rest": None, "info": None, "wildcard": None, "info2": None}
    for step in pipeline._steps:
        inner = step._step if isinstance(step, PairedSingleEndStep) else None
        if isinstance(
            inner, (RestFileWriter, InfoFileWriter, WildcardFileWriter)
        ) or isinstance(step, PairedInfoFileWriter):
            # side-channel rows come from R1 (and R2 for --info-file
            # with two files) match events: reference step order puts
            # them before any filter, and they need plain (non-linked)
            # matching on the sides they read (mask/lowercase actions
            # record identical match geometry and the rows never read
            # transformed bytes, so they pass). Paired --revcomp rides
            # too: the emit path reproduces the reference's info-row
            # quirk — InfoFileWriter walks info.original_read (the
            # PHYSICAL side's read) reverse-complemented while the
            # matches came from the swapped partner (reference
            # steps.py:233-247 + modifiers.py's swap keeps infos with
            # their slots) — via _rc_walk_chunk; rest/wildcard rows
            # read the matched read's own bytes, which the slot
            # chunks carry.
            if pair_filters or sink is not None:
                return None
            # (per-side rc rides like the single-end path: rows slice
            # the orientation-selected chunk the drive materializes,
            # and info rows carry its is_rc flags in the trailing
            # column)

            def _linked_rc(s):
                return (
                    rc_pair is not None
                    and rc_pair[s] is not None
                    and any(t.kind == "linked" for t in rc_pair[s].tasks)
                )

            if (_linked_on(stages1) or _linked_rc(0)) and not (
                isinstance(step, PairedInfoFileWriter)
                or isinstance(inner, InfoFileWriter)
            ):
                # reference rest()/wildcards() have no linked
                # implementation; linked info rows work
                return None
            if isinstance(step, PairedInfoFileWriter):
                if fasta:
                    return None  # info rows include quality columns
                if (
                    side_files["info"] is not None
                    or side_files["info2"] is not None
                ):
                    return None
                side_files["info"] = step._info_writer1._file
                side_files["info2"] = step._info_writer2._file
            elif isinstance(inner, InfoFileWriter):
                if fasta or side_files["info"] is not None:
                    return None
                side_files["info"] = inner._file
            elif isinstance(inner, WildcardFileWriter):
                if side_files["wildcard"] is not None:
                    return None
                side_files["wildcard"] = inner._file
            else:
                if side_files["rest"] is not None:
                    return None
                side_files["rest"] = inner._file
            continue
        if isinstance(step, PairedEndSink):
            if sink is not None or not writer_ok(step.writer):
                return None
            sink = step
            continue
        if isinstance(step, (PairedDemultiplexer, CombinatorialDemultiplexer)):
            if sink is not None or interleaved:
                return None
            # routing needs adapter matches: R1 decides for paired
            # demux (the winning pair index with --pair-adapters,
            # the chosen orientation's match with paired --revcomp),
            # both sides for combinatorial
            if isinstance(step, CombinatorialDemultiplexer):
                if pair_stage is not None:
                    return None
                if rc_pair is not None:
                    if rc_pair[0] is None or rc_pair[1] is None:
                        return None
                elif cutters[0] is None or cutters[1] is None:
                    return None
            elif (
                cutters[0] is None and pair_stage is None
                and (rc_pair is None or rc_pair[0] is None)
            ):
                return None
            # (per-side rc routes fine: last_adapter_gid carries the
            # chosen orientation's match and the renders read the
            # materialized selected chunk)
            writers = list(step._writers.values())
            untrimmed = getattr(step, "_untrimmed_writer", None)
            if untrimmed is not None:
                writers.append(untrimmed)
            if not all(writer_ok(w) for w in writers):
                return None
            sink = step
            continue
        if sink is not None or not isinstance(step, PairedEndFilter):
            return None
        if step.writer is not None and not writer_ok(step.writer):
            return None
        t1 = (
            _translate_predicate(step.predicate1)
            if step.predicate1 is not None
            else None
        )
        t2 = (
            _translate_predicate(step.predicate2)
            if step.predicate2 is not None
            else None
        )
        if step.predicate1 is not None and t1 is None:
            return None
        if step.predicate2 is not None and t2 is None:
            return None
        if t1 is None and t2 is None:
            return None
        if fasta and any(
            t is not None and t[0] in (
                "too_many_expected_errors", "too_high_average_error_rate",
            )
            for t in (t1, t2)
        ):
            return None  # quality-based predicates need FASTQ
        pair_filters.append((step, t1, t2, step._pair_filter_mode))
    if sink is None:
        return None
    # (content predicates on a revcomped side are fine: the paired
    # drive materializes each side's chosen-orientation chunk before
    # the pair filters are evaluated, so filter_condition reads the
    # post-modifier bytes. mask/lowercase actions are fine too:
    # _pair_condition adjusts the mask-mode N count via the remainder
    # interval, and neither transform touches the quality string.)
    # (interleaved writers are fine with per-side rc as well: the
    # combined chunk is rebuilt from the orientation-selected per-side
    # chunks whenever a side's chunk was replaced)
    # name/quality edits after a per-side rc stage see the selected
    # chunk with its ' rc' suffix — the host's modifier order
    if rename is not None:
        # mask/lowercase actions are fine with --rename (with or
        # without the paired-revcomp swap or per-side rc): the rename
        # fields slice the chunk's match-time bytes ({match_sequence}
        # is the match-time sequence, pre-transform, like the host's
        # match objects — for rc-chosen reads the selected chunk IS
        # the match-time read) and the transform happens at write
        # time, reading the remainder by per-read relative coordinates
        # that hold against the renamed chunk.
        rename_scan = list((stages1, stages2))
        if rc_pair is not None:
            rename_scan.append([s for s in rc_pair[:2] if s is not None])
        if "match_sequence" in rename_fields and any(
            t.kind == "linked"
            for st in rename_scan
            for x in st if hasattr(x, "tasks")
            for t in x.tasks
        ):
            return None
        if {"cut_prefix", "cut_suffix"} & rename_fields:
            from .batch_pipeline import CutStage

            for st in (stages1, stages2):
                past_cuts = False
                for stage in st:
                    if isinstance(stage, CutStage):
                        if past_cuts:
                            return None
                    else:
                        past_cuts = True
    return PairedTranslation(
        stages1, stages2, cutters, pair_filters, sink, pair_stage,
        rc_pair, post_stages, rename, side_edits, zero_caps, side_files,
    )


def _apply_match_windows(task, action, ws, we, hit, qs, qe):
    """Window update for one task's matches (same math as the engine's
    _adapter_round apply phase). Returns per-hit event fields."""
    cur_len = (we[hit] - ws[hit]).astype(np.int32)
    if task.trim == "before":
        as_front = np.ones(len(hit), bool)
    elif task.trim == "after":
        as_front = np.zeros(len(hit), bool)
    else:  # anywhere
        as_front = qs == 0
    removed = np.where(as_front, qe, cur_len - qs)
    adj_rel = ws[hit] + qs - 1
    if action == "retain":
        fr = hit[as_front]
        ws[fr] = ws[fr] + qs[as_front]
        bk = hit[~as_front]
        we[bk] = ws[bk] + qe[~as_front]
    elif action == "trim":
        fr = hit[as_front]
        ws[fr] = ws[fr] + qe[as_front]
        bk = hit[~as_front]
        we[bk] = ws[bk] + qs[~as_front]
    # action None: windows untouched
    return as_front, removed, adj_rel


def _pair_match(engines, chunks, windows, pair_stage, stats_pair=None):
    """--pair-adapters: adapter pair i matches iff it matches both
    reads; the pair with the highest total score wins (ties: fewer
    total errors, then earlier pair) — PairedAdapterCutter semantics
    (reference modifiers.py:412-503). Mutates both sides' windows;
    returns the matched mask. With `stats_pair`, each side's match
    events (with geometry) are recorded for the side-channel writers."""
    tasks_by_side, mod = pair_stage[:2], pair_stage[2]
    n = chunks[0].n_records
    n_pairs = len(tasks_by_side[0])
    results = [[None] * n_pairs, [None] * n_pairs]
    disp = [[None] * n_pairs, [None] * n_pairs]
    for side in (0, 1):
        eng, chunk = engines[side], chunks[side]
        ws, we = windows[side]
        lens = (we - ws).astype(np.int32)
        width = eng._bucket_length(int(lens.max()) if n else 0)
        starts = (chunk.seq_start + ws).astype(np.int64)
        for t in range(n_pairs):
            disp[side][t] = (
                eng._dispatch_windows(
                    tasks_by_side[side][t], chunk, starts, lens, width
                ),
                lens,
            )
    for side in (0, 1):
        eng = engines[side]
        for t in range(n_pairs):
            (sel, futures), lens = disp[side][t]
            task = tasks_by_side[side][t]
            f = np.zeros(n, bool)
            qs = np.zeros(n, np.int32)
            qe = np.zeros(n, np.int32)
            er = np.zeros(n, np.int32)
            sc = np.zeros(n, np.int32)
            as_ = np.zeros(n, np.int32)
            ae_ = np.zeros(n, np.int32)
            if len(sel):
                if eng.want_ref_coords:
                    # --wildcard-file rows need the adapter-side span
                    (ff, fqs, fqe, fer, fsc, fas,
                     fae) = eng._fetch_windows(
                        task, sel, futures, lens, ref_coords=True
                    )
                    as_[sel] = fas
                    ae_[sel] = fae
                else:
                    ff, fqs, fqe, fer, fsc = eng._fetch_windows(
                        task, sel, futures, lens
                    )
                f[sel] = ff
                qs[sel] = fqs
                qe[sel] = fqe
                er[sel] = fer
                sc[sel] = fsc
            results[side][t] = (f, qs, qe, er, sc, as_, ae_)

    best = np.full(n, -1, np.int32)
    best_sc = np.zeros(n, np.int32)
    best_er = np.zeros(n, np.int32)
    for t in range(n_pairs):
        f1, _, _, er1, sc1 = results[0][t][:5]
        f2, _, _, er2, sc2 = results[1][t][:5]
        ok = f1 & f2
        sc = sc1 + sc2
        er = er1 + er2
        better = ok & (
            (best == -1) | (sc > best_sc) | ((sc == best_sc) & (er < best_er))
        )
        best[better] = t
        best_sc[better] = sc[better]
        best_er[better] = er[better]

    matched = best >= 0
    if stats_pair is not None:
        # demux routing / {adapter_name} rename read the winning pair
        # index per side (-1 where no pair matched)
        stats_pair[0]["last_adapter_gid"] = best
        stats_pair[1]["last_adapter_gid"] = best
    with _stats_lock():  # pooled drive: emit() runs on worker threads
        mod.with_adapters += int(matched.sum())
    for side in (0, 1):
        chunk = chunks[side]
        ws, we = windows[side]
        for t in range(n_pairs):
            hit = np.flatnonzero(matched & (best == t))
            if len(hit) == 0:
                continue
            task = tasks_by_side[side][t]
            _, qs, qe, er, _, as_a, ae_a = results[side][t]
            ws_ev, we_ev = ws[hit].copy(), we[hit].copy()
            as_front, removed, adj_rel = _apply_match_windows(
                task, mod.action, ws, we, hit, qs[hit], qe[hit]
            )
            if stats_pair is not None:
                stats_pair[side].setdefault("adapter_events", []).append(
                    dict(task=t, reads=hit, removed=removed,
                         errors=er[hit], as_front=as_front,
                         adjacent=np.zeros(len(hit), np.uint8),
                         sub=np.zeros(len(hit), np.int32),
                         qs=qs[hit], qe=qe[hit], ws=ws_ev, we=we_ev,
                         astart=as_a[hit], astop=ae_a[hit])
                )
            astats = mod.adapter_statistics[side][task.adapter]
            adj_pos = chunk.seq_start[hit] + adj_rel
            adjacent = np.where(
                ~as_front & (qs[hit] > 0),
                chunk.buf[np.clip(adj_pos, 0, None)], 0,
            )
            e_hit = er[hit]
            if as_front.any():
                _record_removals(
                    astats.front, removed[as_front], e_hit[as_front]
                )
            bk = ~as_front
            if bk.any():
                _record_removals(astats.back, removed[bk], e_hit[bk])
                _record_adjacent(astats.back, adjacent[bk])
    return matched


def _interleave_chunks(c1, c2):
    """A synthetic ParsedChunk alternating the records of two
    same-length chunks (R1 in even, R2 in odd slots). Used by the
    interleaved writer when caps/edits replaced the per-side chunks,
    so the originally-parsed combined chunk no longer has the bytes
    to write."""
    from .io.chunks import ParsedChunk

    off = len(c1.buf)
    buf = np.concatenate([c1.buf, c2.buf])
    n = c1.n_records

    def ilv(a1, a2, shift=0):
        out = np.empty(2 * n, a1.dtype)
        out[0::2] = a1
        out[1::2] = a2 + shift
        return out

    return ParsedChunk(
        buf,
        ilv(c1.head_start, c2.head_start, off),
        ilv(c1.head_end, c2.head_end, off),
        ilv(c1.seq_start, c2.seq_start, off),
        ilv(c1.seq_len, c2.seq_len),
        ilv(c1.qual_start, c2.qual_start, off),
        has_cr=c1.has_cr or c2.has_cr,
    )


def _select_paired_chunk(
    chunk_a, off_a, chunk_b, off_b, combined, swap, suffix
):
    """A synthetic ParsedChunk over the concatenated pair buffers that
    takes record i from chunk_b when swap[i] (R1/R2 exchange for the
    paired reverse-complement modifier), appending `suffix` to the
    headers of swapped records. off_a/off_b locate each source buffer
    inside `combined`."""
    from .io.chunks import ParsedChunk, _scatter_ranges

    hs = np.where(swap, chunk_b.head_start + off_b, chunk_a.head_start + off_a)
    he = np.where(swap, chunk_b.head_end + off_b, chunk_a.head_end + off_a)
    ss = np.where(swap, chunk_b.seq_start + off_b, chunk_a.seq_start + off_a)
    sl = np.where(swap, chunk_b.seq_len, chunk_a.seq_len).astype(np.int32)
    qs = np.where(swap, chunk_b.qual_start + off_b, chunk_a.qual_start + off_a)
    buf = combined
    if suffix and swap.any():
        sfx = np.frombuffer(suffix.encode("latin-1"), np.uint8)
        base_len = he - hs
        new_len = base_len + np.where(swap, len(sfx), 0)
        ends = np.cumsum(new_len)
        new_hs = ends - new_len
        heads = np.empty(int(ends[-1]) if len(ends) else 0, np.uint8)
        _scatter_ranges(heads, new_hs, hs, base_len, combined)
        tail = new_hs + base_len
        for k, byte in enumerate(sfx):
            heads[(tail + k)[swap]] = byte
        base = len(combined)
        buf = np.concatenate([combined, heads])
        hs, he = base + new_hs, base + ends
    return ParsedChunk(buf, hs, he, ss, sl, qs)


def _rc_walk_chunk(parsed, use_rc):
    """Info-row walk buffer for paired --revcomp: the reference's
    InfoFileWriter slices ``info.original_read.reverse_complement()``
    for rc-chosen pairs (reference steps.py:233-247) — the PHYSICAL
    side's as-parsed read, reverse-complemented with qualities
    reversed — even though the match coordinates came from the swapped
    partner. Forward-chosen rows keep the as-parsed bytes. Offsets are
    shared with `parsed` (lengths are unchanged)."""
    if not use_rc.any():
        return parsed
    from . import native
    from .batch_pipeline import _complement_table
    from .io.chunks import ParsedChunk

    buf = parsed.buf.copy()
    idx = np.flatnonzero(use_rc)
    native.reverse_complement_records(
        buf, parsed.seq_start[idx], parsed.seq_len[idx],
        parsed.qual_start[idx], _complement_table(),
    )
    return ParsedChunk(
        buf, parsed.head_start, parsed.head_end, parsed.seq_start,
        parsed.seq_len, parsed.qual_start, has_cr=parsed.has_cr,
    )


def _filter_events(events, mask):
    """Subset per-match event rows to reads where `mask` holds (the
    chosen-orientation selection for one slot of the paired-revcomp
    modifier). Scalar fields (task index, linked-phase suffix) pass
    through; per-row arrays are filtered in place-order."""
    out = []
    for ev in events:
        sel = mask[ev["reads"]]
        if not sel.any():
            continue
        n = len(ev["reads"])
        out.append({
            k: (v[sel] if isinstance(v, np.ndarray) and len(v) == n else v)
            for k, v in ev.items()
        })
    return out


def _run_rc_pair(engines, rc_pair, chunks, windows, want_events=False):
    """--revcomp on paired data: match (R1->cutter1, R2->cutter2) and
    the swapped orientation, keep whichever scores strictly higher
    (PairedReverseComplementer semantics, reference modifiers.py:
    311-405). Returns per-slot synthetic chunks, windows and matched
    masks; credits adapter/rc statistics for the winning orientation.

    With `want_events`, the trailing tuple element carries per-slot
    chosen-orientation match events (for --rest-file / --info-file /
    --wildcard-file rows) plus the per-pair is_rc flags.
    """
    stage1, stage2, mod = rc_pair
    c1, c2 = chunks
    (ws1, we1), (ws2, we2) = windows
    B = c1.n_records
    engine = engines[0]

    def run(stage, chunk, ws, we):
        if stage is None:
            return (
                np.zeros(B, bool), [], ws.copy(), we.copy(),
                np.zeros(B, np.int32), np.full(B, -1, np.int32),
            )
        ws, we = ws.copy(), we.copy()
        width = engine._bucket_length(
            int((we - ws).max()) if B else 0
        )
        gid = np.full(B, -1, np.int32)
        score = np.zeros(B, np.int32)
        matched, events = engine._run_rounds(
            stage, chunk, ws, we, width, None, gid, score
        )
        return matched, events, ws, we, score, gid

    # orientation A: slots follow the physical sides; B: sides swapped
    a1 = run(stage1, c1, ws1, we1)
    a2 = run(stage2, c2, ws2, we2)
    b1 = run(stage1, c2, ws2, we2)
    b2 = run(stage2, c1, ws1, we1)
    use_rc = (b1[4] + b2[4]) > (a1[4] + a2[4])

    with _stats_lock():  # pooled drive: emit() runs on worker threads
        mod.reverse_complemented += int(use_rc.sum())
        for stage, straight, swapped in ((stage1, a1, b1), (stage2, a2, b2)):
            if stage is None:
                continue
            cutter = stage.modifier
            matched = np.where(use_rc, swapped[0], straight[0])
            cutter.with_adapters += int(matched.sum())
            for run_result, mask in ((straight, ~use_rc), (swapped, use_rc)):
                for ev in run_result[1]:
                    sel = mask[ev["reads"]]
                    if not sel.any():
                        continue
                    task = stage.tasks[ev["task"]]
                    reads = ev["reads"][sel]
                    rem = ev["removed"][sel]
                    err = ev["errors"][sel]
                    asf = np.asarray(ev["as_front"][sel], bool)
                    adj = ev["adjacent"][sel]
                    sub = ev["sub"][sel]
                    prim = (
                        np.asarray(ev["primary"], bool)[sel]
                        if "primary" in ev else None
                    )
                    for s in np.unique(sub):
                        m = sub == s
                        astats = cutter.adapter_statistics[
                            task.adapters[int(s)]
                        ]
                        astats.reverse_complemented += int(
                            use_rc[
                                reads[m if prim is None else (m & prim)]
                            ].sum()
                        )
                        fm = m & asf
                        bm = m & ~asf
                        if fm.any():
                            _record_removals(astats.front, rem[fm], err[fm])
                        if bm.any():
                            _record_removals(astats.back, rem[bm], err[bm])
                            _record_adjacent(astats.back, adj[bm])

    combined = np.concatenate([c1.buf, c2.buf])
    off2 = len(c1.buf)
    suffix = mod._suffix or ""
    slot1 = _select_paired_chunk(c1, 0, c2, off2, combined, use_rc, suffix)
    slot2 = _select_paired_chunk(c2, off2, c1, 0, combined, use_rc, suffix)
    action = next(
        (s.action for s in (stage1, stage2) if s is not None), "trim"
    )
    keep_windows = action in (None, "mask", "lowercase")

    def slot_windows(straight, swapped, entry_straight, entry_swapped):
        """Output windows and transform remainder for one slot: trim
        mode emits the trimmed windows; window-keeping actions emit
        the chosen orientation's input extent, with the trimmed
        windows as the remainder."""
        t_ws = np.where(use_rc, swapped[2], straight[2])
        t_we = np.where(use_rc, swapped[3], straight[3])
        if not keep_windows:
            return t_ws, t_we, None
        ws = np.where(use_rc, entry_swapped[0], entry_straight[0])
        we = np.where(use_rc, entry_swapped[1], entry_straight[1])
        return ws, we, (t_ws, t_we)

    def slot_extras(straight, swapped):
        """The chosen orientation's last-match gid and geometry for one
        output slot, for demux routing / {adapter_name} /
        {match_sequence}: relative coordinates are valid against the
        slot chunk, which carries the same per-read bytes the chosen
        run searched."""
        gid = np.where(use_rc, swapped[5], straight[5])
        has = np.zeros(B, bool)
        a = np.zeros(B, np.int32)
        b = np.zeros(B, np.int32)
        for run_result, mask in ((straight, ~use_rc), (swapped, use_rc)):
            for ev in run_result[1]:
                sel = mask[ev["reads"]]
                r = ev["reads"][sel]
                has[r] = True
                a[r] = (ev["ws"] + ev["qs"])[sel]
                b[r] = (ev["ws"] + ev["qe"])[sel]
        return gid, (has, a, b)

    o_ws1, o_we1, rem1 = slot_windows(a1, b1, (ws1, we1), (ws2, we2))
    o_ws2, o_we2, rem2 = slot_windows(a2, b2, (ws2, we2), (ws1, we1))
    side_events = None
    if want_events:
        # per-slot round-ordered chosen events: a read's rows come
        # from exactly one orientation run, so concatenating the two
        # filtered lists keeps each read's matches in round order
        side_events = (
            _filter_events(a1[1], ~use_rc) + _filter_events(b1[1], use_rc),
            _filter_events(a2[1], ~use_rc) + _filter_events(b2[1], use_rc),
            use_rc,
        )
    out = (
        slot1,
        slot2,
        o_ws1,
        o_we1,
        o_ws2,
        o_we2,
        np.where(use_rc, b1[0], a1[0]),
        np.where(use_rc, b2[0], a2[0]),
        slot_extras(a1, b1),
        slot_extras(a2, b2),
        (action, rem1, rem2),
        side_events,
    )
    return out


def _apply_post_stages(engine, post_stages, chunk, ws, we):
    """Host stages that run after the paired-revcomp swap, applied to
    a (possibly source-mixed) output slot; folds their counters into
    the modifier objects directly."""
    stats = {}
    for si, stage in enumerate(post_stages):
        ws, we = engine._apply_host_stage(si, stage, chunk, ws, we, stats)
    with _stats_lock():  # pooled drive: emit() runs on worker threads
        for si, trimmed in stats.get("quality_trimmed", {}).items():
            post_stages[si].modifier.trimmed_bases += trimmed
        for si, removed in stats.get("poly_a_removed", {}).items():
            mod = post_stages[si].modifier
            for length, count in enumerate(np.bincount(removed)):
                if count:
                    mod.trimmed_bases[int(length)] += int(count)
    return ws, we


def _make_side_render(stages_s, assemble_s, writes_fasta):
    """Per-side record renderer for one paired output: FASTQ goes
    through the side's stage assembler; FASTA is assembled plain or
    with the mask/lowercase transform."""
    if not writes_fasta:
        return assemble_s
    from .io.chunks import assemble_fasta_transform, assemble_fasta_window

    tm_static = {"mask": 1, "lowercase": 2}.get(_transform_action(stages_s))
    if tm_static is None:
        # the paired --revcomp stage publishes its action via stats
        def plain(c, ws, we, m, st):
            tm = _TRANSFORM_MODES.get((st or {}).get("transform_action"))
            if tm is not None:
                rs, re_ = st["remainder"]
                return assemble_fasta_transform(c, ws, we, rs, re_, m, tm)
            return assemble_fasta_window(c, ws, we, m)

        return plain

    def fn(c, ws, we, m, st):
        rs, re_ = st["remainder"]
        return assemble_fasta_transform(c, ws, we, rs, re_, m, tm_static)

    return fn


def _paired_demux_router(demux, stages1, stages2, pair_stage=None,
                         reducer=None, rc_pair=None):
    """Routing function for paired/combinatorial demultiplexing on the
    batch path: R1's last match routes paired demux (with
    --pair-adapters, the winning pair's R1 adapter), the (R1, R2)
    match combination routes combinatorial demux (reference
    steps.py:422-580 semantics). Keeps input order within every output
    file by merging the masks of routes sharing a writer."""
    from .io.fastq import FastaWriter
    from .steps import CombinatorialDemultiplexer

    if pair_stage is not None:
        names1 = [t.adapter.name for t in pair_stage[0]]
    elif rc_pair is not None:
        # paired --revcomp: routing gids come from the chosen
        # orientation's run of the rc stages
        names1 = [a.name for a in rc_pair[0].flat_adapters]
    else:
        stage1 = next(s for s in stages1 if hasattr(s, "flat_adapters"))
        names1 = [a.name for a in stage1.flat_adapters]
    combinatorial = isinstance(demux, CombinatorialDemultiplexer)
    if combinatorial:
        if rc_pair is not None:
            names2 = [a.name for a in rc_pair[1].flat_adapters]
        else:
            stage2 = next(s for s in stages2 if hasattr(s, "flat_adapters"))
            names2 = [a.name for a in stage2.flat_adapters]
    asm = (_stages_assembler(stages1), _stages_assembler(stages2))
    render_cache = {}

    def render_for(w, side):
        r = render_cache.get(id(w))
        if r is None:
            r = _make_side_render(
                stages1 if side == 1 else stages2,
                asm[side - 1],
                isinstance(w, FastaWriter),
            )
            render_cache[id(w)] = r
        return r

    def write_pair(writer, c1, ws1, we1, c2, ws2, we2, mask, st1, st2):
        for w, c, ws, we, st, side in (
            (writer._writer1, c1, ws1, we1, st1, 1),
            (writer._writer2, c2, ws2, we2, st2, 2),
        ):
            _write(w._file, render_for(w, side)(c, ws, we, mask, st))
            _record_written(
                demux._statistics, side, reducer,
                values=(we - ws)[mask],
            )

    def merge(per_writer, writer, mask):
        key = id(writer)
        if key in per_writer:
            per_writer[key] = (writer, per_writer[key][1] | mask)
        else:
            per_writer[key] = (writer, mask)

    def route(c1, c2, ws1, we1, ws2, we2, keep, stats1, stats2):
        g1 = stats1["last_adapter_gid"]
        per_writer = {}

        def flush():
            for writer, mask in per_writer.values():
                if mask.any():
                    write_pair(
                        writer, c1, ws1, we1, c2, ws2, we2, mask,
                        stats1, stats2,
                    )

        if not combinatorial:
            for gid, name in enumerate(names1):
                merge(per_writer, demux._writers[name], keep & (g1 == gid))
            flush()
            untrimmed = keep & (g1 == -1)
            if demux._untrimmed_writer is not None:
                if untrimmed.any():
                    write_pair(
                        demux._untrimmed_writer,
                        c1, ws1, we1, c2, ws2, we2, untrimmed,
                        stats1, stats2,
                    )
            else:
                _record_filtered(demux, untrimmed, reducer)
            return
        g2 = stats2["last_adapter_gid"]
        span = len(names2) + 1
        codes = (g1.astype(np.int64) + 1) * span + (g2 + 1)
        for code in np.unique(codes[keep]):
            a1, a2 = int(code) // span - 1, int(code) % span - 1
            key = (
                names1[a1] if a1 >= 0 else None,
                names2[a2] if a2 >= 0 else None,
            )
            writer = demux._writers.get(key)
            if writer is not None:  # unknown combos are dropped silently
                merge(per_writer, writer, keep & (codes == code))
        flush()

    return route


def _pair_condition(t, chunk, ws, we, lengths, matched, stats=None):
    from .batch_pipeline import filter_condition

    kind, thr = t
    # under a mask action the host predicate sees the masked read:
    # bytes outside the remainder interval are 'N' (filter_condition
    # adjusts the N count; lowercase and the quality string are
    # unaffected by transforms)
    mask_rem = None
    if stats is not None and stats.get("transform_action") == "mask":
        mask_rem = stats["remainder"]
    return filter_condition(
        kind, thr, chunk, ws, we, lengths, matched,
        mask_remainder=mask_rem,
    )


def _slice_parsed(parsed, sl):
    """A ParsedChunk over a subset of records (shared buffer). The
    offset arrays are copied contiguous — the native ops take raw
    pointers and cannot handle strided views."""
    from .io.chunks import ParsedChunk

    return ParsedChunk(
        parsed.buf,
        np.ascontiguousarray(parsed.head_start[sl]),
        np.ascontiguousarray(parsed.head_end[sl]),
        np.ascontiguousarray(parsed.seq_start[sl]),
        np.ascontiguousarray(parsed.seq_len[sl]),
        np.ascontiguousarray(parsed.qual_start[sl]),
        has_cr=parsed.has_cr,
    )


def _interleaved_parsed_chunks(file, size, fasta=False):
    """Yield pair-aligned ParsedChunks from an interleaved FASTQ or
    FASTA file; an odd trailing record raises the host reader's exact
    error (io/fastq.py InterleavedSequenceReader)."""
    from .io.chunks import parse_fasta_chunk, parse_fastq_chunk
    from .io.fastq import read_chunks
    from .io.records import FileFormatError

    leftover = b""
    line = 0  # absolute line number for FASTA format errors
    for data in read_chunks(file, size):
        if leftover:
            data = leftover + bytes(data)
            leftover = b""
        if fasta:
            parsed = parse_fasta_chunk(data, first_line=line)
        else:
            parsed = parse_fastq_chunk(data)
        nrec = parsed.n_records
        if nrec % 2:
            # carve the odd record off: head_start-1 is its '>'/'@'
            # byte, which for FASTA may sit after leading whitespace
            # of its line — the re-parse strips edge whitespace anyway
            cut = int(parsed.head_start[nrec - 1]) - 1
            leftover = bytes(memoryview(data)[cut:])
            parsed = _slice_parsed(parsed, slice(0, nrec - 1))
        if fasta:
            consumed = len(data) - len(leftover)
            line += int(
                (np.frombuffer(data, np.uint8)[:consumed] == 10).sum()
            )
        if parsed.n_records:
            yield parsed
    if leftover:
        if fasta:
            last = parse_fasta_chunk(leftover, first_line=line)
        else:
            last = parse_fastq_chunk(leftover)
        name = bytes(
            last.buf[last.head_start[0] : last.head_end[0]]
        ).decode("latin-1")
        raise FileFormatError(
            "Interleaved input file incomplete: last record "
            f"'{name}' has no partner.",
            line=None,
        )


def _run_paired(
    pipeline, infiles, progress, cores: int = 1
) -> Optional[Statistics]:
    interleaved_in = infiles.interleaved
    if interleaved_in:
        if len(infiles._files) != 1:
            return _fallback("interleaved input with multiple files")
        f1, f2 = infiles._files[0], None
    else:
        if len(infiles._files) != 2:
            return _fallback("paired pipeline without exactly two input files")
        f1, f2 = infiles._files
    if not _activation_allowed(f1):
        return None  # auto-mode policy decline (small input), not a fallback
    fmt1 = _input_format(f1)
    if interleaved_in:
        if fmt1 not in ("fastq", "fasta"):
            return _fallback("interleaved input is not parseable FASTQ/FASTA")
    elif fmt1 not in ("fastq", "fasta") or _input_format(f2) != fmt1:
        return _fallback("paired inputs are not matching FASTQ/FASTA files")
    fasta_in = fmt1 == "fasta"
    translated = _translate_paired(pipeline, interleaved_in, fasta=fasta_in)
    if translated is None:
        return _fallback(
            "a modifier/step combination the engine does not express "
            "(paired; run with --debug to see the gate)"
        )
    stages1, stages2 = translated.stages1, translated.stages2
    cutters, pair_filters = translated.cutters, translated.pair_filters
    sink, pair_stage = translated.sink, translated.pair_stage
    rc_pair, post_stages = translated.rc_pair, translated.post_stages
    rename = translated.rename
    side_edits, zero_caps = translated.side_edits, translated.zero_caps
    side_files = translated.side
    _setup_jax()

    from . import native
    from .io.chunks import parse_fastq_chunk
    from .batch_pipeline import BatchPipelineEngine
    from .io.chunks import assemble_window
    from .io.fastq import InterleavedSequenceWriter, read_paired_chunks
    from .io.records import FileFormatError

    if not native.AVAILABLE:
        # the paired name check needs the native lib
        return _fallback("native host-ops library unavailable")

    from .steps import CombinatorialDemultiplexer, PairedDemultiplexer

    reducer = _make_stats_reducer()
    engine1 = BatchPipelineEngine(
        stages1, want_ref_coords=side_files["wildcard"] is not None
    )
    engine2 = BatchPipelineEngine(stages2)
    assemble1 = _stages_assembler(stages1)
    assemble2 = _stages_assembler(stages2)
    rc_side_stages = (_revcomp_stage(stages1), _revcomp_stage(stages2))
    side_stage1 = next(
        (s for s in stages1 if hasattr(s, "flat_adapters")), None
    )
    side_stage2 = next(
        (s for s in stages2 if hasattr(s, "flat_adapters")), None
    )
    if pair_stage is not None:
        # --pair-adapters: the tasks live on the pair stage, not in
        # the per-side stage lists; side-file rows resolve through them
        from types import SimpleNamespace

        side_stage1 = SimpleNamespace(tasks=pair_stage[0])
        side_stage2 = SimpleNamespace(tasks=pair_stage[1])
    elif rc_pair is not None:
        # paired --revcomp: side-file rows resolve through the rc
        # cutters' stages (events carry their task indices)
        side_stage1, side_stage2 = rc_pair[0], rc_pair[1]
    demux = (
        sink
        if isinstance(sink, (PairedDemultiplexer, CombinatorialDemultiplexer))
        else None
    )
    any_inter_filter = any(
        step.writer is not None
        and isinstance(step.writer, InterleavedSequenceWriter)
        for step, _t1, _t2, _m in pair_filters
    )

    from .io.fastq import FastaWriter

    make_render = _make_side_render

    inter_out = out1 = out2 = None
    inter_fasta = False
    if demux is None:
        if isinstance(sink.writer, InterleavedSequenceWriter):
            inter_out = sink.writer._writer._file
            inter_fasta = isinstance(sink.writer._writer, FastaWriter)
        else:
            out1 = sink.writer._writer1._file
            out2 = sink.writer._writer2._file
            render1 = make_render(
                stages1, assemble1,
                isinstance(sink.writer._writer1, FastaWriter),
            )
            render2 = make_render(
                stages2, assemble2,
                isinstance(sink.writer._writer2, FastaWriter),
            )
    else:
        router = _paired_demux_router(
            demux, stages1, stages2, pair_stage, reducer, rc_pair
        )
    filter_renders = [
        (
            make_render(stages1, assemble1,
                        isinstance(step.writer._writer1, FastaWriter)),
            make_render(stages2, assemble2,
                        isinstance(step.writer._writer2, FastaWriter)),
        )
        if step.writer is not None
        and not isinstance(step.writer, InterleavedSequenceWriter)
        else None
        for step, _t1, _t2, _m in pair_filters
    ]
    n = 0
    bp1 = 0
    bp2 = 0
    wl = sink._statistics

    if rename is not None or any(side_edits):
        from .batch_pipeline import CutStage

        rename_names = []
        rename_cuts = []
        for side, st in enumerate((stages1, stages2)):
            if pair_stage is not None:
                # --pair-adapters: gids are winning PAIR indices and
                # the adapters live on the pair stage, not in the
                # per-side stage lists
                rename_names.append(
                    [t.adapter.name for t in pair_stage[side]]
                )
            elif rc_pair is not None:
                # paired --revcomp: the cutters live on the rc stages
                stage = rc_pair[side]
                rename_names.append(
                    [a.name for a in stage.flat_adapters]
                    if stage is not None else []
                )
            else:
                stage = next(
                    (x for x in st if hasattr(x, "flat_adapters")), None
                )
                rename_names.append(
                    [a.name for a in stage.flat_adapters]
                    if stage is not None else []
                )
            rename_cuts.append(
                [x.length for x in st if isinstance(x, CutStage)]
            )

    def check_names(p1, p2):
        from .io.records import record_names_match

        if p1.n_records != p2.n_records:
            assert not interleaved_in
            more = 1 if p1.n_records > p2.n_records else 2
            raise FileFormatError(
                "Reads are improperly paired. There are more reads in "
                f"file {more} than in file {3 - more}.",
                line=None,
            )
        bad = native.check_pair_names(
            p1.buf, p1.head_start, p1.head_end,
            p2.buf, p2.head_start, p2.head_end,
        )
        if bad >= 0:
            name1 = bytes(
                p1.buf[p1.head_start[bad] : p1.head_end[bad]]
            ).decode("latin-1")
            name2 = bytes(
                p2.buf[p2.head_start[bad] : p2.head_end[bad]]
            ).decode("latin-1")
            # the C fast path takes the ID from position 0; Python
            # split() skips leading whitespace — reconfirm before
            # raising so edge cases stay identical
            if not record_names_match(name1, name2):
                if interleaved_in:
                    raise FileFormatError(
                        "Reads are improperly paired. Read name "
                        f"'{name1}' does not match '{name2}'.",
                        line=None,
                    )
                raise FileFormatError(
                    "Reads are improperly paired. Read name "
                    f"'{name1}' in file 1 does not match "
                    f"'{name2}' in file 2.",
                    line=None,
                )

    def interleave_write(dest, full, ws1, we1, ws2, we2, mask, out_fasta,
                         st1=None, st2=None):
        from .io.chunks import assemble_fasta_window, assemble_window

        N2 = full.n_records
        wsa = np.empty(N2, np.int32)
        wea = np.empty(N2, np.int32)
        kp = np.empty(N2, bool)
        wsa[0::2], wsa[1::2] = ws1, ws2
        wea[0::2], wea[1::2] = we1, we2
        kp[0::2] = kp[1::2] = mask
        tm = _TRANSFORM_MODES.get(
            (st1 or {}).get("transform_action")
            or (st2 or {}).get("transform_action")
        )
        if tm is not None:
            # mask/lowercase: interleave each side's remainder interval
            # (a side without an adapter stage masks nothing — its
            # remainder is its whole window)
            rsa = np.empty(N2, np.int32)
            rea = np.empty(N2, np.int32)
            rsa[0::2], rea[0::2] = (st1 or {}).get(
                "remainder", (ws1, we1)
            )
            rsa[1::2], rea[1::2] = (st2 or {}).get(
                "remainder", (ws2, we2)
            )
            if out_fasta:
                from .io.chunks import assemble_fasta_transform

                blob = assemble_fasta_transform(
                    full, wsa, wea, rsa, rea, kp, tm
                )
            else:
                from . import native as _native

                blob = _native.assemble_fastq_transform(
                    full.buf, full.head_start, full.head_end,
                    full.seq_start, full.qual_start,
                    wsa, wea, rsa, rea, kp, tm,
                )
            _write(dest, blob)
            return
        asm = assemble_fasta_window if out_fasta else assemble_window
        _write(dest, asm(full, wsa, wea, kp))

    def emit(pend1, pend2, full):
        nonlocal n, bp1, bp2
        ws1, we1, _, stats1 = engine1.collect(pend1)
        ws2, we2, _, stats2 = engine2.collect(pend2)
        c1, c2 = pend1.parsed, pend2.parsed
        # per-side rc stages (API-built ReverseComplementer on one
        # side): materialize each side's chosen-orientation chunk once
        # per batch, before anything downstream reads bytes — side
        # files, pair predicates, demux routing, edits, renders all
        # then see the post-modifier read like the host does
        # (reference modifiers.py:270-288 runs the rc choice inside
        # the modifier chain)
        for side_i, (rc_st, stats_s) in enumerate(
            zip(rc_side_stages, (stats1, stats2))
        ):
            if rc_st is None or "is_rc" not in stats_s:
                continue
            chunk_s = (c1, c2)[side_i]
            rc = stats_s["rc_chunk"]
            sel = _select_paired_chunk(
                chunk_s, 0, rc, len(chunk_s.buf),
                np.concatenate([chunk_s.buf, rc.buf]),
                stats_s["is_rc"], rc_st.suffix or "",
            )
            stats_s["rc_selected"] = True
            stats_s["side_rc_flags"] = stats_s["is_rc"]
            if side_i == 0:
                c1 = sel
            else:
                c2 = sel
        m1 = stats1["matched_mask"]
        m2 = stats2["matched_mask"]
        if pair_stage is not None:
            m1 = m2 = _pair_match(
                (engine1, engine2), (c1, c2),
                ((ws1, we1), (ws2, we2)), pair_stage,
                stats_pair=(stats1, stats2),
            )
        elif rc_pair is not None:
            (c1, c2, ws1, we1, ws2, we2, m1, m2,
             (gid1, geom1), (gid2, geom2),
             (rc_action, rem1, rem2), rc_side_events) = _run_rc_pair(
                (engine1, engine2), rc_pair, (c1, c2),
                ((ws1, we1), (ws2, we2)),
                want_events=any(side_files.values()),
            )
            if rc_side_events is not None:
                # side-channel rows come from the chosen orientation's
                # matches; the info-row walk buffers are the PHYSICAL
                # sides' as-parsed reads, reverse-complemented where
                # rc won (reference steps.py:233-247 quirk)
                ev1, ev2, rc_use = rc_side_events
                stats1["adapter_events"] = ev1
                stats2["adapter_events"] = ev2
                stats1["side_rc_flags"] = rc_use
                stats2["side_rc_flags"] = rc_use
                if side_files["info"] is not None:
                    stats1["side_walk_chunk"] = _rc_walk_chunk(
                        pend1.parsed, rc_use
                    )
                if side_files["info2"] is not None:
                    stats2["side_walk_chunk"] = _rc_walk_chunk(
                        pend2.parsed, rc_use
                    )
            # the chosen orientation's routing ids / match geometry
            # replace the (empty) pre-swap engine stats
            stats1["last_adapter_gid"] = gid1
            stats2["last_adapter_gid"] = gid2
            stats1["rc_pair_geometry"] = geom1
            stats2["rc_pair_geometry"] = geom2
            if rem1 is not None and rc_action is not None:
                # mask/lowercase: the renders and the mask N-count
                # read the remainder + action from the stats
                stats1["remainder"] = rem1
                stats2["remainder"] = rem2
                stats1["transform_action"] = rc_action
                stats2["transform_action"] = rc_action
            ws1, we1 = _apply_post_stages(
                engine1, post_stages[0], c1, ws1, we1
            )
            ws2, we2 = _apply_post_stages(
                engine2, post_stages[1], c2, ws2, we2
            )
        precap1, precap2 = c1, c2
        if zero_caps[0] is not None:
            c1 = _zero_cap_chunk(c1, zero_caps[0])
        if zero_caps[1] is not None:
            c2 = _zero_cap_chunk(c2, zero_caps[1])
        if any(side_edits):
            edited = []
            for side, (chunk_s, stats_s, ws_s, we_s) in enumerate(
                ((c1, stats1, ws1, we1), (c2, stats2, ws2, we2))
            ):
                if side_edits[side]:
                    chunk_s = _edit_headers(
                        chunk_s,
                        _make_name_editor(
                            side_edits[side], None, chunk_s, stats_s,
                            rename_names[side], rename_cuts[side],
                            ws_s, we_s,
                        ),
                    )
                edited.append(chunk_s)
            c1, c2 = edited
        if rename is not None:
            c1, c2 = _paired_rename_headers(
                (c1, c2), rename,
                (stats1["last_adapter_gid"], stats2["last_adapter_gid"]),
                rename_names, rename_cuts,
                (
                    stats1.get("rc_pair_geometry")
                    or _last_match_geometry(stats1, c1.n_records),
                    stats2.get("rc_pair_geometry")
                    or _last_match_geometry(stats2, c2.n_records),
                ),
                # cut bytes come from the physical sides (host: the
                # cutter records them before the orientation swap)
                cut_chunks=(
                    (pend1.parsed, pend2.parsed)
                    if rc_pair is not None else None
                ),
            )
        if (inter_out is not None or any_inter_filter) and (
            full is None or c1 is not pend1.parsed or c2 is not pend2.parsed
        ):
            # caps/edits/rename replaced the per-side chunks (or the
            # input came as two files): rebuild the combined chunk the
            # interleaved writer slices from
            full = _interleave_chunks(c1, c2)
        if any(side_files.values()):
            # reference step order: side-channel writers run before
            # the filters, so every pair gets its rows
            _emit_side_files(
                side_files["rest"], side_files["info"],
                side_files["wildcard"], c1, stats1, side_stage1,
                ws1, we1, precap_chunk=precap1,
                rc_flags=stats1.get("side_rc_flags"),
                walk_chunk=stats1.get("side_walk_chunk"),
            )
            if side_files["info2"] is not None:
                _emit_side_files(
                    None, side_files["info2"], None, c2, stats2,
                    side_stage2, ws2, we2, precap_chunk=precap2,
                    rc_flags=stats2.get("side_rc_flags"),
                    walk_chunk=stats2.get("side_walk_chunk"),
                )
        len1 = we1 - ws1
        len2 = we2 - ws2
        keep = np.ones(c1.n_records, bool)
        for (step, t1, t2, mode), renders in zip(
            pair_filters, filter_renders
        ):
            if t2 is None:
                drop = _pair_condition(t1, c1, ws1, we1, len1, m1, stats1)
            elif t1 is None:
                drop = _pair_condition(t2, c2, ws2, we2, len2, m2, stats2)
            else:
                d1 = _pair_condition(t1, c1, ws1, we1, len1, m1, stats1)
                d2 = _pair_condition(t2, c2, ws2, we2, len2, m2, stats2)
                if mode == "any":
                    drop = d1 | d2
                elif mode == "both":
                    drop = d1 & d2
                else:  # first
                    drop = d1
            newly = drop & keep
            count = int(newly.sum())
            _record_filtered(step, newly, reducer)
            if step.writer is not None and count:
                if isinstance(step.writer, InterleavedSequenceWriter):
                    interleave_write(
                        step.writer._writer._file, full,
                        ws1, we1, ws2, we2, newly,
                        isinstance(step.writer._writer, FastaWriter),
                        stats1, stats2,
                    )
                else:
                    _write(
                        step.writer._writer1._file,
                        renders[0](c1, ws1, we1, newly, stats1),
                    )
                    _write(
                        step.writer._writer2._file,
                        renders[1](c2, ws2, we2, newly, stats2),
                    )
            keep &= ~drop
        if demux is not None:
            router(c1, c2, ws1, we1, ws2, we2, keep, stats1, stats2)
        elif inter_out is not None:
            interleave_write(
                inter_out, full, ws1, we1, ws2, we2, keep, inter_fasta,
                stats1, stats2,
            )
            _record_written(wl, 1, reducer, values=len1[keep])
            _record_written(wl, 2, reducer, values=len2[keep])
        else:
            _write(out1, render1(c1, ws1, we1, keep, stats1))
            _write(out2, render2(c2, ws2, we2, keep, stats2))
            _record_written(wl, 1, reducer, values=len1[keep])
            _record_written(wl, 2, reducer, values=len2[keep])
        with _stats_lock():
            bp1 += _apply_side_stats(
                stats1, stages1, cutters[0], None, reducer
            )
            bp2 += _apply_side_stats(
                stats2, stages2, cutters[1], None, reducer
            )
            n += stats1["n"]
            if progress is not None:
                progress.update(stats1["n"])

    def chunk_pairs():
        if interleaved_in:
            for full in _interleaved_parsed_chunks(
                f1, _chunk_bytes(), fasta=fasta_in
            ):
                yield (
                    _slice_parsed(full, slice(0, None, 2)),
                    _slice_parsed(full, slice(1, None, 2)),
                    full,
                )
        elif fasta_in:
            from .io.chunks import parse_fasta_chunk

            lines = [0, 0]
            for d1, d2 in read_paired_chunks(f1, f2, _chunk_bytes()):
                p1 = parse_fasta_chunk(d1, first_line=lines[0])
                p2 = parse_fasta_chunk(d2, first_line=lines[1])
                lines[0] += int((np.frombuffer(d1, np.uint8) == 10).sum())
                lines[1] += int((np.frombuffer(d2, np.uint8) == 10).sum())
                yield p1, p2, None
        else:
            for d1, d2 in read_paired_chunks(f1, f2, _chunk_bytes()):
                yield parse_fastq_chunk(d1), parse_fastq_chunk(d2), None

    def submit_pair(item):
        p1, p2, full = item
        check_names(p1, p2)
        return (engine1.submit(p1), engine2.submit(p2), full)

    _drive(chunk_pairs(), submit_pair, lambda item: emit(*item), cores)
    if reducer is not None:
        reducer.fold()  # one D2H of the psum'd counters
    infiles.close()
    if progress is not None:
        progress.close()
    return Statistics().collect(
        n, bp1, bp2, pipeline._modifiers, pipeline._steps
    )
