"""
Per-side ReverseComplementer in paired pipelines (API-built; the CLI
only constructs the PairedReverseComplementer form): engine vs host
parity across the combinations that used to be host-gated — side
files, content pair predicates, name edits/zero-cap, rename,
interleaved IO, demultiplexing, mask/lowercase actions, FASTA IO.

The paired drive materializes the chosen-orientation chunk per side
(accel._run_paired emit), so every downstream consumer reads the
post-modifier bytes like the host does (reference modifiers.py's
ReverseComplementer runs inside the modifier chain).
"""

import os
import random

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import pytest

A3 = "AGATCGGAAGAGCACACGTC"
A5 = "CTGTCTCTTATACACATCT"
AWILD = "AGATCGGANGAGCACACGTC"  # N wildcard for --wildcard-file rows


def _rc(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp[c] for c in reversed(s))


def make_pair_files(p1, p2, n=300, seed=11, adapters=(A3, A5),
                    fasta=False, interleaved=False, with_n=False):
    rng = random.Random(seed)

    def rec(i, tag, adapter):
        L = rng.randint(20, 90)
        bases = "ACGTN" if with_n and rng.random() < 0.3 else "ACGT"
        s = "".join(rng.choice(bases) for _ in range(L))
        if rng.random() < 0.5 and L > 25:
            pos = rng.randint(5, L - 10)
            s = (s[:pos] + adapter + s[pos:])[:L]
        if rng.random() < 0.4:
            s = _rc(s)
        if fasta:
            return f">x{i}{tag} c{i}\n{s}\n"
        q = "".join(chr(rng.randint(35, 72)) for _ in s)
        return f"@x{i}{tag} c{i}\n{s}\n+\n{q}\n"

    if interleaved:
        with open(p1, "w") as f:
            for i in range(n):
                f.write(rec(i, "", adapters[0]) + rec(i, "", adapters[1]))
        return
    with open(p1, "w") as f1, open(p2, "w") as f2:
        for i in range(n):
            f1.write(rec(i, "", adapters[0]))
            f2.write(rec(i, "", adapters[1]))


def build_and_run(tmp_path, tag, config, rc_side=0):
    """Build a paired pipeline with a ReverseComplementer on one side
    plus the config's extras; run it; return {name: bytes} outputs."""
    from cutadapt_tpu.pipeline import PairedEndPipeline
    from cutadapt_tpu.io.files import OutputFiles, InputPaths
    from cutadapt_tpu.modifiers import (
        AdapterCutter,
        PairedEndModifierWrapper,
        PairedEndRenamer,
        PrefixSuffixAdder,
        ReverseComplementer,
        SuffixRemover,
        ZeroCapper,
    )
    from cutadapt_tpu.adapters import BackAdapter
    from cutadapt_tpu.predicates import TooManyN, TooShort
    from cutadapt_tpu.runners import make_runner
    from cutadapt_tpu.steps import (
        InfoFileWriter,
        PairedDemultiplexer,
        PairedEndFilter,
        PairedEndSink,
        PairedSingleEndStep,
        RestFileWriter,
        WildcardFileWriter,
    )
    from cutadapt_tpu.utils import DummyProgress

    fasta = config.get("fasta", False)
    interleaved_in = config.get("interleaved_in", False)
    action = config.get("action", "trim")
    adapter_seq = AWILD if config.get("wildcard") else A3
    ext = "fasta" if fasta else "fastq"

    in1 = tmp_path / f"in1.{ext}"
    in2 = tmp_path / f"in2.{ext}"
    make_pair_files(
        in1, in2, fasta=fasta, interleaved=interleaved_in,
        with_n=config.get("with_n", False),
    )
    if interleaved_in:
        inpaths = InputPaths(str(in1), interleaved=True)
    else:
        inpaths = InputPaths(str(in1), str(in2))

    rc_cutter = ReverseComplementer(
        AdapterCutter(
            [BackAdapter(adapter_seq, name="ad1")], action=action
        )
    )
    wrap = (
        PairedEndModifierWrapper(rc_cutter, None)
        if rc_side == 0
        else PairedEndModifierWrapper(None, rc_cutter)
    )
    modifiers = [wrap]
    if config.get("demux") and rc_side == 1:
        # demux routes on R1's match: give R1 a plain cutter and let
        # the rc modifier ride on R2 (mixed per-side forms)
        modifiers.insert(0, PairedEndModifierWrapper(
            AdapterCutter([BackAdapter(A3, name="ad1")]), None
        ))
    for edit in config.get("edits", ()):
        if edit == "strip":
            m = SuffixRemover("x")
        elif edit == "presuf":
            m = PrefixSuffixAdder("p_", "_s")
        else:
            m = ZeroCapper()
        modifiers.append(
            PairedEndModifierWrapper(m, None)
            if rc_side == 0 else PairedEndModifierWrapper(None, m)
        )
    if config.get("rename"):
        modifiers.append(PairedEndRenamer(
            "{id} ad={adapter_name} m={match_sequence} c={comment}"
        ))

    outputs = {}

    def track(path):
        outputs[os.path.basename(str(path))] = path
        return path

    outfiles = OutputFiles(
        proxied=False, qualities=not fasta,
        interleaved=config.get("interleaved_out", False),
    )
    steps = []
    for side_file in config.get("side_files", ()):
        if side_file == "info":
            steps.append(PairedSingleEndStep(InfoFileWriter(
                outfiles.open_text(track(tmp_path / f"info-{tag}.txt"))
            )))
        elif side_file == "rest":
            steps.append(PairedSingleEndStep(RestFileWriter(
                outfiles.open_text(track(tmp_path / f"rest-{tag}.txt"))
            )))
        else:
            steps.append(PairedSingleEndStep(WildcardFileWriter(
                outfiles.open_text(track(tmp_path / f"wild-{tag}.txt"))
            )))
    for pred in config.get("filters", ()):
        if pred == "too_many_n":
            p = TooManyN(3)
            steps.append(PairedEndFilter(
                p if rc_side == 0 else None,
                p if rc_side == 1 else None,
                pair_filter_mode="any",
            ))
        else:
            steps.append(PairedEndFilter(TooShort(15), TooShort(15)))
    if config.get("demux"):
        steps.append(PairedDemultiplexer(
            ["ad1"],
            str(tmp_path) + f"/dm-{tag}-{{name}}.1.{ext}",
            str(tmp_path) + f"/dm-{tag}-{{name}}.2.{ext}",
            None,
            None,
            False,
            outfiles,
        ))
        track(tmp_path / f"dm-{tag}-ad1.1.{ext}")
        track(tmp_path / f"dm-{tag}-ad1.2.{ext}")
        track(tmp_path / f"dm-{tag}-unknown.1.{ext}")
        track(tmp_path / f"dm-{tag}-unknown.2.{ext}")
    elif config.get("interleaved_out"):
        steps.append(PairedEndSink(outfiles.open_record_writer(
            track(tmp_path / f"out-{tag}.{ext}"), interleaved=True,
        )))
    else:
        steps.append(PairedEndSink(outfiles.open_record_writer(
            track(tmp_path / f"out1-{tag}.{ext}"),
            track(tmp_path / f"out2-{tag}.{ext}"),
        )))

    with make_runner(inpaths, cores=1) as runner:
        pipeline = PairedEndPipeline(modifiers, steps)
        stats = runner.run(pipeline, DummyProgress(), outfiles)
    outfiles.close()
    report = stats.as_json()
    return {
        name: path.read_bytes() if path.exists() else None
        for name, path in outputs.items()
    }, report


CONFIGS = [
    ("base", {}),
    ("fasta_out", {"fasta": False}),  # FASTQ in, plain paired out
    ("fasta_io", {"fasta": True}),
    ("mask", {"action": "mask"}),
    ("lowercase", {"action": "lowercase"}),
    ("content_filter", {"filters": ("too_many_n",), "with_n": True}),
    ("edits", {"edits": ("strip", "presuf", "zero_cap")}),
    ("rename", {"rename": True}),
    ("interleaved_out", {"interleaved_out": True}),
    ("interleaved_in", {"interleaved_in": True}),
    ("side_info", {"side_files": ("info",)}),
    ("side_rest_wild", {"side_files": ("rest", "wild"), "wildcard": True}),
    ("demux", {"demux": True}),
    ("mask_rename", {"action": "mask", "rename": True}),
    ("filters_edits", {"filters": ("too_many_n", "too_short"),
                       "edits": ("presuf",), "with_n": True}),
]


def _spy(monkeypatch):
    import cutadapt_tpu.accel as accel_mod

    state = {}
    original = accel_mod.try_run_accelerated

    def spy(pipeline, infiles, progress, *args, **kwargs):
        result = original(pipeline, infiles, progress, *args, **kwargs)
        state["engaged"] = result is not None
        return result

    monkeypatch.setattr(accel_mod, "try_run_accelerated", spy)
    return state


@pytest.mark.parametrize("rc_side", [0, 1], ids=["rc_r1", "rc_r2"])
@pytest.mark.parametrize("name,config", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_perside_rc_parity(tmp_path, monkeypatch, name, config, rc_side):
    if rc_side == 1 and config.get("side_files") == ("info",):
        # info rows come from R1 for the single-writer form; with rc
        # on R2 the R1 rows are rc-free — still a valid parity case
        pass
    spy = _spy(monkeypatch)
    results = {}
    reports = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        results[env], reports[env] = build_and_run(
            tmp_path, f"{name}-{rc_side}-{env}", config, rc_side=rc_side
        )
        if env == "1":
            assert spy.get("engaged"), (
                f"{name} rc_side={rc_side}: batch path fell back to host"
            )
    # output names differ by the env tag; compare by role order
    keys1 = sorted(results["1"])
    keys0 = sorted(results["0"])
    assert len(keys1) == len(keys0)
    for k1, k0 in zip(keys1, keys0):
        assert results["1"][k1] == results["0"][k0], (
            f"{name} rc_side={rc_side}: {k1} differs from host {k0}"
        )
    for rep in reports.values():
        rep.pop("elapsed", None)
    r1, r0 = reports["1"], reports["0"]
    _strip_volatile(r1)
    _strip_volatile(r0)
    assert r1 == r0


def _strip_volatile(rep):
    for key in ("elapsed", "cores", "start_time", "time"):
        rep.pop(key, None)
    ri = rep.get("run_info")
    if isinstance(ri, dict):
        for key in ("elapsed", "start_time", "cores"):
            ri.pop(key, None)
