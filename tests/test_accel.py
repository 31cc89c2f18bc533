"""
CLI fast-path parity: run representative configurations through
cli.main twice — CUTADAPT_TPU_BATCH=1 (batch engine) and =0 (host
path) — and require byte-identical outputs and JSON reports.

This covers the accel translation layer itself; engine-level parity
is covered by test_batch_pipeline.py. (The whole golden suite also
passes with CUTADAPT_TPU_BATCH=1 forced, but that doubles compile
work, so CI keeps it to this representative set.)
"""

import json
import os
import random

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import pytest

from cutadapt_tpu.cli import main

A3 = "AGATCGGAAGAGCACACGTC"
A5 = "CTGTCTCTTATACACATCT"


def make_reads(path, n=800, seed=1, paired=False, interleaved=False):
    rng = random.Random(seed)

    def rec(i, tag, adapter):
        L = rng.randint(20, 90)
        s = "".join(rng.choice("ACGT") for _ in range(L))
        if rng.random() < 0.5 and L > 25:
            p = rng.randint(5, L - 10)
            s = (s[:p] + adapter + s[p:])[:L]
        q = "".join(chr(rng.randint(35, 72)) for _ in s)
        return f"@x{i}{tag}\n{s}\n+\n{q}\n"

    if interleaved:
        with open(path, "w") as f:
            for i in range(n):
                f.write(rec(i, "/1", A3) + rec(i, "/2", A5))
        return [path]
    if paired:
        p2 = str(path) + ".2"
        with open(path, "w") as f1, open(p2, "w") as f2:
            for i in range(n):
                f1.write(rec(i, "/1", A3))
                f2.write(rec(i, "/2", A5))
        return [path, p2]
    with open(path, "w") as f:
        for i in range(n):
            f.write(rec(i, "", A3))
    return [path]


CONFIGS = [
    ("se_basic", ["-a", "a1=" + A3], False),
    ("se_mixed", ["-u", "2", "-q", "15", "-g", "g1=" + A5,
                  "-b", "b1=ACGTACGTAC",
                  "--times", "2", "-m", "10", "--max-n", "4"], False),
    ("se_anchored", ["-g", "g1=^" + A5[:10], "-a", "a1=" + A3[:12] + "$",
                     "--no-indels"], False),
    ("se_linked", ["-g", "l1=" + A5[:10] + "..." + A3[:12], "--poly-a"],
     False),
    ("se_mask", ["-a", "a1=" + A3, "--action=mask"], False),
    ("se_revcomp", ["-a", "a1=" + A3, "--revcomp", "-m", "12"], False),
    ("se_rename", ["-u", "3", "-u", "-2", "-a", "a1=" + A3,
                   "--rename",
                   "{id} bc={cut_prefix} tail={cut_suffix} "
                   "ad={adapter_name} m={match_sequence} c={comment}"],
     False),
    ("pe_basic", ["-a", "a1=" + A3, "-A", "a2=" + A5, "-q", "12",
                  "-m", "15", "--pair-filter=both"], True),
    ("pe_pair_adapters", ["--pair-adapters", "-a", "a1=" + A3,
                          "-A", "a2=" + A5], True),
    ("pe_revcomp", ["-a", "a1=" + A3, "-A", "a2=" + A5, "--revcomp",
                    "-q", "10", "-m", "12"], True),
    ("pe_poly_a", ["-a", "a1=" + A3, "-A", "a2=" + A5, "--poly-a",
                   "-m", "10"], True),
    ("se_name_edits", ["-a", "a1=" + A3, "--strip-suffix", "/1",
                       "-x", "pre_{name}_", "-y", "_post",
                       "--length-tag", "length=", "-z"], False),
    ("pe_name_edits", ["-a", "a1=" + A3, "-A", "a2=" + A5,
                       "-y", " ad={name}", "--zero-cap", "-m", "10"],
     True),
    ("pe_revcomp_one_sided", ["-a", "a1=" + A3, "--revcomp",
                              "--pair-filter=both"], True),
    ("se_mask_edits", ["-a", "a1=" + A3, "--action=mask",
                       "-y", " s{name}", "--zero-cap"], False),
    ("se_lowercase_rename", ["-a", "a1=" + A3, "--action=lowercase",
                             "--rename",
                             "{id} m={match_sequence} k={adapter_name}"],
     False),
]


def _spy_engagement(monkeypatch):
    """Record whether the batch path actually ran (guards against the
    parity test passing trivially because both runs fell back)."""
    import cutadapt_tpu.accel as accel_mod

    state = {}
    original = accel_mod.try_run_accelerated

    def spy(pipeline, infiles, progress, *args, **kwargs):
        result = original(pipeline, infiles, progress, *args, **kwargs)
        state["engaged"] = result is not None
        return result

    monkeypatch.setattr(accel_mod, "try_run_accelerated", spy)
    return state



@pytest.mark.parametrize("name,args,paired", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_fastpath_matches_host(tmp_path, monkeypatch, name, args, paired):
    spy = _spy_engagement(monkeypatch)
    inputs = make_reads(tmp_path / "in.fastq", paired=paired)
    outs = {}
    reports = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out1 = tmp_path / f"o1-{env}.fastq"
        out2 = tmp_path / f"o2-{env}.fastq"
        rep = tmp_path / f"rep-{env}.json"
        argv = ["--quiet", "--json", str(rep)] + list(args) + ["-o", str(out1)]
        if paired:
            argv += ["-p", str(out2)]
        main(argv + [str(p) for p in inputs])
        if env == "1":
            assert spy.get("engaged"), f"batch path did not engage: {name}"
        data = out1.read_bytes()
        if paired:
            data += b"\x00" + out2.read_bytes()
        outs[env] = data
        r = json.load(open(rep))
        r["command_line_arguments"] = None
        reports[env] = r
    assert outs["1"] == outs["0"], name
    assert reports["1"] == reports["0"], name


@pytest.mark.parametrize("paired", [False, True], ids=["se", "pe"])
def test_fastpath_zerocap_expected_errors(tmp_path, monkeypatch, paired):
    """--zero-cap runs before --max-ee/--max-aer on the host; the
    batch path must evaluate those filters on capped qualities (some
    quality bytes here are below '!', which would make the filters
    raise without capping)."""
    spy = _spy_engagement(monkeypatch)
    rng = random.Random(11)
    paths = [tmp_path / "z1.fastq"] + ([tmp_path / "z2.fastq"] if paired else [])
    for pi, p in enumerate(paths):
        with open(p, "w") as f:
            for i in range(500):
                L = rng.randint(20, 80)
                s = "".join(rng.choice("ACGT") for _ in range(L))
                if rng.random() < 0.5 and L > 25:
                    pos = rng.randint(5, L - 10)
                    a = A5 if pi else A3
                    s = (s[:pos] + a + s[pos:])[:L]
                q = "".join(chr(rng.randint(20, 72)) for _ in s)
                f.write(f"@z{i}\n{s}\n+\n{q}\n")
    args = ["-a", "a1=" + A3, "--zero-cap",
            "--max-expected-errors", "6", "--max-average-error-rate", "0.2"]
    if paired:
        args += ["-A", "a2=" + A5, "--pair-filter=any"]
    outs = {}
    reports = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out1 = tmp_path / f"zo1-{env}.fastq"
        rep = tmp_path / f"zrep-{env}.json"
        argv = ["--quiet", "--json", str(rep)] + args + ["-o", str(out1)]
        if paired:
            argv += ["-p", str(tmp_path / f"zo2-{env}.fastq")]
        main(argv + [str(p) for p in paths])
        if env == "1":
            assert spy.get("engaged")
        data = out1.read_bytes()
        if paired:
            data += b"\x00" + (tmp_path / f"zo2-{env}.fastq").read_bytes()
        outs[env] = data
        r = json.load(open(rep))
        r["command_line_arguments"] = None
        reports[env] = r
    assert outs["1"] == outs["0"]
    assert reports["1"] == reports["0"]


@pytest.mark.parametrize("paired", [False, True], ids=["se", "pe"])
def test_fastpath_casava_with_name_edits(tmp_path, monkeypatch, paired):
    """Name edits run before --discard-casava on the host (modifiers
    precede steps), and here they replace the casava comment — the
    batch path must evaluate the filter on the edited headers, where
    nothing looks casava-filtered anymore."""
    spy = _spy_engagement(monkeypatch)
    rng = random.Random(13)
    paths = [tmp_path / "c1.fastq"] + ([tmp_path / "c2.fastq"] if paired else [])
    for pi, p in enumerate(paths):
        with open(p, "w") as f:
            for i in range(400):
                L = rng.randint(25, 70)
                s = "".join(rng.choice("ACGT") for _ in range(L))
                if rng.random() < 0.4:
                    pos = rng.randint(5, L - 10)
                    a = A5 if pi else A3
                    s = (s[:pos] + a + s[pos:])[:L]
                flag = "Y" if i % 2 else "N"
                f.write(f"@c{i} 1:{flag}:0:ATCACG\n{s}\n+\n{'I' * len(s)}\n")
    if paired:
        args = ["-a", "a1=" + A3, "-A", "a2=" + A5,
                "--rename", "{id} k={adapter_name}", "--discard-casava"]
    else:
        args = ["-a", "a1=" + A3, "-x", "pre ", "--discard-casava"]
    outs = {}
    reports = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out1 = tmp_path / f"co1-{env}.fastq"
        rep = tmp_path / f"crep-{env}.json"
        argv = ["--quiet", "--json", str(rep)] + args + ["-o", str(out1)]
        if paired:
            argv += ["-p", str(tmp_path / f"co2-{env}.fastq")]
        main(argv + [str(p) for p in paths])
        if env == "1":
            assert spy.get("engaged")
        data = out1.read_bytes()
        if paired:
            data += b"\x00" + (tmp_path / f"co2-{env}.fastq").read_bytes()
        outs[env] = data
        r = json.load(open(rep))
        r["command_line_arguments"] = None
        reports[env] = r
    assert outs["1"] == outs["0"]
    assert reports["1"] == reports["0"]


def _write_lowq_reads(paths, seed=29, n=500):
    """Reads whose quality bytes dip below '!' (negative phred):
    these exercise the host's exact BWA-trim arithmetic (a cutoff of
    0 still trims negative scores) and ZeroCapper interactions."""
    rng = random.Random(seed)
    for pi, p in enumerate(paths):
        with open(p, "w") as f:
            for i in range(n):
                L = rng.randint(25, 80)
                s = "".join(rng.choice("ACGT") for _ in range(L))
                if rng.random() < 0.5:
                    pos = rng.randint(5, L - 10)
                    a = A5 if pi else A3
                    s = (s[:pos] + a + s[pos:])[:L]
                q = "".join(chr(rng.randint(20, 72)) for _ in s)
                f.write(f"@L{i}\n{s}\n+\n{q}\n")


def test_fastpath_quality_trim_negative_scores(tmp_path, monkeypatch):
    """-q runs BOTH BWA passes on the host, and the implicit front
    cutoff of 0 still trims quality bytes below the base (negative
    scores); the batch path must not treat cutoff 0 as disabled."""
    spy = _spy_engagement(monkeypatch)
    inp = tmp_path / "lq.fastq"
    _write_lowq_reads([inp])
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"lqo-{env}.fastq"
        main(["--quiet", "-q", "10", "-a", "a1=" + A3,
              "-o", str(out), str(inp)])
        if env == "1":
            assert spy.get("engaged")
        outs[env] = out.read_bytes()
    assert outs["1"] == outs["0"]


def test_fastpath_paired_side_files(tmp_path, monkeypatch):
    """--rest-file / --info-file / --info-file-paired / --wildcard-file
    on the paired batch path (R1 rows, plus R2 rows for the paired
    info file), with quality trimming and a length filter behind."""
    spy = _spy_engagement(monkeypatch)
    p1, p2 = tmp_path / "s1.fastq", tmp_path / "s2.fastq"
    _write_lowq_reads([p1, p2], seed=31)
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        files = {
            k: tmp_path / f"{k}-{env}" for k in
            ("o1", "o2", "rest", "info", "info2", "wild")
        }
        main(["--quiet", "-b", "b1=AGNNCGGANGAGC", "-A", "a2=" + A5,
              "-q", "10", "-m", "20",
              "-r", str(files["rest"]),
              "--info-file", str(files["info"]),
              "--info-file-paired", str(files["info2"]),
              "--wildcard-file", str(files["wild"]),
              "-o", str(files["o1"]), "-p", str(files["o2"]),
              str(p1), str(p2)])
        if env == "1":
            assert spy.get("engaged")
        outs[env] = {k: f.read_bytes() for k, f in files.items()}
    for k in outs["1"]:
        assert outs["1"][k] == outs["0"][k], f"{k} differs"
    assert outs["1"]["info"] and outs["1"]["info2"]


@pytest.mark.parametrize("extra", [
    [],
    ["-y", " s{name}", "--zero-cap"],
], ids=["plain", "edits"])
def test_fastpath_paired_revcomp_side_files(tmp_path, monkeypatch, extra):
    """Paired --revcomp with --rest-file / --info-file /
    --info-file-paired / --wildcard-file: the reference InfoFileWriter
    walks each PHYSICAL side's original read reverse-complemented when
    rc wins, with match coordinates from the swapped partner
    (reference steps.py:233-247) — the batch path must reproduce that
    quirk byte-for-byte, including the trailing is_rc column."""
    spy = _spy_engagement(monkeypatch)
    rng = random.Random(71)
    p1, p2 = tmp_path / "rcs1.fastq", tmp_path / "rcs2.fastq"
    a1 = "AGNNCGGANGAGCACACGTC"  # N wildcards exercise --wildcard-file
    with open(p1, "w") as f1, open(p2, "w") as f2:
        for i in range(500):
            seqs = []
            for ad in (a1, A5):
                L = rng.randint(24, 90)
                s = "".join(rng.choice("ACGT") for _ in range(L))
                if rng.random() < 0.6 and L > 28:
                    concrete = "".join(
                        rng.choice("ACGT") if c == "N" else c for c in ad
                    )
                    p = rng.randint(5, L - 12)
                    s = (s[:p] + concrete + s[p:])[:L]
                seqs.append(s)
            if rng.random() < 0.5:  # swapped orientation should win
                seqs.reverse()
            for f, s in zip((f1, f2), seqs):
                q = "".join(chr(rng.randint(25, 72)) for _ in s)
                f.write(f"@p{i} c{i}\n{s}\n+\n{q}\n")
    outs = {}
    reports = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        files = {
            k: tmp_path / f"rc{k}-{env}" for k in
            ("o1", "o2", "rest", "info", "info2", "wild")
        }
        rep = tmp_path / f"rcrep-{env}.json"
        main(["--quiet", "--json", str(rep),
              "-a", "a1=" + a1, "-A", "a2=" + A5, "--revcomp"] + extra +
             ["-r", str(files["rest"]),
              "--info-file", str(files["info"]),
              "--info-file-paired", str(files["info2"]),
              "--wildcard-file", str(files["wild"]),
              "-o", str(files["o1"]), "-p", str(files["o2"]),
              str(p1), str(p2)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        outs[env] = {k: f.read_bytes() for k, f in files.items()}
        r = json.load(open(rep))
        r["command_line_arguments"] = None
        reports[env] = r
    for k in outs["1"]:
        assert outs["1"][k] == outs["0"][k], f"{k} differs"
    assert reports["1"] == reports["0"]
    assert reports["1"]["read_counts"]["reverse_complemented"]
    assert outs["1"]["info"] and outs["1"]["info2"]
    # rc rows must actually appear in the info files
    assert b"\t1\n" in outs["1"]["info"]


@pytest.mark.parametrize("extra", [
    [],
    ["-y", " s{name}", "--zero-cap"],
    ["--rename", "{id} k={adapter_name}"],
], ids=["plain", "edits", "rename"])
def test_fastpath_interleaved(tmp_path, monkeypatch, extra):
    spy = _spy_engagement(monkeypatch)
    inputs = make_reads(tmp_path / "il.fastq", interleaved=True)
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"o-{env}.fastq"
        main(["--quiet", "--interleaved", "-a", "a1=" + A3,
              "-A", "a2=" + A5, "-q", "10"] + extra +
             ["-o", str(out)] + [str(p) for p in inputs])
        if env == "1":
            assert spy.get("engaged")
        outs[env] = out.read_bytes()
    assert outs["1"] == outs["0"]


@pytest.mark.parametrize("action", [None, "mask", "lowercase"])
def test_fastpath_demux(tmp_path, monkeypatch, action):
    rng = random.Random(3)
    barcodes = ["ACGTACGTAC", "TTGACCGGAA", "GGATCCATGC"]
    bc = tmp_path / "bc.fasta"
    bc.write_text(
        "".join(f">b{i}\n{b}\n" for i, b in enumerate(barcodes))
    )
    inp = tmp_path / "in.fastq"
    with open(inp, "w") as f:
        for i in range(600):
            L = rng.randint(20, 70)
            s = "".join(rng.choice("ACGT") for _ in range(L))
            if rng.random() < 0.7:
                s = barcodes[rng.randrange(3)] + s
            f.write(f"@d{i}\n{s}\n+\n{'I' * len(s)}\n")
    extra = [f"--action={action}"] if action else []
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        d = tmp_path / f"out-{env}"
        d.mkdir()
        main(["--quiet", "-g", f"^file:{bc}", "-e", "1", "--no-indels"]
             + extra + ["-o", str(d / "{name}.fastq"), str(inp)])
        outs[env] = {
            p.name: p.read_bytes() for p in sorted(d.iterdir())
        }
    assert outs["1"] == outs["0"]



def _make_paired_demux_reads(tmp_path, barcodes1, barcodes2, n=700, seed=9):
    rng = random.Random(seed)
    p1 = tmp_path / "pd1.fastq"
    p2 = tmp_path / "pd2.fastq"
    with open(p1, "w") as f1, open(p2, "w") as f2:
        for i in range(n):
            for f, codes in ((f1, barcodes1), (f2, barcodes2)):
                L = rng.randint(20, 70)
                s = "".join(rng.choice("ACGT") for _ in range(L))
                if rng.random() < 0.7:
                    s = codes[rng.randrange(len(codes))] + s
                f.write(f"@pd{i}\n{s}\n+\n{'I' * len(s)}\n")
    return p1, p2


@pytest.mark.parametrize("discard_untrimmed,action,ext", [
    (False, None, "fastq"), (True, None, "fastq"),
    (False, "mask", "fastq"), (False, "lowercase", "fasta"),
])
def test_fastpath_paired_demux(
    tmp_path, monkeypatch, discard_untrimmed, action, ext
):
    spy = _spy_engagement(monkeypatch)
    codes = ["ACGTACGTAC", "TTGACCGGAA"]
    bc = tmp_path / "bc.fasta"
    bc.write_text("".join(f">b{i}\n{b}\n" for i, b in enumerate(codes)))
    p1, p2 = _make_paired_demux_reads(tmp_path, codes, ["AAAA"])
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        d = tmp_path / f"pdout-{env}"
        d.mkdir()
        argv = ["--quiet", "-g", f"^file:{bc}", "-e", "1", "--no-indels",
                "-o", str(d / ("{name}.1." + ext)),
                "-p", str(d / ("{name}.2." + ext))]
        if discard_untrimmed:
            argv.append("--discard-untrimmed")
        if action:
            argv.append(f"--action={action}")
        main(argv + [str(p1), str(p2)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        outs[env] = {p.name: p.read_bytes() for p in sorted(d.iterdir())}
    assert outs["1"] == outs["0"]


def test_fastpath_combinatorial_demux(tmp_path, monkeypatch):
    spy = _spy_engagement(monkeypatch)
    codes1 = ["ACGTACGTAC", "TTGACCGGAA"]
    codes2 = ["GGATCCATGC", "CCTTAAGGTT"]
    b1 = tmp_path / "bc1.fasta"
    b2 = tmp_path / "bc2.fasta"
    b1.write_text("".join(f">x{i}\n{b}\n" for i, b in enumerate(codes1)))
    b2.write_text("".join(f">y{i}\n{b}\n" for i, b in enumerate(codes2)))
    p1, p2 = _make_paired_demux_reads(tmp_path, codes1, codes2, seed=10)
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        d = tmp_path / f"cdout-{env}"
        d.mkdir()
        main(["--quiet", "-g", f"^file:{b1}", "-G", f"^file:{b2}",
              "-e", "1", "--no-indels",
              "-o", str(d / "{name1}_{name2}.1.fastq"),
              "-p", str(d / "{name1}_{name2}.2.fastq"),
              str(p1), str(p2)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        outs[env] = {p.name: p.read_bytes() for p in sorted(d.iterdir())}
    assert outs["1"] == outs["0"]


def test_fastpath_fasta_input(tmp_path, monkeypatch):
    spy = _spy_engagement(monkeypatch)
    rng = random.Random(12)
    inp = tmp_path / "in.fasta"
    with open(inp, "w") as f:
        for i in range(500):
            L = rng.randint(15, 80)
            s = "".join(rng.choice("ACGT") for _ in range(L))
            if rng.random() < 0.5 and L > 25:
                p = rng.randint(5, L - 10)
                s = (s[:p] + A3 + s[p:])[:L]
            # wrap some sequences over multiple lines
            if rng.random() < 0.3 and L > 30:
                s = s[:20] + "\n" + s[20:]
            f.write(f">f{i} c{i}\n{s}\n")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"o-{env}.fasta"
        main(["--quiet", "-a", "a1=" + A3, "-m", "10", "--max-n", "2",
              "-o", str(out), str(inp)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        outs[env] = out.read_bytes()
    assert outs["1"] == outs["0"]
    assert outs["1"].startswith(b">")


def test_fastpath_fasta_output_from_fastq(tmp_path, monkeypatch):
    spy = _spy_engagement(monkeypatch)
    inputs = make_reads(tmp_path / "in.fastq")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"o-{env}.fasta"
        main(["--quiet", "-a", "a1=" + A3, "-q", "10",
              "-o", str(out)] + [str(p) for p in inputs])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        outs[env] = out.read_bytes()
    assert outs["1"] == outs["0"]
    assert outs["1"].startswith(b">")


def test_fastpath_rest_and_info_files(tmp_path, monkeypatch):
    spy = _spy_engagement(monkeypatch)
    inputs = make_reads(tmp_path / "in.fastq")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"o-{env}.fastq"
        rest = tmp_path / f"rest-{env}.txt"
        info = tmp_path / f"info-{env}.tsv"
        main(["--quiet", "-u", "2", "-g", "g1=" + A5, "-a", "a1=" + A3,
              "--times", "2",
              "-r", str(rest), "--info-file", str(info),
              "-o", str(out)] + [str(p) for p in inputs])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        outs[env] = (out.read_bytes(), rest.read_bytes(), info.read_bytes())
    assert outs["1"][0] == outs["0"][0]
    assert outs["1"][1] == outs["0"][1], "rest file differs"
    assert outs["1"][2] == outs["0"][2], "info file differs"
    assert outs["1"][2], "info file unexpectedly empty"


@pytest.mark.parametrize("action", ["mask", "lowercase"])
@pytest.mark.parametrize("paired", [False, True], ids=["se", "pe"])
def test_fastpath_transform_side_files(tmp_path, monkeypatch, action,
                                       paired):
    """mask/lowercase actions with --rest-file / --info-file /
    --wildcard-file (+ --info-file-paired when paired): rows derive
    from match geometry and the original read bytes, which the
    transform never touches, so they must match the host path."""
    spy = _spy_engagement(monkeypatch)
    inputs = make_reads(tmp_path / "in.fastq", paired=paired)
    aw = A3[:6] + "N" + A3[7:14] + "N" + A3[15:]  # N wildcards
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"to-{env}.fastq"
        files = {k: tmp_path / f"t{k}-{env}.txt"
                 for k in ("rest", "info", "wild", "info2")}
        argv = ["--quiet", f"--action={action}", "-a", "a1=" + aw,
                "-r", str(files["rest"]), "--info-file", str(files["info"]),
                "--wildcard-file", str(files["wild"]),
                "-o", str(out)]
        if paired:
            argv += ["-A", "a2=" + A5, "-p", str(tmp_path / f"to2-{env}.fastq"),
                     "--info-file-paired", str(files["info2"])]
        main(argv + [str(p) for p in inputs])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        blob = [out.read_bytes()]
        if paired:
            blob.append((tmp_path / f"to2-{env}.fastq").read_bytes())
        blob += [files[k].read_bytes() for k in ("rest", "info", "wild")
                 if files[k].exists()]
        if paired:
            blob.append(files["info2"].read_bytes())
        outs[env] = blob
    assert outs["1"] == outs["0"]
    assert any(outs["1"][1:]), "side files unexpectedly empty"


def test_fastpath_pair_adapters_wildcard_file(tmp_path, monkeypatch):
    """--pair-adapters with --wildcard-file: rows come from the
    winning pair's R1 match, whose adapter-side [astart, astop) span
    rides the wide result format through _pair_match."""
    spy = _spy_engagement(monkeypatch)
    a1 = "AGATCNGAAGAGNACACGTC"  # N wildcards
    a2 = "CTGTCTNTTATACNCATCT"
    rng = random.Random(43)
    p1, p2 = tmp_path / "w1.fastq", tmp_path / "w2.fastq"
    with open(p1, "w") as f1, open(p2, "w") as f2:
        for i in range(500):
            for side, (f, tpl) in enumerate(((f1, a1), (f2, a2))):
                L = rng.randint(24, 90)
                s = "".join(rng.choice("ACGT") for _ in range(L))
                if i % 2 and L > 30:
                    ad = "".join(
                        rng.choice("ACGT") if c == "N" else c for c in tpl
                    )
                    p = rng.randint(5, L - 12)
                    s = (s[:p] + ad + s[p:])[:L]
                f.write(f"@w{i}/{side+1}\n{s}\n+\n{'I' * len(s)}\n")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out1 = tmp_path / f"wo1-{env}.fastq"
        wild = tmp_path / f"wild-{env}.txt"
        main(["--quiet", "--pair-adapters", "-a", "x=" + a1,
              "-A", "X=" + a2, "--wildcard-file", str(wild),
              "-o", str(out1), "-p", str(tmp_path / f"wo2-{env}.fastq"),
              str(p1), str(p2)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        outs[env] = (out1.read_bytes(),
                     (tmp_path / f"wo2-{env}.fastq").read_bytes(),
                     wild.read_bytes())
    assert outs["1"] == outs["0"]
    assert outs["1"][2], "wildcard file unexpectedly empty"


RC_EDIT_CONFIGS = [
    ("strip_xy", ["--revcomp", "--strip-suffix", "/1", "-y", " z{name}",
                  "--zero-cap"]),
    ("lentag", ["--revcomp", "--length-tag", "length="]),
    ("rename", ["-u", "3", "-u", "-2", "--revcomp", "--rename",
                "{id} r={rc} a={adapter_name} m={match_sequence} "
                "p={cut_prefix} s={cut_suffix}"]),
    ("routed_filter", ["--revcomp", "--strip-suffix", "/1", "-m", "15"]),
]


@pytest.mark.parametrize("name,args", RC_EDIT_CONFIGS,
                         ids=[c[0] for c in RC_EDIT_CONFIGS])
def test_fastpath_revcomp_with_name_edits(tmp_path, monkeypatch, name,
                                          args):
    """--revcomp combined with name edits / --rename / --zero-cap: the
    orientation choice (and its ' rc' suffix or {rc} field) must land
    before the edits, host modifier order. Reads carry the adapter in
    both orientations so rc genuinely wins for a share of them."""
    spy = _spy_engagement(monkeypatch)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rng = random.Random(41)
    inp = tmp_path / "rc.fastq"
    with open(inp, "w") as f:
        for i in range(500):
            L = rng.randint(22, 90)
            s = "".join(rng.choice("ACGT") for _ in range(L))
            if rng.random() < 0.6 and L > 28:
                p = rng.randint(5, L - 12)
                s = (s[:p] + A3 + s[p:])[:L]
                if rng.random() < 0.5:
                    s = "".join(comp[c] for c in reversed(s))
            q = "".join(chr(rng.randint(20, 72)) for _ in s)
            f.write(f"@e{i}/1 c{i}\n{s}\n+\n{q}\n")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"rco-{env}.fastq"
        rep = tmp_path / f"rcrep-{env}.json"
        main(["--quiet", "--json", str(rep), "-a", "a1=" + A3]
             + args + ["-o", str(out), str(inp)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        r = json.load(open(rep))
        r["command_line_arguments"] = None
        outs[env] = (out.read_bytes(), r)
    assert outs["1"][0] == outs["0"][0], name
    assert outs["1"][1] == outs["0"][1], name
    assert outs["1"][1]["read_counts"]["reverse_complemented"], name


def _make_rc_reads(path, seed=47, n=500, adapters=("AGATCGGAAGAGCACACGTC",)):
    """Reads carrying an adapter in forward or reverse-complement
    orientation (so --revcomp picks rc for a real share)."""
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rng = random.Random(seed)
    with open(path, "w") as f:
        for i in range(n):
            L = rng.randint(24, 90)
            s = "".join(rng.choice("ACGT") for _ in range(L))
            if rng.random() < 0.6 and L > 28:
                ad = rng.choice(adapters)
                ad = "".join(
                    rng.choice("ACGT") if c == "N" else c for c in ad
                )
                p = rng.randint(5, L - 12)
                s = (s[:p] + ad + s[p:])[:L]
                if rng.random() < 0.5:
                    s = "".join(comp[c] for c in reversed(s))
            q = "".join(chr(rng.randint(25, 72)) for _ in s)
            f.write(f"@r{i}/1 c{i}\n{s}\n+\n{q}\n")


def test_fastpath_revcomp_content_predicates(tmp_path, monkeypatch):
    """--revcomp with --max-n/--max-ee/--max-aer: the predicates must
    read the chosen orientation's window bytes (N counts and quality
    sums over a trimmed window differ between orientations)."""
    spy = _spy_engagement(monkeypatch)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    rng = random.Random(67)
    inp = tmp_path / "cf.fastq"
    with open(inp, "w") as f:
        for i in range(600):
            L = rng.randint(24, 90)
            s = "".join(rng.choice("ACGTACGTN") for _ in range(L))
            if rng.random() < 0.6 and L > 28:
                p = rng.randint(5, L - 12)
                s = (s[:p] + A3 + s[p:])[:L]
                if rng.random() < 0.5:
                    s = "".join(comp[c] for c in reversed(s))
            q = "".join(chr(rng.randint(35, 72)) for _ in s)
            f.write(f"@n{i}\n{s}\n+\n{q}\n")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"cfo-{env}.fastq"
        rep = tmp_path / f"cfrep-{env}.json"
        main(["--quiet", "--json", str(rep), "-q", "10", "-a", "a1=" + A3,
              "--revcomp", "--max-n", "2", "--max-ee", "6",
              "--max-aer", "0.01", "-m", "12",
              "-o", str(out), str(inp)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        r = json.load(open(rep))
        r["command_line_arguments"] = None
        outs[env] = (out.read_bytes(), r)
    assert outs["1"] == outs["0"]
    filtered = outs["1"][1]["read_counts"]["filtered"]
    assert filtered["too_many_n"], "max-n filter never fired"


def test_fastpath_mask_content_predicates(tmp_path, monkeypatch):
    """--action=mask with --max-n: the host predicate counts Ns in the
    MASKED read (masked bytes are all N), so the engine must add the
    masked byte count to the remainder window's N count. --max-ee and
    -m are unaffected (qualities untouched, full-extent lengths) but
    ride along to pin that. Fractional --max-n divides by the full
    extent length too."""
    spy = _spy_engagement(monkeypatch)
    rng = random.Random(91)
    inp = tmp_path / "mk.fastq"
    with open(inp, "w") as f:
        for i in range(800):
            L = rng.randint(25, 80)
            s = "".join(rng.choice("ACGTN") for _ in range(L))
            if rng.random() < 0.6:
                p = rng.randint(5, max(6, L - 14))
                s = (s[:p] + A3 + s[p:])[:L]
            q = "".join(chr(rng.randint(35, 72)) for _ in s)
            f.write(f"@m{i}\n{s}\n+\n{q}\n")
    for maxn in ("3", "0.2"):
        outs = {}
        for env in ("1", "0"):
            monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
            out = tmp_path / f"mk-{maxn}-{env}.fastq"
            rep = tmp_path / f"mkrep-{maxn}-{env}.json"
            main(["--quiet", "--json", str(rep), "--action=mask",
                  "-a", "a1=" + A3, "--max-n", maxn, "--max-ee", "8",
                  "-m", "30", "-o", str(out), str(inp)])
            if env == "1":
                assert spy.get("engaged"), "batch path did not engage"
            r = json.load(open(rep))
            r["command_line_arguments"] = None
            outs[env] = (out.read_bytes(), r)
        assert outs["1"] == outs["0"]
        filtered = outs["1"][1]["read_counts"]["filtered"]
        assert filtered["too_many_n"], "max-n filter never fired"


def test_fastpath_revcomp_fasta_in(tmp_path, monkeypatch):
    """--revcomp with FASTA input: the rc copy complements sequences
    only (FASTA chunks alias quality offsets to the sequence), and
    demux/--rename ride the orientation-selected chunk."""
    spy = _spy_engagement(monkeypatch)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    rng = random.Random(96)
    b3 = "TTCCGGAACCGG"
    inp = tmp_path / "rcf.fasta"
    with open(inp, "w") as f:
        for i in range(700):
            L = rng.randint(25, 85)
            s = "".join(rng.choice("ACGTN") for _ in range(L))
            if rng.random() < 0.6:
                p = rng.randint(5, max(6, L - 14))
                ad = A3 if rng.random() < 0.6 else b3
                s = (s[:p] + ad + s[p:])[:L]
                if rng.random() < 0.5:
                    s = "".join(comp[c] for c in reversed(s))
            f.write(f">f{i} c\n{s}\n")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        d = tmp_path / f"rcf-{env}"
        d.mkdir()
        main(["--quiet", "--json", str(d / "r.json"), "--revcomp",
              "-a", "a1=" + A3, "-a", "a2=" + b3, "--max-n", "4",
              "--rename", "{id} ad={adapter_name}",
              "--untrimmed-output", str(d / "un.fasta"),
              "-o", str(d / "{name}.fasta"), str(inp)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        rep = json.load(open(d / "r.json"))
        rep["command_line_arguments"] = None
        outs[env] = (
            {p.name: p.read_bytes()
             for p in sorted(d.iterdir()) if p.suffix == ".fasta"},
            rep,
        )
    assert outs["1"] == outs["0"]
    assert outs["1"][1]["read_counts"]["reverse_complemented"] > 50


def test_fastpath_paired_revcomp_fasta_in(tmp_path, monkeypatch):
    """Paired --revcomp on FASTA inputs: the orientation swap carries
    no quality bytes at all."""
    spy = _spy_engagement(monkeypatch)
    rng = random.Random(97)
    a1, a2 = "AGATCGGAAGAGC", "CTGTCTCTTATAC"
    in1 = tmp_path / "pf1.fasta"
    in2 = tmp_path / "pf2.fasta"
    with open(in1, "w") as f1, open(in2, "w") as f2:
        for i in range(700):
            L = rng.randint(30, 90)
            s1 = "".join(rng.choice("ACGT") for _ in range(L))
            s2 = "".join(rng.choice("ACGT") for _ in range(L))
            p = rng.randint(5, max(6, L - 14))
            r = rng.random()
            if r < 0.35:
                s1 = (s1[:p] + a1 + s1[p:])[:L]
            elif r < 0.7:
                s2 = (s2[:p] + a1 + s2[p:])[:L]
            f1.write(f">p{i} x\n{s1}\n")
            f2.write(f">p{i} x\n{s2}\n")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        d = tmp_path / f"pfr-{env}"
        d.mkdir()
        main(["--quiet", "--json", str(d / "r.json"), "--revcomp",
              "-a", f"ad1={a1}", "-A", f"ad2={a2}", "-m", "15",
              "-o", str(d / "o1.fasta"), "-p", str(d / "o2.fasta"),
              str(in1), str(in2)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        rep = json.load(open(d / "r.json"))
        rep["command_line_arguments"] = None
        outs[env] = (
            (d / "o1.fasta").read_bytes(), (d / "o2.fasta").read_bytes(),
            rep,
        )
    assert outs["1"] == outs["0"]
    assert outs["1"][2]["read_counts"]["reverse_complemented"] > 50


@pytest.mark.parametrize("extra", [
    ["--rename", "{id}_{adapter_name} {comment}"],
    ["--strip-suffix", "x"],
    ["--length-tag", "length="],
], ids=["rename", "strip", "lentag"])
def test_fastpath_casava_revcomp_name_edits(tmp_path, monkeypatch,
                                            extra):
    """--discard-casava with --revcomp and name edits / --rename: the
    casava filter reads the edited headers, and the edits see the
    chosen orientation's ' rc' suffix (the pre-filter hook selects the
    orientation before editing)."""
    spy = _spy_engagement(monkeypatch)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rng = random.Random(98)
    inp = tmp_path / "cas.fastq"
    with open(inp, "w") as f:
        for i in range(800):
            L = rng.randint(25, 80)
            s = "".join(rng.choice("ACGT") for _ in range(L))
            if rng.random() < 0.6:
                p = rng.randint(5, max(6, L - 14))
                s = (s[:p] + A3 + s[p:])[:L]
                if rng.random() < 0.5:
                    s = "".join(comp[c] for c in reversed(s))
            flag = "Y" if rng.random() < 0.3 else "N"
            f.write(f"@c{i} 1:{flag}:0:ATCACG\n{s}\n+\n{'I' * len(s)}\n")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"cas-{env}.fastq"
        rep = tmp_path / f"casrep-{env}.json"
        main(["--quiet", "--json", str(rep), "--revcomp",
              "--discard-casava", "-a", "a1=" + A3]
             + extra + ["-o", str(out), str(inp)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        r = json.load(open(rep))
        r["command_line_arguments"] = None
        outs[env] = (out.read_bytes(), r)
    assert outs["1"] == outs["0"]
    filtered = outs["1"][1]["read_counts"]["filtered"]
    assert filtered["casava_filtered"], "casava filter never fired"


def test_fastpath_revcomp_no_trim(tmp_path, monkeypatch):
    """--revcomp with --no-trim: output keeps the chosen orientation's
    full read (plus ' rc' suffix for rc winners); matching still
    drives --discard-untrimmed."""
    spy = _spy_engagement(monkeypatch)
    inp = tmp_path / "rnt.fastq"
    _make_rc_reads(inp, seed=95)
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"rnt-{env}.fastq"
        rep = tmp_path / f"rntrep-{env}.json"
        main(["--quiet", "--json", str(rep), "--revcomp", "--no-trim",
              "-a", "a1=" + A3, "--discard-untrimmed",
              "-o", str(out), str(inp)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        r = json.load(open(rep))
        r["command_line_arguments"] = None
        outs[env] = (out.read_bytes(), r)
    assert outs["1"] == outs["0"]
    assert outs["1"][1]["read_counts"]["reverse_complemented"] > 50


@pytest.mark.parametrize("act", ["mask", "lowercase"])
def test_fastpath_revcomp_transform_actions(tmp_path, monkeypatch, act):
    """--revcomp with --action=mask/lowercase: the transform assembler
    runs on the orientation-selected chunk with the chosen
    orientation's remainder interval, and mask+--max-n counts the
    masked bytes (composition of the rc and transform paths)."""
    spy = _spy_engagement(monkeypatch)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    rng = random.Random(94)
    inp = tmp_path / "rct.fastq"
    with open(inp, "w") as f:
        for i in range(800):
            L = rng.randint(25, 85)
            s = "".join(rng.choice("ACGTN") for _ in range(L))
            if rng.random() < 0.6:
                p = rng.randint(5, max(6, L - 14))
                s = (s[:p] + A3 + s[p:])[:L]
                if rng.random() < 0.5:
                    s = "".join(comp[c] for c in reversed(s))
            q = "".join(chr(rng.randint(35, 72)) for _ in s)
            f.write(f"@rt{i} c\n{s}\n+\n{q}\n")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"rct-{act}-{env}.fastq"
        rep = tmp_path / f"rctrep-{act}-{env}.json"
        main(["--quiet", "--json", str(rep), "--revcomp",
              f"--action={act}", "-a", "a1=" + A3, "-q", "10",
              "--max-n", "4", "--max-ee", "9", "-m", "30",
              "-o", str(out), str(inp)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        r = json.load(open(rep))
        r["command_line_arguments"] = None
        outs[env] = (out.read_bytes(), r)
    assert outs["1"] == outs["0"]
    assert outs["1"][1]["read_counts"]["reverse_complemented"] > 50
    assert outs["1"][1]["read_counts"]["filtered"]["too_many_n"]


def test_fastpath_paired_transform_content_predicates(
    tmp_path, monkeypatch
):
    """Paired --action=mask/lowercase with content predicates: the
    per-side remainder intervals must feed the pair filters (mask adds
    Ns per side; lowercase leaves counts unchanged)."""
    spy = _spy_engagement(monkeypatch)
    b3 = "CTGTCTCTTATAC"
    rng = random.Random(92)
    in1 = tmp_path / "mt1.fastq"
    in2 = tmp_path / "mt2.fastq"
    with open(in1, "w") as f1, open(in2, "w") as f2:
        for i in range(800):
            L = rng.randint(25, 80)
            s1 = "".join(rng.choice("ACGTN") for _ in range(L))
            s2 = "".join(rng.choice("ACGTN") for _ in range(L))
            if rng.random() < 0.6:
                p = rng.randint(5, max(6, L - 14))
                s1 = (s1[:p] + A3 + s1[p:])[:L]
            if rng.random() < 0.5:
                p = rng.randint(5, max(6, L - 14))
                s2 = (s2[:p] + b3 + s2[p:])[:L]
            q1 = "".join(chr(rng.randint(35, 72)) for _ in s1)
            q2 = "".join(chr(rng.randint(35, 72)) for _ in s2)
            f1.write(f"@t{i} x\n{s1}\n+\n{q1}\n")
            f2.write(f"@t{i} x\n{s2}\n+\n{q2}\n")
    for act in ("mask", "lowercase"):
        outs = {}
        for env in ("1", "0"):
            monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
            o1 = tmp_path / f"mt-{act}-o1-{env}.fastq"
            o2 = tmp_path / f"mt-{act}-o2-{env}.fastq"
            rep = tmp_path / f"mtrep-{act}-{env}.json"
            main(["--quiet", "--json", str(rep), f"--action={act}",
                  "-a", "a1=" + A3, "-A", "a2=" + b3,
                  "--max-n", "3", "--max-ee", "8",
                  "--pair-filter", "any",
                  "-o", str(o1), "-p", str(o2), str(in1), str(in2)])
            if env == "1":
                assert spy.get("engaged"), "batch path did not engage"
            r = json.load(open(rep))
            r["command_line_arguments"] = None
            outs[env] = (o1.read_bytes(), o2.read_bytes(), r)
        assert outs["1"] == outs["0"]
        filtered = outs["1"][2]["read_counts"]["filtered"]
        assert filtered["too_many_n"], "max-n filter never fired"


def test_fastpath_revcomp_demux(tmp_path, monkeypatch):
    """--revcomp with {name} demultiplexing: routing ids come from the
    winning orientation's last match."""
    spy = _spy_engagement(monkeypatch)
    b3 = "TTAGGCCAATTAGGCCTTAG"
    inp = tmp_path / "rd.fastq"
    _make_rc_reads(inp, seed=53, adapters=(A3, b3))
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        d = tmp_path / f"rd-{env}"
        d.mkdir()
        main(["--quiet", "-a", "alpha=" + A3, "-a", "beta=" + b3,
              "--revcomp", "--untrimmed-output", str(d / "untr.fastq"),
              "-o", str(d / "dm-{name}.fastq"), str(inp)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        outs[env] = {
            p.name: p.read_bytes() for p in sorted(d.iterdir())
        }
    assert outs["1"] == outs["0"]
    assert len(outs["1"]) == 3


def _make_rc_pair_files(tmp_path, seed=31, n=1200,
                        a1="AGATCGGAAGAGC", a2="CTGTCTCTTATAC"):
    """Paired files where a real share of pairs matches better with
    R1/R2 swapped (adapters planted on the opposite files), so paired
    --revcomp picks the rc orientation for them."""
    rng = random.Random(seed)
    in1 = tmp_path / "rcp1.fastq"
    in2 = tmp_path / "rcp2.fastq"
    with open(in1, "w") as f1, open(in2, "w") as f2:
        for i in range(n):
            L = rng.randint(30, 90)
            s1 = "".join(rng.choice("ACGT") for _ in range(L))
            s2 = "".join(rng.choice("ACGT") for _ in range(L))
            r = rng.random()
            if r < 0.35:  # straight
                p = rng.randint(5, max(6, L - 14))
                s1 = (s1[:p] + a1 + s1[p:])[:L]
                if rng.random() < 0.5:
                    p = rng.randint(5, max(6, L - 14))
                    s2 = (s2[:p] + a2 + s2[p:])[:L]
            elif r < 0.7:  # swapped: adapters on the opposite files
                p = rng.randint(5, max(6, L - 14))
                s2 = (s2[:p] + a1 + s2[p:])[:L]
                if rng.random() < 0.5:
                    p = rng.randint(5, max(6, L - 14))
                    s1 = (s1[:p] + a2 + s1[p:])[:L]
            q1 = "".join(chr(rng.randint(35, 72)) for _ in s1)
            q2 = "".join(chr(rng.randint(35, 72)) for _ in s2)
            f1.write(f"@v{i} c{i} x\n{s1}\n+\n{q1}\n")
            f2.write(f"@v{i} c{i} x\n{s2}\n+\n{q2}\n")
    return in1, in2


@pytest.mark.parametrize("name,args", [
    ("rename_adapter", ["-g", "ad1=AGATCGGAAGAGC", "-G",
                        "ad2=CTGTCTCTTATAC", "--rename",
                        "{id}_{rn} ad={adapter_name}"]),
    ("rename_match", ["-g", "ad1=AGATCGGAAGAGC", "-G",
                      "ad2=CTGTCTCTTATAC", "--rename",
                      "{id} {comment} m={match_sequence}"]),
    ("rename_cuts", ["-u", "3", "-U", "-2", "-g", "ad1=AGATCGGAAGAGC",
                     "-G", "ad2=CTGTCTCTTATAC", "--rename",
                     "{id} p={r1.cut_prefix} s={r2.cut_suffix}"]),
    ("name_edits", ["-a", "ad1=AGATCGGAAGAGC", "-A",
                    "ad2=CTGTCTCTTATAC",
                    "--strip-suffix", " rc", "-y", " L={length}",
                    "--zero-cap"]),
    ("interleaved_out", ["-a", "ad1=AGATCGGAAGAGC", "-A",
                         "ad2=CTGTCTCTTATAC", "--interleaved"]),
    ("mask_action", ["-a", "ad1=AGATCGGAAGAGC", "-A",
                     "ad2=CTGTCTCTTATAC", "--action=mask",
                     "--max-n", "4", "--max-ee", "9"]),
    ("lowercase_action", ["-a", "ad1=AGATCGGAAGAGC", "-A",
                          "ad2=CTGTCTCTTATAC", "--action=lowercase"]),
    ("no_trim", ["-a", "ad1=AGATCGGAAGAGC", "-A", "ad2=CTGTCTCTTATAC",
                 "--no-trim", "--discard-untrimmed"]),
    ("rename_plus_edits", ["-a", "ad1=AGATCGGAAGAGC", "-A",
                           "ad2=CTGTCTCTTATAC", "--strip-suffix", " rc",
                           "--zero-cap", "--rename",
                           "{id} a={adapter_name}"]),
    ("mask_plus_rename", ["-a", "ad1=AGATCGGAAGAGC", "-A",
                          "ad2=CTGTCTCTTATAC", "--action=mask",
                          "--max-n", "5", "--rename",
                          "{id} a={adapter_name} m={match_sequence}"]),
    ("lowercase_plus_edits", ["-a", "ad1=AGATCGGAAGAGC", "-A",
                              "ad2=CTGTCTCTTATAC", "--action=lowercase",
                              "--strip-suffix", " rc", "--length-tag",
                              "length=", "--zero-cap"]),
], ids=lambda x: x if isinstance(x, str) else "")
def test_fastpath_paired_revcomp_combos(tmp_path, monkeypatch, name,
                                        args):
    """Paired --revcomp with --rename (incl. physical-side cut bytes
    and chosen-orientation match geometry), trailing name edits /
    --zero-cap, and interleaved output: all must ride the engine and
    match the host byte-for-byte."""
    spy = _spy_engagement(monkeypatch)
    in1, in2 = _make_rc_pair_files(tmp_path)
    interleaved_out = "--interleaved" in args
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        d = tmp_path / f"rcp-{name}-{env}"
        d.mkdir()
        argv = ["--quiet", "--revcomp", "--json", str(d / "r.json")]
        argv += args + ["-o", str(d / "o1.fastq")]
        if not interleaved_out:
            argv += ["-p", str(d / "o2.fastq")]
        argv += [str(in1), str(in2)]
        main(argv)
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        rep = json.load(open(d / "r.json"))
        rep["command_line_arguments"] = None
        outs[env] = (
            {p.name: p.read_bytes()
             for p in sorted(d.iterdir()) if p.suffix == ".fastq"},
            rep,
        )
    assert outs["1"] == outs["0"]
    assert outs["1"][1]["read_counts"]["reverse_complemented"] > 100


@pytest.mark.parametrize("act", ["mask", "lowercase"])
def test_fastpath_paired_rename_with_transform(tmp_path, monkeypatch,
                                               act):
    """Paired --rename with --action=mask/lowercase: rename fields
    slice the original (pre-transform) bytes like the host's match
    objects; the transform applies at write time."""
    spy = _spy_engagement(monkeypatch)
    in1, in2 = _make_rc_pair_files(tmp_path, seed=43)
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        d = tmp_path / f"rnt-{act}-{env}"
        d.mkdir()
        main(["--quiet", "--json", str(d / "r.json"), f"--action={act}",
              "-a", "ad1=AGATCGGAAGAGC", "-A", "ad2=CTGTCTCTTATAC",
              "--rename", "{id} a={adapter_name} m={match_sequence}",
              "--max-n", "5",
              "-o", str(d / "o1.fastq"), "-p", str(d / "o2.fastq"),
              str(in1), str(in2)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        rep = json.load(open(d / "r.json"))
        rep["command_line_arguments"] = None
        outs[env] = (
            (d / "o1.fastq").read_bytes(), (d / "o2.fastq").read_bytes(),
            rep,
        )
    assert outs["1"] == outs["0"]


@pytest.mark.parametrize("shape", ["two_to_il", "il_to_il", "il_to_two"])
def test_fastpath_interleaved_transform_actions(tmp_path, monkeypatch,
                                                shape):
    """mask/lowercase actions with interleaved input and/or output:
    the interleaved writer applies the transform via the per-side
    remainder intervals, including stacked with paired --revcomp."""
    spy = _spy_engagement(monkeypatch)
    in1, in2 = _make_rc_pair_files(tmp_path, seed=45)
    il = tmp_path / "ilt.fastq"
    with open(in1) as f1, open(in2) as f2, open(il, "w") as out:
        while True:
            rec1 = [f1.readline() for _ in range(4)]
            rec2 = [f2.readline() for _ in range(4)]
            if not rec1[0]:
                break
            out.writelines(rec1 + rec2)
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        d = tmp_path / f"ilt-{shape}-{env}"
        d.mkdir()
        argv = ["--quiet", "--json", str(d / "r.json"), "--action=mask",
                "-a", "ad1=AGATCGGAAGAGC", "-A", "ad2=CTGTCTCTTATAC",
                "--max-n", "5"]
        if shape == "two_to_il":
            argv += ["--revcomp", "--interleaved",
                     "-o", str(d / "o.fastq"), str(in1), str(in2)]
        elif shape == "il_to_il":
            argv += ["--interleaved", "-o", str(d / "o.fastq"), str(il)]
        else:
            argv += ["--interleaved", "-o", str(d / "o1.fastq"),
                     "-p", str(d / "o2.fastq"), str(il)]
        main(argv)
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        rep = json.load(open(d / "r.json"))
        rep["command_line_arguments"] = None
        outs[env] = (
            {p.name: p.read_bytes()
             for p in sorted(d.iterdir()) if p.suffix == ".fastq"},
            rep,
        )
    assert outs["1"] == outs["0"]
    filtered = outs["1"][1]["read_counts"]["filtered"]
    assert filtered["too_many_n"], "mask-fed max-n never fired"


@pytest.mark.parametrize("post", [["--trim-n"], ["--poly-a"]],
                         ids=["trim_n", "poly_a"])
def test_fastpath_paired_revcomp_transform_post_stage(tmp_path,
                                                      monkeypatch,
                                                      post):
    """A transforming paired --revcomp with a sequence-reading post
    stage (--trim-n/--poly-a) must fall back to the host path: those
    stages read the TRANSFORMED bytes on the host (lowercased 'n' is
    not trimmed, masked N is), which the engine's window stages do
    not see. Pinned here so the gate is not removed without an
    implementation (found by the parity fuzzer on lowercase+trim-n)."""
    spy = _spy_engagement(monkeypatch)
    rng = random.Random(99)
    in1 = tmp_path / "pp1.fastq"
    in2 = tmp_path / "pp2.fastq"
    with open(in1, "w") as f1, open(in2, "w") as f2:
        for i in range(400):
            L = rng.randint(30, 80)
            s1 = "".join(rng.choice("ACGTN") for _ in range(L))
            s2 = "".join(rng.choice("ACGTN") for _ in range(L))
            if rng.random() < 0.6:
                p = rng.randint(5, max(6, L - 14))
                s1 = (s1[:p] + A3 + s1[p:])[:L]
            q = "I" * L
            f1.write(f"@pp{i}\n{s1}\n+\n{q}\n")
            f2.write(f"@pp{i}\n{s2}\n+\n{q}\n")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        d = tmp_path / f"pp-{post[0][2:]}-{env}"
        d.mkdir()
        main(["--quiet", "--json", str(d / "r.json"), "--revcomp",
              "--action=lowercase", "-a", "ad1=" + A3,
              "-A", "ad2=CTGTCTCTTATAC"] + post +
             ["-o", str(d / "o1.fastq"), "-p", str(d / "o2.fastq"),
              str(in1), str(in2)])
        if env == "1":
            assert not spy.get("engaged"), (
                "combo engaged the engine without transformed-byte "
                "support in the post stages"
            )
        rep = json.load(open(d / "r.json"))
        rep["command_line_arguments"] = None
        outs[env] = (
            (d / "o1.fastq").read_bytes(), (d / "o2.fastq").read_bytes(),
            rep,
        )
    assert outs["1"] == outs["0"]


def test_fastpath_paired_rename_with_name_edits(tmp_path, monkeypatch):
    """Paired --rename combined with --strip-suffix/--length-tag/
    --zero-cap (legal combos; only -x/-y conflict with --rename):
    edits apply per side first, then the renamer sees the edited
    names, matching the host's modifier order."""
    spy = _spy_engagement(monkeypatch)
    in1, in2 = _make_rc_pair_files(tmp_path, seed=39)
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        d = tmp_path / f"rne-{env}"
        d.mkdir()
        main(["--quiet", "--json", str(d / "r.json"),
              "-a", "ad1=AGATCGGAAGAGC", "-A", "ad2=CTGTCTCTTATAC",
              "--strip-suffix", " x", "--length-tag", "length=",
              "--zero-cap", "--rename", "{id} L={comment} a={adapter_name}",
              "-q", "10", "--max-ee", "9",
              "-o", str(d / "o1.fastq"), "-p", str(d / "o2.fastq"),
              str(in1), str(in2)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        rep = json.load(open(d / "r.json"))
        rep["command_line_arguments"] = None
        outs[env] = (
            (d / "o1.fastq").read_bytes(), (d / "o2.fastq").read_bytes(),
            rep,
        )
    assert outs["1"] == outs["0"]


@pytest.mark.parametrize("inter_out", [False, True],
                         ids=["two_files_out", "interleaved_out"])
def test_fastpath_paired_revcomp_interleaved_in(tmp_path, monkeypatch,
                                                inter_out):
    """Paired --revcomp with interleaved input (and optionally
    interleaved output): the orientation swap applies to the
    de-interleaved pair chunks."""
    spy = _spy_engagement(monkeypatch)
    in1, in2 = _make_rc_pair_files(tmp_path, seed=37)
    inp = tmp_path / "rcil.fastq"
    with open(in1) as f1, open(in2) as f2, open(inp, "w") as out:
        while True:
            rec1 = [f1.readline() for _ in range(4)]
            rec2 = [f2.readline() for _ in range(4)]
            if not rec1[0]:
                break
            out.writelines(rec1 + rec2)
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        d = tmp_path / f"rcil-{inter_out}-{env}"
        d.mkdir()
        argv = ["--quiet", "--interleaved", "--revcomp",
                "--json", str(d / "r.json"),
                "-g", "ad1=AGATCGGAAGAGC", "-G", "ad2=CTGTCTCTTATAC",
                "-m", "20", "-o", str(d / "o1.fastq")]
        if not inter_out:
            argv += ["-p", str(d / "o2.fastq")]
        argv += [str(inp)]
        main(argv)
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        rep = json.load(open(d / "r.json"))
        rep["command_line_arguments"] = None
        outs[env] = (
            {p.name: p.read_bytes()
             for p in sorted(d.iterdir()) if p.suffix == ".fastq"},
            rep,
        )
    assert outs["1"] == outs["0"]
    assert outs["1"][1]["read_counts"]["reverse_complemented"] > 100


@pytest.mark.parametrize("combinatorial", [False, True],
                         ids=["paired", "combinatorial"])
def test_fastpath_paired_revcomp_demux(tmp_path, monkeypatch,
                                       combinatorial):
    """Paired --revcomp with {name} / {name1}_{name2} demultiplexing:
    routing gids come from the chosen orientation's matches."""
    spy = _spy_engagement(monkeypatch)
    in1, in2 = _make_rc_pair_files(tmp_path, seed=33)
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        d = tmp_path / f"rcd-{combinatorial}-{env}"
        d.mkdir()
        argv = ["--quiet", "--revcomp", "--json", str(d / "r.json"),
                "-g", "b1=AGATCGGAAGAGC", "-g", "b2=TTCCGGAACCGG"]
        if combinatorial:
            argv += ["-G", "c1=CTGTCTCTTATAC", "-G", "c2=GGAACCTTGGAA",
                     "-o", str(d / "{name1}_{name2}.1.fastq"),
                     "-p", str(d / "{name1}_{name2}.2.fastq")]
        else:
            argv += ["-G", "ad2=CTGTCTCTTATAC",
                     "-o", str(d / "{name}.1.fastq"),
                     "-p", str(d / "{name}.2.fastq"),
                     "--untrimmed-output", str(d / "un.1.fastq"),
                     "--untrimmed-paired-output", str(d / "un.2.fastq")]
        argv += [str(in1), str(in2)]
        main(argv)
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        rep = json.load(open(d / "r.json"))
        rep["command_line_arguments"] = None
        outs[env] = (
            {p.name: p.read_bytes()
             for p in sorted(d.iterdir()) if p.suffix == ".fastq"},
            rep,
        )
    assert outs["1"] == outs["0"]
    assert len(outs["1"][0]) >= 4


@pytest.mark.parametrize("extra", [
    [],
    ["--zero-cap"],
    ["--strip-suffix", "/1", "-y", " k{name}"],
], ids=["plain", "zerocap", "edits"])
def test_fastpath_revcomp_side_files(tmp_path, monkeypatch, extra):
    """--revcomp with --rest-file / --info-file / --wildcard-file:
    rows slice the orientation-selected chunk and info match rows
    carry the '1'/'0' is_rc column (InfoFileWriter.RC_MAP)."""
    spy = _spy_engagement(monkeypatch)
    an = "AGATCNGAAGAGCNCACGTC"
    inp = tmp_path / "rs.fastq"
    _make_rc_reads(inp, seed=59, adapters=(an,))
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        d = tmp_path / f"rs-{env}"
        d.mkdir()
        main(["--quiet", "-u", "2", "-a", "a1=" + an, "--revcomp"]
             + extra +
             ["-r", str(d / "rest.txt"), "--info-file", str(d / "info.tsv"),
              "--wildcard-file", str(d / "wild.txt"),
              "-o", str(d / "o.fastq"), str(inp)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        outs[env] = {
            p.name: p.read_bytes() for p in sorted(d.iterdir())
        }
    assert outs["1"] == outs["0"]
    assert b"\t1\n" in outs["1"]["info.tsv"], "no rc-flagged info rows"


def test_fastpath_info_file_with_zero_cap(tmp_path, monkeypatch):
    """--zero-cap + --info-file: the host writes match rows from
    info.original_read (quals captured BEFORE the cap) but -1 rows
    from the current, capped read; sub-'!' quality bytes here make
    that distinction visible."""
    spy = _spy_engagement(monkeypatch)
    rng = random.Random(17)
    inp = tmp_path / "in.fastq"
    with open(inp, "w") as f:
        for i in range(400):
            L = rng.randint(25, 80)
            s = "".join(rng.choice("ACGT") for _ in range(L))
            if rng.random() < 0.5:
                p = rng.randint(5, L - 10)
                s = (s[:p] + A3 + s[p:])[:L]
            q = "".join(chr(rng.randint(20, 72)) for _ in s)
            f.write(f"@q{i}\n{s}\n+\n{q}\n")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"qo-{env}.fastq"
        info = tmp_path / f"qinfo-{env}.tsv"
        main(["--quiet", "-a", "a1=" + A3, "--zero-cap",
              "--info-file", str(info), "-o", str(out), str(inp)])
        if env == "1":
            assert spy.get("engaged")
        outs[env] = (out.read_bytes(), info.read_bytes())
    assert outs["1"][0] == outs["0"][0]
    assert outs["1"][1] == outs["0"][1], "info file differs"
    assert outs["1"][1], "info file unexpectedly empty"


def test_fastpath_revcomp_fasta_out(tmp_path, monkeypatch):
    """--revcomp with FASTA output: each read's chosen orientation is
    selected from the shared-offset rc copy, with the ' rc' suffix."""
    spy = _spy_engagement(monkeypatch)
    inputs = make_reads(tmp_path / "rc.fastq")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"rc-{env}.fasta"
        main(["--quiet", "-a", "a1=" + A3, "--revcomp", "-m", "12",
              "-o", str(out)] + [str(p) for p in inputs])
        if env == "1":
            assert spy.get("engaged")
        outs[env] = out.read_bytes()
    assert outs["1"] == outs["0"]
    assert b" rc\n" in outs["1"] or b" rc " in outs["1"]


@pytest.mark.parametrize("action,fasta_in", [
    ("mask", False), ("lowercase", False), ("mask", True),
], ids=["mask", "lowercase", "mask-fasta-in"])
def test_fastpath_transform_fasta_out(tmp_path, monkeypatch, action, fasta_in):
    """--action=mask/lowercase with FASTA output (and FASTA input):
    the numpy FASTA transform assembler mirrors the native FASTQ one."""
    spy = _spy_engagement(monkeypatch)
    rng = random.Random(19)
    inp = tmp_path / ("in.fasta" if fasta_in else "in.fastq")
    with open(inp, "w") as f:
        for i in range(400):
            L = rng.randint(25, 80)
            s = "".join(rng.choice("ACGTacgt") for _ in range(L))
            if rng.random() < 0.5:
                p = rng.randint(5, L - 10)
                s = (s[:p] + A3 + s[p:])[:L]
            if fasta_in:
                f.write(f">t{i}\n{s}\n")
            else:
                f.write(f"@t{i}\n{s}\n+\n{'I' * len(s)}\n")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"to-{env}.fasta"
        main(["--quiet", "-a", "a1=" + A3, f"--action={action}",
              "-o", str(out), str(inp)])
        if env == "1":
            assert spy.get("engaged")
        outs[env] = out.read_bytes()
    assert outs["1"] == outs["0"]
    assert (b"N" * 10 in outs["1"]) if action == "mask" else True


@pytest.mark.parametrize("case", ["plain", "mixed", "lowercase", "revcomp"])
def test_fastpath_paired_fasta_output(tmp_path, monkeypatch, case):
    """Paired FASTQ input with FASTA outputs (per-side formats can
    differ), including the transform action and paired --revcomp."""
    spy = _spy_engagement(monkeypatch)
    inputs = make_reads(tmp_path / "pf.fastq", paired=True)
    extra = {
        "plain": ["-q", "10"],
        "mixed": [],
        "lowercase": ["--action=lowercase"],
        "revcomp": ["--revcomp"],
    }[case]
    ext2 = "fastq" if case == "mixed" else "fasta"
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        o1 = tmp_path / f"pf1-{env}.fasta"
        o2 = tmp_path / f"pf2-{env}.{ext2}"
        main(["--quiet", "-a", "a1=" + A3, "-A", "a2=" + A5] + extra +
             ["-o", str(o1), "-p", str(o2)] + [str(p) for p in inputs])
        if env == "1":
            assert spy.get("engaged")
        outs[env] = o1.read_bytes() + b"\x00" + o2.read_bytes()
    assert outs["1"] == outs["0"]


def test_fastpath_linked_info_file(tmp_path, monkeypatch):
    """--info-file with linked adapters: two rows per match with
    ';1'/';2' name suffixes (reference LinkedMatch.get_info_records);
    mixed with a plain adapter and --times 2."""
    spy = _spy_engagement(monkeypatch)
    inputs = make_reads(tmp_path / "ln.fastq")
    linked = A5[:10] + "..." + A3[:12]
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"lo-{env}.fastq"
        info = tmp_path / f"linfo-{env}.tsv"
        main(["--quiet", "-g", "l1=" + linked, "-a", "a9=" + A3,
              "--times", "2", "--info-file", str(info),
              "-o", str(out)] + [str(p) for p in inputs])
        if env == "1":
            assert spy.get("engaged")
        outs[env] = (out.read_bytes(), info.read_bytes())
    assert outs["1"][0] == outs["0"][0]
    assert outs["1"][1] == outs["0"][1], "info file differs"
    assert b"l1;1" in outs["1"][1] and b"l1;2" in outs["1"][1]


def test_fastpath_paired_rename_with_linked(tmp_path, monkeypatch):
    """Paired --rename with a linked adapter on R1 (regression: the
    batch path crashed with KeyError('ws') on linked match events)."""
    spy = _spy_engagement(monkeypatch)
    inputs = make_reads(tmp_path / "lr.fastq", paired=True)
    linked = A5[:10] + "..." + A3[:12]
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        o1 = tmp_path / f"lr1-{env}.fastq"
        o2 = tmp_path / f"lr2-{env}.fastq"
        main(["--quiet", "-g", "l1=" + linked, "-A", "a2=" + A5,
              "--rename", "{id} k={adapter_name}",
              "-o", str(o1), "-p", str(o2)] + [str(p) for p in inputs])
        if env == "1":
            assert spy.get("engaged")
        outs[env] = o1.read_bytes() + b"\x00" + o2.read_bytes()
    assert outs["1"] == outs["0"]


def test_fastpath_pair_adapters_side_files(tmp_path, monkeypatch):
    """--pair-adapters with --info-file/--info-file-paired/-r: match
    events recorded by the pair matcher feed the side-channel rows."""
    spy = _spy_engagement(monkeypatch)
    inputs = make_reads(tmp_path / "pa.fastq", paired=True)
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        files = {k: tmp_path / f"pa-{k}-{env}" for k in
                 ("o1", "o2", "info", "info2", "rest")}
        main(["--quiet", "--pair-adapters", "-a", "a1=" + A3,
              "-A", "a2=" + A5,
              "--info-file", str(files["info"]),
              "--info-file-paired", str(files["info2"]),
              "-r", str(files["rest"]),
              "-o", str(files["o1"]), "-p", str(files["o2"])]
             + [str(p) for p in inputs])
        if env == "1":
            assert spy.get("engaged")
        outs[env] = {k: f.read_bytes() for k, f in files.items()}
    for k in outs["1"]:
        assert outs["1"][k] == outs["0"][k], f"{k} differs"
    assert outs["1"]["info"] and outs["1"]["info2"]


def test_fastpath_paired_fasta_input(tmp_path, monkeypatch):
    """Paired FASTA input (multi-line records included) through the
    batch path; outputs must be FASTA, quality options stay host-side."""
    spy = _spy_engagement(monkeypatch)
    rng = random.Random(21)
    p1, p2 = tmp_path / "f1.fasta", tmp_path / "f2.fasta"
    for pi, p in enumerate((p1, p2)):
        with open(p, "w") as f:
            for i in range(400):
                L = rng.randint(25, 80)
                s = "".join(rng.choice("ACGT") for _ in range(L))
                if rng.random() < 0.5:
                    pos = rng.randint(5, L - 10)
                    a = A5 if pi else A3
                    s = (s[:pos] + a + s[pos:])[:L]
                if rng.random() < 0.3:
                    mid = L // 2
                    f.write(f">r{i} c\n{s[:mid]}\n{s[mid:]}\n")
                else:
                    f.write(f">r{i} c\n{s}\n")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        o1 = tmp_path / f"fo1-{env}.fasta"
        o2 = tmp_path / f"fo2-{env}.fasta"
        main(["--quiet", "-a", "a1=" + A3, "-A", "a2=" + A5, "-m", "20",
              "-o", str(o1), "-p", str(o2), str(p1), str(p2)])
        if env == "1":
            assert spy.get("engaged")
        outs[env] = o1.read_bytes() + b"\x00" + o2.read_bytes()
    assert outs["1"] == outs["0"]


def test_fastpath_wildcard_file(tmp_path, monkeypatch):
    spy = _spy_engagement(monkeypatch)
    rng = random.Random(15)
    wc_adapter = "AGNNCGGANGAGC"
    inp = tmp_path / "in.fastq"
    with open(inp, "w") as f:
        for i in range(500):
            L = rng.randint(20, 80)
            s = "".join(rng.choice("ACGT") for _ in range(L))
            if rng.random() < 0.5 and L > 25:
                concrete = "".join(
                    rng.choice("ACGT") if c == "N" else c
                    for c in wc_adapter
                )
                p = rng.randint(5, L - 10)
                s = (s[:p] + concrete + s[p:])[:L]
            f.write(f"@w{i}\n{s}\n+\n{'I' * len(s)}\n")
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"o-{env}.fastq"
        wc = tmp_path / f"wc-{env}.txt"
        main(["--quiet", "-a", "wca=" + wc_adapter, "-g", "g1=^TTTTGGGG",
              "--wildcard-file", str(wc), "-o", str(out), str(inp)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        outs[env] = (out.read_bytes(), wc.read_bytes())
    assert outs["1"][0] == outs["0"][0]
    assert outs["1"][1] == outs["0"][1], "wildcard file differs"
    assert outs["1"][1], "wildcard file unexpectedly empty"


def test_fastpath_paired_rename(tmp_path, monkeypatch):
    spy = _spy_engagement(monkeypatch)
    inputs = make_reads(tmp_path / "in.fastq", paired=True)
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out1 = tmp_path / f"o1-{env}.fastq"
        out2 = tmp_path / f"o2-{env}.fastq"
        main(["--quiet", "-u", "2", "-a", "a1=" + A3, "-A", "a2=" + A5,
              "--rename",
              "{id} r{rn} a1={r1.adapter_name} a2={r2.adapter_name} "
              "p={cut_prefix} own={adapter_name}",
              "-o", str(out1), "-p", str(out2)]
             + [str(p) for p in inputs])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        outs[env] = out1.read_bytes() + b"\x00" + out2.read_bytes()
    assert outs["1"] == outs["0"]


def test_fastpath_bam_input(tmp_path, monkeypatch):
    spy = _spy_engagement(monkeypatch)
    import struct

    def bam_record(name, seq, quals, flag=0):
        codes = "=ACMGRSVTWYHKDBN"
        packed = bytearray()
        for i in range(0, len(seq), 2):
            hi = codes.index(seq[i])
            lo = codes.index(seq[i + 1]) if i + 1 < len(seq) else 0
            packed.append((hi << 4) | lo)
        body = (
            struct.pack(
                "<iiBBHHHiiii", -1, -1, len(name) + 1, 0, 0, 0, flag,
                len(seq), -1, -1, 0,
            )
            + name.encode() + b"\x00" + bytes(packed)
            + bytes(q - 33 for q in quals.encode())
        )
        return struct.pack("<i", len(body)) + body

    rng = random.Random(33)
    records = b""
    for i in range(400):
        L = rng.randint(20, 80)
        s = "".join(rng.choice("ACGT") for _ in range(L))
        if rng.random() < 0.5 and L > 25:
            p = rng.randint(5, L - 10)
            s = (s[:p] + A3 + s[p:])[:L]
        q = "".join(chr(rng.randint(35, 72)) for _ in range(len(s)))
        records += bam_record(f"b{i}", s, q, flag=16 if i % 5 == 0 else 0)
    header = b"BAM\x01" + struct.pack("<i", 0) + struct.pack("<i", 0)
    inp = tmp_path / "in.bam"
    inp.write_bytes(header + records)

    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_BATCH", env)
        out = tmp_path / f"o-{env}.fastq"
        main(["--quiet", "-a", "a1=" + A3, "-q", "10", "-m", "10",
              "-o", str(out), str(inp)])
        if env == "1":
            assert spy.get("engaged"), "batch path did not engage"
        outs[env] = out.read_bytes()
    assert outs["1"] == outs["0"]
    assert outs["1"].startswith(b"@")


def test_pooled_drive_single_end(tmp_path, monkeypatch):
    """-j N on the batch path: N worker threads each run the full host
    side for their chunk and the committer replays output writes in
    input order — every file must be byte-identical to the serial
    drive (demux outputs, side files, and routed filter outputs
    included), and the order-independent stats folds must produce an
    identical report."""
    spy = _spy_engagement(monkeypatch)
    rng = random.Random(71)
    inp = tmp_path / "pool.fastq"
    with open(inp, "w") as f:
        for i in range(4000):
            L = rng.randint(18, 100)
            s = "".join(rng.choice("ACGTN") for _ in range(L))
            if rng.random() < 0.5 and L > 28:
                p = rng.randint(3, L - 18)
                s = (s[:p] + A3 + s[p:])[:L]
            q = "".join(chr(rng.randint(35, 72)) for _ in s)
            f.write(f"@w{i} c\n{s}\n+\n{q}\n")
    # small chunks so several are in flight per worker
    monkeypatch.setenv("CUTADAPT_TPU_CHUNK_BYTES", "40000")
    monkeypatch.setenv("CUTADAPT_TPU_BATCH", "1")
    outs = {}
    for workers in ("1", "3"):
        monkeypatch.setenv("CUTADAPT_TPU_WORKERS", workers)
        d = tmp_path / f"po-{workers}"
        d.mkdir()
        main(["--quiet", "--json", str(d / "r.json"),
              "-a", "a1=" + A3, "-q", "10", "-m", "12", "--max-n", "3",
              "--info-file", str(d / "info.txt"),
              "--too-short-output", str(d / "short.fastq"),
              "-o", str(d / "out.fastq"), str(inp)])
        assert spy.get("engaged"), "batch path did not engage"
        rep = json.load(open(d / "r.json"))
        rep["command_line_arguments"] = None
        outs[workers] = (
            (d / "out.fastq").read_bytes(),
            (d / "short.fastq").read_bytes(),
            (d / "info.txt").read_bytes(),
            rep,
        )
    assert outs["1"] == outs["3"]


def test_pooled_drive_paired_demux(tmp_path, monkeypatch):
    """Paired pooled drive with {name} demultiplexing: per-file record
    order and the merged written-length statistics must not depend on
    worker completion order."""
    spy = _spy_engagement(monkeypatch)
    rng = random.Random(72)
    barcodes = ["ACGTACGT", "TTGGCCAA"]
    in1 = tmp_path / "p1.fastq"
    in2 = tmp_path / "p2.fastq"
    with open(in1, "w") as f1, open(in2, "w") as f2:
        for i in range(3000):
            L = rng.randint(20, 90)
            s1 = "".join(rng.choice("ACGT") for _ in range(L))
            if rng.random() < 0.7:
                s1 = rng.choice(barcodes) + s1[8:]
            s2 = "".join(rng.choice("ACGT") for _ in range(L))
            q = "".join(chr(rng.randint(35, 72)) for _ in range(L))
            f1.write(f"@d{i} x\n{s1}\n+\n{q}\n")
            f2.write(f"@d{i} x\n{s2}\n+\n{q}\n")
    monkeypatch.setenv("CUTADAPT_TPU_CHUNK_BYTES", "30000")
    monkeypatch.setenv("CUTADAPT_TPU_BATCH", "1")
    outs = {}
    for workers in ("1", "4"):
        monkeypatch.setenv("CUTADAPT_TPU_WORKERS", workers)
        d = tmp_path / f"pd-{workers}"
        d.mkdir()
        main(["--quiet", "--json", str(d / "r.json"),
              "-g", "b1=ACGTACGT", "-g", "b2=TTGGCCAA", "-q", "10",
              "-o", str(d / "{name}.1.fastq"),
              "-p", str(d / "{name}.2.fastq"),
              "--untrimmed-output", str(d / "un.1.fastq"),
              "--untrimmed-paired-output", str(d / "un.2.fastq"),
              str(in1), str(in2)])
        assert spy.get("engaged"), "batch path did not engage"
        rep = json.load(open(d / "r.json"))
        rep["command_line_arguments"] = None
        files = {
            p.name: p.read_bytes()
            for p in sorted(d.iterdir()) if p.suffix == ".fastq"
        }
        outs[workers] = (files, rep)
    assert outs["1"] == outs["4"]


def test_pooled_drive_error_in_order(tmp_path, monkeypatch):
    """A malformed record must fail the pooled drive with the serial
    drive's error (first error in input order), not a worker-race
    artifact."""
    rng = random.Random(73)
    inp = tmp_path / "bad.fastq"
    with open(inp, "w") as f:
        for i in range(2000):
            s = "".join(rng.choice("ACGT") for _ in range(50))
            q = "I" * 50
            f.write(f"@e{i}\n{s}\n+\n{q}\n")
        f.write("@trunc\nACGT\n+\nII\n")  # length mismatch
    monkeypatch.setenv("CUTADAPT_TPU_CHUNK_BYTES", "20000")
    monkeypatch.setenv("CUTADAPT_TPU_BATCH", "1")
    codes = {}
    for workers in ("1", "3"):
        monkeypatch.setenv("CUTADAPT_TPU_WORKERS", workers)
        out = tmp_path / f"err-{workers}.fastq"
        with pytest.raises(SystemExit) as e:
            main(["--quiet", "-a", A3, "-o", str(out), str(inp)])
        codes[workers] = e.value.code
    assert codes["1"] == codes["3"]


def test_estimated_raw_size_gzip(tmp_path):
    """Auto-activation sizes compressed inputs by DECOMPRESSED bytes
    (gzip ISIZE), so a small-on-disk .gz with much work inside it
    rides the device path (accel.AUTO_SIZE_THRESHOLD rationale)."""
    import gzip

    from cutadapt_tpu.accel import _estimated_raw_size

    import numpy as np

    rng = np.random.RandomState(0)
    seq = rng.randint(65, 91, 50000).astype(np.uint8).tobytes()
    raw = b"@r\n" + seq + b"\n+\n" + seq[::-1] + b"\n"
    p = tmp_path / "big.fastq.gz"
    with gzip.open(p, "wb", compresslevel=1) as f:
        for _ in range(20):
            f.write(raw)
    est = _estimated_raw_size(os.fspath(p))
    assert est == 20 * len(raw)  # exact via ISIZE
    plain = tmp_path / "plain.fastq"
    plain.write_bytes(raw)
    assert _estimated_raw_size(os.fspath(plain)) == len(raw)


@pytest.mark.parametrize("paired", [False, True], ids=["se", "pe"])
def test_fastpath_exact_wire_parity_and_bytes(tmp_path, monkeypatch, paired):
    """Exact-wire mode (DP rows trimmed to each batch's max window
    length, candidates length-sorted, device-side re-pad): output must
    be byte-identical to bucketed widths, and the measured H2D bytes
    must genuinely shrink on ragged-length reads."""
    from cutadapt_tpu.batch_pipeline import (
        reset_xfer_counters, xfer_counters,
    )

    spy = _spy_engagement(monkeypatch)
    inputs = make_reads(tmp_path / "xw.fastq", n=1200, seed=5, paired=paired)
    args = ["-a", "a1=" + A3, "-q", "10", "-m", "12"]
    if paired:
        args += ["-A", "a2=" + A5]
    monkeypatch.setenv("CUTADAPT_TPU_BATCH", "1")
    outs = {}
    h2d = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_EXACT_WIRE", env)
        out1 = tmp_path / f"xo1-{env}.fastq"
        argv = ["--quiet"] + args + ["-o", str(out1)]
        if paired:
            argv += ["-p", str(tmp_path / f"xo2-{env}.fastq")]
        reset_xfer_counters()
        main(argv + [str(p) for p in inputs])
        assert spy.get("engaged")
        h2d[env] = xfer_counters()["h2d_bytes"]
        data = out1.read_bytes()
        if paired:
            data += b"\x00" + (tmp_path / f"xo2-{env}.fastq").read_bytes()
        outs[env] = data
    assert outs["1"] == outs["0"]
    # reads here are 20-90 bp (bucketed width 128): exact wire must
    # cut the measured candidate bytes substantially
    assert h2d["1"] < 0.8 * h2d["0"], h2d


def test_fastpath_device_prefilter_parity(tmp_path, monkeypatch):
    """CUTADAPT_TPU_DEVICE_PREFILTER=1 skips the host k-mer gate and
    lets the DP reject on device — output and measured candidate
    counts must show everything shipped, with identical results."""
    from cutadapt_tpu.batch_pipeline import (
        reset_xfer_counters, xfer_counters,
    )

    spy = _spy_engagement(monkeypatch)
    inputs = make_reads(tmp_path / "dp.fastq", n=1000, seed=7)
    monkeypatch.setenv("CUTADAPT_TPU_BATCH", "1")
    outs = {}
    cands = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CUTADAPT_TPU_DEVICE_PREFILTER", env)
        out1 = tmp_path / f"dpo-{env}.fastq"
        reset_xfer_counters()
        main(["--quiet", "-a", "a1=" + A3, "-q", "10",
              "-o", str(out1)] + [str(p) for p in inputs])
        assert spy.get("engaged")
        cands[env] = xfer_counters()["candidates"]
        outs[env] = out1.read_bytes()
    assert outs["1"] == outs["0"]
    assert cands["1"] == 1000  # every read shipped
    assert cands["0"] < 1000  # host gate rejected some


def test_batch_require_mode_errors_on_regated_combo(tmp_path, monkeypatch):
    """CUTADAPT_TPU_BATCH=require turns a silent fallback into a hard
    error: deliberately re-gate single-end translation and assert the
    run FAILS (exit 1) instead of quietly passing on the host path, and
    that the fallback counter moved — this is what makes the forced
    golden lane (tests/test_batch_forced.py) actually enforce the
    zero-fallback property."""
    import cutadapt_tpu.accel as accel_mod

    inputs = make_reads(tmp_path / "in.fastq", paired=False)
    monkeypatch.setattr(accel_mod, "_translate_single",
                        lambda *a, **k: None)
    argv = ["--quiet", "-a", "a1=" + A3,
            "-o", str(tmp_path / "out.fastq")] + [str(p) for p in inputs]

    # BATCH=1: the re-gated combo silently falls back, run succeeds
    monkeypatch.setenv("CUTADAPT_TPU_BATCH", "1")
    before = accel_mod.FALLBACK_COUNT
    main(list(argv))
    assert accel_mod.FALLBACK_COUNT == before + 1
    assert "does not express" in accel_mod.LAST_FALLBACK

    # BATCH=require: the same combo is a hard error (exit code 1)
    monkeypatch.setenv("CUTADAPT_TPU_BATCH", "require")
    with pytest.raises(SystemExit) as excinfo:
        main(list(argv))
    assert excinfo.value.code == 1


def test_batch_require_mode_passes_eligible_run(tmp_path, monkeypatch):
    """require mode behaves exactly like BATCH=1 for expressible runs."""
    spy = _spy_engagement(monkeypatch)
    inputs = make_reads(tmp_path / "in.fastq", paired=False)
    monkeypatch.setenv("CUTADAPT_TPU_BATCH", "require")
    out = tmp_path / "out.fastq"
    main(["--quiet", "-a", "a1=" + A3, "-o", str(out)]
         + [str(p) for p in inputs])
    assert spy.get("engaged")
    assert out.stat().st_size > 0
