"""Randomized batch-vs-host CLI parity fuzz.

Generates random option combinations and random (sometimes degenerate)
inputs, runs each through cli.main with the batch path forced on and
off, and requires identical outputs, JSON reports, and failure modes.
Usage: python tools/fuzz_parity.py [iterations] [seed_base]
"""
import json
import logging
import os
import random
import subprocess
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
from cutadapt_tpu.cli import main

A3 = "AGATCGGAAGAGCACACGTC"
A5 = "CTGTCTCTTATACACATCT"
AW = "ANGATNACGGA"

def make_input(tmp, rng, paired):
    paths = []
    # occasionally emit quality bytes below '!' (negative phred):
    # they exercise the exact BWA-trim arithmetic and ZeroCapper
    qual_lo = 20 if rng.random() < 0.2 else 33
    casava = rng.random() < 0.25  # casava-style comments for --discard-casava
    for side, ad in enumerate([A3, A5][: 2 if paired else 1]):
        p = os.path.join(tmp, f"in{side}.fastq")
        with open(p, "w") as f:
            for i in range(rng.randint(50, 400)):
                L = rng.randint(1, 95)
                s = "".join(rng.choice("ACGTN") for _ in range(L))
                if rng.random() < 0.5 and L > 24:
                    pos = rng.randint(0, L - 20)
                    s = (s[:pos] + ad + s[pos:])[:L]
                q = "".join(chr(rng.randint(qual_lo, 74)) for _ in s)
                com = f"1:{'Y' if i % 2 else 'N'}:0:AT" if casava else f"c{i}"
                f.write(f"@f{i} {com}\n{s}\n+\n{q}\n")
        paths.append(p)
    return paths

def random_args(rng, paired):
    args = []
    if paired and rng.random() < 0.12:
        # --pair-adapters needs matching per-side adapter counts
        args += ["--pair-adapters", "-a", "pa1=" + A3, "-A", "pa2=" + A5]
        if rng.random() < 0.5:
            args += ["-a", "pb1=ACGTACGTAC", "-A", "pb2=TTGACCGGAA"]
        return args + _common_args(rng, paired)
    adapters = rng.sample([
        ["-a", A3], ["-g", A5], ["-b", "ACGTACGTAC"], ["-g", "^" + A5[:8]],
        ["-a", A3[:10] + "$"], ["-a", AW], ["-g", A5[:8] + "..." + A3[:8]],
        ["-a", A3 + ";e=0.2"],
    ], k=rng.randint(1, 3))
    for k, a in enumerate(adapters):
        # explicit names: the auto-name counter is process state and
        # would differ between the two in-process runs
        args += [a[0], f"ad{k}={a[1]}"]
    return args + _common_args(rng, paired)


def _common_args(rng, paired):
    args = []
    if rng.random() < 0.4: args += ["-q", str(rng.choice(["10", "15,12"]))]
    if rng.random() < 0.3: args += ["-u", str(rng.choice([3, -4]))]
    if rng.random() < 0.3: args += ["--times", "2"]
    if rng.random() < 0.3: args += ["--no-indels"]
    if rng.random() < 0.25: args += ["--action=" + rng.choice(["retain", "mask", "lowercase", "none", "crop"])]
    if rng.random() < 0.3: args += ["-m", "10"]
    if rng.random() < 0.2: args += ["-M", "80"]
    if rng.random() < 0.2: args += ["--max-n", "3"]
    if rng.random() < 0.2: args += ["--discard-untrimmed"]
    if rng.random() < 0.15: args += ["--trim-n"]
    if rng.random() < 0.15: args += ["--poly-a"]
    if rng.random() < 0.15: args += ["--length", "60"]
    if rng.random() < 0.2: args += ["--rename", "{id} a={adapter_name} m={match_sequence}"]
    elif rng.random() < 0.2: args += ["-y", "_{name}", "-z"]
    if rng.random() < 0.15: args += ["--revcomp"]
    if rng.random() < 0.2:
        which = rng.random()
        if which < 0.4: args += ["-r", "REST"]
        elif which < 0.8:
            args += ["--info-file", "INFO"]
            if paired and rng.random() < 0.5:
                args += ["--info-file-paired", "INFO2"]
        else: args += ["--wildcard-file", "WC"]
    if rng.random() < 0.15: args += ["FASTA_OUT"]  # marker: .fasta outputs
    if rng.random() < 0.1: args += ["--zero-cap"]
    if rng.random() < 0.1: args += ["--max-ee", "8"]
    if rng.random() < 0.1: args += ["--discard-casava"]
    return args

failures = 0
N = int(sys.argv[1]) if len(sys.argv) > 1 else 60
for it in range(N):
    rng = random.Random(int(sys.argv[2]) + it if len(sys.argv) > 2 else 1000 + it)
    paired = rng.random() < 0.4
    with tempfile.TemporaryDirectory() as tmp:
        inputs = make_input(tmp, rng, paired)
        args = random_args(rng, paired)
        outs = {}
        ok = True
        for env in ("1", "0"):
            os.environ["CUTADAPT_TPU_BATCH"] = env
            ext = ".fasta" if "FASTA_OUT" in args else ""
            o1 = os.path.join(tmp, f"o1-{env}{ext}")
            o2 = os.path.join(tmp, f"o2-{env}{ext}")
            rep = os.path.join(tmp, f"r-{env}.json")
            argv = ["--quiet", "--json", rep]
            side_paths = {}
            for flagged in ("REST", "INFO", "INFO2", "WC"):
                if flagged in args:
                    side_paths[flagged] = os.path.join(tmp, f"{flagged}-{env}")
            argv += [
                side_paths.get(a, a) for a in args if a != "FASTA_OUT"
            ] + ["-o", o1]
            if paired:
                argv += ["-p", o2]
            try:
                main(argv + inputs)
                logging.root.handlers.clear()
            except SystemExit as e:
                logging.root.handlers.clear()
                outs[env] = ("exit", e.code)
                continue
            except Exception as e:
                logging.root.handlers.clear()
                outs[env] = ("raise", type(e).__name__)
                continue
            data = open(o1, "rb").read()
            if paired:
                data += b"\x00" + open(o2, "rb").read()
            for path in side_paths.values():
                if os.path.exists(path):
                    data += b"\x01" + open(path, "rb").read()
            r = json.load(open(rep)); r["command_line_arguments"] = None
            outs[env] = ("ok", data, json.dumps(r, sort_keys=True))
        # When an input carries MORE THAN ONE defect (e.g. improper
        # pairing AND invalid phred bytes), the per-read host path and
        # the per-chunk batch path may legitimately report different
        # defects first — the reference's own multicore runner has the
        # same property. Treat any two clean input-error outcomes as
        # equivalent; internal failure types (KeyError etc.) still
        # count as mismatches.
        INPUT_ERRORS = {("exit", 1), ("raise", "ValueError")}
        both_input_errors = all(
            tuple(outs[e][:2]) in INPUT_ERRORS for e in ("1", "0")
        )
        if outs["1"] != outs["0"] and not both_input_errors:
            failures += 1
            print(f"MISMATCH iter {it}: {' '.join(args)} paired={paired}")
print(f"done: {N} iterations, {failures} mismatches")
sys.exit(1 if failures else 0)
