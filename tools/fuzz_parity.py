"""Randomized batch-vs-host CLI parity fuzz.

Generates random option combinations and random (sometimes degenerate)
inputs — FASTQ or FASTA, two-file or interleaved paired — runs each
through cli.main with the batch path forced on and off, and requires
identical outputs (every file written under the run's output dir,
demux and side files included), JSON reports, and failure modes. The
batch run also randomizes CUTADAPT_TPU_PACK2 (2-bit vs 4-bit wire
lanes), CUTADAPT_TPU_DEVICE_STATS (device-reduced statistics),
CUTADAPT_TPU_WORKERS (pooled multi-worker drive),
CUTADAPT_TPU_EXACT_WIRE (batch-max row widths), and
CUTADAPT_TPU_DEVICE_PREFILTER (DP-side rejection instead of the host
k-mer gate), all of which must be invisible in the results.
Usage: python tools/fuzz_parity.py [iterations] [seed_base]
"""
import json
import logging
import os
import random
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
from cutadapt_tpu.cli import main

A3 = "AGATCGGAAGAGCACACGTC"
A5 = "CTGTCTCTTATACACATCT"
AW = "ANGATNACGGA"


_COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def _records(rng, ad, n, fasta, qual_lo, casava, pair_tag=None):
    recs = []
    for i in range(n):
        L = rng.randint(1, 95)
        s = "".join(rng.choice("ACGTN") for _ in range(L))
        if rng.random() < 0.5 and L > 24:
            pos = rng.randint(0, L - 20)
            s = (s[:pos] + ad + s[pos:])[:L]
            if rng.random() < 0.25:
                # reverse-complement the whole read so --revcomp
                # genuinely picks the rc orientation for a share
                s = "".join(_COMP[c] for c in reversed(s))
        com = f"1:{'Y' if i % 2 else 'N'}:0:AT" if casava else f"c{i}"
        name = f"f{i}/{pair_tag}" if pair_tag else f"f{i}"
        if fasta:
            if rng.random() < 0.3 and L > 10:  # multi-line wrapping
                s = s[:10] + "\n" + s[10:]
            recs.append(f">{name} {com}\n{s}\n")
        else:
            q = "".join(chr(rng.randint(qual_lo, 74)) for _ in s)
            recs.append(f"@{name} {com}\n{s}\n+\n{q}\n")
    return recs


def make_input(tmp, rng, paired, fasta, interleaved):
    # occasionally emit quality bytes below '!' (negative phred):
    # they exercise the exact BWA-trim arithmetic and ZeroCapper
    qual_lo = 20 if rng.random() < 0.2 else 33
    casava = rng.random() < 0.25  # for --discard-casava
    ext = "fasta" if fasta else "fastq"
    n = rng.randint(50, 400)
    if interleaved:
        r1 = _records(rng, A3, n, fasta, qual_lo, casava, pair_tag=1)
        r2 = _records(rng, A5, n, fasta, qual_lo, casava, pair_tag=2)
        p = os.path.join(tmp, f"in.{ext}")
        with open(p, "w") as f:
            for a, b in zip(r1, r2):
                f.write(a + b)
        return [p]
    paths = []
    for side, ad in enumerate([A3, A5][: 2 if paired else 1]):
        p = os.path.join(tmp, f"in{side}.{ext}")
        with open(p, "w") as f:
            f.writelines(
                _records(rng, ad, n, fasta, qual_lo, casava)
            )
        paths.append(p)
    return paths


def random_args(rng, paired):
    args = []
    if paired and rng.random() < 0.15:
        # --pair-adapters needs matching per-side adapter counts
        args += ["--pair-adapters", "-a", "pa1=" + A3, "-A", "pa2=" + A5]
        if rng.random() < 0.5:
            args += ["-a", "pb1=ACGTACGTAC", "-A", "pb2=TTGACCGGAA"]
        if rng.random() < 0.3:
            args += ["DEMUX"]  # route pairs by the winning pair's name
        return args + _common_args(rng, paired)
    if rng.random() < 0.1:
        # demultiplexing: a named anchored-prefix barcode set
        for k, bc in enumerate(("AACC", "GGTT", "ACGT")):
            args += ["-g", f"bc{k}=^{bc}"]
        return args + ["DEMUX"] + _common_args(rng, paired)
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


def collect_outputs(out_dir):
    """Every file under out_dir, keyed by relative name."""
    data = {}
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".json"):
            continue
        with open(os.path.join(out_dir, name), "rb") as f:
            data[name] = f.read()
    return data


def _main():
    failures = 0
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    for it in range(N):
      rng = random.Random(int(sys.argv[2]) + it if len(sys.argv) > 2 else 1000 + it)
      paired = rng.random() < 0.45
      interleaved = paired and rng.random() < 0.3
      fasta_in = rng.random() < 0.2
      pack2 = rng.choice(["0", "1"])
      dev_stats = rng.choice(["0", "1"])
      workers = rng.choice(["1", "2", "3"])
      exact_wire = rng.choice(["0", "1"])
      dev_prefilter = rng.choice(["0", "0", "1"])
      # small chunk sizes force MULTI-CHUNK engine runs (per-chunk
      # stats accumulation, ordered pooled commits); chunking must be
      # invisible in the results
      chunk_bytes = rng.choice(["", "3000", "12000"])
      with tempfile.TemporaryDirectory() as tmp:
          inputs = make_input(tmp, rng, paired, fasta_in, interleaved)
          args = random_args(rng, paired)
          demux = "DEMUX" in args
          outs = {}
          for env in ("1", "0"):
              os.environ["CUTADAPT_TPU_BATCH"] = env
              os.environ["CUTADAPT_TPU_PACK2"] = pack2 if env == "1" else "1"
              os.environ["CUTADAPT_TPU_DEVICE_STATS"] = (
                  dev_stats if env == "1" else "0"
              )
              # worker pool must be invisible in the results too
              os.environ["CUTADAPT_TPU_WORKERS"] = (
                  workers if env == "1" else "1"
              )
              os.environ["CUTADAPT_TPU_EXACT_WIRE"] = (
                  exact_wire if env == "1" else "0"
              )
              os.environ["CUTADAPT_TPU_DEVICE_PREFILTER"] = (
                  dev_prefilter if env == "1" else "0"
              )
              if chunk_bytes and env == "1":
                  os.environ["CUTADAPT_TPU_CHUNK_BYTES"] = chunk_bytes
              else:
                  os.environ.pop("CUTADAPT_TPU_CHUNK_BYTES", None)
              out_dir = os.path.join(tmp, f"out{env}")
              os.makedirs(out_dir)
              ext = ".fasta" if "FASTA_OUT" in args or fasta_in else ".fastq"
              stem = "dm-{name}" if demux else "o1"
              o1 = os.path.join(out_dir, stem + ext)
              o2 = os.path.join(out_dir, ("dm2-{name}" if demux else "o2") + ext)
              rep = os.path.join(out_dir, "r.json")
              argv = ["--quiet", "--json", rep]
              side_paths = {}
              for flagged in ("REST", "INFO", "INFO2", "WC"):
                  if flagged in args:
                      side_paths[flagged] = os.path.join(out_dir, flagged)
              argv += [
                  side_paths.get(a, a)
                  for a in args if a not in ("FASTA_OUT", "DEMUX")
              ] + ["-o", o1]
              if paired and not (interleaved and not demux):
                  argv += ["-p", o2]
              if interleaved:
                  argv += ["--interleaved"]
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
              r = json.load(open(rep)); r["command_line_arguments"] = None
              outs[env] = (
                  "ok", collect_outputs(out_dir),
                  json.dumps(r, sort_keys=True),
              )
          os.environ.pop("CUTADAPT_TPU_PACK2", None)
          os.environ.pop("CUTADAPT_TPU_DEVICE_STATS", None)
          os.environ.pop("CUTADAPT_TPU_WORKERS", None)
          os.environ.pop("CUTADAPT_TPU_EXACT_WIRE", None)
          os.environ.pop("CUTADAPT_TPU_DEVICE_PREFILTER", None)
          # When an input carries MORE THAN ONE defect (e.g. improper
          # pairing AND invalid phred bytes), the per-read host path and
          # the per-chunk batch path may legitimately report different
          # defects first — the reference's own multicore runner has the
          # same property. Treat any two clean input-error outcomes as
          # equivalent; internal failure types (KeyError etc.) still
          # count as mismatches.
          INPUT_ERRORS = (("exit", 1), ("raise", "ValueError"))
          both_input_errors = all(
              tuple(outs[e][:2]) in INPUT_ERRORS for e in ("1", "0")
          )
          if outs["1"] != outs["0"] and not both_input_errors:
              failures += 1
              print(
                  f"MISMATCH iter {it}: {' '.join(args)} paired={paired}"
                  f" interleaved={interleaved} fasta={fasta_in}"
                  f" pack2={pack2} dev_stats={dev_stats}"
              )
    print(f"done: {N} iterations, {failures} mismatches")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    _main()
