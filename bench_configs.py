#!/usr/bin/env python
"""
Measure the BASELINE.md configuration matrix: reads/s of the host
(per-read oracle) path vs the TPU fast path, through the real CLI, on
synthetic datasets. Prints one line per configuration; bench.py stays
the single-JSON-line headline benchmark.

Usage: python bench_configs.py [n_reads]
"""

import os
import sys
import time

import numpy as np

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
READ_LEN = 100
A3 = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
A5 = "CTGTCTCTTATACACATCT"
AW = "AGANCGGAAGANCACACGT"  # IUPAC wildcards
A3_R2 = "AGATCGGAAGAGCGTCGTGTAGGGA"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_reads(n, seed, adapters, frac=0.3, polya=False):
    rng = np.random.RandomState(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    out = []
    for i in range(n):
        L = int(rng.randint(40, READ_LEN + 1))
        s = bytearray(bases[rng.randint(0, 4, L)].tobytes())
        if adapters and rng.rand() < frac:
            ad = adapters[rng.randint(len(adapters))].encode()
            p = int(rng.randint(10, max(11, L - 4)))
            take = min(len(ad), L - p)
            s[p : p + take] = ad[:take]
        if polya and rng.rand() < 0.3:
            tail = min(int(rng.randint(3, 20)), L - 1)
            s[L - tail :] = b"A" * tail
        q = rng.randint(35, 74, L).astype(np.uint8).tobytes()
        out.append(b"@r%d/1 c\n%s\n+\n%s\n" % (i, bytes(s), q))
    return b"".join(out)


def run_cli(args, env_batch):
    """Run cli.main in a fresh-ish state; returns elapsed seconds."""
    os.environ["CUTADAPT_TPU_BATCH"] = env_batch
    from cutadapt_tpu.cli import main

    t0 = time.perf_counter()
    main(args)
    return time.perf_counter() - t0


def bench_config(name, args_fn, paired=False):
    import tempfile

    d = tempfile.mkdtemp()
    if paired:
        r1 = make_reads(N_READS, 1, [A3])
        r2 = make_reads(N_READS, 2, [A3_R2])
        in1, in2 = f"{d}/r1.fastq", f"{d}/r2.fastq"
        open(in1, "wb").write(r1)
        open(in2, "wb").write(r2)
        inputs = [in1, in2]
    else:
        data = make_reads(N_READS, 1, [A3], polya="poly" in name)
        in1 = f"{d}/in.fastq"
        open(in1, "wb").write(data)
        inputs = [in1]
    results = {}
    for label, env in (("tpu", "1"), ("host", "0")):
        args = ["--quiet"] + args_fn(d, label) + inputs
        if label == "tpu":  # warm compile outside the timed run
            run_cli(["--quiet"] + args_fn(d, "warm") + inputs, env)
        dt = run_cli(args, env)
        results[label] = N_READS / dt
    outs = {}
    for label in ("tpu", "host"):
        with open(f"{d}/out-{label}.fastq", "rb") as f:
            outs[label] = f.read()
    parity = outs["tpu"] == outs["host"]
    print(
        f"{name:45s} host {results['host']:>10,.0f} r/s   "
        f"tpu {results['tpu']:>10,.0f} r/s   "
        f"speedup {results['tpu']/results['host']:6.1f}x   "
        f"parity {'OK' if parity else 'FAIL'}"
    )
    return results, parity


def main():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/cutadapt_tpu_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    log(f"devices: {jax.devices()}  n_reads={N_READS}")

    ok = True
    configs = [
        (
            "SE 3' adapter trim (-a, e=0.1)",
            lambda d, l: ["-a", A3, "-o", f"{d}/out-{l}.fastq"],
            False,
        ),
        (
            "5' + anywhere, IUPAC wildcards, --no-indels",
            lambda d, l: [
                "-g", A5, "-b", AW, "--no-indels",
                "-o", f"{d}/out-{l}.fastq",
            ],
            False,
        ),
        (
            "paired -a/-A + -q 15 + length filters",
            lambda d, l: [
                "-a", A3, "-A", A3_R2, "-q", "15", "-m", "20", "-M", "95",
                "-o", f"{d}/out-{l}.fastq", "-p", f"{d}/out2-{l}.fastq",
            ],
            True,
        ),
        (
            "-q 20 + -a + --poly-a + -m 10",
            lambda d, l: [
                "-q", "20", "-a", A3, "--poly-a", "-m", "10",
                "-o", f"{d}/out-{l}.fastq",
            ],
            False,
        ),
    ]
    for name, args_fn, paired in configs:
        _, parity = bench_config(name, args_fn, paired)
        ok &= parity
    ok &= bench_demux()
    if not ok:
        sys.exit(1)


def bench_demux():
    import glob
    import tempfile

    rng = np.random.RandomState(9)
    bases = list("ACGT")
    d = tempfile.mkdtemp()
    barcodes = ["".join(rng.choice(bases, 10)) for _ in range(8)]
    with open(f"{d}/bc.fasta", "w") as fh:
        fh.write("".join(f">bc{i}\n{b}\n" for i, b in enumerate(barcodes)))
    recs = []
    for i in range(N_READS):
        L = int(rng.randint(40, 90))
        s = "".join(rng.choice(bases, L))
        if rng.rand() < 0.8:
            s = barcodes[rng.randint(8)] + s
        recs.append(f"@d{i}\n{s}\n+\n{'I' * len(s)}\n")
    inp = f"{d}/in.fastq"
    open(inp, "w").write("".join(recs))
    results = {}
    for label, env in (("tpu", "1"), ("host", "0")):
        os.makedirs(f"{d}/{label}")
        args = [
            "--quiet", "-g", f"^file:{d}/bc.fasta", "-e", "1", "--no-indels",
            "-o", f"{d}/{label}/out-{{name}}.fastq", inp,
        ]
        if label == "tpu":
            run_cli(args, env)  # warm compile
            for f in glob.glob(f"{d}/tpu/*.fastq"):
                os.unlink(f)
        dt = run_cli(args, env)
        results[label] = N_READS / dt
    parity = all(
        open(f, "rb").read()
        == open(f.replace("/host/", "/tpu/"), "rb").read()
        for f in glob.glob(f"{d}/host/*.fastq")
    )
    print(
        f"{'demux 8 barcodes (-g ^file:, e=1, no-indels)':45s} "
        f"host {results['host']:>10,.0f} r/s   "
        f"tpu {results['tpu']:>10,.0f} r/s   "
        f"speedup {results['tpu']/results['host']:6.1f}x   "
        f"parity {'OK' if parity else 'FAIL'}"
    )
    return parity


if __name__ == "__main__":
    main()
