#!/usr/bin/env python
"""
Multi-host (multi-process) sharded run coordinator.

Turns the byte-range shard contract (cutadapt_tpu/parallel/multihost.py)
into one command: launch COUNT `--shard i/COUNT` worker processes over
the same argv, concatenate their output shards in shard order (the
multi-host form of the reference's OrderedChunkWriter invariant —
/root/reference/src/cutadapt/runners.py:224-245), merge their
statistics pickles, and print the merged report. The result is
byte-identical to the same argv run unsharded.

    python tools/multihost_run.py -n 4 -- \
        -a ADAPTER -o out.fastq.gz in.fastq

Compressed outputs concatenate correctly: gzip/bz2/xz all define a
multi-member stream as the concatenation of members.

On a real pod each host runs its own `cutadapt-tpu --shard i/N`
(no coordinator process needed during the run) and any host
concatenates/merges afterwards; this tool is the single-machine
reference implementation of that contract and the harness for
byte-parity testing.
"""

import argparse
import os
import shutil
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _split_output_args(argv):
    """Indexes of the -o/-p value slots in argv (for per-shard rewrite)."""
    slots = {}
    i = 0
    while i < len(argv):
        if argv[i] in ("-o", "--output"):
            slots["o"] = i + 1
        elif argv[i] in ("-p", "--paired-output"):
            slots["p"] = i + 1
        i += 1
    return slots


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[1],
    )
    ap.add_argument("-n", "--hosts", type=int, required=True,
                    help="number of shard processes")
    ap.add_argument("--sequential", action="store_true",
                    help="run shards one at a time (bounded memory)")
    ap.add_argument("--keep-shards", action="store_true",
                    help="keep per-shard outputs next to the final files")
    ap.add_argument("argv", nargs=argparse.REMAINDER,
                    help="cutadapt-tpu arguments (prefix with --)")
    opts = ap.parse_args()
    argv = opts.argv
    if argv and argv[0] == "--":
        argv = argv[1:]
    if not argv:
        ap.error("no cutadapt-tpu arguments given (put them after --)")
    n = opts.hosts
    if n < 1:
        ap.error("--hosts must be >= 1")
    slots = _split_output_args(argv)
    if "o" not in slots:
        ap.error("the sharded argv must write to a file (-o OUT)")
    for key in slots:
        if "{" in argv[slots[key]]:
            ap.error("demultiplexing templates cannot be sharded by "
                     "output concatenation; run demux per shard instead")

    t0 = time.time()
    procs = []
    shard_files = []  # (final_path, [shard paths in order]) per slot
    stats_pickles = []
    for key in sorted(slots):
        shard_files.append((argv[slots[key]], []))
    def shard_path(final: str, i: int) -> str:
        # keep the compression extension LAST so the shard output is
        # compressed the same way as the final file (the writer picks
        # the codec by name suffix); gzip/bz2/xz streams concatenate
        # correctly as multi-member files
        for ext in (".gz", ".bz2", ".xz", ".zst", ".lzma"):
            if final.lower().endswith(ext):
                return f"{final}.shard{i}of{n}{ext}"
        return f"{final}.shard{i}of{n}"

    for i in range(n):
        shard_argv = list(argv)
        for (final, paths), key in zip(shard_files, sorted(slots)):
            sp = shard_path(final, i)
            shard_argv[slots[key]] = sp
            paths.append(sp)
        shard_argv += ["--shard", f"{i}/{n}"]
        env = dict(os.environ)
        pickle_path = f"{shard_files[0][1][i]}.stats.pickle"
        env["CUTADAPT_TPU_STATS_PICKLE"] = pickle_path
        stats_pickles.append(pickle_path)
        cmd = [sys.executable, "-m", "cutadapt_tpu", "--quiet"] + shard_argv
        p = subprocess.Popen(cmd, env=env)
        if opts.sequential:
            if p.wait() != 0:
                print(f"shard {i} failed (exit {p.returncode})",
                      file=sys.stderr)
                return p.returncode
        else:
            procs.append((i, p))
    for i, p in procs:
        if p.wait() != 0:
            for _, q in procs:
                if q.poll() is None:
                    q.terminate()
            print(f"shard {i} failed (exit {p.returncode})",
                  file=sys.stderr)
            return p.returncode

    # host-order concatenation reproduces the serial byte stream
    for final, paths in shard_files:
        with open(final, "wb") as out:
            for sp in paths:
                with open(sp, "rb") as f:
                    shutil.copyfileobj(f, out, 16 * 1024 * 1024)
                if not opts.keep_shards:
                    os.unlink(sp)

    from cutadapt_tpu.parallel.multihost import merge_statistics
    from cutadapt_tpu.report import full_report

    stats = merge_statistics(stats_pickles)
    if not opts.keep_shards:
        for sp in stats_pickles:
            os.unlink(sp)
    print(full_report(stats, time.time() - t0, 0.5))
    return 0


if __name__ == "__main__":
    sys.exit(main())
