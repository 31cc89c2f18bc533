"""
On-hardware Pallas <-> XLA parity matrix.

Compiles the VMEM-resident Pallas DP kernel for a spread of adapter
kinds / flag combinations at the production block size and checks its
results against the XLA formulation on the same random batches, on the
real device. bench.py runs this (CUTADAPT_TPU_PALLAS_VERIFY=0 skips)
and reports the outcome in its JSON line.

Usage: python tools/verify_pallas_tpu.py  (exit 0 = all specs agree)
"""

import sys

import numpy as np


def parity_cases():
    from cutadapt_tpu.adapters import Where

    # (reference, wildcard_ref, flags, rate, indel_cost, min_overlap)
    truseq = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    nextera = "CTGTCTCTTATACACATCT"
    return [
        (truseq, False, Where.BACK, 0.1, 1, 3),
        (truseq, False, Where.BACK, 0.2, 1, 3),
        (truseq, False, Where.BACK, 0.0, 1, 3),
        (nextera, False, Where.FRONT, 0.1, 1, 3),
        (nextera, False, Where.ANYWHERE, 0.15, 1, 3),
        ("ANGNTCGGANGCT", True, Where.BACK, 0.2, 1, 3),
        ("ACGTNNNACGT", True, Where.FRONT, 0.1, 1, 3),
        (nextera, False, Where.BACK_NOT_INTERNAL, 0.1, 1, 3),
        (nextera, False, Where.FRONT_NOT_INTERNAL, 0.1, 1, 3),
        ("TTAGACATAT", False, Where.PREFIX, 0.2, 1, 10),
        ("TTAGACATAT", False, Where.SUFFIX, 0.2, 1, 10),
        (truseq, False, Where.BACK, 0.1, 100000, 3),  # --no-indels
        (truseq, False, Where.BACK, 0.1, 1, 12),  # high min_overlap
    ]


def run(block_b: int = 1024, read_len: int = 128, verbose: bool = True):
    from cutadapt_tpu.batch_pipeline import _unpack_result
    from cutadapt_tpu.ops.align_batch import (
        AlignerSpec,
        make_batch_locate,
        query_class_info,
    )
    from cutadapt_tpu.ops.align_pallas import make_pallas_locate

    import jax

    failures = []
    rng = np.random.RandomState(20260816)
    for case_no, (ref, wc, flags, rate, indel_cost, mo) in enumerate(
        parity_cases()
    ):
        spec = AlignerSpec(
            reference=ref, max_error_rate=rate, flags=flags.value,
            wildcard_ref=wc, indel_cost=indel_cost, min_overlap=mo,
        )
        cls_lut, _ = query_class_info(spec)
        B, L = block_b, read_len
        raw = rng.choice(
            np.frombuffer(b"ACGTNacgt", np.uint8), size=(B, L)
        )
        # splice (mutated) adapter copies into a third of the lanes
        ad = np.frombuffer(ref.encode(), np.uint8)
        for i in range(0, B, 3):
            pos = rng.randint(0, L - 4)
            take = min(len(ad), L - pos)
            raw[i, pos : pos + take] = ad[:take]
            if rate > 0 and take > 4:
                raw[i, pos + rng.randint(take)] = ord("T")
        lens = rng.randint(0, L + 1, B).astype(np.int32)
        for i in range(B):
            raw[i, lens[i]:] = 0
        cls = cls_lut[raw]
        packed = (cls[:, 0::2] | (cls[:, 1::2] << 4)).astype(np.uint8)

        xla_out = jax.jit(make_batch_locate(spec, packed=True))(packed, lens)
        pal_fn = jax.jit(make_pallas_locate(spec, block_b=block_b))
        f, qs, qe, er, sc = _unpack_result(np.asarray(pal_fn(packed, lens)))

        want_found = np.asarray(xla_out["found"])
        label = f"{ref[:12]}.. flags={flags.name} e={rate} ic={indel_cost}"
        if not (f == want_found).all():
            failures.append(f"{label}: found mask differs")
            continue
        for got, key in (
            (qs, "query_start"), (qe, "query_stop"),
            (er, "errors"), (sc, "score"),
        ):
            want = np.asarray(xla_out[key])
            if not (got[want_found] == want[want_found]).all():
                failures.append(f"{label}: {key} differs")
                break
        else:
            if verbose:
                print(
                    f"  [{case_no + 1:2d}/{len(parity_cases())}] {label}: "
                    f"ok ({int(want_found.sum())} matches)",
                    file=sys.stderr,
                )
    return failures


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    failures = run()
    n = len(parity_cases())
    if "--long" in argv:
        # one long-read pass: 512 bp windows at the production block
        # size (the packed kernel's coordinate fields hold < 2^14, so
        # this stays in-format; >= 2^14 bp reads take the wide XLA
        # path, covered by tests/test_batch_pipeline.py)
        failures += [
            f"long-read {f}" for f in run(read_len=512, verbose=False)
        ]
        n += len(parity_cases())
    if failures:
        print("PALLAS PARITY FAILURES:", file=sys.stderr)
        for f in failures:
            print(" -", f, file=sys.stderr)
        return 1
    print(f"pallas parity: all {n} spec runs agree", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
