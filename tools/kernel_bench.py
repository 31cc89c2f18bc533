"""Standalone Pallas DP kernel throughput probe (flagship config).

Measures kernel-only device rows/s exactly the way bench.py's
device_kernel_bench does (pre-staged device buffers, iters inside one
jitted fori_loop so per-dispatch tunnel round trips are excluded), but
runnable in isolation so kernel work can be iterated quickly.

Usage: python tools/kernel_bench.py [rows] [iters] [repeat]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/cutadapt_tpu_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    print("devices:", jax.devices())

    from cutadapt_tpu.adapters import BackAdapter
    from cutadapt_tpu.batch_pipeline import (
        AdapterStage,
        AdapterTask,
        BatchPipelineEngine,
    )

    adapter_obj = BackAdapter(
        "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA", max_errors=0.1, min_overlap=3
    )
    engine = BatchPipelineEngine(
        [AdapterStage([AdapterTask(adapter_obj, "back", 0)])]
    )
    task = engine.stages[-1].tasks[0]
    width = engine._bucket_length(100)

    import bench as topbench

    for r in range(repeat):
        res = topbench.device_kernel_bench(task, width, rows=rows, iters=iters)
        print(
            f"pass {r}: {res['device_dp_rows_per_sec']:,.0f} rows/s "
            f"(call {res['device_call_ms']:.1f} ms, backend {res['backend']})"
        )


if __name__ == "__main__":
    main()
