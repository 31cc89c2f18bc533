import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/cutadapt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

log(f"devices: {jax.devices()}")
from cutadapt_tpu.adapters import BackAdapter
from cutadapt_tpu.batch_pipeline import (
    AdapterStage, AdapterTask, BatchPipelineEngine, _make_locate_step,
)
adapter_obj = BackAdapter(
    "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA", max_errors=0.1, min_overlap=3
)
engine = BatchPipelineEngine([AdapterStage([AdapterTask(adapter_obj, "back", 0)])])
task = engine.stages[-1].tasks[0]
width = engine._bucket_length(100)
rows = int(os.environ.get("KB_ROWS", "131072"))
iters = int(os.environ.get("KB_ITERS", "8"))
w_in = width // 4
rng = np.random.RandomState(7)
log("staging inputs")
enc_d = jax.device_put(rng.randint(0, 256, size=(rows, w_in)).astype(np.uint8))
lens_d = jax.device_put(np.full(rows, 100, np.int16))
log(f"backend {task._backend} width {width} w_in {w_in} rows {rows}")
kernel = _make_locate_step(task.spec, task.packed, task._backend, False, None, True)

t0 = time.perf_counter()
out = np.asarray(kernel(enc_d, lens_d))
log(f"single call compile+fetch: {time.perf_counter()-t0:.1f}s")
for p in range(3):
    t0 = time.perf_counter()
    out = np.asarray(kernel(enc_d, lens_d))
    dt = time.perf_counter() - t0
    log(f"single call + fetch: {dt*1e3:.1f} ms -> {rows/dt:,.0f} rows/s")

@jax.jit
def loop(enc, lengths):
    def body(i, acc):
        e = enc ^ (i & 1).astype(jnp.uint8)
        return acc ^ kernel(e, lengths)
    return lax.fori_loop(0, iters, body, jnp.zeros((2, rows), jnp.int32))

t0 = time.perf_counter()
r = np.asarray(loop(enc_d, lens_d))
log(f"loop compile+fetch: {time.perf_counter()-t0:.1f}s")
for p in range(3):
    t0 = time.perf_counter()
    r = np.asarray(loop(enc_d, lens_d))
    dt = time.perf_counter() - t0
    log(f"loop pass {p}: {rows*iters/dt:,.0f} rows/s ({dt*1e3:.1f} ms / {iters} iters)")
