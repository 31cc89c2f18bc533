"""Stage-level profiling of the batch pipeline engine on the bench workload."""
import time

import numpy as np

import bench as B
from cutadapt_tpu import native
from cutadapt_tpu.adapters import BackAdapter
from cutadapt_tpu.batch_pipeline import (
    AdapterStage,
    AdapterTask,
    BatchPipelineEngine,
    process_chunks_pipelined,
)
from cutadapt_tpu.io.chunks import assemble_window, parse_fastq_chunk

print("native:", native.AVAILABLE)
data = B.make_dataset(200000, B.READ_LEN)
adapter = BackAdapter(B.ADAPTER, max_errors=0.1, min_overlap=3)
task = AdapterTask(adapter, "back", 0)
eng = BatchPipelineEngine([AdapterStage([task])])
list(process_chunks_pipelined(eng, [data]))  # warm/compile

t = {}
def tick(name, t0):
    t[name] = t.get(name, 0.0) + (time.perf_counter() - t0)

t0 = time.perf_counter()
chunk = parse_fastq_chunk(data)
tick("parse", t0)

t0 = time.perf_counter()
pending = eng.submit(chunk)  # prefilter + encode + dispatch
tick("submit (prefilter+encode+dispatch)", t0)

t0 = time.perf_counter()
ws, we, keep, stats = eng.collect(pending)
tick("collect (device wait+fetch+combine)", t0)

t0 = time.perf_counter()
out = assemble_window(chunk, ws, we, keep)
tick("assemble", t0)

total = sum(t.values())
for k, v in sorted(t.items(), key=lambda kv: -kv[1]):
    print(f"{k:38s} {v*1000:9.1f} ms  {v/total*100:5.1f}%")
print(
    f"{'TOTAL':38s} {total*1000:9.1f} ms  "
    f"-> {chunk.n_records/total:,.0f} reads/s"
)

# end-to-end pipelined on 2 chunks to see overlap benefit
chunks, n = B.split_records(data, 100000)
list(process_chunks_pipelined(eng, chunks))  # warm
t0 = time.perf_counter()
for _ in process_chunks_pipelined(eng, chunks):
    pass
dt = time.perf_counter() - t0
print(f"pipelined end-to-end: {n/dt:,.0f} reads/s")
