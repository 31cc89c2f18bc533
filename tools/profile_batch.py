"""Stage-level profiling of the batch engine on the bench workload."""
import time
import numpy as np
import bench as B
from cutadapt_tpu import batch as bt
from cutadapt_tpu import native

print("native:", native.AVAILABLE)
data = B.make_dataset(200000, B.READ_LEN)
eng = bt.Back3pBatchEngine(B.ADAPTER)
eng.process_chunk(data)  # warm/compile

t = {}
def tick(name, t0):
    t[name] = t.get(name, 0.0) + (time.perf_counter() - t0)

t0 = time.perf_counter()
chunk = bt.parse_fastq_chunk(data)
tick("parse", t0)

lens = np.ascontiguousarray(chunk.seq_len, np.int32)
t0 = time.perf_counter()
width = eng._bucket_length(lens.max())
cand = eng._candidates(chunk, lens, width)
tick("prefilter_host", t0)
print("candidates:", len(cand), "/", chunk.n_records, "width:", width,
      "packed:", eng._packed, "sizes:", eng._dp_sizes(len(cand)))

t0 = time.perf_counter()
encs = []
off = 0
for size in eng._dp_sizes(len(cand)):
    sel = cand[off:off+size]
    enc = eng._encode_batch(chunk, sel, size, width)
    sub_len = np.zeros(size, np.int32); sub_len[:len(sel)] = lens[sel]
    encs.append((off, len(sel), enc, sub_len))
    off += size
tick("encode", t0)

t0 = time.perf_counter()
futs = [(o, c, eng._jit_locate(e, l)) for o, c, e, l in encs]
for _, _, f in futs:
    f.block_until_ready()
tick("dp_dispatch+xfer+compute", t0)

t0 = time.perf_counter()
arrs = [np.asarray(f) for _, _, f in futs]
tick("dp_fetch", t0)

t0 = time.perf_counter()
stops = lens.astype(np.int64)
stops_all = np.zeros(len(cand), np.int32)
for (o, c, _), a in zip(futs, arrs):
    stops_all[o:o+c] = a[:c] & 0x3FFF
stops[cand] = stops_all
tick("scatter", t0)

t0 = time.perf_counter()
out = bt.assemble_fastq(chunk, stops)
tick("assemble", t0)

total = sum(t.values())
for k, v in sorted(t.items(), key=lambda kv: -kv[1]):
    print(f"{k:30s} {v*1000:9.1f} ms  {v/total*100:5.1f}%")
print(f"{'TOTAL':30s} {total*1000:9.1f} ms  -> {chunk.n_records/total:,.0f} reads/s")

# end-to-end pipelined on 2 chunks to see overlap benefit
chunks, n = B.split_records(data, 100000)
list(bt.process_chunks_pipelined(eng, chunks))  # warm
t0 = time.perf_counter()
for _ in bt.process_chunks_pipelined(eng, chunks):
    pass
dt = time.perf_counter() - t0
print(f"pipelined end-to-end: {n/dt:,.0f} reads/s")
