"""Measure H2D/D2H bandwidth and latency over the device tunnel."""
import time
import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev)

for size in [1 << 10, 1 << 16, 1 << 20, 8 << 20, 32 << 20]:
    x = np.random.randint(0, 255, size, dtype=np.uint8)
    # H2D
    jax.device_put(x, dev).block_until_ready()  # warm
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        d = jax.device_put(x, dev)
        d.block_until_ready()
    h2d = (time.perf_counter() - t0) / reps
    # D2H
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(d)
    d2h = (time.perf_counter() - t0) / reps
    print(f"size {size/1e6:8.2f} MB  H2D {h2d*1000:8.1f} ms ({size/h2d/1e6:8.1f} MB/s)   D2H {d2h*1000:8.1f} ms ({size/d2h/1e6:8.1f} MB/s)")

# round-trip latency on tiny transfer
f = jax.jit(lambda x: x + 1)
x = jnp.zeros(8, jnp.int32)
f(x).block_until_ready()
t0 = time.perf_counter()
for _ in range(20):
    np.asarray(f(x))
print(f"tiny dispatch+fetch round trip: {(time.perf_counter()-t0)/20*1000:.2f} ms")

# on-device row gather speed
big = jax.device_put(np.random.randint(0, 16, (262144, 128), np.uint8), dev)
idx = jax.device_put(np.random.randint(0, 262144, 65536).astype(np.int32), dev)
g = jax.jit(lambda b, i: jnp.take(b, i, axis=0))
g(big, idx).block_until_ready()
t0 = time.perf_counter()
for _ in range(5):
    g(big, idx).block_until_ready()
print(f"row gather (64k rows x 128B from 256k): {(time.perf_counter()-t0)/5*1000:.2f} ms")

# unpack 4-bit on device
packed = jax.device_put(np.random.randint(0, 255, (262144, 64), np.uint8), dev)
def unpack(p):
    lo = p & 0xF
    hi = p >> 4
    return jnp.stack([lo, hi], axis=-1).reshape(p.shape[0], -1)
u = jax.jit(unpack)
u(packed).block_until_ready()
t0 = time.perf_counter()
for _ in range(5):
    u(packed).block_until_ready()
print(f"4-bit unpack (256k x 128): {(time.perf_counter()-t0)/5*1000:.2f} ms")
