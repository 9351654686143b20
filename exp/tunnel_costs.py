"""Measure the axon tunnel's cost model: per-dispatch latency, per-ARGUMENT
cost of a jit call, per-fetch latency, and D2H bandwidth — to decide how the
corpus runner should batch its device round trips."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(f, n=5):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


# warm one resident array
xs = [jax.device_put(np.full((256, 256), i, np.float32)) for i in range(64)]
jax.block_until_ready(xs)

# fetch latency vs size
for mb in (0.0625, 1, 8, 32):
    n = int(mb * 1024 * 1024 / 4)
    a = jax.device_put(np.zeros(n, np.float32))
    jax.block_until_ready(a)
    dt = t(lambda: np.asarray(a))
    print(f"fetch {mb:7.4f} MB: {dt*1e3:8.1f} ms  ({mb/dt:8.1f} MB/s)", flush=True)

# jit call with k args (tiny compute), completion via scalar fetch
for k in (1, 2, 4, 8, 16, 32, 64):
    f = jax.jit(lambda *a: sum(x.sum() for x in a))
    r = f(*xs[:k]); float(r)  # compile
    dt = t(lambda: float(f(*xs[:k])))
    print(f"jit call {k:3d} args + scalar fetch: {dt*1e3:8.1f} ms", flush=True)

# dispatch-only (no fetch): is dispatch async?
f1 = jax.jit(lambda x: (x * 2).sum())
r = f1(xs[0]); float(r)
dt = t(lambda: f1(xs[0]))
print(f"dispatch only (1 arg, no fetch): {dt*1e3:8.1f} ms", flush=True)

# k fetches of small arrays vs 1 fetch of concat
small = [jax.device_put(np.zeros(65536, np.float32)) for _ in range(16)]
jax.block_until_ready(small)
dt = t(lambda: [np.asarray(s) for s in small])
print(f"16 separate 256KB fetches: {dt*1e3:8.1f} ms", flush=True)
g = jax.jit(lambda a: jnp.concatenate(a))
r = g(small); np.asarray(r)
dt = t(lambda: np.asarray(g(small)))
print(f"1 concat(16 args) + 1 4MB fetch: {dt*1e3:8.1f} ms", flush=True)
