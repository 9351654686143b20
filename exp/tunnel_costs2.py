"""Replicate the corpus runner's round-trip pattern with COMPUTED outputs
(device_put'd arrays keep a host copy, so only computed results measure real
D2H).  Compare: fetch-after-each-dispatch, dispatch-all-then-fetch-each, and
dispatch-all-then-one-grouped-concat-fetch; plus computed-D2H bandwidth."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(f, n=4):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


# computed-D2H bandwidth
for mb in (1, 4, 16, 64):
    n = int(mb * 1024 * 1024 / 4)
    a = jax.device_put(np.zeros(n, np.float32))
    f = jax.jit(lambda x: x + 1.0)
    np.asarray(f(a))
    dt = t(lambda: np.asarray(f(a)))
    print(f"computed fetch {mb:3d} MB: {dt*1e3:8.1f} ms ({mb/dt:7.1f} MB/s)",
          flush=True)

K = 13
MB = 2
n = int(MB * 1024 * 1024 / 4)
ins = [jax.device_put(np.full(n, i, np.float32)) for i in range(K)]
jax.block_until_ready(ins)
f = jax.jit(lambda x: x * 2.0 + 1.0)
g = jax.jit(lambda a: jnp.concatenate(a))
np.asarray(f(ins[0])); np.asarray(g([f(x) for x in ins]))

dt = t(lambda: [np.asarray(f(x)) for x in ins])
print(f"{K} x (dispatch+fetch {MB}MB) interleaved: {dt*1e3:8.1f} ms", flush=True)

def all_then_each():
    outs = [f(x) for x in ins]
    return [np.asarray(o) for o in outs]
dt = t(all_then_each)
print(f"dispatch all {K}, then fetch each:       {dt*1e3:8.1f} ms", flush=True)

def all_then_group():
    outs = [f(x) for x in ins]
    return np.asarray(g(outs))
dt = t(all_then_group)
print(f"dispatch all {K}, concat, 1 fetch:       {dt*1e3:8.1f} ms", flush=True)

# does jax.block_until_ready + individual fetches differ?
def all_block_each():
    outs = [f(x) for x in ins]
    jax.block_until_ready(outs)
    return [np.asarray(o) for o in outs]
dt = t(all_block_each)
print(f"dispatch all {K}, block, fetch each:     {dt*1e3:8.1f} ms", flush=True)
