"""Probe today's tunnel D2H profile: fixed per-fetch latency, bandwidth, and
concurrency scaling — sizes the win for the corpus output-staging design.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/d2h_profile.py
"""
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    def mk(nbytes):
        n = max(1, nbytes // 4)
        x = jax.device_put(np.zeros(n, np.float32), dev)
        jax.block_until_ready(x)
        return x

    # fixed + bandwidth: fetch sizes 4KB .. 32MB.  A FRESH device buffer per
    # fetch — repeating np.asarray on the same array reads a host-side cache
    # and measures nothing.
    mk(4 << 10)  # one throwaway put (first-ever call pays startup)
    for nb in (4 << 10, 256 << 10, 1 << 20, 4 << 20, 16 << 20, 32 << 20):
        ts = []
        for i in range(5):
            n = max(1, nb // 4)
            x = jax.device_put(np.full(n, float(i), np.float32), dev)
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            np.asarray(x)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        print(f"D2H {nb/2**20:8.3f} MB: {med*1e3:7.1f} ms  "
              f"({nb/med/1e6:7.1f} MB/s)  min {ts[0]*1e3:.1f} max {ts[-1]*1e3:.1f}")

    # concurrency: K parallel 1MB fetches of distinct arrays
    for k in (1, 2, 4, 8):
        xs = [mk(1 << 20) for _ in range(k)]
        with ThreadPoolExecutor(k) as ex:
            t0 = time.perf_counter()
            list(ex.map(lambda a: np.asarray(a), xs))
            dt = time.perf_counter() - t0
        print(f"concurrent {k} x 1MB fetches: {dt*1e3:7.1f} ms total "
              f"({dt*1e3/k:6.1f} ms/fetch effective)")


if __name__ == "__main__":
    main()
