"""Perf experiment: MXU tiling of the headline chunk-GEMM.

Variants of the (frames @ wall) contraction at HIGHEST precision, slope-timed
on the real TPU. M = 64*1000 chunk rows (the 64x10s headline batch).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

P = jax.lax.Precision.HIGHEST


def slope(fn, make_xs, k1=4, k2=12):
    def timed(k):
        xs = make_xs(k)
        f = jax.jit(lambda xs: lax.scan(lambda c, x: (c + fn(x), None), jnp.float32(0), xs)[0])
        float(f(xs))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(xs))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k2) - timed(k1)) / (k2 - k1)


def main():
    rng = np.random.default_rng(0)
    B, C, HOP = 64, 1001, 160  # 64 x 10s => 1000 frames, 1001 chunks
    F = C - 1

    def mk(shape):
        return lambda k: jnp.asarray(rng.normal(0, 0.1, (k,) + shape).astype(np.float32))

    results = {}

    # A: current lowering — r=2 shifted slices @ (160, N) walls
    for N in (260, 256):
        w = jnp.asarray(rng.normal(size=(2, HOP, N)).astype(np.float32))

        def f(x, w=w):
            y = jnp.matmul(x[:, :F], w[0], precision=P) + jnp.matmul(x[:, 1:], w[1], precision=P)
            return y.sum()

        results[f"r2_slices_N{N}"] = slope(f, mk((B, C, HOP)))

    # B: K-packed — concat slices along K, one (M, 320) @ (320, N)
    for N in (260, 256):
        w = jnp.asarray(rng.normal(size=(2 * HOP, N)).astype(np.float32))

        def f(x, w=w):
            fr = jnp.concatenate([x[:, :F, :], x[:, 1:, :]], axis=-1).reshape(B * F, 2 * HOP)
            return jnp.matmul(fr, w, precision=P).sum()

        results[f"kpack_N{N}"] = slope(f, mk((B, C, HOP)))

    # C: transposed orientation — wall^T @ frames^T via dot_general
    w = jnp.asarray(rng.normal(size=(2, HOP, 260)).astype(np.float32))

    def ft(x):
        # (N,hop) @ (hop, M) twice; contract x rows
        y = jnp.einsum("hn,bmh->bnm", w[0], x[:, :F], precision=P) + jnp.einsum(
            "hn,bmh->bnm", w[1], x[:, 1:], precision=P
        )
        return y.sum()

    results["transposed_N260"] = slope(ft, mk((B, C, HOP)))

    # D: pure GEMM ceiling at this M with big aligned shapes
    w = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32))
    results["ceiling_512x512"] = slope(
        lambda x: jnp.matmul(x, w, precision=P).sum(), mk((B * F // 4, 512))
    )

    flop = {
        "r2_slices_N260": 2 * 2 * B * F * HOP * 260,
        "r2_slices_N256": 2 * 2 * B * F * HOP * 256,
        "kpack_N260": 2 * B * F * 2 * HOP * 260,
        "kpack_N256": 2 * B * F * 2 * HOP * 256,
        "transposed_N260": 2 * 2 * B * F * HOP * 260,
        "ceiling_512x512": 2 * (B * F // 4) * 512 * 512,
    }
    for k, v in results.items():
        print(f"{k:24s} {v*1e3:8.3f} ms  {flop[k]/v/1e12:6.2f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
