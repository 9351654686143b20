"""Does the fused one-GEMM chunk frontend still win at precision=high?

The fused K=r*hop dot buys MXU K-tile utilization (160->256 pad vs
320->384) at the cost of materializing (r-1)x extra signal bytes for the
`big` operand.  At "highest" (6-pass) the GEMM dominates and fusing won
+16% end-to-end; at "high" (3-pass, now the default) the GEMM halves but
the HBM cost of `big` does not — cross-artifact numbers suggested the split
form wins there.  Same-process 2x2 A/B: {split, fused} x {high, highest},
full MFCC-13 at the headline shape.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/fused_precision_ab.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    from mfcc_rust_tpu import FeatureConfig, features
    from mfcc_rust_tpu.constants import chunk_gemm_wall, constant_bundle
    from mfcc_rust_tpu.features import (_chunk_gemm, _parseval_energies,
                                        _stacked_fb)
    from mfcc_rust_tpu.ops.dct import dct2_ortho
    from mfcc_rust_tpu.ops.spectrum import zero_handling

    B, T = 32, 160000
    AS = B * T / 16000.0
    NX = 4

    def measure(make_fn, target_ms=250.0, n_slopes=5):
        xs = jax.jit(lambda key: 0.1 * jax.random.normal(
            key, (NX, B, T), jnp.float32))(jax.random.PRNGKey(7))
        jax.block_until_ready(xs)

        @jax.jit
        def run(xs, reps):
            def body(i, c):
                return c + make_fn(lax.dynamic_index_in_dim(
                    xs, i % NX, keepdims=False))
            return lax.fori_loop(0, reps, body, jnp.float32(0.0))

        float(run(xs, 4))

        def timed(reps):
            t0 = time.perf_counter()
            float(run(xs, reps))
            return time.perf_counter() - t0

        per = timed(32) / 32
        r2 = max(64, int(target_ms / 1e3 / per))
        r1 = max(8, r2 // 5)
        vals = []
        for _ in range(n_slopes):
            vals.append((timed(r2) - timed(r1)) / (r2 - r1))
        vals.sort()
        med = vals[len(vals) // 2]
        return med, (vals[-1] - vals[0]) / med

    base = FeatureConfig(sample_rate=16000)
    bundle = constant_bundle(base)
    wd = chunk_gemm_wall(base, want_energy=True)
    wall, hop, fl, kmax = wd["wall"], wd["hop"], wd["fl"], wd["kmax"]
    n = base.fft_points
    n_frames = (T - fl) // hop + 1
    fb2 = _stacked_fb(bundle["fbank"], kmax, wall.shape[1], 1.0 / n)

    def full_mfcc(x, cfg, fuse):
        ch, y = _chunk_gemm(x, wall, n_frames, hop, cfg.precision, fuse=fuse)
        mel = zero_handling(jnp.matmul(
            y * y, jnp.asarray(fb2, y.dtype), precision=cfg.precision))
        e = _parseval_energies(ch, y[..., 2 * kmax], y[..., 2 * kmax + 1],
                               wd, n, n_frames, cfg)
        out = dct2_ortho(jnp.log(mel), cfg)
        return out.at[..., 0].set(jnp.log(e)).sum()

    for prec in ("high", "highest"):
        cfg = base.replace(precision=prec)
        for fuse in (False, True):
            per, spr = measure(functools.partial(full_mfcc, cfg=cfg,
                                                 fuse=fuse))
            tag = "fused" if fuse else "split"
            print(f"mfcc prec={prec:7s} {tag:5s}: {AS/per/1e3:8.1f}k "
                  f"audio-s/s  ({per*1e3:7.3f} ms/iter, spread {spr:.1%})",
                  flush=True)
    print("exit: 0")


if __name__ == "__main__":
    main()
