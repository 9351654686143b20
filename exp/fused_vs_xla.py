"""Compare the Pallas fused frontend vs the XLA fast path on real TPU,
plus a stage breakdown of the XLA path."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from mfcc_rust_tpu import FeatureConfig, features
from mfcc_rust_tpu.ops.pallas import fused_mfcc


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
    cfg = FeatureConfig(sample_rate=16000)
    B, T = 64, 160000

    def mk(k):
        return jnp.asarray(rng.normal(0, 0.1, (k, B, T)).astype(np.float32))

    res = {}
    res["xla_mfcc"] = slope(lambda x: features.mfcc(x, cfg).sum(), mk)
    for tf in (256, 512, 1024):
        res[f"pallas_mfcc_tile{tf}"] = slope(
            lambda x, tf=tf: fused_mfcc(x, cfg, tile_f=tf).sum(), mk
        )

    # stage breakdown of the XLA path
    res["xla_mfe"] = slope(lambda x: sum(v.sum() for v in features.mfe(x, cfg)), mk)

    def mel_only(x):
        f, _ = features._chunked_mel_energy(x, cfg, want_energy=False)
        return f.sum()

    res["xla_mel_noenergy"] = slope(mel_only, mk)

    for k, v in res.items():
        print(f"{k:24s} {v*1e3:8.3f} ms  {64*10.0/v/1e3:8.1f}k audio-s/s", flush=True)


if __name__ == "__main__":
    main()
