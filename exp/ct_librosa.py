"""Measure librosa CT mel path on real TPU (after the merged-stage-2 change)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from mfcc_rust_tpu import features, librosa_config


def slope(fn, make_xs, k1=2, k2=6):
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
    lcfg = librosa_config(22050)
    B, T = 32, 220500

    def mk(k):
        return jnp.asarray(rng.normal(0, 0.1, (k, B, T)).astype(np.float32))

    v = slope(lambda x: features.mel_spectrogram_librosa(x, lcfg).sum(), mk)
    print(f"librosa_mel {v*1e3:8.3f} ms  {B*10.0/v/1e3:8.1f}k audio-s/s", flush=True)
    v = slope(lambda x: features.mfcc_librosa(x, lcfg).sum(), mk)
    print(f"librosa_mfcc {v*1e3:8.3f} ms  {B*10.0/v/1e3:8.1f}k audio-s/s", flush=True)


if __name__ == "__main__":
    main()
