"""Measure all production pipelines on the real TPU (slope-timed)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mfcc_rust_tpu import FeatureConfig, features, librosa_config, vorbis_config


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
    res = {}

    def mk(shape):
        return lambda k: jnp.asarray(rng.normal(0, 0.1, (k,) + shape).astype(np.float32))

    B, T = 64, 160000
    res["mfcc (headline)"] = (slope(lambda x: features.mfcc(x, cfg).sum(), mk((B, T))), B * 10.0)
    res["mfe"] = (slope(lambda x: sum(v.sum() for v in features.mfe(x, cfg)), mk((B, T))), B * 10.0)

    vcfg = vorbis_config(16000)
    res["vorbis mel"] = (
        slope(lambda x: features.mel_spectrogram(x, vcfg).sum(), mk((B, T))), B * 10.0,
    )

    lcfg = librosa_config(22050)
    B2, T2 = 32, 220500
    res["librosa mel"] = (
        slope(lambda x: features.mel_spectrogram_librosa(x, lcfg).sum(), mk((B2, T2)), 2, 6),
        B2 * 10.0,
    )
    res["librosa mfcc"] = (
        slope(lambda x: features.mfcc_librosa(x, lcfg).sum(), mk((B2, T2)), 2, 6),
        B2 * 10.0,
    )

    for k, (v, aud) in res.items():
        print(f"{k:20s} {v*1e3:8.3f} ms  {aud/v/1e3:8.1f}k audio-s/s", flush=True)


if __name__ == "__main__":
    main()
