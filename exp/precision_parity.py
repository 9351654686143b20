"""Measured numerical error of cfg.precision on-chip vs the float64 oracle.

Question (r3): ``precision=high`` (bf16x3, 3-pass) runs the headline MFCC
~1.57x faster than ``highest`` (6-pass f32) — exp/headline_breakdown_r03.
Is its error within the north-star parity budget (allclose rtol 1e-5,
BASELINE.json), i.e. could "high" be a legitimate TPU default?

Method: realistic batch (speech-shaped noise: white noise through a one-pole
lowpass, plus tones, PCM16-quantized) -> MFCC-13 on the chip at each
precision -> compare to tests/golden/speechpy_ref.py float64 (oracle shares
no code with the package).  The f32 pipeline itself (highest) sets the
baseline error floor; the question is how much "high"/"default" add.

Run: python exp/precision_parity.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def speechy_noise(rng, n, sr=16000):
    w = rng.normal(0, 1.0, n)
    # one-pole lowpass ~ speech spectral tilt
    a = 0.97
    y = np.empty(n)
    acc = 0.0
    for i in range(n):
        acc = a * acc + (1 - a) * w[i]
        y[i] = acc
    t = np.arange(n) / sr
    y += 0.05 * np.sin(2 * np.pi * 220 * t) + 0.02 * np.sin(2 * np.pi * 1750 * t)
    y = 0.3 * y / np.abs(y).max()
    # PCM16 grid (what a WAV decode yields)
    return np.rint(y * 32768.0).clip(-32768, 32767) / 32768.0


def main():
    import jax.numpy as jnp

    from mfcc_rust_tpu import FeatureConfig, features
    from golden import speechpy_ref as sp

    rng = np.random.default_rng(0)
    b, secs, sr = 8, 4, 16000
    sigs64 = np.stack([speechy_noise(rng, secs * sr) for _ in range(b)])
    sigs32 = sigs64.astype(np.float32)

    gold = np.stack([sp.mfcc(s, sr) for s in sigs64])  # float64 oracle

    for prec in ("highest", "high", "default"):
        cfg = FeatureConfig(sample_rate=sr, precision=prec)
        ours = np.asarray(features.mfcc(jnp.asarray(sigs32), cfg))
        assert ours.shape == gold.shape, (ours.shape, gold.shape)
        err = np.abs(ours - gold)
        rel = err / np.maximum(np.abs(gold), 1e-12)
        # allclose-style: fraction of entries violating rtol=1e-5, atol=1e-5
        viol = np.mean(err > 1e-5 + 1e-5 * np.abs(gold))
        print(f"precision={prec:8s}: max_abs {err.max():.3e}  "
              f"max_rel {rel.max():.3e}  p99.9_rel "
              f"{np.quantile(rel, 0.999):.3e}  "
              f"frac_viol(rtol=atol=1e-5) {viol:.2e}")

    print("exit: 0")


if __name__ == "__main__":
    main()
