"""On-chip (real Mosaic) A/B + throughput for the frames-input CT kernel
layout (512/160 and 512/130 16 kHz production configs) vs the XLA lowering.
The chunked 2048/512 layout is re-gated for regression."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mfcc_rust_tpu import features, librosa_config

print("backend:", jax.default_backend(), jax.devices(), flush=True)

B, T = 32, 160000
AS = B * T / 16000.0
K1, K2 = 2, 8


def slopes(fn, n_slopes=5):
    def build(k):
        gen = jax.jit(lambda key: 0.1 * jax.random.normal(
            key, (k, B, T), jnp.float32))
        xs = gen(jax.random.PRNGKey(k))
        jax.block_until_ready(xs)
        f = jax.jit(lambda xs: lax.scan(
            lambda c, x: (c + fn(x), None), jnp.float32(0), xs)[0])
        float(f(xs))
        return f, xs

    f1, x1 = build(K1)
    f2, x2 = build(K2)
    vals = []
    for _ in range(n_slopes):
        t0 = time.perf_counter(); float(f1(x1)); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f2(x2)); tb = time.perf_counter() - t0
        vals.append(AS / ((tb - ta) / (K2 - K1)))
    vals.sort()
    return vals[len(vals) // 2], (vals[-1] - vals[0]) / vals[len(vals) // 2]


for name, cfg in (
    ("512/160 (frames layout)",
     librosa_config(16000, n_fft=512, hop_length=160, n_mels=80)),
    ("512/130 (frames+gather)",
     librosa_config(16000, n_fft=512, hop_length=130, n_mels=64)),
    ("2048/512 @16k (chunked)",
     librosa_config(16000)),
):
    rng = np.random.default_rng(1)
    sig = jnp.asarray(rng.normal(0, 0.1, (2, 48000)).astype(np.float32))
    ref = np.asarray(
        features.mel_spectrogram_librosa(sig, cfg.replace(pallas="off")))
    out = np.asarray(features.mel_spectrogram_librosa(sig, cfg))
    rel = float(np.abs(out - ref).max() / np.abs(ref).max())
    print(f"{name:26s} A/B max rel err: {rel:.3e}", flush=True)
    assert rel < 1e-3, (name, rel)
    vk, sk = slopes(lambda x, c=cfg: features.mel_spectrogram_librosa(
        x, c).sum())
    vx, sx = slopes(lambda x, c=cfg: features.mel_spectrogram_librosa(
        x, c.replace(pallas="off")).sum())
    print(f"{name:26s} kernel {vk/1e3:8.1f}k (spread {sk:.1%})  "
          f"XLA {vx/1e3:8.1f}k (spread {sx:.1%})  ratio {vk/vx:.2f}x",
          flush=True)
