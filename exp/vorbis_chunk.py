"""A/B: vorbis mel via frame gather vs gather-free zero-padded chunk-GEMM."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mfcc_rust_tpu import features, vorbis_config
from mfcc_rust_tpu.constants import constant_bundle
from mfcc_rust_tpu.features import _stacked_fb
from mfcc_rust_tpu.ops import stft as _stft


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


def mel_gather(signal, cfg):
    """The OLD lowering this experiment replaced (kept inline as the
    baseline, since features.mel_spectrogram now uses the chunked form):
    frame-gather + [C|S] GEMM + stacked projection."""
    bundle = constant_bundle(cfg)
    kmax = bundle["fbank_kmax"]
    c64, s64 = bundle["dft_windowed"]
    frames = _stft._vorbis_frames(signal, cfg)
    wall = np.concatenate([c64[:, :kmax], s64[:, :kmax]], axis=1)
    y = jnp.matmul(frames, jnp.asarray(wall, signal.dtype), precision=cfg.precision)
    fb2 = _stacked_fb(bundle["fbank"], kmax, 2 * kmax, cfg.wnorm * cfg.wnorm)
    mel = jnp.matmul(y * y, jnp.asarray(fb2, signal.dtype), precision=cfg.precision)
    mel = _stft._apply_npad_layout(mel, cfg)
    return jnp.swapaxes(mel, -1, -2)


def main():
    rng = np.random.default_rng(0)
    cfg = vorbis_config(16000)
    B, T = 64, 160000

    # correctness first (small, on-device): production (chunked) vs the old
    # gather lowering reconstructed above
    x = jnp.asarray(rng.normal(0, 0.1, (2, 16000)).astype(np.float32))
    a = np.asarray(mel_gather(x, cfg))
    b = np.asarray(features.mel_spectrogram(x, cfg))
    err = np.max(np.abs(a - b) / (np.abs(a) + 1e-6))
    print(f"max rel err gather vs chunked: {err:.2e}", flush=True)

    def mk(k):
        return jnp.asarray(rng.normal(0, 0.1, (k, B, T)).astype(np.float32))

    v = slope(lambda s: mel_gather(s, cfg).sum(), mk)
    print(f"gather   {v*1e3:8.3f} ms  {B*10.0/v/1e3:8.1f}k audio-s/s", flush=True)
    v = slope(lambda s: features.mel_spectrogram(s, cfg).sum(), mk)
    print(f"chunked  {v*1e3:8.3f} ms  {B*10.0/v/1e3:8.1f}k audio-s/s", flush=True)


if __name__ == "__main__":
    main()
