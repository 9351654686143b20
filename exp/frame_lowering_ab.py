"""On-chip A/B of frame-GEMM lowerings for hop-misaligned librosa configs
(16 kHz production frontends: n_fft=512, hop=160 / 130, where hop does not
divide n_fft so the zero-copy chunk view cannot frame directly).

Candidates (history, r3 measurements at 512/160, precision=high):
  - hoppad (SHIPPED): zero-pad the wall to r=ceil(n/hop) whole hops, ride
    the fused chunk GEMM (r=4 contiguous shifted slices, ONE K=640 dot,
    +8% zero-weight FLOPs)                                    -> 509k
  - strided: build the exact (F, 512) operand from 16 gcd-granularity
    strided slices + one K=512 dot (relayouts dominate)       -> 212k
  - gather+matmul: jnp.take frame gather + K=512 dot (the old
    fallback)                                                 -> 198k
  - XLA rfft (fft_impl="fft")                                 ->  87k
  - frames-layout Pallas kernel (pallas="force")              -> 167k

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/frame_lowering_ab.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mfcc_rust_tpu import features, librosa_config

print("backend:", jax.default_backend(), jax.devices(), flush=True)

B, T = 32, 160000
AS = B * T / 16000.0


def slopes(fn, n_slopes=5, target_ms=250.0):
    xs = jax.jit(lambda key: 0.1 * jax.random.normal(
        key, (4, B, T), jnp.float32))(jax.random.PRNGKey(7))
    jax.block_until_ready(xs)

    @jax.jit
    def run(xs, reps):
        def body(i, c):
            return c + fn(lax.dynamic_index_in_dim(xs, i % 4, keepdims=False))
        return lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(run(xs, 4))

    def timed(reps):
        t0 = time.perf_counter()
        float(run(xs, reps))
        return time.perf_counter() - t0

    per = timed(32) / 32
    r2 = max(64, int(target_ms / 1e3 / per))
    r1 = max(8, r2 // 5)
    vals = sorted(AS / ((timed(r2) - timed(r1)) / (r2 - r1))
                  for _ in range(n_slopes))
    return vals[len(vals) // 2], (vals[-1] - vals[0]) / vals[len(vals) // 2]


def bench_config(n_fft, hop, mels):
    cfg = librosa_config(16000, n_fft=n_fft, hop_length=hop, n_mels=mels)
    rng = np.random.default_rng(1)
    sig = jnp.asarray(rng.normal(0, 0.1, (2, 48000)).astype(np.float32))
    ref = np.asarray(features.mel_spectrogram_librosa(
        sig, cfg.replace(fft_impl="fft")))

    variants = [
        ("hoppad (default)", cfg, False),
        ("gather+matmul", cfg, True),  # _librosa_hoppad_ok forced False
        ("pallas frames (force)", cfg.replace(pallas="force"), False),
    ]
    orig = features._librosa_hoppad_ok
    for name, c, force_gather in variants:
        # every (re)trace — including slopes' jit-of-fn — must see the
        # forced dispatch, so the monkeypatch spans the whole measurement
        features._librosa_hoppad_ok = (
            (lambda _: False) if force_gather else orig
        )
        try:
            fn = lambda x, c=c: features.mel_spectrogram_librosa(x, c)
            out = np.asarray(fn(sig))
            rel = float(np.abs(out - ref).max() / np.abs(ref).max())
            assert rel < 1e-3, (name, rel)
            v, s = slopes(lambda x, fn=fn: fn(x).sum())
        finally:
            features._librosa_hoppad_ok = orig
        print(f"{n_fft}/{hop}  {name:22s} rel {rel:.2e}  {v/1e3:8.1f}k "
              f"audio-s/s (spread {s:.1%})", flush=True)


bench_config(512, 160, 80)
bench_config(512, 130, 64)
print("exit: 0")
