"""Where does the headline MFCC's time go?  (VERDICT r2 weak #1)

Stage-by-stage on-chip timing of the speechpy MFCC-13 fast path at the
headline shape (32 x 10 s @ 16 kHz), plus GEMM-shape experiments:

  A. chunk-GEMM only (the r=2 shifted K=160 dots)
  B. fused-chunk variant: ONE K=320 dot over concat(ch[:-1], ch[1:])
  C. + square + mel projection
  D. + Parseval energies
  E. full mfcc (log, DCT, energy scatter)
  F. full mfcc with the fused-chunk GEMM
  G. raw GEMM rate at the exact headline shapes, per precision

Measurement: ONE jitted fori_loop with a *dynamic* rep count (single
compile), timed at two rep counts chosen so the differential compute is
~250 ms — the earlier 6-iteration two-point slope was 100% tunnel jitter
(negative TFLOP/s, 22,000% spreads).  Median of 5 slopes + rel spread.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mfcc_rust_tpu import FeatureConfig, features
from mfcc_rust_tpu.constants import chunk_gemm_wall, constant_bundle
from mfcc_rust_tpu.features import (_chunk_gemm, _extract_heads,
                                    _parseval_energies, _stacked_fb)
from mfcc_rust_tpu.ops.dct import dct2_ortho
from mfcc_rust_tpu.ops.spectrum import zero_handling

rng = np.random.default_rng(0)
B, T = 32, 160000
AS = B * T / 16000.0
NX = 4  # distinct inputs cycled through the loop


def measure(make_fn, shape=(B, T), work_per_iter=None, target_ms=250.0,
            n_slopes=5):
    """Median of n two-point slopes of a dynamic-rep fori_loop.

    Returns (seconds per iteration, rel spread).  Inputs are generated ON
    DEVICE (host->device transfers through the tunnel dwarf the signal)."""
    xs = jax.jit(lambda key: 0.1 * jax.random.normal(
        key, (NX,) + shape, jnp.float32))(jax.random.PRNGKey(7))
    jax.block_until_ready(xs)

    @jax.jit
    def run(xs, reps):
        def body(i, c):
            return c + make_fn(lax.dynamic_index_in_dim(
                xs, i % NX, keepdims=False))
        return lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(run(xs, 4))  # compile + warm

    def timed(reps):
        t0 = time.perf_counter()
        float(run(xs, reps))
        return time.perf_counter() - t0

    per = timed(32) / 32

    def one(tms):
        r2 = max(64, int(tms / 1e3 / per))
        r1 = max(8, r2 // 5)
        vals = []
        for _ in range(n_slopes):
            vals.append((timed(r2) - timed(r1)) / (r2 - r1))
        vals.sort()
        med = vals[len(vals) // 2]
        return med, (vals[-1] - vals[0]) / med

    # spread discipline (VERDICT r3 #5, same rule as bench._slope_timer):
    # retry with a doubled differential until <= 15% or two retries spent
    med, spread = one(target_ms)
    tms = target_ms
    for _ in range(2):
        if spread <= 0.15:
            break
        tms *= 2.0
        m2, s2 = one(tms)
        if s2 < spread:
            med, spread = m2, s2
    return med, spread


cfg = FeatureConfig(sample_rate=16000)
bundle = constant_bundle(cfg)
wd = chunk_gemm_wall(cfg, want_energy=True)
wall = wd["wall"]
hop, fl, r, kmax = wd["hop"], wd["fl"], wd["r"], wd["kmax"]
n = cfg.fft_points
n_frames = (T - fl) // hop + 1  # zero_padding=False count for full-length rows
print(f"wall {wall.shape}, r={r}, hop={hop}, kmax={kmax}, frames/row={n_frames}",
      flush=True)


def fused_chunk_gemm(signal, wall_np, n_frames, hop):
    """ONE K=r*hop GEMM: materialize overlapping [chunk_f | chunk_{f+1} ...]
    rows (costs (r-1)x extra signal bytes, buys full-K MXU tiles)."""
    r = wall_np.shape[0] // hop
    wj = jnp.asarray(wall_np, signal.dtype)
    need = (n_frames + r - 1) * hop
    if need > signal.shape[-1]:
        pad = [(0, 0)] * (signal.ndim - 1) + [(0, need - signal.shape[-1])]
        signal = jnp.pad(signal, pad)
    ch = signal[..., :need].reshape(signal.shape[:-1] + (n_frames + r - 1, hop))
    big = jnp.concatenate([ch[..., s : s + n_frames, :] for s in range(r)],
                          axis=-1)  # (..., n_frames, r*hop)
    return ch, jnp.matmul(big, wj, precision=cfg.precision)


def stage_a(x):  # chunk-GEMM only  (square before sum: a plain sum(dot)
    _, y = _chunk_gemm(x, wall, n_frames, hop, cfg.precision)
    return (y * y).sum()  # is algebraically reducible and could elide the GEMM)


def stage_b(x):  # fused single-GEMM variant
    _, y = fused_chunk_gemm(x, wall, n_frames, hop)
    return (y * y).sum()


fb2 = _stacked_fb(bundle["fbank"], kmax, wall.shape[1], 1.0 / n)


def stage_c(x):  # + square + mel projection
    _, y = _chunk_gemm(x, wall, n_frames, hop, cfg.precision)
    mel = jnp.matmul(y * y, jnp.asarray(fb2, y.dtype), precision=cfg.precision)
    return mel.sum()


def stage_d(x):  # + Parseval energies
    ch, y = _chunk_gemm(x, wall, n_frames, hop, cfg.precision)
    mel = jnp.matmul(y * y, jnp.asarray(fb2, y.dtype), precision=cfg.precision)
    e = _parseval_energies(ch, y[..., 2 * kmax], y[..., 2 * kmax + 1], wd, n,
                           n_frames, cfg)
    return mel.sum() + e.sum()


def stage_e(x):  # full mfcc
    return features.mfcc(x, cfg).sum()


def stage_f(x):  # full mfcc on the fused-chunk GEMM
    ch, y = fused_chunk_gemm(x, wall, n_frames, hop)
    mel = zero_handling(
        jnp.matmul(y * y, jnp.asarray(fb2, y.dtype), precision=cfg.precision))
    e = _parseval_energies(ch, y[..., 2 * kmax], y[..., 2 * kmax + 1], wd, n,
                           n_frames, cfg)
    out = dct2_ortho(jnp.log(mel), cfg)
    out = out.at[..., 0].set(jnp.log(e))
    return out.sum()


for name, fn in (
    ("A chunk-GEMM only (2 x K=160)", stage_a),
    ("B fused one-GEMM (K=320)", stage_b),
    ("C + square + mel proj", stage_c),
    ("D + parseval energies", stage_d),
    ("E full mfcc", stage_e),
    ("F full mfcc, fused GEMM", stage_f),
):
    per, spr = measure(fn)
    print(f"{name:32s}: {AS/per/1e3:8.1f}k audio-s/s  ({per*1e3:7.3f} ms/iter,"
          f" spread {spr:.1%})", flush=True)

# precision ladder on the full pipeline
for prec in ("high", "default"):
    c2 = cfg.replace(precision=prec)
    per, spr = measure(lambda x, c=c2: features.mfcc(x, c).sum())
    print(f"E full mfcc precision={prec:8s}: {AS/per/1e3:8.1f}k audio-s/s  "
          f"({per*1e3:7.3f} ms/iter, spread {spr:.1%})", flush=True)

# G: raw GEMM rates at the exact pipeline shapes (M = B*frames)
M = B * n_frames
for k, nn in ((160, 516), (320, 516), (320, 512), (320, 640), (516, 40),
              (516, 128)):
    w = jax.jit(lambda key, k=k, nn=nn: jax.random.normal(
        key, (k, nn), jnp.float32))(jax.random.PRNGKey(nn))
    jax.block_until_ready(w)
    for prec in ("highest", "high"):
        per, spr = measure(
            lambda a, w=w, prec=prec: jnp.square(jnp.matmul(
                a, w, precision=prec)).mean(),
            shape=(M, k))
        tf = 2.0 * M * k * nn / per / 1e12
        print(f"G raw GEMM ({M}, {k})@({k}, {nn}) prec={prec:7s}: "
              f"{tf:7.2f} TFLOP/s  (spread {spr:.1%})", flush=True)
