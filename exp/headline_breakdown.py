"""Where does the headline MFCC's time go?  (VERDICT r2 weak #1)

Stage-by-stage on-chip timing of the speechpy MFCC-13 fast path at the
headline shape (64 x 10 s @ 16 kHz), plus GEMM-shape experiments:

  A. chunk-GEMM only (the r=2 shifted K=160 dots)
  B. fused-chunk variant: ONE K=320 dot over concat(ch[:-1], ch[1:])
  C. + square + mel projection
  D. + Parseval energies
  E. full mfcc (log, DCT, energy scatter)
  F. full mfcc with the fused-chunk GEMM
  G. raw GEMM rate at the exact headline shapes, per precision

Each number is the median of 5 independent two-point slopes with the
rel spread, so 1.2-2x questions are answerable (VERDICT r2 weak #2).
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
K1, K2 = 2, 8


def slopes(make_fn, n_slopes=5):
    """n independent two-point slopes; returns (median audio-s/s, rel spread).
    Inputs are generated ON DEVICE (jax.random) — multi-GB host->device
    transfers through the tunnel dwarf the measurement itself."""

    def build(k):
        gen = jax.jit(lambda key: 0.1 * jax.random.normal(
            key, (k, B, T), jnp.float32))
        xs = gen(jax.random.PRNGKey(k))
        jax.block_until_ready(xs)
        fn = jax.jit(lambda xs: lax.scan(
            lambda c, x: (c + make_fn(x), None), jnp.float32(0), xs)[0])
        float(fn(xs))
        return fn, xs

    f1, x1 = build(K1)
    f2, x2 = build(K2)
    vals = []
    for _ in range(n_slopes):
        t0 = time.perf_counter(); float(f1(x1)); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f2(x2)); tb = time.perf_counter() - t0
        vals.append(AS / ((tb - ta) / (K2 - K1)))
    vals = sorted(vals)
    med = vals[len(vals) // 2]
    spread = (vals[-1] - vals[0]) / med
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


def stage_a(x):  # chunk-GEMM only
    _, y = _chunk_gemm(x, wall, n_frames, hop, cfg.precision)
    return y.sum()


def stage_b(x):  # fused single-GEMM variant
    _, y = fused_chunk_gemm(x, wall, n_frames, hop)
    return y.sum()


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
    med, spr = slopes(fn)
    print(f"{name:32s}: {med/1e3:8.1f}k audio-s/s  (spread {spr:.1%})",
          flush=True)

# precision ladder on the full pipeline
for prec in ("high", "default"):
    c2 = cfg.replace(precision=prec)
    med, spr = slopes(lambda x, c=c2: features.mfcc(x, c).sum())
    print(f"E full mfcc precision={prec:8s}: {med/1e3:8.1f}k audio-s/s  "
          f"(spread {spr:.1%})", flush=True)

# G: raw GEMM rates at the exact pipeline shapes (M = B*frames)
M = B * n_frames


def raw_gemm(m, k, nn, precision, steps=8):
    xs = jax.jit(lambda key: jax.random.normal(key, (steps, m, k),
                                               jnp.float32))(
        jax.random.PRNGKey(steps + k))
    w = jax.jit(lambda key: jax.random.normal(key, (k, nn), jnp.float32))(
        jax.random.PRNGKey(nn))
    jax.block_until_ready((xs, w))
    f = jax.jit(lambda xs: lax.scan(
        lambda c, a: (c + jnp.matmul(a, w, precision=precision)[0, 0], None),
        jnp.float32(0), xs)[0])
    f1 = jax.jit(lambda xs: lax.scan(
        lambda c, a: (c + jnp.matmul(a, w, precision=precision)[0, 0], None),
        jnp.float32(0), xs[:1])[0])

    def bt(fn, x):
        float(fn(x))
        b = float("inf")
        for _ in range(5):
            t0 = time.perf_counter(); float(fn(x)); b = min(b, time.perf_counter() - t0)
        return b

    per = (bt(f, xs) - bt(f1, xs)) / (steps - 1)
    return 2.0 * m * k * nn / per / 1e12


for k, nn in ((160, 516), (320, 516), (320, 512), (320, 640), (516, 40),
              (516, 128)):
    for prec in ("highest", "high"):
        r_ = raw_gemm(M, k, nn, prec)
        print(f"G raw GEMM ({M}, {k})@({k}, {nn}) prec={prec:7s}: "
              f"{r_:7.2f} TFLOP/s", flush=True)
