"""CT librosa-path variants on the real TPU.

Breakdown showed stage2+proj (the FLOPs core) is cheap and the pipeline is
dominated by stage 1 (K=16 left matmul), the twiddle elementwise pass, and
the z-concat.  Variants:

  v0_full     — shipped ct_power_project on pre-windowed frames
  s1_only     — stage-1 GEMM alone
  s1_tw       — stage 1 + twiddle elementwise
  v1_foldtw   — twiddle folded into per-r batched stage-2 matrices:
                Xr = ir@P_r - ii@Q_r, Xi = ir@Q_r + ii@P_r
                (two 'frn,rnk->frk' einsums, K=128; no twiddle pass, no concat)
  v2_herm     — v1 + Hermitian stage 1: inner[N2-r] = conj(inner[r]), so
                stage 1 emits only r=0..8 and the batched stage-2 gathers
                rows with conjugate signs folded into the matrices.

Each variant is checked allclose against v0 before timing.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from mfcc_rust_tpu import librosa_config
from mfcc_rust_tpu.constants import constant_bundle
from mfcc_rust_tpu.ops.fft import (
    _ct_constants,
    _ct_stage_matrices,
    ct_power_project,
    good_factorization,
    permute_weights_for_ct,
)

lcfg = librosa_config(22050)
N = lcfg.fft_points
HOP = lcfg.frame_step
N1, N2 = good_factorization(N)
K1MAX = N1 // 2  # Nyquist plane trimmed (mel weight there is 0)

bundle = constant_bundle(lcfg)
FBP = permute_weights_for_ct(bundle["fbank"], N, (N1, N2)).T  # (N2*K1MAX, M)

c2, s2, c1, s1, twr, twi = _ct_constants(N, N1, N2)
ST1, ST2 = _ct_stage_matrices(N, N1, N2, K1MAX)

# per-r twiddle-folded stage-2: P_r = diag(twr[:,r])c1 - diag(twi[:,r])s1 etc.
c1t, s1t = c1[:, :K1MAX], s1[:, :K1MAX]
P = twr.T[:, :, None] * c1t[None] - twi.T[:, :, None] * s1t[None]  # (N2, N1, K1MAX)
Q = twi.T[:, :, None] * c1t[None] + twr.T[:, :, None] * s1t[None]
A = np.concatenate([P, Q], axis=2)   # ir @ A -> [Xr | Xi] contribution
B = np.concatenate([-Q, P], axis=2)  # ii @ B

# Hermitian-halved stage 1: rows r = 0..N2//2 (9 of 16); for r > N2//2 use
# inner[N2-r] with conjugated imag.  Fold the sign into per-r matrices.
RH = N2 // 2 + 1
ST1_H = np.concatenate([c2.T[:RH], s2.T[:RH]], axis=0)  # (2*RH, N2)
IDX = np.array([r if r < RH else N2 - r for r in range(N2)])
SGN = np.array([1.0 if r < RH else -1.0 for r in range(N2)])
B_H = B * SGN[:, None, None]  # ii sign conj folded into the ii-side matrix


def v1_foldtw(frames, precision="highest"):
    y = jnp.matmul(jnp.asarray(ST1, frames.dtype), frames, precision=precision)
    ir, ii = y[..., :N2, :], y[..., N2:, :]
    X = jnp.einsum("...rn,rnk->...rk", ir, jnp.asarray(A, frames.dtype),
                   precision=precision) + jnp.einsum(
        "...rn,rnk->...rk", ii, jnp.asarray(B, frames.dtype),
        precision=precision)
    xr, xi = X[..., :K1MAX], X[..., K1MAX:]
    power = xr * xr + xi * xi
    flat = power.reshape(power.shape[:-2] + (-1,))
    return jnp.matmul(flat, jnp.asarray(FBP, frames.dtype), precision=precision)


def v2_herm(frames, precision="highest"):
    y = jnp.matmul(jnp.asarray(ST1_H, frames.dtype), frames, precision=precision)
    ir = y[..., IDX, :]
    ii = y[..., RH + IDX, :]
    X = jnp.einsum("...rn,rnk->...rk", ir, jnp.asarray(A, frames.dtype),
                   precision=precision) + jnp.einsum(
        "...rn,rnk->...rk", ii, jnp.asarray(B_H, frames.dtype),
        precision=precision)
    xr, xi = X[..., :K1MAX], X[..., K1MAX:]
    power = xr * xr + xi * xi
    flat = power.reshape(power.shape[:-2] + (-1,))
    return jnp.matmul(flat, jnp.asarray(FBP, frames.dtype), precision=precision)


def s1_only(frames):
    return jnp.matmul(jnp.asarray(ST1, frames.dtype), frames,
                      precision="highest")


def s1_tw(frames):
    y = s1_only(frames)
    ir, ii = y[..., :N2, :], y[..., N2:, :]
    twr_t = jnp.asarray(twr.T, frames.dtype)
    twi_t = jnp.asarray(twi.T, frames.dtype)
    zr = ir * twr_t - ii * twi_t
    zi = ir * twi_t + ii * twr_t
    return zr, zi


def slope(fn, make_xs, k1=2, k2=8):
    def timed(k):
        xs = make_xs(k)
        f = jax.jit(
            lambda xs: lax.scan(lambda c, x: (c + fn(x), None), jnp.float32(0), xs)[0]
        )
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
    B, T = 32, 220500
    count = 1 + (T + 2 * (N // 2) - N) // HOP
    audio_s = B * 10.0

    # correctness on small input first
    fr_small = jnp.asarray(rng.normal(0, 0.1, (3, 7, N2, N1)).astype(np.float32))
    ref = ct_power_project(fr_small, N, N1, N2, jnp.asarray(FBP, jnp.float32))
    for name, fn in [("v1_foldtw", v1_foldtw), ("v2_herm", v2_herm)]:
        got = fn(fr_small)
        err = float(jnp.max(jnp.abs(got - ref) / (jnp.abs(ref) + 1e-30)))
        print(f"{name} max relerr vs v0: {err:.2e}", flush=True)
        assert err < 1e-5, name  # f32 on TPU; exact check runs on CPU in tests

    def mk_frames(k):
        return jnp.asarray(
            rng.normal(0, 0.1, (k, B, count, N2, N1)).astype(np.float32)
        )

    def report(name, v):
        print(f"{name:10s} {v*1e3:8.3f} ms  {audio_s/v/1e3:8.1f}k audio-s/s",
              flush=True)

    report("v0_full", slope(
        lambda fr: ct_power_project(fr, N, N1, N2,
                                    jnp.asarray(FBP, jnp.float32)).sum(),
        mk_frames))
    report("s1_only", slope(lambda fr: s1_only(fr).sum(), mk_frames))
    report("s1_tw", slope(lambda fr: sum(z.sum() for z in s1_tw(fr)), mk_frames))
    report("v1_foldtw", slope(lambda fr: v1_foldtw(fr).sum(), mk_frames))
    report("v2_herm", slope(lambda fr: v2_herm(fr).sum(), mk_frames))


if __name__ == "__main__":
    main()
