"""Packed real-input CT rFFT experiment.

Classic real-packing: a length-N real frame becomes a length-N/2 complex
sequence v[m] = x[2m] + i·x[2m+1]; one N/2-point complex CT FFT, then the
Hermitian untangle

    X[k] = (V[k] + conj(V[M-k]))/2 - (i/2)·W_N^k·(V[k] - conj(V[M-k]))

recovers the rFFT (M = N/2).  Stage FLOPs halve vs the shipped real CT
(stage 2 contracts over the same N1 but on M=N/2 points), at the price of an
elementwise untangle with a reversed (flip) operand — exactly the kind of
lane relayout Mosaic charges for.  This experiment checks correctness and
times it against ct_power_project on the librosa mel config.

Variants:
  packed   — pack, complex CT (two merged GEMMs + folded twiddle), untangle
             on the (k,) axis, square, mel-project
  shipped  — ct_power_project as in ops/fft.py

RESULT (TPU v5e, 2026-08-18): packed 3.72 ms/batch (86k audio-s/s) vs
shipped 2.01 ms (159k audio-s/s) on identical pre-framed input — the
Hermitian untangle's reversed-gather + elementwise pass costs ~2x more than
the GEMM FLOPs it saves (stage-2 contraction halves, but Mosaic lane
flips/relayouts dominate).  Real-packing is a net loss at librosa sizes;
keep the direct real CT with folded twiddles.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

USE_CPU = "--cpu" in sys.argv
import jax

if USE_CPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax import lax

from mfcc_rust_tpu import librosa_config
from mfcc_rust_tpu.constants import constant_bundle
from mfcc_rust_tpu.ops.fft import ct_power_project, permute_weights_for_ct

lcfg = librosa_config(22050)
N = lcfg.fft_points  # 2048
M = N // 2  # 1024 complex points
N1, N2 = 128, M // 128  # complex CT factors for M
bundle = constant_bundle(lcfg)
FB = bundle["fbank"]  # (n_mels, N//2+1)
WIN = bundle["window"]


@functools.lru_cache(maxsize=4)
def _packed_constants():
    """Stage matrices for the M-point complex CT with per-r folded twiddles,
    plus the untangle twiddles.

    Complex CT on v reshaped (N2, N1) with m = n1 + N1*n2 (same layout as the
    real path):  inner DFT over n2 (contraction N2), twiddle W_M^{n1 r},
    outer DFT over n1 producing V on the (r, k1) plane, bin k = N2*k1 + r,
    k = 0..M-1 (full complex output, no Hermitian trim).
    """
    r2 = np.arange(N2)
    wi = np.exp(-2j * np.pi * np.outer(r2, r2) / N2)  # inner DFT (N2, N2)
    a1 = np.arange(N1)
    k1 = np.arange(N1)
    wo = np.exp(-2j * np.pi * np.outer(a1, k1) / N1)  # outer DFT (N1, N1)
    tw = np.exp(-2j * np.pi * np.outer(a1, r2) / M)  # twiddle W_M^{n1 r}
    # fold twiddle into per-r outer matrices: Wr[r] = diag(tw[:, r]) @ wo
    wr = tw.T[:, :, None] * wo[None]  # (N2, N1, N1) complex
    # merged real forms
    # stage 1: [vr | vi](N2,) -> [ir | ii]: left GEMM (2*N2, 2*N2)
    st1 = np.block([[wi.real, -wi.imag], [wi.imag, wi.real]]).astype(np.float64)
    # note: operates on stacked [vr; vi] along the sublane axis (2*N2, N1)
    # stage 2 per r: [zr | zi](2*N1,) @ [[Wr.r, Wr.i], [-Wr.i, Wr.r]] (2N1, 2N1)
    a = np.concatenate([wr.real, wr.imag], axis=2)  # (N2, N1, 2*N1)
    b = np.concatenate([-wr.imag, wr.real], axis=2)
    # untangle twiddle on bins k = 0..M-1 (we only keep k <= N/2 after)
    k = np.arange(M)
    wu = np.exp(-2j * np.pi * k / N)
    return st1, a, b, wu


@functools.lru_cache(maxsize=4)
def _packed_bin_maps():
    """(r, k1) plane -> flat V index k = N2*k1 + r, and the reversal map
    (M - k) mod M, both as flat gathers on the (M,) axis."""
    k = np.arange(M)
    rev = (M - k) % M
    return rev


def packed_power_mel(frames, fbt, precision="highest"):
    """frames (..., F, N) real, windowed -> (..., F, n_mels)."""
    st1_np, a_np, b_np, wu = _packed_constants()
    dt = frames.dtype
    # pack: v[m] = x[2m] + i x[2m+1]; m = n1 + N1*n2
    x = frames.reshape(frames.shape[:-1] + (M, 2))
    vr = x[..., 0].reshape(x.shape[:-2] + (N2, N1))
    vi = x[..., 1].reshape(x.shape[:-2] + (N2, N1))
    v = jnp.concatenate([vr, vi], axis=-2)  # (..., 2*N2, N1)
    y = jnp.matmul(jnp.asarray(st1_np, dt), v, precision=precision)
    ir, ii = y[..., :N2, :], y[..., N2:, :]
    vz = jnp.einsum("...rn,rnk->...rk", ir, jnp.asarray(a_np, dt),
                    precision=precision) + jnp.einsum(
        "...rn,rnk->...rk", ii, jnp.asarray(b_np, dt), precision=precision)
    vzr, vzi = vz[..., :N1], vz[..., N1:]  # V on (r, k1) plane
    # flatten to natural k order: k = N2*k1 + r  -> transpose (k1, r)
    vfr = jnp.swapaxes(vzr, -1, -2).reshape(vz.shape[:-2] + (M,))
    vfi = jnp.swapaxes(vzi, -1, -2).reshape(vz.shape[:-2] + (M,))
    rev = _packed_bin_maps()
    vrr = vfr[..., rev]
    vri = vfi[..., rev]
    # untangle: X[k] = (V+conj(Vr))/2 - i/2 * Wu * (V - conj(Vr))
    er = 0.5 * (vfr + vrr)
    ei = 0.5 * (vfi - vri)
    orr = 0.5 * (vfr - vrr)
    oi = 0.5 * (vfi + vri)
    wur = jnp.asarray(wu.real, dt)
    wui = jnp.asarray(wu.imag, dt)
    # -i*(orr + i*oi) * (wur + i*wui) = (oi - i*orr)(wur + i*wui)
    xr = er + (oi * wur + orr * wui)
    xi = ei + (oi * wui - orr * wur)
    power = xr * xr + xi * xi  # bins 0..M-1 (bin M=N/2 equals bin 0 pattern?)
    # Nyquist bin N/2: X[M] = er[0] - oi[0]... handle via fb trimmed to M bins
    return jnp.matmul(power, fbt, precision=precision)


def main():
    rng = np.random.default_rng(0)
    f = rng.normal(0, 0.1, (3, 7, N)).astype(np.float64)
    w = f * WIN
    # correctness vs numpy
    ref = np.fft.rfft(w, axis=-1)
    refp = (ref.real**2 + ref.imag**2)[..., :M]  # drop Nyquist for the check
    fbt = jnp.asarray(FB[:, :M].T, jnp.float64)
    got = packed_power_mel(jnp.asarray(w), fbt)
    want = refp @ np.asarray(FB[:, :M].T)
    err = float(np.max(np.abs(got - want) / (np.abs(want) + 1e-30)))
    print(f"packed f64 relerr vs numpy: {err:.2e}", flush=True)
    assert err < 1e-10

    if USE_CPU:
        return

    # timing vs shipped on TPU
    fbp = permute_weights_for_ct(FB, N, (128, 16)).T
    B, count = 32, 431

    def slope(fn, mk, k1=2, k2=8):
        def timed(k):
            xs = mk(k)
            g = jax.jit(lambda xs: lax.scan(
                lambda c, x: (c + fn(x), None), jnp.float32(0), xs)[0])
            float(g(xs))
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                float(g(xs))
                best = min(best, time.perf_counter() - t0)
            return best
        return (timed(k2) - timed(k1)) / (k2 - k1)

    audio_s = B * 10.0
    fbt32 = jnp.asarray(FB[:, :M].T, jnp.float32)
    v = slope(
        lambda fr: packed_power_mel(fr, fbt32).sum(),
        lambda k: jnp.asarray(
            rng.normal(0, 0.1, (k, B, count, N)).astype(np.float32)),
    )
    print(f"packed     {v*1e3:8.3f} ms  {audio_s/v/1e3:8.1f}k audio-s/s", flush=True)
    v = slope(
        lambda fr: ct_power_project(
            fr, N, 128, 16, jnp.asarray(fbp, jnp.float32)).sum(),
        lambda k: jnp.asarray(
            rng.normal(0, 0.1, (k, B, count, 16, 128)).astype(np.float32)),
    )
    print(f"shipped    {v*1e3:8.3f} ms  {audio_s/v/1e3:8.1f}k audio-s/s", flush=True)


if __name__ == "__main__":
    main()
