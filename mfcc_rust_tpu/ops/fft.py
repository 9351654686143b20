"""Cooley–Tukey rFFT as batched MXU GEMMs.

For large transforms (librosa's n_fft=2048) a direct DFT-matmul costs
O(N·K) per frame while XLA's native rfft runs on the VPU and measures ~2x
slower than matmul at speech sizes.  The TPU-native middle ground: factor
N = N1·N2 and evaluate the DFT in two GEMM stages with a twiddle in between
— O(N·(N1+N2)) FLOPs (≈11x fewer than direct at N=2048), every FLOP on the
MXU.

Decimation-in-time with n = n1 + N1·n2:

    inner(n1, r)  = sum_{n2} x[n1 + N1 n2] · W_{N2}^{n2 r}        (GEMM 1)
    z(n1, r)      = inner(n1, r) · W_N^{n1 r}                      (twiddle)
    X[r + N2 k1]  = sum_{n1} z(n1, r) · W_{N1}^{n1 k1}             (GEMM 2)

Real input keeps stage 1 at two real GEMMs; stage 2 is a complex GEMM (four
real GEMMs) over k1 ≤ N1/2 only, and the (k1, r) output plane flattens
directly to the contiguous rFFT bin index k = N2·k1 + r.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def good_factorization(n: int) -> Optional[Tuple[int, int]]:
    """Pick N1·N2 = n for the two GEMM stages.  Stage 2 (the FLOPs-dominant
    complex GEMM) contracts over N1, so N1 = 128 exactly fills the MXU's
    systolic depth; stage 1's contraction is N2 and carries ~10% of the
    FLOPs, so a small N2 is acceptable.  Falls back to near-square factors,
    or None when n has no usable factorization (e.g. primes)."""
    if n % 128 == 0 and n // 128 >= 8:
        return (128, n // 128)
    best = None
    for n2 in range(int(math.isqrt(n)), 1, -1):
        if n % n2 == 0:
            n1 = n // n2
            if n1 / n2 <= 8:  # keep the GEMMs reasonably square
                best = (n1, n2)
            break
    return best


@functools.lru_cache(maxsize=16)
def _ct_constants(n: int, n1: int, n2: int):
    """float64 stage matrices and twiddles, cached per size."""
    r2 = np.arange(n2)
    c2 = np.cos(2 * np.pi * np.outer(r2, r2) / n2)
    s2 = -np.sin(2 * np.pi * np.outer(r2, r2) / n2)
    k1 = np.arange(n1 // 2 + 1)
    a1 = np.arange(n1)
    c1 = np.cos(2 * np.pi * np.outer(a1, k1) / n1)
    s1 = -np.sin(2 * np.pi * np.outer(a1, k1) / n1)
    ang = 2 * np.pi * np.outer(a1, r2) / n  # W_N^{n1 r}
    twr = np.cos(ang)
    twi = -np.sin(ang)
    return c2, s2, c1, s1, twr, twi


def rfft_ct(
    frames: jnp.ndarray,
    n_fft: int,
    factors: Optional[Tuple[int, int]] = None,
    precision: str = "highest",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., L) real frames -> (real, imag) rFFT of size n_fft, each
    (..., n_fft//2 + 1).  Frames shorter than n_fft are zero-padded, longer
    ones truncated (np.fft.rfft(n=) semantics)."""
    if factors is None:
        factors = good_factorization(n_fft)
        if factors is None:
            raise ValueError(f"n_fft={n_fft} has no balanced factorization")
    n1, n2 = factors
    if n1 * n2 != n_fft:
        raise ValueError(f"factors {factors} do not multiply to {n_fft}")
    l = frames.shape[-1]
    if l < n_fft:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, n_fft - l)]
        frames = jnp.pad(frames, pad)
    elif l > n_fft:
        frames = frames[..., :n_fft]
    xr, xi = _ct_stages(
        frames.reshape(frames.shape[:-1] + (n2, n1)), n_fft, n1, n2, precision
    )
    # (..., N2=r, K1=k1) -> (..., K1, N2) flattens to k = N2*k1 + r
    xr = jnp.swapaxes(xr, -1, -2).reshape(frames.shape[:-1] + (-1,))
    xi = jnp.swapaxes(xi, -1, -2).reshape(frames.shape[:-1] + (-1,))
    k = n_fft // 2 + 1
    return xr[..., :k], xi[..., :k]


def _ct_stages(
    x: jnp.ndarray, n_fft: int, n1: int, n2: int, precision: str
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Core CT pipeline on (..., N2, N1)-shaped frames; returns the rFFT in
    the native (..., N2=r, K1=k1) plane (bin k = N2*k1 + r; entries with
    k1 == N1/2 and r > 0 alias bins above N/2 and must be dropped or
    zero-weighted by the consumer).

    Layout note: every tensor keeps N1 (=128 for the preferred
    factorization) as the minor-most axis — stage 1 is a *left* matmul so no
    transposes are needed anywhere in the hot loop."""
    dt = x.dtype
    c2, s2, c1, s1, twr, twi = (
        jnp.asarray(a, dt) for a in _ct_constants(n_fft, n1, n2)
    )
    c2t, s2t = c2.T, s2.T  # (r, n2)
    # stage 1: inner DFT over n2 via left matmul -> (..., N2=r, N1)
    ir = jnp.matmul(c2t, x, precision=precision)
    ii = jnp.matmul(s2t, x, precision=precision)
    # twiddle W_N^{n1 r} on the (r, n1) plane
    twr_t, twi_t = twr.T, twi.T  # (r, n1)
    zr = ir * twr_t - ii * twi_t
    zi = ir * twi_t + ii * twr_t
    # stage 2: outer complex DFT over n1 (contraction = N1, MXU-friendly)
    xr = jnp.matmul(zr, c1, precision=precision) - jnp.matmul(
        zi, s1, precision=precision
    )
    xi = jnp.matmul(zr, s1, precision=precision) + jnp.matmul(
        zi, c1, precision=precision
    )
    return xr, xi  # (..., N2, K1)


@functools.lru_cache(maxsize=16)
def _ct_bin_permutation(n_fft: int, n1: int, n2: int) -> np.ndarray:
    """Map flat (r, k1) plane index r*K1 + k1 -> rFFT bin k (or -1 for the
    alias entries above N/2)."""
    k1max = n1 // 2 + 1
    out = np.full(n2 * k1max, -1, dtype=np.int64)
    for r in range(n2):
        for k1 in range(k1max):
            k = n2 * k1 + r
            if k <= n_fft // 2:
                out[r * k1max + k1] = k
    return out


def permute_weights_for_ct(weights: np.ndarray, n_fft: int,
                           factors: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Reorder a (M, K=n_fft//2+1) per-bin weight matrix (e.g. a mel
    filterbank) onto the CT output's native flat (r, k1) plane, zeroing the
    alias entries — so consumers can project straight from the CT power
    without any transpose/reshape of the spectrum."""
    if factors is None:
        factors = good_factorization(n_fft)
    n1, n2 = factors
    perm = _ct_bin_permutation(n_fft, n1, n2)
    out = np.zeros((weights.shape[0], len(perm)), dtype=weights.dtype)
    valid = perm >= 0
    out[:, valid] = weights[:, perm[valid]]
    return out


def ct_power_project(
    frames_n2n1: jnp.ndarray,
    n_fft: int,
    n1: int,
    n2: int,
    projection_t: jnp.ndarray,
    precision: str = "highest",
    scale: float = 1.0,
) -> jnp.ndarray:
    """(..., N2, N1) windowed frames -> (..., M): CT rFFT, |X|^2 * scale,
    then projection against ``projection_t`` ((N2*(N1/2+1), M), built with
    :func:`permute_weights_for_ct` so alias entries carry zero weight)."""
    xr, xi = _ct_stages(frames_n2n1, n_fft, n1, n2, precision)
    power = (xr * xr + xi * xi) * scale
    flat = power.reshape(power.shape[:-2] + (-1,))
    return jnp.matmul(flat, projection_t, precision=precision)
