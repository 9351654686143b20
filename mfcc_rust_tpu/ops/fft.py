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

Real input keeps stage 1 at one stacked real GEMM ((2·N2, N2), real and
imag on the sublane axis); stage 2's complex DFT is a single merged GEMM
([zr | zi] @ [[c1, s1], [-s1, c1]], contraction 2·N1 = 256 lanes-aligned)
over k1 ≤ N1/2 only — exactly (256, 128) when the consumer's Nyquist weight
is zero — and the (k1, r) output plane flattens directly to the contiguous
rFFT bin index k = N2·k1 + r.
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


@functools.lru_cache(maxsize=16)
def _ct_stage_matrices(n: int, n1: int, n2: int, k1max: int):
    """MXU-aligned merged stage matrices: stage 1 stacks the real/imag inner
    DFTs on the output (sublane) axis — one (2*N2, N2) GEMM instead of two;
    stage 2 merges the four real GEMMs of the complex outer DFT into one
    (2*N1, 2*k1max) GEMM ([zr | zi] @ [[c1, s1], [-s1, c1]]) so the
    contraction is 2*N1 (=256 for the preferred factorization) and the lane
    width 2*k1max — exactly 128/256 when the Nyquist column is trimmed."""
    c2, s2, c1, s1, _, _ = _ct_constants(n, n1, n2)
    stage1 = np.concatenate([c2.T, s2.T], axis=0)  # (2*n2, n2)
    c1t, s1t = c1[:, :k1max], s1[:, :k1max]
    stage2 = np.concatenate(
        [
            np.concatenate([c1t, s1t], axis=1),
            np.concatenate([-s1t, c1t], axis=1),
        ],
        axis=0,
    )  # (2*n1, 2*k1max)
    return stage1, stage2


def _ct_stages(
    x: jnp.ndarray,
    n_fft: int,
    n1: int,
    n2: int,
    precision: str,
    k1max: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Core CT pipeline on (..., N2, N1)-shaped frames; returns the rFFT in
    the native (..., N2=r, K1=k1) plane (bin k = N2*k1 + r; entries with
    k1 == N1/2 and r > 0 alias bins above N/2 and must be dropped or
    zero-weighted by the consumer).  ``k1max`` trims the outer-DFT output to
    the first k1max columns (pass n1//2 to drop the Nyquist plane when its
    weights are zero, aligning the stage-2 GEMM lanes exactly).

    Layout note: every tensor keeps N1 (=128 for the preferred
    factorization) as the minor-most axis — stage 1 is a *left* matmul so no
    transposes are needed anywhere in the hot loop."""
    if k1max is None:
        k1max = n1 // 2 + 1
    dt = x.dtype
    _, _, _, _, twr, twi = _ct_constants(n_fft, n1, n2)
    st1_np, st2_np = _ct_stage_matrices(n_fft, n1, n2, k1max)
    st1 = jnp.asarray(st1_np, dt)
    st2 = jnp.asarray(st2_np, dt)
    # stage 1: inner DFT over n2 via one left matmul -> (..., 2*N2, N1)
    y = jnp.matmul(st1, x, precision=precision)
    ir = y[..., :n2, :]
    ii = y[..., n2:, :]
    # twiddle W_N^{n1 r} on the (r, n1) plane
    twr_t = jnp.asarray(twr.T, dt)  # (r, n1)
    twi_t = jnp.asarray(twi.T, dt)
    zr = ir * twr_t - ii * twi_t
    zi = ir * twi_t + ii * twr_t
    # stage 2: outer complex DFT over n1, one merged GEMM (contraction 2*N1)
    z = jnp.concatenate([zr, zi], axis=-1)  # (..., N2, 2*N1)
    out = jnp.matmul(z, st2, precision=precision)  # (..., N2, 2*k1max)
    return out[..., :k1max], out[..., k1max:]  # (..., N2, K1)


@functools.lru_cache(maxsize=16)
def _ct_foldtw_matrices(n: int, n1: int, n2: int, k1max: int):
    """Twiddle-folded per-r stage-2 matrices (float64, cached).

    Substituting z = inner·W_N^{n1 r} into the outer DFT gives, per r,
    ``[Xr | Xi][r] = ir[r] @ A[r] + ii[r] @ B[r]`` with
    ``A[r] = [P_r | Q_r]``, ``B[r] = [-Q_r | P_r]``,
    ``P_r = diag(twr_r)·c1 - diag(twi_r)·s1``,
    ``Q_r = diag(twi_r)·c1 + diag(twr_r)·s1``  — i.e. the elementwise twiddle
    pass and the [zr|zi] lane concat disappear into two batched (r, N1,
    2·k1max) GEMMs (measured ~11% on the librosa mel path; see
    exp/ct_variants.py)."""
    _, _, c1, s1, twr, twi = _ct_constants(n, n1, n2)
    c1t, s1t = c1[:, :k1max], s1[:, :k1max]
    p = twr.T[:, :, None] * c1t[None] - twi.T[:, :, None] * s1t[None]
    q = twi.T[:, :, None] * c1t[None] + twr.T[:, :, None] * s1t[None]
    a = np.concatenate([p, q], axis=2)  # (N2, N1, 2*k1max)
    b = np.concatenate([-q, p], axis=2)
    return a, b


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
    without any transpose/reshape of the spectrum.

    When the Nyquist bin (k = n_fft//2, the only valid entry in the
    k1 == N1/2 plane) carries zero weight, that whole plane is dropped:
    the output has N2*(N1//2) columns and the CT stage-2 GEMM runs at exact
    128-lane alignment (``_ct_stages(k1max=n1//2)``)."""
    if factors is None:
        factors = good_factorization(n_fft)
    n1, n2 = factors
    k1full = n1 // 2 + 1
    # Trimming is only valid for even N1: there the k1 == N1/2 plane holds
    # just the Nyquist bin (r=0) plus aliases.  For odd N1 that plane holds
    # valid below-Nyquist bins and must be kept.
    trim = n1 % 2 == 0 and not np.any(weights[:, n_fft // 2])
    k1max = n1 // 2 if trim else k1full
    full = _ct_bin_permutation(n_fft, n1, n2).reshape(n2, k1full)
    perm = full[:, :k1max].reshape(-1)
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
    then projection against ``projection_t`` ((N2*k1max, M), built with
    :func:`permute_weights_for_ct` so alias entries carry zero weight;
    k1max — inferred from the projection width — is N1//2 when the Nyquist
    plane was trimmed, N1//2+1 otherwise)."""
    k1max, rem = divmod(projection_t.shape[0], n2)
    allowed = {n1 // 2 + 1} | ({n1 // 2} if n1 % 2 == 0 else set())
    if rem or k1max not in allowed:
        raise ValueError(
            f"projection width {projection_t.shape[0]} does not match the "
            f"(N2={n2}, k1max in {sorted(allowed)}) CT plane"
        )
    dt = frames_n2n1.dtype
    st1_np, _ = _ct_stage_matrices(n_fft, n1, n2, k1max)
    # stage 1: inner DFT over n2, one left matmul -> (..., 2*N2, N1)
    y = jnp.matmul(jnp.asarray(st1_np, dt), frames_n2n1, precision=precision)
    ir, ii = y[..., :n2, :], y[..., n2:, :]
    # stage 2 with the twiddle folded into per-r batched matrices: no
    # elementwise twiddle pass, no [zr|zi] concat (see _ct_foldtw_matrices)
    a_np, b_np = _ct_foldtw_matrices(n_fft, n1, n2, k1max)
    x = jnp.einsum(
        "...rn,rnk->...rk", ir, jnp.asarray(a_np, dt), precision=precision
    ) + jnp.einsum(
        "...rn,rnk->...rk", ii, jnp.asarray(b_np, dt), precision=precision
    )
    xr, xi = x[..., :k1max], x[..., k1max:]
    # slicing at the k1max offset costs a Mosaic relayout, but halves the
    # projection GEMM vs squaring the merged output whole — measured faster
    # at librosa sizes (projection K is already 2048 there)
    power = (xr * xr + xi * xi) * scale
    flat = power.reshape(power.shape[:-2] + (-1,))
    return jnp.matmul(flat, projection_t, precision=precision)
