"""Cepstral mean/variance normalization — global, sliding-window, and
distributed.

Replaces ``cmvn``/``cmvnw`` (speechsauce/src/processing.rs:265-300, 315-371).
The reference's per-row Python-style loop becomes a cumulative-sum
moving-average (O(T) instead of O(T*win)); the distributed corpus variant
(the reference has none — SURVEY §2 ledger) reduces masked moments with
``psum`` in :mod:`mfcc_rust_tpu.parallel.stats`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

EPS = 2.0 ** -30  # the reference's eps (processing.rs:275)


def cmvn(vec: jnp.ndarray, variance_normalization: bool = False) -> jnp.ndarray:
    """Global per-feature mean (and optional variance) normalization over the
    observation axis (-2), one observation per row (processing.rs:265-300).

    The mean is computed in two passes (mean of residuals re-added) so f32
    large-mean features don't inherit the ~ulp(T * mean) summation error of
    a single pass; the std then runs on the well-centered residuals."""
    m1 = jnp.mean(vec, axis=-2, keepdims=True)
    mean = m1 + jnp.mean(vec - m1, axis=-2, keepdims=True)
    centered = vec - mean
    if variance_normalization:
        stdev = jnp.sqrt(jnp.mean(centered * centered, axis=-2, keepdims=True))
        return centered / (stdev + EPS)
    return centered


def _windowed_moments(
    x: jnp.ndarray, win_size: int, want_sq: bool = True
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Per-row sliding (mean, E[x^2]) over symmetric-padded rows via cumsum.
    x: (..., T, D) -> two (..., T, D)."""
    pad_size = (win_size - 1) // 2
    pad = [(0, 0)] * (x.ndim - 2) + [(pad_size, pad_size), (0, 0)]
    xp = jnp.pad(x, pad, mode="symmetric")
    zero = jnp.zeros(x.shape[:-2] + (1, x.shape[-1]), dtype=x.dtype)
    cs = jnp.concatenate([zero, jnp.cumsum(xp, axis=-2)], axis=-2)
    t = x.shape[-2]
    mean = (cs[..., win_size : win_size + t, :] - cs[..., :t, :]) / win_size
    if not want_sq:
        return mean, None
    cs2 = jnp.concatenate([zero, jnp.cumsum(xp * xp, axis=-2)], axis=-2)
    mean2 = (cs2[..., win_size : win_size + t, :] - cs2[..., :t, :]) / win_size
    return mean, mean2


def cmvnw(
    vec: jnp.ndarray, win_size: int = 301, variance_normalization: bool = False
) -> jnp.ndarray:
    """Sliding-window CMVN (processing.rs:315-371 semantics).  The reference
    loops over rows taking a fresh window mean/std per row; here both passes
    are cumsum moving-averages.  Window std is the population std of the
    window (ddof=0), matching ``std_axis(Axis(0), 0.)``.

    f32 robustness: the cumsums are taken over globally pre-shifted data —
    a cumsum of raw large-mean features (e.g. +1e4 offsets) grows to ~1e7+
    where f32 rounding wrecks the window means; shifting by the global
    per-feature mean keeps every running sum at data scale.  The shift
    cancels identically in the output (window_mean(x) = shift +
    window_mean(x - shift)); the variance pass runs on the centered values
    where means are already ~0."""
    if win_size % 2 != 1:
        raise ValueError("Windows size must be odd!")
    shift = jnp.mean(vec, axis=-2, keepdims=True)
    v0 = vec - shift
    mean0, _ = _windowed_moments(v0, win_size, want_sq=False)
    centered = v0 - mean0
    if not variance_normalization:
        return centered
    cmean, cmean2 = _windowed_moments(centered, win_size)
    var = jnp.maximum(cmean2 - cmean * cmean, 0.0)
    return centered / (jnp.sqrt(var) + EPS)


def masked_moments(
    feats: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(sum, sum_sq, count) over all leading/time axes of (..., T, D) feats,
    honoring a (..., T) validity mask — the local half of distributed corpus
    CMVN.  Returns (D,), (D,), scalar."""
    if mask is None:
        red = tuple(range(feats.ndim - 1))
        s = jnp.sum(feats, axis=red)
        ss = jnp.sum(feats * feats, axis=red)
        n = jnp.asarray(
            jnp.prod(jnp.asarray(feats.shape[:-1])), dtype=feats.dtype
        )
        return s, ss, n
    m = mask[..., None].astype(feats.dtype)
    red = tuple(range(feats.ndim - 1))
    s = jnp.sum(feats * m, axis=red)
    ss = jnp.sum(feats * feats * m, axis=red)
    n = jnp.sum(m)
    return s, ss, n


def apply_corpus_cmvn(
    feats: jnp.ndarray,
    moments,
    variance_normalization: bool = True,
) -> jnp.ndarray:
    """Normalize features with corpus moments — either a Welford
    :class:`mfcc_rust_tpu.parallel.stats.CorpusMoments` (preferred: its
    variance is cancellation-free in f32) or a raw (sum, sum_sq, count)
    triple from :func:`masked_moments`."""
    if hasattr(moments, "m2"):
        mean = moments.mean
        centered = feats - mean
        if not variance_normalization:
            return centered
        return centered / (moments.std + EPS)
    s, ss, n = moments
    mean = s / n
    centered = feats - mean
    if not variance_normalization:
        return centered
    var = jnp.maximum(ss / n - mean * mean, 0.0)
    return centered / (jnp.sqrt(var) + EPS)
