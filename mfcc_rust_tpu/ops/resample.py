"""Polyphase sample-rate conversion as one chunk-GEMM.

The reference has no resampler (its Python users reach for scipy/librosa
before calling mfcc, /root/reference/README.md:3); production corpora mix
sample rates, so the framework provides one on the same MXU algebra as the
framing fast path (features._chunk_gemm):

For a rational ratio up/down (coprime after gcd reduction) and a centered
linear-phase Kaiser-windowed sinc lowpass ``h`` (scipy.signal.resample_poly
``('kaiser', 5.0)`` semantics),

    y[m] = sum_j h[j] * x_up[m*down + half - j],   x_up = zero-stuffed x

only taps with ``(m*down + half - j) % up == 0`` touch real samples.  Group
outputs by phase ``m = q*up + m0``: phase m0's taps are ``h[c + u*up]``
against input indices ``i_top(m0) - u``, and stepping q advances every
phase's window by exactly ``down`` input samples.  Embedding each phase's
reversed taps at its offset inside a common (r*down, up) "wall" makes the
whole resampler

    chunks (..., Q+r-1, down) -> sum_s chunks[s:s+Q] @ wall_rows(s) -> (..., Q, up)

— the identical shifted-chunk GEMM the feature pipelines use, with the
(..., Q, up) output flattening row-major to the output stream.  No gathers,
no zero-stuffed intermediate, every FLOP on the MXU.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def kaiser_lowpass(up: int, down: int, beta: float = 5.0,
                   half_factor: int = 10) -> np.ndarray:
    """The resample_poly prototype filter (float64): Kaiser-windowed sinc,
    cutoff 1/max(up, down) of the upsampled Nyquist, unit DC gain, scaled by
    ``up`` to preserve amplitude through zero-stuffing.  2*half+1 taps with
    half = half_factor * max(up, down)."""
    max_rate = max(up, down)
    half = half_factor * max_rate
    n = np.arange(-half, half + 1, dtype=np.float64)
    h = np.sinc(n / max_rate) / max_rate
    h *= np.kaiser(2 * half + 1, beta)
    h /= h.sum()
    return h * up


@functools.lru_cache(maxsize=32)
def _polyphase_wall(up: int, down: int, beta: float,
                    half_factor: int) -> Tuple[np.ndarray, int, int]:
    """Build the (r*down, up) chunk-GEMM wall.  Returns (wall, imin, r):
    output q*up + m0 = sum_w x[imin + q*down + w] * wall[w, m0] (x indexed
    pre-padding; imin may be negative = left zero-pad)."""
    h = kaiser_lowpass(up, down, beta, half_factor)
    half = (len(h) - 1) // 2
    # phase m0: taps h[c + u*up] hit input i_top - u
    tops, phase_taps = [], []
    for m0 in range(up):
        c = (m0 * down + half) % up
        i_top = (m0 * down + half - c) // up
        taps = h[c::up]
        tops.append(i_top)
        phase_taps.append(taps)
    imin = min(t - (len(p) - 1) for t, p in zip(tops, phase_taps))
    imax = max(tops)
    width = imax - imin + 1
    r = math.ceil(width / down)
    wall = np.zeros((r * down, up))
    for m0, (i_top, taps) in enumerate(zip(tops, phase_taps)):
        for u, tap in enumerate(taps):
            wall[i_top - u - imin, m0] = tap
    return wall, imin, r


def resample_poly(signal: jnp.ndarray, up: int, down: int,
                  precision: str = "highest", beta: float = 5.0,
                  half_factor: int = 10) -> jnp.ndarray:
    """Resample (..., T) along the last axis by the rational factor up/down
    (scipy.signal.resample_poly semantics: centered Kaiser-5.0 lowpass,
    output length ceil(T*up/down)).  Jittable; arbitrary leading batch
    dims."""
    if up <= 0 or down <= 0:
        raise ValueError(f"up/down must be positive, got {up}/{down}")
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == down:
        return signal
    t = signal.shape[-1]
    n_out = -(-t * up // down)
    q = -(-n_out // up)  # output rows of `up` samples
    wall, imin, r = _polyphase_wall(up, down, beta, half_factor)

    # x'[k] = x[k + imin], zero outside; need (q + r - 1) * down samples
    need = (q + r - 1) * down
    left = max(0, -imin)
    right = max(0, need - (t + left - max(0, imin)))
    pad = [(0, 0)] * (signal.ndim - 1) + [(left, right)]
    x = jnp.pad(signal, pad)
    if imin > 0:
        x = x[..., imin:]
    x = x[..., :need]
    ch = x.reshape(x.shape[:-1] + (q + r - 1, down))
    wj = jnp.asarray(wall, signal.dtype)
    y = None
    for s in range(r):
        part = jnp.matmul(
            ch[..., s : s + q, :], wj[s * down : (s + 1) * down],
            precision=precision,
        )
        y = part if y is None else y + part
    out = y.reshape(y.shape[:-2] + (q * up,))
    return out[..., :n_out]


def resample(signal: jnp.ndarray, orig_sr: int, target_sr: int,
             precision: str = "highest") -> jnp.ndarray:
    """Resample (..., T) audio from orig_sr to target_sr (both in Hz)."""
    if orig_sr <= 0 or target_sr <= 0:
        raise ValueError(f"sample rates must be positive, got {orig_sr} -> {target_sr}")
    return resample_poly(signal, target_sr, orig_sr, precision=precision)
