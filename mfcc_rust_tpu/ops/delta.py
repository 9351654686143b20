"""Temporal-derivative (delta) features.

Replaces ``derivative_extraction`` / ``extract_derivative_feature``
(speechsauce/src/processing.rs:222-254, feature.rs:253-269).

Two variants:

* :func:`derivative_extraction` — exact speechpy/reference parity, including
  its two quirks: the derivative runs along the *feature* axis (the reference
  edge-pads axis 1 and slices columns), and only the forward term is weighted
  by the window index.
* :func:`delta` — the standard symmetric regression delta along the *time*
  axis, which is what downstream ASR pipelines actually want.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def derivative_extraction(feat: jnp.ndarray, delta_windows: int = 2) -> jnp.ndarray:
    """speechpy/reference-parity deltas along the last (feature) axis
    (processing.rs:222-254): edge-pad, ``sum_r (r * x[+r] - x[-r]) / sum_r
    2 r^2``."""
    cols = feat.shape[-1]
    pad = [(0, 0)] * (feat.ndim - 1) + [(delta_windows, delta_windows)]
    features = jnp.pad(feat, pad, mode="edge")
    dif = jnp.zeros_like(feat)
    scale = 0.0
    offset = delta_windows
    for i in range(delta_windows):
        rng = i + 1
        dif = dif + (
            rng * features[..., offset + rng : offset + rng + cols]
            - features[..., offset - rng : offset - rng + cols]
        )
        scale += 2.0 * rng**2
    return dif / scale


def extract_derivative_feature(feature: jnp.ndarray) -> jnp.ndarray:
    """Static + delta + delta-delta cube (..., T, M) -> (..., T, M, 3)
    (feature.rs:253-269)."""
    d1 = derivative_extraction(feature, 2)
    d2 = derivative_extraction(d1, 2)
    return jnp.stack([feature, d1, d2], axis=-1)


def delta(feat: jnp.ndarray, width: int = 2) -> jnp.ndarray:
    """Standard symmetric delta along the time axis (-2):
    ``sum_r r*(x[t+r]-x[t-r]) / (2*sum_r r^2)`` with edge padding."""
    cols = feat.shape[-2]
    pad = [(0, 0)] * (feat.ndim - 2) + [(width, width), (0, 0)]
    f = jnp.pad(feat, pad, mode="edge")
    num = jnp.zeros_like(feat)
    denom = 0.0
    for r in range(1, width + 1):
        num = num + r * (
            f[..., width + r : width + r + cols, :]
            - f[..., width - r : width - r + cols, :]
        )
        denom += 2.0 * r**2
    return num / denom


def _savgol_operator(width: int, polyorder: int, deriv: int):
    """float64 Savitzky-Golay linear operator rows: D[p] maps a length-width
    window to the deriv-th derivative of its least-squares polynomial fit,
    evaluated at window position p.  Row ``width//2`` is the classic interior
    SG kernel; the first/last half rows are scipy's mode='interp' edge
    handling (librosa.feature.delta semantics)."""
    a = np.vander(np.arange(width, dtype=np.float64), polyorder + 1,
                  increasing=True)  # a[i, j] = i**j
    coef = np.linalg.pinv(a)  # (polyorder+1, width): window -> poly coeffs
    rows = np.zeros((width, polyorder + 1))
    p = np.arange(width, dtype=np.float64)
    for j in range(deriv, polyorder + 1):
        rows[:, j] = (math.factorial(j) / math.factorial(j - deriv)) * p ** (j - deriv)
    return rows @ coef  # (width, width)


def delta_librosa(feat: jnp.ndarray, width: int = 9, order: int = 1,
                  axis: int = -1) -> jnp.ndarray:
    """librosa.feature.delta parity: Savitzky-Golay smoothed derivative
    (scipy savgol_filter, polyorder=order, deriv=order, mode='interp') along
    ``axis`` (librosa layout: frames last).  Requires an odd ``width`` and at
    least ``width`` frames (the 'interp' edge fit needs a full window)."""
    if width < 3 or width % 2 == 0:
        raise ValueError(f"width must be odd and >= 3, got {width}")
    if order <= 0:
        raise ValueError(f"order must be positive, got {order}")
    if order >= width:
        # scipy/librosa: "polyorder must be less than window_length" — an
        # underdetermined fit would silently return a min-norm solution
        raise ValueError(f"order ({order}) must be less than width ({width})")
    t = feat.shape[axis]
    if t < width:
        raise ValueError(f"need at least width={width} frames, got {t}")
    x = jnp.moveaxis(feat, axis, -1)
    d = jnp.asarray(_savgol_operator(width, order, order), x.dtype)
    h = width // 2
    # interior: correlation with the center SG row as width shifted adds
    center = d[h]
    n_int = t - 2 * h
    y_int = None
    for k in range(width):
        part = center[k] * x[..., k : k + n_int]
        y_int = part if y_int is None else y_int + part
    # edges: polynomial fit of the first/last window (mode='interp')
    y_left = jnp.einsum("pw,...w->...p", d[:h], x[..., :width])
    y_right = jnp.einsum("pw,...w->...p", d[h + 1 :], x[..., -width:])
    out = jnp.concatenate([y_left, y_int, y_right], axis=-1)
    return jnp.moveaxis(out, -1, axis)
