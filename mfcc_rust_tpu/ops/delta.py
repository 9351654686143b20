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

import jax.numpy as jnp


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
