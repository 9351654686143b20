"""Spectral subband centroids.

The reference *advertises* SSC (README.md:15) but ships no implementation
(SURVEY §2 C24); this implements the speechpy-family spec: per mel band,
``centroid = sum(freq * power) / sum(power)`` with bin center frequencies
``linspace(1, fs/2, K)``, speechpy framing and filterbanks.  Both matmuls
share the same filterbank constant, so the op is two GEMMs + one divide.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import FeatureConfig
from .mel import filterbank_matrix


def ssc_from_power(power: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """(..., F, K) power spectrum -> (..., F, M) subband centroids in Hz."""
    eps = float(np.finfo(np.float64).eps)
    power = jnp.where(power == 0.0, jnp.asarray(eps, power.dtype), power)
    fb = filterbank_matrix(cfg, power.dtype)
    r = jnp.asarray(
        np.linspace(1.0, cfg.sample_rate / 2.0, cfg.freq_size), dtype=power.dtype
    )
    num = jnp.matmul(power * r, fb.T, precision=cfg.precision)
    den = jnp.matmul(power, fb.T, precision=cfg.precision)
    return num / den
