"""DCT-II (ortho) as a skinny MXU matmul.

Replaces ``nddct2`` + the reference's (buggy) manual ortho rescale
(feature.rs:120-131): the correct scipy ``dct(type=2, norm='ortho')`` scaling
is baked into a precomputed ``(num_filters, num_cepstral)`` matrix
(:func:`mfcc_rust_tpu.constants.dct_matrix`), so truncation to num_cepstral
happens inside the GEMM for free (SURVEY §4 bug #2 fixed).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import FeatureConfig
from ..constants import constant_bundle


def dct2_ortho(x: jnp.ndarray, cfg: FeatureConfig, truncate: bool = True) -> jnp.ndarray:
    """(..., M) -> (..., num_cepstral) orthonormal DCT-II along the last
    axis."""
    key = "dct" if truncate else "dct_full"
    d = jnp.asarray(constant_bundle(cfg)[key], dtype=x.dtype)
    return jnp.matmul(x, d, precision=cfg.precision)
