"""Mel filterbank projection.

Replaces the reference's einsum projections (feature.rs:161,173,229): the
filterbank is a replicated trace-time constant
(:func:`mfcc_rust_tpu.constants.constant_bundle`) and the projection is a
single MXU GEMM.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import FeatureConfig
from ..constants import constant_bundle
from .spectrum import zero_handling


def filterbank_matrix(cfg: FeatureConfig, dtype=None) -> jnp.ndarray:
    """(num_filters, freq_size) mel filterbank for the config (the functional
    analogue of the memoized ``filterbanks`` cache, feature.rs:19-23)."""
    dtype = jnp.dtype(cfg.dtype) if dtype is None else dtype
    return jnp.asarray(constant_bundle(cfg)["fbank"], dtype=dtype)


def apply_filterbank(power: jnp.ndarray, cfg: FeatureConfig,
                     handle_zeros: bool = False) -> jnp.ndarray:
    """(..., F, K) power -> (..., F, M) mel energies (feature.rs:229)."""
    fb = filterbank_matrix(cfg, power.dtype)
    feats = jnp.matmul(power, fb.T, precision=cfg.precision)
    if handle_zeros:
        feats = zero_handling(feats)
    return feats


def mel_project_time_major(power: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """(..., T, K) -> (..., M, T): the reference mel-spectrogram orientation
    (einsum "ft,mf->mt" / "ntf,mf->nmt", feature.rs:161,173)."""
    fb = filterbank_matrix(cfg, power.dtype)
    return jnp.swapaxes(jnp.matmul(power, fb.T, precision=cfg.precision), -1, -2)
