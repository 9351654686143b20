"""Fused Pallas frontend kernel vs the XLA pipeline (interpret mode on the
CPU test mesh; the TPU Mosaic path is A/B-checked in the bench harness)."""

import jax.numpy as jnp
import numpy as np
import pytest

import mfcc_rust_tpu as m
from mfcc_rust_tpu import features as F
from mfcc_rust_tpu.ops.pallas import fused_log_mel, fused_mfcc, fused_supported

CFG = m.speechpy_config(16000)


def test_supported_matrix():
    assert fused_supported(CFG)  # 320 = 2 * 160
    assert not fused_supported(m.vorbis_config(16000))
    assert not fused_supported(CFG.replace(frame_stride=0.012))  # 320 % 192 != 0
    assert fused_supported(m.librosa_config(22050))  # 2048 = 4 * 512


def test_fused_mfcc_matches_xla(rng):
    sig = rng.normal(0, 0.1, (3, 16000)).astype(np.float32)
    a = np.asarray(fused_mfcc(sig, CFG))
    b = np.asarray(F.mfcc(jnp.asarray(sig), CFG))
    assert a.shape == b.shape == (3, 98, 13)
    np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)


def test_fused_mfcc_1d(rng):
    sig = rng.normal(0, 0.1, 16000).astype(np.float32)
    a = np.asarray(fused_mfcc(sig, CFG))
    b = np.asarray(F.mfcc(jnp.asarray(sig), CFG))
    np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)


def test_fused_log_mel_matches_lmfe(rng):
    sig = rng.normal(0, 0.1, (2, 12345)).astype(np.float32)
    a = np.asarray(fused_log_mel(sig, CFG))
    b = np.asarray(F.lmfe(jnp.asarray(sig), CFG))
    np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)


def test_fused_no_dc_elimination(rng):
    cfg = CFG.replace(dc_elimination=False)
    sig = rng.normal(0, 0.1, (2, 8000)).astype(np.float32)
    a = np.asarray(fused_mfcc(sig, cfg))
    b = np.asarray(F.mfcc(jnp.asarray(sig), cfg))
    np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)


def test_fused_tile_sizes(rng):
    sig = rng.normal(0, 0.1, (2, 40000)).astype(np.float32)
    a = np.asarray(fused_mfcc(sig, CFG, tile_f=128))
    b = np.asarray(fused_mfcc(sig, CFG, tile_f=512))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_fused_rejects_unsupported():
    with pytest.raises(ValueError):
        fused_mfcc(jnp.zeros(8000), m.vorbis_config(16000))
