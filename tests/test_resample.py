"""Polyphase resampler: golden parity, DSP sanity, batching, errors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfcc_rust_tpu.ops.resample import resample, resample_poly
from tests.golden.resample_ref import resample_poly_ref


@pytest.mark.parametrize(
    "up,down",
    [(2, 1), (1, 2), (3, 2), (2, 3), (160, 147), (147, 160), (441, 160), (80, 441)],
)
def test_matches_oracle_f64(rng, up, down):
    """float64 chunk-GEMM lowering == literal zero-stuff/convolve oracle."""
    x = rng.normal(size=1999)
    ours = np.asarray(resample_poly(jnp.asarray(x), up, down))
    ref = resample_poly_ref(x, up, down)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_common_rate_pairs(rng):
    """48k->44.1k and 44.1k->16k and 8k->16k end-to-end shapes + oracle."""
    x = rng.normal(size=4800)
    for orig, tgt in [(48000, 44100), (44100, 16000), (8000, 16000)]:
        y = np.asarray(resample(jnp.asarray(x), orig, tgt))
        import math

        g = math.gcd(tgt, orig)
        ref = resample_poly_ref(x, tgt // g, orig // g)
        assert y.shape == ref.shape
        np.testing.assert_allclose(y, ref, rtol=1e-9, atol=1e-12)
        assert y.shape[-1] == -(-len(x) * tgt // g // (orig // g))


def test_identity_and_gcd_reduction(rng):
    x = rng.normal(size=500)
    same = resample_poly(jnp.asarray(x), 7, 7)
    np.testing.assert_array_equal(np.asarray(same), x)
    a = np.asarray(resample_poly(jnp.asarray(x), 4, 6))
    b = np.asarray(resample_poly(jnp.asarray(x), 2, 3))
    np.testing.assert_array_equal(a, b)


def test_tone_preserved(rng):
    """A 1 kHz tone resampled 16k -> 48k stays a 1 kHz tone (mid-section,
    away from filter edge transients)."""
    fs, f0 = 16000, 1000.0
    t = np.arange(fs, dtype=np.float64) / fs
    x = np.sin(2 * np.pi * f0 * t)
    y = np.asarray(resample(jnp.asarray(x), fs, 3 * fs))
    t3 = np.arange(len(y), dtype=np.float64) / (3 * fs)
    expect = np.sin(2 * np.pi * f0 * t3)
    mid = slice(2000, len(y) - 2000)
    # Kaiser beta=5 passband ripple is ~1e-3; observed max deviation ~6e-4
    np.testing.assert_allclose(y[mid], expect[mid], atol=2e-3)


def test_batch_and_jit(rng):
    x = rng.normal(size=(3, 4, 1000)).astype(np.float32)
    f = jax.jit(lambda s: resample_poly(s, 3, 2))
    y = np.asarray(f(jnp.asarray(x)))
    assert y.shape == (3, 4, 1500)
    one = np.asarray(resample_poly(jnp.asarray(x[1, 2]), 3, 2))
    np.testing.assert_allclose(y[1, 2], one, rtol=1e-6, atol=1e-7)


def test_float32_accuracy(rng):
    x = rng.normal(size=2000).astype(np.float32)
    ours = np.asarray(resample_poly(jnp.asarray(x), 160, 147))
    ref = resample_poly_ref(x.astype(np.float64), 160, 147)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_errors():
    with pytest.raises(ValueError):
        resample_poly(jnp.zeros(10), 0, 2)
    with pytest.raises(ValueError):
        resample(jnp.zeros(10), 16000, -1)
