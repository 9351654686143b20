"""Differentiability of the feature pipelines (README claim, VERDICT r1 #6).

Every pipeline in :mod:`mfcc_rust_tpu.features` is pure jnp, so ``jax.grad``
should flow end to end; these tests back the claim with directional
finite-difference checks in float64 (grad . v  ==  (f(x+hv) - f(x-hv)) / 2h).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mfcc_rust_tpu as m
from mfcc_rust_tpu import features as F


def _directional_check(fn, x, rng, n_dirs=3, h=1e-6, rtol=1e-6, atol=1e-9):
    g = jax.grad(fn)(x)
    assert g.shape == x.shape and bool(jnp.all(jnp.isfinite(g)))
    for _ in range(n_dirs):
        v = jnp.asarray(rng.normal(size=x.shape))
        v = v / jnp.linalg.norm(v)
        fd = (fn(x + h * v) - fn(x - h * v)) / (2 * h)
        np.testing.assert_allclose(
            float(jnp.vdot(g, v)), float(fd), rtol=rtol, atol=atol
        )


def test_grad_mfcc_speechpy(rng):
    cfg = m.speechpy_config(16000).replace(dtype="float64")
    x = jnp.asarray(rng.normal(0, 0.1, 4000))

    def loss(sig):
        out = F.mfcc(sig, cfg)
        # weighted sum so the gradient isn't a trivial constant
        w = jnp.cos(jnp.arange(out.size, dtype=out.dtype)).reshape(out.shape)
        return jnp.sum(out * w)

    _directional_check(loss, x, rng)


def test_grad_mfcc_hop_misaligned(rng):
    """Gradient through the zero-padded-wall chunk GEMM (25 ms / 10 ms ->
    400/160, the r3 hop-misaligned fast path)."""
    cfg = m.speechpy_config(16000).replace(dtype="float64",
                                           frame_length=0.025)
    x = jnp.asarray(rng.normal(0, 0.1, 4000))

    def loss(sig):
        out = F.mfcc(sig, cfg)
        w = jnp.cos(jnp.arange(out.size, dtype=out.dtype)).reshape(out.shape)
        return jnp.sum(out * w)

    _directional_check(loss, x, rng)


def test_grad_mel_librosa_hoppad(rng):
    """Gradient through the hop-padded-wall librosa lowering (512/160)."""
    cfg = m.librosa_config(16000, n_fft=512, hop_length=160, n_mels=80
                           ).replace(dtype="float64")
    from mfcc_rust_tpu.features import _librosa_hoppad_ok

    assert _librosa_hoppad_ok(cfg)
    x = jnp.asarray(rng.normal(0, 0.1, 4096))

    def loss(sig):
        out = F.mel_spectrogram_librosa(sig, cfg)
        w = jnp.sin(jnp.arange(out.size, dtype=out.dtype)).reshape(out.shape)
        return jnp.sum(out * w)

    _directional_check(loss, x, rng, rtol=1e-5, atol=1e-8)


def test_grad_mel_spectrogram_librosa(rng):
    cfg = m.librosa_config(22050).replace(dtype="float64")
    x = jnp.asarray(rng.normal(0, 0.1, 8192))

    def loss(sig):
        out = F.mel_spectrogram_librosa(sig, cfg)
        w = jnp.sin(jnp.arange(out.size, dtype=out.dtype)).reshape(out.shape)
        return jnp.sum(out * w)

    _directional_check(loss, x, rng, rtol=1e-5, atol=1e-8)


def test_grad_mfcc_librosa(rng):
    """Through power_to_db's top_db clamp (a max — differentiable a.e.) and
    the DCT head."""
    cfg = m.librosa_config(22050).replace(dtype="float64")
    x = jnp.asarray(rng.normal(0, 0.1, 8192))

    def loss(sig):
        out = F.mfcc_librosa(sig, cfg)
        w = jnp.cos(jnp.arange(out.size, dtype=out.dtype)).reshape(out.shape)
        return jnp.sum(out * w)

    _directional_check(loss, x, rng, rtol=1e-5, atol=1e-8)


def test_grad_mel_spectrogram_vorbis(rng):
    cfg = m.vorbis_config(16000).replace(dtype="float64")
    x = jnp.asarray(rng.normal(0, 0.1, 3200))

    def loss(sig):
        out = F.mel_spectrogram(sig, cfg)
        w = jnp.cos(jnp.arange(out.size, dtype=out.dtype)).reshape(out.shape)
        return jnp.sum(out * w)

    _directional_check(loss, x, rng)


def test_grad_under_jit_matches_eager():
    # own generator: the session rng's stream position depends on test
    # order, and this assertion sits near f64 roundoff — jit legitimately
    # refuses bit-equality with eager (XLA fuses/reorders), so the input
    # must be fixed and the tolerance a few ulp-chains wide (1e-9), not
    # 1e-12 (observed order-dependent flake at that level)
    cfg = m.speechpy_config(16000).replace(dtype="float64")
    x = jnp.asarray(np.random.default_rng(7).normal(0, 0.1, 4000))
    loss = lambda sig: jnp.sum(F.mfcc(sig, cfg) ** 2)
    g_eager = jax.grad(loss)(x)
    g_jit = jax.jit(jax.grad(loss))(x)
    np.testing.assert_allclose(
        np.asarray(g_jit), np.asarray(g_eager), rtol=1e-9, atol=1e-12
    )
