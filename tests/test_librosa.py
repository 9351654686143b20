"""Parity of the librosa-preset pipeline against the float64 librosa oracle
(tests/golden/librosa_ref.py) — BASELINE.json config 2."""

import jax.numpy as jnp
import numpy as np
import pytest

import mfcc_rust_tpu as m
from mfcc_rust_tpu import features as F
from tests.golden import librosa_ref as lr

LCFG = m.librosa_config(22050).replace(dtype="float64")


@pytest.fixture(scope="module")
def clip(rng):
    # synthetic "audio": sum of tones + noise, 1 s @ 22.05 kHz
    t = np.arange(22050) / 22050.0
    return (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1320 * t)
        + 0.05 * rng.normal(size=t.shape)
    )


def test_stft_matches(clip):
    gold = lr.stft(clip, 2048, 512)
    ours = np.asarray(
        m.ops.stft_framed(jnp.asarray(clip), LCFG, "librosa", return_power=False)
    ).T
    assert ours.shape == gold.shape
    np.testing.assert_allclose(ours.real, gold.real, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ours.imag, gold.imag, rtol=1e-7, atol=1e-9)


def test_mel_spectrogram(clip):
    gold = lr.melspectrogram(clip, 22050, 2048, 512)
    ours = np.asarray(F.mel_spectrogram_librosa(jnp.asarray(clip), LCFG))
    assert ours.shape == gold.shape == (128, 44)
    np.testing.assert_allclose(ours, gold, rtol=1e-6, atol=1e-10)


def test_log_mel(clip):
    gold = lr.power_to_db(lr.melspectrogram(clip, 22050, 2048, 512))
    ours = np.asarray(F.log_mel_spectrogram(jnp.asarray(clip), LCFG))
    np.testing.assert_allclose(ours, gold, rtol=1e-6, atol=1e-6)


def test_mfcc(clip):
    gold = lr.mfcc(clip, 22050)
    ours = np.asarray(F.mfcc_librosa(jnp.asarray(clip), LCFG))
    assert ours.shape == gold.shape == (20, 44)
    np.testing.assert_allclose(ours, gold, rtol=1e-6, atol=1e-6)


def test_float32_rtol(clip):
    """North-star tolerance check in the production dtype: float32 pipeline
    vs float64 oracle (BASELINE.json: librosa-allclose)."""
    cfg32 = m.librosa_config(22050)
    gold = lr.melspectrogram(clip, 22050, 2048, 512)
    ours = np.asarray(F.mel_spectrogram_librosa(jnp.asarray(clip, jnp.float32), cfg32))
    # float32 accumulation over 2048-point frames: ~1e-4 relative to peak
    np.testing.assert_allclose(ours, gold, rtol=5e-3, atol=1e-4 * gold.max())


def test_uncentered(clip):
    cfg = LCFG.replace(center=False)
    gold = lr.melspectrogram(clip, 22050, 2048, 512, center=False)
    ours = np.asarray(F.mel_spectrogram_librosa(jnp.asarray(clip), cfg))
    np.testing.assert_allclose(ours, gold, rtol=1e-6, atol=1e-10)


def test_win_length_padding(clip):
    cfg = m.librosa_config(22050, win_length=1024).replace(dtype="float64")
    gold = lr.melspectrogram(clip, 22050, 2048, 512, win_length=1024)
    ours = np.asarray(F.mel_spectrogram_librosa(jnp.asarray(clip), cfg))
    np.testing.assert_allclose(ours, gold, rtol=1e-6, atol=1e-10)


def test_win_length_uncentered(clip):
    """win_length < n_fft with center=False: the window must still be
    center-padded to n_fft (librosa semantics)."""
    cfg = m.librosa_config(22050, win_length=1024).replace(dtype="float64",
                                                           center=False)
    gold = lr.melspectrogram(clip, 22050, 2048, 512, win_length=1024,
                             center=False)
    ours = np.asarray(F.mel_spectrogram_librosa(jnp.asarray(clip), cfg))
    np.testing.assert_allclose(ours, gold, rtol=1e-6, atol=1e-10)
