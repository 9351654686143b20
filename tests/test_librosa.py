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


def test_hoppad_frame_gemm_production_config(clip, rng):
    """512/160 @16 kHz (hop does not divide n_fft): the hop-padded-wall
    fused chunk-GEMM lowering must match the float64 oracle and the
    gather-framing fallback it replaces."""
    from mfcc_rust_tpu.features import _librosa_hoppad_ok

    cfg = m.librosa_config(16000, n_fft=512, hop_length=160, n_mels=80)
    assert _librosa_hoppad_ok(cfg)
    assert _librosa_hoppad_ok(  # any hop with ceil(n/hop) <= 8 qualifies
        m.librosa_config(16000, n_fft=512, hop_length=130)
    )
    # tiny hop -> bounded shifted-slice count keeps the gather fallback
    assert not _librosa_hoppad_ok(
        m.librosa_config(16000, n_fft=512, hop_length=40)
    )
    sig = clip[:16000]
    gold = lr.melspectrogram(sig, 16000, 512, 160, n_mels=80)
    ours = np.asarray(F.mel_spectrogram_librosa(
        jnp.asarray(sig), cfg.replace(dtype="float64")))
    assert ours.shape == gold.shape
    np.testing.assert_allclose(ours, gold, rtol=1e-6, atol=1e-10)
    # f32: strided lowering vs the gather lowering (force fft impl so the
    # fast tail is skipped) on a batch
    sigs = rng.normal(0, 0.1, (3, 24000)).astype(np.float32)
    a = np.asarray(F.mel_spectrogram_librosa(jnp.asarray(sigs), cfg))
    b = np.asarray(F.mel_spectrogram_librosa(
        jnp.asarray(sigs), cfg.replace(fft_impl="fft")))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


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


class TestDeltaLibrosa:
    """librosa.feature.delta parity: Savitzky-Golay mode='interp' vs a
    literal per-window numpy polyfit oracle."""

    @staticmethod
    def _oracle(x, width, order):
        """Derivative of the LSQ polynomial fit: interior windows centered at
        each frame; edge frames reuse the first/last full window (scipy
        savgol mode='interp')."""
        h = width // 2
        t = x.shape[-1]
        out = np.zeros_like(x, dtype=np.float64)
        pos = np.arange(width, dtype=np.float64)
        import math as _m

        def fit_deriv(win, p):
            c = np.polynomial.polynomial.polyfit(pos, win, order)
            return sum(
                c[j] * (_m.factorial(j) / _m.factorial(j - order)) * p ** (j - order)
                for j in range(order, order + 1)
            )

        for m in range(t):
            if m < h:
                win, p = x[..., :width], float(m)
            elif m >= t - h:
                win, p = x[..., -width:], float(m - (t - width))
            else:
                win, p = x[..., m - h : m + h + 1], float(h)
            out[..., m] = fit_deriv(win.astype(np.float64), p)
        return out

    @pytest.mark.parametrize("width,order", [(9, 1), (9, 2), (5, 1), (3, 1)])
    def test_matches_polyfit_oracle(self, rng, width, order):
        from mfcc_rust_tpu.ops.delta import delta_librosa

        x = rng.normal(size=(4, 30))
        ours = np.asarray(delta_librosa(jnp.asarray(x), width, order))
        ref = np.stack([self._oracle(row, width, order) for row in x])
        np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-9)

    def test_linear_ramp_has_constant_slope(self):
        from mfcc_rust_tpu.ops.delta import delta_librosa

        x = jnp.asarray(3.0 * np.arange(40.0) + 7.0)
        d = np.asarray(delta_librosa(x, 9, 1))
        np.testing.assert_allclose(d, 3.0, rtol=1e-9)
        d2 = np.asarray(delta_librosa(x, 9, 2))
        np.testing.assert_allclose(d2, 0.0, atol=1e-8)

    def test_axis_and_pipeline(self, rng):
        from mfcc_rust_tpu import features, librosa_config
        from mfcc_rust_tpu.ops.delta import delta_librosa

        y = rng.normal(0, 0.1, 22050).astype(np.float32)
        cfg = librosa_config(22050)
        mf = features.mfcc_librosa(jnp.asarray(y), cfg)  # (n_mfcc, T)
        d = delta_librosa(mf, 9, 1)
        assert d.shape == mf.shape
        # same result via the time-major layout
        dt = delta_librosa(mf.T, 9, 1, axis=-2)
        np.testing.assert_allclose(np.asarray(d), np.asarray(dt).T, rtol=1e-5, atol=1e-5)

    def test_validation(self):
        from mfcc_rust_tpu.ops.delta import delta_librosa

        with pytest.raises(ValueError):
            delta_librosa(jnp.zeros((4, 30)), width=8)
        with pytest.raises(ValueError):
            delta_librosa(jnp.zeros((4, 30)), order=0)
        with pytest.raises(ValueError):
            delta_librosa(jnp.zeros((4, 5)), width=9)
        with pytest.raises(ValueError, match="less than width"):
            # scipy/librosa reject polyorder >= window_length; an
            # underdetermined pinv fit would silently return garbage
            delta_librosa(jnp.zeros((4, 30)), width=3, order=3)
