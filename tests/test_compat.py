"""The speechpy drop-in compat layer."""

import numpy as np
import pytest

from mfcc_rust_tpu.compat import speechpy
from tests.golden import speechpy_ref as sp


@pytest.fixture(scope="module")
def sig(rng):
    return rng.normal(0, 0.1, 16000).astype(np.float32)


def test_feature_module(sig):
    out = speechpy.feature.mfcc(sig, 16000)
    gold = sp.mfcc(sig.astype(np.float64), 16000)
    assert out.shape == gold.shape
    np.testing.assert_allclose(out, gold, rtol=3e-3, atol=3e-3)

    f, e = speechpy.feature.mfe(sig, 16000)
    assert f.shape[1] == 40 and e.shape == (f.shape[0],)
    assert speechpy.feature.lmfe(sig, 16000).shape == f.shape
    assert speechpy.feature.ssc(sig, 16000).shape == f.shape
    cube = speechpy.feature.extract_derivative_feature(out)
    assert cube.shape == out.shape + (3,)


def test_filterbanks_default_low_freq():
    # speechpy's (and the reference's) internal default low_freq=300
    fb = speechpy.feature.filterbanks(40, 257, 16000)
    gold = sp.filterbanks(40, 257, 16000, low_freq=300.0)
    np.testing.assert_allclose(fb, gold, atol=1e-12)


def test_processing_module(sig, rng):
    frames = speechpy.processing.stack_frames(sig, 16000, 0.02, 0.01,
                                              zero_padding=False)
    gold = sp.stack_frames(sig.astype(np.float64), 16000, 0.02, 0.01,
                           zero_padding=False)
    np.testing.assert_allclose(frames, gold, atol=1e-7)

    # windowed framing via the filter callable
    hann = lambda x: 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(x) / x)
    fw = speechpy.processing.stack_frames(sig, 16000, 0.02, 0.01, hann, False)
    np.testing.assert_allclose(fw, gold * hann(320)[None, :], atol=1e-6)

    ps = speechpy.processing.power_spectrum(frames, 512)
    np.testing.assert_allclose(ps, sp.power_spectrum(gold, 512), rtol=1e-3,
                               atol=1e-7)
    fs = speechpy.processing.fft_spectrum(frames, 512)
    np.testing.assert_allclose(fs, sp.fft_spectrum(gold, 512), rtol=1e-3,
                               atol=1e-5)

    feat = rng.normal(2.0, 1.5, (100, 13))
    np.testing.assert_allclose(speechpy.processing.cmvn(feat, True),
                               sp.cmvn(feat, True), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        speechpy.processing.derivative_extraction(feat, 2),
        sp.derivative_extraction(feat, 2), rtol=1e-5, atol=1e-6)
