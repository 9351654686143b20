"""The ergonomic numpy facade: signature parity with
py-speechsauce/speechsauce/__init__.py, bucketing transparency, ndim
dispatch."""

import numpy as np
import pytest

import mfcc_rust_tpu as m
from tests.golden import dfn_ref
from tests.golden import speechpy_ref as sp


@pytest.fixture(scope="module")
def sig(rng):
    return rng.normal(0, 0.1, 15357).astype(np.float32)  # deliberately off-bucket


def test_mfcc_defaults(sig):
    out = m.mfcc(sig, 16000)
    gold = sp.mfcc(sig.astype(np.float64), 16000)
    assert out.shape == gold.shape
    np.testing.assert_allclose(out, gold, rtol=2e-3, atol=2e-3)


def test_bucketing_transparent(sig):
    a = m.mfcc(sig, 16000, bucket=True)
    b = m.mfcc(sig, 16000, bucket=False)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_mfe_lmfe_ssc(sig):
    feats, energies = m.mfe(sig, 16000)
    gf, ge = sp.mfe(sig.astype(np.float64), 16000)
    assert feats.shape == gf.shape and energies.shape == ge.shape
    np.testing.assert_allclose(feats, gf, rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(energies, ge, rtol=5e-3, atol=1e-5)
    assert m.lmfe(sig, 16000).shape == gf.shape
    assert m.ssc(sig, 16000).shape == gf.shape


def test_mel_spectrogram_ndim_dispatch(rng):
    s1 = rng.normal(0, 0.1, 12000).astype(np.float32)
    out1 = m.mel_spectrogram(s1, 16000)
    gold1 = dfn_ref.mel_spectrogram1(s1.astype(np.float64), 16000)
    assert out1.shape == gold1.shape
    np.testing.assert_allclose(out1, gold1, rtol=5e-3, atol=1e-6)

    s2 = rng.normal(0, 0.1, (2, 12000)).astype(np.float32)
    out2 = m.mel_spectrogram(s2, 16000)
    gold2 = dfn_ref.mel_spectrogram2(s2.astype(np.float64), 16000)
    assert out2.shape == gold2.shape
    np.testing.assert_allclose(out2, gold2, rtol=5e-3, atol=1e-6)

    with pytest.raises(ValueError):
        m.mel_spectrogram(np.zeros((2, 2, 100), np.float32), 16000)


def test_mel_spectrogram_bucket_zero_tail(rng):
    """Bucket padding must not contaminate the trailing n_pad frames that the
    reference leaves unwritten."""
    s = rng.normal(0, 0.1, 9999).astype(np.float32)
    a = m.mel_spectrogram(s, 16000, frame_length=0.01, bucket=True)
    b = m.mel_spectrogram(s, 16000, frame_length=0.01, bucket=False)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
    gold = dfn_ref.mel_spectrogram1(s.astype(np.float64), 16000, frame_length=0.01)
    np.testing.assert_allclose(a, gold, rtol=5e-3, atol=1e-6)


def test_preemphasis_cmvn(sig, rng):
    np.testing.assert_allclose(
        m.preemphasis(sig), sp.preemphasis(sig.astype(np.float64)),
        rtol=1e-5, atol=1e-6,
    )
    feat = rng.normal(1.0, 2.0, (200, 13)).astype(np.float32)
    np.testing.assert_allclose(
        m.cmvn(feat, True), sp.cmvn(feat.astype(np.float64), True),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        m.cmvnw(feat, 31, True), sp.cmvnw(feat.astype(np.float64), 31, True),
        rtol=1e-3, atol=1e-3,
    )


def test_librosa_facade(rng):
    from tests.golden import librosa_ref as lr

    y = rng.normal(0, 0.1, 22050).astype(np.float32)
    out = m.mel_spectrogram_librosa(y, 22050)
    gold = lr.melspectrogram(y.astype(np.float64), 22050, 2048, 512)
    assert out.shape == gold.shape
    np.testing.assert_allclose(out, gold, rtol=5e-3, atol=1e-4 * gold.max())

    lm = m.log_mel_spectrogram(y, 22050)
    goldlm = lr.power_to_db(gold)
    np.testing.assert_allclose(lm, goldlm, rtol=1e-3, atol=5e-2)

    mf = m.mfcc_librosa(y, 22050)
    goldmf = lr.mfcc(y.astype(np.float64), 22050)
    assert mf.shape == goldmf.shape
    np.testing.assert_allclose(mf, goldmf, rtol=1e-3, atol=5e-2)


def test_builder_api():
    cfg = m.SpeechConfigBuilder(16000).fft_points(1024).num_cepstral(20).build()
    assert cfg.fft_points == 1024 and cfg.num_cepstral == 20
    assert cfg.freq_size == 513


def test_processing_facade(rng):
    feat = rng.normal(size=(40, 13))
    np.testing.assert_allclose(
        m.derivative_extraction(feat), sp.derivative_extraction(feat),
        rtol=1e-5, atol=1e-6,
    )
    cube = m.extract_derivative_feature(feat)
    assert cube.shape == (40, 13, 3)
    assert m.delta(feat).shape == feat.shape

    sig = rng.normal(0, 0.1, 8000)
    frames = m.stack_frames(sig, 16000, zero_padding=False)
    gold = sp.stack_frames(sig, 16000, zero_padding=False)
    np.testing.assert_allclose(frames, gold, atol=1e-7)
    lps = m.log_power_spectrum(frames, 512)
    gold_lps = sp.log_power_spectrum(gold, 512)
    np.testing.assert_allclose(lps, gold_lps, rtol=1e-3, atol=1e-3)


def test_bucketing_bounds_jit_cache(rng):
    """Many distinct input lengths must reuse a small set of compiled shapes
    (the lru_cache(32)-config analogue for ragged lengths)."""
    from mfcc_rust_tpu.api import _jitted
    from mfcc_rust_tpu.utils.bucketing import bucket_length

    fn = _jitted("mfcc")
    before = fn._cache_size()
    lengths = [15000 + 37 * i for i in range(25)]
    for n in lengths:
        m.mfcc(rng.normal(0, 0.1, n).astype(np.float32), 16000)
    added = fn._cache_size() - before
    distinct_buckets = len({bucket_length(n) for n in lengths})
    assert added <= distinct_buckets + 1
    assert added < len(lengths) / 2


def test_extract_facade(sig):
    out = m.extract(sig, 16000, which=("mfcc", "lmfe", "mfe", "ssc", "energy"))
    np.testing.assert_allclose(out["mfcc"], m.mfcc(sig, 16000), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(out["lmfe"], m.lmfe(sig, 16000), rtol=1e-6,
                               atol=1e-6)
    feats, energies = m.mfe(sig, 16000)
    np.testing.assert_allclose(out["mfe"][0], feats, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out["mfe"][1], energies, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out["energy"], energies, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out["ssc"], m.ssc(sig, 16000), rtol=1e-5,
                               atol=1e-5)
    # bucketing transparency: every output trimmed to the true frame count
    nb = m.extract(sig, 16000, which=("mfcc",), bucket=False)
    np.testing.assert_allclose(out["mfcc"], nb["mfcc"], rtol=1e-6, atol=1e-6)
