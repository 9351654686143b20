"""Constant-builder correctness: DCT vs scipy, DFT-matmul vs numpy rfft,
filterbank structural properties."""

import numpy as np
import pytest
import scipy.fft

from mfcc_rust_tpu import constants as C


def test_dct_matrix_matches_scipy(rng):
    x = rng.normal(size=(7, 40))
    d = C.dct_matrix(40, 13)
    ours = x @ d
    ref = scipy.fft.dct(x, type=2, axis=-1, norm="ortho")[:, :13]
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_dct_full_roundtrip(rng):
    x = rng.normal(size=(5, 24))
    d = C.dct_matrix(24)
    di = C.idct_matrix(24)
    np.testing.assert_allclose((x @ d) @ di, x, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("n_fft,frame_len", [(512, 320), (512, 512), (2048, 2048), (400, 400)])
def test_rdft_matmul_matches_rfft(rng, n_fft, frame_len):
    frames = rng.normal(size=(11, frame_len))
    c, s = C.rdft_matrices(n_fft, frame_len)
    ref = np.fft.rfft(frames, n=n_fft, axis=-1)
    np.testing.assert_allclose(frames @ c, ref.real, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(frames @ s, ref.imag, rtol=1e-9, atol=1e-9)


def test_rdft_windowed(rng):
    frames = rng.normal(size=(4, 320))
    w = C.hann_window(320)
    c, s = C.rdft_matrices(512, 320, w)
    ref = np.fft.rfft(frames * w, n=512, axis=-1)
    np.testing.assert_allclose(frames @ c, ref.real, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(frames @ s, ref.imag, rtol=1e-9, atol=1e-9)


def test_vorbis_window_matches_reference_formula():
    # config.rs:156-160: w[i] = sin(pi/2 * sin(0.5*pi*(i+0.5)/Nh)^2)
    n = 512
    w = C.vorbis_window(n)
    for i in [0, 1, 17, 255, 256, 400, 511]:
        s = np.sin(0.5 * np.pi * (i + 0.5) / (n // 2))
        assert w[i] == pytest.approx(np.sin(0.5 * np.pi * s * s), abs=1e-15)
    # princen-bradley: w[i]^2 + w[i+N/2]^2 == 1
    np.testing.assert_allclose(w[:256] ** 2 + w[256:] ** 2, 1.0, atol=1e-12)


def test_speechpy_filterbank_structure():
    fb = C.speechpy_filterbanks(40, 257, 16000, 0.0, 8000.0)
    assert fb.shape == (40, 257)
    assert (fb >= 0).all() and (fb <= 1).all()
    # speechpy bin-index quirk: the bank only spans bins up to
    # floor((257+1)*8000/16000) = 129 (feature.rs:69-70)
    assert fb[:, 130:].sum() == 0
    assert fb[:, :130].sum() > 0
    # every filter has support
    assert (fb.sum(axis=1) > 0).all()


def test_speechpy_filterbank_matches_golden():
    from tests.golden.speechpy_ref import filterbanks as gold

    fb = C.speechpy_filterbanks(40, 257, 16000, 0.0, 8000.0)
    np.testing.assert_allclose(fb, gold(40, 257, 16000, 0.0, 8000.0), atol=1e-12)


def test_librosa_filterbank_structure():
    fb = C.librosa_filterbanks(128, 2048, 22050, norm="slaney")
    assert fb.shape == (128, 1025)
    # slaney-normalized filters have area ~ 2/width; peaks < 1 generally,
    # all responses nonnegative and each filter nonempty
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()
    # triangles: each row unimodal (single peak)
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()


def test_mel_scale_roundtrip():
    f = np.linspace(0, 8000, 100)
    for scale in ["speechpy", "htk", "slaney"]:
        np.testing.assert_allclose(
            C.mel_to_hz(C.hz_to_mel(f, scale), scale), f, rtol=1e-10, atol=1e-8
        )


def test_windows_basic():
    assert C.window_array("rect", 320).sum() == 320
    h = C.window_array("hann", 320)
    assert h[0] == 0.0 and h.max() <= 1.0
    # center padding for librosa win_length < n_fft
    hp = C.window_array("hann", 300, 400)
    assert hp.shape == (400,)
    assert hp[:50].sum() == 0 and hp[350:].sum() == 0
