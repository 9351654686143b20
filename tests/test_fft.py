"""Cooley-Tukey GEMM rFFT correctness."""

import jax.numpy as jnp
import numpy as np
import pytest

import mfcc_rust_tpu as m
from mfcc_rust_tpu.ops.fft import good_factorization, rfft_ct


@pytest.mark.parametrize("n,l", [(2048, 2048), (2048, 1024), (512, 320),
                                 (1024, 1024), (400, 400)])
def test_rfft_ct_matches_numpy(rng, n, l):
    x = rng.normal(size=(4, l))
    xr, xi = rfft_ct(jnp.asarray(x), n)
    ref = np.fft.rfft(x, n=n, axis=-1)
    np.testing.assert_allclose(np.asarray(xr), ref.real, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(xi), ref.imag, rtol=1e-9, atol=1e-9)


def test_factorization():
    assert good_factorization(2048) == (128, 16)  # N1=128 fills the MXU depth
    assert good_factorization(2) is None or good_factorization(2)[0] * good_factorization(2)[1] == 2
    assert good_factorization(7) is None


def test_ct_impl_in_pipeline(rng):
    """librosa preset with fft_impl=ct equals fft impl exactly in f64."""
    from mfcc_rust_tpu import features as F

    y = rng.normal(0, 0.1, 22050)
    base = m.librosa_config(22050).replace(dtype="float64")
    a = np.asarray(F.mel_spectrogram_librosa(jnp.asarray(y), base.replace(fft_impl="ct")))
    b = np.asarray(F.mel_spectrogram_librosa(jnp.asarray(y), base.replace(fft_impl="fft")))
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10)


def test_auto_selects_ct():
    from mfcc_rust_tpu.ops.spectrum import resolve_fft_impl

    assert resolve_fft_impl(m.librosa_config(22050)) == "ct"
    assert resolve_fft_impl(m.speechpy_config(16000)) == "matmul"


def test_ct_nyquist_trim(rng):
    """Zero Nyquist weight -> the k1 == N1/2 plane is trimmed (exact 128-lane
    stage-2 alignment) and the projection matches the untrimmed plane."""
    from mfcc_rust_tpu.ops.fft import ct_power_project, permute_weights_for_ct

    n, (n1, n2) = 2048, good_factorization(2048)
    w_zero = rng.normal(size=(8, n // 2 + 1))
    w_zero[:, n // 2] = 0.0
    w_full = w_zero.copy()
    w_full[:, n // 2] = 1.0  # nonzero Nyquist: no trim

    p_trim = permute_weights_for_ct(w_zero, n)
    p_full = permute_weights_for_ct(w_full, n)
    assert p_trim.shape[1] == n2 * (n1 // 2)
    assert p_full.shape[1] == n2 * (n1 // 2 + 1)

    x = rng.normal(size=(3, n2, n1))
    a = ct_power_project(jnp.asarray(x), n, n1, n2, jnp.asarray(p_trim.T))
    # reference: numpy rFFT power projected with the untrimmed weights (minus
    # the Nyquist term we zeroed)
    spec = np.fft.rfft(x.reshape(3, -1), axis=-1)
    ref = (np.abs(spec) ** 2) @ w_zero.T
    np.testing.assert_allclose(np.asarray(a), ref, rtol=1e-9, atol=1e-9)

    b = ct_power_project(jnp.asarray(x), n, n1, n2, jnp.asarray(p_full.T))
    ref_full = (np.abs(spec) ** 2) @ w_full.T
    np.testing.assert_allclose(np.asarray(b), ref_full, rtol=1e-9, atol=1e-9)


def test_ct_odd_n1_never_trims(rng):
    """For odd N1 the k1 == n1//2 plane holds valid below-Nyquist bins; a
    zero Nyquist weight must NOT trigger the trim (regression: 24% output
    error when it did)."""
    from mfcc_rust_tpu.ops.fft import (
        ct_power_project, good_factorization, permute_weights_for_ct,
    )

    n = 1323
    n1, n2 = good_factorization(n)
    assert n1 % 2 == 1  # the case under test
    w = rng.normal(size=(8, n // 2 + 1))
    w[:, n // 2] = 0.0  # zero Nyquist weight — trim bait
    p = permute_weights_for_ct(w, n)
    assert p.shape[1] == n2 * (n1 // 2 + 1)  # untrimmed

    x = rng.normal(size=(3, n2, n1))
    a = ct_power_project(jnp.asarray(x), n, n1, n2, jnp.asarray(p.T))
    spec = np.fft.rfft(x.reshape(3, -1), axis=-1)
    ref = (np.abs(spec) ** 2) @ w.T
    np.testing.assert_allclose(np.asarray(a), ref, rtol=1e-9, atol=1e-7)
