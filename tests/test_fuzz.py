"""Config-space fuzz: random parameter combinations vs the golden oracle in
float64 — catches parameter-interaction bugs no single-config test would."""

import jax.numpy as jnp
import numpy as np
import pytest

import mfcc_rust_tpu as m
from mfcc_rust_tpu import features as F
from tests.golden import speechpy_ref as sp


def _random_cfgs(rng, n):
    out = []
    for _ in range(n):
        sr = int(rng.choice([8000, 16000, 22050, 44100]))
        fft = int(rng.choice([256, 512, 1024]))
        frame_len = float(rng.choice([0.010, 0.020, 0.025, 0.032]))
        # keep frames shorter than the fft size (speechpy precondition)
        while int(round(sr * frame_len)) > fft:
            frame_len /= 2
        stride = float(rng.choice([0.005, 0.010, 0.0125, 0.020]))
        nf = int(rng.choice([20, 26, 40, 64]))
        ncep = int(rng.choice([12, 13, 20]))
        ncep = min(ncep, nf)
        low = float(rng.choice([0.0, 50.0, 300.0]))
        high = rng.choice([None, 0.45, 0.5])
        high = None if high is None else float(high) * sr
        out.append(
            dict(sr=sr, frame_len=frame_len, stride=stride, nf=nf, ncep=ncep,
                 fft=fft, low=low, high=high)
        )
    return out


@pytest.mark.parametrize("seed", range(4))
def test_mfcc_fuzz(rng, seed):
    prng = np.random.default_rng(1000 + seed)
    sig = rng.normal(0, 0.1, 20000)
    for p in _random_cfgs(prng, 4):
        gold = sp.mfcc(sig, p["sr"], p["frame_len"], p["stride"], p["ncep"],
                       p["nf"], p["fft"], p["low"], p["high"])
        cfg = m.FeatureConfig(
            sample_rate=p["sr"], fft_points=p["fft"], frame_length=p["frame_len"],
            frame_stride=p["stride"], num_cepstral=p["ncep"], num_filters=p["nf"],
            low_frequency=p["low"], high_frequency=p["high"], dtype="float64",
        )
        ours = np.asarray(F.mfcc(jnp.asarray(sig), cfg))
        assert ours.shape == gold.shape, p
        np.testing.assert_allclose(ours, gold, rtol=1e-7, atol=1e-8,
                                   err_msg=str(p))


@pytest.mark.parametrize("seed", range(2))
def test_fast_vs_gather_paths_fuzz(rng, seed):
    """Where both lowerings apply they must agree to float64 exactness."""
    prng = np.random.default_rng(2000 + seed)
    sig = jnp.asarray(rng.normal(0, 0.1, 18000))
    for p in _random_cfgs(prng, 3):
        cfg = m.FeatureConfig(
            sample_rate=p["sr"], fft_points=p["fft"], frame_length=p["frame_len"],
            frame_stride=p["stride"], num_cepstral=p["ncep"], num_filters=p["nf"],
            low_frequency=p["low"], high_frequency=p["high"], dtype="float64",
        )
        fast_f, fast_e = F.mfe(sig, cfg)
        frames = F._speechpy_frames(sig, cfg)
        from mfcc_rust_tpu.ops.mel import apply_filterbank
        from mfcc_rust_tpu.ops.spectrum import power_spectrum, zero_handling

        ps = power_spectrum(frames, cfg)
        slow_e = zero_handling(jnp.sum(ps, axis=-1))
        slow_f = apply_filterbank(ps, cfg, handle_zeros=True)
        np.testing.assert_allclose(np.asarray(fast_f), np.asarray(slow_f),
                                   rtol=1e-9, atol=1e-12, err_msg=str(p))
        np.testing.assert_allclose(np.asarray(fast_e), np.asarray(slow_e),
                                   rtol=1e-9, atol=1e-12, err_msg=str(p))
