"""speechpy.processing-compatible surface (speechpy processing.py
signatures, including the time-domain ``filter`` callable of
stack_frames)."""

from __future__ import annotations

import numpy as np

from ... import api
from ...ops import framing as _framing


def preemphasis(signal, shift=1, cof=0.98):
    return api.preemphasis(signal, shift, cof)


def stack_frames(sig, sampling_frequency, frame_length=0.020,
                 frame_stride=0.020, filter=lambda x: np.ones((x,)),
                 zero_padding=True):
    """speechpy's framing incl. the per-frame window ``filter`` callable
    (processing.rs:65-129's ``filter: Option<fn(usize)->Array2>``)."""
    frame_len = int(round(sampling_frequency * frame_length))
    window = None
    if filter is not None:
        w = np.asarray(filter(frame_len), dtype=np.float64).reshape(-1)
        if not np.all(w == 1.0):
            window = w
    import jax.numpy as jnp

    frames = _framing.stack_frames(
        jnp.asarray(np.asarray(sig)), sampling_frequency, frame_length,
        frame_stride,
        window=None if window is None else jnp.asarray(window, jnp.float64),
        zero_padding=zero_padding,
    )
    return np.asarray(frames)


def fft_spectrum(frames, fft_points=512):
    from ...config import FeatureConfig
    from ...ops import spectrum as _spectrum

    frames = np.asarray(frames)
    cfg = FeatureConfig(sample_rate=16000, fft_points=int(fft_points),
                        frame_length_samples=int(frames.shape[-1]))
    return np.asarray(_spectrum.fft_spectrum(frames, cfg))


def power_spectrum(frames, fft_points=512):
    from ...config import FeatureConfig
    from ...ops import spectrum as _spectrum

    frames = np.asarray(frames)
    cfg = FeatureConfig(sample_rate=16000, fft_points=int(fft_points),
                        frame_length_samples=int(frames.shape[-1]))
    return np.asarray(_spectrum.power_spectrum(frames, cfg))


def log_power_spectrum(frames, fft_points=512, normalize=True):
    return api.log_power_spectrum(frames, fft_points, normalize)


def derivative_extraction(feat, DeltaWindows):
    return api.derivative_extraction(feat, DeltaWindows)


def cmvn(vec, variance_normalization=False):
    return api.cmvn(vec, variance_normalization)


def cmvnw(vec, win_size=301, variance_normalization=False):
    return api.cmvnw(vec, win_size, variance_normalization)
