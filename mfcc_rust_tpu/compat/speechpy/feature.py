"""speechpy.feature-compatible surface (speechpy feature.py signatures)."""

from __future__ import annotations

import numpy as np

from ... import api
from ...config import FeatureConfig
from ...constants import speechpy_filterbanks


def filterbanks(num_filter, coefficients, sampling_freq, low_freq=None,
                high_freq=None):
    """Mel filterbank matrix (num_filter x coefficients) — speechpy's
    ``filterbanks`` incl. its default low_freq=300 (the reference carries the
    same dead default, feature.rs:46)."""
    low = 300.0 if low_freq is None else float(low_freq)
    return speechpy_filterbanks(
        int(num_filter), int(coefficients), int(sampling_freq), low, high_freq
    )


def mfcc(signal, sampling_frequency, frame_length=0.020, frame_stride=0.01,
         num_cepstral=13, num_filters=40, fft_length=512, low_frequency=0,
         high_frequency=None, dc_elimination=True):
    return api.mfcc(signal, sampling_frequency, frame_length, frame_stride,
                    num_cepstral, num_filters, fft_length, low_frequency,
                    high_frequency, dc_elimination)


def mfe(signal, sampling_frequency, frame_length=0.020, frame_stride=0.01,
        num_filters=40, fft_length=512, low_frequency=0, high_frequency=None):
    return api.mfe(signal, sampling_frequency, frame_length, frame_stride,
                   num_filters, fft_length, low_frequency, high_frequency)


def lmfe(signal, sampling_frequency, frame_length=0.020, frame_stride=0.01,
         num_filters=40, fft_length=512, low_frequency=0, high_frequency=None):
    return api.lmfe(signal, sampling_frequency, frame_length, frame_stride,
                    num_filters, fft_length, low_frequency, high_frequency)


def ssc(signal, sampling_frequency, frame_length=0.020, frame_stride=0.01,
        num_filters=40, fft_length=512, low_frequency=0, high_frequency=None):
    return api.ssc(signal, sampling_frequency, frame_length, frame_stride,
                   num_filters, fft_length, low_frequency, high_frequency)


def extract_derivative_feature(feature):
    return api.extract_derivative_feature(feature)
