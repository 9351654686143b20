"""Ergonomic numpy-in/numpy-out API.

Mirrors the reference's Python surface exactly — the keyword-default
signatures of ``py-speechsauce/speechsauce/__init__.py:37-132`` and the
ndim-dispatching ``mel_spectrogram`` of the PyO3 binding
(py-speechsauce/src/lib.rs:179-204) — with the whole FFI layer replaced by
jit dispatch: a hashable :class:`FeatureConfig` is the jit static argument,
so the XLA executable cache plays the role of the reference's
``lru_cache``'d Rust config (its FFT plans and memoized filterbanks are
trace-time constants here).

Ragged lengths are handled by geometric length-bucketing (pad to bucket,
compute, slice to the true frame count) so the jit cache stays small; pass
``bucket=False`` for exact-length compilation.
"""

from __future__ import annotations

import functools
import jax
import numpy as np

from . import features as F
from .config import FeatureConfig, librosa_config
from .ops import framing as _framing
from .ops import normalize as _normalize
from .utils.bucketing import bucket_length


def _speechpy_cfg(
    sampling_frequency,
    frame_length=0.020,
    frame_stride=0.01,
    num_cepstral=13,
    num_filters=40,
    fft_length=512,
    low_frequency=0,
    high_frequency=None,
    dc_elimination=True,
    precision="high",
    dtype="float32",
) -> FeatureConfig:
    return FeatureConfig(
        sample_rate=int(sampling_frequency),
        fft_points=int(fft_length),
        frame_length=float(frame_length),
        frame_stride=float(frame_stride),
        num_cepstral=int(num_cepstral),
        num_filters=int(num_filters),
        low_frequency=float(low_frequency),
        high_frequency=None if high_frequency is None else float(high_frequency),
        dc_elimination=bool(dc_elimination),
        precision=str(precision),
        dtype=str(dtype),
    )


@functools.lru_cache(maxsize=16)
def _jitted(fn_name: str):
    fn = getattr(F, fn_name)
    return jax.jit(fn, static_argnums=1)


def _prep(signal, cfg: FeatureConfig, bucket: bool):
    sig = np.asarray(signal, dtype=cfg.dtype)
    n = sig.shape[-1]
    if bucket:
        b = bucket_length(n)
        if b != n:
            pad = [(0, 0)] * (sig.ndim - 1) + [(0, b - n)]
            sig = np.pad(sig, pad)
    return sig, n


def _frames_nopad(cfg: FeatureConfig, true_len: int) -> int:
    num, _ = _framing.speechpy_frame_counts(
        true_len, cfg.frame_size, cfg.frame_step, zero_padding=False
    )
    return num


# ------------------------------------------------------- speechpy-style API --
def mfcc(signal, sampling_frequency, frame_length=0.020, frame_stride=0.01,
         num_cepstral=13, num_filters=40, fft_length=512, low_frequency=0,
         high_frequency=None, dc_elimination=True, bucket=True,
         precision="high", dtype="float32"):
    """MFCC features, (..., num_frames, num_cepstral) — signature parity with
    py-speechsauce/speechsauce/__init__.py:37-83 (plus keyword-only extras
    ``precision``/``dtype``)."""
    cfg = _speechpy_cfg(sampling_frequency, frame_length, frame_stride,
                        num_cepstral, num_filters, fft_length, low_frequency,
                        high_frequency, dc_elimination, precision, dtype)
    sig, n = _prep(signal, cfg, bucket)
    out = _jitted("mfcc")(sig, cfg)
    return np.asarray(out)[..., : _frames_nopad(cfg, n), :]


def mfe(signal, sampling_frequency, frame_length=0.020, frame_stride=0.01,
        num_filters=40, fft_length=512, low_frequency=0, high_frequency=None,
        bucket=True):
    """Mel filterbank energies: ((..., F, num_filters), (..., F))."""
    cfg = _speechpy_cfg(sampling_frequency, frame_length, frame_stride,
                        13, num_filters, fft_length, low_frequency, high_frequency)
    sig, n = _prep(signal, cfg, bucket)
    feats, energies = _jitted("mfe")(sig, cfg)
    k = _frames_nopad(cfg, n)
    return np.asarray(feats)[..., :k, :], np.asarray(energies)[..., :k]


def lmfe(signal, sampling_frequency, frame_length=0.020, frame_stride=0.01,
         num_filters=40, fft_length=512, low_frequency=0, high_frequency=None,
         bucket=True):
    """Log mel filterbank energies (feature.rs:242-245, exported here unlike
    the reference which keeps it crate-private)."""
    cfg = _speechpy_cfg(sampling_frequency, frame_length, frame_stride,
                        13, num_filters, fft_length, low_frequency, high_frequency)
    sig, n = _prep(signal, cfg, bucket)
    out = _jitted("lmfe")(sig, cfg)
    return np.asarray(out)[..., : _frames_nopad(cfg, n), :]


def ssc(signal, sampling_frequency, frame_length=0.020, frame_stride=0.01,
        num_filters=40, fft_length=512, low_frequency=0, high_frequency=None,
        bucket=True):
    """Spectral subband centroids (README.md:15; absent from the reference's
    code — SURVEY C24)."""
    cfg = _speechpy_cfg(sampling_frequency, frame_length, frame_stride,
                        13, num_filters, fft_length, low_frequency, high_frequency)
    sig, n = _prep(signal, cfg, bucket)
    out = _jitted("ssc")(sig, cfg)
    return np.asarray(out)[..., : _frames_nopad(cfg, n), :]


def extract(signal, sampling_frequency, which=("mfcc",), frame_length=0.020,
            frame_stride=0.01, num_cepstral=13, num_filters=40,
            fft_length=512, low_frequency=0, high_frequency=None,
            dc_elimination=True, bucket=True, precision="high",
            dtype="float32"):
    """Several speechpy-family features from ONE shared frontend pass.

    ``which`` ⊆ {"mfcc", "lmfe", "mfe", "ssc", "energy"}; returns a dict of
    numpy arrays (``"mfe"`` maps to a (features, energies) pair).  The
    chunked DFT GEMM, Parseval energies and log-mel run once and every
    requested feature reads from them — cheaper than calling the individual
    entry points when a production suite wants multiple features (the
    reference has no such combined path; each FFI call recomputes)."""
    cfg = _speechpy_cfg(sampling_frequency, frame_length, frame_stride,
                        num_cepstral, num_filters, fft_length, low_frequency,
                        high_frequency, dc_elimination, precision, dtype)
    sig, n = _prep(signal, cfg, bucket)
    out = _jitted_extract(tuple(which))(sig, cfg)
    k = _frames_nopad(cfg, n)
    trimmed = {}
    for name, val in out.items():
        if name == "mfe":
            trimmed[name] = (np.asarray(val[0])[..., :k, :],
                             np.asarray(val[1])[..., :k])
        elif name == "energy":
            trimmed[name] = np.asarray(val)[..., :k]
        else:
            trimmed[name] = np.asarray(val)[..., :k, :]
    return trimmed


@functools.lru_cache(maxsize=16)
def _jitted_extract(which):
    return jax.jit(functools.partial(F.extract, which=which), static_argnums=1)


def mel_spectrogram(signal, sampling_frequency, frame_length=0.020,
                    frame_stride=0.01, num_cepstral=13, num_filters=40,
                    fft_length=512, low_frequency=0, high_frequency=None,
                    dc_elimination=True, bucket=True):
    """Reference-parity mel spectrogram (vorbis streaming STFT path):
    1-D input -> (num_filters, T'), 2-D (C, T) -> (C, num_filters, T')
    (ndim dispatch of py-speechsauce/src/lib.rs:179-204; >2-D raises like the
    binding panics)."""
    sig_in = np.asarray(signal)
    if sig_in.ndim > 2:
        raise ValueError("mel_spectrogram supports only 1-D or 2-D input")
    cfg = _speechpy_cfg(sampling_frequency, frame_length, frame_stride,
                        num_cepstral, num_filters, fft_length, low_frequency,
                        high_frequency, dc_elimination).replace(window="vorbis")
    sig, n = _prep(sig_in, cfg, bucket)
    out = np.array(_jitted("mel_spectrogram")(sig, cfg))
    hop = cfg.stream_hop
    t_true = -(-n // hop)  # ceil
    out = out[..., :t_true]
    # the reference's trailing n_pad rows are never written (functions.rs:121)
    n_pad = cfg.stream_n_pad
    if n_pad > 0:
        out[..., t_true - n_pad :] = 0.0
    return out


def preemphasis(signal, shift=1, cof=0.98):
    """Pre-emphasis with np.roll wrap semantics (processing.rs:31-53)."""
    signal = np.asarray(signal)
    return np.asarray(_framing.preemphasis(signal, shift, cof))


def derivative_extraction(feat, delta_windows=2):
    """speechpy-parity deltas along the feature axis (processing.rs:222-254)."""
    from .ops import delta as _delta

    return np.asarray(_delta.derivative_extraction(np.asarray(feat), delta_windows))


def extract_derivative_feature(feature):
    """Static+delta+delta-delta cube N x M x 3 (feature.rs:253-269)."""
    from .ops import delta as _delta

    return np.asarray(_delta.extract_derivative_feature(np.asarray(feature)))


def delta(feat, width=2):
    """Standard symmetric time-axis delta (the variant ASR pipelines want)."""
    from .ops import delta as _delta

    return np.asarray(_delta.delta(np.asarray(feat), width))


def delta_librosa(feat, width=9, order=1, axis=-1):
    """librosa.feature.delta parity: Savitzky-Golay smoothed derivative
    (mode='interp' edges) along ``axis`` (librosa layout: frames last)."""
    from .ops import delta as _delta

    return np.asarray(_delta.delta_librosa(np.asarray(feat), width, order, axis))


def log_power_spectrum(frames, fft_length=512, normalize=True):
    """Log power spectrum of pre-framed data (processing.rs:183-214, fixed
    max-normalization)."""
    from .ops import spectrum as _spectrum

    frames = np.asarray(frames)
    cfg = FeatureConfig(
        sample_rate=16000,
        fft_points=int(fft_length),
        frame_length_samples=int(frames.shape[-1]),
    )
    return np.asarray(_spectrum.log_power_spectrum(frames, cfg, normalize))


def stack_frames(signal, sampling_frequency, frame_length=0.020,
                 frame_stride=0.020, zero_padding=True):
    """speechpy-style overlapping framing (processing.rs:65-129, correctly
    implemented)."""
    return np.asarray(
        _framing.stack_frames(
            np.asarray(signal), sampling_frequency, frame_length, frame_stride,
            None, zero_padding,
        )
    )


def cmvn(vec, variance_normalization=False):
    """Global CMVN (processing.rs:265-300)."""
    return np.asarray(_normalize.cmvn(np.asarray(vec), variance_normalization))


def cmvnw(vec, win_size=301, variance_normalization=False):
    """Sliding-window CMVN (processing.rs:315-371)."""
    return np.asarray(
        _normalize.cmvnw(np.asarray(vec), win_size, variance_normalization)
    )


# -------------------------------------------------------- librosa-style API --
def _prep_librosa(y, cfg: FeatureConfig, bucket: bool):
    """Center reflect-padding must see the *true* signal edge, not the bucket
    zeros, so it happens host-side before bucketing; framing then runs
    uncentered on the pre-padded signal.  Returns (sig, cfg', n_frames)."""
    from .ops.stft import librosa_frame_count

    sig = np.asarray(y, dtype=cfg.dtype)
    n = sig.shape[-1]
    count = librosa_frame_count(n, cfg.fft_points, cfg.frame_step, cfg.center)
    if cfg.center:
        pad = [(0, 0)] * (sig.ndim - 1) + [(cfg.fft_points // 2,) * 2]
        sig = np.pad(sig, pad, mode=cfg.pad_mode)
        cfg = cfg.replace(center=False)
    sig, _ = _prep(sig, cfg, bucket)
    return sig, cfg, count


def mel_spectrogram_librosa(y, sr=22050, n_fft=2048, hop_length=512,
                            win_length=None, n_mels=128, fmin=0.0, fmax=None,
                            power=2.0, center=True, bucket=True):
    """librosa-compatible mel spectrogram, (..., n_mels, frames)."""
    cfg = librosa_config(sr, n_fft, hop_length, win_length, n_mels,
                         fmin=fmin, fmax=fmax, power=power).replace(center=center)
    sig, cfg, count = _prep_librosa(y, cfg, bucket)
    out = _jitted("mel_spectrogram_librosa")(sig, cfg)
    return np.asarray(out)[..., :count]


def log_mel_spectrogram(y, sr=22050, n_fft=2048, hop_length=512, n_mels=128,
                        fmin=0.0, fmax=None, center=True, bucket=True):
    """librosa ``power_to_db(melspectrogram)``.  Bucket-padding frames are
    all-zero power, so they can neither raise the top_db reference max nor
    survive the final slice — bucketing is transparent here."""
    cfg = librosa_config(sr, n_fft, hop_length, None, n_mels,
                         fmin=fmin, fmax=fmax).replace(center=center)
    sig, cfg, count = _prep_librosa(y, cfg, bucket)
    out = _jitted("log_mel_spectrogram")(sig, cfg)
    return np.asarray(out)[..., :count]


def mfcc_librosa(y, sr=22050, n_mfcc=20, n_fft=2048, hop_length=512,
                 n_mels=128, fmin=0.0, fmax=None, center=True, bucket=True):
    """librosa-compatible MFCC, (..., n_mfcc, frames)."""
    cfg = librosa_config(sr, n_fft, hop_length, None, n_mels, n_mfcc=n_mfcc,
                         fmin=fmin, fmax=fmax).replace(center=center)
    sig, cfg, count = _prep_librosa(y, cfg, bucket)
    out = _jitted("mfcc_librosa")(sig, cfg)
    return np.asarray(out)[..., :count]
