"""Feature pipelines — the jittable, shape-polymorphic core API.

TPU-native re-design of the reference feature layer
(speechsauce/src/feature.rs): every pipeline is a pure function of
``(signal, FeatureConfig)`` where the config is a hashable static argument;
under ``jax.jit`` the whole pipeline compiles to a handful of fused MXU GEMMs
(framing gather -> windowed real-DFT matmul -> power -> mel matmul -> log ->
DCT matmul).  All functions accept arbitrary leading batch dimensions — the
batched variants the reference hand-writes (``stft2``/``mel_spectrogram2``,
feature.rs:163-174) fall out of broadcasting for free.

Reference bug fixes carried (SURVEY §4): squared power spectrum (#1), correct
per-row ortho DCT (#2), true overlapping framing (#3), stateless batch STFT
(#5).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .config import FeatureConfig, librosa_config
from .ops import framing as _framing
from .ops import stft as _stft
from .ops.dct import dct2_ortho
from .ops.mel import apply_filterbank, mel_project_time_major
from .ops.spectrum import power_spectrum, power_to_db, zero_handling
from .ops.ssc import ssc_from_power


def _speechpy_frames(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """speechpy mfe framing: rectangular window, zero_padding=False
    (feature.rs:203-210)."""
    if cfg.preemphasis_cof:
        signal = _framing.preemphasis(signal, 1, cfg.preemphasis_cof)
    return _framing.stack_frames_samples(
        signal, cfg.frame_size, cfg.frame_step, window=None, zero_padding=False
    )


def mfe(signal: jnp.ndarray, cfg: FeatureConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mel filterbank energies + frame energies (feature.rs:200-233).

    (..., T) -> ((..., F, num_filters), (..., F))."""
    frames = _speechpy_frames(signal, cfg)
    ps = power_spectrum(frames, cfg, windowed=cfg.window != "rect")
    energies = zero_handling(jnp.sum(ps, axis=-1))
    feats = apply_filterbank(ps, cfg, handle_zeros=True)
    return feats, energies


def lmfe(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Log mel filterbank energies (feature.rs:242-245)."""
    feats, _ = mfe(signal, cfg)
    return jnp.log(feats)


def mfcc(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """MFCC (feature.rs:94-148 with correct DCT-ortho scaling):
    (..., T) -> (..., F, num_cepstral)."""
    feats, energy = mfe(signal, cfg)
    feats = jnp.log(feats)
    out = dct2_ortho(feats, cfg)
    if cfg.dc_elimination:
        out = out.at[..., 0].set(jnp.log(energy))
    return out


def ssc(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Spectral subband centroids (README.md:15 promise; SURVEY C24):
    (..., T) -> (..., F, num_filters), centroids in Hz."""
    frames = _speechpy_frames(signal, cfg)
    ps = power_spectrum(frames, cfg, windowed=cfg.window != "rect")
    return ssc_from_power(ps, cfg)


# --------------------------------------------------- reference mel spectrum --
def mel_spectrogram(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """The reference's mel spectrogram (feature.rs:151-174): vorbis-window
    streaming-STFT power projected onto the speechpy filterbank,
    mel-major output (..., num_filters, T').  Equivalent to
    ``mel_spectrogram1`` for 1-D input and ``mel_spectrogram2`` for (C, T) —
    batching is just leading dims here, with stateless per-channel STFT
    (SURVEY §3.3)."""
    if cfg.window != "vorbis":
        cfg = cfg.replace(window="vorbis")
    power = _stft.stft_vorbis_power(signal, cfg)
    return mel_project_time_major(power, cfg)


# --------------------------------------------------------- librosa pipeline --
def mel_spectrogram_librosa(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """librosa-compatible mel spectrogram: (..., T) -> (..., n_mels, frames)
    (BASELINE.json config 2).  Build ``cfg`` with
    :func:`mfcc_rust_tpu.config.librosa_config`."""
    power = _stft.stft_framed(signal, cfg, framing_style="librosa", return_power=True)
    return mel_project_time_major(power, cfg)


def log_mel_spectrogram(signal: jnp.ndarray, cfg: FeatureConfig,
                        ref: float = 1.0, top_db: Optional[float] = 80.0) -> jnp.ndarray:
    """librosa ``power_to_db(melspectrogram)``."""
    return power_to_db(mel_spectrogram_librosa(signal, cfg), ref=ref, top_db=top_db)


def mfcc_librosa(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """librosa-compatible MFCC: DCT-II(ortho) over log-mel, (..., n_mfcc,
    frames)."""
    s = log_mel_spectrogram(signal, cfg)
    # DCT along the mel axis (-2): move it last, matmul, move back.
    coeffs = dct2_ortho(jnp.swapaxes(s, -1, -2), cfg)
    return jnp.swapaxes(coeffs, -1, -2)


# ----------------------------------------------------------------- batching --
def vmapped(fn, in_axes=0):
    """Convenience: vmap a pipeline over a batch axis (the general form of
    the reference's hand-written 2-D variants)."""
    return jax.vmap(fn, in_axes=(in_axes, None))
