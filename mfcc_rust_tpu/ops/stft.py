"""Short-time Fourier transforms: batch (stateless) and streaming (explicit
carry).

Replaces the reference's streaming overlap STFT ``stft1``/``stft2``/
``frame_analysis`` (speechsauce/src/functions.rs:86-233) and its hidden
``RefCell`` ring buffer (config.rs:126,162).  Three equivalent views:

* :func:`stft_vorbis_power` — the *batch* form: the entire per-frame
  recurrence collapses into one framing gather + windowed-DFT GEMM, producing
  bit-identical output to a freshly-reset reference stream, including the
  ``n_pad`` warm-up drop and the reference's never-written trailing zero rows
  (functions.rs:121,231; see tests/golden/dfn_ref.py).
* :func:`streaming_step` / :func:`stft_streaming` — the functional streaming
  form: carry = last ``fft_points - hop`` samples, one frame out per hop.
  Unlike the reference there is no cross-call state leakage (SURVEY §4 bug
  #5): the carry is explicit and resettable.
* :func:`stft_framed` — the framed/windowed family (speechpy & librosa
  presets: optional centering, any window, any hop).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import FeatureConfig
from . import framing
from .spectrum import rdft


# ------------------------------------------------------------- vorbis batch --
def _vorbis_frames(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Frame (..., T) into the reference's streaming frames: prepend the
    zero-initialized analysis memory (fft_points - hop zeros), right-pad the
    final partial chunk, then gather hop-strided windows of fft_points."""
    hop = cfg.stream_hop
    n = cfg.fft_points
    t = signal.shape[-1]
    n_chunks = int(math.ceil(t / hop))
    pad = [(0, 0)] * (signal.ndim - 1) + [(n - hop, n_chunks * hop - t)]
    x = jnp.pad(signal, pad)
    return framing.frame_signal(x, n, hop, n_chunks)


def stft_vorbis_power(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """(..., T) -> (..., T', K) power spectrum, T' = ceil(T/hop), matching
    ``|stft1(signal)|^2`` of a fresh reference state exactly: rows
    ``[n_pad:]`` of the computed frames followed by ``n_pad`` zero rows."""
    frames = _vorbis_frames(signal, cfg)
    xr, xi = rdft(frames, cfg, windowed=True)
    wnorm2 = cfg.wnorm * cfg.wnorm
    power = (xr * xr + xi * xi) * wnorm2
    return _apply_npad_layout(power, cfg)


def stft_vorbis(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Complex variant of :func:`stft_vorbis_power` (parity with stft1's
    complex output, functions.rs:199-233)."""
    frames = _vorbis_frames(signal, cfg)
    xr, xi = rdft(frames, cfg, windowed=True)
    spec = (xr + 1j * xi) * cfg.wnorm
    return _apply_npad_layout(spec, cfg)


def _apply_npad_layout(frames_out: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    n_pad = cfg.stream_n_pad
    if n_pad == 0:
        return frames_out
    zeros = jnp.zeros(frames_out.shape[:-2] + (n_pad, frames_out.shape[-1]),
                      dtype=frames_out.dtype)
    return jnp.concatenate([frames_out[..., n_pad:, :], zeros], axis=-2)


# ---------------------------------------------------------------- streaming --
def streaming_init(cfg: FeatureConfig, batch_shape: Tuple[int, ...] = (),
                   dtype=None) -> jnp.ndarray:
    """Fresh carry: ``fft_points - hop`` zeros (config.rs:162's analysis_mem,
    made explicit)."""
    dtype = jnp.dtype(cfg.dtype) if dtype is None else dtype
    return jnp.zeros(batch_shape + (cfg.stream_mem,), dtype=dtype)


def streaming_step(
    carry: jnp.ndarray, chunk: jnp.ndarray, cfg: FeatureConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One hop of the analysis recurrence (functions.rs:125-170):
    ``buf = concat(carry, chunk) * window; out = rfft(buf) * wnorm;
    carry' = concat(carry, chunk)[hop:]``.  Returns (carry', power_frame)."""
    full = jnp.concatenate([carry, chunk], axis=-1)
    xr, xi = rdft(full[..., None, :], cfg, windowed=True)
    power = (xr * xr + xi * xi)[..., 0, :] * (cfg.wnorm * cfg.wnorm)
    return full[..., cfg.stream_hop :], power


def stft_streaming(
    signal: jnp.ndarray, cfg: FeatureConfig, carry: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan the streaming recurrence over a (..., T) signal whose length is a
    multiple of the hop.  Returns (carry', power_frames (..., T/hop, K)).

    Emits *all* computed frames (no warm-up drop): session-level warm-up/tail
    handling lives in :class:`mfcc_rust_tpu.models.StreamingExtractor`, which
    is what makes chunked streaming concatenation bit-equal to the batch
    transform."""
    hop = cfg.stream_hop
    t = signal.shape[-1]
    if t % hop != 0:
        raise ValueError(f"streaming signal length {t} must be a multiple of hop {hop}")
    if carry is None:
        carry = streaming_init(cfg, signal.shape[:-1], signal.dtype)
    chunks = jnp.moveaxis(
        signal.reshape(signal.shape[:-1] + (t // hop, hop)), -2, 0
    )

    def step(c, chunk):
        return streaming_step(c, chunk, cfg)

    carry, frames = jax.lax.scan(step, carry, chunks)
    return carry, jnp.moveaxis(frames, 0, -2)


# ------------------------------------------------------------------- framed --
def librosa_frame_count(length: int, n_fft: int, hop: int, center: bool) -> int:
    if center:
        length = length + 2 * (n_fft // 2)
    return 1 + (length - n_fft) // hop


def stft_framed(
    signal: jnp.ndarray,
    cfg: FeatureConfig,
    framing_style: str = "librosa",
    return_power: bool = True,
) -> jnp.ndarray:
    """Framed/windowed STFT family: (..., T) -> (..., F, K).

    ``framing_style``:
      * ``librosa``  — center reflect-pad (cfg.center), frames of fft_points,
        count ``1 + (T_padded - n_fft)//hop``.
      * ``speechpy_nopad`` / ``speechpy_pad`` — speechpy frame counts
        (processing.rs:91-107) with frames of cfg.frame_size right-zero-padded
        into the DFT.
    """
    n = cfg.fft_points
    hop = cfg.frame_step
    if framing_style == "librosa":
        if cfg.center:
            pad = [(0, 0)] * (signal.ndim - 1) + [(n // 2, n // 2)]
            signal = jnp.pad(signal, pad, mode=cfg.pad_mode)
        count = 1 + (signal.shape[-1] - n) // hop
        frames = framing.frame_signal(signal, n, hop, count)
    elif framing_style in ("speechpy_nopad", "speechpy_pad"):
        frames = framing.stack_frames_samples(
            signal, cfg.frame_size, hop, window=None,
            zero_padding=framing_style == "speechpy_pad",
        )
    else:
        raise ValueError(f"unknown framing_style {framing_style!r}")
    xr, xi = rdft(frames, cfg, windowed=True)
    if return_power:
        power = xr * xr + xi * xi
        if cfg.power != 2.0:
            power = power ** (cfg.power / 2.0)
        return power
    return xr + 1j * xi
