"""Signal framing and pre-emphasis.

TPU-native replacement for the reference's ``preemphasis`` and
``stack_frames`` (speechsauce/src/processing.rs:31-53, 65-129).  The
reference fills its frame matrix with a broken chunk-copy scheme
(processing.rs:110-120, SURVEY §4 bug #3); here framing is a single gather
with statically-precomputed indices — XLA lowers it to an efficient
dynamic-slice loop / vectorized gather, and the Pallas fused kernel bypasses
frame materialization entirely.

All functions are shape-polymorphic over leading batch dims and jit-safe:
frame counts are derived from static shapes in Python at trace time.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def preemphasis(signal: jnp.ndarray, shift: int = 1, cof: float = 0.98) -> jnp.ndarray:
    """``signal - cof * roll(signal, shift)`` with np.roll wrap-around
    semantics (processing.rs:31-53)."""
    return signal - cof * jnp.roll(signal, shift, axis=-1)


def speechpy_frame_counts(
    length: int, frame_len: int, frame_step: int, zero_padding: bool
) -> Tuple[int, int]:
    """(num_frames, effective_signal_len) with speechpy's exact count rules
    (processing.rs:91-107): ``ceil((L-fl)/step)`` + zero pad, or
    ``floor((L-fl)/step)`` + truncate (which drops the final otherwise-valid
    frame — speechpy issue #34 parity)."""
    if length < frame_len:
        # the reference saturates the negative count to zero frames and mfcc
        # returns an empty (0, num_cepstral) matrix (feature.rs:102-104)
        return 0, 0
    if zero_padding:
        num = int(math.ceil((length - frame_len) / frame_step))
        eff = num * frame_step + frame_len
    else:
        num = int(math.floor((length - frame_len) / frame_step))
        eff = (num - 1) * frame_step + frame_len
    return num, eff


def frame_indices(num_frames: int, frame_len: int, frame_step: int) -> np.ndarray:
    """Static (num_frames, frame_len) gather index matrix."""
    return (
        np.arange(num_frames, dtype=np.int32)[:, None] * frame_step
        + np.arange(frame_len, dtype=np.int32)[None, :]
    )


def frame_signal(
    signal: jnp.ndarray, frame_len: int, frame_step: int, num_frames: int
) -> jnp.ndarray:
    """Overlapping-window gather: (..., T) -> (..., num_frames, frame_len)."""
    idx = jnp.asarray(frame_indices(num_frames, frame_len, frame_step))
    return jnp.take(signal, idx, axis=-1)


def stack_frames(
    signal: jnp.ndarray,
    sample_rate: int,
    frame_length: float = 0.020,
    frame_stride: float = 0.020,
    window: Optional[jnp.ndarray] = None,
    zero_padding: bool = True,
) -> jnp.ndarray:
    """speechpy-compatible framing (processing.rs:65-129 semantics, correctly
    implemented): (..., T) -> (..., F, frame_len)."""
    frame_len = int(round(sample_rate * frame_length))
    frame_step = int(round(sample_rate * frame_stride))
    return stack_frames_samples(signal, frame_len, frame_step, window, zero_padding)


def stack_frames_samples(
    signal: jnp.ndarray,
    frame_len: int,
    frame_step: int,
    window: Optional[jnp.ndarray] = None,
    zero_padding: bool = True,
) -> jnp.ndarray:
    length = signal.shape[-1]
    num, eff = speechpy_frame_counts(length, frame_len, frame_step, zero_padding)
    if eff > length:
        pad = [(0, 0)] * (signal.ndim - 1) + [(0, eff - length)]
        signal = jnp.pad(signal, pad)
    frames = frame_signal(signal, frame_len, frame_step, num)
    if window is not None:
        frames = frames * window
    return frames
