"""Halo-exchange blockwise framing: sequence (time-axis) parallelism.

The reference handles long audio with a serial O(window) carry buffer
(``analysis_mem``, config.rs:126,162; functions.rs:128-159).  The TPU-native
generalization shards the time axis across the ``seq`` mesh axis and
exchanges only the ``frame_len - hop`` boundary samples between neighbor
devices with ``ppermute`` — exact-equality sequence scaling (SURVEY §5).

Two variants, differing only in which side the halo comes from:

* :func:`sharded_frames_left_halo` — the streaming/vorbis layout: frame ``c``
  ends at sample ``(c+1)*hop``, so each shard needs the *previous* shard's
  tail (the distributed analysis memory).
* :func:`sharded_frames_right_halo` — the framed/speechpy layout: frame ``j``
  starts at ``j*hop``, so each shard needs the *next* shard's head.

Both are written to run **inside** ``shard_map`` with the time axis sharded
over ``axis_name``; the local chunk length must be a multiple of the hop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import FeatureConfig
from ..ops import framing
from ..ops.spectrum import rdft


def _left_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Each shard receives the last ``halo`` samples of its left neighbor
    (zeros for shard 0)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    recv = jax.lax.ppermute(x[..., -halo:], axis_name, perm)
    idx = jax.lax.axis_index(axis_name)
    return jnp.where(idx == 0, jnp.zeros_like(recv), recv)


def _right_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Each shard receives the first ``halo`` samples of its right neighbor
    (zeros for the last shard)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i - 1) % n) for i in range(n)]
    recv = jax.lax.ppermute(x[..., :halo], axis_name, perm)
    idx = jax.lax.axis_index(axis_name)
    return jnp.where(idx == n - 1, jnp.zeros_like(recv), recv)


def sharded_frames_left_halo(
    local: jnp.ndarray, frame_len: int, hop: int, axis_name: str
) -> jnp.ndarray:
    """(..., Tl) time-shard -> (..., Tl/hop, frame_len) frames where global
    frame c covers samples [ (c+1)*hop - frame_len, (c+1)*hop )."""
    t = local.shape[-1]
    if t % hop != 0:
        raise ValueError(f"local shard length {t} must be a multiple of hop {hop}")
    halo = frame_len - hop
    left = _left_halo(local, halo, axis_name)
    full = jnp.concatenate([left, local], axis=-1)
    return framing.frame_signal(full, frame_len, hop, t // hop)


def sharded_frames_right_halo(
    local: jnp.ndarray, frame_len: int, hop: int, axis_name: str
) -> jnp.ndarray:
    """(..., Tl) time-shard -> (..., Tl/hop, frame_len) frames where global
    frame j starts at sample j*hop.  Frames overrunning the global signal end
    read zeros (mask downstream per speechpy counts)."""
    t = local.shape[-1]
    if t % hop != 0:
        raise ValueError(f"local shard length {t} must be a multiple of hop {hop}")
    halo = frame_len - hop
    right = _right_halo(local, halo, axis_name)
    full = jnp.concatenate([local, right], axis=-1)
    return framing.frame_signal(full, frame_len, hop, t // hop)


def sharded_stft_vorbis_power(
    local: jnp.ndarray, cfg: FeatureConfig, axis_name: str
) -> jnp.ndarray:
    """Time-sharded vorbis STFT power: per-shard output rows are the global
    computed frames owned by this shard (chunk-indexed; the n_pad warm-up/
    tail layout is a global-view concern applied after gathering).  Matches
    :func:`mfcc_rust_tpu.ops.stft.stft_vorbis_power`'s pre-layout frames
    exactly."""
    frames = sharded_frames_left_halo(local, cfg.fft_points, cfg.stream_hop, axis_name)
    xr, xi = rdft(frames, cfg, windowed=True)
    return (xr * xr + xi * xi) * (cfg.wnorm * cfg.wnorm)


def sharded_power_spectrum(
    local: jnp.ndarray, cfg: FeatureConfig, axis_name: str
) -> jnp.ndarray:
    """Time-sharded speechpy power spectrum over hop-strided frames of
    cfg.frame_size.  Requires cfg.frame_size % cfg.frame_step == 0 for a
    halo that is a whole number of hops."""
    frames = sharded_frames_right_halo(local, cfg.frame_size, cfg.frame_step, axis_name)
    xr, xi = rdft(frames, cfg, windowed=cfg.window != "rect")
    return (xr * xr + xi * xi) * (1.0 / cfg.fft_points)
