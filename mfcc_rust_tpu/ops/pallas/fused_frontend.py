"""Fused Pallas MFCC / log-mel frontend kernel.

One kernel computes, per TILE_F-frame block, entirely in VMEM:

    hop-chunked signal --(r chunk-GEMMs vs split DFT matrices)--> X_re, X_im
    --> power |X|^2/N --> frame energy --> mel GEMM --> log --> DCT GEMM
    --> MFCC block (or log-mel block)

The framing trick: when ``frame_len == r * hop`` the windowed-DFT of all
frames factorizes as

    frames @ W  ==  sum_s  chunks[s : s+F] @ W[s*hop : (s+1)*hop]

so overlapping frames are never materialized — each signal sample is read
once per shift (r times total) instead of being gathered into an
(F, frame_len) matrix in HBM.  Everything between the signal and the final
(F, n_cepstral) output lives in VMEM; the intermediate power spectrum and
mel matrices never touch HBM (the XLA path round-trips both).

This is the hot path of BASELINE.json configs 1/3/4; the streaming/vorbis
path keeps the XLA lowering (its hop does not divide its window).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import FeatureConfig
from ...constants import constant_bundle

_EPS32 = float(np.finfo(np.float32).eps)


def fused_supported(cfg: FeatureConfig) -> bool:
    """The fused kernel needs hop-divisible frames and the speechpy framing
    family (centered/librosa works too after host-side pre-padding)."""
    fl = min(cfg.frame_size, cfg.fft_points)
    return (
        cfg.window != "vorbis"
        and fl % cfg.frame_step == 0
        and fl // cfg.frame_step >= 1
    )


def _split_dft(cfg: FeatureConfig, windowed: bool):
    """Split the (frame_len, K) cos/-sin DFT matrices into r hop-row blocks."""
    c, s = constant_bundle(cfg)["dft_windowed" if windowed else "dft"]
    hop = cfg.frame_step
    r = c.shape[0] // hop
    cs = [np.ascontiguousarray(c[i * hop : (i + 1) * hop]) for i in range(r)]
    ss = [np.ascontiguousarray(s[i * hop : (i + 1) * hop]) for i in range(r)]
    return cs, ss, r


def _kernel(
    # refs: r chunk views, r cos blocks, r sin blocks, fbT, dct, out
    *refs,
    r: int,
    inv_nfft: float,
    dc_elim: bool,
    feature: str,
):
    chunk_refs = refs[:r]
    c_refs = refs[r : 2 * r]
    s_refs = refs[2 * r : 3 * r]
    fbt_ref, dct_ref, out_ref = refs[3 * r : 3 * r + 3]

    a0 = chunk_refs[0][0]
    xr = jnp.dot(a0, c_refs[0][:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    xi = jnp.dot(a0, s_refs[0][:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    for s in range(1, r):
        a = chunk_refs[s][0]
        xr = xr + jnp.dot(a, c_refs[s][:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        xi = xi + jnp.dot(a, s_refs[s][:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    power = (xr * xr + xi * xi) * inv_nfft  # (TILE_F, K)
    mel = jnp.dot(power, fbt_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    mel = jnp.where(mel == 0.0, _EPS32, mel)
    logmel = jnp.log(mel)
    if feature == "logmel":
        out_ref[0] = logmel
        return
    out = jnp.dot(logmel, dct_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    if dc_elim:
        energy = jnp.sum(power, axis=1, keepdims=True)
        energy = jnp.where(energy == 0.0, _EPS32, energy)
        col = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        out = jnp.where(col == 0, jnp.log(energy), out)
    out_ref[0] = out


def _fused_frontend(
    signal: jnp.ndarray,
    cfg: FeatureConfig,
    feature: str,
    tile_f: int = 256,
) -> jnp.ndarray:
    """(B, T) float32 -> (B, n_frames, D).  n_frames is the speechpy
    no-padding count; framing style 'librosa' callers pre-pad and pass the
    padded signal with its own frame count."""
    if signal.ndim == 1:
        return _fused_frontend(signal[None], cfg, feature, tile_f)[0]
    if signal.ndim != 2:
        b = signal.shape[:-1]
        return _fused_frontend(
            signal.reshape((-1, signal.shape[-1])), cfg, feature, tile_f
        ).reshape(b + (-1, _out_dim(cfg, feature)))

    hop = cfg.frame_step
    fl = min(cfg.frame_size, cfg.fft_points)
    windowed = cfg.window != "rect"
    cs, ss, r = _split_dft(cfg, windowed)
    bsz, t = signal.shape
    n_frames = int(math.floor((t - fl) / hop))  # speechpy nopad count
    if n_frames <= 0:
        return jnp.zeros((bsz, 0, _out_dim(cfg, feature)), signal.dtype)

    n_blocks = pl.cdiv(n_frames, tile_f)
    n_frames_pad = n_blocks * tile_f
    # chunk view s needs rows [s, s + n_frames_pad) of the hop-chunked
    # signal: total chunks needed = n_frames_pad + r - 1
    need = (n_frames_pad + r - 1) * hop
    if need > t:
        signal = jnp.pad(signal, [(0, 0), (0, need - t)])
    chunks = signal[:, :need].reshape(bsz, n_frames_pad + r - 1, hop)
    # r shifted, block-aligned views (XLA materializes each once: r reads of
    # the signal instead of the gather's fl/hop-fold blowup + frame matrix)
    views = [chunks[:, s : s + n_frames_pad] for s in range(r)]

    bundle = constant_bundle(cfg)
    k = cfg.freq_size
    m = cfg.num_filters
    d = _out_dim(cfg, feature)
    fbt = jnp.asarray(bundle["fbank"].T, jnp.float32)  # (K, M)
    dct = jnp.asarray(bundle["dct"], jnp.float32)  # (M, ncep)

    kern = functools.partial(
        _kernel,
        r=r,
        inv_nfft=1.0 / cfg.fft_points,
        dc_elim=cfg.dc_elimination and feature == "mfcc",
        feature=feature,
    )
    view_specs = [
        pl.BlockSpec(
            (1, tile_f, hop), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        )
        for _ in range(r)
    ]
    const_specs = [
        pl.BlockSpec(c.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM)
        for c in cs
    ] + [
        pl.BlockSpec(s.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM)
        for s in ss
    ] + [
        pl.BlockSpec(fbt.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(dct.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        kern,
        grid=(bsz, n_blocks),
        in_specs=view_specs + const_specs,
        out_specs=pl.BlockSpec(
            (1, tile_f, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n_frames_pad, d), jnp.float32),
        # Mosaic targets TPU; elsewhere (CPU test mesh) run interpreted
        interpret=jax.default_backend() != "tpu",
    )(
        *views,
        *[jnp.asarray(c, jnp.float32) for c in cs],
        *[jnp.asarray(s, jnp.float32) for s in ss],
        fbt,
        dct,
    )
    return out[:, :n_frames]


def _out_dim(cfg: FeatureConfig, feature: str) -> int:
    return cfg.num_cepstral if feature == "mfcc" else cfg.num_filters


def fused_mfcc(signal: jnp.ndarray, cfg: FeatureConfig, tile_f: int = 256) -> jnp.ndarray:
    """Fused-kernel MFCC, numerically ≈ features.mfcc (feature.rs:94-148
    semantics) for float32.  NOTE: the XLA path's zero_handling on mel
    energies is replicated; frame energies are computed from the in-VMEM
    power spectrum."""
    if not fused_supported(cfg):
        raise ValueError("config not supported by the fused kernel")
    return _fused_frontend(jnp.asarray(signal, jnp.float32), cfg, "mfcc", tile_f)


def fused_log_mel(signal: jnp.ndarray, cfg: FeatureConfig, tile_f: int = 256) -> jnp.ndarray:
    """Fused-kernel log mel filterbank energies (lmfe, feature.rs:242-245)."""
    if not fused_supported(cfg):
        raise ValueError("config not supported by the fused kernel")
    return _fused_frontend(jnp.asarray(signal, jnp.float32), cfg, "logmel", tile_f)
