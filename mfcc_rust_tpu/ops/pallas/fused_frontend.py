"""Fused Pallas MFCC / log-mel frontend kernel.

One kernel computes, per TILE_F-frame block, entirely in VMEM:

    hop-chunked signal --(r chunk-GEMMs vs split DFT matrices)--> X_re, X_im
    --> power |X|^2/N (+ Parseval frame energy) --> mel GEMM --> log
    --> DCT GEMM --> MFCC block (or log-mel block)

Same chunk-algebra lowering as the XLA fast path
(mfcc_rust_tpu.features._chunked_mel_energy): frames never materialize, the
DFT is trimmed to the filterbank's support, and exact frame energies come
from Parseval columns in the same GEMM.  What the kernel adds over XLA: the
power spectrum and mel intermediates never round-trip HBM, and the block
pipeline overlaps the chunk DMA with compute.

Mosaic specifics: bin counts are padded to 128-lane multiples so the
xr/xi/energy slices are lane-aligned; all dots request HIGHEST precision
(Mosaic defaults to bf16 multiplies even for f32 inputs — interpret mode
hides this, the hardware does not).

Numerics: matches the XLA pipeline to ~2e-3 absolute on MFCC (Mosaic's
HIGHEST is a 3-pass scheme vs XLA's 6-pass); run A/B against features.mfcc
before switching a workload over.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import FeatureConfig
from ...constants import constant_bundle

_EPS32 = float(np.finfo(np.float32).eps)


def fused_supported(cfg: FeatureConfig) -> bool:
    """Needs hop-divisible frames (speechpy/librosa framing family; the
    vorbis hop does not divide its window) and an even fft size."""
    return (
        cfg.window != "vorbis"
        and cfg.frame_size <= cfg.fft_points  # frame>fft needs truncation
        and cfg.frame_size % cfg.frame_step == 0
        and cfg.frame_size // cfg.frame_step >= 1
        and cfg.fft_points % 2 == 0
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=16)
def _kernel_constants(cfg: FeatureConfig):
    """Lane-aligned numpy constants from the SHARED chunk-GEMM wall builder
    (constants.chunk_gemm_wall — same math as the XLA fast path, so the two
    lowerings cannot desynchronize), split into per-shift blocks, plus the
    trimmed+padded melbank and the DCT matrix."""
    from ...constants import chunk_gemm_wall

    bundle = constant_bundle(cfg)
    wd = chunk_gemm_wall(cfg, want_energy=True, lane_align=128)
    kmax, kpad, r, fl, hop = wd["kmax"], wd["kpad"], wd["r"], wd["fl"], wd["hop"]
    wall_blocks = [
        np.ascontiguousarray(wd["wall"][i * hop : (i + 1) * hop]).astype(np.float32)
        for i in range(r)
    ]
    w2_blocks = [
        np.ascontiguousarray(wd["w2"][i][None, :]).astype(np.float32)
        for i in range(r)
    ]
    fbt = np.zeros((kpad, cfg.num_filters))
    fbt[:kmax] = bundle["fbank"][:, :kmax].T
    dct = bundle["dct"].astype(np.float32)
    return wall_blocks, w2_blocks, fbt.astype(np.float32), dct, kpad, r, fl


def _kernel(*refs, r, kpad, inv_nfft, nfft, dc_elim, feature):
    chunk_refs = refs[:r]
    wall_refs = refs[r : 2 * r]
    w2_refs = refs[2 * r : 3 * r]
    fbt_ref, dct_ref, out_ref = refs[3 * r : 3 * r + 3]
    hi = jax.lax.Precision.HIGHEST

    y = None
    s2 = None
    for i in range(r):
        a = chunk_refs[i][0]  # (TILE_F, hop)
        part = jnp.dot(a, wall_refs[i][:], preferred_element_type=jnp.float32,
                       precision=hi)
        y = part if y is None else y + part
        if dc_elim:
            e = jnp.sum(a * a * w2_refs[i][:], axis=1, keepdims=True)
            s2 = e if s2 is None else s2 + e

    xr = y[:, :kpad]
    xi = y[:, kpad : 2 * kpad]
    power = (xr * xr + xi * xi) * inv_nfft
    mel = jnp.dot(power, fbt_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    mel = jnp.where(mel == 0.0, _EPS32, mel)
    logmel = jnp.log(mel)
    if feature == "logmel":
        out_ref[0] = logmel
        return
    out = jnp.dot(logmel, dct_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    if dc_elim:
        s0 = y[:, 2 * kpad : 2 * kpad + 1]
        s1 = y[:, 2 * kpad + 1 : 2 * kpad + 2]
        energy = (nfft * s2 + s0 * s0 + s1 * s1) * (0.5 * inv_nfft)
        energy = jnp.where(energy == 0.0, _EPS32, energy)
        col = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        out = jnp.where(col == 0, jnp.log(energy), out)
    out_ref[0] = out


def _fused_frontend(signal, cfg: FeatureConfig, feature: str, tile_f: int):
    if signal.ndim == 1:
        return _fused_frontend(signal[None], cfg, feature, tile_f)[0]
    if signal.ndim != 2:
        lead = signal.shape[:-1]
        out = _fused_frontend(
            signal.reshape((-1, signal.shape[-1])), cfg, feature, tile_f
        )
        return out.reshape(lead + out.shape[1:])

    wall_blocks, w2_blocks, fbt, dct, kpad, r, fl = _kernel_constants(cfg)
    hop = cfg.frame_step
    bsz, t = signal.shape
    n_frames = int(math.floor((t - fl) / hop))
    d = cfg.num_cepstral if feature == "mfcc" else cfg.num_filters
    if n_frames <= 0:
        return jnp.zeros((bsz, 0, d), jnp.float32)

    n_blocks = pl.cdiv(n_frames, tile_f)
    n_frames_pad = n_blocks * tile_f
    need = (n_frames_pad + r - 1) * hop
    if need > t:
        signal = jnp.pad(signal, [(0, 0), (0, need - t)])
    chunks = signal[:, :need].reshape(bsz, n_frames_pad + r - 1, hop)
    views = [chunks[:, i : i + n_frames_pad] for i in range(r)]

    kern = functools.partial(
        _kernel, r=r, kpad=kpad, inv_nfft=1.0 / cfg.fft_points,
        nfft=float(cfg.fft_points),
        dc_elim=cfg.dc_elimination and feature == "mfcc", feature=feature,
    )
    view_specs = [
        pl.BlockSpec((1, tile_f, hop), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(r)
    ]
    const_specs = (
        [pl.BlockSpec(w.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM)
         for w in wall_blocks]
        + [pl.BlockSpec(w.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM)
           for w in w2_blocks]
        + [pl.BlockSpec(fbt.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM),
           pl.BlockSpec(dct.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM)]
    )
    out = pl.pallas_call(
        kern,
        grid=(bsz, n_blocks),
        in_specs=view_specs + const_specs,
        out_specs=pl.BlockSpec((1, tile_f, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_frames_pad, d), jnp.float32),
        # Mosaic targets TPU; elsewhere (CPU test mesh) run interpreted
        interpret=jax.default_backend() != "tpu",
    )(
        *views,
        *[jnp.asarray(w) for w in wall_blocks],
        *[jnp.asarray(w) for w in w2_blocks],
        jnp.asarray(fbt),
        jnp.asarray(dct),
    )
    return out[:, :n_frames]


def fused_mfcc(signal, cfg: FeatureConfig, tile_f: int = 512) -> jnp.ndarray:
    """Fused-kernel MFCC (feature.rs:94-148 semantics, float32)."""
    if not fused_supported(cfg):
        raise ValueError("config not supported by the fused kernel")
    return _fused_frontend(jnp.asarray(signal, jnp.float32), cfg, "mfcc", tile_f)


def fused_log_mel(signal, cfg: FeatureConfig, tile_f: int = 512) -> jnp.ndarray:
    """Fused-kernel log mel filterbank energies (lmfe, feature.rs:242-245)."""
    if not fused_supported(cfg):
        raise ValueError("config not supported by the fused kernel")
    return _fused_frontend(jnp.asarray(signal, jnp.float32), cfg, "logmel", tile_f)
