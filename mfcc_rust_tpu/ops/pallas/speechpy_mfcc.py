"""Fused Pallas speechpy-MFCC kernel: chunk-GEMM + Parseval + mel + log +
DCT in one VMEM pass (VERDICT r3 #4's "minimal fused epilogue").

At the shipped ``precision="high"`` default the XLA headline pipeline is no
longer purely MXU-bound: the serial Parseval energy pass re-reads the
signal's chunk rows (pure HBM) and the projection/log/DCT tail re-reads the
y intermediate — together ~25% of the step (docs/DESIGN.md, r3 accounting).
This kernel computes the SAME lowering — the fused K=r·hop chunk-GEMM
against the [C|S|w|±w] wall (``constants.chunk_gemm_wall``, single source
of truth with the XLA path) — but keeps everything downstream of the signal
read in VMEM:

    hop-chunked signal row (one DMA per batch element)
      -> r shifted slab slices, lane-concatenated    (the fused big operand)
      -> y = big @ wall                              (MXU, Mosaic HIGHEST =
                                                      3-pass f32 ≈ "high")
      -> frame energy: Σx² from the SAME VMEM operand + the wall's w/±w
         Parseval columns (no HBM re-read — the point of the fusion)
      -> mel = (y·y) @ [fb/N | e-select]             (MXU; energy terms ride
                                                      the same projection)
      -> log, DCT-II(ortho), dc-elimination          (VPU + tiny MXU)
      -> (TILE_F, num_cepstral) tile out

HBM traffic: one signal read + a 13-float-per-frame write (the XLA path
writes/reads the 262-wide y intermediate and re-reads the signal).

Dispatch: ``pallas="force"`` only — the on-chip A/B **lost**
(exp/fused_mfcc_ab_r04_results.txt, v5e): best kernel config 640k
audio-s/s vs 1,012k for the XLA lowering (0.63x), and the directly
measured fusion-winnable pot is only ~3% (dc_elimination=False runs
1,040k — XLA overlaps the Parseval re-read far better than the r3
accounting assumed).  The kernel stays as the reproducible refutation
evidence (VERDICT r3 #4) and for TPU generations where the tradeoff may
differ; numerics are fuzz-gated against the XLA path
(tests/test_pallas.py) and the VJP recomputes through XLA.

Reference scope: the mfcc/mfe pipeline of speechsauce/src/feature.rs:94-233
(semantics via the shared wall constants; bugs fixed per SURVEY §4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import FeatureConfig


def mfcc_pallas_supported(cfg: FeatureConfig) -> bool:
    """Correctness predicate: rect-window speechpy framing on the chunk-GEMM
    fast path, f32, bounded r, Parseval-compatible even fft."""
    from ...features import _chunk_r
    from ..spectrum import resolve_fft_impl

    return (
        cfg.window == "rect"
        and cfg.dtype == "float32"
        and cfg.frame_size <= cfg.fft_points
        and _chunk_r(cfg) is not None
        and cfg.fft_points % 2 == 0
        and resolve_fft_impl(cfg) == "matmul"
        and cfg.num_filters <= 127  # mel lanes + the energy lane in 128
        and cfg.num_cepstral <= cfg.num_filters
    )


@functools.lru_cache(maxsize=16)
def _mfcc_constants(cfg: FeatureConfig):
    """f32 constants from the shared float64 builders:

    - wall (r*hop, W): [C_trim | S_trim | w | ±w] (chunk_gemm_wall).
    - proj (W, M+1): squared-output projection — stacked filterbank /N over
      the cos and sin blocks (features._stacked_fb semantics) in lanes
      0..M-1, and lane M selecting the two Parseval columns (y0²+y1²).
    - dctm (M, C): DCT-II ortho, num_cepstral truncation baked in.
    - emask (1, r*hop): 1.0 on the first frame_size lanes (Σx² must not
      count the zero-padded wall rows of hop-misaligned frames).
    """
    from ...constants import chunk_gemm_wall, constant_bundle

    bundle = constant_bundle(cfg)
    wd = chunk_gemm_wall(cfg, True)
    kmax = wd["kmax"]
    w = wd["wall"].shape[1]
    m = cfg.num_filters
    n = cfg.fft_points
    fb = bundle["fbank"][:, :kmax].T / n  # (kmax, M)
    proj = np.zeros((w, m + 1))
    proj[:kmax, :m] = fb
    proj[kmax : 2 * kmax, :m] = fb
    proj[2 * kmax, m] = 1.0
    proj[2 * kmax + 1, m] = 1.0
    emask = np.zeros((1, wd["r"] * wd["hop"]))
    emask[0, : wd["fl"]] = 1.0
    f32 = lambda x: np.ascontiguousarray(x, np.float32)
    return (f32(wd["wall"]), f32(proj), f32(bundle["dct"]), f32(emask),
            wd["r"], wd["hop"], wd["fl"])


def _kernel(ch_ref, wall_ref, proj_ref, dct_ref, emask_ref, out_ref, *,
            tile_f, r, hop, n, m, ncep, dc_elim, eps, fuse_big=True):
    i = pl.program_id(1)
    base = pl.multiple_of(i * tile_f, tile_f)
    pad_r = -(-(r - 1) // 8) * 8 if r > 1 else 0
    slab = ch_ref[0, pl.ds(base, tile_f + pad_r), :]
    rows = tile_f + pad_r
    # the r shifted views slab[s : s+tile_f]: a direct sub-slice carries a
    # sublane offset Mosaic cannot lane-concatenate ("offset mismatch on
    # non-concat dimension"), so realign each view to offset 0 with a
    # static sublane rotate first
    xs = [slab[:tile_f, :]]
    for s in range(1, r):
        xs.append(pltpu.roll(slab, rows - s, axis=0)[:tile_f, :])

    def dot(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    if fuse_big and r > 1:
        # fused chunk-GEMM operand: ONE K=r*hop dot (the XLA dispatch rule
        # for MXU-misaligned hops, features._chunk_gemm)
        big = jnp.concatenate(xs, axis=1)  # (tile_f, r*hop)
        y = dot(big, wall_ref[...])  # (tile_f, W) = [xr | xi | s0 | s1]
        s2 = jnp.sum(big * big * emask_ref[0, :][None, :], axis=1,
                     keepdims=True)
    else:
        # r shifted K=hop dots against the wall's row blocks
        y = None
        s2 = None
        for s in range(r):
            part = dot(xs[s], wall_ref[s * hop : (s + 1) * hop, :])
            y = part if y is None else y + part
            e = jnp.sum(
                xs[s] * xs[s] * emask_ref[0, s * hop : (s + 1) * hop][None, :],
                axis=1, keepdims=True,
            )
            s2 = e if s2 is None else s2 + e
    p = dot(y * y, proj_ref[...])  # (tile_f, M+1): mel·N⁻¹ + (y0²+y1²)
    en = (n * s2 + p[:, m : m + 1]) * (1.0 / (2.0 * n))
    pm = p[:, :m]
    pm = jnp.where(pm == 0.0, eps, pm)  # zero_handling (f32 epsilon)
    mf = dot(jnp.log(pm), dct_ref[...])  # (tile_f, C)
    if dc_elim:
        en = jnp.where(en == 0.0, eps, en)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_f, ncep), 1)
        mf = jnp.where(lane == 0, jnp.log(en), mf)
    out_ref[0] = mf


def mfcc_pallas(
    signal: jnp.ndarray,
    cfg: FeatureConfig,
    tile_f: int = 512,
    interpret: bool | None = None,
    fuse_big: bool = True,
) -> jnp.ndarray:
    """speechpy MFCC via the fused kernel: (..., T) -> (..., F, num_cepstral)
    with the speechpy zero_padding=False frame count.  Preemphasis (when
    configured) is applied by the caller (features._mfcc_pallas), outside
    the kernel — same placement as the XLA lowering."""
    if not mfcc_pallas_supported(cfg):
        raise ValueError("config not supported by the fused MFCC kernel")
    if signal.ndim == 1:
        return mfcc_pallas(signal[None], cfg, tile_f, interpret,
                           fuse_big)[0]
    if signal.ndim > 2:
        lead = signal.shape[:-1]
        out = mfcc_pallas(signal.reshape((-1, signal.shape[-1])), cfg,
                          tile_f, interpret, fuse_big)
        return out.reshape(lead + out.shape[1:])

    wall, proj, dctm, emask, r, hop, fl = _mfcc_constants(cfg)
    signal = jnp.asarray(signal, jnp.float32)
    bsz, t = signal.shape
    count = (t - fl) // hop  # speechpy zero_padding=False (issue-34 floor)
    m, ncep = cfg.num_filters, cfg.num_cepstral
    if count <= 0:
        return jnp.zeros((bsz, 0, ncep), jnp.float32)

    tile_f = min(tile_f, -(-count // 8) * 8)
    n_blocks = pl.cdiv(count, tile_f)
    n_frames_pad = n_blocks * tile_f
    pad_r = -(-(r - 1) // 8) * 8 if r > 1 else 0
    n_chunks = n_frames_pad + pad_r + (r - 1 if pad_r == 0 else 0)
    need = n_chunks * hop
    if need > t:
        signal = jnp.pad(signal, [(0, 0), (0, need - t)])
    ch = signal[:, :need].reshape(bsz, n_chunks, hop)

    kern = functools.partial(
        _kernel, tile_f=tile_f, r=r, hop=hop, n=cfg.fft_points, m=m,
        ncep=ncep, dc_elim=cfg.dc_elimination,
        eps=float(np.finfo(np.float32).eps), fuse_big=fuse_big,
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda bb, ii: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kern,
        grid=(bsz, n_blocks),
        in_specs=[
            pl.BlockSpec((1, n_chunks, hop), lambda bb, ii: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            const(wall.shape),
            const(proj.shape),
            const(dctm.shape),
            const(emask.shape),
        ],
        out_specs=pl.BlockSpec((1, tile_f, ncep), lambda bb, ii: (bb, ii, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_frames_pad, ncep),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # batch rows independent; the tile axis revisits the same chunk
            # row block, so it stays sequential
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=(jax.default_backend() != "tpu"
                   if interpret is None else interpret),
    )(ch, jnp.asarray(wall), jnp.asarray(proj), jnp.asarray(dctm),
      jnp.asarray(emask))
    return out[:, :count]
