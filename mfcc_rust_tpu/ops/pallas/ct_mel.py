"""Fused Pallas Cooley-Tukey mel-spectrogram kernel (librosa family).

The XLA CT path (features._librosa_ct_mel) is FLOPs-efficient but
HBM-bound: exp/ct_breakdown.py measured 65% of its runtime in frame
materialization (4x signal bytes), the window multiply, and the per-frame
(32, 16)@(16, 128) stage-1 GEMM — all round-tripping HBM between stages,
while the stage-2 GEMMs + mel projection alone run ~2.8x faster than the
whole pipeline.  This kernel keeps the entire per-tile pipeline in VMEM:

    hop-chunked signal row (VMEM-resident per batch element)
      -> r shifted chunk slices                (lane-aligned static slices)
      -> stage 1 + window fused as VPU FMAs    (ir/ii per CT residue r2;
         the window folds into the stage-1 weights so it costs nothing)
      -> twiddle-folded stage-2 GEMMs          (MXU: per-r2 (N1, 2*k1max))
      -> |X|^2 -> mel projection               (MXU: per-r2 dup-weight GEMM,
         rows k1 and k1max+k1 both carry fb[m, bin(r2, k1)] so no unaligned
         slicing of the packed [re | im] stage-2 output is ever needed)
      -> (TILE_F, n_mels) tile out

HBM traffic is exactly one signal read + one mel write: the chunk row's
BlockSpec index map is constant in the frame-tile grid axis, so Pallas
DMA's each batch row once and every tile iterates over it in VMEM.

Replaces the realfft plan machinery of the reference
(/root/reference/speechsauce/src/config.rs:161) for the librosa mel family;
same math as ops/fft.py's ct_power_project (shared constant builders, so
the two lowerings cannot desynchronize).

Numerics: all dots run at Mosaic HIGHEST precision (~3-pass f32, ~1e-4 rel
vs the 6-pass XLA default — interpret mode is bit-closer); the stage-1 VPU
FMAs are exact f32.  Gate on-TPU with exp/pallas_ct_ab.py (<=1e-3 rel vs
the XLA CT path).
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


def kernel_factorization(cfg: FeatureConfig):
    """The CT plane this kernel uses: N1 = 128 (stage-2 contraction exactly
    fills the MXU's systolic depth) whenever fft_points is a multiple of 128
    with an EVEN cofactor (the Hermitian-paired stage 1 needs even N2).
    Independent of ops.fft.good_factorization, whose near-square fallback
    (e.g. 512 -> (32, 16)) is tuned for the XLA lowering's GEMM shapes."""
    n = cfg.fft_points
    if n % 128 == 0 and (n // 128) % 2 == 0 and n // 128 >= 2:
        return 128, n // 128
    return None


def _chunk_layout_ok(cfg: FeatureConfig) -> bool:
    """The zero-copy hop-chunked input layout (one DMA per batch row, tiles
    iterate in VMEM) needs frames to start on whole chunk rows of whole N1
    lanes."""
    f = kernel_factorization(cfg)
    if f is None:
        return False
    n1, _ = f
    hop = cfg.frame_step
    return cfg.fft_points % hop == 0 and hop % n1 == 0


def pallas_ct_supported(cfg: FeatureConfig) -> bool:
    """Kernel CORRECTNESS predicate (what the kernel can compute).  Configs
    whose hop does not divide into whole N1 lanes (e.g. 16 kHz n_fft=512 /
    hop=160 production frontends) take the frames-input layout: frames are
    gathered once by XLA (strided chunk slices) and the kernel fuses window
    + both CT stages + |X|^2 + mel in VMEM.  NOTE: auto-DISPATCH additionally
    requires :func:`_chunk_layout_ok` — the frames layout measured ~0.78x
    the XLA lowering on-chip (the gather XLA prepends costs more than the
    fusion recovers, exp/frames_layout_ab_r03_results.txt), so it only runs
    under ``pallas="force"`` (features._librosa_pallas_ok)."""
    if cfg.frame_size != cfg.fft_points or cfg.power != 2.0:
        return False
    return kernel_factorization(cfg) is not None


@functools.lru_cache(maxsize=16)
def _ct_mel_constants(cfg: FeatureConfig):
    """Numpy constants (float64 precompute, cast to f32):

    - win (N2, N1): analysis window reshaped onto the CT plane
      (frame sample n = n1 + N1*n2).
    - c1w/s1w: the stage-1 N2-point real-DFT weights, exploiting Hermitian
      symmetry of the real input (ir[N2-r] = ir[r], ii[N2-r] = -ii[r]) and
      cos/sin q-symmetry on pre-added pairs u_q = xw_q + xw_{N2-q},
      v_q = xw_q - xw_{N2-q}:
        ir[r] = c[r,0]*xw0 + c[r,h]*xwh + sum_{q=1..h-1} c[r,q]*u_q
        ii[r] =                            sum_{q=1..h-1} s[r,q]*v_q
      with h = N2/2, computed only for r = 0..h (ii[0] = ii[h] = 0).
      ~7x fewer VPU FMAs than the naive N2 x N2 double loop.
    - a/b (N2, N1, 2*k1max): twiddle-folded stage-2 matrices
      (ops.fft._ct_foldtw_matrices — the shared source of truth); residues
      above N2/2 reuse ir/ii via o[N2-r] = ir[r] @ a[N2-r] - ii[r] @ b[N2-r].
    - proj (N2, 2*k1max, M): per-r2 mel projection, filterbank weights
      duplicated over the re/im halves of the squared stage-2 output
      (sum of squares = power) so no sub-lane-width slicing is needed.
    """
    from ..fft import (
        _ct_foldtw_matrices,
        _ct_constants,
        permute_weights_for_ct,
    )

    n = cfg.fft_points
    n1, n2 = kernel_factorization(cfg)
    bundle = constant_bundle(cfg)
    fbp = permute_weights_for_ct(bundle["fbank"], n, (n1, n2))  # (M, n2*k1max)
    k1max = fbp.shape[1] // n2
    mels = fbp.shape[0]

    c2, s2, _, _, _, _ = _ct_constants(n, n1, n2)  # s2 = -sin
    win = bundle["window"].reshape(n2, n1)

    a, b = _ct_foldtw_matrices(n, n1, n2, k1max)  # (n2, n1, 2*k1max)

    def dup(r2):
        """Mel projection for residue r2 with the filterbank columns
        duplicated over the re/im halves of the squared stage-2 output."""
        cols = fbp[:, r2 * k1max : (r2 + 1) * k1max].T  # (k1max, M)
        return np.concatenate([cols, cols], axis=0)  # (2*k1max, M)

    # MXU fill latency dominates at (tile_f, 128)@(128, 128) sizes, so the
    # Hermitian pair (r2, N2-r2) — which shares its stage-1 inputs — merges
    # into ONE (2*N1, 4*k1max) stage-2 GEMM:
    #   [ir | ii] @ [[A_r, A_r'], [B_r, -B_r']] = [o_r | o_r'].
    # Columns are permuted to [re_r | re_r' | im_r | im_r'] so the power
    # pre-add  sq[:, :2k] + sq[:, 2k:]  slices at a 2*k1max (= vreg when
    # k1max=64) boundary — no relayout — and the projection contracts over
    # 2*k1max instead of a re/im-duplicated 4*k1max (half the proj FLOPs).
    h = n2 // 2
    re, im = slice(0, k1max), slice(k1max, 2 * k1max)

    def pair_block(r2):
        r2c = n2 - r2
        top = np.concatenate(
            [a[r2][:, re], a[r2c][:, re], a[r2][:, im], a[r2c][:, im]], axis=1
        )
        bot = np.concatenate(
            [b[r2][:, re], -b[r2c][:, re], b[r2][:, im], -b[r2c][:, im]],
            axis=1,
        )
        return np.concatenate([top, bot], axis=0)  # (2*n1, 4*k1max)

    ab_pairs = np.stack([
        pair_block(r2) for r2 in range(1, h)
    ]) if h > 1 else np.zeros((0, 2 * n1, 4 * k1max))
    proj_pairs = np.stack([
        np.concatenate([
            fbp[:, r2 * k1max : (r2 + 1) * k1max].T,
            fbp[:, (n2 - r2) * k1max : (n2 - r2 + 1) * k1max].T,
        ], axis=0)
        for r2 in range(1, h)
    ]) if h > 1 else np.zeros((0, 2 * k1max, mels))
    # residues 0 and h have ii == 0: stage 2 is a single A GEMM each
    # (re/im-duplicated projection — only two of these, keep them simple)
    a_single = np.stack([a[0], a[h]])
    proj_single = np.stack([dup(0), dup(h)])
    # ONE-GEMM projection (r4, exp/ct_ablation_r04): the per-residue
    # projection dots accumulate serially into mel — measured HALF the
    # kernel's runtime (the dependency chain stalls the MXU on every small
    # GEMM).  Concatenating the per-residue power blocks
    # [p_0 | p_h | pair_1 .. pair_{h-1}] lets ONE K=(h+1)·2·k1max dot do
    # the whole projection with the accumulation folded into the MXU's
    # K-dimension — same FLOPs, no chain.  Row order must match the
    # kernel's powers list.
    proj_all = np.concatenate(
        [dup(0), dup(h)] + [proj_pairs[j] for j in range(h - 1)], axis=0
    ) if h > 1 else np.concatenate([dup(0), dup(h)], axis=0)
    # "fold_preadd" variant: project the RAW squares [re|re'|im|im'] of each
    # pair (no VPU power pre-add, no lane slicing) — rows [pp_j; pp_j] make
    # the re+im sum part of the same K-contraction.  2x the projection K
    # for fewer VPU/vreg passes; A/B'd on-chip (exp/ct_preadd_ab.py).
    proj_all2 = np.concatenate(
        [dup(0), dup(h)] + [np.concatenate([proj_pairs[j]] * 2, axis=0)
                            for j in range(h - 1)], axis=0
    ) if h > 1 else np.concatenate([dup(0), dup(h)], axis=0)

    def snap(w):
        """Roots-of-unity weights as exact scalars: 0 / +-1 multiplies
        specialize to skips / plain adds in the kernel unroll."""
        w = np.asarray(w, np.float64).copy()
        w[np.abs(w) < 1e-12] = 0.0
        w[np.abs(w - 1.0) < 1e-12] = 1.0
        w[np.abs(w + 1.0) < 1e-12] = -1.0
        return tuple(tuple(float(x) for x in row) for row in w)

    f32 = lambda x: np.ascontiguousarray(x, dtype=np.float32)
    return (f32(win), snap(c2), snap(s2), f32(ab_pairs), f32(a_single),
            f32(proj_pairs), f32(proj_single), f32(proj_all),
            f32(proj_all2), n1, n2, k1max, mels)


def _kernel(ch_ref, win_ref, abp_ref, as_ref, pp_ref, ps_ref, pall_ref,
            out_ref, *, tile_f, r, rows, n1, n2, k1max, mels, precision,
            c2, s2, layout="chunks", ablate=None, fold_preadd=False):
    """c2/s2 (the tiny N2 x N2 stage-1 weight tables) are baked in as Python
    floats — each multiplies a whole (tile_f, N1) array, so they lower to
    scalar-broadcast VPU FMAs with no constant traffic at all.

    ``layout``: "chunks" reads a hop-chunked signal row and assembles the r
    shifted views in VMEM (zero-copy framing; needs hop | fft and n1 | hop);
    "frames" reads pre-gathered (tile_f, N2, N1) frame tiles (any hop)."""
    # window (the only per-q full-vector multiply)
    xw = []
    if layout == "frames":
        for q in range(n2):
            xw.append(ch_ref[0, :, q, :] * win_ref[q, :][None, :])
    else:
        i = pl.program_id(1)
        base = pl.multiple_of(i * tile_f, tile_f)
        # one sublane-aligned slab load (dynamic starts must be provably
        # 8-aligned for Mosaic), then r shifted views as *static* sub-slices;
        # frame f (tile-local) spans chunks base+f .. base+f+r-1, i.e. view s
        # supplies CT rows n2 = s*rows + q
        pad_r = -(-(r - 1) // 8) * 8
        slab = ch_ref[0, pl.ds(base, tile_f + pad_r), :]
        xs = [slab[s : s + tile_f, :] for s in range(r)]
        for q in range(n2):
            x = xs[q // rows][:, (q % rows) * n1 : (q % rows + 1) * n1]
            xw.append(x * win_ref[q, :][None, :])

    # Hermitian-paired stage 1 (see _ct_mel_constants): pre-add q-pairs,
    # then short FMA chains with 0 / +-1 weights specialized away
    def fma(acc, x, w):
        if w == 0.0:
            return acc
        term = x if w == 1.0 else (-x if w == -1.0 else x * w)
        return term if acc is None else acc + term

    if ablate == "window":
        # per-stage ablation (exp/ct_ablation.py): stop after DMA + window
        acc = xw[0]
        for q in range(1, n2):
            acc = acc + xw[q]
        out_ref[0] = acc[:, :mels] if mels <= n1 else jnp.concatenate(
            [acc] * (-(-mels // n1)), axis=1)[:, :mels]
        return

    h = n2 // 2
    u = [xw[q] + xw[n2 - q] for q in range(1, h)]
    v = [xw[q] - xw[n2 - q] for q in range(1, h)]
    irs, iis = [], []
    for r2 in range(h + 1):
        ir = fma(fma(None, xw[0], c2[r2][0]), xw[h], c2[r2][h])
        ii = None
        for q in range(1, h):
            ir = fma(ir, u[q - 1], c2[r2][q])
            ii = fma(ii, v[q - 1], s2[r2][q])
        irs.append(ir)
        iis.append(ii)  # None for r2 in {0, h} (all sin weights are 0)

    if ablate == "stage1":
        acc = irs[0]
        for r2 in range(1, h + 1):
            acc = acc + irs[r2]
            if iis[r2] is not None:
                acc = acc + iis[r2]
        out_ref[0] = acc[:, :mels] if mels <= n1 else jnp.concatenate(
            [acc] * (-(-mels // n1)), axis=1)[:, :mels]
        return

    # stage 2 (twiddle folded, Hermitian pairs merged) + |X|^2 + mel
    # projection — 2*(h+1) MXU GEMMs total (see _ct_mel_constants)
    def dot(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32,
                       precision=precision)

    if ablate == "stage2":
        # widen to the (tile_f, mels) out block exactly like the window/
        # stage1 ablation branches (ADVICE r4: the old o[:, :1] fallback was
        # a shape error for mels > o.shape[1] configs)
        def widen(o):
            return o[:, :mels] if mels <= o.shape[1] else jnp.concatenate(
                [o] * (-(-mels // o.shape[1])), axis=1)[:, :mels]

        acc = None
        for idx, r2 in enumerate((0, h)):
            part = widen(dot(irs[r2], as_ref[idx]))
            acc = part if acc is None else acc + part
        for j, rr in enumerate(range(1, h)):
            z = jnp.concatenate([irs[rr], iis[rr]], axis=1)
            acc = acc + widen(dot(z, abp_ref[j]))
        out_ref[0] = acc
        return

    # per-residue power blocks, then ONE projection GEMM over their lane
    # concatenation (exp/ct_ablation_r04: the chained per-residue
    # projection dots were HALF the kernel's runtime — the MXU stalls on
    # every small accumulate; folding the residue sum into the K dimension
    # of a single (h+1)·2·k1max contraction removes the chain)
    powers = []
    for idx, r2 in enumerate((0, h)):  # ii == 0 singles
        o = dot(irs[r2], as_ref[idx])
        powers.append(o * o)  # re/im-dup rows in pall handle the sum
    for j, rr in enumerate(range(1, h)):  # merged (rr, n2-rr) pairs
        z = jnp.concatenate([irs[rr], iis[rr]], axis=1)  # (tile_f, 2*n1)
        o = dot(z, abp_ref[j])  # [re|re'|im|im'], (tile_f, 4*k1max)
        sq = o * o
        if fold_preadd:
            powers.append(sq)  # re+im sum rides the projection's K dim
        else:
            powers.append(sq[:, : 2 * k1max] + sq[:, 2 * k1max :])
    pw = powers[0] if len(powers) == 1 else jnp.concatenate(powers, axis=1)
    out_ref[0] = dot(pw, pall_ref[...])


def ct_mel_pallas(
    signal: jnp.ndarray,
    cfg: FeatureConfig,
    tile_f: int = 256,
    interpret: bool | None = None,
    parallel_batch: bool = True,
    ablate: "str | None" = None,
    fold_preadd: bool = False,
) -> jnp.ndarray:
    """librosa mel spectrogram via the fused CT kernel:
    (..., T) -> (..., frames, n_mels) — NOTE frame-major (the caller swaps to
    librosa's mel-major layout; feature heads want frame-major anyway).

    Semantics identical to features._librosa_ct_mel (center padding included
    here); bit-compatibility is fuzz-gated in tests/test_pallas.py and
    on-TPU by exp/pallas_ct_ab.py.
    """
    if not pallas_ct_supported(cfg):
        raise ValueError("config not supported by the fused CT kernel")
    if signal.ndim == 1:
        return ct_mel_pallas(signal[None], cfg, tile_f, interpret,
                             parallel_batch, ablate, fold_preadd)[0]
    if signal.ndim > 2:
        lead = signal.shape[:-1]
        out = ct_mel_pallas(
            signal.reshape((-1, signal.shape[-1])), cfg, tile_f, interpret,
            parallel_batch, ablate, fold_preadd,
        )
        return out.reshape(lead + out.shape[1:])

    (win, c2, s2, ab_pairs, a_single, proj_pairs, proj_single, proj_all,
     proj_all2, n1, n2, k1max, mels) = _ct_mel_constants(cfg)
    if fold_preadd:
        proj_all = proj_all2
    n = cfg.fft_points
    hop = cfg.frame_step
    signal = jnp.asarray(signal, jnp.float32)

    if cfg.center:
        pad = [(0, 0), (n // 2, n // 2)]
        signal = jnp.pad(signal, pad, mode=cfg.pad_mode)
    bsz, t = signal.shape
    count = 1 + (t - n) // hop
    if count <= 0:
        return jnp.zeros((bsz, 0, mels), jnp.float32)

    n_blocks = pl.cdiv(count, tile_f)
    n_frames_pad = n_blocks * tile_f
    chunked = _chunk_layout_ok(cfg)

    if chunked:
        r = n // hop
        rows = hop // n1
        # slab loads read tile_f + round_up(r-1, 8) chunk rows past each base
        n_chunks = n_frames_pad + (-(-(r - 1) // 8) * 8)
        need = n_chunks * hop
        if need > t:
            signal = jnp.pad(signal, [(0, 0), (0, need - t)])
        inp = signal[:, :need].reshape(bsz, n_chunks, hop)
        in0 = pl.BlockSpec(
            # whole chunk row per batch element; constant in the tile axis,
            # so Pallas DMA's it once per row and tiles iterate in VMEM
            (1, n_chunks, hop), lambda bb, ii: (bb, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        # frames-input layout for hop % n1 != 0 / fft % hop != 0 (e.g.
        # 16 kHz n_fft=512, hop=160): gather frames once in XLA via strided
        # chunk slices (gcd(n, hop)-sample chunks keep the gather a pure
        # relayout), reshape onto the CT (N2, N1) plane; the kernel reads
        # each (tile_f, N2, N1) tile once and fuses everything downstream
        r, rows = 0, 0  # unused by the frames kernel
        g = math.gcd(n, hop)
        need = (count - 1) * hop + n
        if need > t:
            signal = jnp.pad(signal, [(0, 0), (0, need - t)])
            t = need
        if g >= 8:
            stride = hop // g
            span = n // g
            n_ch = t // g
            ch = signal[:, : n_ch * g].reshape(bsz, n_ch, g)
            limit = stride * (count - 1) + 1
            parts = [ch[:, s : s + limit : stride, :] for s in range(span)]
            frames = jnp.concatenate(parts, axis=-1)  # (bsz, count, n)
        else:  # degenerate gcd: plain gather
            idx = (np.arange(count)[:, None] * hop
                   + np.arange(n)[None, :])
            frames = signal[:, idx]
        if n_frames_pad > count:
            frames = jnp.pad(frames, [(0, 0), (0, n_frames_pad - count),
                                      (0, 0)])
        inp = frames.reshape(bsz, n_frames_pad, n2, n1)
        in0 = pl.BlockSpec((1, tile_f, n2, n1),
                           lambda bb, ii: (bb, ii, 0, 0),
                           memory_space=pltpu.VMEM)

    kern = functools.partial(
        _kernel, tile_f=tile_f, r=r, rows=rows, n1=n1, n2=n2, k1max=k1max,
        mels=mels, c2=c2, s2=s2,
        layout="chunks" if chunked else "frames", ablate=ablate,
        fold_preadd=fold_preadd,
        precision=(jax.lax.Precision.DEFAULT if cfg.precision == "default"
                   else jax.lax.Precision.HIGHEST),
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda bb, ii: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kern,
        grid=(bsz, n_blocks),
        in_specs=[
            in0,
            const(win.shape),
            const(ab_pairs.shape),
            const(a_single.shape),
            const(proj_pairs.shape),
            const(proj_single.shape),
            const(proj_all.shape),
        ],
        out_specs=pl.BlockSpec((1, tile_f, mels), lambda bb, ii: (bb, ii, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_frames_pad, mels), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # batch rows are independent; in the chunked layout the tile
            # axis revisits the same input block, so it stays sequential;
            # the frames layout has fully independent tiles
            dimension_semantics=(
                ("parallel" if parallel_batch else "arbitrary",
                 "arbitrary" if chunked else "parallel")
            ),
        ),
        interpret=(jax.default_backend() != "tpu"
                   if interpret is None else interpret),
    )(
        inp,
        jnp.asarray(win),
        jnp.asarray(ab_pairs), jnp.asarray(a_single),
        jnp.asarray(proj_pairs), jnp.asarray(proj_single),
        jnp.asarray(proj_all),
    )
    return out[:, :count]
