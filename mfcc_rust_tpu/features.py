"""Feature pipelines — the jittable, shape-polymorphic core API.

TPU-native re-design of the reference feature layer
(speechsauce/src/feature.rs): every pipeline is a pure function of
``(signal, FeatureConfig)`` where the config is a hashable static argument;
under ``jax.jit`` the whole pipeline compiles to a handful of fused MXU GEMMs.
The default lowering never materializes the frame matrix: framing folds into
the DFT GEMMs via the chunk identity (``_chunk_gemm``), the DFT is trimmed to
the mel filterbank's support, frame energies come from Parseval columns in
the same GEMM, and large transforms use the Cooley-Tukey GEMM factorization
(ops/fft.py).  All functions accept arbitrary leading batch dimensions — the
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
import numpy as np

from .config import FeatureConfig
from .constants import constant_bundle
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


# ------------------------------------------------------- fast chunked path --
def _chunk_gemm(signal: jnp.ndarray, wall, n_frames: int, hop: int, precision,
                fuse: "bool | None" = None):
    """frames @ wall without materializing frames: hop-chunk the signal and
    contract against the (r*hop, D) wall.  Returns
    (chunks, result (..., n_frames, D)).

    Two lowerings, picked by MXU K-tile alignment (measured on v5e,
    exp/headline_breakdown_r03_results.txt); ``fuse`` overrides the rule
    (experiments only):

    * ``hop % 128 != 0`` (speechpy 20ms/10ms -> hop 160): ONE K=r*hop dot
      over materialized overlapping [chunk_f | chunk_{f+1} | ...] rows.
      Costs (r-1)x extra signal bytes but replaces r dots whose K=hop pads
      128-up badly (160 -> 256, 62% util) with one K=320 dot (-> 384, 83%);
      +16% on the headline MFCC end-to-end (0.462 -> 0.397 ms).
    * aligned hops (vorbis/librosa, hop 512): r shifted K=hop dots — already
      tile-exact, and the fused form would materialize r x signal bytes for
      no MXU win.
    """
    r = wall.shape[0] // hop
    wj = jnp.asarray(wall, signal.dtype)
    need = (n_frames + r - 1) * hop
    if need > signal.shape[-1]:
        pad = [(0, 0)] * (signal.ndim - 1) + [(0, need - signal.shape[-1])]
        signal = jnp.pad(signal, pad)
    ch = signal[..., :need].reshape(signal.shape[:-1] + (n_frames + r - 1, hop))
    if fuse is None:
        fuse = r > 1 and hop % 128 != 0
    if fuse and r > 1:
        big = jnp.concatenate(
            [ch[..., s : s + n_frames, :] for s in range(r)], axis=-1
        )
        return ch, jnp.matmul(big, wj, precision=precision)
    y = None
    for s in range(r):
        part = jnp.matmul(
            ch[..., s : s + n_frames, :], wj[s * hop : (s + 1) * hop],
            precision=precision,
        )
        y = part if y is None else y + part
    return ch, y


def _hoppad_frame_gemm(signal: jnp.ndarray, wall, n_frames: int, hop: int,
                       precision):
    """frames @ wall for a hop that does NOT divide the frame length
    (librosa 16 kHz production configs: n_fft=512, hop=160): zero-pad the
    wall's row count up to r = ceil(frame_len/hop) whole hops and ride the
    fused chunk-GEMM — frames then start on whole hop-chunks, so the big
    operand is r contiguous shifted slices and ONE K=r*hop MXU dot.  The
    extra K rows multiply samples past the frame with zero weight (+8%
    FLOPs at 512/160) but the framing stays gather-free.  Measured at
    512/160 (exp/frame_lowering_ab_r03_results.txt): 509k audio-s/s vs
    212k for a gcd-granularity strided-slice build of the exact K=frame_len
    operand (16 strided relayouts dominate), 198k for XLA gather framing,
    and 167k for the frames-layout Pallas kernel — bitwise-equal outputs."""
    fl = wall.shape[0]
    r = -(-fl // hop)
    wall_pad = np.zeros((r * hop, wall.shape[1]), dtype=np.asarray(wall).dtype)
    wall_pad[:fl] = wall
    _, y = _chunk_gemm(signal, wall_pad, n_frames, hop, precision, fuse=True)
    return y


def _stacked_fb(fbank: "np.ndarray", kmax: int, width: int, scale: float = 1.0):
    """Filterbank weights for projecting the *squared* [C_trim | S_trim | ...]
    DFT-GEMM output directly to mel: since
    ``mel_m = sum_k fb[m,k] * (xr_k^2 + xi_k^2) * scale``, the (M, K) bank is
    transposed, scaled, and duplicated over both the cos block (columns
    0..kmax) and the sin block (kmax..2*kmax); any extra columns (e.g. the
    Parseval w/±w energy terms) carry zero weight.  Squaring the GEMM output
    whole avoids Mosaic lane relayouts from slicing at the (unaligned) kmax
    offset — measured worth ~35% of headline runtime (docs/DESIGN.md).
    Assumes the unpadded wall layout (C at 0, S at kmax — i.e.
    ``chunk_gemm_wall`` without ``lane_align``)."""
    fb = fbank[:, :kmax].T * scale
    fb2 = np.zeros((width, fb.shape[1]))
    fb2[:kmax] = fb
    fb2[kmax : 2 * kmax] = fb
    return fb2


def _chunk_r(cfg: FeatureConfig) -> "int | None":
    """Shifted-slice count r = ceil(frame/hop) of the chunk-GEMM family, or
    ``None`` when the fusion does not apply: frames must span at least one
    hop (frame_size >= frame_step, also what the seq-parallel halo needs)
    and r is capped at 8 so the fused big operand stays a handful of
    contiguous chunk-row copies (a tiny hop like 512/40 -> r=13 loses to
    gather framing).  The single source of truth for the bound — consulted
    by :func:`_fast_path_ok`, :func:`_librosa_hoppad_ok` and the parallel
    layer (ADVICE r3 #3)."""
    fl, hop = cfg.frame_size, cfg.frame_step
    if fl < hop:
        return None
    r = -(-fl // hop)
    return r if r <= 8 else None


def _fast_path_ok(cfg: FeatureConfig) -> bool:
    """The chunk-GEMM lowering needs frames of a bounded number of whole
    hops (hop-misaligned frames ride a zero-row-padded wall — see
    constants.chunk_gemm_wall — with the shifted-slice count capped by
    :func:`_chunk_r`), an even fft size (for the Parseval Nyquist term)
    and the matmul DFT impl."""
    from .ops.spectrum import resolve_fft_impl

    return (
        cfg.frame_size <= cfg.fft_points  # frame>fft needs rfft truncation
        and _chunk_r(cfg) is not None
        and cfg.fft_points % 2 == 0
        and resolve_fft_impl(cfg) == "matmul"
    )


def _chunked_mel_energy(
    signal: jnp.ndarray, cfg: FeatureConfig, want_energy: bool,
    spectral_weight=None, n_frames: Optional[int] = None,
):
    """speechpy-nopad framed power spectrum -> mel projection without ever
    materializing the (F, frame_len) matrix, with the DFT trimmed to the
    filterbank's frequency support (constants: 'fbank_kmax').

    The framing identity: ``frames @ W == sum_s chunks[s:s+F] @ W_rowblock_s``
    for ``frame_len == r * hop``.  Exact frame energies (sum of |X|^2/N over
    all rFFT bins — including the trimmed ones) come from Parseval:
    ``sum_{k<=N/2} |X_k|^2 = (N * sum(x^2) + X_0^2 + X_{N/2}^2) / 2`` with
    ``X_0 = sum(x)`` and ``X_{N/2} = sum((-1)^n x)`` folded in as two extra
    GEMM columns.

    Returns (mel_feats, energies_or_None[, ssc_numerator]) where
    ``spectral_weight`` (a per-bin weight vector, e.g. SSC's frequency ramp)
    adds a second weighted mel projection.
    """

    from .constants import chunk_gemm_wall

    if cfg.preemphasis_cof:
        signal = _framing.preemphasis(signal, 1, cfg.preemphasis_cof)
    bundle = constant_bundle(cfg)
    kmax = bundle["fbank_kmax"]
    wd = chunk_gemm_wall(cfg, want_energy)
    fl = wd["fl"]
    hop = wd["hop"]
    r = wd["r"]
    n = cfg.fft_points
    t = signal.shape[-1]
    if n_frames is None:
        n_frames, _ = _framing.speechpy_frame_counts(t, fl, hop, zero_padding=False)
    m = cfg.num_filters
    if n_frames <= 0:
        shape = signal.shape[:-1] + (0, m)
        empty = jnp.zeros(shape, signal.dtype)
        e = jnp.zeros(signal.shape[:-1] + (0,), signal.dtype) if want_energy else None
        if spectral_weight is not None:
            return empty, e, empty
        return empty, e

    # combined GEMM matrix [C_trim | S_trim | w | ±w] (shared builder)
    ch, y = _chunk_gemm(signal, wd["wall"], n_frames, hop, cfg.precision)

    if spectral_weight is None:
        # project the squared GEMM output straight to mel (see _stacked_fb)
        fb2 = _stacked_fb(bundle["fbank"], kmax, wd["wall"].shape[1], 1.0 / n)
        feats = zero_handling(
            jnp.matmul(y * y, jnp.asarray(fb2, signal.dtype), precision=cfg.precision)
        )
        energies = None
        if want_energy:
            s0 = y[..., 2 * kmax]
            s1 = y[..., 2 * kmax + 1]
            energies = _parseval_energies(ch, s0, s1, wd, n, n_frames, cfg)
        return feats, energies

    # SSC branch: the zero-replacement on the power spectrum is per-bin, so
    # the power must materialize here (cold path — ssc only)
    xr = y[..., :kmax]
    xi = y[..., kmax : 2 * kmax]
    power = (xr * xr + xi * xi) * (1.0 / n)
    energies = None
    if want_energy:
        energies = _parseval_energies(
            ch, y[..., 2 * kmax], y[..., 2 * kmax + 1], wd, n, n_frames, cfg
        )
    eps = float(np.finfo(np.float64).eps)
    pz = jnp.where(power == 0.0, jnp.asarray(eps, power.dtype), power)
    # fold the spectral ramp into the weights: num = (pz*rw)@fbt == pz@(rw·fbt),
    # so numerator and denominator ride ONE (K, 2M) GEMM
    fbt64 = bundle["fbank"][:, :kmax].T
    both = jnp.asarray(
        np.concatenate([spectral_weight[:kmax, None] * fbt64, fbt64], axis=1),
        signal.dtype,
    )
    nd = jnp.matmul(pz, both, precision=cfg.precision)
    return nd[..., :m], energies, nd[..., m:]


def _parseval_energies(ch, s0, s1, wd, n, n_frames, cfg):
    """Exact frame energies from the Parseval identity (see
    :func:`_chunked_mel_energy`): sum of x^2*w^2 per frame via per-chunk
    reductions plus the s0/s1 boundary terms from the GEMM columns."""

    r = wd["r"]
    w2 = wd["w2"]  # (r, hop)
    if np.all(w2 == 1.0):
        # rect window: one fused square+reduce pass over the chunks
        # (identical grouping to the per-shift form: inner sum over the
        # hop axis, then shifts added in ascending order)
        cs2 = jnp.sum(ch * ch, axis=-1)  # (..., n_chunks)
        parts = [cs2[..., s : s + n_frames] for s in range(r)]
    else:
        # windowed: per-(chunk, shift) weighted sums as one tiny GEMM
        # (..., n_chunks, hop) @ (hop, r) instead of r full passes; pinned to
        # HIGHEST so energies stay full-precision regardless of cfg.precision
        # (the elementwise form it replaces was precision-independent)
        p = jnp.matmul(
            ch * ch, jnp.asarray(w2.T, ch.dtype),
            precision=jax.lax.Precision.HIGHEST,
        )
        parts = [p[..., s : s + n_frames, s] for s in range(r)]
    s2 = parts[0]
    for part in parts[1:]:
        s2 = s2 + part
    return zero_handling((n * s2 + s0 * s0 + s1 * s1) / (2.0 * n))


def mfe(signal: jnp.ndarray, cfg: FeatureConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mel filterbank energies + frame energies (feature.rs:200-233).

    (..., T) -> ((..., F, num_filters), (..., F))."""
    if _fast_path_ok(cfg):
        feats, energies = _chunked_mel_energy(signal, cfg, want_energy=True)
        return feats, energies
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
    if _speechpy_pallas_ok(cfg):
        return _mfcc_pallas_dispatch(signal, cfg)
    feats, energy = mfe(signal, cfg)
    feats = jnp.log(feats)
    out = dct2_ortho(feats, cfg)
    if cfg.dc_elimination:
        out = out.at[..., 0].set(jnp.log(energy))
    return out


def _speechpy_pallas_ok(cfg: FeatureConfig) -> bool:
    """Dispatch the fused speechpy-MFCC kernel (ops/pallas/speechpy_mfcc.py)
    — ``pallas="force"`` ONLY, never auto: the on-chip A/B lost (0.63x the
    XLA chunk-GEMM lowering on v5e, exp/fused_mfcc_ab_r04_results.txt; the
    measured fusion-winnable pot is ~3%).  The kernel's dots run at Mosaic
    HIGHEST (3-pass f32 ≈ precision "high"), so it is numerics-gated to
    the "high" default."""
    if cfg.pallas != "force" or cfg.dtype != "float32":
        return False
    if cfg.precision != "high":
        return False
    from .ops.pallas.speechpy_mfcc import mfcc_pallas_supported

    return mfcc_pallas_supported(cfg)


def ssc(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Spectral subband centroids (README.md:15 promise; SURVEY C24):
    (..., T) -> (..., F, num_filters), centroids in Hz."""
    if _fast_path_ok(cfg):

        ramp = np.linspace(1.0, cfg.sample_rate / 2.0, cfg.freq_size)
        num, _, den = _chunked_mel_energy(
            signal, cfg, want_energy=False, spectral_weight=ramp
        )
        return num / den
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
    from .ops.spectrum import resolve_fft_impl

    if cfg.window != "vorbis":
        cfg = cfg.replace(window="vorbis")
    if resolve_fft_impl(cfg) == "matmul":
        # gather-free lowering (measured 2.3x the frame-gather form): the
        # streaming frames are hop-strided windows of the left-padded signal
        # (analysis_mem = fft_points - hop zeros), so zero-padding the
        # [C_trim | S_trim] wall rows up to a hop multiple makes the whole
        # STFT one shifted-chunk GEMM; the squared output projects through
        # the stacked filterbank with wnorm^2 folded in (shared constant:
        # constants.vorbis_chunk_wall)
        from .constants import vorbis_chunk_wall

        vw = vorbis_chunk_wall(cfg)
        hop = vw["hop"]
        n_frames = -(-signal.shape[-1] // hop)
        pad = [(0, 0)] * (signal.ndim - 1) + [(cfg.fft_points - hop, 0)]
        x = jnp.pad(signal, pad)
        _, y = _chunk_gemm(x, vw["wall"], n_frames, hop, cfg.precision)
        fb2 = jnp.asarray(vw["fb2"], signal.dtype)
        mel = jnp.matmul(y * y, fb2, precision=cfg.precision)
        mel = _stft._apply_npad_layout(mel, cfg)
        return jnp.swapaxes(mel, -1, -2)
    power = _stft.stft_vorbis_power(signal, cfg)
    return mel_project_time_major(power, cfg)


# --------------------------------------------------------- librosa pipeline --
def mel_spectrogram_librosa(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """librosa-compatible mel spectrogram: (..., T) -> (..., n_mels, frames)
    (BASELINE.json config 2).  Build ``cfg`` with
    :func:`mfcc_rust_tpu.config.librosa_config`."""
    n = cfg.fft_points
    hop = cfg.frame_step
    if cfg.frame_size != n:
        # librosa has no frame length distinct from n_fft: frames are always
        # n_fft samples; shorter analysis windows go through win_length
        # (center-padded to n_fft).  A speechpy-style frame_size here would
        # silently change the frame count, so reject it loudly (ADVICE r1).
        raise ValueError(
            f"mel_spectrogram_librosa frames by fft_points={n}, but "
            f"cfg.frame_size={cfg.frame_size}; build the config with "
            "librosa_config() (use win_length for short analysis windows)"
        )
    if _librosa_pallas_ok(cfg):
        return _mel_librosa_pallas(signal, cfg)
    if _librosa_ct_ok(cfg):
        return _librosa_ct_mel(signal, cfg)
    use_fast = _fast_path_ok(cfg) and cfg.frame_size == n and n % hop == 0
    if use_fast or _librosa_hoppad_ok(cfg):
        if cfg.center:
            pad = [(0, 0)] * (signal.ndim - 1) + [(n // 2, n // 2)]
            signal = jnp.pad(signal, pad, mode=cfg.pad_mode)
        count = 1 + (signal.shape[-1] - n) // hop
        if count > 0:
            bundle = constant_bundle(cfg)
            kmax = bundle["fbank_kmax"]
            c64, s64 = bundle["dft_windowed"]

            wall = np.concatenate([c64[:, :kmax], s64[:, :kmax]], axis=1)
            if use_fast:
                _, y = _chunk_gemm(signal, wall, count, hop, cfg.precision)
            else:
                # hop does not divide n_fft (512/160 production frontends):
                # hop-padded wall + fused chunk GEMM (no gather)
                y = _hoppad_frame_gemm(signal, wall, count, hop,
                                       cfg.precision)
            if cfg.power == 2.0:
                # squared-output projection, librosa: no 1/N scaling
                fb2 = _stacked_fb(bundle["fbank"], kmax, 2 * kmax)
                mel = jnp.matmul(
                    y * y, jnp.asarray(fb2, signal.dtype), precision=cfg.precision
                )
                return jnp.swapaxes(mel, -1, -2)
            xr, xi = y[..., :kmax], y[..., kmax:]
            power = (xr * xr + xi * xi) ** (cfg.power / 2.0)
            fbt = jnp.asarray(bundle["fbank"][:, :kmax].T, signal.dtype)
            mel = jnp.matmul(power, fbt, precision=cfg.precision)
            return jnp.swapaxes(mel, -1, -2)
    power = _stft.stft_framed(signal, cfg, framing_style="librosa", return_power=True)
    return mel_project_time_major(power, cfg)


def _librosa_hoppad_ok(cfg: FeatureConfig) -> bool:
    """Dispatch :func:`_hoppad_frame_gemm` for the librosa mel fast tail:
    matmul DFT impl and a hop that does NOT divide the frame, with the
    shifted-slice count bounded by :func:`_chunk_r` (512/160 or 512/130 ->
    r=4; a tiny hop like 40 -> r=13 falls back to gather framing)."""
    from .ops.spectrum import resolve_fft_impl

    if resolve_fft_impl(cfg) != "matmul" or cfg.fft_points % 2:
        return False
    if cfg.frame_size % cfg.frame_step == 0:
        return False
    return _chunk_r(cfg) is not None


def _librosa_pallas_ok(cfg: FeatureConfig) -> bool:
    """Dispatch the fused Pallas CT mel kernel (ops/pallas/ct_mel.py):
    qualifying config + "auto" on the TPU backend (or "force" anywhere —
    interpret mode off-TPU, for tests).  The kernel is its own FFT
    implementation (it carries the CT factorization internally), so it only
    defers to an EXPLICIT fft_impl="fft" request — under "auto"/"matmul"/"ct"
    it takes any config it supports (512-point production frontends included,
    where resolve_fft_impl would pick the direct matmul for the XLA path)."""
    if cfg.pallas == "off" or cfg.dtype != "float32":  # kernel is f32-only
        return False
    if cfg.fft_impl == "fft":
        return False
    from .ops.pallas.ct_mel import _chunk_layout_ok, pallas_ct_supported

    if not pallas_ct_supported(cfg):
        return False
    if cfg.pallas == "force":
        return True
    # "auto" dispatches only the zero-copy CHUNKED layout: the frames-input
    # layout (hop % n1 != 0, e.g. 512/160 or 512/130 16 kHz frontends) is
    # correct but measured ~0.78x the XLA lowering on-chip (the strided
    # frame gather XLA prepends costs more than the kernel's VMEM fusion
    # recovers; exp/frames_layout_ab_r03_results.txt), so those configs take
    # the faster XLA path; the kernel remains reachable via pallas="force".
    if not _chunk_layout_ok(cfg):
        return False
    return jax.default_backend() == "tpu"


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(1,))
def _mel_librosa_pallas(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Kernel forward with an XLA backward: pallas_call has no autodiff
    rule, so the VJP recomputes through the (mathematically identical) XLA
    CT lowering — keeping the pipeline differentiable end to end."""
    from .ops.pallas.ct_mel import ct_mel_pallas

    return jnp.swapaxes(ct_mel_pallas(signal, cfg), -1, -2)


def _mel_librosa_pallas_fwd(signal, cfg):
    return _mel_librosa_pallas(signal, cfg), signal


def _mel_librosa_pallas_bwd(cfg, signal, g):
    # recompute through the mathematically-identical XLA lowering for the
    # config (CT when it qualifies, direct/gather otherwise — kernel configs
    # like 512/160 have no XLA CT twin)
    _, vjp = jax.vjp(
        lambda s: mel_spectrogram_librosa(s, cfg.replace(pallas="off")),
        signal,
    )
    return vjp(g)


_mel_librosa_pallas.defvjp(_mel_librosa_pallas_fwd, _mel_librosa_pallas_bwd)


@_partial(jax.custom_vjp, nondiff_argnums=(1,))
def _mfcc_pallas_dispatch(signal: jnp.ndarray, cfg: FeatureConfig):
    """Fused speechpy-MFCC kernel forward with an XLA backward (same pattern
    as _mel_librosa_pallas: pallas_call has no autodiff rule, so the VJP
    recomputes through the mathematically-identical XLA chunk-GEMM path)."""
    from .ops.pallas.speechpy_mfcc import mfcc_pallas

    x = signal
    if cfg.preemphasis_cof:
        x = _framing.preemphasis(x, 1, cfg.preemphasis_cof)
    return mfcc_pallas(x, cfg)


def _mfcc_pallas_fwd(signal, cfg):
    return _mfcc_pallas_dispatch(signal, cfg), signal


def _mfcc_pallas_bwd(cfg, signal, g):
    _, vjp = jax.vjp(lambda s: mfcc(s, cfg.replace(pallas="off")), signal)
    return vjp(g)


_mfcc_pallas_dispatch.defvjp(_mfcc_pallas_fwd, _mfcc_pallas_bwd)


def _librosa_ct_ok(cfg: FeatureConfig) -> bool:
    from .ops.fft import good_factorization
    from .ops.spectrum import resolve_fft_impl

    if resolve_fft_impl(cfg) != "ct" or cfg.frame_size != cfg.fft_points:
        return False
    if cfg.power != 2.0:
        return False
    f = good_factorization(cfg.fft_points)
    if f is None:
        return False
    n1, _ = f
    hop = cfg.frame_step
    return cfg.fft_points % hop == 0 and hop % n1 == 0


def _librosa_ct_mel(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Gather-free librosa mel spectrogram for large transforms: chunk-view
    framing straight into the Cooley-Tukey (N2, N1) plane, CT GEMM stages
    with the mel filterbank bin-permuted onto the CT output layout — no
    frame gather, no spectrum transpose (see ops/fft.py)."""
    from .ops.fft import ct_power_project, good_factorization, permute_weights_for_ct

    n = cfg.fft_points
    hop = cfg.frame_step
    n1, n2 = good_factorization(n)
    if cfg.center:
        pad = [(0, 0)] * (signal.ndim - 1) + [(n // 2, n // 2)]
        signal = jnp.pad(signal, pad, mode=cfg.pad_mode)
    t = signal.shape[-1]
    count = 1 + (t - n) // hop
    if count <= 0:
        return jnp.zeros(signal.shape[:-1] + (cfg.num_filters, 0), signal.dtype)
    r = n // hop
    rows = hop // n1  # chunk rows of n1 samples
    need = (count + r - 1) * hop
    if need > t:
        signal = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(0, need - t)])
    ch = signal[..., :need].reshape(signal.shape[:-1] + (count + r - 1, rows, n1))
    frames = jnp.concatenate(
        [ch[..., s : s + count, :, :] for s in range(r)], axis=-2
    )  # (..., count, N2, N1); frame row n2 = s*rows + q matches n = n1 + N1*n2

    bundle = constant_bundle(cfg)
    win = jnp.asarray(bundle["window"].reshape(n2, n1), signal.dtype)
    frames = frames * win
    fbp = jnp.asarray(
        permute_weights_for_ct(bundle["fbank"], n, (n1, n2)).T, signal.dtype
    )
    mel = ct_power_project(frames, n, n1, n2, fbp, cfg.precision)
    return jnp.swapaxes(mel, -1, -2)


def log_mel_spectrogram(signal: jnp.ndarray, cfg: FeatureConfig,
                        ref: float = 1.0, top_db: Optional[float] = 80.0) -> jnp.ndarray:
    """librosa ``power_to_db(melspectrogram)``."""
    return power_to_db(mel_spectrogram_librosa(signal, cfg), ref=ref, top_db=top_db)


def mfcc_librosa(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """librosa-compatible MFCC: DCT-II(ortho) over log-mel, (..., n_mfcc,
    frames).  Internally frame-major so the mel pipeline's output feeds the
    DCT GEMM without a transpose round-trip; the single mel<->time swap
    happens once at the end."""
    s = jnp.swapaxes(mel_spectrogram_librosa(signal, cfg), -1, -2)  # (..., T, M)
    s = power_to_db(s)
    coeffs = dct2_ortho(s, cfg)
    return jnp.swapaxes(coeffs, -1, -2)


# ------------------------------------------------------- multi-feature pass --
def extract(signal: jnp.ndarray, cfg: FeatureConfig,
            which: Tuple[str, ...] = ("mfcc",)) -> dict:
    """Compute several speechpy-family features in ONE frontend pass.

    Production suites often want MFCC + log-FBE + SSC together; calling the
    individual pipelines repeats the chunked DFT GEMM per feature.  Here the
    [C|S|w|±w] chunk-GEMM, the Parseval energies and the log-mel run once and
    every requested feature reads from them.  ``which`` ⊆ {"mfcc", "lmfe",
    "mfe", "ssc", "energy"}; returns a dict (``"mfe"`` maps to the
    (features, energies) pair, matching :func:`mfe`)."""
    valid = {"mfcc", "lmfe", "mfe", "ssc", "energy"}
    unknown = set(which) - valid
    if unknown:
        raise ValueError(f"unknown features {sorted(unknown)}; valid: {sorted(valid)}")
    want = set(which)
    if not _fast_path_ok(cfg):
        out = {}
        if want & {"mfcc", "lmfe", "mfe", "energy"}:
            feats, energies = mfe(signal, cfg)
            if "mfe" in want:
                out["mfe"] = (feats, energies)
            if "energy" in want:
                out["energy"] = energies
            if want & {"mfcc", "lmfe"}:
                logm = jnp.log(feats)
                if "lmfe" in want:
                    out["lmfe"] = logm
                if "mfcc" in want:
                    coeffs = dct2_ortho(logm, cfg)
                    if cfg.dc_elimination:
                        coeffs = coeffs.at[..., 0].set(jnp.log(energies))
                    out["mfcc"] = coeffs
        if "ssc" in want:
            out["ssc"] = ssc(signal, cfg)
        return out

    from .constants import chunk_gemm_wall

    x = signal
    if cfg.preemphasis_cof:
        x = _framing.preemphasis(x, 1, cfg.preemphasis_cof)
    bundle = constant_bundle(cfg)
    kmax = bundle["fbank_kmax"]
    need_energy = bool(want & {"mfe", "energy"}) or (
        "mfcc" in want and cfg.dc_elimination
    )
    wd = chunk_gemm_wall(cfg, need_energy)
    n = cfg.fft_points
    m = cfg.num_filters
    n_frames, _ = _framing.speechpy_frame_counts(
        x.shape[-1], wd["fl"], wd["hop"], zero_padding=False
    )
    if n_frames <= 0:
        empty2 = jnp.zeros(x.shape[:-1] + (0, m), x.dtype)
        empty1 = jnp.zeros(x.shape[:-1] + (0,), x.dtype)
        out = {}
        if "mfcc" in want:
            out["mfcc"] = jnp.zeros(x.shape[:-1] + (0, cfg.num_cepstral), x.dtype)
        for k in ("lmfe", "ssc"):
            if k in want:
                out[k] = empty2
        if "mfe" in want:
            out["mfe"] = (empty2, empty1)
        if "energy" in want:
            out["energy"] = empty1
        return out

    ch, y = _chunk_gemm(x, wd["wall"], n_frames, wd["hop"], cfg.precision)
    return _extract_heads(ch, y, wd, bundle, cfg, want, n_frames, need_energy)


def _extract_heads(ch, y, wd, bundle, cfg: FeatureConfig, want, n_frames: int,
                   need_energy: bool) -> dict:
    """Per-feature heads over one shared chunk-GEMM output (see
    :func:`extract`).  Also the shard-local body of the multi-feature
    distributed :func:`mfcc_rust_tpu.parallel.extraction_step`."""
    kmax = bundle["fbank_kmax"]
    n = cfg.fft_points
    m = cfg.num_filters
    dt = y.dtype
    energies = None
    if need_energy:
        energies = _parseval_energies(
            ch, y[..., 2 * kmax], y[..., 2 * kmax + 1], wd, n, n_frames, cfg
        )
    out = {}
    if want & {"mfcc", "lmfe", "mfe"}:
        fb2 = _stacked_fb(bundle["fbank"], kmax, wd["wall"].shape[1], 1.0 / n)
        mel = zero_handling(
            jnp.matmul(y * y, jnp.asarray(fb2, dt), precision=cfg.precision)
        )
        if "mfe" in want:
            out["mfe"] = (mel, energies)
        if want & {"mfcc", "lmfe"}:
            logm = jnp.log(mel)
            if "lmfe" in want:
                out["lmfe"] = logm
            if "mfcc" in want:
                coeffs = dct2_ortho(logm, cfg)
                if cfg.dc_elimination:
                    coeffs = coeffs.at[..., 0].set(jnp.log(energies))
                out["mfcc"] = coeffs
    if "energy" in want:
        out["energy"] = energies
    if "ssc" in want:
        # per-bin eps substitution needs the power spectrum (see
        # _chunked_mel_energy's SSC branch) — reuse this pass's y
        xr = y[..., :kmax]
        xi = y[..., kmax : 2 * kmax]
        power = (xr * xr + xi * xi) * (1.0 / n)
        eps = float(np.finfo(np.float64).eps)
        pz = jnp.where(power == 0.0, jnp.asarray(eps, power.dtype), power)
        ramp = np.linspace(1.0, cfg.sample_rate / 2.0, cfg.freq_size)
        fbt64 = bundle["fbank"][:, :kmax].T
        both = jnp.asarray(
            np.concatenate([ramp[:kmax, None] * fbt64, fbt64], axis=1), dt
        )
        nd = jnp.matmul(pz, both, precision=cfg.precision)
        out["ssc"] = nd[..., :m] / nd[..., m:]
    return out


# ----------------------------------------------------------------- batching --
def vmapped(fn, in_axes=0):
    """Convenience: vmap a pipeline over a batch axis (the general form of
    the reference's hand-written 2-D variants)."""
    return jax.vmap(fn, in_axes=(in_axes, None))
