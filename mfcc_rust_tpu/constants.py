"""Trace-time constant builders (pure numpy, float64 precompute).

These replace the reference's precomputed compute state — the vorbis window
(config.rs:156-160), the memoized mel filterbank (feature.rs:19-90), and the
FFT/DCT plans (config.rs:161-166) — with plain arrays that are closed over by
jitted functions and become replicated XLA constants on every chip.

Everything is computed in float64 and cast at the call site; this is what makes
rtol=1e-5 parity against float64 references achievable in a float32 pipeline.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import numpy as np


# ------------------------------------------------------------------ windows --
def hann_window(n: int, periodic: bool = True) -> np.ndarray:
    """Hann window; ``periodic=True`` matches scipy ``fftbins=True`` /
    librosa's default STFT window."""
    if n == 1:
        return np.ones(1)
    denom = n if periodic else n - 1
    i = np.arange(n, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * i / denom)


def hamming_window(n: int, periodic: bool = True) -> np.ndarray:
    if n == 1:
        return np.ones(1)
    denom = n if periodic else n - 1
    i = np.arange(n, dtype=np.float64)
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * i / denom)


def povey_window(n: int) -> np.ndarray:
    """Kaldi's "povey" window: hann(symmetric)**0.85."""
    i = np.arange(n, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * i / (n - 1))) ** 0.85


def vorbis_window(n_fft: int) -> np.ndarray:
    """The reference's streaming analysis window (config.rs:156-160):
    ``w[i] = sin(pi/2 * sin(pi/2 * (i+0.5)/(N/2))^2)`` over the full fft
    length."""
    nh = n_fft // 2
    i = np.arange(n_fft, dtype=np.float64)
    s = np.sin(0.5 * np.pi * (i + 0.5) / nh)
    return np.sin(0.5 * np.pi * s * s)


def window_array(name: str, win_length: int, n_fft: Optional[int] = None) -> np.ndarray:
    """Build a window of ``win_length`` samples, center-padded to ``n_fft``
    when given (librosa semantics for win_length < n_fft)."""
    if name == "rect":
        w = np.ones(win_length, dtype=np.float64)
    elif name == "hann":
        w = hann_window(win_length)
    elif name == "hamming":
        w = hamming_window(win_length)
    elif name == "povey":
        w = povey_window(win_length)
    elif name == "vorbis":
        # the vorbis window is defined over the fft length, not the frame
        return vorbis_window(n_fft if n_fft is not None else win_length)
    else:
        raise ValueError(f"unknown window {name!r}")
    if n_fft is not None and n_fft > win_length:
        w = pad_center(w, n_fft)
    return w


def pad_center(w: np.ndarray, size: int) -> np.ndarray:
    """librosa-style center pad of a 1-D window (util.rs:40-63's intent).
    numpy trace-time twin of :func:`mfcc_rust_tpu.utils.padding.pad_center`
    (the jit-safe jnp version) — keep their behavior aligned."""
    if size < len(w):
        raise ValueError(f"target size {size} < input size {len(w)}")
    lpad = (size - len(w)) // 2
    out = np.zeros(size, dtype=w.dtype)
    out[lpad : lpad + len(w)] = w
    return out


# ---------------------------------------------------------------- mel scale --
def hz_to_mel(f, scale: str = "speechpy"):
    """Hz -> mel.  ``speechpy`` is the natural-log HTK form used by the
    reference (functions.rs:19-28); ``htk`` the log10 form; ``slaney`` the
    librosa default piecewise-linear/log scale."""
    f = np.asarray(f, dtype=np.float64)
    if scale == "speechpy":
        return 1127.0 * np.log(1.0 + f / 700.0)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    if scale == "slaney":
        f_sp = 200.0 / 3.0
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        lin = f / f_sp
        return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-30) / min_log_hz) / logstep, lin)
    raise ValueError(f"unknown mel scale {scale!r}")


def mel_to_hz(m, scale: str = "speechpy"):
    m = np.asarray(m, dtype=np.float64)
    if scale == "speechpy":
        return 700.0 * (np.exp(m / 1127.0) - 1.0)
    if scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    if scale == "slaney":
        f_sp = 200.0 / 3.0
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        lin = f_sp * m
        return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), lin)
    raise ValueError(f"unknown mel scale {scale!r}")


# -------------------------------------------------------------- filterbanks --
def speechpy_filterbanks(
    num_filter: int,
    coefficients: int,
    sample_rate: int,
    low_freq: float = 0.0,
    high_freq: Optional[float] = None,
    mel_scale: str = "speechpy",
) -> np.ndarray:
    """speechpy/reference-compatible mel filterbank, shape
    ``(num_filter, coefficients)`` (feature.rs:36-90).

    Reproduces the integer bin-edge quirk ``floor((coefficients+1)*hz/fs)``
    (feature.rs:69-70) — note *coefficients*, not fft_points, so the bank only
    spans the lower half of the spectrum, exactly as speechpy does — and the
    triangle boundary rule where the apex takes the falling-edge value
    (functions.rs:43-60).
    """
    fs = float(sample_rate)
    high_freq = fs / 2.0 if high_freq is None else float(high_freq)
    if high_freq > fs / 2.0 + 1e-9:
        raise ValueError(
            "High frequency cannot be greater than half of the sampling frequency!"
        )
    if low_freq < 0.0:
        raise ValueError("low frequency cannot be less than zero!")

    mels = np.linspace(
        hz_to_mel(low_freq, mel_scale), hz_to_mel(high_freq, mel_scale), num_filter + 2
    )
    hertz = mel_to_hz(mels, mel_scale)
    # NOTE float32 parity: the reference computes the mel spacing in f32
    # (functions.rs uses f32 throughout), so an f64 bin index can land on the
    # other side of floor().  Replicate by computing the index input in f32.
    freq_index = (
        ((coefficients + 1) * hertz.astype(np.float32) / np.float32(fs))
        .astype(np.float64)
    )
    freq_index = np.floor(freq_index).astype(np.int64)

    fbank = np.zeros((num_filter, coefficients), dtype=np.float64)
    for i in range(num_filter):
        left, middle, right = freq_index[i], freq_index[i + 1], freq_index[i + 2]
        for j in range(left, min(right, coefficients)):
            # reference: (left..right).contains(x); both branches may fire at
            # the apex and the falling edge wins (functions.rs:49-54)
            if j <= middle and middle != left:
                fbank[i, j] = (j - left) / float(middle - left)
            if middle <= j and right != middle:
                fbank[i, j] = (right - j) / float(right - middle)
    return fbank


def librosa_filterbanks(
    num_filter: int,
    n_fft: int,
    sample_rate: int,
    low_freq: float = 0.0,
    high_freq: Optional[float] = None,
    mel_scale: str = "slaney",
    norm: Optional[str] = "slaney",
) -> np.ndarray:
    """librosa-compatible mel filterbank, shape ``(num_filter, 1+n_fft//2)``:
    float (non-quantized) triangles on rFFT bin frequencies with optional
    Slaney area normalization."""
    fs = float(sample_rate)
    high_freq = fs / 2.0 if high_freq is None else float(high_freq)
    n_freq = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, fs / 2.0, n_freq)
    mels = np.linspace(
        hz_to_mel(low_freq, mel_scale), hz_to_mel(high_freq, mel_scale), num_filter + 2
    )
    mel_f = mel_to_hz(mels, mel_scale)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : num_filter + 2] - mel_f[:num_filter])
        weights *= enorm[:, None]
    elif norm is not None:
        raise ValueError(f"unknown fbank norm {norm!r}")
    return weights


# ---------------------------------------------------------------- DCT / DFT --
def dct_matrix(n: int, n_out: Optional[int] = None, norm: str = "ortho") -> np.ndarray:
    """DCT-II as an ``(n, n_out)`` matrix so that ``x @ D == dct(x)[:n_out]``.

    Implements the *correct* scipy ``dct(type=2, norm='ortho')`` scaling the
    reference intends but gets wrong (feature.rs:126-131: it uses the total
    element count and rescales only element [0,0]).  Truncating to ``n_out``
    columns (num_cepstral) turns the DCT into a skinny MXU matmul.
    """
    n_out = n if n_out is None else n_out
    k = np.arange(n_out, dtype=np.float64)[None, :]
    i = np.arange(n, dtype=np.float64)[:, None]
    d = 2.0 * np.cos(np.pi * k * (2.0 * i + 1.0) / (2.0 * n))
    if norm == "ortho":
        scale = np.full((1, n_out), math.sqrt(1.0 / (2.0 * n)))
        if n_out > 0:
            scale[0, 0] = math.sqrt(1.0 / (4.0 * n))
        d = d * scale
    elif norm is not None:
        raise ValueError(f"unknown dct norm {norm!r}")
    return d


def idct_matrix(n: int, n_in: Optional[int] = None) -> np.ndarray:
    """Orthonormal DCT-III (inverse of :func:`dct_matrix` with ortho norm),
    shape ``(n_in, n)``; used for inverse-cepstrum utilities."""
    return dct_matrix(n, n_in).T


def rdft_matrices(
    n_fft: int,
    frame_len: Optional[int] = None,
    window: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT as two ``(frame_len, n_fft//2+1)`` matrices (cos, -sin) so
    that ``X = frames @ C + 1j * frames @ S`` equals ``rfft(frames * w,
    n_fft)``.

    This is the TPU-native replacement for realfft/ndrustfft plans
    (config.rs:161-166): a 512-point rFFT over thousands of frames is a pair
    of skinny GEMMs that the MXU executes at full tilt, with the analysis
    window folded into the matrix for free.
    """
    frame_len = n_fft if frame_len is None else frame_len
    n_freq = n_fft // 2 + 1
    n_arr = np.arange(frame_len, dtype=np.float64)[:, None]
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n_arr * k / n_fft
    c = np.cos(ang)
    s = -np.sin(ang)
    if window is not None:
        w = np.asarray(window, dtype=np.float64)[:frame_len, None]
        c = c * w
        s = s * w
    return c, s


# ----------------------------------------------------------- config bundles --
@functools.lru_cache(maxsize=64)
def _bundle_cached(cfg) -> dict:
    from .config import FeatureConfig  # local import to avoid cycle

    assert isinstance(cfg, FeatureConfig)
    out = {}
    n_fft = cfg.fft_points
    if cfg.fbank_style == "speechpy":
        fb = speechpy_filterbanks(
            cfg.num_filters,
            cfg.freq_size,
            cfg.sample_rate,
            cfg.low_frequency,
            cfg.resolved_high_frequency,
            mel_scale=cfg.mel_scale,
        )
    elif cfg.fbank_style == "librosa":
        fb = librosa_filterbanks(
            cfg.num_filters,
            n_fft,
            cfg.sample_rate,
            cfg.low_frequency,
            cfg.resolved_high_frequency,
            mel_scale=cfg.mel_scale,
            norm=cfg.fbank_norm,
        )
    else:
        raise ValueError(f"unknown fbank_style {cfg.fbank_style!r}")
    out["fbank"] = fb

    # Window + framed-frame length.  Three framing regimes:
    #  * vorbis/streaming: frames are fft_points long, vorbis window over the
    #    full frame (functions.rs:134-151).
    #  * centered (librosa): frames are fft_points long, window of win_length
    #    center-padded to fft_points.
    #  * speechpy: frames are frame_size long, window applied per frame, the
    #    rFFT right-zero-pads to fft_points (processing.rs:148-156) — folded
    #    into the DFT matrix by truncating its rows to frame_size.
    if cfg.window == "vorbis":
        frame_len = n_fft
        win = vorbis_window(n_fft)
    elif cfg.center:
        frame_len = n_fft
        win = window_array(cfg.window, cfg.win_length, n_fft)
    else:
        frame_len = min(cfg.frame_size, n_fft)
        win = window_array(cfg.window, min(cfg.win_length, frame_len))
        if len(win) < frame_len:
            if frame_len == n_fft:
                # librosa-style full-fft frames: center-pad the window even
                # uncentered (librosa pads win_length < n_fft symmetrically)
                win = pad_center(win, frame_len)
            else:  # speechpy-style: window spans the frame; right-pad
                win = np.concatenate([win, np.zeros(frame_len - len(win))])
    out["window"] = win
    out["frame_len"] = frame_len
    out["dct"] = dct_matrix(cfg.num_filters, cfg.num_cepstral)
    out["dct_full"] = dct_matrix(cfg.num_filters, cfg.num_filters)
    # DFT matmul constants: plain (no window folded) and windowed variants.
    out["dft"] = rdft_matrices(n_fft, frame_len)
    out["dft_windowed"] = rdft_matrices(n_fft, frame_len, win)
    # Frequency support of the filterbank: speechpy's (K+1)-quirk banks span
    # only the lower half-spectrum (feature.rs:69-70), so the DFT GEMM can be
    # trimmed to the last bin any mel filter touches — ~2x fewer FLOPs on the
    # hot path (mel projection cannot see the dropped bins).
    nonzero_cols = np.nonzero(fb.any(axis=0))[0]
    out["fbank_kmax"] = int(nonzero_cols[-1]) + 1 if len(nonzero_cols) else fb.shape[1]
    return out


def constant_bundle(cfg) -> dict:
    """All precomputed float64 constants for a config (memoized — the
    functional analogue of the reference's ``cached`` filterbank store,
    feature.rs:19-23)."""
    return _bundle_cached(cfg)


def chunk_gemm_wall(cfg, want_energy: bool, lane_align: Optional[int] = None) -> dict:
    """The combined per-shift GEMM constant shared by the chunked fast paths
    (features._chunked_mel_energy and the Pallas fused kernel — single
    source of truth so the two lowerings cannot desynchronize):

    columns ``[C_trim | S_trim (| w | ±w)]`` where C/S are the windowed DFT
    matrices trimmed to the filterbank support and the optional w/±w columns
    are the Parseval frame-energy terms.  With ``lane_align`` the C and S
    column groups are zero-padded to that multiple (TPU lane alignment for
    in-kernel slicing) and the total width padded likewise.

    Returns dict(wall (r*hop, W) float64, kmax, kpad, r, fl, hop, w, w2) where
    xr = out[..., :kpad], xi = out[..., kpad:2*kpad], and when want_energy
    s0 = out[..., 2*kpad], s1 = out[..., 2*kpad+1]; w2 is the squared window
    reshaped (r, hop) for the sum-of-squares Parseval term.
    """
    bundle = constant_bundle(cfg)
    kmax = bundle["fbank_kmax"]
    c64, s64 = bundle["dft_windowed" if cfg.window != "rect" else "dft"]
    win = bundle["window"]
    fl = c64.shape[0]
    hop = cfg.frame_step
    if fl < hop:
        raise ValueError(f"chunked lowering requires frame {fl} >= hop {hop}")
    # hop-misaligned frames (e.g. 25 ms / 10 ms -> 400/160): zero-pad the
    # wall rows up to r = ceil(fl/hop) whole hops so frames still start on
    # whole chunks — the extra rows multiply out-of-frame samples by zero
    # weight (exact; +r*hop/fl - 1 GEMM FLOPs).  w2's padded tail rows are
    # zero too, so the Parseval energy term is unchanged.
    r = -(-fl // hop)
    fl_pad = r * hop

    def _align(x: int) -> int:
        return x if lane_align is None else ((x + lane_align - 1) // lane_align) * lane_align

    kpad = _align(kmax)
    c = np.zeros((fl_pad, kpad))
    s = np.zeros((fl_pad, kpad))
    c[:fl, :kmax] = c64[:, :kmax]
    s[:fl, :kmax] = s64[:, :kmax]
    cols = [c, s]
    w = win[:fl] if cfg.window != "rect" else np.ones(fl)
    wp = np.zeros(fl_pad)
    wp[:fl] = w
    if want_energy:
        alt = wp * ((-1.0) ** np.arange(fl_pad))
        cols += [wp[:, None], alt[:, None]]
    wall = np.concatenate(cols, axis=1)
    if lane_align is not None and wall.shape[1] % lane_align:
        wall = np.pad(wall, [(0, 0), (0, _align(wall.shape[1]) - wall.shape[1])])
    return {
        "wall": wall, "kmax": kmax, "kpad": kpad, "r": r, "fl": fl,
        "hop": hop, "w": w, "w2": (wp * wp).reshape(r, hop),
    }


@functools.lru_cache(maxsize=64)
def vorbis_chunk_wall(cfg) -> dict:
    """The gather-free vorbis-STFT chunk-GEMM constant (single source of
    truth for features.mel_spectrogram and the seq-sharded
    parallel.data._local_melspec — same rationale as chunk_gemm_wall):
    ``[C_trim | S_trim]`` windowed-DFT columns with rows zero-padded to a
    stream-hop multiple, so hop-strided streaming frames reduce to shifted
    chunk GEMMs (the zero rows multiply the window overhang exactly to
    zero), plus the filterbank stacked over both blocks with wnorm^2 folded
    in.  Returns dict(wall (r*hop, 2*kmax), fb2 (2*kmax, M), r, hop)."""
    bundle = constant_bundle(cfg)
    kmax = bundle["fbank_kmax"]
    c64, s64 = bundle["dft_windowed"]
    hop = cfg.stream_hop
    n = cfg.fft_points
    wall = np.concatenate([c64[:, :kmax], s64[:, :kmax]], axis=1)
    rows = math.ceil(n / hop) * hop
    wall = np.pad(wall, [(0, rows - n), (0, 0)])
    w2 = cfg.wnorm * cfg.wnorm
    fb = bundle["fbank"][:, :kmax].T * w2
    fb2 = np.concatenate([fb, fb], axis=0)
    return {"wall": wall, "fb2": fb2, "r": rows // hop, "hop": hop}
