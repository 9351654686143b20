"""rFFT magnitude / power / log-power spectra.

TPU-native replacement for ``fft_spectrum`` / ``power_spectrum`` /
``log_power_spectrum`` (speechsauce/src/processing.rs:143-214).  Two lowering
strategies:

* ``matmul`` — the real DFT as two skinny GEMMs against precomputed cos/-sin
  constants (:func:`mfcc_rust_tpu.constants.rdft_matrices`).  For the small
  batched FFTs of speech frontends (512-2048 points over thousands of frames)
  this keeps the whole pipeline on the MXU and fuses with the downstream mel
  matmul; zero-padding is free (matrix rows are truncated to the frame
  length) and the analysis window folds into the matrix.
* ``fft`` — XLA's native ``jnp.fft.rfft`` for large transforms.

Semantics notes (SURVEY §4): power includes the square (``|X|^2 / N``,
speechpy-correct — the reference dropped it, bug #1) and log-power
normalization subtracts the true max (bug #4 fixed).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import FeatureConfig
from ..constants import constant_bundle


def resolve_fft_impl(cfg: FeatureConfig) -> str:
    if cfg.fft_impl != "auto":
        return cfg.fft_impl
    if cfg.fft_points <= 1024:
        return "matmul"
    from .fft import good_factorization

    # large transforms: two-stage Cooley-Tukey GEMMs beat both the direct
    # DFT matmul (O(N K) vs O(N (N1+N2)) FLOPs) and XLA's VPU rfft
    return "ct" if good_factorization(cfg.fft_points) else "fft"


def zero_handling(x: jnp.ndarray, eps: Optional[float] = None) -> jnp.ndarray:
    """Replace exact zeros with machine epsilon before logs
    (functions.rs:66-71; uses f32 epsilon like the reference)."""
    if eps is None:
        eps = float(np.finfo(np.float32).eps)
    return jnp.where(x == 0.0, jnp.asarray(eps, dtype=x.dtype), x)


def _dft_consts(cfg: FeatureConfig, windowed: bool, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    c, s = constant_bundle(cfg)["dft_windowed" if windowed else "dft"]
    return jnp.asarray(c, dtype=dtype), jnp.asarray(s, dtype=dtype)


def rdft(
    frames: jnp.ndarray, cfg: FeatureConfig, windowed: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real DFT of (..., F, L) frames -> (real, imag) each (..., F, K),
    K = fft_points//2+1.  Frames shorter than fft_points are implicitly
    zero-padded (processing.rs:148-156 equivalent)."""
    impl = resolve_fft_impl(cfg)
    n = cfg.fft_points
    if impl == "matmul":
        c, s = _dft_consts(cfg, windowed, frames.dtype)
        L = frames.shape[-1]
        if L > c.shape[0]:
            # rfft(x, n) truncates inputs longer than n — match that
            frames = frames[..., : c.shape[0]]
        elif L < c.shape[0]:
            raise ValueError(
                f"frame length {L} does not match DFT constant rows {c.shape[0]}"
            )
        xr = jnp.matmul(frames, c, precision=cfg.precision)
        xi = jnp.matmul(frames, s, precision=cfg.precision)
        return xr, xi
    if windowed:
        w = jnp.asarray(constant_bundle(cfg)["window"], dtype=frames.dtype)
        frames = frames * w[: frames.shape[-1]]
    if impl == "ct":
        from .fft import rfft_ct

        return rfft_ct(frames, n, precision=cfg.precision)
    # XLA fft path
    spec = jnp.fft.rfft(frames, n=n, axis=-1)
    return jnp.real(spec).astype(frames.dtype), jnp.imag(spec).astype(frames.dtype)


def fft_spectrum(
    frames: jnp.ndarray, cfg: FeatureConfig, windowed: bool = False
) -> jnp.ndarray:
    """rFFT magnitude per frame (processing.rs:143-169 equivalent)."""
    xr, xi = rdft(frames, cfg, windowed)
    return jnp.sqrt(xr * xr + xi * xi)


def power_spectrum(
    frames: jnp.ndarray, cfg: FeatureConfig, windowed: bool = False
) -> jnp.ndarray:
    """speechpy power spectrum ``|X|^2 / fft_points`` (corrected semantics of
    processing.rs:179-181, SURVEY §4 bug #1)."""
    xr, xi = rdft(frames, cfg, windowed)
    return (xr * xr + xi * xi) * (1.0 / cfg.fft_points)


def log_power_spectrum(
    frames: jnp.ndarray, cfg: FeatureConfig, normalize: bool = True
) -> jnp.ndarray:
    """10*log10 power with a -200 dB floor; optional max-normalization using
    the *true* max (fixes processing.rs:199-207, SURVEY §4 bug #4)."""
    ps = power_spectrum(frames, cfg)
    lps = jnp.where(
        ps > 1e-20,
        10.0 * jnp.log10(jnp.maximum(ps, jnp.asarray(1e-30, ps.dtype))),
        jnp.asarray(-200.0, ps.dtype),
    )
    if normalize:
        lps = lps - jnp.max(lps)
    return lps


def power_to_db(
    s: jnp.ndarray, ref: float = 1.0, amin: float = 1e-10,
    top_db: Optional[float] = 80.0, per_spectrogram: bool = True,
) -> jnp.ndarray:
    """librosa-compatible power→dB with top_db clamp.

    With ``per_spectrogram`` (default) the top_db reference max is taken over
    the trailing two axes, so each spectrogram in a batch is clamped against
    its OWN max — matching librosa applied per utterance.  Set it False for
    librosa's literal whole-array behavior."""
    amin_a = jnp.asarray(amin, s.dtype)
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin_a, s))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin_a, jnp.asarray(ref, s.dtype)))
    if top_db is not None:
        if per_spectrogram and s.ndim > 2:
            ref_max = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
        else:
            ref_max = jnp.max(log_spec)
        log_spec = jnp.maximum(log_spec, ref_max - top_db)
    return log_spec
