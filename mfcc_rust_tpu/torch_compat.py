"""Torch-tensor front door for the whole feature API.

The reference's pitch is train-in-Python / deploy-with-identical-features
(reference README.md:3); most of those Python training pipelines are torch.
This module wraps every array-in/array-out function of :mod:`.api` so torch
users can call them directly with ``torch.Tensor`` inputs and get
``torch.Tensor`` outputs back — CPU tensors cross via zero-copy
``Tensor.numpy()`` / ``torch.from_numpy`` views, accelerator tensors are
staged through host memory and the result is returned on the input's device.

Feature math still runs in JAX (jitted, on whatever backend JAX has); there
is no autograd flow through these wrappers — for gradients, use the jittable
pipelines in :mod:`mfcc_rust_tpu.features` under ``jax.grad``, which are
differentiable end to end.

Also provides thin ``torch.nn.Module`` transforms (:class:`MelSpectrogram`,
:class:`MFCC`, :class:`SpeechpyMFCC`) in the torchaudio-transforms style so
the extractor can sit inside an ``nn.Sequential`` data pipeline.
"""

from __future__ import annotations

import functools

import numpy as np
import torch

from . import api as _api
from .ops.resample import resample as _resample_np

__all__ = [
    "MFCC",
    "MelSpectrogram",
    "SpeechpyMFCC",
    "from_torch",
    "to_torch",
]


def from_torch(t):
    """torch.Tensor -> numpy array (zero-copy for contiguous CPU tensors;
    non-CPU tensors are copied to host; bf16/f16 upcast to f32 since numpy
    has no bfloat16).  Non-tensors pass through ``np.asarray``."""
    if not isinstance(t, torch.Tensor):
        return np.asarray(t)
    x = t.detach()
    if x.device.type != "cpu":
        x = x.cpu()
    if x.dtype in (torch.bfloat16, torch.float16):
        x = x.float()
    return x.contiguous().numpy()


def to_torch(a, like: torch.Tensor | None = None):
    """numpy array -> torch.Tensor (zero-copy view when the array is
    writable), moved to ``like``'s device when given."""
    a = np.asarray(a)
    if not a.flags.writeable:
        a = a.copy()
    out = torch.from_numpy(a)
    if like is not None and like.device.type != "cpu":
        out = out.to(like.device)
    return out


def _back(val, like):
    if isinstance(val, tuple):
        return tuple(_back(v, like) for v in val)
    if isinstance(val, dict):
        return {k: _back(v, like) for k, v in val.items()}
    return to_torch(val, like)


def _wrap(api_fn):
    @functools.wraps(api_fn)
    def wrapped(signal, *args, **kwargs):
        like = signal if isinstance(signal, torch.Tensor) else None
        return _back(api_fn(from_torch(signal), *args, **kwargs), like)

    wrapped.__doc__ = (
        f"torch-tensor wrapper of the numpy facade ``{api_fn.__name__}`` "
        f"(same signature; tensor in, tensor out on the input's device).\n\n"
        + (api_fn.__doc__ or "")
    )
    return wrapped


mfcc = _wrap(_api.mfcc)
mfe = _wrap(_api.mfe)
lmfe = _wrap(_api.lmfe)
ssc = _wrap(_api.ssc)
extract = _wrap(_api.extract)
mel_spectrogram = _wrap(_api.mel_spectrogram)
mel_spectrogram_librosa = _wrap(_api.mel_spectrogram_librosa)
log_mel_spectrogram = _wrap(_api.log_mel_spectrogram)
mfcc_librosa = _wrap(_api.mfcc_librosa)
preemphasis = _wrap(_api.preemphasis)
cmvn = _wrap(_api.cmvn)
cmvnw = _wrap(_api.cmvnw)
delta = _wrap(_api.delta)
delta_librosa = _wrap(_api.delta_librosa)
derivative_extraction = _wrap(_api.derivative_extraction)
extract_derivative_feature = _wrap(_api.extract_derivative_feature)
stack_frames = _wrap(_api.stack_frames)
log_power_spectrum = _wrap(_api.log_power_spectrum)
def _resample_api(signal, orig_sr, target_sr):
    """Polyphase resampling (scipy ``resample_poly`` Kaiser-5.0 semantics) as
    one chunk-GEMM; see :func:`mfcc_rust_tpu.ops.resample.resample`."""
    return np.asarray(_resample_np(signal, orig_sr, target_sr))


_resample_api.__name__ = "resample"
resample = _wrap(_resample_api)

__all__ += [
    "cmvn", "cmvnw", "delta", "delta_librosa", "derivative_extraction",
    "extract", "extract_derivative_feature", "lmfe", "log_mel_spectrogram",
    "log_power_spectrum", "mel_spectrogram", "mel_spectrogram_librosa",
    "mfcc", "mfcc_librosa", "mfe", "preemphasis", "resample", "ssc",
    "stack_frames",
]


class _Transform(torch.nn.Module):
    """Base for the nn.Module transforms: stores the keyword config, calls a
    torch-wrapped API function in forward.  Stateless (no parameters).

    DataLoader workers: JAX is not fork-safe — if the parent process has
    already run any JAX computation, fork-started workers (the Linux
    ``num_workers>0`` default) can deadlock in the XLA runtime, and each
    worker process compiles its own jit cache regardless of start method.
    Use ``num_workers=0``, or a ``spawn``/``forkserver`` start method, or
    keep these transforms out of worker processes (apply them on the main
    process after collation)."""

    _fn = None  # set by subclasses

    def __init__(self, **kw):
        super().__init__()
        self.kw = kw

    def extra_repr(self) -> str:  # shows config in print(module)
        return ", ".join(f"{k}={v!r}" for k, v in self.kw.items())

    def forward(self, waveform: torch.Tensor) -> torch.Tensor:
        return type(self)._fn(waveform, **self.kw)


class MelSpectrogram(_Transform):
    """librosa-semantics mel spectrogram as an ``nn.Module``:
    ``(..., T) -> (..., n_mels, frames)``.  Keywords are those of
    :func:`mfcc_rust_tpu.api.mel_spectrogram_librosa` (sr, n_fft,
    hop_length, n_mels, fmin, fmax, power, center...)."""

    _fn = staticmethod(mel_spectrogram_librosa)


class MFCC(_Transform):
    """librosa-semantics MFCC as an ``nn.Module``:
    ``(..., T) -> (..., n_mfcc, frames)``.  Keywords are those of
    :func:`mfcc_rust_tpu.api.mfcc_librosa`."""

    _fn = staticmethod(mfcc_librosa)


class SpeechpyMFCC(_Transform):
    """Reference-semantics MFCC (speechpy pipeline, SURVEY C20) as an
    ``nn.Module``: ``(..., T) -> (..., num_frames, num_cepstral)``.
    Keywords are those of :func:`mfcc_rust_tpu.api.mfcc` after the
    positional ``sampling_frequency``."""

    def __init__(self, sampling_frequency: int, **kw):
        super().__init__(sampling_frequency=sampling_frequency, **kw)

    _fn = staticmethod(mfcc)
