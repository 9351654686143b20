"""Pipeline objects — the "model families" of a feature-extraction framework.

Stateless pipeline classes wrap the pure functions of
:mod:`mfcc_rust_tpu.features` with a jitted ``__call__`` (config is closed
over as the static argument), and :class:`StreamingExtractor` is the
explicit-state session object that replaces the reference's hidden
``RefCell`` streaming state (config.rs:126,162; SURVEY §4 bug #5): carry is
held as an attribute, resettable, and bit-consistent with the batch
transforms.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import features as F
from ..config import FeatureConfig, vorbis_config
from ..ops import stft as _stft
from ..ops.mel import filterbank_matrix


class Pipeline:
    """Base: jitted pure-function pipeline bound to a config."""

    _fn_name: str = ""

    def __init__(self, cfg: FeatureConfig):
        self.cfg = cfg
        self._jit = jax.jit(
            functools.partial(getattr(F, self._fn_name), cfg=cfg)
        )

    def __call__(self, signal):
        return self._jit(signal)

    def lower(self, signal_shape, dtype=None):
        """AOT-lower for a given input shape (export / inspection)."""
        dtype = jnp.dtype(self.cfg.dtype) if dtype is None else dtype
        return self._jit.lower(jax.ShapeDtypeStruct(signal_shape, dtype))


class MFCCPipeline(Pipeline):
    """(..., T) -> (..., F, num_cepstral) (reference mfcc, feature.rs:94-148)."""

    _fn_name = "mfcc"


class MFEPipeline(Pipeline):
    """(..., T) -> ((..., F, M), (..., F)) (feature.rs:200-233)."""

    _fn_name = "mfe"


class LogMFEPipeline(Pipeline):
    _fn_name = "lmfe"


class SSCPipeline(Pipeline):
    _fn_name = "ssc"


class MelSpectrogramPipeline(Pipeline):
    """Reference vorbis-STFT mel spectrogram (feature.rs:151-174)."""

    _fn_name = "mel_spectrogram"


class LibrosaMelPipeline(Pipeline):
    _fn_name = "mel_spectrogram_librosa"


class LibrosaMFCCPipeline(Pipeline):
    _fn_name = "mfcc_librosa"


class FeatureExtractor:
    """Flagship batch extractor: one object, every feature family, shared
    framing/spectrum work where configs coincide."""

    def __init__(self, cfg: Optional[FeatureConfig] = None, sample_rate: int = 16000):
        self.cfg = cfg if cfg is not None else FeatureConfig(sample_rate=sample_rate)
        self.mfcc = MFCCPipeline(self.cfg)
        self.mfe = MFEPipeline(self.cfg)
        self.lmfe = LogMFEPipeline(self.cfg)
        self.ssc = SSCPipeline(self.cfg)
        self.mel_spectrogram = MelSpectrogramPipeline(
            self.cfg.replace(window="vorbis")
        )

    def __call__(self, signal):
        return self.mfcc(signal)


class StreamingFeatures:
    """Streaming MFCC / log-FBE / MFE session with speechpy framing
    semantics (something the reference cannot do at all: its mfcc path is
    batch-only, feature.rs:94-148), plus a ``"mel_librosa"`` family — the
    ``librosa.stream`` analogue: block-wise center=False mel spectrogram.

    Feed arbitrary-length chunks; frames are emitted as soon as complete.
    The session is *exactly* batch-equivalent: after feeding a total of L
    samples, the concatenated emissions equal ``features.<feature>(x[:L])``
    — including speechpy's no-padding frame-count quirk (the trailing frame
    that `floor((L-fl)/hop)` drops is never emitted).  For ``mel_librosa``
    the batch equivalent is ``mel_spectrogram_librosa`` with center=False
    (librosa's own documented streaming semantics — centering needs future
    samples); emissions are frame-major ``(new_frames, n_mels)``.  dB / MFCC
    heads are deliberately not offered here: ``power_to_db``'s ``top_db``
    clamp references the block max, so they are not streamable exactly —
    apply them to the session's concatenated output instead."""

    #: emission counts are padded up to these bucket sizes so ragged chunk
    #: schedules reuse a handful of compiled shapes instead of one per n_new
    EMIT_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)

    def __init__(self, cfg: Optional[FeatureConfig] = None,
                 sample_rate: int = 16000, feature: str = "mfcc"):
        if feature not in ("mfcc", "lmfe", "mfe", "mel_librosa"):
            raise ValueError(f"unsupported streaming feature {feature!r}")
        if feature == "mel_librosa":
            from ..config import librosa_config

            cfg = cfg if cfg is not None else librosa_config(sample_rate)
            if cfg.frame_size != cfg.fft_points:
                # fail here rather than emitting silently truncated frames:
                # mel_spectrogram_librosa frames by fft_points (ADVICE r1)
                raise ValueError(
                    "mel_librosa streaming requires frame_size == fft_points"
                    " (librosa frames by n_fft; use win_length for short"
                    " analysis windows)"
                )
            # centering needs fft//2 future samples — librosa.stream itself
            # mandates center=False for block processing
            self.cfg = cfg.replace(center=False)
        else:
            self.cfg = cfg if cfg is not None else FeatureConfig(sample_rate=sample_rate)
        if self.cfg.preemphasis_cof:
            # np.roll wrap semantics make pre-emphasis depend on the LAST
            # sample of the whole signal — inherently un-streamable; apply
            # preemphasis to the full signal first, or use the batch API
            raise ValueError(
                "preemphasis_cof != 0 cannot be streamed exactly (its np.roll"
                " wrap couples the first sample to the signal's end); "
                "pre-emphasize the signal before streaming instead"
            )
        self.feature = feature
        # incremental carried chunk-GEMM frontend: every chunk is multiplied
        # against the DFT wall exactly once (vs r times in the recompute
        # fallback) and partial frame sums carry across calls
        from .incremental import IncrementalFrontend, incremental_supported

        self._inc = (
            IncrementalFrontend(self.cfg, feature)
            if incremental_supported(self.cfg, feature) else None
        )
        if feature == "mel_librosa":
            self._fn = jax.jit(
                lambda s: jnp.swapaxes(
                    F.mel_spectrogram_librosa(s, self.cfg), -1, -2
                )
            )
        else:
            self._fn = jax.jit(functools.partial(getattr(F, feature), cfg=self.cfg))
        self.reset()

    def reset(self) -> None:
        self._buf = np.zeros(0, dtype=self.cfg.dtype)
        self._seen = 0
        self._emitted = 0
        if self._inc is not None:
            self._inc.reset()

    def _frame_len(self) -> int:
        # mel_librosa frames by n_fft (librosa pads win_length<n_fft windows
        # up to n_fft and slides n_fft-sample frames); the speechpy family
        # frames by frame_size
        return (
            self.cfg.fft_points if self.feature == "mel_librosa"
            else self.cfg.frame_size
        )

    def _frames_ready(self, total: int) -> int:
        fl, hop = self._frame_len(), self.cfg.frame_step
        if self.feature == "mel_librosa":
            # librosa center=False frame count: 1 + (L - n_fft)//hop
            return max(0, (total - fl) // hop + 1) if total >= fl else 0
        return max(0, (total - fl) // hop)

    def process(self, chunk):
        """Feed samples; returns the newly completed frames (possibly
        zero-length)."""
        chunk = np.asarray(chunk, dtype=self.cfg.dtype)
        if self._inc is not None:
            return self._process_incremental(chunk)
        self._buf = np.concatenate([self._buf, chunk])
        self._seen += len(chunk)
        ready = self._frames_ready(self._seen)
        n_new = ready - self._emitted
        fl, hop = self._frame_len(), self.cfg.frame_step
        if n_new <= 0:
            d = self.cfg.num_cepstral if self.feature == "mfcc" else self.cfg.num_filters
            empty = np.zeros((0, d), dtype=self.cfg.dtype)
            return (empty, np.zeros(0, self.cfg.dtype)) if self.feature == "mfe" else empty
        # pad the emission count up to a bucket so the jit cache stays small
        # under ragged chunk schedules; zero-padded tail frames are discarded
        n_b = next((b for b in self.EMIT_BUCKETS if b >= n_new), n_new)
        # minimal length emitting exactly n_b frames: speechpy's no-padding
        # count floor((L-fl)/hop) needs n_b*hop + fl; librosa's 1+(L-fl)/hop
        # needs one hop less
        need = n_b * hop + (fl - hop if self.feature == "mel_librosa" else fl)
        sl = self._buf[:need]
        if len(sl) < need:
            sl = np.concatenate([sl, np.zeros(need - len(sl), self.cfg.dtype)])
        out = self._fn(jnp.asarray(sl))
        self._buf = self._buf[n_new * hop :]
        self._emitted = ready
        if self.feature == "mfe":
            return np.asarray(out[0])[:n_new], np.asarray(out[1])[:n_new]
        return np.asarray(out)[:n_new]

    def _process_incremental(self, chunk: np.ndarray):
        """Carried-state path: feed always advances the frontend; the rows
        it emits end exactly at the current ready count, so the new frames
        are the trailing ``ready - emitted`` rows (leading rows are warm-up
        for negative frame indices and already-emitted lag frames)."""
        self._seen += len(chunk)
        outs = self._inc.feed(chunk)
        ready = self._frames_ready(self._seen)
        n_new = ready - self._emitted
        self._emitted = ready
        d = self.cfg.num_cepstral if self.feature == "mfcc" else self.cfg.num_filters
        dt = self.cfg.dtype
        if self.feature == "mfe":
            if n_new <= 0:
                return np.zeros((0, d), dt), np.zeros(0, dt)
            mel = np.concatenate([np.asarray(o[0]) for o in outs], axis=0)
            en = np.concatenate([np.asarray(o[1]) for o in outs], axis=0)
            return mel[len(mel) - n_new :], en[len(en) - n_new :]
        if n_new <= 0:
            return np.zeros((0, d), dt)
        rows = np.concatenate([np.asarray(o) for o in outs], axis=0)
        return rows[len(rows) - n_new :]


class StreamingExtractor:
    """Explicit-carry streaming mel/power extraction session.

    Functional replacement for the reference's stateful
    ``frame_analysis``/``analysis_mem`` path (functions.rs:125-170): feed
    chunks whose lengths are multiples of the hop; per-session warm-up
    dropping reproduces the batch ``n_pad`` layout, and ``finalize()`` emits
    the trailing ``n_pad`` zero frames so that the concatenation over a whole
    session equals the batch transform exactly (a property the reference
    lacks — its state leaks across calls and is never reset)."""

    def __init__(self, cfg: Optional[FeatureConfig] = None, sample_rate: int = 16000,
                 mel: bool = True):
        cfg = cfg if cfg is not None else vorbis_config(sample_rate)
        if cfg.window != "vorbis":
            cfg = cfg.replace(window="vorbis")
        self.cfg = cfg
        self.mel = mel
        self._stream = jax.jit(functools.partial(_stft.stft_streaming, cfg=cfg))
        self.reset()

    def reset(self) -> None:
        self._carry = _stft.streaming_init(self.cfg)
        self._to_drop = self.cfg.stream_n_pad

    def process(self, chunk) -> np.ndarray:
        """Feed (T,) samples (T % hop == 0); returns the newly available
        frames — (new_frames, num_filters) mel energies (or power bins when
        ``mel=False``)."""
        chunk = jnp.asarray(chunk, dtype=self.cfg.dtype)
        self._carry, power = self._stream(chunk, carry=self._carry)
        out = np.asarray(self._project(power))
        if self._to_drop:
            k = min(self._to_drop, out.shape[0])
            out = out[k:]
            self._to_drop -= k
        return out

    def finalize(self) -> np.ndarray:
        """End the session: the reference's output layout carries ``n_pad``
        never-written zero rows at the tail (functions.rs:121,231)."""
        n_pad = self.cfg.stream_n_pad
        width = self.cfg.num_filters if self.mel else self.cfg.freq_size
        self.reset()
        return np.zeros((n_pad, width), dtype=self.cfg.dtype)

    def _project(self, power: jnp.ndarray) -> jnp.ndarray:
        if not self.mel:
            return power
        fb = filterbank_matrix(self.cfg, power.dtype)
        return jnp.matmul(power, fb.T, precision="highest")
