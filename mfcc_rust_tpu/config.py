"""Feature-extraction configuration.

TPU-native replacement for the reference's ``SpeechConfig`` /
``SpeechConfigBuilder`` (reference: speechsauce/src/config.rs:11-97, 100-190).

Design difference from the reference (deliberate, TPU-first): the reference's
config *owns mutable compute state* — planned FFTs, scratch buffers and a
``RefCell`` streaming ring buffer (config.rs:126,130,161-166).  Here the config
is a frozen, hashable dataclass: it is a valid ``jax.jit`` static argument, and
the jit cache plays the role of the reference's plan cache / ``lru_cache``
(py-speechsauce/speechsauce/__init__.py:8-34) / ``cached`` filterbank memoizer
(speechsauce/src/feature.rs:19-23).  All precomputed arrays (windows, mel
filterbank, DCT/DFT matrices) are derived *functionally* from the config at
trace time (see :mod:`mfcc_rust_tpu.constants`) and become XLA constants.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    """Hashable hyper-parameter bundle for the whole feature pipeline.

    Defaults mirror the reference builder defaults (config.rs:35-47):
    fft 512, 20 ms frames, 10 ms stride, 13 cepstra, 40 mels, 0..fs/2 Hz,
    dc_elimination=True.
    """

    sample_rate: int
    fft_points: int = 512
    frame_length: float = 0.02
    frame_stride: float = 0.01
    num_cepstral: int = 13
    num_filters: int = 40
    low_frequency: float = 0.0
    high_frequency: Optional[float] = None  # None -> sample_rate / 2
    dc_elimination: bool = True

    # ---- extensions beyond the reference (one unified pipeline, §7 SURVEY) --
    # Window applied inside the framed STFT path.  The reference hardcodes
    # rectangular for the speechpy path (feature.rs:203-210) and the vorbis
    # window for the streaming path (config.rs:156-160).
    window: str = "rect"  # rect | hann | hamming | povey | vorbis
    win_length_samples: Optional[int] = None  # None -> frame size (librosa: n_fft)
    # Explicit sample-domain overrides (librosa-style params).  When set they
    # take precedence over frame_length/frame_stride seconds.
    frame_length_samples: Optional[int] = None
    frame_stride_samples: Optional[int] = None
    # Mel filterbank flavour.
    mel_scale: str = "speechpy"  # speechpy (1127*ln) | htk (2595*log10) | slaney
    fbank_style: str = "speechpy"  # speechpy (integer bin edges) | librosa (float)
    fbank_norm: Optional[str] = None  # None | "slaney" (area normalization)
    # STFT framing flavour.
    center: bool = False  # librosa center=True reflect-padding
    pad_mode: str = "reflect"
    preemphasis_cof: float = 0.0  # applied before framing when nonzero
    power: float = 2.0  # spectrogram power (librosa melspectrogram default)
    # rFFT implementation: "matmul" lowers the DFT onto the MXU as two GEMMs
    # against precomputed cos/-sin matrices (window folded in); "fft" uses
    # XLA's native rfft; "auto" picks matmul for fft_points <= 1024 on TPU.
    fft_impl: str = "auto"
    # MXU precision for all pipeline GEMMs.  Measured MFCC-13 error vs the
    # float64 oracle on speech-shaped PCM16 audio (exp/
    # precision_parity_r03_results.txt): "highest" (full f32, 6-pass)
    # max-abs 1.3e-4 — the f32 pipeline's own floor; "high" (bf16x3,
    # 3-pass) 2.6e-4 at ~1.57x the throughput; "default" (single bf16)
    # 1.5e-1.  "high" is the default: it adds at most one bit of error to
    # the f32 floor and the MXU runs near its 3-pass peak.  Pass "highest"
    # for strict f32 reproducibility; float64 golden-parity runs are on CPU
    # where all three lower to full-precision f64/f32 ops.  Frame energies
    # are pinned HIGHEST regardless (features._parseval_energies).
    precision: str = "high"
    # Fused Pallas kernel dispatch for the librosa CT mel path:
    # "auto" = use the kernel on the TPU backend when the config qualifies
    # (ops/pallas/ct_mel.py; ~2.3x the XLA CT path, numerics ~1e-6 rel),
    # "off" = always the XLA lowering, "force" = kernel everywhere
    # (interpret mode off-TPU — for tests/debug).
    pallas: str = "auto"
    dtype: str = "float32"

    # -------------------------------------------------- derived quantities --
    def __post_init__(self) -> None:
        if self.fft_points <= 0 or self.sample_rate <= 0:
            raise ValueError("fft_points and sample_rate must be positive")
        if self.high_frequency is not None and (
            self.high_frequency > self.sample_rate / 2.0
        ):
            # mirrors the reference assert (feature.rs:48-51)
            raise ValueError(
                "High frequency cannot be greater than half of the sampling"
                " frequency!"
            )
        if self.low_frequency < 0.0:
            raise ValueError("low frequency cannot be less than zero!")
        if self.window == "vorbis":
            # streaming layout needs a carry of fft_points - hop samples
            if not (0 < self.stream_hop <= self.fft_points):
                raise ValueError(
                    f"vorbis/streaming configs require 0 < frame samples "
                    f"({self.stream_hop}) <= fft_points ({self.fft_points})"
                )

    @property
    def resolved_high_frequency(self) -> float:
        return (
            self.high_frequency
            if self.high_frequency is not None
            else self.sample_rate / 2.0
        )

    @property
    def freq_size(self) -> int:
        """Number of rFFT bins, ``fft_points // 2 + 1`` (config.rs:179)."""
        return self.fft_points // 2 + 1

    @property
    def frame_size(self) -> int:
        """speechpy framing frame length in samples: round(len*fs)
        (processing.rs:79)."""
        if self.frame_length_samples is not None:
            return self.frame_length_samples
        return int(round(self.sample_rate * self.frame_length))

    @property
    def frame_step(self) -> int:
        """speechpy framing hop in samples: round(stride*fs)
        (processing.rs:80)."""
        if self.frame_stride_samples is not None:
            return self.frame_stride_samples
        return int(round(self.sample_rate * self.frame_stride))

    @property
    def win_length(self) -> int:
        return (
            self.win_length_samples
            if self.win_length_samples is not None
            else self.frame_size
        )

    # --- streaming/vorbis ("DFN") path quantities (config.rs:152-180) -------
    @property
    def stream_hop(self) -> int:
        """Streaming-STFT hop: the reference *truncates* frame_length*fs
        (config.rs:152 ``as usize``) and ignores frame_stride entirely
        (functions.rs:101: chunking is by frame_size)."""
        if self.frame_length_samples is not None:
            return self.frame_length_samples
        return int(self.sample_rate * self.frame_length)

    @property
    def stream_mem(self) -> int:
        """Carried-state length ``fft_points - frame_size`` (config.rs:162)."""
        return self.fft_points - self.stream_hop

    @property
    def stream_n_pad(self) -> int:
        """Warm-up frames dropped by the streaming STFT
        (functions.rs:121, 231)."""
        return self.fft_points // self.stream_hop - 1

    @property
    def wnorm(self) -> float:
        """Streaming-STFT normalization ``2*frame/(fft^2)`` (config.rs:178)."""
        return 1.0 / (self.fft_points**2 / (2.0 * self.stream_hop))

    def replace(self, **kw) -> "FeatureConfig":
        return dataclasses.replace(self, **kw)


# ------------------------------------------------------------------ presets --
def speechpy_config(sample_rate: int, **kw) -> FeatureConfig:
    """speechpy-compatible preset — the reference's default semantics
    (config.rs:35-47): rectangular window, integer-bin mel filterbank with the
    HTK-style 1127*ln mel scale (functions.rs:19-41)."""
    return FeatureConfig(sample_rate=sample_rate, **kw)


def librosa_config(
    sample_rate: int = 22050,
    n_fft: int = 2048,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    n_mels: int = 128,
    n_mfcc: int = 20,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    **kw,
) -> FeatureConfig:
    """librosa-compatible preset: hann window, centered reflect-padded STFT,
    Slaney mel scale + Slaney filterbank area norm (BASELINE.json config 2)."""
    hop_length = hop_length if hop_length is not None else n_fft // 4
    win_length = win_length if win_length is not None else n_fft
    return FeatureConfig(
        sample_rate=sample_rate,
        fft_points=n_fft,
        frame_length_samples=n_fft,
        frame_stride_samples=hop_length,
        win_length_samples=win_length,
        num_filters=n_mels,
        num_cepstral=n_mfcc,
        low_frequency=fmin,
        high_frequency=fmax,
        window="hann",
        mel_scale="slaney",
        fbank_style="librosa",
        fbank_norm="slaney",
        center=True,
        pad_mode="reflect",
        dc_elimination=False,
        **kw,
    )


def vorbis_config(sample_rate: int, **kw) -> FeatureConfig:
    """Preset for the reference's streaming ("DFN") mel-spectrogram path:
    vorbis analysis window, hop == frame length, wnorm scaling
    (functions.rs:86-233, config.rs:151-180)."""
    return FeatureConfig(sample_rate=sample_rate, window="vorbis", **kw)


class SpeechConfigBuilder:
    """Fluent builder with the reference's exact surface (config.rs:11-97).

    >>> cfg = SpeechConfigBuilder(16000).fft_points(512).num_cepstral(13).build()
    """

    def __init__(self, sample_rate: int = 16000):
        self._kw = dict(sample_rate=sample_rate)

    def sample_rate(self, v: int) -> "SpeechConfigBuilder":
        self._kw["sample_rate"] = int(v)
        return self

    def fft_points(self, v: int) -> "SpeechConfigBuilder":
        self._kw["fft_points"] = int(v)
        return self

    def frame_length(self, v: float) -> "SpeechConfigBuilder":
        self._kw["frame_length"] = float(v)
        return self

    def frame_stride(self, v: float) -> "SpeechConfigBuilder":
        self._kw["frame_stride"] = float(v)
        return self

    def num_cepstral(self, v: int) -> "SpeechConfigBuilder":
        self._kw["num_cepstral"] = int(v)
        return self

    def num_filters(self, v: int) -> "SpeechConfigBuilder":
        self._kw["num_filters"] = int(v)
        return self

    def low_freq(self, v: float) -> "SpeechConfigBuilder":
        self._kw["low_frequency"] = float(v)
        return self

    def high_freq(self, v: float) -> "SpeechConfigBuilder":
        self._kw["high_frequency"] = float(v)
        return self

    def dc_elimination(self, v: bool) -> "SpeechConfigBuilder":
        self._kw["dc_elimination"] = bool(v)
        return self

    def window(self, v: str) -> "SpeechConfigBuilder":
        self._kw["window"] = str(v)
        return self

    def build(self) -> FeatureConfig:
        return FeatureConfig(**self._kw)
