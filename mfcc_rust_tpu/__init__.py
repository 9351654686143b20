"""mfcc_rust_tpu — a TPU-native speech feature-extraction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
secretsauceai/mfcc-rust ("SpeechSauce"): MFCC, mel filterbank energies
(MFE/log-MFE), mel spectrograms (speechpy-, librosa- and DFN/vorbis-
compatible), spectral subband centroids, pre-emphasis, delta features and
global/sliding/corpus CMVN — built as fused MXU matmul pipelines, batched via
broadcasting/vmap, distributed via ``jax.sharding`` + ``shard_map``.

Layering (mirrors SURVEY.md §1, re-idiomized for JAX):

* L1 config/constants — :mod:`.config` (frozen hashable FeatureConfig),
  :mod:`.constants` (trace-time numpy constant builders)
* L2 DSP primitives — :mod:`.ops` (framing, spectrum, stft, mel, dct,
  normalize, delta, ssc) (+ :mod:`.ops.pallas` fused kernels)
* L3 features — :mod:`.features` (pure jittable pipelines),
  :mod:`.models` (pipeline objects, streaming extractor)
* L4/L5 ergonomic API — :mod:`.api` (numpy-in/numpy-out, keyword defaults of
  py-speechsauce/speechsauce/__init__.py) — the binding layer the reference
  needs PyO3 for is just jit dispatch here
* parallel — :mod:`.parallel` (device meshes, data-parallel extraction,
  psum corpus stats, halo-exchange long-audio STFT)
"""

from . import constants, features, ops  # noqa: F401
from .api import (  # noqa: F401
    cmvn,
    cmvnw,
    delta,
    delta_librosa,
    derivative_extraction,
    extract,
    extract_derivative_feature,
    lmfe,
    log_mel_spectrogram,
    log_power_spectrum,
    mel_spectrogram,
    mel_spectrogram_librosa,
    mfcc,
    mfcc_librosa,
    mfe,
    preemphasis,
    ssc,
    stack_frames,
)
from .config import (  # noqa: F401
    FeatureConfig,
    SpeechConfigBuilder,
    librosa_config,
    speechpy_config,
    vorbis_config,
)
from .ops.resample import resample, resample_poly  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: importing the torch bridge pulls torch itself, which package
    # import must not do (jax-only deployments).
    if name == "torch_compat":
        import importlib

        return importlib.import_module(".torch_compat", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
