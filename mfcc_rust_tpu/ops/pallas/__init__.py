"""Pallas TPU kernels — the native compute layer (the role realfft/ndrustfft
play in the reference, re-imagined as fused MXU pipelines)."""

from .fused_frontend import fused_log_mel, fused_mfcc, fused_supported  # noqa: F401
