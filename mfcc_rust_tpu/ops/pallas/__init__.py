"""Pallas TPU kernels — the native compute layer (the role realfft/ndrustfft
play in the reference, re-imagined as fused MXU pipelines).

The speechpy-frontend kernel that once lived here (fused_frontend.py) was
deleted in round 3: at ``highest`` precision the XLA chunk-GEMM pipeline is
MXU-bound and beat the kernel 546.6k vs 352.7k audio-s/s on v5e
(exp/fused_vs_xla_r02_results.txt; rationale in docs/DESIGN.md) — a fused
kernel cannot win back FLOP-bound time.  The librosa CT mel kernel
(ct_mel.py) IS HBM-bound in XLA form and stays the TPU default.
"""

from .ct_mel import ct_mel_pallas, pallas_ct_supported  # noqa: F401
