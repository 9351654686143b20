"""Model export for inference embedding.

The reference's deployment story is "embed the Rust crate next to tract"
(SURVEY §3.2).  The TPU-native equivalent: serialize any jitted feature
pipeline with ``jax.export`` to a portable StableHLO artifact that an
inference runtime (or a later JAX process, any backend) can load and call
without this package — plus AOT lowering helpers for inspection.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import features as F
from .config import FeatureConfig


def _pipeline_fn(cfg: FeatureConfig, feature: str):
    # exported artifacts must be pure StableHLO: the Pallas kernel lowers to
    # a TPU-only Mosaic custom call that no other backend (or non-JAX
    # runtime) could execute, so exports always take the XLA lowering
    if cfg.pallas != "off":
        cfg = cfg.replace(pallas="off")
    fn = getattr(F, feature)
    return functools.partial(fn, cfg=cfg)


def export_pipeline(
    cfg: FeatureConfig,
    feature: str = "mfcc",
    signal_shape: Sequence[int] = (1, 16000),
    path: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
):
    """Serialize a feature pipeline for ``signal_shape`` inputs.

    Returns the ``jax.export.Exported`` object; when ``path`` is given the
    serialized bytes are also written there.
    """
    from jax import export as jax_export

    fn = jax.jit(_pipeline_fn(cfg, feature))
    args = (jax.ShapeDtypeStruct(tuple(signal_shape), jnp.dtype(cfg.dtype)),)
    if platforms is not None:
        exported = jax_export.export(fn, platforms=list(platforms))(*args)
    else:
        exported = jax_export.export(fn)(*args)
    if path is not None:
        Path(path).write_bytes(exported.serialize())
    return exported


def load_pipeline(path: str):
    """Deserialize an exported pipeline; returns a callable ``fn(signal)``."""
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())
    return exported.call


def stablehlo_text(cfg: FeatureConfig, feature: str = "mfcc",
                   signal_shape: Sequence[int] = (1, 16000)) -> str:
    """StableHLO for inspection/embedding in non-JAX toolchains."""
    fn = jax.jit(_pipeline_fn(cfg, feature))
    lowered = fn.lower(
        jax.ShapeDtypeStruct(tuple(signal_shape), jnp.dtype(cfg.dtype))
    )
    return lowered.as_text()


def flops_estimate(cfg: FeatureConfig, feature: str = "mfcc",
                   signal_shape: Sequence[int] = (1, 16000)) -> Optional[float]:
    """XLA's own cost analysis of the compiled pipeline, when available."""
    fn = jax.jit(_pipeline_fn(cfg, feature))
    compiled = fn.lower(
        jax.ShapeDtypeStruct(tuple(signal_shape), jnp.dtype(cfg.dtype))
    ).compile()
    try:
        return float(compiled.cost_analysis()["flops"])
    except (KeyError, TypeError, IndexError):
        return None
