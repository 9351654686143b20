"""Distributed corpus statistics — the psum generalization of ``cmvn``.

The reference's CMVN is a two-pass in-memory reduction over one feature
matrix (processing.rs:265-300).  At corpus scale the moments (sum, sum of
squares, count) are accumulated per shard and reduced with ``psum`` across
the mesh (ICI within a slice, DCN across hosts) — SURVEY §5's "distributed
communication backend" equivalent.  A deterministic pairwise merge is
provided for bit-reproducible multi-round accumulation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.normalize import EPS, masked_moments


class CorpusMoments(NamedTuple):
    """Running (sum, sum_sq, count) over feature dimension D."""

    total: jnp.ndarray  # (D,)
    total_sq: jnp.ndarray  # (D,)
    count: jnp.ndarray  # scalar

    @classmethod
    def zeros(cls, dim: int, dtype=jnp.float32) -> "CorpusMoments":
        return cls(
            jnp.zeros(dim, dtype), jnp.zeros(dim, dtype), jnp.zeros((), dtype)
        )

    def merge(self, other: "CorpusMoments") -> "CorpusMoments":
        return CorpusMoments(
            self.total + other.total,
            self.total_sq + other.total_sq,
            self.count + other.count,
        )

    @property
    def mean(self) -> jnp.ndarray:
        return self.total / jnp.maximum(self.count, 1.0)

    @property
    def std(self) -> jnp.ndarray:
        m = self.mean
        var = jnp.maximum(self.total_sq / jnp.maximum(self.count, 1.0) - m * m, 0.0)
        return jnp.sqrt(var)

    def normalize(self, feats: jnp.ndarray, variance_normalization=True) -> jnp.ndarray:
        out = feats - self.mean
        if variance_normalization:
            out = out / (self.std + EPS)
        return out


def local_moments(
    feats: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> CorpusMoments:
    """Masked local moments of (..., T, D) features (mask: (..., T))."""
    s, ss, n = masked_moments(feats, mask)
    return CorpusMoments(s, ss, n)


def psum_moments(m: CorpusMoments, axis_names) -> CorpusMoments:
    """All-reduce moments across mesh axes — call inside shard_map/pjit."""
    return CorpusMoments(
        jax.lax.psum(m.total, axis_names),
        jax.lax.psum(m.total_sq, axis_names),
        jax.lax.psum(m.count, axis_names),
    )


def tree_merge(moments: Sequence[CorpusMoments]) -> CorpusMoments:
    """Deterministic pairwise (tree) reduction of host-side moment
    checkpoints — fixed association order for bit-reproducible corpus CMVN
    regardless of shard arrival order (SURVEY §7 'multi-host determinism')."""
    items = list(moments)
    if not items:
        raise ValueError("no moments to merge")
    while len(items) > 1:
        nxt = []
        for i in range(0, len(items) - 1, 2):
            nxt.append(items[i].merge(items[i + 1]))
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    return items[0]
