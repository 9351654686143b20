"""Distributed corpus statistics — the psum generalization of ``cmvn``.

The reference's CMVN is a two-pass in-memory reduction over one feature
matrix (processing.rs:265-300).  At corpus scale the moments are accumulated
per shard and reduced across the mesh (ICI within a slice, DCN across hosts)
— SURVEY §5's "distributed communication backend" equivalent.

Numerics: the naive (sum, sum_sq) accumulation computes the variance as
``E[x^2] - mean^2``, which cancels catastrophically in float32 for
large-mean features (mean 1e4 -> mean^2 1e8, where f32 resolution is ~8 —
the entire variance of unit-scale data vanishes).  Moments are therefore
carried in Welford/Chan form ``(count, mean, M2 = sum((x - mean)^2))``:
every quantity stays at data scale, merging two states is the numerically
stable Chan update, and the distributed reduction composes from ``psum`` of
count / count-weighted mean / shifted M2.  A deterministic pairwise merge is
provided for bit-reproducible multi-round accumulation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.normalize import EPS


class CorpusMoments(NamedTuple):
    """Running Welford/Chan state over feature dimension D:
    ``count`` (scalar), ``mean`` (D,), ``m2 = sum((x - mean)^2)`` (D,).

    Array-namespace agnostic by design: ``merge``/``total``/``variance``/
    ``std`` use only operators, so numpy states stay numpy — on a
    remote-attached TPU a host-side accumulation loop written with jnp ops
    would pay a device round trip per batch (see
    ``parallel.data.fetch_outputs``), and they remain fully traceable under
    jit for the device-side paths."""

    count: jnp.ndarray  # scalar
    mean: jnp.ndarray  # (D,)
    m2: jnp.ndarray  # (D,)

    @classmethod
    def zeros(cls, dim: int, dtype=None) -> "CorpusMoments":
        import numpy as np

        dtype = np.float32 if dtype is None else dtype
        return cls(
            np.zeros((), dtype), np.zeros(dim, dtype), np.zeros(dim, dtype)
        )

    def merge(self, other: "CorpusMoments") -> "CorpusMoments":
        """Chan's parallel combine: stable for any mean magnitude, exact for
        empty operands."""
        n = self.count + other.count
        w = other.count / (n + (n == 0))  # == other.count / max(n, 1)
        delta = other.mean - self.mean
        mean = self.mean + delta * w
        m2 = self.m2 + other.m2 + (delta * delta) * (self.count * w)
        return CorpusMoments(n, mean, m2)

    @property
    def total(self) -> jnp.ndarray:
        """Derived plain sum (kept for reporting/tests)."""
        return self.mean * self.count

    @property
    def variance(self) -> jnp.ndarray:
        n = self.count
        v = self.m2 / (n + (n == 0))
        return v * (v > 0)  # clip stray negative rounding residue

    @property
    def std(self) -> jnp.ndarray:
        return self.variance ** 0.5

    def normalize(self, feats: jnp.ndarray, variance_normalization=True) -> jnp.ndarray:
        out = feats - self.mean
        if variance_normalization:
            out = out / (self.std + EPS)
        return out


def local_moments(
    feats: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> CorpusMoments:
    """Masked local moments of (..., T, D) features (mask: (..., T)) in the
    stable two-pass form: mean first, then the centered sum of squares (the
    batch is resident, so the second pass is one more fused elementwise
    reduction, not a data re-read)."""
    red = tuple(range(feats.ndim - 1))
    if mask is None:
        n = jnp.asarray(
            jnp.prod(jnp.asarray(feats.shape[:-1])), dtype=feats.dtype
        )
        nz = jnp.maximum(n, 1.0)
        m1 = jnp.sum(feats, axis=red) / nz
        mean = m1 + jnp.sum(feats - m1, axis=red) / nz  # two-pass refinement
        d = feats - mean
        m2 = jnp.sum(d * d, axis=red)
        return CorpusMoments(n, mean, m2)
    m = mask[..., None].astype(feats.dtype)
    n = jnp.sum(m)
    nz = jnp.maximum(n, 1.0)
    m1 = jnp.sum(feats * m, axis=red) / nz
    mean = m1 + jnp.sum((feats - m1) * m, axis=red) / nz
    d = (feats - mean) * m
    m2 = jnp.sum(d * d, axis=red)
    return CorpusMoments(n, mean, m2)


def psum_moments(m: CorpusMoments, axis_names) -> CorpusMoments:
    """All-reduce Welford states across mesh axes — call inside
    shard_map/pjit.  The distributed Chan combine: global count and
    count-weighted mean by ``psum``, then each shard re-centers its M2 on the
    global mean before the final ``psum`` (no sum-of-squares ever forms)."""
    n = jax.lax.psum(m.count, axis_names)
    mean = jax.lax.psum(m.mean * m.count, axis_names) / jnp.maximum(n, 1.0)
    delta = m.mean - mean
    m2 = jax.lax.psum(m.m2 + (delta * delta) * m.count, axis_names)
    return CorpusMoments(n, mean, m2)


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
