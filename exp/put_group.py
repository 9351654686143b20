"""Grouped host->device puts (retired from the production path, r5).

r4 shipped ``extraction_step_packed_group`` + a CorpusRunner ``put_group``
staging path on the theory that each ``jax.device_put`` pays a serial fixed
round trip; grouping 13 puts into 4 measured NEUTRAL
(exp/corpus_fixed_cost_ab_r04_results.txt).  The r5 span trace
(exp/corpus_spans_r05.json) resolved the contradiction: ``device_put``
does NOT block (24 MB returns in 20 ms vs 467 ms to completion) and put
transfers pipeline behind the serial shared link, so there is no per-put
fixed cost for grouping to save.  The wire model now charges fixed cost
per FETCH group only.  The implementation is archived here (with its
imports) for genuinely serial-put links; it was tested bitwise-equal
against per-batch dispatch while in-tree (git 58d081a).
"""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mfcc_rust_tpu.config import FeatureConfig
from mfcc_rust_tpu.parallel.data import (
    _as_int32,
    _extraction_step_packed_out_impl,
    _frame_pack_args,
)
from mfcc_rust_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS
from jax.sharding import Mesh


def extraction_step_packed_group(batches, cfg: FeatureConfig, mesh: Mesh,
                                 feature="mfcc", wire_dtype=None):
    """Dispatch SEVERAL packed batches with ONE host->device transfer.

    ``batches``: list of ``(flat, offsets, lengths, t, frame_counts)``
    tuples (frame_counts required — packed outputs only, the corpus
    runner's configuration).  Every batch's host arrays ship in a single
    pytree ``jax.device_put`` — on a remote-attached chip each put call
    pays a fixed ~24 ms round trip (r4 wire model), so grouping k batches
    per put cuts the dispatch fixed cost k-fold.  Returns the per-batch
    ``(packed_feats_tree, moments)`` results in order; numerics are
    identical to per-batch :func:`extraction_step_packed` calls (same
    jitted programs, same inputs — only the transfer grouping differs)."""
    multi = isinstance(feature, (tuple, list))
    if multi and "melspec" in feature:
        raise ValueError(
            "melspec (vorbis hop/framing) cannot join a multi-feature pass"
        )
    if feature == "melspec":
        if cfg.window != "vorbis":
            cfg = cfg.replace(window="vorbis")
        hop = cfg.stream_hop
    else:
        hop = cfg.frame_step
        if cfg.frame_size < hop:
            raise ValueError(
                "sequence-parallel framing requires frame_size >= frame_step"
            )
    n_data, n_seq = mesh.shape[DATA_AXIS], mesh.shape[SEQ_AXIS]
    key = tuple(feature) if multi else feature
    arrays, shardings, meta = [], [], []
    sh_r = NamedSharding(mesh, P())
    sh_d = NamedSharding(mesh, P(DATA_AXIS))
    for flat, offsets, lengths, t, frame_counts in batches:
        if frame_counts is None:
            raise ValueError("extraction_step_packed_group requires "
                             "frame_counts (packed outputs)")
        if offsets.shape[0] % n_data:
            raise ValueError(
                f"batch {offsets.shape[0]} not divisible by data axis {n_data}"
            )
        if t % (n_seq * hop):
            raise ValueError(
                f"time {t} not divisible by seq axis * hop = {n_seq * hop}"
            )
        offs_host, n_pk = _frame_pack_args(frame_counts, mesh)
        arrays += [flat, _as_int32(offsets, "packed offset"),
                   _as_int32(lengths, "clip length"), offs_host]
        shardings += [sh_r, sh_d, sh_d, sh_r]
        meta.append((t, n_pk))
    put = jax.device_put(tuple(arrays), tuple(shardings))
    outs = []
    for i, (t, n_pk) in enumerate(meta):
        fl, off, ln, fo = put[4 * i : 4 * i + 4]
        outs.append(_extraction_step_packed_out_impl(
            fl, off, ln, fo, t, n_pk, cfg, key, mesh, wire_dtype
        ))
    return outs


