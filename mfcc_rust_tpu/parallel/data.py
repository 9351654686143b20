"""Data-parallel (+ optional sequence-parallel) feature extraction.

The multi-chip "training step" of this framework: a ``shard_map`` over a
(data, seq) mesh that extracts features for a sharded batch of utterances
and all-reduces masked corpus CMVN moments with ``psum`` — the distributed
generalization of the reference's single-matrix ``cmvn``
(processing.rs:265-300) per SURVEY §2's parallelism ledger.

* batch axis sharded over ``data`` (utterances are independent),
* time axis optionally sharded over ``seq`` with a ``frame_len - hop`` halo
  exchange (:mod:`mfcc_rust_tpu.parallel.halo`),
* filterbank/DCT matrices are trace-time constants, replicated on every chip,
* per-utterance ragged lengths handled by frame-validity masks so moments
  exactly match unpadded statistics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.4.35 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..config import FeatureConfig
from ..ops.dct import dct2_ortho
from ..ops.mel import apply_filterbank
from ..ops.spectrum import zero_handling
from . import halo
from .mesh import DATA_AXIS, SEQ_AXIS
from .stats import CorpusMoments, local_moments, psum_moments


def _n_valid_frames(lengths: jnp.ndarray, cfg: FeatureConfig, feature):
    """Per-row valid output-frame count from INT32 true sample counts, in
    exact integer arithmetic — the device-side twin of
    :func:`frame_counts_host` (both sides integer, so they agree bitwise for
    any int32-representable length; ADVICE r3: the old float32 form lost
    exactness past ~2^17-frame quotients)."""
    lengths = lengths.astype(jnp.int32)
    hop = cfg.stream_hop if feature == "melspec" else cfg.frame_step
    if feature == "melspec":
        # chunks = ceil(L / hop); lengths are non-negative sample counts
        return (lengths + (hop - 1)) // hop
    # speechpy zero_padding=False count: floor((L - frame_len) / hop)
    # (processing.rs:101-103); // floors negatives like the float form did
    return (lengths - cfg.frame_size) // hop


def _local_features(
    signals: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: FeatureConfig,
    feature: str,
) -> Tuple[jnp.ndarray, jnp.ndarray, CorpusMoments]:
    """Per-shard body: (Bl, Tl) signals + (Bl,) int lengths -> (feats, mask,
    psum'd moments).  Runs inside shard_map."""
    from ..features import _chunked_mel_energy, _fast_path_ok

    if feature == "melspec":
        return _local_melspec(signals, lengths, cfg)
    hop = cfg.frame_step
    n_local = signals.shape[-1] // hop
    seq_idx = jax.lax.axis_index(SEQ_AXIS)
    gidx = seq_idx * n_local + jnp.arange(n_local)  # global frame index
    n_valid = _n_valid_frames(lengths, cfg, feature)
    mask = gidx[None, :] < n_valid[:, None]  # (Bl, Fl)

    if feature not in ("mfcc", "lmfe", "mfe", "ssc"):
        raise ValueError(f"unknown feature {feature!r}")

    if feature == "ssc":
        import numpy as np

        from ..features import _chunked_mel_energy, _fast_path_ok
        from ..ops.ssc import ssc_from_power

        halo_len = min(cfg.frame_size, cfg.fft_points) - hop
        right = halo._right_halo(signals, halo_len, SEQ_AXIS)
        full = jnp.concatenate([signals, right], axis=-1)
        if _fast_path_ok(cfg) and cfg.window == "rect":
            ramp = np.linspace(1.0, cfg.sample_rate / 2.0, cfg.freq_size)
            num, _, den = _chunked_mel_energy(
                full, cfg, want_energy=False, spectral_weight=ramp,
                n_frames=n_local,
            )
            feats = num / den
        else:
            power = halo.sharded_power_spectrum(signals, cfg, SEQ_AXIS)
            feats = ssc_from_power(power, cfg)
        moments = psum_moments(
            local_moments(feats, mask.astype(feats.dtype)), (DATA_AXIS, SEQ_AXIS)
        )
        return feats, mask, moments

    if _fast_path_ok(cfg) and cfg.window == "rect":
        # same chunk-GEMM lowering as the single-chip fast path, run on the
        # halo-extended local shard (right halo = frame_len - hop samples)
        halo_len = min(cfg.frame_size, cfg.fft_points) - hop
        right = halo._right_halo(signals, halo_len, SEQ_AXIS)
        full = jnp.concatenate([signals, right], axis=-1)
        feats, energies = _chunked_mel_energy(
            full, cfg, want_energy=True, n_frames=n_local
        )
        if feature == "mfcc":
            feats = dct2_ortho(jnp.log(feats), cfg)
            if cfg.dc_elimination:
                feats = feats.at[..., 0].set(jnp.log(energies))
        elif feature == "lmfe":
            feats = jnp.log(feats)
    else:
        power = halo.sharded_power_spectrum(signals, cfg, SEQ_AXIS)
        energies = zero_handling(jnp.sum(power, axis=-1))
        feats = apply_filterbank(power, cfg, handle_zeros=True)
        if feature == "mfcc":
            feats = dct2_ortho(jnp.log(feats), cfg)
            if cfg.dc_elimination:
                feats = feats.at[..., 0].set(jnp.log(energies))
        elif feature == "lmfe":
            feats = jnp.log(feats)

    moments = psum_moments(
        local_moments(feats, mask.astype(feats.dtype)), (DATA_AXIS, SEQ_AXIS)
    )
    return feats, mask, moments


def _local_multi(
    signals: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: FeatureConfig,
    features: Tuple[str, ...],
):
    """Multi-feature shard body: ONE halo exchange + ONE chunk-GEMM frontend
    pass feeds every requested feature head (the sharded form of
    :func:`mfcc_rust_tpu.features.extract`).  Returns (dict of feats, mask,
    dict of psum'd moments)."""
    import numpy as np

    from ..constants import chunk_gemm_wall, constant_bundle
    from ..features import _chunk_gemm, _extract_heads, _fast_path_ok
    from ..ops import framing as _framing
    from ..ops.ssc import ssc_from_power

    valid = {"mfcc", "lmfe", "mfe", "ssc", "energy"}
    unknown = set(features) - valid
    if unknown:
        raise ValueError(
            f"unknown features {sorted(unknown)}; valid: {sorted(valid)}"
        )
    want = set(features)
    hop = cfg.frame_step
    n_local = signals.shape[-1] // hop
    seq_idx = jax.lax.axis_index(SEQ_AXIS)
    gidx = seq_idx * n_local + jnp.arange(n_local)
    n_valid = _n_valid_frames(lengths, cfg, features[0])
    mask = gidx[None, :] < n_valid[:, None]

    need_energy = bool(want & {"mfe", "energy"}) or (
        "mfcc" in want and cfg.dc_elimination
    )
    if _fast_path_ok(cfg) and cfg.window == "rect":
        halo_len = min(cfg.frame_size, cfg.fft_points) - hop
        right = halo._right_halo(signals, halo_len, SEQ_AXIS)
        full = jnp.concatenate([signals, right], axis=-1)
        if cfg.preemphasis_cof:
            full = _framing.preemphasis(full, 1, cfg.preemphasis_cof)
        bundle = constant_bundle(cfg)
        wd = chunk_gemm_wall(cfg, need_energy)
        ch, y = _chunk_gemm(full, wd["wall"], n_local, hop, cfg.precision)
        out = _extract_heads(ch, y, wd, bundle, cfg, want, n_local, need_energy)
    else:
        power = halo.sharded_power_spectrum(signals, cfg, SEQ_AXIS)
        energies = zero_handling(jnp.sum(power, axis=-1))
        out = {}
        if want & {"mfcc", "lmfe", "mfe"}:
            mel = apply_filterbank(power, cfg, handle_zeros=True)
            if "mfe" in want:
                out["mfe"] = (mel, energies)
            if want & {"mfcc", "lmfe"}:
                logm = jnp.log(mel)
                if "lmfe" in want:
                    out["lmfe"] = logm
                if "mfcc" in want:
                    coeffs = dct2_ortho(logm, cfg)
                    if cfg.dc_elimination:
                        coeffs = coeffs.at[..., 0].set(jnp.log(energies))
                    out["mfcc"] = coeffs
        if "energy" in want:
            out["energy"] = energies
        if "ssc" in want:
            out["ssc"] = ssc_from_power(power, cfg)

    fmask = mask.astype(signals.dtype)
    moments = {}
    for name in features:
        val = out[name][0] if name == "mfe" else out[name]
        if name == "energy":
            val = val[..., None]  # (Bl, Fl) -> (Bl, Fl, 1) for moment shape
        moments[name] = psum_moments(
            local_moments(val, fmask), (DATA_AXIS, SEQ_AXIS)
        )
    return out, mask, moments


def _local_melspec(
    signals: jnp.ndarray, lengths: jnp.ndarray, cfg: FeatureConfig
) -> Tuple[jnp.ndarray, jnp.ndarray, CorpusMoments]:
    """Sharded vorbis mel spectrogram (the reference's mel_spectrogram
    family, feature.rs:151-174): left-halo streaming frames, trimmed
    windowed-DFT GEMMs, mel projection.  Output is frame-major
    (Bl, Fl, M), chunk-indexed: the batch n_pad warm-up/tail layout is a
    global-view concern applied after gathering (ops.stft._apply_npad_layout)."""

    from ..constants import vorbis_chunk_wall
    from ..features import _chunk_gemm

    hop = cfg.stream_hop
    t = signals.shape[-1]
    if t % hop != 0:
        raise ValueError(f"local shard length {t} must be a multiple of hop {hop}")
    n_local = t // hop
    seq_idx = jax.lax.axis_index(SEQ_AXIS)
    gidx = seq_idx * n_local + jnp.arange(n_local)
    n_valid = _n_valid_frames(lengths, cfg, "melspec")
    mask = gidx[None, :] < n_valid[:, None]

    # gather-free STFT (same lowering and shared constant as
    # features.mel_spectrogram): the left halo supplies the analysis memory,
    # the hop-padded [C|S] wall makes the frames a shifted-chunk GEMM
    vw = vorbis_chunk_wall(cfg)
    left = halo._left_halo(signals, cfg.fft_points - hop, SEQ_AXIS)
    full = jnp.concatenate([left, signals], axis=-1)
    _, y = _chunk_gemm(full, vw["wall"], n_local, hop, cfg.precision)
    mel = jnp.matmul(
        y * y, jnp.asarray(vw["fb2"], signals.dtype), precision=cfg.precision
    )
    moments = psum_moments(
        local_moments(mel, mask.astype(mel.dtype)), (DATA_AXIS, SEQ_AXIS)
    )
    return mel, mask, moments


def _unpack_local(flat, offsets, lengths, t_local, dtype):
    """Shard body prologue: rebuild this shard's (Bl, t_local) signal block
    from the replicated flat sample buffer.

    ``flat`` holds every utterance's TRUE samples back to back (no padding)
    as int16 PCM or float32; row b of the padded batch is
    ``flat[offsets[b] : offsets[b] + lengths[b]]`` with zeros after.  The
    gather runs on device because host->device bytes are the corpus
    bottleneck on remote-attached chips (padding + f32 cost ~3.2x the true
    PCM16 payload)."""
    seq_idx = jax.lax.axis_index(SEQ_AXIS)
    pos = seq_idx * t_local + jnp.arange(t_local, dtype=jnp.int32)[None, :]
    idx = offsets[:, None].astype(jnp.int32) + pos
    idx = jnp.minimum(idx, flat.shape[0] - 1)
    x = jnp.take(flat, idx, axis=0)
    if x.dtype == jnp.int16:
        # exact for PCM16 decode: i/32768 is a power-of-two scale
        x = x.astype(dtype) * jnp.asarray(1.0 / 32768.0, dtype)
    else:
        x = x.astype(dtype)
    return jnp.where(pos < lengths[:, None], x, jnp.zeros((), dtype))


def _local_packed(flat, offsets, lengths, cfg, feature, t_local):
    signals = _unpack_local(flat, offsets, lengths, t_local,
                            jnp.dtype(cfg.dtype))
    return _local_features(signals, lengths, cfg, feature)


def _local_packed_multi(flat, offsets, lengths, cfg, features, t_local):
    signals = _unpack_local(flat, offsets, lengths, t_local,
                            jnp.dtype(cfg.dtype))
    return _local_multi(signals, lengths, cfg, features)


def _packed_mapped(flat, offsets, lengths, t, cfg, feature, mesh):
    """Shared shard_map dispatch for the packed-input extraction step."""
    t_local = t // mesh.shape[SEQ_AXIS]
    multi = isinstance(feature, tuple)
    if multi:
        body = functools.partial(_local_packed_multi, cfg=cfg,
                                 features=feature, t_local=t_local)
        sharded = P(DATA_AXIS, SEQ_AXIS)
        feat_specs = {
            name: (sharded, sharded) if name == "mfe" else sharded
            for name in feature
        }
        out_specs = (feat_specs, sharded,
                     {name: CorpusMoments(P(), P(), P()) for name in feature})
    else:
        body = functools.partial(_local_packed, cfg=cfg, feature=feature,
                                 t_local=t_local)
        out_specs = (P(DATA_AXIS, SEQ_AXIS), P(DATA_AXIS, SEQ_AXIS),
                     CorpusMoments(P(), P(), P()))
    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=out_specs,
    )
    return mapped(flat, offsets, lengths)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _extraction_step_packed_impl(flat, offsets, lengths, t, cfg, feature,
                                 mesh):
    return _packed_mapped(flat, offsets, lengths, t, cfg, feature, mesh)


def _as_int32(arr, what: str) -> "np.ndarray":
    """Checked int32 narrowing for host index/length arrays bound for the
    device (the device mask/gather arithmetic runs in int32).  Shared by
    every device entry point (ADVICE r4: the guard used to live only in
    :func:`frame_counts_host`, so non-packed callers could silently wrap)."""
    import numpy as np

    if isinstance(arr, jax.Array):  # already-committed device array
        return arr
    a = np.asarray(arr)
    if a.size and int(a.max(initial=0)) >= 2**31:
        raise ValueError(
            f"{what} {int(a.max())} exceeds int32 (device arithmetic is "
            "int32; split the batch or cap clip lengths)"
        )
    return a.astype(np.int32)


def frame_counts_host(lengths, cfg: FeatureConfig, feature) -> "np.ndarray":
    """Host mirror of the device frame-validity mask's per-row counts
    (:func:`_n_valid_frames`): the number of valid output frames for each
    true sample count.  Both sides use exact integer arithmetic on int32
    lengths (ADVICE r3), so they agree bitwise for every representable
    clip; lengths past int32 are rejected rather than silently wrapped."""
    import numpy as np

    lengths = np.asarray(lengths, dtype=np.int64)
    if lengths.size and int(lengths.max()) >= 2**31:
        raise ValueError(
            f"clip length {int(lengths.max())} exceeds int32 samples "
            "(the device mask arithmetic runs in int32)"
        )
    if feature == "melspec":
        return np.maximum(-(-lengths // cfg.stream_hop), 0)
    return np.maximum((lengths - cfg.frame_size) // cfg.frame_step, 0)


def _pack_frame_tree(feats, lengths, frame_offsets, cfg, feature, n_pk):
    """Global-view epilogue: gather every VALID frame row of the padded
    (B, F, ...) feature leaves into dense (n_pk, ...) buffers, in
    (row-major, frame-major) corpus order.  Device->host transfers then
    carry only true frames — no batch padding, no mask plane (the host
    derives per-row counts with :func:`frame_counts_host`).

    ``frame_offsets`` is the exclusive cumsum of the per-row valid-frame
    counts (host-computed); rows past the true batch (and zero-frame rows)
    occupy no packed positions."""
    multi = isinstance(feature, tuple)
    any_leaf = jax.tree.leaves(feats)[0]
    B, F = any_leaf.shape[0], any_leaf.shape[1]
    nv = jnp.clip(_n_valid_frames(lengths, cfg, feature), 0, F)
    p = jnp.arange(n_pk, dtype=jnp.int32)
    # row containing packed position p: zero-frame rows share their offset
    # with the next row, and side="right" lands on the LAST row with
    # offset <= p — the one whose frames actually start there
    row = jnp.clip(
        jnp.searchsorted(frame_offsets, p, side="right").astype(jnp.int32) - 1,
        0, B - 1,
    )
    f = p - frame_offsets[row]
    valid = (f >= 0) & (f < nv[row])
    flat_idx = row * F + jnp.clip(f, 0, F - 1)

    def pk(leaf):
        g = jnp.take(leaf.reshape((B * F,) + leaf.shape[2:]), flat_idx,
                     axis=0)
        v = valid.reshape((n_pk,) + (1,) * (g.ndim - 1))
        return jnp.where(v, g, jnp.zeros((), g.dtype))

    del multi
    return jax.tree.map(pk, feats)


def _cast_wire(tree, wire_dtype):
    """Reduced-precision WIRE format for the packed-output fetch: quantize
    every f32 feature leaf to ``wire_dtype`` (f16/bf16) on device, halving
    the bytes of the D2H direction — measured ~5x slower than H2D on a
    remote-attached chip (exp/d2h_profile.py).  Exactly ``x.astype(wd)`` of
    the f32 result (round-to-nearest-even); f16 carries an 11-bit mantissa,
    so the feature error bound is ``|err| <= 2^-11 * |x|`` (+ subnormal
    floor) — tested in test_parallel.py::test_packed_output_wire_f16."""
    if wire_dtype is None:
        return tree
    wd = jnp.dtype(wire_dtype)
    return jax.tree.map(
        lambda x: x.astype(wd) if x.dtype == jnp.float32 else x, tree
    )


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def _extraction_step_packed_out_impl(flat, offsets, lengths, frame_offsets,
                                     t, n_pk, cfg, feature, mesh,
                                     wire_dtype=None):
    feats, _, moments = _packed_mapped(flat, offsets, lengths, t, cfg,
                                       feature, mesh)
    packed = _pack_frame_tree(feats, lengths, frame_offsets, cfg, feature,
                              n_pk)
    return _cast_wire(packed, wire_dtype), moments


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _extraction_step_out_impl(signals, lengths, frame_offsets, n_pk, cfg,
                              feature, mesh, wire_dtype=None):
    multi = isinstance(feature, tuple)
    if multi:
        feats, _, moments = _extraction_step_multi_impl(
            signals, lengths, cfg, feature, mesh
        )
    else:
        feats, _, moments = _extraction_step_impl(
            signals, lengths, cfg, feature, mesh
        )
    packed = _pack_frame_tree(feats, lengths, frame_offsets, cfg, feature,
                              n_pk)
    return _cast_wire(packed, wire_dtype), moments


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _unpack_resample_impl(flat, offsets, lengths, t, up, down):
    """Unpack the flat buffer to a padded (B, t) float32 block and polyphase
    resample it by up/down — one program, so the tunnel H2D carries only the
    packed source-rate samples.  GSPMD shards rows from offsets' sharding."""
    from ..ops.resample import resample_poly

    pos = jnp.arange(t, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(offsets[:, None].astype(jnp.int32) + pos,
                      flat.shape[0] - 1)
    x = jnp.take(flat, idx, axis=0)
    if x.dtype == jnp.int16:
        x = x.astype(jnp.float32) * jnp.asarray(1.0 / 32768.0, jnp.float32)
    else:
        x = x.astype(jnp.float32)
    sig = jnp.where(pos < lengths[:, None], x, jnp.zeros((), jnp.float32))
    return resample_poly(sig, up, down)


def unpack_resample(flat, offsets, lengths_src, t_src: int, up: int,
                    down: int, mesh: Mesh):
    """Device entry for the packed mixed-rate path: returns the resampled
    (B, t_src*up//down) float32 DEVICE array, rows sharded on the data axis."""
    flat, offsets, lengths_src = jax.device_put(
        (flat, _as_int32(offsets, "packed offset"),
         _as_int32(lengths_src, "clip length")),
        (NamedSharding(mesh, P()), NamedSharding(mesh, P(DATA_AXIS)),
         NamedSharding(mesh, P(DATA_AXIS))),
    )
    return _unpack_resample_impl(flat, offsets, lengths_src, t_src, up, down)


def pack_signals(clips, b_pad: int, mesh: Mesh, flat_align: int = 2048,
                 pcm16_exact=None):
    """Host-side packing for :func:`extraction_step_packed`: concatenate the
    clips' true samples into one flat buffer (int16 when every clip is
    exactly PCM16-representable, float32 otherwise), with per-row offsets.

    ``pcm16_exact``: loader-provided provenance
    (:class:`mfcc_rust_tpu.runtime.loader.ClipMeta.pcm16_exact`).  ``True``
    means every sample is already on the i/32768 grid, so requantization is
    a single exact multiply-and-cast; ``False`` skips int16 packing; ``None``
    (no metadata) falls back to verifying every sample — measurably slower
    on the dispatch thread (VERDICT r2 weak #6).

    Returns (flat, offsets (b_pad,), lengths (b_pad,)).  The flat buffer is
    zero-padded up to a multiple of ``flat_align`` so compiled shapes stay
    few; rows past ``len(clips)`` get offset 0 / length 0 (fully masked)."""
    import numpy as np

    lengths = np.zeros(b_pad, dtype=np.int64)
    offsets = np.zeros(b_pad, dtype=np.int64)
    total = 0
    for r, c in enumerate(clips):
        offsets[r] = total
        lengths[r] = len(c)
        total += len(c)
    n_flat = ((total + flat_align - 1) // flat_align) * flat_align
    n_flat = max(n_flat, flat_align)
    if pcm16_exact:
        # grid samples are i/32768 with |i| <= 32767: the f32 product is the
        # exact integer, so the cast is lossless — one pass, no verify
        flat = np.zeros(n_flat, dtype=np.int16)
        for r, c in enumerate(clips):
            np.multiply(
                c, np.float32(32768.0),
                out=flat[offsets[r] : offsets[r] + len(c)], casting="unsafe",
            )
        return flat, offsets, lengths
    exact = False
    if pcm16_exact is None:
        # no provenance: int16 is exact iff every sample sits on i/32768
        q_clips = []
        exact = True
        for c in clips:
            q = np.rint(np.asarray(c, np.float32) * 32768.0)
            if (np.abs(q) > 32767).any() or not np.array_equal(
                q.astype(np.float32) / np.float32(32768.0),
                np.asarray(c, np.float32),
            ):
                exact = False
                break
            q_clips.append(q.astype(np.int16))
    if exact:
        flat = np.zeros(n_flat, dtype=np.int16)
        for off, q in zip(offsets, q_clips):
            flat[off : off + len(q)] = q
    else:
        flat = np.zeros(n_flat, dtype=np.float32)
        for r, c in enumerate(clips):
            flat[offsets[r] : offsets[r] + len(c)] = c
    return flat, offsets, lengths


def _frame_pack_args(frame_counts, mesh, pack_align: int = 512):
    """(HOST exclusive-cumsum frame offsets, static bucketed packed row
    count) for the packed-output epilogue.  The offsets ship inside the
    caller's single pytree device_put so the link sees one contiguous
    transfer per batch instead of a straggler put."""
    import numpy as np

    from ..utils.bucketing import bucket_length

    counts = np.asarray(frame_counts, dtype=np.int64)
    offs = np.zeros(counts.shape[0], dtype=np.int32)
    np.cumsum(counts[:-1], out=offs[1:])
    n_pk = bucket_length(max(int(counts.sum()), 1), min_bucket=pack_align)
    return offs, n_pk


def extraction_step_packed(flat, offsets, lengths, t: int, cfg: FeatureConfig,
                           mesh: Mesh, feature="mfcc", frame_counts=None,
                           wire_dtype=None):
    """:func:`extraction_step` with the packed host->device layout from
    :func:`pack_signals`: the padded (B, t) signal block is rebuilt ON DEVICE
    from the unpadded flat buffer, so the tunnel/PCIe transfer carries only
    true samples (int16 when lossless).  Same outputs as extraction_step.

    ``frame_counts`` (per-row valid-frame counts from
    :func:`frame_counts_host`) switches on PACKED OUTPUTS: the return value
    becomes ``(packed_feats_tree, moments)`` where each feature leaf is a
    dense (n_pk, ...) buffer of only the valid frames in row-major corpus
    order (row r occupies rows ``cumsum_excl(counts)[r] : +counts[r]``) —
    device->host fetches then skip batch padding and the mask plane.

    ``wire_dtype`` ("float16"/"bfloat16", packed outputs only): quantize the
    feature leaves to a 16-bit wire format on device before the fetch —
    see :func:`_cast_wire` for the error bound.  Moments stay f32."""
    b = offsets.shape[0]
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
            # the halo (frame_len - hop samples) would be negative; this is
            # _chunk_r's frame >= hop condition, without its r <= 8 fusion
            # cap (r > 8 configs still shard fine via gather framing)
            raise ValueError(
                "sequence-parallel framing requires frame_size >= frame_step"
            )
    n_data = mesh.shape[DATA_AXIS]
    n_seq = mesh.shape[SEQ_AXIS]
    if b % n_data:
        raise ValueError(f"batch {b} not divisible by data axis {n_data}")
    if t % (n_seq * hop):
        raise ValueError(
            f"time {t} not divisible by seq axis * hop = {n_seq * hop}"
        )
    key = tuple(feature) if multi else feature
    frame_offs_host = None
    if frame_counts is not None:
        frame_offs_host, n_pk = _frame_pack_args(frame_counts, mesh)
    elif wire_dtype is not None:
        raise ValueError("wire_dtype requires packed outputs (frame_counts)")
    # ONE device_put for every host array of the batch: device_put is
    # asynchronous (r5 span trace — puts return in ms and their transfers
    # pipeline behind the shared link), but one pytree put keeps the batch
    # a single contiguous link transfer.  Already-committed device arrays
    # pass through device_put as no-ops.
    arrays = [flat, _as_int32(offsets, "packed offset"),
              _as_int32(lengths, "clip length")]
    shardings = [NamedSharding(mesh, P()), NamedSharding(mesh, P(DATA_AXIS)),
                 NamedSharding(mesh, P(DATA_AXIS))]
    if frame_offs_host is not None:
        arrays.append(frame_offs_host)
        shardings.append(NamedSharding(mesh, P()))
    put = jax.device_put(tuple(arrays), tuple(shardings))
    if frame_counts is not None:
        flat, offsets, lengths, frame_offsets = put
        return _extraction_step_packed_out_impl(
            flat, offsets, lengths, frame_offsets, t, n_pk, cfg, key, mesh,
            wire_dtype,
        )
    flat, offsets, lengths = put
    return _extraction_step_packed_impl(flat, offsets, lengths, t, cfg, key,
                                        mesh)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _extraction_step_impl(signals, lengths, cfg, feature, mesh):
    mapped = shard_map(
        functools.partial(_local_features, cfg=cfg, feature=feature),
        mesh=mesh,
        in_specs=(P(DATA_AXIS, SEQ_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS, SEQ_AXIS), P(DATA_AXIS, SEQ_AXIS),
                   CorpusMoments(P(), P(), P())),
    )
    return mapped(signals, lengths)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _extraction_step_multi_impl(signals, lengths, cfg, features, mesh):
    sharded = P(DATA_AXIS, SEQ_AXIS)
    feat_specs = {
        name: (sharded, sharded) if name == "mfe" else sharded
        for name in features
    }
    moment_specs = {name: CorpusMoments(P(), P(), P()) for name in features}
    mapped = shard_map(
        functools.partial(_local_multi, cfg=cfg, features=features),
        mesh=mesh,
        in_specs=(sharded, P(DATA_AXIS)),
        out_specs=(feat_specs, sharded, moment_specs),
    )
    return mapped(signals, lengths)


_WIRE16 = (jnp.dtype(jnp.float16), jnp.dtype(jnp.bfloat16))


def _wire_slots(leaf) -> int:
    """f32 slots a leaf occupies in the packed wire buffer: 16-bit leaves
    ride two-per-slot (bitcast pairs), everything else one value per slot."""
    n = 1
    for s in leaf.shape:
        n *= s
    return (n + 1) // 2 if leaf.dtype in _WIRE16 else n


@jax.jit
def _pack_leaves(leaves):
    parts = []
    for x in leaves:
        v = jnp.ravel(x)
        if v.dtype in _WIRE16:
            # two 16-bit values per f32 wire slot: pad to even, bitcast
            # pairs — pure bit transport, the host views the bytes back
            if v.size % 2:
                v = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
            parts.append(
                jax.lax.bitcast_convert_type(v.reshape(-1, 2), jnp.float32)
            )
        else:
            parts.append(v.astype(jnp.float32))
    return jnp.concatenate(parts)


def fetch_outputs(tree):
    """Device->host fetch of an output pytree in ONE transfer.

    On a remote-attached TPU a fetch costs a fixed round-trip latency PLUS
    bytes over a slow link — measured on this image's tunnel ~30 ms fixed +
    19-22 MB/s D2H (exp/d2h_profile.py), so BOTH terms matter at
    feature-batch scale (a 128-clip batch's packed frames are ~4 MB ≈ 200 ms
    of wire).  Packing all leaves into one flat buffer pays the fixed cost
    once; shrinking bytes is the runner's ``packed_output`` (valid frames
    only, +53% end-to-end, exp/corpus_packed_out_ab.py) and ``wire_dtype``
    (f16 wire for the 5x-slower D2H direction).  Falls back to per-leaf
    fetch when a leaf wouldn't survive the f32 round trip (f64 golden-parity
    runs)."""
    import numpy as np

    leaves, treedef = jax.tree.flatten(tree)
    safe = all(
        l.dtype in (jnp.float32.dtype, jnp.bool_.dtype) or l.dtype in _WIRE16
        for l in leaves
    )
    if not safe or len(leaves) < 2:
        return jax.tree.unflatten(treedef, [np.asarray(l) for l in leaves])
    packed = _pack_leaves(tuple(leaves))
    flat = np.asarray(packed)  # the single round trip
    out = []
    ofs = 0
    for l in leaves:
        n = int(np.prod(l.shape)) if l.ndim else 1
        slots = _wire_slots(l)
        if l.dtype in _WIRE16:
            vals = flat[ofs : ofs + slots].view(l.dtype)[:n]
            out.append(vals.reshape(l.shape))
        else:
            out.append(flat[ofs : ofs + slots].reshape(l.shape).astype(l.dtype))
        ofs += slots
    return jax.tree.unflatten(treedef, out)


def extraction_step(
    signals: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: FeatureConfig,
    mesh: Mesh,
    feature: str = "mfcc",
    frame_counts=None,
    wire_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, CorpusMoments]:
    """Sharded batch extraction + global masked moments.

    signals: (B, T) with B % mesh['data'] == 0 and
    T % (mesh['seq'] * hop) == 0; lengths: (B,) true sample counts.
    Returns (features (B, T//hop, D), mask (B, T//hop), CorpusMoments).

    ``feature`` may also be a tuple/list of framed-family names ("mfcc",
    "lmfe", "mfe", "ssc", "energy"): ONE halo exchange + ONE chunk-GEMM
    frontend then feeds every head (the sharded
    :func:`mfcc_rust_tpu.features.extract`), returning
    ({name: feats}, mask, {name: CorpusMoments}).

    ``frame_counts`` switches on packed outputs — see
    :func:`extraction_step_packed`.
    """
    n_data = mesh.shape[DATA_AXIS]
    n_seq = mesh.shape[SEQ_AXIS]
    b, t = signals.shape
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
            # the halo (frame_len - hop samples) would be negative; this is
            # _chunk_r's frame >= hop condition, without its r <= 8 fusion
            # cap (r > 8 configs still shard fine via gather framing)
            raise ValueError(
                "sequence-parallel framing requires frame_size >= frame_step"
            )
    if b % n_data:
        raise ValueError(f"batch {b} not divisible by data axis {n_data}")
    if t % (n_seq * hop):
        raise ValueError(
            f"time {t} not divisible by seq axis * hop = {n_seq * hop}"
        )
    key = tuple(feature) if multi else feature
    if frame_counts is not None:
        frame_offs_host, n_pk = _frame_pack_args(frame_counts, mesh)
        signals, lengths, frame_offsets = jax.device_put(
            (signals, _as_int32(lengths, "clip length"), frame_offs_host),
            (NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS)),
             NamedSharding(mesh, P(DATA_AXIS)), NamedSharding(mesh, P())),
        )
        return _extraction_step_out_impl(
            signals, lengths, frame_offsets, n_pk, cfg, key, mesh, wire_dtype
        )
    if wire_dtype is not None:
        raise ValueError("wire_dtype requires packed outputs (frame_counts)")
    signals, lengths = jax.device_put(
        (signals, _as_int32(lengths, "clip length")),
        (NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS)),
         NamedSharding(mesh, P(DATA_AXIS))),
    )
    if multi:
        return _extraction_step_multi_impl(signals, lengths, cfg, key, mesh)
    return _extraction_step_impl(signals, lengths, cfg, feature, mesh)
