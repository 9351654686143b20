"""Multi-device tests on the 8-virtual-CPU mesh: halo-exchange framing
equivalence, sharded extraction vs single-device pipeline, psum'd corpus
moments vs numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

import mfcc_rust_tpu as m
from mfcc_rust_tpu import features as F
from mfcc_rust_tpu.ops import stft as S
from mfcc_rust_tpu.parallel import (
    CorpusMoments,
    extraction_step,
    halo,
    make_mesh,
    psum_moments,
    tree_merge,
)
from mfcc_rust_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS
from tests.golden import speechpy_ref as sp

CFG = m.speechpy_config(16000).replace(dtype="float64")


def test_halo_left_matches_vorbis_batch(rng):
    """Time-sharded vorbis framing over 4 seq shards == single-device frames."""
    mesh = make_mesh(n_data=2, n_seq=4)
    cfg = m.vorbis_config(16000).replace(dtype="float64")
    hop = cfg.stream_hop
    t = hop * 16  # divisible by 4 shards * hop
    sig = jnp.asarray(rng.normal(0, 0.1, (2, t)))

    def local(x):
        return halo.sharded_stft_vorbis_power(x, cfg, SEQ_AXIS)

    out = jax.jit(
        shard_map(local, mesh=mesh, in_specs=P(DATA_AXIS, SEQ_AXIS),
                  out_specs=P(DATA_AXIS, SEQ_AXIS))
    )(sig)
    # single-device computed frames (pre-npad layout): chunk-indexed
    ref_frames = S._vorbis_frames(sig, cfg)
    xr, xi = m.ops.spectrum.rdft(ref_frames, cfg, windowed=True)
    ref = (xr * xr + xi * xi) * (cfg.wnorm**2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12, atol=1e-15)


def test_extraction_step_matches_pipeline(rng):
    mesh = make_mesh(n_data=4, n_seq=2)
    cfg = m.speechpy_config(16000)
    hop = cfg.frame_step
    t = hop * 100  # 1 s
    b = 8
    sigs = rng.normal(0, 0.1, (b, t)).astype(np.float32)
    lengths = np.full((b,), t)
    feats, mask, moments = extraction_step(sigs, lengths, cfg, mesh)
    feats, mask = np.asarray(feats), np.asarray(mask)
    assert feats.shape == (b, t // hop, 13)

    # per-utterance single-device check on the masked (valid) frames
    n_valid = int(np.floor((t - cfg.frame_size) / hop))
    assert mask.sum() == b * n_valid
    single = np.asarray(F.mfcc(jnp.asarray(sigs), cfg))
    np.testing.assert_allclose(
        feats[:, :n_valid, :], single[:, :n_valid, :], rtol=1e-4, atol=1e-4
    )

    # moments equal the numpy moments over valid frames
    valid = feats[mask.astype(bool)]
    np.testing.assert_allclose(np.asarray(moments.total), valid.sum(0), rtol=1e-4)
    np.testing.assert_allclose(float(moments.count), valid.shape[0])


def test_extraction_step_ragged_lengths(rng):
    """Masked moments must exactly match unpadded per-utterance statistics."""
    mesh = make_mesh(n_data=4, n_seq=1)
    cfg = m.speechpy_config(16000)
    hop = cfg.frame_step
    t = hop * 60
    b = 4
    lengths = np.array([t, t - 777, t - 3200, hop * 30])
    sigs = np.zeros((b, t), np.float32)
    for i, L in enumerate(lengths):
        sigs[i, :L] = rng.normal(0, 0.1, L)
    feats, mask, moments = extraction_step(sigs, lengths, cfg, mesh)
    feats, mask = np.asarray(feats), np.asarray(mask)

    gold_counts = [int(np.floor((L - cfg.frame_size) / hop)) for L in lengths]
    assert mask.sum(axis=1).tolist() == gold_counts

    # golden per-utterance mfcc on the true (unpadded) signals
    all_valid = []
    for i, L in enumerate(lengths):
        g = sp.mfcc(sigs[i, :L].astype(np.float64), 16000)
        np.testing.assert_allclose(
            feats[i, : gold_counts[i]], g[: gold_counts[i]], rtol=3e-3, atol=3e-3
        )
        all_valid.append(feats[i, : gold_counts[i]])
    allv = np.concatenate(all_valid)
    np.testing.assert_allclose(np.asarray(moments.mean), allv.mean(0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(moments.std), allv.std(0), rtol=1e-3, atol=1e-4)


def test_corpus_normalize_matches_cmvn(rng):
    """Corpus moments over ONE utterance reduce to the reference's global
    cmvn (processing.rs:265-300)."""
    from mfcc_rust_tpu.parallel.stats import local_moments

    feat = jnp.asarray(rng.normal(1.0, 2.0, (200, 13)))
    mom = local_moments(feat)
    ours = np.asarray(mom.normalize(feat, True))
    gold = sp.cmvn(np.asarray(feat), True)
    np.testing.assert_allclose(ours, gold, rtol=1e-6, atol=1e-7)


def test_fetch_outputs_single_transfer_roundtrip(rng):
    """The packed device->host fetch must reproduce every leaf exactly
    (f32/bool pytrees) and fall back transparently for f64."""
    import jax.numpy as jnp

    from mfcc_rust_tpu.parallel.data import fetch_outputs
    from mfcc_rust_tpu.parallel.stats import CorpusMoments

    feats = jnp.asarray(rng.normal(0, 1, (4, 7, 13)).astype(np.float32))
    mask = jnp.asarray(rng.random((4, 7)) > 0.5)
    mom = CorpusMoments(
        jnp.float32(28.0),
        jnp.asarray(rng.normal(0, 1, 13).astype(np.float32)),
        jnp.asarray(np.abs(rng.normal(0, 1, 13)).astype(np.float32)),
    )
    tree = ({"a": feats, "mfe": (feats, mask)}, mask, mom)
    out = fetch_outputs(tree)
    chex = jax.tree.leaves(out)
    ref = [np.asarray(l) for l in jax.tree.leaves(tree)]
    assert all(isinstance(l, np.ndarray) for l in chex)
    for got, want in zip(chex, ref):
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(got, want)
    # f64 fallback path
    tree64 = (feats.astype(jnp.float64), mask)
    out64 = fetch_outputs(tree64)
    assert out64[0].dtype == np.float64
    np.testing.assert_array_equal(out64[0], np.asarray(tree64[0]))


def test_tree_merge_deterministic(rng):
    parts = []
    for i in range(5):
        x = jnp.asarray(rng.normal(size=(50, 13)))
        from mfcc_rust_tpu.parallel.stats import local_moments

        parts.append(local_moments(x))
    a = tree_merge(parts)
    b = tree_merge(parts)
    np.testing.assert_array_equal(np.asarray(a.total), np.asarray(b.total))
    total = sum(float(p.count) for p in parts)
    assert float(a.count) == total


def test_graft_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 8 and out.shape[-1] == 13
    ge.dryrun_multichip(8)


def test_extraction_step_melspec(rng):
    """Sharded vorbis mel spectrogram == batch mel_spectrogram after the
    global n_pad layout."""
    cfg = m.vorbis_config(16000, frame_length=0.01)  # hop 160, n_pad 2
    mesh = make_mesh(n_data=2, n_seq=4)
    hop = cfg.stream_hop
    t = hop * 64
    b = 4
    sigs = rng.normal(0, 0.1, (b, t)).astype(np.float32)
    lengths = np.full(b, t)
    feats, mask, moments = extraction_step(sigs, lengths, cfg, mesh, "melspec")
    feats = np.asarray(feats)
    assert feats.shape == (b, t // hop, cfg.num_filters)
    assert np.asarray(mask).all()

    laid_out = np.asarray(S._apply_npad_layout(jnp.asarray(feats), cfg))
    batch = np.asarray(F.mel_spectrogram(jnp.asarray(sigs), cfg))
    np.testing.assert_allclose(
        np.swapaxes(laid_out, -1, -2), batch, rtol=1e-4, atol=1e-6
    )


def test_extraction_step_ssc(rng):
    """Sharded SSC == single-device ssc on valid frames; psum'd moments."""
    mesh = make_mesh(n_data=2, n_seq=2)
    cfg = m.speechpy_config(16000)
    hop = cfg.frame_step
    t = hop * 80
    b = 4
    sigs = rng.normal(0, 0.1, (b, t)).astype(np.float32)
    lengths = np.full(b, t)
    feats, mask, moments = extraction_step(sigs, lengths, cfg, mesh, "ssc")
    feats, mask = np.asarray(feats), np.asarray(mask)
    assert feats.shape == (b, t // hop, cfg.num_filters)
    n_valid = int(np.floor((t - cfg.frame_size) / hop))
    single = np.asarray(F.ssc(jnp.asarray(sigs), cfg))
    np.testing.assert_allclose(
        feats[:, :n_valid], single[:, :n_valid], rtol=2e-3, atol=2e-1
    )
    assert int(moments.count) == b * n_valid


def test_extraction_step_multi_feature(rng):
    """Tuple feature: one frontend pass == the per-feature steps, with
    per-feature psum'd moments."""
    mesh = make_mesh(n_data=2, n_seq=2)
    cfg = m.speechpy_config(16000)
    hop = cfg.frame_step
    t, b = hop * 80, 4
    sigs = rng.normal(0, 0.1, (b, t)).astype(np.float32)
    lengths = np.array([t, t - 777, t - 3200, hop * 40])
    out, mask, moments = extraction_step(
        sigs, lengths, cfg, mesh, ("mfcc", "lmfe", "mfe", "ssc", "energy")
    )
    mask = np.asarray(mask)
    assert sorted(out) == ["energy", "lmfe", "mfcc", "mfe", "ssc"]
    for name in ("mfcc", "lmfe", "ssc"):
        single, smask, smoments = extraction_step(sigs, lengths, cfg, mesh, name)
        np.testing.assert_array_equal(mask, np.asarray(smask))
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(single), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(moments[name].total), np.asarray(smoments.total),
            rtol=1e-6,
        )
    np.testing.assert_allclose(
        np.asarray(out["mfe"][1]), np.asarray(out["energy"]), rtol=1e-7
    )
    # energy moments are over the (B, F, 1) energy column
    valid = np.asarray(out["energy"])[mask.astype(bool)]
    np.testing.assert_allclose(
        np.asarray(moments["energy"].total), valid.sum(keepdims=True), rtol=1e-5
    )
    with pytest.raises(ValueError, match="melspec"):
        extraction_step(sigs, lengths, cfg, mesh, ("mfcc", "melspec"))
    with pytest.raises(ValueError, match="unknown features"):
        extraction_step(sigs, lengths, cfg, mesh, ("mfcc", "plp"))
