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


def test_fetch_outputs_wire16_roundtrip(rng):
    """16-bit wire leaves (f16/bf16, odd and even sizes) ride the single f32
    wire buffer via bitcast pairs and come back bit-exact, mixed freely with
    f32/bool leaves."""
    import jax.numpy as jnp

    from mfcc_rust_tpu.parallel.data import fetch_outputs

    h16 = jnp.asarray(rng.normal(0, 1, (3, 5, 13)).astype(np.float16))  # odd
    h16e = jnp.asarray(rng.normal(0, 1, (4, 8)).astype(np.float16))  # even
    b16 = jnp.asarray(rng.normal(0, 1, 7).astype(np.float32)).astype(
        jnp.bfloat16
    )
    f32 = jnp.asarray(rng.normal(0, 1, (2, 9)).astype(np.float32))
    mask = jnp.asarray(rng.random(11) > 0.5)
    tree = {"a": h16, "b": (h16e, b16), "c": f32, "m": mask}
    out = fetch_outputs(tree)
    for got, want in zip(jax.tree.leaves(out), jax.tree.leaves(tree)):
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_packed_output_wire_f16(rng):
    """wire_dtype="float16" packed outputs: bitwise equal to the f32-wire
    outputs cast to f16 (the cast is the ONLY difference in the device
    program), so the documented error bound is f16 quantization of the same
    values: |err| <= 2^-11 * |x|.  Moments stay f32-identical."""
    from mfcc_rust_tpu.parallel import (extraction_step_packed,
                                        frame_counts_host, pack_signals)

    mesh = make_mesh(n_data=4, n_seq=2)
    cfg = m.speechpy_config(16000)
    hop = cfg.frame_step
    t, b_pad = hop * 60, 4
    lengths = np.array([t, t - 777, t - 3200, hop * 30])
    clips = [_quantize_pcm16(rng.normal(0, 0.1, L).astype(np.float32))
             for L in lengths]
    flat, offsets, lens = pack_signals(clips, b_pad, mesh)
    counts = frame_counts_host(lens, cfg, "mfcc")

    ref, ref_mom = extraction_step_packed(
        flat, offsets, lens, t, cfg, mesh, "mfcc", frame_counts=counts
    )
    out, mom = extraction_step_packed(
        flat, offsets, lens, t, cfg, mesh, "mfcc", frame_counts=counts,
        wire_dtype="float16",
    )
    assert out.dtype == jnp.float16
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(ref).astype(np.float16)
    )
    # quantization bound on the actual feature values
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert (d <= np.abs(np.asarray(ref)) * 2.0**-11 + 1e-6).all()
    np.testing.assert_array_equal(np.asarray(mom.mean),
                                  np.asarray(ref_mom.mean))

    # multi-feature tree: every head quantized, moments untouched
    which = ("mfcc", "mfe")
    mref, _ = extraction_step_packed(
        flat, offsets, lens, t, cfg, mesh, which, frame_counts=counts
    )
    mout, mmom = extraction_step_packed(
        flat, offsets, lens, t, cfg, mesh, which, frame_counts=counts,
        wire_dtype="float16",
    )
    for got, want in zip(jax.tree.leaves(mout), jax.tree.leaves(mref)):
        assert got.dtype == jnp.float16
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want).astype(np.float16)
        )
    assert all(l.dtype == np.float32
               for l in jax.tree.leaves(mmom))

    # wire_dtype without packed outputs is an explicit error
    with pytest.raises(ValueError, match="wire_dtype"):
        extraction_step_packed(flat, offsets, lens, t, cfg, mesh, "mfcc",
                               wire_dtype="float16")


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


# ------------------------------------------------------- packed H2D layout --
def _quantize_pcm16(x):
    """Snap float32 samples onto the PCM16 grid (what a WAV decode yields)."""
    return (np.rint(x * 32768.0).clip(-32768, 32767).astype(np.float32)
            / np.float32(32768.0))


def test_extraction_step_packed_matches_padded(rng):
    """pack_signals + extraction_step_packed == extraction_step on the
    host-padded batch: the device-side unpack (int16 path) reconstructs the
    identical float32 signal block, ragged lengths and seq sharding
    included."""
    from mfcc_rust_tpu.parallel import extraction_step_packed, pack_signals

    mesh = make_mesh(n_data=4, n_seq=2)
    cfg = m.speechpy_config(16000)
    hop = cfg.frame_step
    t, b = hop * 60, 4
    lengths = np.array([t, t - 777, t - 3200, hop * 30])
    clips = [_quantize_pcm16(rng.normal(0, 0.1, L).astype(np.float32))
             for L in lengths]
    b_pad = 8  # exercise fully-masked padding rows too
    sigs = np.zeros((b_pad, t), np.float32)
    for i, c in enumerate(clips):
        sigs[i, : len(c)] = c
    lens_pad = np.zeros(b_pad, np.int64)
    lens_pad[:b] = lengths

    ref_feats, ref_mask, ref_mom = extraction_step(sigs, lens_pad, cfg, mesh)
    flat, offsets, lens = pack_signals(clips, b_pad, mesh)
    assert flat.dtype == np.int16  # PCM-grid clips take the half-size path
    np.testing.assert_array_equal(lens, lens_pad)
    feats, mask, mom = extraction_step_packed(
        flat, offsets, lens, t, cfg, mesh
    )
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(ref_feats), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(mom.mean), np.asarray(ref_mom.mean), rtol=1e-6, atol=1e-7
    )
    assert int(mom.count) == int(ref_mom.count)


def test_extraction_step_packed_f32_fallback(rng):
    """Clips off the PCM16 grid must fall back to a float32 flat buffer and
    still match the padded step exactly."""
    from mfcc_rust_tpu.parallel import extraction_step_packed, pack_signals

    mesh = make_mesh(n_data=2, n_seq=1)
    cfg = m.speechpy_config(16000)
    hop = cfg.frame_step
    t, b = hop * 40, 2
    lengths = np.array([t, t - 1234])
    clips = [rng.normal(0, 0.1, L).astype(np.float32) for L in lengths]
    sigs = np.zeros((b, t), np.float32)
    for i, c in enumerate(clips):
        sigs[i, : len(c)] = c

    ref_feats, ref_mask, _ = extraction_step(sigs, lengths, cfg, mesh)
    flat, offsets, lens = pack_signals(clips, b, mesh)
    assert flat.dtype == np.float32
    feats, mask, _ = extraction_step_packed(flat, offsets, lens, t, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(ref_feats), rtol=1e-6, atol=1e-6
    )


def test_extraction_step_packed_multi_and_melspec(rng):
    """Packed layout through the multi-feature head and the vorbis melspec
    framing (stream-hop alignment, ceil(L/hop) masks)."""
    from mfcc_rust_tpu.parallel import extraction_step_packed, pack_signals

    mesh = make_mesh(n_data=2, n_seq=2)
    cfg = m.speechpy_config(16000)
    hop = cfg.frame_step
    t, b = hop * 80, 4
    lengths = np.array([t, t - 777, t - 3200, hop * 40])
    clips = [_quantize_pcm16(rng.normal(0, 0.1, L).astype(np.float32))
             for L in lengths]
    sigs = np.zeros((b, t), np.float32)
    for i, c in enumerate(clips):
        sigs[i, : len(c)] = c
    which = ("mfcc", "lmfe", "energy")
    ref_out, ref_mask, ref_mom = extraction_step(sigs, lengths, cfg, mesh, which)
    flat, offsets, lens = pack_signals(clips, b, mesh)
    out, mask, mom = extraction_step_packed(
        flat, offsets, lens, t, cfg, mesh, which
    )
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))
    for name in which:
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(ref_out[name]),
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(mom[name].total), np.asarray(ref_mom[name].total),
            rtol=1e-6,
        )

    vcfg = m.vorbis_config(16000, frame_length=0.01)
    vt = vcfg.stream_hop * 64
    vclips = [c[: min(len(c), vt)] for c in clips]
    vsigs = np.zeros((b, vt), np.float32)
    vlens = np.zeros(b, np.int64)
    for i, c in enumerate(vclips):
        vsigs[i, : len(c)] = c
        vlens[i] = len(c)
    ref_feats, ref_mask, _ = extraction_step(vsigs, vlens, vcfg, mesh, "melspec")
    flat, offsets, lens = pack_signals(vclips, b, mesh)
    feats, mask, _ = extraction_step_packed(
        flat, offsets, lens, vt, vcfg, mesh, "melspec"
    )
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(ref_feats), rtol=1e-6, atol=1e-6
    )


def test_extraction_step_hop_misaligned_frames(rng):
    """Frames spanning a non-integer number of hops (25 ms / 10 ms ->
    400/160, r = ceil = 3 via the zero-padded wall) are now allowed on the
    sharded path and must match the single-device pipeline and the f64
    oracle."""
    mesh = make_mesh(n_data=2, n_seq=2)
    cfg = m.speechpy_config(16000).replace(dtype="float64",
                                           frame_length=0.025)
    hop = cfg.frame_step
    t, b = hop * 50, 2
    lengths = np.array([t, t - 1234])
    sigs = np.zeros((b, t))
    for i, L in enumerate(lengths):
        sigs[i, :L] = rng.normal(0, 0.1, L)

    feats, mask, _ = extraction_step(sigs, lengths, cfg, mesh)
    for i, L in enumerate(lengths):
        n_valid = int(np.asarray(mask)[i].sum())
        gold = sp.mfcc(sigs[i, :L], 16000, frame_length=0.025)
        assert n_valid == gold.shape[0]
        np.testing.assert_allclose(
            np.asarray(feats)[i, :n_valid], gold, rtol=1e-7, atol=1e-9
        )


def test_packed_output_matches_padded_rows(rng):
    """frame_counts= packed-output epilogue: the dense (n_pk, ...) buffers
    hold exactly the padded step's valid rows (bitwise — same device program
    prefix, the epilogue only gathers), in row-major corpus order, zeros in
    the bucket tail; moments identical."""
    from mfcc_rust_tpu.parallel import (extraction_step,
                                        extraction_step_packed,
                                        frame_counts_host, pack_signals)

    mesh = make_mesh(n_data=4, n_seq=2)
    cfg = m.speechpy_config(16000)
    hop = cfg.frame_step
    t, b = hop * 60, 4
    lengths = np.array([t, t - 777, t - 3200, hop * 30])
    clips = [_quantize_pcm16(rng.normal(0, 0.1, L).astype(np.float32))
             for L in lengths]
    b_pad = 8  # fully-masked padding rows occupy no packed positions
    flat, offsets, lens = pack_signals(clips, b_pad, mesh)
    counts = frame_counts_host(lens, cfg, "mfcc")

    ref_feats, ref_mask, ref_mom = extraction_step_packed(
        flat, offsets, lens, t, cfg, mesh
    )
    pk, mom = extraction_step_packed(
        flat, offsets, lens, t, cfg, mesh, "mfcc", frame_counts=counts
    )
    pk = np.asarray(pk)
    # host counts mirror the device mask exactly
    np.testing.assert_array_equal(counts,
                                  np.asarray(ref_mask).sum(axis=1))
    off = 0
    for r, c in enumerate(counts):
        np.testing.assert_array_equal(pk[off : off + c],
                                      np.asarray(ref_feats)[r, :c])
        off += c
    assert pk.shape[0] >= off and not pk[off:].any()  # zeroed bucket tail
    np.testing.assert_array_equal(np.asarray(mom.mean),
                                  np.asarray(ref_mom.mean))
    assert int(mom.count) == int(ref_mom.count)

    # multi-feature tuple (incl. the (mel, energies) mfe head) through the
    # unpacked-signal entry point
    sigs = np.zeros((b_pad, t), np.float32)
    for i, c in enumerate(clips):
        sigs[i, : len(c)] = c
    which = ("mfcc", "mfe", "energy")
    ref_out, ref_mask, _ = extraction_step(sigs, lens, cfg, mesh, which)
    out, _ = extraction_step(sigs, lens, cfg, mesh, which,
                             frame_counts=counts)
    for name in which:
        ref_leaf = ref_out[name][0] if name == "mfe" else ref_out[name]
        leaf = np.asarray(out[name][0] if name == "mfe" else out[name])
        off = 0
        for r, c in enumerate(counts):
            np.testing.assert_array_equal(leaf[off : off + c],
                                          np.asarray(ref_leaf)[r, :c])
            off += c

    # melspec framing (ceil(L/hop) counts, left-halo seq sharding)
    vcfg = m.vorbis_config(16000, frame_length=0.01)
    vt = vcfg.stream_hop * 64
    vclips = [c[: min(len(c), vt)] for c in clips]
    vflat, voffsets, vlens = pack_signals(vclips, b_pad, mesh)
    vcounts = frame_counts_host(vlens, vcfg, "melspec")
    ref_feats, ref_mask, _ = extraction_step_packed(
        vflat, voffsets, vlens, vt, vcfg, mesh, "melspec"
    )
    np.testing.assert_array_equal(vcounts,
                                  np.asarray(ref_mask).sum(axis=1))
    vpk, _ = extraction_step_packed(
        vflat, voffsets, vlens, vt, vcfg, mesh, "melspec",
        frame_counts=vcounts,
    )
    vpk = np.asarray(vpk)
    off = 0
    for r, c in enumerate(vcounts):
        np.testing.assert_array_equal(vpk[off : off + c],
                                      np.asarray(ref_feats)[r, :c])
        off += c


def test_unpack_resample_matches_padded(rng):
    """Packed source-rate transfer + fused device unpack/resample == the
    padded host batch through resample_poly."""
    import jax

    from mfcc_rust_tpu.ops.resample import resample_poly
    from mfcc_rust_tpu.parallel import pack_signals, unpack_resample

    mesh = make_mesh(n_data=2, n_seq=1)
    up, down = 2, 1  # 8 kHz -> 16 kHz
    t_src, b = 8192, 2
    lengths = np.array([t_src, t_src - 999])
    clips = [_quantize_pcm16(rng.normal(0, 0.1, L).astype(np.float32))
             for L in lengths]
    sigs = np.zeros((b, t_src), np.float32)
    for i, c in enumerate(clips):
        sigs[i, : len(c)] = c
    ref = np.asarray(jax.jit(resample_poly, static_argnums=(1, 2))(
        jnp.asarray(sigs), up, down))
    flat, offsets, lens = pack_signals(clips, b, mesh)
    out = np.asarray(unpack_resample(flat, offsets, lens, t_src, up, down, mesh))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)
