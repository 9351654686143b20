"""Edge cases and error paths across the public surface."""

import jax.numpy as jnp
import numpy as np
import pytest

import mfcc_rust_tpu as m
from mfcc_rust_tpu import features as F
from mfcc_rust_tpu.models import StreamingExtractor
from mfcc_rust_tpu.ops import stft as S
from tests.golden import dfn_ref


def test_streaming_extractor_power_mode(rng):
    cfg = m.vorbis_config(16000).replace(dtype="float64")
    hop = cfg.stream_hop
    sig = rng.normal(0, 0.1, hop * 12)
    sess = StreamingExtractor(cfg, mel=False)
    out = np.concatenate([sess.process(sig), sess.finalize()], axis=0)
    gold = np.abs(dfn_ref.stft1(sig, 512, None, 16000, 0.02)) ** 2
    assert out.shape == gold.shape
    np.testing.assert_allclose(out, gold, rtol=1e-9, atol=1e-15)


def test_streaming_rejects_partial_hop(rng):
    cfg = m.vorbis_config(16000)
    with pytest.raises(ValueError, match="multiple of hop"):
        S.stft_streaming(jnp.zeros(100), cfg)


def test_halo_rejects_partial_hop():
    from mfcc_rust_tpu.parallel import halo

    with pytest.raises(ValueError, match="multiple of hop"):
        # outside shard_map the axis lookup never happens; the length check
        # fires first
        halo.sharded_frames_left_halo(jnp.zeros(100), 512, 320, "seq")


def test_extraction_step_validation(rng):
    from mfcc_rust_tpu.parallel import extraction_step, make_mesh

    mesh = make_mesh(n_data=4, n_seq=2)
    cfg = m.speechpy_config(16000)
    with pytest.raises(ValueError, match="batch"):
        extraction_step(np.zeros((3, 3200), np.float32), np.full(3, 3200), cfg, mesh)
    with pytest.raises(ValueError, match="time"):
        extraction_step(np.zeros((4, 3201), np.float32), np.full(4, 3201), cfg, mesh)
    # hop-misaligned frames (320/192) are ALLOWED now (zero-padded wall);
    # only frame < hop (gaps between frames break the halo identity) raises
    with pytest.raises(ValueError, match="frame_size >= frame_step"):
        extraction_step(
            np.zeros((4, 4000), np.float32), np.full(4, 4000),
            cfg.replace(frame_stride=0.025), mesh,
        )
    f, mask, _ = extraction_step(
        np.zeros((4, 3840), np.float32), np.full(4, 3840),
        cfg.replace(frame_stride=0.012), mesh,
    )
    assert f.shape[1] == 3840 // 192


def test_api_accepts_lists():
    out = m.mfcc([0.01] * 8000, 16000)
    assert out.shape[1] == 13


def test_ct_fused_nondefault_hop_and_fmax(rng):
    """CT-fused librosa path with hop=256 and fmax set (trims nothing but
    exercises the permuted projection) vs the fft lowering in f64."""
    y = jnp.asarray(rng.normal(0, 0.1, 22050))
    base = m.librosa_config(22050, hop_length=256, fmax=8000.0).replace(dtype="float64")
    a = np.asarray(F.mel_spectrogram_librosa(y, base))  # auto -> ct fused
    b = np.asarray(F.mel_spectrogram_librosa(y, base.replace(fft_impl="fft")))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10)


def test_ct_fused_uncentered(rng):
    y = jnp.asarray(rng.normal(0, 0.1, 22050))
    base = m.librosa_config(22050).replace(dtype="float64", center=False)
    a = np.asarray(F.mel_spectrogram_librosa(y, base))
    b = np.asarray(F.mel_spectrogram_librosa(y, base.replace(fft_impl="fft")))
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10)


def test_runner_empty_corpus(tmp_path):
    from mfcc_rust_tpu.parallel import make_mesh
    from mfcc_rust_tpu.parallel.runner import CorpusRunner

    r = CorpusRunner([], m.speechpy_config(16000), make_mesh(n_data=1, n_seq=1))
    moments = r.run()
    assert float(moments.count) == 0


def test_checkpoint_fingerprint_guard(tmp_path, rng):
    from mfcc_rust_tpu.parallel.runner import CheckpointStore

    cfg = m.speechpy_config(16000)
    ck = tmp_path / "s.npz"
    st = CheckpointStore(str(ck), 10, cfg, 13)
    st.save()
    # different config -> refuse to resume
    with pytest.raises(ValueError, match="different"):
        CheckpointStore(str(ck), 10, cfg.replace(num_filters=26), 13)


def test_config_hashable_and_jit_cache():
    import jax

    cfg1 = m.speechpy_config(16000)
    cfg2 = m.speechpy_config(16000)
    assert hash(cfg1) == hash(cfg2) and cfg1 == cfg2
    calls = []

    @jax.jit
    def probe(x):
        calls.append(1)
        return x + 1

    probe(jnp.zeros(3))
    probe(jnp.ones(3))
    assert len(calls) == 1  # same shape -> one trace


def test_cli_end_to_end(tmp_path, rng):
    from mfcc_rust_tpu.cli import main as cli_main
    from mfcc_rust_tpu.runtime import write_wav

    for i in range(4):
        clip = rng.normal(0, 0.1, 8000 + 500 * i).astype(np.float32).clip(-1, 1)
        write_wav(str(tmp_path / f"u{i}.wav"), clip, 16000)
    out = tmp_path / "feats"
    rc = cli_main([
        str(tmp_path / "*.wav"), "--out-dir", str(out),
        "--checkpoint", str(tmp_path / "ck.npz"),
        "--cmvn-out", str(tmp_path / "cmvn.npz"),
        "--batch-size", "2", "--quiet",
    ])
    assert rc == 0
    assert sorted(p.name for p in out.glob("*.npy")) == [f"u{i}.npy" for i in range(4)]
    z = np.load(tmp_path / "cmvn.npz")
    assert z["mean"].shape == (13,) and z["count"] > 0


def test_cli_no_inputs(tmp_path):
    from mfcc_rust_tpu.cli import main as cli_main

    rc = cli_main([str(tmp_path / "none/*.wav"), "--out-dir", str(tmp_path)])
    assert rc == 2


# ---- fixes from the code-review pass ----------------------------------------
def test_checkpoint_fingerprint_stable_across_processes(tmp_path):
    """hash(cfg) is PYTHONHASHSEED-salted; the fingerprint must come from a
    stable digest or cross-process resume always fails."""
    import subprocess
    import sys as _sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from mfcc_rust_tpu import speechpy_config;"
        "from mfcc_rust_tpu.parallel.runner import _config_fingerprint;"
        "print(_config_fingerprint(speechpy_config(16000), 10, 13))"
    )
    outs = {
        subprocess.run([_sys.executable, "-c", code], capture_output=True,
                       text=True, env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin",
                                       "JAX_PLATFORMS": "cpu"},
                       ).stdout.strip().splitlines()[-1]
        for seed in ("1", "2")
    }
    assert len(outs) == 1, f"fingerprint differs across hash seeds: {outs}"


def test_runner_output_name_collisions(tmp_path, rng):
    from mfcc_rust_tpu.parallel import make_mesh
    from mfcc_rust_tpu.parallel.runner import CorpusRunner
    from mfcc_rust_tpu.runtime import write_wav

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    clips = {}
    for d in ["a", "b"]:
        clip = rng.normal(0, 0.1, 8000).astype(np.float32).clip(-1, 1)
        write_wav(str(tmp_path / d / "x.wav"), clip, 16000)
        clips[d] = clip
    out = tmp_path / "feats"
    r = CorpusRunner([str(tmp_path / "a/x.wav"), str(tmp_path / "b/x.wav")],
                     m.speechpy_config(16000), make_mesh(n_data=1, n_seq=1),
                     batch_size=2, out_dir=str(out))
    r.run()
    names = sorted(p.name for p in out.glob("*.npy"))
    assert names == ["x.npy", "x_000001.npy"]
    a = np.load(out / "x.npy")
    b = np.load(out / "x_000001.npy")
    assert not np.array_equal(a, b)  # both utterances really written


def test_runner_output_name_uniquing_property():
    """N colliding stems -> N distinct, deterministic names (VERDICT r1 #9):
    the uniquing pass must stay stable across restarts and survive adversarial
    stems that collide with the suffix scheme itself."""
    from mfcc_rust_tpu.parallel.runner import CorpusRunner

    paths = (
        [f"d{j}/x.wav" for j in range(40)]            # 40-way stem collision
        + ["a/x_000001.wav", "b/x_000001.wav"]        # collides with suffixes
        + ["c/x_000001_.wav"]                          # collides with the bump
        + [f"e/u{j}.wav" for j in range(10)]           # unique stems untouched
    )

    from mfcc_rust_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=1, n_seq=1)
    r1 = CorpusRunner(paths, m.speechpy_config(16000), mesh)
    r2 = CorpusRunner(paths, m.speechpy_config(16000), mesh)
    vals = list(r1._out_names.values())
    assert len(set(vals)) == len(paths)           # all distinct
    assert r1._out_names == r2._out_names         # deterministic across runs
    assert r1._out_names[0] == "x.npy"            # first occurrence keeps stem
    for j in range(10):
        assert r1._out_names[43 + j] == f"u{j}.npy"  # unique stems untouched


def test_loader_stereo_native(tmp_path, rng):
    """Interleaved (mix_mono=False) multi-channel decode through the native
    prefetch loader must not overflow and must return (frames, ch)."""
    from mfcc_rust_tpu.runtime import AudioLoader, write_wav

    stereo = rng.normal(0, 0.2, (48000, 2)).astype(np.float32).clip(-1, 1)
    p = str(tmp_path / "st.wav")
    write_wav(p, stereo, 16000)
    items = list(AudioLoader([p], n_threads=1, mix_mono=False, max_seconds=10))
    assert len(items) == 1
    _, data, sr, meta = items[0]
    assert data.shape == (48000, 2) and sr == 16000
    assert meta.src_channels == 2 and not meta.pcm16_exact
    np.testing.assert_allclose(data, stereo, atol=1.0 / 10000)


def test_fast_path_rejects_frame_longer_than_fft(rng):
    """frame_size > fft_points must use the gather+truncation lowering and
    match the golden (np.fft.rfft(n=...) truncation semantics)."""
    from mfcc_rust_tpu.features import _fast_path_ok
    from tests.golden import speechpy_ref as sp

    cfg = m.FeatureConfig(sample_rate=16000, frame_length=0.04,
                          frame_stride=0.008, dtype="float64")
    assert cfg.frame_size == 640 > cfg.fft_points
    assert not _fast_path_ok(cfg)
    sig = rng.normal(0, 0.1, 16000)
    gold = sp.mfcc(sig, 16000, frame_length=0.04, frame_stride=0.008)
    ours = np.asarray(F.mfcc(jnp.asarray(sig), cfg))
    assert ours.shape == gold.shape
    np.testing.assert_allclose(ours, gold, rtol=1e-9, atol=1e-11)


def test_vorbis_config_rejects_hop_gt_fft():
    with pytest.raises(ValueError, match="fft_points"):
        m.vorbis_config(16000, frame_length=0.05)  # hop 800 > 512


def test_power_to_db_per_spectrogram(rng):
    """Batched top_db clamps each spectrogram against its own max."""
    from mfcc_rust_tpu.ops.spectrum import power_to_db

    loud = np.abs(rng.normal(0, 100.0, (40, 50))) + 1.0
    quiet = loud * 1e-6
    batch = jnp.asarray(np.stack([loud, quiet]))
    out = np.asarray(power_to_db(batch))
    single = np.asarray(power_to_db(jnp.asarray(quiet)))
    np.testing.assert_allclose(out[1], single, atol=1e-5)


def test_loader_truncation_warning(tmp_path, rng):
    from mfcc_rust_tpu.runtime import AudioLoader, write_wav

    clip = rng.normal(0, 0.1, 32000).astype(np.float32).clip(-1, 1)
    p = str(tmp_path / "long.wav")
    write_wav(p, clip, 16000)
    with pytest.warns(UserWarning, match="truncated"):
        items = list(AudioLoader([p], max_seconds=1.0, max_sample_rate=16000))
    assert items[0][1].shape == (16000,)
