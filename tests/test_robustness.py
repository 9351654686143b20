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
    with pytest.raises(ValueError, match="divisible|frame_size"):
        extraction_step(
            np.zeros((4, 3840), np.float32), np.full(4, 3840),
            cfg.replace(frame_stride=0.012), mesh,
        )


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
