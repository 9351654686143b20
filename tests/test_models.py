"""Pipeline objects and the explicit-carry streaming session."""

import jax.numpy as jnp
import pytest
import numpy as np

import mfcc_rust_tpu as m
from mfcc_rust_tpu import features as F
from mfcc_rust_tpu.models import (
    FeatureExtractor,
    MFCCPipeline,
    StreamingExtractor,
)
from tests.golden import dfn_ref


def test_mfcc_pipeline(rng):
    cfg = m.speechpy_config(16000).replace(dtype="float64")
    sig = jnp.asarray(rng.normal(0, 0.1, 16000))
    pipe = MFCCPipeline(cfg)
    np.testing.assert_allclose(
        np.asarray(pipe(sig)), np.asarray(F.mfcc(sig, cfg)), rtol=1e-12, atol=1e-12
    )


def test_feature_extractor(rng):
    fx = FeatureExtractor(sample_rate=16000)
    sig = jnp.asarray(rng.normal(0, 0.1, (2, 8000)).astype(np.float32))
    out = fx(sig)
    assert out.shape == (2, 48, 13)
    feats, energies = fx.mfe(sig)
    assert feats.shape == (2, 48, 40) and energies.shape == (2, 48)
    assert fx.ssc(sig).shape == (2, 48, 40)
    ms = fx.mel_spectrogram(sig)
    assert ms.shape[:2] == (2, 40)


def test_streaming_session_equals_reference(rng):
    """Chunked streaming session output (incl. warm-up drop + finalize tail)
    must equal the golden stateful reference exactly."""
    cfg = m.vorbis_config(16000, frame_length=0.01).replace(dtype="float64")
    assert cfg.stream_n_pad == 2
    hop = cfg.stream_hop
    sig = rng.normal(0, 0.1, hop * 37)

    gold = dfn_ref.mel_spectrogram1(sig, 16000, frame_length=0.01).T  # (T', M)

    sess = StreamingExtractor(cfg)
    chunks = [sig[: hop * 5], sig[hop * 5 : hop * 20], sig[hop * 20 :]]
    outs = [sess.process(c) for c in chunks]
    outs.append(sess.finalize())
    ours = np.concatenate(outs, axis=0)
    assert ours.shape == gold.shape
    np.testing.assert_allclose(ours, gold, rtol=1e-9, atol=1e-15)


def test_streaming_session_reset(rng):
    cfg = m.vorbis_config(16000).replace(dtype="float64")
    hop = cfg.stream_hop
    sig = rng.normal(0, 0.1, hop * 10)
    sess = StreamingExtractor(cfg)
    a = sess.process(sig)
    sess.reset()
    b = sess.process(sig)
    np.testing.assert_array_equal(a, b)


class TestStreamingFeatures:
    def test_streaming_mfcc_equals_batch(self, rng):
        from mfcc_rust_tpu.models import StreamingFeatures

        cfg = m.speechpy_config(16000).replace(dtype="float64")
        sig = rng.normal(0, 0.1, 16000)
        sess = StreamingFeatures(cfg)
        outs = []
        # ragged chunk sizes incl. ones smaller than a frame
        cuts = [0, 100, 413, 1000, 5000, 5003, 12000, 16000]
        for a, b in zip(cuts[:-1], cuts[1:]):
            outs.append(sess.process(sig[a:b]))
        stream = np.concatenate(outs, axis=0)
        batch = np.asarray(F.mfcc(jnp.asarray(sig), cfg))
        assert stream.shape == batch.shape
        np.testing.assert_allclose(stream, batch, rtol=1e-12, atol=1e-13)

    def test_streaming_lmfe_and_mfe(self, rng):
        from mfcc_rust_tpu.models import StreamingFeatures

        cfg = m.speechpy_config(16000).replace(dtype="float64")
        sig = rng.normal(0, 0.1, 8000)
        s1 = StreamingFeatures(cfg, feature="lmfe")
        out = np.concatenate([s1.process(sig[:3000]), s1.process(sig[3000:])], 0)
        np.testing.assert_allclose(out, np.asarray(F.lmfe(jnp.asarray(sig), cfg)),
                                   rtol=1e-12, atol=1e-13)
        s2 = StreamingFeatures(cfg, feature="mfe")
        f1, e1 = s2.process(sig[:4096])
        f2, e2 = s2.process(sig[4096:])
        bf, be = F.mfe(jnp.asarray(sig), cfg)
        np.testing.assert_allclose(np.concatenate([f1, f2]), np.asarray(bf),
                                   rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(np.concatenate([e1, e2]), np.asarray(be),
                                   rtol=1e-12, atol=1e-13)

    def test_short_feed_emits_nothing_then_resumes(self, rng):
        from mfcc_rust_tpu.models import StreamingFeatures

        sess = StreamingFeatures(m.speechpy_config(16000))
        assert sess.process(np.zeros(100, np.float32)).shape == (0, 13)
        out = sess.process(rng.normal(0, 0.1, 2000).astype(np.float32))
        assert out.shape[0] == (2100 - 320) // 160

    def test_rejects_unknown_feature(self):
        from mfcc_rust_tpu.models import StreamingFeatures

        with pytest.raises(ValueError):
            StreamingFeatures(m.speechpy_config(16000), feature="ssc")

    def test_streaming_librosa_mel_equals_batch(self, rng):
        from mfcc_rust_tpu.models import StreamingFeatures

        cfg = m.librosa_config(22050).replace(dtype="float64", center=False)
        sig = rng.normal(0, 0.1, 44100)
        sess = StreamingFeatures(cfg, feature="mel_librosa")
        assert sess.cfg.center is False
        outs = []
        # ragged chunks, incl. sub-frame ones (librosa.stream-style blocks)
        cuts = [0, 500, 2048, 2100, 9000, 22050, 22051, 40000, 44100]
        for a, b in zip(cuts[:-1], cuts[1:]):
            outs.append(sess.process(sig[a:b]))
        stream = np.concatenate(outs, axis=0)
        batch = np.asarray(F.mel_spectrogram_librosa(jnp.asarray(sig), cfg)).T
        assert stream.shape == batch.shape
        np.testing.assert_allclose(stream, batch, rtol=1e-10, atol=1e-12)
        # reset gives a fresh, identical session
        sess.reset()
        again = np.concatenate([sess.process(sig[:22050]),
                                sess.process(sig[22050:])], axis=0)
        np.testing.assert_allclose(again, batch, rtol=1e-10, atol=1e-12)

    def test_streaming_librosa_mel_hop_misaligned(self, rng):
        """16 kHz production config (512/160, hop does not divide n_fft):
        streams through the recompute fallback (the carried frontend's
        chunk-quantized clock would lag true frame readiness under ragged
        feeds) and stays batch-equal."""
        from mfcc_rust_tpu.models import StreamingFeatures

        cfg = m.librosa_config(16000, n_fft=512, hop_length=160, n_mels=80
                               ).replace(dtype="float64", center=False)
        sig = rng.normal(0, 0.1, 24000)
        sess = StreamingFeatures(cfg, feature="mel_librosa")
        assert sess._inc is None  # chunk clock can't serve misaligned hops
        cuts = [0, 160, 512, 700, 9000, 16000, 24000]
        outs = [sess.process(sig[a:b]) for a, b in zip(cuts[:-1], cuts[1:])]
        stream = np.concatenate(outs, axis=0)
        batch = np.asarray(F.mel_spectrogram_librosa(jnp.asarray(sig), cfg)).T
        assert stream.shape == batch.shape
        np.testing.assert_allclose(stream, batch, rtol=1e-10, atol=1e-12)

    def test_streaming_librosa_mel_frame_size_neq_fft(self):
        """mel_spectrogram_librosa frames by fft_points, not frame_size — a
        config where the two differ must be rejected up front instead of
        silently emitting truncated frames (ADVICE r1)."""
        from mfcc_rust_tpu.models import StreamingFeatures

        bad = m.librosa_config(22050).replace(frame_length_samples=1024)
        with pytest.raises(ValueError, match="frame_size == fft_points"):
            StreamingFeatures(bad, feature="mel_librosa")
        with pytest.raises(ValueError, match="frames by fft_points"):
            F.mel_spectrogram_librosa(jnp.zeros(4096), bad)

    def test_streaming_librosa_mel_short_window(self, rng):
        """win_length < n_fft (the librosa way to get a short analysis
        window) streams exactly batch-equal."""
        from mfcc_rust_tpu.models import StreamingFeatures

        cfg = m.librosa_config(22050, win_length=1024).replace(
            dtype="float64", center=False
        )
        sig = rng.normal(0, 0.1, 44100)
        sess = StreamingFeatures(cfg, feature="mel_librosa")
        outs = [sess.process(sig[a:b]) for a, b in
                [(0, 1500), (1500, 2100), (2100, 30000), (30000, 44100)]]
        stream = np.concatenate(outs, axis=0)
        batch = np.asarray(F.mel_spectrogram_librosa(jnp.asarray(sig), cfg)).T
        assert stream.shape == batch.shape
        np.testing.assert_allclose(stream, batch, rtol=1e-10, atol=1e-12)

    def test_incremental_engaged_and_hop_chunks_equal_batch(self, rng):
        """The carried chunk-GEMM frontend must engage for the fast-path
        families and stay exactly batch-equal under 1-hop real-time chunks
        (VERDICT r1 #8)."""
        from mfcc_rust_tpu.models import StreamingFeatures

        cfg = m.speechpy_config(16000).replace(dtype="float64")
        sig = rng.normal(0, 0.1, 16000)
        for feat in ("mfcc", "lmfe"):
            sess = StreamingFeatures(cfg, feature=feat)
            assert sess._inc is not None  # incremental path engaged
            hop = cfg.frame_step
            outs = [sess.process(sig[i : i + hop])
                    for i in range(0, len(sig), hop)]
            stream = np.concatenate(outs, axis=0)
            batch = np.asarray(getattr(F, feat)(jnp.asarray(sig), cfg))
            assert stream.shape == batch.shape
            np.testing.assert_allclose(stream, batch, rtol=1e-10, atol=1e-12)

    def test_incremental_fallback_hop_misaligned_ragged(self, rng):
        """Hop-misaligned frames (25 ms / 10 ms -> 400/160) must NOT engage
        the carried frontend — its chunk-quantized emission clock lags the
        true frame readiness by up to hop - fl%hop samples, which ragged
        feeds expose — and the recompute fallback must stay batch-equal
        under exactly such ragged sub-hop/multi-hop feeds."""
        from mfcc_rust_tpu.models import StreamingFeatures

        cfg = m.speechpy_config(16000).replace(
            dtype="float64", frame_length=0.025
        )
        sess = StreamingFeatures(cfg, feature="mfcc")
        assert sess._inc is None
        sig = rng.normal(0, 0.1, 16000)
        cuts = [0, 160, 400, 431, 512, 700, 4000, 9000, 9100, 16000]
        outs = [sess.process(sig[a:b]) for a, b in zip(cuts[:-1], cuts[1:])]
        stream = np.concatenate(outs, axis=0)
        batch = np.asarray(F.mfcc(jnp.asarray(sig), cfg))
        assert stream.shape == batch.shape
        np.testing.assert_allclose(stream, batch, rtol=1e-10, atol=1e-12)

    def test_incremental_fallback_still_works(self, rng):
        """Configs the carried frontend can't serve (hop-misaligned frame)
        fall back to the recompute path, still batch-equal."""
        from mfcc_rust_tpu.models import StreamingFeatures

        cfg = m.speechpy_config(16000).replace(
            dtype="float64", frame_stride=0.012  # 320 % 192 != 0
        )
        sess = StreamingFeatures(cfg, feature="mfcc")
        assert sess._inc is None
        sig = rng.normal(0, 0.1, 8000)
        outs = [sess.process(sig[:5000]), sess.process(sig[5000:])]
        stream = np.concatenate(outs, axis=0)
        batch = np.asarray(F.mfcc(jnp.asarray(sig), cfg))
        np.testing.assert_allclose(stream, batch, rtol=1e-10, atol=1e-12)

    def test_incremental_mfe_ragged_chunks(self, rng):
        from mfcc_rust_tpu.models import StreamingFeatures

        cfg = m.speechpy_config(16000).replace(dtype="float64")
        sess = StreamingFeatures(cfg, feature="mfe")
        assert sess._inc is not None
        sig = rng.normal(0, 0.1, 12000)
        cuts = [0, 7, 160, 481, 3000, 3001, 9999, 12000]
        mels, ens = [], []
        for a, b in zip(cuts[:-1], cuts[1:]):
            mel, en = sess.process(sig[a:b])
            mels.append(mel)
            ens.append(en)
        bf, be = F.mfe(jnp.asarray(sig), cfg)
        np.testing.assert_allclose(
            np.concatenate(mels), np.asarray(bf), rtol=1e-10, atol=1e-12
        )
        np.testing.assert_allclose(
            np.concatenate(ens), np.asarray(be), rtol=1e-10, atol=1e-12
        )

    def test_streaming_librosa_default_config_forces_uncentered(self):
        from mfcc_rust_tpu.models import StreamingFeatures

        sess = StreamingFeatures(sample_rate=22050, feature="mel_librosa")
        assert sess.cfg.center is False  # centering needs future samples
        assert sess.cfg.window == "hann"
        out = sess.process(np.zeros(2047, np.float32))
        assert out.shape == (0, 128)  # one sample short of the first frame
        out = sess.process(np.zeros(1, np.float32))
        assert out.shape == (1, 128)  # librosa count: 1 + (L - n_fft)//hop
