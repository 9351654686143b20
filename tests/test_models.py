"""Pipeline objects and the explicit-carry streaming session."""

import jax.numpy as jnp
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
