"""Parity of the batch vorbis/DFN STFT + mel spectrogram against the
stateful frame-by-frame golden simulation (tests/golden/dfn_ref.py), and
streaming-vs-batch bit-equivalence (the property the reference provably lacks
— SURVEY §4 bug #5)."""

import jax.numpy as jnp
import numpy as np
import pytest

import mfcc_rust_tpu as m
from mfcc_rust_tpu import features as F
from mfcc_rust_tpu.ops import stft as S
from tests.golden import dfn_ref

VCFG = m.vorbis_config(16000).replace(dtype="float64")


@pytest.fixture(scope="module")
def sig(rng):
    return rng.normal(0, 0.1, 16000)


class TestBatchParity:
    def test_stft_power_exact_length(self, sig):
        gold = np.abs(dfn_ref.stft1(sig, 512, None, 16000, 0.02)) ** 2
        ours = np.asarray(S.stft_vorbis_power(jnp.asarray(sig), VCFG))
        assert ours.shape == gold.shape
        np.testing.assert_allclose(ours, gold, rtol=1e-9, atol=1e-15)

    def test_stft_power_partial_chunk(self, sig):
        s2 = sig[:15999]
        gold = np.abs(dfn_ref.stft1(s2, 512, None, 16000, 0.02)) ** 2
        ours = np.asarray(S.stft_vorbis_power(jnp.asarray(s2), VCFG))
        np.testing.assert_allclose(ours, gold, rtol=1e-9, atol=1e-15)

    def test_stft_complex(self, sig):
        gold = dfn_ref.stft1(sig, 512, None, 16000, 0.02)
        ours = np.asarray(S.stft_vorbis(jnp.asarray(sig), VCFG))
        np.testing.assert_allclose(ours.real, gold.real, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(ours.imag, gold.imag, rtol=1e-9, atol=1e-12)

    def test_npad_warmup_and_zero_tail(self, sig):
        """fft=512, frame 10 ms -> hop 160, n_pad=2: first 2 computed frames
        dropped, 2 zero rows at the tail (functions.rs:121,231)."""
        cfg = m.vorbis_config(16000, frame_length=0.01).replace(dtype="float64")
        assert cfg.stream_n_pad == 2
        gold = np.abs(dfn_ref.stft1(sig, 512, None, 16000, 0.01)) ** 2
        ours = np.asarray(S.stft_vorbis_power(jnp.asarray(sig), cfg))
        np.testing.assert_allclose(ours, gold, rtol=1e-9, atol=1e-15)
        assert ours[-2:].sum() == 0  # never-written tail rows

    def test_mel_spectrogram_1d(self, sig):
        gold = dfn_ref.mel_spectrogram1(sig, 16000)
        ours = np.asarray(F.mel_spectrogram(jnp.asarray(sig), VCFG))
        assert ours.shape == gold.shape == (40, 50)
        np.testing.assert_allclose(ours, gold, rtol=1e-9, atol=1e-15)

    def test_mel_spectrogram_2d(self, rng):
        sigs = rng.normal(0, 0.1, (3, 12000))
        gold = dfn_ref.mel_spectrogram2(sigs, 16000)
        ours = np.asarray(F.mel_spectrogram(jnp.asarray(sigs), VCFG))
        assert ours.shape == gold.shape
        np.testing.assert_allclose(ours, gold, rtol=1e-9, atol=1e-15)


class TestStreaming:
    def test_streaming_equals_batch(self, sig):
        carry, frames = S.stft_streaming(jnp.asarray(sig), VCFG)
        batch = np.asarray(S.stft_vorbis_power(jnp.asarray(sig), VCFG))
        # batch output = computed_frames[n_pad:] ++ zeros(n_pad)
        n_pad = VCFG.stream_n_pad
        fp = np.asarray(frames)
        comp = fp[n_pad:] if n_pad else fp
        np.testing.assert_allclose(comp, batch[: len(comp)], rtol=1e-12, atol=1e-15)

    def test_chunked_streaming_continues_state(self, sig):
        """Feeding the signal in two chunked calls with carried state must
        equal one batch call — the explicit-carry replacement for the
        reference's RefCell analysis_mem."""
        hop = VCFG.stream_hop
        x = jnp.asarray(sig[: hop * 40])
        c0 = S.streaming_init(VCFG, dtype=x.dtype)
        c1, f1 = S.stft_streaming(x[: hop * 15], VCFG, c0)
        c2, f2 = S.stft_streaming(x[hop * 15 :], VCFG, c1)
        _, f_all = S.stft_streaming(x, VCFG, c0)
        np.testing.assert_allclose(
            np.concatenate([f1, f2], axis=0), np.asarray(f_all), rtol=1e-12, atol=1e-15
        )

    def test_fresh_state_no_leak(self, sig):
        """Two independent batch calls give identical results — the reference
        leaks analysis_mem across calls (functions.rs:89-93 commented out)."""
        a = np.asarray(S.stft_vorbis_power(jnp.asarray(sig), VCFG))
        b = np.asarray(S.stft_vorbis_power(jnp.asarray(sig), VCFG))
        np.testing.assert_array_equal(a, b)

    def test_streaming_batched(self, rng):
        sigs = jnp.asarray(rng.normal(0, 0.1, (3, 6400)))
        carry, frames = S.stft_streaming(sigs, VCFG)
        assert carry.shape == (3, VCFG.stream_mem)
        single = [S.stft_streaming(sigs[i], VCFG)[1] for i in range(3)]
        np.testing.assert_allclose(
            np.asarray(frames), np.stack([np.asarray(s) for s in single]),
            rtol=1e-12, atol=1e-15,
        )
