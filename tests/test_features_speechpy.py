"""Golden parity: JAX pipelines vs the float64 speechpy oracle
(tests/golden/speechpy_ref.py), in both float64 (exact) and float32
(toleranced) — plus jit-vs-eager and batch-broadcast equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mfcc_rust_tpu as m
from mfcc_rust_tpu import features as F
from tests.golden import speechpy_ref as sp


@pytest.fixture(scope="module")
def sig(rng):
    return rng.normal(0, 0.1, 16000)


CFG64 = m.speechpy_config(16000).replace(dtype="float64")
CFG32 = m.speechpy_config(16000)


class TestFloat64Exact:
    def test_mfcc(self, sig):
        gold = sp.mfcc(sig, 16000)
        ours = np.asarray(F.mfcc(jnp.asarray(sig), CFG64))
        assert ours.shape == gold.shape == (98, 13)
        np.testing.assert_allclose(ours, gold, rtol=1e-9, atol=1e-11)

    def test_mfe(self, sig):
        gf, ge = sp.mfe(sig, 16000)
        of, oe = F.mfe(jnp.asarray(sig), CFG64)
        np.testing.assert_allclose(np.asarray(of), gf, rtol=1e-9, atol=1e-13)
        np.testing.assert_allclose(np.asarray(oe), ge, rtol=1e-9, atol=1e-13)

    def test_lmfe(self, sig):
        np.testing.assert_allclose(
            np.asarray(F.lmfe(jnp.asarray(sig), CFG64)),
            sp.lmfe(sig, 16000),
            rtol=1e-9, atol=1e-11,
        )

    def test_ssc(self, sig):
        np.testing.assert_allclose(
            np.asarray(F.ssc(jnp.asarray(sig), CFG64)),
            sp.ssc(sig, 16000),
            rtol=1e-7, atol=1e-7,
        )

    def test_mfcc_no_dc_elimination(self, sig):
        cfg = CFG64.replace(dc_elimination=False)
        gold = sp.mfcc(sig, 16000, dc_elimination=False)
        np.testing.assert_allclose(
            np.asarray(F.mfcc(jnp.asarray(sig), cfg)), gold, rtol=1e-9, atol=1e-11
        )

    def test_nondefault_params(self, sig):
        kw = dict(frame_length=0.025, frame_stride=0.012, num_filters=26,
                  fft_length=1024, low_frequency=100.0, high_frequency=6000.0)
        gold = sp.mfcc(sig, 16000, kw["frame_length"], kw["frame_stride"], 13,
                       kw["num_filters"], kw["fft_length"], kw["low_frequency"],
                       kw["high_frequency"])
        cfg = CFG64.replace(
            frame_length=0.025, frame_stride=0.012, num_filters=26,
            fft_points=1024, low_frequency=100.0, high_frequency=6000.0,
        )
        np.testing.assert_allclose(
            np.asarray(F.mfcc(jnp.asarray(sig), cfg)), gold, rtol=1e-9, atol=1e-11
        )

    def test_fft_impl_equivalence(self, sig):
        a = np.asarray(F.mfcc(jnp.asarray(sig), CFG64.replace(fft_impl="matmul")))
        b = np.asarray(F.mfcc(jnp.asarray(sig), CFG64.replace(fft_impl="fft")))
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10)


class TestFloat32:
    def test_mfcc_close_to_f64_gold(self, sig):
        gold = sp.mfcc(sig, 16000)
        ours = np.asarray(F.mfcc(jnp.asarray(sig, jnp.float32), CFG32))
        assert ours.dtype == np.float32
        np.testing.assert_allclose(ours, gold, rtol=2e-3, atol=2e-3)

    def test_no_nans(self, sig):
        out = np.asarray(F.mfcc(jnp.asarray(sig, jnp.float32), CFG32))
        assert np.isfinite(out).all()


class TestJitAndBatch:
    def test_jit_matches_eager(self, sig):
        jitted = jax.jit(F.mfcc, static_argnums=1)
        np.testing.assert_allclose(
            np.asarray(jitted(jnp.asarray(sig), CFG64)),
            np.asarray(F.mfcc(jnp.asarray(sig), CFG64)),
            rtol=1e-12, atol=1e-12,
        )

    def test_batch_broadcast(self, rng):
        batch = rng.normal(0, 0.1, (4, 8000))
        out = np.asarray(F.mfcc(jnp.asarray(batch), CFG64))
        assert out.shape[0] == 4
        for i in range(4):
            np.testing.assert_allclose(
                out[i], sp.mfcc(batch[i], 16000), rtol=1e-9, atol=1e-11
            )

    def test_vmap_matches_broadcast(self, rng):
        batch = jnp.asarray(rng.normal(0, 0.1, (3, 8000)))
        a = np.asarray(F.vmapped(F.mfcc)(batch, CFG64))
        b = np.asarray(F.mfcc(batch, CFG64))
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


class TestProcessingOps:
    def test_preemphasis(self, sig):
        np.testing.assert_allclose(
            np.asarray(m.ops.preemphasis(jnp.asarray(sig))),
            sp.preemphasis(sig),
            rtol=1e-12, atol=1e-14,
        )

    def test_stack_frames_values(self, sig):
        frames = np.asarray(
            m.ops.stack_frames(jnp.asarray(sig), 16000, 0.02, 0.01, zero_padding=False)
        )
        gold = sp.stack_frames(sig, 16000, 0.02, 0.01, zero_padding=False)
        np.testing.assert_allclose(frames, gold, rtol=0, atol=0)

    def test_stack_frames_zero_padding(self, sig):
        frames = np.asarray(
            m.ops.stack_frames(jnp.asarray(sig[:15975]), 16000, 0.02, 0.01, zero_padding=True)
        )
        gold = sp.stack_frames(sig[:15975], 16000, 0.02, 0.01, zero_padding=True)
        np.testing.assert_allclose(frames, gold, rtol=0, atol=0)

    def test_log_power_spectrum(self, sig):
        frames = sp.stack_frames(sig, 16000, 0.02, 0.01, zero_padding=False)
        np.testing.assert_allclose(
            np.asarray(m.ops.log_power_spectrum(jnp.asarray(frames), CFG64)),
            sp.log_power_spectrum(frames),
            rtol=1e-9, atol=1e-9,
        )

    def test_cmvn(self, rng):
        feat = rng.normal(2.0, 1.5, (300, 13))
        for var in [False, True]:
            np.testing.assert_allclose(
                np.asarray(m.ops.cmvn(jnp.asarray(feat), var)),
                sp.cmvn(feat, var),
                rtol=1e-9, atol=1e-11,
            )
        out = np.asarray(m.ops.cmvn(jnp.asarray(feat), True))
        assert abs(out.mean(axis=0)).max() < 1e-8 and abs(out.std(axis=0) - 1).max() < 1e-6

    @pytest.mark.parametrize("win", [31, 301])
    @pytest.mark.parametrize("var", [False, True])
    def test_cmvnw(self, rng, win, var):
        feat = rng.normal(2.0, 1.5, (300, 13))
        np.testing.assert_allclose(
            np.asarray(m.ops.cmvnw(jnp.asarray(feat), win, var)),
            sp.cmvnw(feat, win, var),
            rtol=1e-8, atol=1e-9,
        )

    def test_cmvnw_odd_assert(self, rng):
        with pytest.raises(ValueError):
            m.ops.cmvnw(jnp.zeros((10, 3)), 4)

    def test_cmvn_paths_f32_large_mean(self):
        """f32 robustness (VERDICT r1 #7): unit-scale features riding a +1e4
        offset must still normalize correctly — the naive E[x^2]-m^2 and raw
        large-mean cumsum forms lose *all* significance here."""
        rng = np.random.default_rng(7)  # own seed: tolerance-sensitive data
        x32 = (rng.normal(0, 1.0, (1200, 13)) + 1e4).astype(np.float32)
        x64 = x32.astype(np.float64)  # same quantized values, exact math
        # atol floor = ulp(1e4) ~ 1e-3: the centered values themselves are
        # only defined to the f32 resolution of the raw 1e4-scale inputs
        for var in [False, True]:
            np.testing.assert_allclose(
                np.asarray(m.ops.cmvn(jnp.asarray(x32), var)),
                sp.cmvn(x64, var), rtol=1e-3, atol=2e-3,
            )
            np.testing.assert_allclose(
                np.asarray(m.ops.cmvnw(jnp.asarray(x32), 301, var)),
                sp.cmvnw(x64, 301, var), rtol=1e-3, atol=2e-3,
            )

    def test_corpus_moments_f32_large_mean(self):
        """Welford corpus moments stay accurate in f32 at mean 1e4 (where
        sum-of-squares accumulation has zero significant bits left), through
        local computation, merging, and tree_merge."""
        from mfcc_rust_tpu.parallel.stats import local_moments, tree_merge

        rng = np.random.default_rng(7)  # own seed: tolerance-sensitive data
        x32 = (rng.normal(0, 1.0, (4, 500, 13)) + 1e4).astype(np.float32)
        x64 = x32.reshape(-1, 13).astype(np.float64)
        mom = local_moments(jnp.asarray(x32))
        np.testing.assert_allclose(np.asarray(mom.mean), x64.mean(0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(mom.std), x64.std(0), rtol=1e-4)
        # chunked accumulation must agree with the one-shot moments
        parts = [local_moments(jnp.asarray(x32[i])) for i in range(4)]
        merged = tree_merge(parts)
        np.testing.assert_allclose(
            np.asarray(merged.mean), np.asarray(mom.mean), rtol=1e-6, atol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(merged.std), x64.std(0), rtol=1e-4
        )
        out = np.asarray(merged.normalize(jnp.asarray(x32)))
        gold = (x64 - x64.mean(0)) / (x64.std(0) + 2.0 ** -30)
        np.testing.assert_allclose(
            out, gold.reshape(4, 500, 13), rtol=1e-3, atol=1e-3
        )

    def test_derivative_extraction(self, rng):
        feat = rng.normal(size=(50, 13))
        np.testing.assert_allclose(
            np.asarray(m.ops.derivative_extraction(jnp.asarray(feat))),
            sp.derivative_extraction(feat),
            rtol=1e-10, atol=1e-12,
        )

    def test_feature_cube(self, rng):
        feat = rng.normal(size=(50, 13))
        cube = np.asarray(m.ops.extract_derivative_feature(jnp.asarray(feat)))
        assert cube.shape == (50, 13, 3)
        np.testing.assert_allclose(
            cube, sp.extract_derivative_feature(feat), rtol=1e-10, atol=1e-12
        )

    def test_zero_handling(self):
        x = jnp.asarray([0.0, 1.0, -2.0, 0.0])
        out = np.asarray(m.ops.zero_handling(x))
        assert out[0] == np.float32(np.finfo(np.float32).eps)
        assert out[1] == 1.0 and out[2] == -2.0


class TestExtractMultiFeature:
    """features.extract: one frontend pass == the individual pipelines."""

    def test_matches_individual_pipelines(self, rng):
        import jax

        sig = jnp.asarray(rng.normal(0, 0.1, 16000))
        cfg = CFG64
        out = F.extract(sig, cfg, which=("mfcc", "lmfe", "mfe", "ssc", "energy"))
        feats, energies = F.mfe(sig, cfg)
        np.testing.assert_allclose(np.asarray(out["mfcc"]),
                                   np.asarray(F.mfcc(sig, cfg)), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(out["lmfe"]),
                                   np.asarray(F.lmfe(sig, cfg)), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(out["mfe"][0]), np.asarray(feats),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(out["mfe"][1]), np.asarray(energies),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(out["energy"]), np.asarray(energies),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(out["ssc"]),
                                   np.asarray(F.ssc(sig, cfg)), rtol=1e-9)
        # jittable with the which tuple static (1e-11: jit fusion may block
        # the fused chunk-GEMM's f64 concat operand differently from eager)
        jit_out = jax.jit(F.extract, static_argnums=(1, 2))(sig, cfg,
                                                            ("mfcc", "ssc"))
        np.testing.assert_allclose(np.asarray(jit_out["mfcc"]),
                                   np.asarray(out["mfcc"]), rtol=1e-11)

    def test_fallback_path(self, rng):
        """Non-fast-path config (odd fft) goes through the per-feature
        fallback and still matches."""
        sig = jnp.asarray(rng.normal(0, 0.1, 16000))
        cfg = CFG64.replace(fft_points=511)
        out = F.extract(sig, cfg, which=("mfcc", "ssc"))
        np.testing.assert_allclose(np.asarray(out["mfcc"]),
                                   np.asarray(F.mfcc(sig, cfg)), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(out["ssc"]),
                                   np.asarray(F.ssc(sig, cfg)), rtol=1e-12)

    def test_empty_and_validation(self):
        out = F.extract(jnp.zeros(10), CFG64,
                        which=("mfcc", "lmfe", "mfe", "ssc", "energy"))
        assert out["mfcc"].shape == (0, CFG64.num_cepstral)
        assert out["lmfe"].shape == (0, CFG64.num_filters)
        assert out["mfe"][0].shape == (0, CFG64.num_filters)
        assert out["energy"].shape == (0,)
        with pytest.raises(ValueError, match="unknown features"):
            F.extract(jnp.zeros(16000), CFG64, which=("mfcc", "plp"))
