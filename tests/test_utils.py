"""util.rs parity shims (SURVEY C15-C18) and bucketing."""

import jax.numpy as jnp
import numpy as np
import pytest

from mfcc_rust_tpu.utils.bucketing import bucket_batch, bucket_length
from mfcc_rust_tpu.utils.padding import array_log, pad, pad_center, repeat_axis


def test_pad_modes_match_numpy(rng):
    x = rng.normal(size=(4, 5))
    for mode in ["constant", "symmetric", "edge", "reflect"]:
        ours = np.asarray(pad(jnp.asarray(x), [(2, 1), (0, 3)], mode))
        ref = np.pad(x, [(2, 1), (0, 3)], mode=mode)
        np.testing.assert_array_equal(ours, ref)


def test_pad_constant_value():
    out = np.asarray(pad(jnp.ones((2, 2)), [(1, 1), (1, 1)], "constant", 7.0))
    assert out[0, 0] == 7.0 and out[1, 1] == 1.0


def test_pad_unknown_mode():
    with pytest.raises(ValueError):
        pad(jnp.ones((2, 2)), [(1, 1), (1, 1)], "wrap")


def test_repeat_axis_matches_numpy_doc_examples():
    # the reference's own test vectors (util.rs:389-413 tile equivalence)
    a = jnp.asarray([0, 1, 2])
    np.testing.assert_array_equal(
        np.asarray(repeat_axis(a[None, :], 0, 2)), np.tile([0, 1, 2], (2, 1))
    )
    b = jnp.asarray([[1, 2], [3, 4]])
    np.testing.assert_array_equal(
        np.asarray(repeat_axis(b, 0, 2)), np.tile([[1, 2], [3, 4]], (2, 1))
    )


def test_pad_center():
    w = jnp.ones(3)
    out = np.asarray(pad_center(w, 7))
    np.testing.assert_array_equal(out, [0, 0, 1, 1, 1, 0, 0])
    with pytest.raises(ValueError):
        pad_center(jnp.ones(5), 3)


def test_array_log(rng):
    x = np.abs(rng.normal(size=(3, 4))) + 0.1
    np.testing.assert_allclose(np.asarray(array_log(jnp.asarray(x))), np.log(x),
                               rtol=1e-12)


def test_bucket_length_monotone():
    prev = 0
    for n in [1, 100, 2048, 2049, 10_000, 100_000, 1_000_000]:
        b = bucket_length(n)
        assert b >= n and b >= prev
        prev = b
    # bounded waste
    for n in [5000, 50_000, 500_000]:
        assert bucket_length(n) <= 1.27 * n


def test_bucket_batch_groups():
    lengths = [100, 90_000, 110, 91_000, 120, 92_000]
    batches = bucket_batch(lengths, batch_size=2)
    for b in batches:
        bl = {bucket_length(lengths[i]) for i in b}
        assert len(bl) == 1  # one bucket per batch
        assert len(b) <= 2
    assert sorted(i for b in batches for i in b) == list(range(6))


def test_profiling_meter_and_costs():
    import time

    from mfcc_rust_tpu import speechpy_config
    from mfcc_rust_tpu.utils.profiling import Meter, pipeline_costs, speed_of_light

    meter = Meter()
    with meter.measure(10.0, scope="extract"):
        time.sleep(0.01)
    assert meter.throughput > 0 and meter.batches == 1
    rep = meter.report()
    assert rep["audio_seconds"] == 10.0 and "extract" in rep["scopes"]

    cfg = speechpy_config(16000)
    costs = pipeline_costs(cfg)
    assert costs["flops_per_audio_second"] > 1e7
    # hop 160 is MXU K-misaligned -> the fused one-GEMM layout dispatches:
    # ONE contraction over the whole frame, width 2*kmax + 2 energy columns
    assert costs["lowering"] == "chunk-gemm-fused"
    (k0, w0, r0), *_ = costs["gemms_per_frame"]
    assert k0 == cfg.frame_size and r0 == 1
    sol = speed_of_light(cfg)
    assert (
        sol["speed_of_light_audio_s_per_s"]
        <= sol["bandwidth_bound_audio_s_per_s"]
    )
    assert (
        sol["expected_audio_s_per_s"]
        <= sol["speed_of_light_audio_s_per_s"]
        <= sol["compute_bound_audio_s_per_s"]
    )
    assert (
        sol["compute_bound_tile_quantized_audio_s_per_s"]
        <= sol["compute_bound_audio_s_per_s"]
    )
    # precision ladder: more MXU passes -> lower compute bound (the default
    # is "high"; "highest" doubles the pass count)
    strict = speed_of_light(cfg.replace(precision="highest"))
    assert (strict["compute_bound_audio_s_per_s"]
            < sol["compute_bound_audio_s_per_s"])


def test_profiler_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from mfcc_rust_tpu.utils.profiling import annotate, trace

    with trace(str(tmp_path / "tr")):
        with annotate("stage"):
            jnp.ones(8).sum().block_until_ready()
    assert any((tmp_path / "tr").rglob("*"))  # trace artifacts written


def test_profiling_measured_calibration_r5():
    """r5 model pins: the vorbis cost model mirrors _chunk_gemm's fusion
    rule; the hoppad-wall lowering carries a measured stage decomposition;
    the pallas-ct expected rate is invariant to cfg.precision (the kernel
    hard-codes Mosaic HIGHEST); expected_basis tags which lines are
    measured-calibrated."""
    from mfcc_rust_tpu import librosa_config, vorbis_config
    from mfcc_rust_tpu.utils.profiling import pipeline_costs, speed_of_light

    # vorbis 16 kHz: hop 320 is 128-misaligned -> ONE fused K=640 dot
    vcosts = pipeline_costs(vorbis_config(16000), "melspec")
    assert vcosts["lowering"] == "vorbis-chunk-gemm-fused"
    (k0, _, r0), *_ = vcosts["gemms_per_frame"]
    assert r0 == 1 and k0 % 128 == 0  # tile-exact fused contraction

    # hoppad-wall production config: measured stage model present
    pcfg = librosa_config(16000, n_fft=512, hop_length=160, n_mels=80)
    pcosts = pipeline_costs(pcfg, "mel_librosa")
    assert pcosts["lowering"] == "hoppad-wall"
    names = [st[0] for st in pcosts["stages"]]
    assert names == ["center-pad", "fused-dft-gemm", "mel-tail"]
    psol = speed_of_light(pcfg, "mel_librosa", device_kind="v5e")
    assert psol["expected_basis"] == "measured-calibrated"
    # the mfcc tail adds a dct stage to the same decomposition
    mcosts = pipeline_costs(pcfg, "mfcc_librosa")
    assert [st[0] for st in mcosts["stages"]][-1] == "dct"

    # pallas-ct: strict mode must not change the expected rate
    lcfg = librosa_config(22050, pallas="force")
    base = speed_of_light(lcfg, "mel_librosa", device_kind="v5e")
    strict = speed_of_light(lcfg.replace(precision="highest"),
                            "mel_librosa", device_kind="v5e")
    assert base["lowering"] == "pallas-ct"
    assert strict["expected_audio_s_per_s"] == base["expected_audio_s_per_s"]
    assert base["expected_basis"] == "measured-calibrated"


def test_profiling_multi_feature_costs():
    """The multi-feature extract pass has a cost model: one shared
    frontend + head increments; the 4-head suite set carries the measured
    tail constant (r5, exp/multi_tail_calib)."""
    from mfcc_rust_tpu import FeatureConfig
    from mfcc_rust_tpu.utils.profiling import pipeline_costs, speed_of_light

    cfg = FeatureConfig(sample_rate=16000)
    heads = ("mfcc", "lmfe", "mfe", "ssc")
    costs = pipeline_costs(cfg, heads)
    assert costs["lowering"] == "chunk-gemm-fused-multi"
    single = pipeline_costs(cfg, "mfcc")
    # the multi pass costs strictly more than single-feature mfcc, but
    # shares the frontend (far less than 4x)
    assert (single["mxu_flops_per_audio_second"]
            < costs["mxu_flops_per_audio_second"]
            < 2 * single["mxu_flops_per_audio_second"])
    assert [st[0] for st in costs["stages"]][-1] == "multi-4head-tail"
    s = speed_of_light(cfg, heads, device_kind="v5e")
    assert s["expected_basis"] == "measured-calibrated"
    # a different head subset falls back to the physics heads stage
    costs2 = pipeline_costs(cfg, ("mfcc", "ssc"))
    assert [st[0] for st in costs2["stages"]][-1] == "extra-heads"
