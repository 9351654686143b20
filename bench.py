"""Headline benchmark: MFCC-13 extraction throughput at 16 kHz.

Prints ONE JSON line: audio-seconds processed per wall-clock second per chip
for the flagship batched MFCC pipeline (speechpy defaults: 20 ms frames /
10 ms hop, 40 mels, fft 512 — BASELINE.json config 1 scaled to a batch).

``python bench.py --suite`` additionally benchmarks the other BASELINE.json
configs (librosa mel spectrogram, full feature suite, ragged bucketed batch),
one JSON line each.  ``--corpus`` runs the end-to-end on-disk corpus workload
(WAV decode -> prefetch -> device -> npy) and quantifies host-I/O overhead;
``--scaling`` the mesh efficiency.

The reference publishes no numbers (SURVEY §6), so ``vs_baseline`` is
reported against the north-star target of 50,000 audio-seconds/s/chip
(BASELINE.json).
"""

import json
import sys
import time

import numpy as np

TARGET = 50_000.0  # north-star audio-seconds/s/chip (BASELINE.json)


def _slope_timer(make_fn, make_xs, audio_seconds_per_batch, k1=4, k2=12):
    """True device seconds per batch: two-point slope over scan length
    cancels the fixed per-call dispatch latency of the remote TPU tunnel."""
    import jax
    from jax import lax

    def timed(k):
        xs = make_xs(k)
        fn = jax.jit(
            lambda xs: lax.scan(
                lambda c, x: (c + make_fn(x), None), np.float32(0), xs
            )[0]
        )
        float(fn(xs))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(fn(xs))
            best = min(best, time.perf_counter() - t0)
        return best

    per_batch = (timed(k2) - timed(k1)) / (k2 - k1)
    return audio_seconds_per_batch / per_batch


def _emit(metric, value):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 1),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / TARGET, 4),
            }
        )
    )


def suite():
    """BASELINE.json configs 2-4 (config 1 is the headline in main())."""
    import jax.numpy as jnp

    from mfcc_rust_tpu import FeatureConfig, features, librosa_config

    rng = np.random.default_rng(0)

    # config 2: librosa mel spectrogram 2048/512, 128 mels, 22.05 kHz
    # (rides the fused Pallas CT kernel on TPU via cfg.pallas="auto")
    lcfg = librosa_config(22050)
    b2, t2 = 32, 220500  # 32 x 10 s

    # on-chip A/B numerics gate: kernel vs the XLA CT path (<= 1e-3 rel)
    from mfcc_rust_tpu.features import _librosa_pallas_ok

    if _librosa_pallas_ok(lcfg):
        sig = jnp.asarray(rng.normal(0, 0.1, (2, 66150)).astype(np.float32))
        ref = np.asarray(
            features.mel_spectrogram_librosa(sig, lcfg.replace(pallas="off"))
        )
        out = np.asarray(features.mel_spectrogram_librosa(sig, lcfg))
        err = float((np.abs(out - ref) / (np.abs(ref) + 1e-8)).max())
        print(json.dumps({
            "metric": "pallas CT mel A/B max rel err vs XLA CT (gate 1e-3)",
            "value": err, "unit": "rel", "vs_baseline": round(err / 1e-3, 6),
        }))
        assert err <= 1e-3, "fused CT mel kernel failed the A/B numerics gate"

    _emit(
        "audio_seconds_per_sec_per_chip (librosa mel 2048/512/128)",
        _slope_timer(
            lambda x: features.mel_spectrogram_librosa(x, lcfg).sum(),
            lambda k: jnp.asarray(
                rng.normal(0, 0.1, (k, b2, t2)).astype(np.float32)
            ),
            b2 * 10.0,
        ),
    )
    if _librosa_pallas_ok(lcfg):
        _emit(
            "audio_seconds_per_sec_per_chip (librosa mel, XLA path: pallas=off)",
            _slope_timer(
                lambda x: features.mel_spectrogram_librosa(
                    x, lcfg.replace(pallas="off")
                ).sum(),
                lambda k: jnp.asarray(
                    rng.normal(0, 0.1, (k, b2, t2)).astype(np.float32)
                ),
                b2 * 10.0,
            ),
        )

    # reference-parity vorbis mel spectrogram (feature.rs:151-174)
    from mfcc_rust_tpu import vorbis_config

    vcfg = vorbis_config(16000)
    bv, tv = 64, 160000
    _emit(
        "audio_seconds_per_sec_per_chip (vorbis mel_spectrogram)",
        _slope_timer(
            lambda x: features.mel_spectrogram(x, vcfg).sum(),
            lambda k: jnp.asarray(
                rng.normal(0, 0.1, (k, bv, tv)).astype(np.float32)
            ),
            bv * 10.0,
        ),
    )

    # librosa fast mode: precision="high" (3-pass MXU; max-rel ~1e-4 vs the
    # f64 oracle, measured on v5e — see exp/ct_shootout.py)
    import dataclasses

    lcfg_hi = dataclasses.replace(lcfg, precision="high")
    _emit(
        "audio_seconds_per_sec_per_chip (librosa mel, precision=high fast mode)",
        _slope_timer(
            lambda x: features.mel_spectrogram_librosa(x, lcfg_hi).sum(),
            lambda k: jnp.asarray(
                rng.normal(0, 0.1, (k, b2, t2)).astype(np.float32)
            ),
            b2 * 10.0,
        ),
    )

    # librosa MFCC (rides the CT-fused mel path)
    _emit(
        "audio_seconds_per_sec_per_chip (librosa mfcc 20)",
        _slope_timer(
            lambda x: features.mfcc_librosa(x, lcfg).sum(),
            lambda k: jnp.asarray(
                rng.normal(0, 0.1, (k, b2, t2)).astype(np.float32)
            ),
            b2 * 10.0,
        ),
    )

    # production fast mode: precision=high (3-pass MXU, ~1e-4 rel accuracy)
    cfg_hi = FeatureConfig(sample_rate=16000, precision="high")
    bh, th = 64, 160000
    _emit(
        "audio_seconds_per_sec_per_chip (MFCC-13, precision=high fast mode)",
        _slope_timer(
            lambda x: features.mfcc(x, cfg_hi).sum(),
            lambda k: jnp.asarray(
                rng.normal(0, 0.1, (k, bh, th)).astype(np.float32)
            ),
            bh * 10.0,
        ),
    )

    # config 3: full feature suite (MFE + log-FBE + SSC + MFCC) on a padded
    # batch, via the single-frontend-pass multi-feature API
    cfg = FeatureConfig(sample_rate=16000)
    b3, t3 = 64, 160000

    def full_suite(x):
        out = features.extract(x, cfg, which=("mfcc", "lmfe", "mfe", "ssc"))
        feats, energies = out["mfe"]
        return (
            feats.sum()
            + energies.sum()
            + out["lmfe"].sum()
            + out["ssc"].sum()
            + out["mfcc"].sum()
        )

    _emit(
        "audio_seconds_per_sec_per_chip (full suite: mfe+lmfe+ssc+mfcc)",
        _slope_timer(
            full_suite,
            lambda k: jnp.asarray(
                rng.normal(0, 0.1, (k, b3, t3)).astype(np.float32)
            ),
            b3 * 10.0,
        ),
    )

    # config 4: ragged utterances (1-35 s), bucketed: measure at the 2
    # dominant buckets and report audio-weighted throughput
    from mfcc_rust_tpu.utils.bucketing import bucket_length

    total_as, total_wall = 0.0, 0.0
    for seconds, bsz in [(5, 64), (20, 16)]:
        t = bucket_length(seconds * 16000)
        val = _slope_timer(
            lambda x: features.mfcc(x, cfg).sum(),
            lambda k: jnp.asarray(
                rng.normal(0, 0.1, (k, bsz, t)).astype(np.float32)
            ),
            bsz * t / 16000.0,
            k1=2,
            k2=8,
        )
        total_as += bsz * t / 16000.0
        total_wall += (bsz * t / 16000.0) / val
    _emit(
        "audio_seconds_per_sec_per_chip (bucketed ragged batches)",
        total_as / total_wall,
    )


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mfcc_rust_tpu import FeatureConfig, features

    cfg = FeatureConfig(sample_rate=16000)
    batch, seconds = 64, 10
    k1, k2 = 4, 16
    t = seconds * cfg.sample_rate
    rng = np.random.default_rng(0)

    # Methodology: K distinct batches scanned in ONE device call (distinct
    # data defeats CSE/caching), a host scalar read as the completion barrier
    # (block_until_ready is not reliable through the remote-execution
    # tunnel), and a two-point SLOPE over K to cancel the fixed ~25 ms
    # per-call dispatch overhead — the slope is pure device time per batch.
    def timed(k):
        xs = jnp.asarray(rng.normal(0, 0.1, (k, batch, t)).astype(np.float32))
        fn = jax.jit(
            lambda xs: lax.scan(
                lambda c, x: (c + features.mfcc(x, cfg).sum(), None),
                jnp.float32(0), xs,
            )[0]
        )
        float(fn(xs))  # compile + warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(fn(xs))  # host scalar read == hard completion barrier
            best = min(best, time.perf_counter() - t0)
        return best

    per_batch = (timed(k2) - timed(k1)) / (k2 - k1)
    value = batch * seconds / per_batch
    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_sec_per_chip (MFCC-13, 16kHz)",
                "value": round(value, 1),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / TARGET, 4),
            }
        )
    )


def corpus(n_files: int = 192, seed: int = 0):
    """BASELINE config-4/5 end-to-end corpus extraction: synthesize a ragged
    on-disk WAV corpus (~LibriSpeech dev-clean length profile: lognormal
    around ~6 s, clipped to 1-35 s), run CorpusRunner — C++ decode, threaded
    prefetch, length bucketing, device extraction, idempotent .npy writes,
    corpus CMVN moments — and report ONE JSON line of audio-s/s *including*
    all host I/O, plus the device-scope throughput so the host-overhead gap
    vs the synthetic headline is quantified.

    Two passes over the same corpus shapes: pass 1 warms the jit cache (the
    bucket set would otherwise bill one ~30 s TPU compile per bucket to the
    measurement), pass 2 is timed from a cold output dir."""
    import shutil
    import tempfile

    from mfcc_rust_tpu import FeatureConfig
    from mfcc_rust_tpu.parallel import make_mesh
    from mfcc_rust_tpu.parallel.runner import CorpusRunner
    from mfcc_rust_tpu.runtime import write_wav

    rng = np.random.default_rng(seed)
    secs = np.clip(rng.lognormal(np.log(6.0), 0.6, n_files), 1.0, 35.0)
    cfg = FeatureConfig(sample_rate=16000)
    mesh = make_mesh(n_seq=1)
    tmp = tempfile.mkdtemp(prefix="bench_corpus_")
    try:
        paths = []
        total_audio = 0.0
        for i, s in enumerate(secs):
            clip = rng.normal(0, 0.1, int(s * 16000)).astype(np.float32)
            np.clip(clip, -1.0, 1.0, out=clip)
            p = f"{tmp}/utt{i:05d}.wav"
            write_wav(p, clip, 16000)
            paths.append(p)
            total_audio += len(clip) / 16000.0

        def run(out_dir):
            # H2D bytes are the measured bottleneck through this image's
            # remote tunnel (~15-35 MB/s effective): the runner ships packed
            # unpadded int16 PCM and rebuilds the padded f32 batch on device
            # (parallel/data.py pack_signals), ~3.2x fewer bytes than the
            # padded-f32 layout.  fetch_every stays 1 — see exp/corpus_ab.py.
            r = CorpusRunner(paths, cfg, mesh, batch_size=128,
                             out_dir=out_dir, n_io_threads=8)
            t0 = time.perf_counter()
            r.run()
            return time.perf_counter() - t0, r.meter

        run(f"{tmp}/warm")  # compile all buckets
        shutil.rmtree(f"{tmp}/warm")
        wall, meter = run(f"{tmp}/out")
        _emit(
            "audio_seconds_per_sec_per_chip (corpus end-to-end: decode+"
            "prefetch+extract+npy)",
            total_audio / wall,
        )
        print(json.dumps({
            "metric": "corpus device-scope audio_s/s (extraction_step incl. H2D/D2H)",
            "value": round(meter.throughput, 1), "unit": "audio-s/s/chip",
            "vs_baseline": round(meter.throughput / TARGET, 4),
        }))
        print(json.dumps({
            "metric": "corpus host-overhead fraction (1 - device_scope_wall/total_wall)",
            "value": round(1.0 - meter.wall_seconds / wall, 4), "unit": "ratio",
            "vs_baseline": 0.0,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def scaling():
    """Data-parallel scaling over the available device mesh: audio-s/s at 1
    device vs all devices and the efficiency ratio, plus the sequence-axis
    halo-overhead sweep (n_seq 1/2/4 at all devices) and the seq-sharded
    vorbis melspec path.  On a 1-chip host this degenerates to single lines;
    on a pod slice it is the BASELINE config-5 scaling-efficiency
    measurement.  NOTE: on a virtual CPU mesh
    (xla_force_host_platform_device_count) the "devices" timeshare the same
    cores, so ratios validate the harness/halo wiring, not real ICI cost."""
    import jax

    from mfcc_rust_tpu import FeatureConfig, vorbis_config
    from mfcc_rust_tpu.parallel import extraction_step, make_mesh

    cfg = FeatureConfig(sample_rate=16000)
    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)

    def run(devices, n_seq=1, feature="mfcc", run_cfg=None):
        n = len(devices)
        run_cfg = cfg if run_cfg is None else run_cfg
        mesh = make_mesh(n_data=n // n_seq, n_seq=n_seq, devices=devices)
        hop = run_cfg.stream_hop if feature == "melspec" else run_cfg.frame_step
        b = 16 * (n // n_seq)
        t = (160000 // (n_seq * hop)) * (n_seq * hop)
        sig = rng.normal(0, 0.1, (b, t)).astype(np.float32)
        lens = np.full(b, t, np.int64)
        out = extraction_step(sig, lens, run_cfg, mesh, feature)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out = extraction_step(sig, lens, run_cfg, mesh, feature)
            float(out[2].count)  # host read as completion barrier
            best = min(best, time.perf_counter() - t0)
        return b * (t / run_cfg.sample_rate) / best

    def emit(metric, value, target=TARGET):
        print(json.dumps({"metric": metric, "value": round(value, 4),
                          "unit": "audio-s/s" if target else "ratio",
                          "vs_baseline": round(value / (target or 1.0), 4)}))

    one = run(jax.devices()[:1])
    emit("scaling: audio_s_per_sec @1dev", one)
    if n_dev > 1:
        alln = run(jax.devices())
        eff = alln / (one * n_dev)
        emit(f"scaling: audio_s_per_sec @{n_dev}dev", alln)
        emit(f"scaling efficiency @{n_dev}dev (target 0.9)", eff / 0.9, None)
        if jax.default_backend() == "cpu":
            # virtual mesh: the N "devices" timeshare one host's cores, so
            # the per-device efficiency ceiling is 1/N, not 1.  The honest
            # harness-validation number is total throughput sharded vs
            # unsharded — >= 1.0 means the mesh/halo/psum wiring adds no
            # overhead beyond the shared silicon.
            emit(
                f"scaling: total throughput @{n_dev}dev / @1dev "
                "(virtual shared-core mesh; >=1 = sharding overhead-free)",
                alln / one, None,
            )
        # sequence-axis halo overhead: same device count, time axis sharded
        # 2/4-way — the ppermute halo of frame_len - hop samples is the only
        # extra work vs the pure-data mesh
        base = alln
        for n_seq in (2, 4):
            if n_dev % n_seq:
                continue
            v = run(jax.devices(), n_seq=n_seq)
            emit(f"scaling: audio_s_per_sec @{n_dev}dev n_seq={n_seq}", v)
            emit(f"seq-halo relative throughput n_seq={n_seq} (1.0 = free halo)",
                 v / base, None)
        # vorbis melspec on the seq mesh (reference mel_spectrogram family)
        vcfg = vorbis_config(16000)
        v = run(jax.devices(), n_seq=min(2, n_dev), feature="melspec",
                run_cfg=vcfg)
        emit(f"scaling: vorbis melspec audio_s_per_sec @{n_dev}dev n_seq=2", v)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
        sys.exit(0)
    if "--corpus" in sys.argv:
        corpus()
        sys.exit(0)
    main()
    if "--suite" in sys.argv:
        suite()
