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


def _slope_timer(make_fn, make_xs, audio_seconds_per_batch, k1=4, k2=12,
                 n_slopes=5, target_ms=250.0):
    """True device seconds per batch: two-point slope over the rep count of a
    dynamic-trip-count ``fori_loop`` cancels the fixed per-call dispatch
    latency of the remote TPU tunnel.

    The rep counts are *calibrated* so the differential compute is
    ~``target_ms`` — round 2's fixed 8-iteration differential (~10 ms) was
    below the tunnel's jitter and produced +-30% artifact disagreements
    (exp/headline_breakdown_r03_results.txt: same harness at 6 iterations
    gave negative TFLOP/s and 22,000% spreads; at ~250 ms differential the
    spreads are 1.5-8%).  ``n_slopes`` independent slopes -> median +
    relative spread (max-min over median).  ``k1``/``k2`` are accepted for
    call-site compatibility; only max(k2, 4) seeds the input cycle length.

    Returns (median audio-s/s, rel_spread)."""
    import jax
    from jax import lax

    nx = 4
    xs = make_xs(nx)
    jax.block_until_ready(xs)

    @jax.jit
    def run(xs, reps):
        def body(i, c):
            return c + make_fn(lax.dynamic_index_in_dim(xs, i % nx,
                                                        keepdims=False))
        return lax.fori_loop(0, reps, body, np.float32(0.0))

    float(run(xs, 4))  # compile + warm (host scalar read == hard barrier)

    def timed(reps):
        t0 = time.perf_counter()
        float(run(xs, reps))
        return time.perf_counter() - t0

    per = timed(16) / 16

    def measure(tms):
        r2 = max(48, int(tms / 1e3 / per))
        r1 = max(8, r2 // 5)
        vals = []
        for _ in range(n_slopes):
            vals.append(audio_seconds_per_batch
                        / ((timed(r2) - timed(r1)) / (r2 - r1)))
        vals.sort()
        med = vals[len(vals) // 2]
        return med, (vals[-1] - vals[0]) / med

    # Spread discipline (VERDICT r3 #5): a line with >15% spread is junk for
    # 1.2-2x questions, so re-measure with a doubled differential (burying
    # the tunnel jitter deeper) up to twice and keep the tightest run.
    med, spread = measure(target_ms)
    tms = target_ms
    for _ in range(2):
        if spread <= 0.15:
            break
        tms *= 2.0
        m2, s2 = measure(tms)
        if s2 < spread:
            med, spread = m2, s2
    return med, spread


def _sol(cfg, feature):
    """Speed-of-light (audio-s/s) for the lowering that actually dispatches
    for (cfg, feature) on the attached chip — utils/profiling's per-lowering
    roofline (tile-quantized MXU / VPU / HBM, perfect-overlap optimistic)."""
    from mfcc_rust_tpu.utils.profiling import speed_of_light

    try:
        return speed_of_light(cfg, feature)
    except Exception:
        return None


def _emit(metric, value, spread=None, sol=None):
    rec = {
        "metric": metric,
        "value": round(value, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / TARGET, 4),
    }
    if spread is not None:
        rec["rel_spread"] = round(spread, 4)
    if sol is not None:
        s = sol["speed_of_light_audio_s_per_s"]
        rec["sol_fraction"] = round(value / s, 4)
        rec["speed_of_light"] = round(s, 1)
        # tile-quantized best-estimate (not a bound — see utils/profiling)
        e = sol.get("expected_audio_s_per_s")
        if e:
            rec["expected_fraction"] = round(value / e, 4)
            rec["expected_basis"] = sol.get("expected_basis", "physics")
    print(json.dumps(rec))


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

    v, s = _slope_timer(
        lambda x: features.mel_spectrogram_librosa(x, lcfg).sum(),
        lambda k: jnp.asarray(
            rng.normal(0, 0.1, (k, b2, t2)).astype(np.float32)
        ),
        b2 * 10.0,
    )
    _emit("audio_seconds_per_sec_per_chip (librosa mel 2048/512/128)", v,
          spread=s, sol=_sol(lcfg, "mel_librosa"))
    if _librosa_pallas_ok(lcfg):
        v, s = _slope_timer(
            lambda x: features.mel_spectrogram_librosa(
                x, lcfg.replace(pallas="off")
            ).sum(),
            lambda k: jnp.asarray(
                rng.normal(0, 0.1, (k, b2, t2)).astype(np.float32)
            ),
            b2 * 10.0,
        )
        _emit("audio_seconds_per_sec_per_chip (librosa mel, XLA path: "
              "pallas=off)", v, spread=s,
              sol=_sol(lcfg.replace(pallas="off"), "mel_librosa"))

    # reference-parity vorbis mel spectrogram (feature.rs:151-174)
    from mfcc_rust_tpu import vorbis_config

    vcfg = vorbis_config(16000)
    # B=48: +22% over the old B=64 (exp/suite_batch_tune_r04_results.txt)
    bv, tv = 48, 160000
    v, s = _slope_timer(
        lambda x: features.mel_spectrogram(x, vcfg).sum(),
        lambda k: jnp.asarray(
            rng.normal(0, 0.1, (k, bv, tv)).astype(np.float32)
        ),
        bv * 10.0,
    )
    _emit("audio_seconds_per_sec_per_chip (vorbis mel_spectrogram)", v,
          spread=s, sol=_sol(vcfg, "melspec"))

    # strict mode A/B: precision="highest" (6-pass f32; the default is
    # "high" — measured error budget in exp/precision_parity_r03_results.txt)
    import dataclasses

    lcfg_strict = dataclasses.replace(lcfg, precision="highest")
    v, s = _slope_timer(
        lambda x: features.mel_spectrogram_librosa(x, lcfg_strict).sum(),
        lambda k: jnp.asarray(
            rng.normal(0, 0.1, (k, b2, t2)).astype(np.float32)
        ),
        b2 * 10.0,
    )
    _emit("audio_seconds_per_sec_per_chip (librosa mel, precision=highest "
          "strict mode)", v, spread=s, sol=_sol(lcfg_strict, "mel_librosa"))

    # 16 kHz production frontend (n_fft 512, hop 160 — Whisper-style).  The
    # default dispatch here is the XLA lowering: the frames-input Pallas
    # layout is correct but measured ~0.78x XLA on-chip
    # (exp/frames_layout_ab_r03_results.txt), so "auto" only takes the
    # chunked-layout kernel.  The frames-layout kernel stays correctness-
    # gated below via pallas="force".
    pcfg = librosa_config(16000, n_fft=512, hop_length=160, n_mels=80)
    bp, tp = 64, 160000
    pcfg_force = pcfg.replace(pallas="force")
    if _librosa_pallas_ok(pcfg_force):
        sigp = jnp.asarray(rng.normal(0, 0.1, (2, 48000)).astype(np.float32))
        refp = np.asarray(
            features.mel_spectrogram_librosa(sigp, pcfg.replace(pallas="off"))
        )
        outp = np.asarray(features.mel_spectrogram_librosa(sigp, pcfg_force))
        errp = float((np.abs(outp - refp) / (np.abs(refp) + 1e-8)).max())
        print(json.dumps({
            "metric": "pallas CT mel (512/160 frames layout, force-only) A/B "
                      "max rel err vs XLA (gate 1e-3)",
            "value": errp, "unit": "rel", "vs_baseline": round(errp / 1e-3, 6),
        }))
        assert errp <= 1e-3, "frames-layout CT kernel failed the A/B gate"
    v, s = _slope_timer(
        lambda x: features.mel_spectrogram_librosa(x, pcfg).sum(),
        lambda k: jnp.asarray(
            rng.normal(0, 0.1, (k, bp, tp)).astype(np.float32)
        ),
        bp * 10.0,
    )
    _emit("audio_seconds_per_sec_per_chip (librosa mel 512/160/80 @16kHz "
          "production config)", v, spread=s, sol=_sol(pcfg, "mel_librosa"))

    # librosa MFCC (rides the CT-fused mel path)
    v, s = _slope_timer(
        lambda x: features.mfcc_librosa(x, lcfg).sum(),
        lambda k: jnp.asarray(
            rng.normal(0, 0.1, (k, b2, t2)).astype(np.float32)
        ),
        b2 * 10.0,
    )
    _emit("audio_seconds_per_sec_per_chip (librosa mfcc 20)", v, spread=s,
          sol=_sol(lcfg, "mfcc_librosa"))

    # strict mode A/B: precision=highest (6-pass full f32; default is high)
    cfg_strict = FeatureConfig(sample_rate=16000, precision="highest")
    # B=48: +17% over the old B=64 (exp/suite_batch_tune_r04_results.txt)
    bh, th = 48, 160000
    v, s = _slope_timer(
        lambda x: features.mfcc(x, cfg_strict).sum(),
        lambda k: jnp.asarray(
            rng.normal(0, 0.1, (k, bh, th)).astype(np.float32)
        ),
        bh * 10.0,
    )
    _emit("audio_seconds_per_sec_per_chip (MFCC-13, precision=highest "
          "strict mode)", v, spread=s, sol=_sol(cfg_strict, "mfcc"))

    # hop-misaligned speechpy framing (25 ms / 10 ms -> 400/160): rides the
    # r3 zero-padded-wall chunk GEMM instead of gather framing
    cfg_25 = FeatureConfig(sample_rate=16000, frame_length=0.025)
    v, s = _slope_timer(
        lambda x: features.mfcc(x, cfg_25).sum(),
        lambda k: jnp.asarray(
            rng.normal(0, 0.1, (k, bh, th)).astype(np.float32)
        ),
        bh * 10.0,
    )
    _emit("audio_seconds_per_sec_per_chip (MFCC-13 25ms/10ms frames, "
          "hop-padded wall)", v, spread=s, sol=_sol(cfg_25, "mfcc"))

    # config 3: full feature suite (MFE + log-FBE + SSC + MFCC) on a padded
    # batch, via the single-frontend-pass multi-feature API
    cfg = FeatureConfig(sample_rate=16000)
    # B=32: +15% over the old B=64 with a tight spread
    # (exp/suite_batch_tune_r04_results.txt)
    b3, t3 = 32, 160000

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

    v, s = _slope_timer(
        full_suite,
        lambda k: jnp.asarray(
            rng.normal(0, 0.1, (k, b3, t3)).astype(np.float32)
        ),
        b3 * 10.0,
    )
    # the multi line gets the roofline BOUND but no 'expected': its stage
    # constants would mix two calibration batches (B=48 frontend, B=32
    # heads, exp/multi_tail_calib_r05) and the cross-process composition
    # reads 1.02-1.07 — beyond the +-5% a measured-closed line may claim.
    # The per-head calibrated lines carry the expected-rate story.
    sol_multi = _sol(cfg, ("mfcc", "lmfe", "mfe", "ssc"))
    if sol_multi:
        sol_multi = dict(sol_multi)
        sol_multi.pop("expected_audio_s_per_s", None)
    _emit("audio_seconds_per_sec_per_chip (full suite: mfe+lmfe+ssc+mfcc)",
          v, spread=s, sol=sol_multi)

    # config 4: ragged utterances (1-35 s), bucketed: measure at the 2
    # dominant buckets and report audio-weighted throughput
    from mfcc_rust_tpu.utils.bucketing import bucket_length

    total_as, total_wall = 0.0, 0.0
    for seconds, bsz in [(5, 64), (20, 16)]:
        t = bucket_length(seconds * 16000)
        val, _ = _slope_timer(
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
    import jax.numpy as jnp

    from mfcc_rust_tpu import FeatureConfig, features

    cfg = FeatureConfig(sample_rate=16000)
    # batch 48: the r4 batch sweep (exp/headline_batch_sweep_r04_results
    # .txt) peaks at B~16-48 (1175-1237k audio-s/s) and DROPS at the old
    # B=64 (1015k) and B=128 (940k) — larger batches inflate the y
    # intermediate past what the HBM scheduler hides
    batch, seconds = 48, 10
    t = seconds * cfg.sample_rate
    rng = np.random.default_rng(0)

    # Methodology: K distinct batches scanned in ONE device call (distinct
    # data defeats CSE/caching), a host scalar read as the completion barrier
    # (block_until_ready is not reliable through the remote-execution
    # tunnel), and two-point SLOPEs over K to cancel the fixed ~25 ms
    # per-call dispatch overhead — median of 5 independent slopes + spread.
    value, spread = _slope_timer(
        lambda x: features.mfcc(x, cfg).sum(),
        lambda k: jnp.asarray(
            rng.normal(0, 0.1, (k, batch, t)).astype(np.float32)
        ),
        batch * float(seconds),
        k1=4,
        k2=16,
    )
    _emit("audio_seconds_per_sec_per_chip (MFCC-13, 16kHz)", value,
          spread=spread, sol=_sol(cfg, "mfcc"))


def _measure_link():
    """Two-size probes per direction -> (fixed seconds, bytes/s), using the
    SAME transfer forms the corpus runner issues: ``jax.device_put`` of a
    flat int16 buffer H2D, ``np.asarray`` of a fresh f32 device buffer D2H
    (repeats on the same array would read a host-side cache).  Two sizes
    separate the fixed per-call round trip from bandwidth:
    bw = (s2-s1)/(t2-t1), fixed = t1 - s1/bw.  Best-of-5 per point (the
    tunnel jitters ~2x run to run, CLAUDE.md).

    The h2d completion barrier is a scalar D2H read whose own round trip
    would otherwise inflate h2d_fixed by ~1 RTT (ADVICE r4): an empty-call
    baseline (the same scalar read on a resident tiny array) is measured
    and subtracted.

    Concurrency law (r5 span trace, exp/corpus_spans_r05.json probes): the
    tunnel is ONE serial shared link — two concurrent D2H fetches take
    exactly their serial sum, and H2D+D2H concurrently take the sum of
    each alone.  ``device_put`` is asynchronous (24 MB returns in ~20 ms
    vs ~470 ms to completion), so put calls pay NO serial fixed cost; the
    wire model sums byte times across directions and charges fixed cost
    per FETCH group only."""
    import jax
    import jax.numpy as jnp

    tiny = jax.device_put(np.zeros(8, np.float32))
    float(jnp.sum(tiny[:1]))
    base = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(tiny[:1]))
        base = min(base, time.perf_counter() - t0)

    def h2d_time(nbytes):
        buf = np.zeros(nbytes // 2, dtype=np.int16)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            dev = jax.device_put(buf)
            float(jnp.sum(dev[:1].astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return max(best - base, 1e-9)  # minus the barrier's own round trip

    def d2h_time(nbytes):
        best = float("inf")
        for i in range(5):
            dev = jax.device_put(np.full(nbytes // 4, float(i), np.float32))
            jax.block_until_ready(dev)
            float(jnp.sum(dev[:1]))  # ensure materialized through the tunnel
            t0 = time.perf_counter()
            np.asarray(dev)
            best = min(best, time.perf_counter() - t0)
        return best

    s1h, s2h = 2 * 1024 * 1024, 24 * 1024 * 1024
    t1h, t2h = h2d_time(s1h), h2d_time(s2h)
    h2d_bw = (s2h - s1h) / max(t2h - t1h, 1e-9)
    h2d_fixed = max(t1h - s1h / h2d_bw, 0.0)
    s1d, s2d = 1 * 1024 * 1024, 8 * 1024 * 1024
    t1d, t2d = d2h_time(s1d), d2h_time(s2d)
    d2h_bw = (s2d - s1d) / max(t2d - t1d, 1e-9)
    d2h_fixed = max(t1d - s1d / d2h_bw, 0.0)
    return {"h2d_fixed": h2d_fixed, "h2d_bw": h2d_bw,
            "d2h_fixed": d2h_fixed, "d2h_bw": d2h_bw}


def corpus(n_files: int = 192, seed: int = 0):
    """BASELINE config-4/5 end-to-end corpus extraction: synthesize a ragged
    on-disk WAV corpus (~LibriSpeech dev-clean length profile: lognormal
    around ~6 s, clipped to 1-35 s), run CorpusRunner — C++ decode, threaded
    prefetch, length bucketing, device extraction, idempotent .npy writes,
    corpus CMVN moments — and report audio-s/s *including* all host I/O.

    Wire-cost model (VERDICT r3 #1): the link's fixed round-trip latency and
    bandwidth are measured in-run per direction (two-size probes), the
    runner counts its actual transfer bytes and fetch/dispatch calls, and
    every run emits predicted-vs-actual wire seconds so the gap to the
    byte-only wire ceiling is itemized, not hand-waved.  A second timed run
    uses the f16 feature wire (wire_dtype="float16", halves D2H bytes) as a
    same-process A/B.

    Each wire variant gets its own warm pass first (separate output-cast
    programs; a bucket's first compile costs ~30 s on the TPU and would
    otherwise bill to the measurement)."""
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

        def run(out_dir, wire_dtype=None, pool_growth=None):
            # Tunnel bytes both ways are the measured bottleneck: packed
            # unpadded int16 PCM up (pack_signals), packed valid-frame
            # buffers down (packed_output default; optional 16-bit wire;
            # optional mixed-length pooling to amortize per-call fixed
            # round trips).
            # fetch_every=4: grouped fetches amortize the per-call D2H
            # round trip (+10% measured, exp/corpus_fixed_cost_ab_r04; the
            # r5 sweep exp/fetch_every_sweep confirms the optimum).  No
            # put grouping: the r5 span trace proved device_put is
            # asynchronous (puts pipeline behind the serial shared link,
            # paying no per-call fixed cost), which is why r4's put_group
            # measured neutral — the machinery is retired to exp/.
            r = CorpusRunner(paths, cfg, mesh, batch_size=128,
                             out_dir=out_dir, n_io_threads=8,
                             wire_dtype=wire_dtype, fetch_every=4,
                             pool_growth=pool_growth)
            t0 = time.perf_counter()
            r.run()
            return time.perf_counter() - t0, r.meter

        link = _measure_link()

        def wire_model(wall, meter, label):
            """Emit the per-run wire accounting under the measured link law
            (r5 span trace, exp/corpus_spans_r05.json): the tunnel is ONE
            serial shared link, device_put is asynchronous (puts pay no
            serial fixed cost — which is why r4's put_group grouping
            measured neutral), and only fetch groups expose a fixed round
            trip.  Predicted link seconds = sum of both directions' byte
            times + n_fetch_groups x d2h_fixed, compared against the
            MEASURED link-busy time (union of the runner's per-call
            dispatch/fetch spans — r4 compared against aggregate scopes,
            which conflated the pool threads' concurrent waits).  Wall
            splits into ramp (run start -> first dispatch span), link-busy,
            link-idle gaps, and tail (last fetch -> run end)."""
            c = meter.counters
            h2d_b, d2h_b = c.get("h2d_bytes", 0.0), c.get("d2h_bytes", 0.0)
            n_disp = c.get("dispatches", 0.0)
            n_fg = c.get("fetch_groups", 0.0)
            byte_s = h2d_b / link["h2d_bw"] + d2h_b / link["d2h_bw"]
            fixed_s = n_fg * link["d2h_fixed"]
            pred_link = byte_s + fixed_s
            link_busy = meter.span_union("dispatch", "fetch")
            # the tunnel's own ~2x nonstationarity (CLAUDE.md, 3 rounds of
            # artifacts) limits absolute prediction: probes are short solo
            # bursts, the run is minutes of sustained duplex traffic.  The
            # in-run effective bandwidth and its drift vs the probes are
            # reported so a pred/measured gap is attributable to link
            # drift, not model form (the span-trace process, where probe
            # and run saw the same link, matched to ~2% —
            # exp/corpus_spans_r05.json).
            eff_bw = (h2d_b + d2h_b) / max(link_busy - fixed_s, 1e-9)
            probed_bw = (h2d_b + d2h_b) / byte_s if byte_s else 0.0
            run_span = [s for s in meter.spans if s[0] == "run"]
            t_run0, t_run1 = run_span[0][1], run_span[0][2]
            xfer = [s for s in meter.spans if s[0] in ("dispatch", "fetch")]
            ramp = min(t0 for _, t0, _ in xfer) - t_run0 if xfer else 0.0
            tail = t_run1 - max(t1 for _, _, t1 in xfer) if xfer else 0.0
            # byte-only ceiling: fixed costs are amortizable (bigger fetch
            # groups), bytes are not — the directions SHARE the one link,
            # so their byte times add
            ceiling = total_audio / byte_s
            sc = meter.scopes
            print(json.dumps({
                "metric": f"corpus wire model [{label}] (serial-link law: "
                          "predicted vs measured link-busy seconds)",
                "value": round(total_audio / wall, 1), "unit": "audio-s/s",
                "vs_baseline": round(total_audio / wall / TARGET, 4),
                "wall_s": round(wall, 3),
                "scopes_s": {k: round(v, 3) for k, v in sc.items()},
                "pred_link_s": round(pred_link, 3),
                "pred_link_byte_s": round(byte_s, 3),
                "pred_link_fixed_s": round(fixed_s, 3),
                "measured_link_busy_s": round(link_busy, 3),
                "pred_over_measured": round(pred_link / link_busy, 4)
                if link_busy else 0.0,
                "in_run_eff_bw_mbs": round(eff_bw / 1e6, 1),
                "probed_bw_mbs": round(probed_bw / 1e6, 1),
                "link_drift_probe_over_run": round(probed_bw / eff_bw, 3)
                if eff_bw else 0.0,
                "link_utilization": round(link_busy / wall, 4),
                "wall_split_s": {"ramp": round(ramp, 3),
                                 "link_busy": round(link_busy, 3),
                                 "link_idle": round(
                                     max(wall - ramp - tail - link_busy, 0.0),
                                     3),
                                 "tail": round(tail, 3)},
                "h2d": {"bytes_mb": round(h2d_b / 1e6, 2),
                        "calls": int(n_disp)},
                "d2h": {"bytes_mb": round(d2h_b / 1e6, 2),
                        "calls": int(n_fg)},
                "link": {k: round(v, 4) if "fixed" in k else round(v / 1e6, 1)
                         for k, v in link.items()},
                "wire_ceiling_audio_s_per_s": round(ceiling, 1),
                "fraction_of_wire_ceiling": round(
                    total_audio / wall / ceiling, 4),
                # same ceiling evaluated at the bandwidth the link actually
                # delivered DURING the run (drift-corrected): the honest
                # utilization figure when the probes caught a faster burst
                "fraction_of_in_run_wire_ceiling": round(
                    (h2d_b + d2h_b) / eff_bw / wall, 4) if eff_bw else 0.0,
            }))
            return ceiling

        def local_attach_projection(wall, meter, label):
            """VERDICT r4 #3: the same wire model evaluated at local-attach
            (PCIe-class) constants — measured host costs kept as-is, the
            measured link-busy seconds replaced by the modeled local link
            time (~10 GB/s, ~10 us fixed; conservative for a v5e host).
            States what the shipped runner should do on real hardware,
            where the tunnel does not exist."""
            c = meter.counters
            h2d_b, d2h_b = c.get("h2d_bytes", 0.0), c.get("d2h_bytes", 0.0)
            n_fg = c.get("fetch_groups", 0.0)
            local_bw, local_fixed = 10e9, 10e-6
            pred_local = (h2d_b + d2h_b) / local_bw + n_fg * local_fixed
            # device compute, charged at the measured bucketed-ragged chip
            # rate (suite config 4; padding-inclusive) — on the tunnel it
            # hides under the link, locally it can become the floor
            compute_s = total_audio / 1.2e6
            link_busy = meter.span_union("dispatch", "fetch")
            proj_wall = wall - link_busy + max(pred_local, compute_s)
            proj = total_audio / proj_wall
            print(json.dumps({
                "metric": f"corpus local-attach projection [{label}] "
                          "(measured host costs + modeled PCIe link)",
                "value": round(proj, 1), "unit": "audio-s/s",
                "vs_baseline": round(proj / TARGET, 4),
                "proj_wall_s": round(proj_wall, 3),
                "modeled_link_s": round(pred_local, 4),
                "modeled_compute_s": round(compute_s, 4),
                "measured_host_s": round(wall - link_busy, 3),
                "assumptions": {"link_bw_gbs": 10.0, "fetch_fixed_us": 10.0,
                                "compute_rate_audio_s_per_s": 1.2e6},
                "clears_north_star": proj >= TARGET,
                "bottleneck": "host pipeline (decode ramp + pack + consume)"
                if (wall - link_busy) > max(pred_local, compute_s)
                else "device/link",
            }))

        def timed(tag, **kw):
            # median of 3 timed passes: single corpus walls swing with the
            # tunnel's ~2x link variance (CLAUDE.md); the wire model uses
            # the median run's meter
            runs = []
            for rep in range(3):
                d = f"{tmp}/{tag}{rep}"
                runs.append(run(d, **kw))
                shutil.rmtree(d)
            runs.sort(key=lambda r: r[0])
            return runs[1]

        run(f"{tmp}/warm")  # compile all buckets (f32 wire)
        shutil.rmtree(f"{tmp}/warm")
        wall, meter = timed("out")
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
        ceiling = wire_model(wall, meter, "f32 wire")
        local_attach_projection(wall, meter, "f32 wire")
        print(json.dumps({
            "metric": "corpus fraction of link roofline (end-to-end / wire "
                      "ceiling; ~1 = provably wire-bound)",
            "value": round(total_audio / wall / ceiling, 4),
            "unit": "ratio", "vs_baseline": 0.0,
            "device_scope_fraction": round(meter.throughput / ceiling, 4),
        }))

        # same-process A/B: f16 feature wire (halves the D2H direction;
        # error bound: exact f16 quantization of the f32 outputs, 2^-11 rel
        # — test_packed_output_wire_f16 / test_runner_wire_f16_outputs)
        run(f"{tmp}/warm16", wire_dtype="float16")
        shutil.rmtree(f"{tmp}/warm16")
        wall16, meter16 = timed("out16", wire_dtype="float16")
        _emit(
            "audio_seconds_per_sec_per_chip (corpus end-to-end, f16 feature "
            "wire)",
            total_audio / wall16,
        )
        wire_model(wall16, meter16, "f16 wire")
        local_attach_projection(wall16, meter16, "f16 wire")
        # (a coarse length-band pooling config was tried and REMOVED from
        # this bench: cutting the dispatch count to ~4 via pool_growth=2.5
        # measured 1137 vs 1164 audio-s/s at fetch_every=1 and collapsed
        # to 456 with grouped fetches — the on-device (B, T) unpack gather
        # pays per PADDED element, eating the fixed-cost savings.  The
        # knob remains on CorpusRunner with that caveat documented.)
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

    def run(devices, n_seq=1, feature="mfcc", run_cfg=None, b_override=None):
        n = len(devices)
        run_cfg = cfg if run_cfg is None else run_cfg
        mesh = make_mesh(n_data=n // n_seq, n_seq=n_seq, devices=devices)
        hop = run_cfg.stream_hop if feature == "melspec" else run_cfg.frame_step
        b = 16 * (n // n_seq) if b_override is None else b_override
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

    def emit(metric, value, target=TARGET, unit=None):
        print(json.dumps({"metric": metric, "value": round(value, 4),
                          "unit": unit or ("audio-s/s" if target else "ratio"),
                          "vs_baseline": round(value / (target or 1.0), 4)}))

    on_tpu = jax.default_backend() == "tpu"
    one = run(jax.devices()[:1])
    emit("scaling: audio_s_per_sec @1dev", one)
    if n_dev > 1:
        alln = run(jax.devices())
        emit(f"scaling: audio_s_per_sec @{n_dev}dev", alln)
        if on_tpu:
            # the BASELINE config-5 measurement: real chips, real ICI
            eff = alln / (one * n_dev)
            emit(f"scaling efficiency @{n_dev}dev (target 0.9)", eff / 0.9,
                 None)
        else:
            # virtual CPU mesh: the N "devices" timeshare one host's cores,
            # so per-device efficiency is meaningless (ceiling 1/N, ratios
            # can exceed 1.0).  The ONLY claim these lines support is that
            # the mesh/halo/psum wiring works and adds no overhead beyond
            # the shared silicon — they are harness validation, NOT
            # performance data.
            #
            # EQUAL WORK (r5, VERDICT r4 weak #4): the r3/r4 line compared
            # thr(B=16 @1dev) vs thr(B=16*N @Ndev) and sat at ~0.85 for two
            # rounds; exp/scaling_decomp.py decomposed it — one-device
            # throughput itself falls ~16% from B=16 to B=128 (cache
            # footprint on the shared cores), psum costs 0%, and at equal
            # B the sharded mesh is >= 1.0x.  The ratio below holds total
            # work fixed so it measures the wiring, not the batch bias.
            one_eq = run(jax.devices()[:1], b_override=16 * n_dev)
            print(json.dumps({
                "metric": "HARNESS-VALIDATION (virtual shared-core mesh, "
                          f"not perf): equal-work throughput @{n_dev}dev / "
                          "@1dev >= ~0.95 = sharding wiring overhead-free",
                "value": round(alln / one_eq, 4), "unit": "ratio",
                "vs_baseline": round(alln / one_eq, 4),
                "cross_batch_ratio_old_line": round(alln / one, 4),
                "one_dev_batch_bias_16_vs_128": round(
                    one / one_eq, 4),
                "decomposition": "exp/scaling_decomp.py r5: psum 0%, "
                                 "equal-work sharding >= 1.0x, residual = "
                                 "1-dev batch-size cache effect",
            }))
        # sequence-axis halo sweep: same device count, time axis sharded
        # 2/4-way — the ppermute halo of frame_len - hop samples is the only
        # extra work vs the pure-data mesh.  Only a real-ICI mesh can price
        # the halo; on the virtual mesh these lines only prove the wiring
        # executes (shared cores make the ratio unphysical).
        base = alln
        for n_seq in (2, 4):
            if n_dev % n_seq:
                continue
            v = run(jax.devices(), n_seq=n_seq)
            if on_tpu:
                emit(f"scaling: audio_s_per_sec @{n_dev}dev n_seq={n_seq}", v)
                emit(f"seq-halo relative throughput n_seq={n_seq} "
                     "(1.0 = free halo)", v / base, None)
            else:
                emit(f"HARNESS-VALIDATION (virtual mesh, not perf): seq-halo "
                     f"n_seq={n_seq} executed", 1.0, None, unit="ok")
        # vorbis melspec on the seq mesh (reference mel_spectrogram family)
        vcfg = vorbis_config(16000)
        v = run(jax.devices(), n_seq=min(2, n_dev), feature="melspec",
                run_cfg=vcfg)
        if on_tpu:
            emit(f"scaling: vorbis melspec audio_s_per_sec @{n_dev}dev "
                 "n_seq=2", v)
        else:
            emit("HARNESS-VALIDATION (virtual mesh, not perf): vorbis "
                 "melspec n_seq=2 executed", 1.0, None, unit="ok")


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
