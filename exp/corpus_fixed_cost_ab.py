"""Corpus fixed-cost levers (r4): (a) do the three per-dispatch
device_puts (flat/offsets/lengths) each pay a tunnel round trip, or do
they pipeline?  (b) same-process corpus A/B of fetch_every=1 vs 4 with the
f16 wire (grouped fetches amortize the D2H fixed cost).

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/corpus_fixed_cost_ab.py
"""

import sys, time

sys.path.insert(0, "/root/repo")

import numpy as np


def probe_device_put():
    import jax
    import jax.numpy as jnp

    flat = np.zeros(1 << 20, np.int16)
    offs = np.zeros(128, np.int32)
    lens = np.zeros(128, np.int32)

    def barrier(x):
        float(jnp.sum(x[:1].astype(jnp.float32)))

    for label, arrays in [("3 separate puts", [flat, offs, lens]),
                          ("1 put (flat only)", [flat])]:
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            devs = [jax.device_put(a) for a in arrays]
            for d in devs:
                barrier(d)
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best*1e3:7.1f} ms best-of-6", flush=True)


def corpus_ab():
    import shutil
    import tempfile

    from mfcc_rust_tpu import FeatureConfig
    from mfcc_rust_tpu.parallel import make_mesh
    from mfcc_rust_tpu.parallel.runner import CorpusRunner
    from mfcc_rust_tpu.runtime import write_wav

    rng = np.random.default_rng(0)
    secs = np.clip(rng.lognormal(np.log(6.0), 0.6, 192), 1.0, 35.0)
    cfg = FeatureConfig(sample_rate=16000)
    mesh = make_mesh(n_seq=1)
    tmp = tempfile.mkdtemp(prefix="corpus_fc_")
    try:
        paths, total = [], 0.0
        for i, s in enumerate(secs):
            clip = rng.normal(0, 0.1, int(s * 16000)).astype(np.float32)
            np.clip(clip, -1, 1, out=clip)
            p = f"{tmp}/u{i:05d}.wav"
            write_wav(p, clip, 16000)
            paths.append(p)
            total += len(clip) / 16000.0

        def run(tag, **kw):
            out = f"{tmp}/{tag}"
            r = CorpusRunner(paths, cfg, mesh, batch_size=128, out_dir=out,
                             n_io_threads=8, wire_dtype="float16", **kw)
            t0 = time.perf_counter()
            r.run()
            w = time.perf_counter() - t0
            shutil.rmtree(out)
            return w, r.meter

        run("warm")  # compile
        for tag, kw in [("fetch_every=1", {}),
                        ("fetch_every=4", {"fetch_every": 4}),
                        ("fetch_every=8", {"fetch_every": 8})]:
            walls = []
            for rep in range(3):
                w, meter = run(f"{tag}_{rep}", **kw)
                walls.append(w)
            walls.sort()
            med = walls[1]
            print(f"{tag}: median {med:.3f}s ({total/med:7.1f} audio-s/s) "
                  f"walls {[round(x,3) for x in walls]} "
                  f"scopes {dict((k, round(v,3)) for k,v in meter.scopes.items())}",
                  flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    probe_device_put()
    corpus_ab()
