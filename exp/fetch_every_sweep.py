"""fetch_every / fetch_threads sweep under the corrected serial-link law
(r5).  The span trace (exp/corpus_spans_r05.json) proved the tunnel is one
serial shared link where only fetch groups pay a fixed round trip, so the
remaining corpus levers are (a) fewer fetch groups and (b) keeping the link
saturated.  Same-process A/B (CLAUDE.md: cross-process tunnel numbers are
invalid): median of 3 corpus runs per config, f16 wire.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/fetch_every_sweep.py
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mfcc_rust_tpu import FeatureConfig
    from mfcc_rust_tpu.parallel import make_mesh
    from mfcc_rust_tpu.parallel.runner import CorpusRunner
    from mfcc_rust_tpu.runtime import write_wav

    rng = np.random.default_rng(0)
    n_files = 192
    secs = np.clip(rng.lognormal(np.log(6.0), 0.6, n_files), 1.0, 35.0)
    cfg = FeatureConfig(sample_rate=16000)
    mesh = make_mesh(n_seq=1)
    tmp = tempfile.mkdtemp(prefix="fesweep_")
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

        def run(tag, fetch_every, fetch_threads):
            d = f"{tmp}/{tag}"
            r = CorpusRunner(paths, cfg, mesh, batch_size=128, out_dir=d,
                             n_io_threads=8, wire_dtype="float16",
                             fetch_every=fetch_every,
                             fetch_threads=fetch_threads)
            t0 = time.perf_counter()
            r.run()
            wall = time.perf_counter() - t0
            shutil.rmtree(d)
            return wall, r.meter

        # warm compiles (all buckets, f16 wire)
        run("warm", 4, 4)

        results = []
        for fe in (1, 4, 7, 13):
            walls = []
            for rep in range(3):
                walls.append(run(f"fe{fe}_{rep}", fe, 4))
            walls.sort(key=lambda w: w[0])
            wall, meter = walls[1]
            lb = meter.span_union("dispatch", "fetch")
            print(f"fetch_every={fe:2d} threads=4: median wall {wall:.3f}s "
                  f"({total_audio/wall:7.1f} audio-s/s) link_busy {lb:.3f}s "
                  f"groups {int(meter.counters.get('fetch_groups', 0))} "
                  f"walls {[round(w[0], 3) for w in walls]}", flush=True)
            results.append((fe, 4, wall))
        best_fe = min(results, key=lambda r: r[2])[0]
        for ft in (1, 2):
            walls = []
            for rep in range(3):
                walls.append(run(f"ft{ft}_{rep}", best_fe, ft))
            walls.sort(key=lambda w: w[0])
            wall, meter = walls[1]
            lb = meter.span_union("dispatch", "fetch")
            print(f"fetch_every={best_fe:2d} threads={ft}: median wall "
                  f"{wall:.3f}s ({total_audio/wall:7.1f} audio-s/s) "
                  f"link_busy {lb:.3f}s "
                  f"walls {[round(w[0], 3) for w in walls]}", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
