"""A/B the corpus runner's dispatch-ahead depth on the real chip: fetch_every
1 (per-batch fetch, round-1 behavior) vs 16 (grouped packed fetch), with the
meter's dispatch/fetch scope breakdown so the fixed-latency budget is visible.
"""
import shutil
import tempfile
import time

import numpy as np

from mfcc_rust_tpu import FeatureConfig
from mfcc_rust_tpu.parallel import make_mesh
from mfcc_rust_tpu.parallel.runner import CorpusRunner
from mfcc_rust_tpu.runtime import write_wav

rng = np.random.default_rng(0)
n_files = 192
secs = np.clip(rng.lognormal(np.log(6.0), 0.6, n_files), 1.0, 35.0)
cfg = FeatureConfig(sample_rate=16000)
mesh = make_mesh(n_seq=1)
tmp = tempfile.mkdtemp(prefix="corpus_ab_")
paths = []
total_audio = 0.0
for i, s in enumerate(secs):
    clip = rng.normal(0, 0.1, int(s * 16000)).astype(np.float32)
    np.clip(clip, -1.0, 1.0, out=clip)
    p = f"{tmp}/utt{i:05d}.wav"
    write_wav(p, clip, 16000)
    paths.append(p)
    total_audio += len(clip) / 16000.0

print(f"corpus: {n_files} files, {total_audio:.1f} audio-s", flush=True)

try:
    combos = [(1, 0), (1, 2), (2, 2), (1, 4), (1, 0), (1, 2)]
    for depth, threads in combos:
        out = f"{tmp}/out_{time.monotonic_ns()}"
        r = CorpusRunner(paths, cfg, mesh, batch_size=128, out_dir=out,
                         n_io_threads=8, fetch_every=depth,
                         fetch_threads=threads)
        t0 = time.perf_counter()
        r.run()
        wall = time.perf_counter() - t0
        print(f"fetch_every={depth:3d} fetch_threads={threads}: "
              f"wall={wall:7.3f}s e2e={total_audio / wall:8.1f} audio-s/s "
              f"scopes={ {k: round(v, 3) for k, v in r.meter.scopes.items()} } "
              f"batches={r.meter.batches}", flush=True)
        shutil.rmtree(out)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
