import sys, time, shutil, tempfile
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
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
tmp = tempfile.mkdtemp(prefix="fe_ab_")
try:
    paths = []
    total = 0.0
    for i, s in enumerate(secs):
        clip = rng.normal(0, 0.1, int(s * 16000)).astype(np.float32)
        np.clip(clip, -1, 1, out=clip)
        p = f"{tmp}/u{i:05d}.wav"; write_wav(p, clip, 16000); paths.append(p)
        total += len(clip) / 16000.0

    def run(fe, ft, tag):
        out = f"{tmp}/{tag}"
        r = CorpusRunner(paths, cfg, mesh, batch_size=128, out_dir=out,
                         n_io_threads=8, fetch_every=fe, fetch_threads=ft)
        t0 = time.perf_counter(); r.run(); w = time.perf_counter() - t0
        shutil.rmtree(out)
        return w

    for fe, ft in ((1, 2), (2, 2), (4, 2), (1, 4)):
        run(fe, ft, f"warm{fe}_{ft}")
    res = {}
    for rep in range(3):
        for fe, ft in ((1, 2), (2, 2), (4, 2), (1, 4)):
            res.setdefault((fe, ft), []).append(run(fe, ft, f"r{rep}_{fe}_{ft}"))
    for k, ws in res.items():
        ws.sort(); med = ws[len(ws)//2]
        print(f"fetch_every={k[0]} threads={k[1]}: median {med:.3f}s "
              f"({total/med:7.1f} audio-s/s) walls {[round(w,3) for w in ws]}")
finally:
    shutil.rmtree(tmp, ignore_errors=True)
print("exit: 0")
