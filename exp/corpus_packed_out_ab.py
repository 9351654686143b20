"""Same-process A/B: CorpusRunner packed_output=True vs False.

The tunnel's link bandwidth swings ~2x between runs (r3: H2D measured
103 MB/s then 52 MB/s an hour apart), so packed-output wins can only be
measured by interleaving both modes in one process over the same corpus.

Run: python exp/corpus_packed_out_ab.py
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
    tmp = tempfile.mkdtemp(prefix="ab_corpus_")
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

        def run(packed, tag):
            out = f"{tmp}/{tag}"
            r = CorpusRunner(paths, cfg, mesh, batch_size=128,
                             out_dir=out, n_io_threads=8,
                             packed_output=packed)
            t0 = time.perf_counter()
            r.run()
            wall = time.perf_counter() - t0
            shutil.rmtree(out)
            return wall, dict(r.meter.scopes)

        # warm both jit caches
        run(True, "warm_t")
        run(False, "warm_f")
        results = {True: [], False: []}
        scopes = {True: None, False: None}
        for rep in range(4):
            for packed in (True, False):
                wall, sc = run(packed, f"r{rep}_{packed}")
                results[packed].append(wall)
                scopes[packed] = sc
        for packed in (True, False):
            ws = sorted(results[packed])
            med = ws[len(ws) // 2]
            print(f"packed_output={packed}: median wall {med:.3f}s "
                  f"({total_audio/med:7.1f} audio-s/s)  "
                  f"walls {[round(w, 3) for w in ws]}")
            print(f"   scopes (last rep): "
                  f"{ {k: round(v, 3) for k, v in scopes[packed].items()} }")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print("exit: 0")


if __name__ == "__main__":
    main()
