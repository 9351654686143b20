"""Per-chunk latency of the streaming session (VERDICT r1 #8).

Real-time profile: feed 1-hop chunks and time each process() call.  Through
the remote-TPU tunnel the floor is the fixed ~24 ms dispatch latency, so the
interesting numbers are (a) the incremental-vs-recompute device work ratio
and (b) CPU-backend latency, which approximates an on-host deployment.

Run: python exp/streaming_latency.py [--cpu]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import mfcc_rust_tpu as m
from mfcc_rust_tpu.models import StreamingFeatures


def bench(feature, cfg, n_chunks=200):
    sess = StreamingFeatures(cfg, feature=feature)
    hop = cfg.frame_step
    rng = np.random.default_rng(0)
    sig = rng.normal(0, 0.1, hop * (n_chunks + 20)).astype(np.float32)
    # warm up compiles + pipeline
    for i in range(20):
        sess.process(sig[i * hop : (i + 1) * hop])
    lat = []
    for i in range(20, 20 + n_chunks):
        t0 = time.perf_counter()
        out = sess.process(sig[i * hop : (i + 1) * hop])
        lat.append(time.perf_counter() - t0)
    lat = np.sort(np.array(lat))
    chunk_ms = hop / cfg.sample_rate * 1e3
    med = np.median(lat) * 1e3
    mode = "incremental" if sess._inc is not None else "recompute"
    print(
        f"{feature:12s} [{mode:11s}] hop={hop:5d} ({chunk_ms:6.2f} ms audio)"
        f"  median {med:7.3f} ms  p95 {lat[int(0.95*len(lat))]*1e3:7.3f} ms"
        f"  rtf {chunk_ms/med:6.1f}x",
        flush=True,
    )


def main():
    cfg = m.speechpy_config(16000)
    bench("mfcc", cfg)
    bench("lmfe", cfg)
    lcfg = m.librosa_config(22050).replace(center=False)
    bench("mel_librosa", lcfg)
    # recompute fallback for comparison (hop not dividing the frame)
    bench("mfcc", m.speechpy_config(16000).replace(frame_stride=0.012))


if __name__ == "__main__":
    main()
