"""Does the axon tunnel pipeline concurrent operations?  Compare serial
dispatch+fetch of K real extraction batches vs a 2-thread pipeline (main
thread dispatches batch k+1 while a worker fetches batch k's outputs)."""
import queue
import threading
import time

import numpy as np

from mfcc_rust_tpu import FeatureConfig
from mfcc_rust_tpu.parallel import (
    extraction_step_packed,
    fetch_outputs,
    make_mesh,
    pack_signals,
)

cfg = FeatureConfig(sample_rate=16000)
mesh = make_mesh(n_seq=1)
rng = np.random.default_rng(0)

shapes = [(4, 23936), (2, 29824), (4, 37376), (16, 46592), (16, 58240),
          (32, 72832), (32, 91008), (32, 113792), (32, 142208),
          (32, 177664), (32, 222080), (16, 277632), (8, 347008)]
batches = []
total_audio = 0.0
for b, t in shapes:
    t = ((t + 159) // 160) * 160
    clips = []
    for _ in range(b):
        L = rng.integers(t // 2, t + 1)
        c = rng.normal(0, 0.1, L).astype(np.float32)
        c = (np.rint(c * 32768).clip(-32768, 32767) / 32768.0).astype(np.float32)
        clips.append(c)
        total_audio += L / 16000.0
    flat, offs, lens = pack_signals(clips, b, mesh)
    batches.append((flat, offs, lens, t))

def dispatch(b):
    flat, offs, lens, t = b
    return extraction_step_packed(flat, offs, lens, t, cfg, mesh, "mfcc")

# warm compiles
for b in batches:
    fetch_outputs(dispatch(b))
print(f"{len(batches)} batches, {total_audio:.0f} audio-s", flush=True)

def serial():
    for b in batches:
        fetch_outputs(dispatch(b))

def pipelined(n_workers=1):
    q = queue.Queue(maxsize=n_workers + 1)
    def worker():
        while True:
            item = q.get()
            if item is None:
                return
            fetch_outputs(item)
    ws = [threading.Thread(target=worker) for _ in range(n_workers)]
    for w in ws:
        w.start()
    for b in batches:
        q.put(dispatch(b))
    for _ in ws:
        q.put(None)
    for w in ws:
        w.join()

for label, fn in (("serial", serial), ("pipeline 1 fetch thread", lambda: pipelined(1)),
                  ("pipeline 2 fetch threads", lambda: pipelined(2)),
                  ("pipeline 4 fetch threads", lambda: pipelined(4)),
                  ("serial again", serial)):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s}: {best:7.3f}s  {total_audio/best:8.1f} audio-s/s",
          flush=True)
