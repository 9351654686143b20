"""Time the REAL corpus drain pattern: 13 bucket-shaped extraction_step
dispatches, then (a) fetch_outputs per batch, (b) block_until_ready then one
grouped _pack_leaves fetch, (c) grouped fetch without blocking — to isolate
whether sharded outputs / the 70-leaf pack / deferred execution explains the
6.3 s drain seen in exp/corpus_ab.py."""
import time

import jax
import numpy as np

from mfcc_rust_tpu import FeatureConfig
from mfcc_rust_tpu.parallel import make_mesh
from mfcc_rust_tpu.parallel.data import extraction_step, fetch_outputs

cfg = FeatureConfig(sample_rate=16000)
mesh = make_mesh(n_seq=1)
rng = np.random.default_rng(0)

# the 13 (b_pad, bucket) shapes from the bench corpus
shapes = [(4, 23936), (2, 29824), (4, 37376), (16, 46592), (16, 58240),
          (32, 72832), (32, 91008), (32, 113792), (32, 142208),
          (32, 177664), (32, 222080), (16, 277632), (8, 347008)]
sigs = []
for b, t in shapes:
    t = ((t + 159) // 160) * 160
    sig = rng.normal(0, 0.1, (b, t)).astype(np.float32)
    lens = np.full(b, t, np.int64)
    sigs.append((sig, lens))

def dispatch_all():
    return [extraction_step(s, l, cfg, mesh, "mfcc") for s, l in sigs]

# warm every program + the grouped pack
outs = dispatch_all()
fetch_outputs(outs)
for o in outs:
    fetch_outputs(o)

def timeit(label, f, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:45s} {best*1e3:9.1f} ms", flush=True)

nbytes = sum(sum(x.nbytes for x in jax.tree.leaves(o)) for o in outs)
print(f"total output bytes: {nbytes/1e6:.1f} MB", flush=True)

timeit("dispatch all 13 (async)", dispatch_all)
timeit("dispatch+fetch each", lambda: [fetch_outputs(extraction_step(s, l, cfg, mesh, 'mfcc')) for s, l in sigs])
def grouped():
    o = dispatch_all()
    return fetch_outputs(o)
timeit("dispatch all + grouped fetch", grouped)
def blocked_grouped():
    o = dispatch_all()
    jax.block_until_ready(o)
    return fetch_outputs(o)
timeit("dispatch all + block + grouped fetch", blocked_grouped)
def all_then_each():
    o = dispatch_all()
    return [fetch_outputs(x) for x in o]
timeit("dispatch all + fetch each", all_then_each)
