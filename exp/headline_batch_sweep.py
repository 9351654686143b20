"""Headline batch-size sweep (r4): full MFCC at precision=high across
B in {8..128}; the y intermediate grows with B past what the HBM
scheduler hides.  Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/headline_batch_sweep.py
"""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import bench
import mfcc_rust_tpu as m
from mfcc_rust_tpu import features as F

def main():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    cfg = m.speechpy_config(16000)
    t = 160000
    for b in (8, 16, 32, 48, 64, 128):
        a_s = b * 10.0
        mk = lambda k, b=b: jnp.asarray(rng.normal(0,0.1,(k,b,t)).astype(np.float32))
        v, s = bench._slope_timer(lambda x: F.mfcc(x, cfg).sum(), mk, a_s)
        print(f"B={b:4d} full mfcc high: {v:9.0f} audio-s/s  spread {s:.3f}", flush=True)

main()
