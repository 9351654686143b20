"""Parseval/energy-machinery cost vs batch size (r4): full mfcc vs
dc_elimination=False (energies DCE) vs mfe heads, precision=high.
Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/parseval_cost.py
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
    for b in (32, 64):
        t = 160000
        a_s = b * 10.0
        mk = lambda k, b=b: jnp.asarray(rng.normal(0,0.1,(k,b,t)).astype(np.float32))
        for name, fn in [
            ("full mfcc (dc_elim)", lambda x: F.mfcc(x, cfg).sum()),
            ("mfcc dc_elim=False", lambda x: F.mfcc(x, cfg.replace(dc_elimination=False)).sum()),
            ("mfe feats only (energy DCE)", lambda x: F.mfe(x, cfg)[0].sum()),
            ("mfe feats+energies", lambda x: (F.mfe(x, cfg)[0].sum() + F.mfe(x, cfg)[1].sum())),
        ]:
            v, s = bench._slope_timer(fn, mk, a_s)
            print(f"B={b} {name:30s}: {v:9.0f} audio-s/s  spread {s:.3f}", flush=True)

main()
