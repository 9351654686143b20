"""Multi-feature (extract) tail calibration at the suite config (r5).

The full-suite line (mfcc+lmfe+mfe+ssc via ONE frontend pass, B=32) is
the only perf line without an expected model.  A serial physics model of
the heads overcharges — measured, the three extra heads cost only ~11%
over single-feature mfcc (XLA CSEs y*y between the mel and ssc power
paths and fuses the head epilogues) — so the heads tail is calibrated by
measurement, like the mfcc/vorbis tails:

  y-only       : the shared chunk-GEMM frontend (B=32)
  mfcc full    : single head (B=32 — note the parseval cost is
                 batch-dependent, r4: 23% at B=32)
  extract full : all four heads

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/multi_tail_calib.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from mfcc_rust_tpu import FeatureConfig, features  # noqa: E402
from mfcc_rust_tpu.constants import chunk_gemm_wall  # noqa: E402


def main():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    cfg = FeatureConfig(sample_rate=16000)
    b, t = 32, 160000  # the suite config-3 shapes
    audio_s = b * 10.0
    wd = chunk_gemm_wall(cfg, True)
    hop = cfg.frame_step

    def mk(k):
        return jnp.asarray(rng.normal(0, 0.1, (k, b, t)).astype(np.float32))

    def full_suite(x):
        out = features.extract(x, cfg, which=("mfcc", "lmfe", "mfe", "ssc"))
        feats, energies = out["mfe"]
        return (feats.sum() + energies.sum() + out["lmfe"].sum()
                + out["ssc"].sum() + out["mfcc"].sum())

    res = {}
    for name, fn in (
        ("y-only", lambda x: features._chunk_gemm(
            x, wd["wall"], t // hop, hop, cfg.precision)[1].sum()),
        ("mfcc", lambda x: features.mfcc(x, cfg).sum()),
        ("extract4", full_suite),
    ):
        v, s = bench._slope_timer(fn, mk, audio_s)
        res[name] = 1.0 / v
        print(f"{name:9s}: {v:9.0f} audio-s/s = {1e6/v:7.3f} us/as  "
              f"spread {s:.3f}", flush=True)
    print(f"\nmfcc tail (B=32):   {(res['mfcc']-res['y-only'])*1e6:7.3f} us/as")
    print(f"4-head tail (B=32): {(res['extract4']-res['y-only'])*1e6:7.3f} "
          f"us/as")
    print(f"extra-heads cost:   {(res['extract4']-res['mfcc'])*1e6:7.3f} "
          f"us/as")


if __name__ == "__main__":
    main()
