"""A/B: CT mel kernel power pre-add on the VPU vs folded into the
projection GEMM's K dimension (fold_preadd), plus tile_f at the new 256
default.  Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/ct_preadd_ab.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import bench
from mfcc_rust_tpu import librosa_config
from mfcc_rust_tpu.ops.pallas.ct_mel import ct_mel_pallas


def main():
    import jax.numpy as jnp

    cfg = librosa_config(22050)
    b, t = 32, 220500
    rng = np.random.default_rng(0)
    audio_s = b * 10.0

    def mk(k):
        return jnp.asarray(rng.normal(0, 0.1, (k, b, t)).astype(np.float32))

    for fold in (False, True):
        for tf in (128, 256):
            v, s = bench._slope_timer(
                lambda x, f=fold, tf=tf: ct_mel_pallas(
                    x, cfg, tile_f=tf, fold_preadd=f).sum(),
                mk, audio_s,
            )
            print(f"fold_preadd={int(fold)} tile_f={tf:3d}: {v:9.0f} "
                  f"audio-s/s  spread {s:.3f}", flush=True)


if __name__ == "__main__":
    main()
