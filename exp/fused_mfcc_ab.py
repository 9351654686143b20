"""On-chip A/B: fused speechpy-MFCC Pallas kernel vs the XLA chunk-GEMM
lowering at the shipped precision="high" default (VERDICT r3 #4).

Also prices the serial non-GEMM work in the XLA path directly:
dc_elimination=False drops the Parseval energy pass (and the energy
columns), bounding what ANY fusion could win back.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/fused_mfcc_ab.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import bench
import mfcc_rust_tpu as m
from mfcc_rust_tpu import features as F


def main():
    import jax.numpy as jnp

    b, t = 64, 160000
    rng = np.random.default_rng(0)
    audio_s = b * 10.0

    def mk(k):
        return jnp.asarray(rng.normal(0, 0.1, (k, b, t)).astype(np.float32))

    cfg = m.speechpy_config(16000)  # precision="high" default

    # numerics gate first (chip Mosaic vs chip XLA)
    sig = jnp.asarray(rng.normal(0, 0.1, (2, 48000)).astype(np.float32))
    ref = np.asarray(F.mfcc(sig, cfg))
    out = np.asarray(F.mfcc(sig, cfg.replace(pallas="force")))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    print(f"numerics: kernel vs XLA max rel-of-max {rel:.2e} (gate 1e-3)",
          flush=True)
    assert rel < 1e-3

    v, s = bench._slope_timer(lambda x: F.mfcc(x, cfg).sum(), mk, audio_s)
    print(f"XLA high (headline)      : {v:9.0f} audio-s/s  spread {s:.3f}",
          flush=True)

    v, s = bench._slope_timer(
        lambda x: F.mfcc(x, cfg.replace(dc_elimination=False)).sum(),
        mk, audio_s)
    print(f"XLA high, no energy pass : {v:9.0f} audio-s/s  spread {s:.3f}"
          "   <- bounds any fusion win", flush=True)

    from mfcc_rust_tpu.ops.pallas.speechpy_mfcc import mfcc_pallas

    for fuse in (True, False):
        for tf in (256, 512, 1024):
            try:
                v, s = bench._slope_timer(
                    lambda x, tf=tf, fu=fuse: mfcc_pallas(
                        x.reshape(-1, t), cfg, tile_f=tf, fuse_big=fu).sum(),
                    mk, audio_s)
                print(f"kernel fuse={int(fuse)} tile_f={tf:4d}: {v:9.0f} "
                      f"audio-s/s  spread {s:.3f}", flush=True)
            except Exception as e:
                print(f"kernel fuse={int(fuse)} tile_f={tf:4d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
