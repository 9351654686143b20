"""Per-stage + tile-size ablation of the fused Pallas CT mel kernel
(VERDICT r3 #3: settle the 30%-of-light).

Variants, all on the 2048/512/128 librosa config (the kernel's dispatch
default) with the same inputs and the jitter-proof slope harness:

  * full kernel at tile_f = 128 (shipped), 256, 512 — per-tile fixed costs
    (MXU weight-load/fill per GEMM, VPU<->MXU serialization) amortize with
    tile_f, so the slope across tile sizes separates fixed-per-tile from
    per-frame work.
  * ablations at tile_f = 128: "window" (DMA + window multiply only),
    "stage1" (+ Hermitian-paired VPU chains), "stage2" (+ MXU stage-2 GEMMs,
    no squaring/projection), full (+ |X|^2 + mel projection GEMMs).

Run on the chip: PYTHONPATH=/root/repo:/root/.axon_site python exp/ct_ablation.py
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

    for tile_f in (128, 256, 512):
        try:
            v, s = bench._slope_timer(
                lambda x, tf=tile_f: ct_mel_pallas(x, cfg, tile_f=tf).sum(),
                mk, audio_s,
            )
            print(f"full tile_f={tile_f:4d}: {v:9.0f} audio-s/s  "
                  f"spread {s:.3f}", flush=True)
        except Exception as e:  # VMEM overflow etc. — report, keep going
            print(f"full tile_f={tile_f:4d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    for ab in ("window", "stage1", "stage2"):
        v, s = bench._slope_timer(
            lambda x, a=ab: ct_mel_pallas(x, cfg, ablate=a).sum(),
            mk, audio_s,
        )
        print(f"ablate={ab:7s} tile128: {v:9.0f} audio-s/s  spread {s:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
