"""In-pipeline stage calibration for the chunk-gemm-fused speechpy MFCC
lowering (r5 follow-up to exp/expected_calib).

The expected model charged stage A at the ISOLATED dot rate (pre-built
dense operand) — but the shipped lowering's dot reads the concat-fused
shifted-slice operand, which is slower (strict: y-only 1.084 us/as vs
isolated dot 0.734).  The strict line still landed at ~0.99 only because
the physics tail charge (0.478 us/as) overcharged the real tail (0.154)
by about the same amount — two canceling errors.  This script measures
the IN-PIPELINE serial stages at both precisions in one process:

  y-only : features._chunk_gemm(signal, wall, ...) — stage A as shipped
  full   : features.mfcc — y + parseval + projection/log/DCT tail

yielding (in-pipeline stage-A q-rate, measured tail s/as) per precision
for the calibrated stage model in utils/profiling.py.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/chunk_stage_calib.py
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
    b, t = 48, 160000
    audio_s = b * 10.0
    up = lambda x: -(-x // 128) * 128

    for prec in ("high", "highest"):
        cfg = FeatureConfig(sample_rate=16000, precision=prec)
        wd = chunk_gemm_wall(cfg, True)
        hop = cfg.frame_step
        K = wd["r"] * hop
        N = wd["wall"].shape[1]
        fps = cfg.sample_rate / hop
        q_per_as = 2.0 * up(K) * up(N) * fps

        def mk(k):
            return jnp.asarray(
                rng.normal(0, 0.1, (k, b, t)).astype(np.float32))

        v, s = bench._slope_timer(
            lambda x, c=cfg, w=wd: features._chunk_gemm(
                x, w["wall"], t // hop, hop, c.precision)[1].sum(),
            mk, audio_s)
        y_s = 1.0 / v
        print(f"[{prec}] y-only: {v:9.0f} audio-s/s  spread {s:.3f}",
              flush=True)
        v, s = bench._slope_timer(
            lambda x, c=cfg: features.mfcc(x, c).sum(), mk, audio_s)
        full_s = 1.0 / v
        print(f"[{prec}] full:   {v:9.0f} audio-s/s  spread {s:.3f}",
              flush=True)
        rate = q_per_as / y_s
        tail = full_s - y_s
        print(f"[{prec}] K={K}->pad{up(K)} N={N}->pad{up(N)}: in-pipeline "
              f"stage-A {rate/1e12:.1f} q-TFLOP/s | tail {tail*1e6:.3f} "
              f"us/as", flush=True)


if __name__ == "__main__":
    main()
