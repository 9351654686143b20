"""Config-transfer check for the CT mel kernel's calibrated stage constants
(VERDICT r4 weak #2 / next #6): the per-unit rates in utils/profiling.py
(window+DMA s/sample, stage-1 s/flop, epilogue s/vreg-touch) were measured
at ONE config (2048/512/128 @22.05 kHz, tile_f=256).  This experiment
re-runs the per-stage ablation at a second dispatched config
(1024/256/128 @22.05 kHz — wedge-safe: all internal GEMMs << 2048) and at
the calibration config in the SAME process, then prints per-unit rates
side by side.  Also measures the stage-2 delta alone at both configs to
close the 18% residual ('stage 2 charged at the physics rate' was the r4
suspect).

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/ct_transfer.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from mfcc_rust_tpu import librosa_config  # noqa: E402
from mfcc_rust_tpu.features import _librosa_pallas_ok  # noqa: E402
from mfcc_rust_tpu.ops.fft import _ct_constants  # noqa: E402
from mfcc_rust_tpu.ops.pallas.ct_mel import (  # noqa: E402
    ct_mel_pallas,
    kernel_factorization,
)


def model_units(cfg):
    """The same modeled work units utils/profiling.py charges."""
    n = cfg.fft_points
    n1, n2 = kernel_factorization(cfg)
    k1max = n1 // 2
    h = n2 // 2
    c2, s2, *_ = _ct_constants(n, n1, n2)
    nz = 0
    for r2 in range(h + 1):
        nz += sum(abs(c2[r2][q]) > 1e-12 for q in (0, h))
        nz += sum(abs(c2[r2][q]) > 1e-12 for q in range(1, h))
        nz += sum(abs(s2[r2][q]) > 1e-12 for q in range(1, h))
    st1_flops = 2 * (h - 1) * n1 + 2 * nz * n1
    up = lambda x: -(-x // 128) * 128
    te = lambda k, nn: (k / up(k)) * (nn / up(nn))
    g2 = 2 * (2.0 * n1 * 2 * k1max / te(n1, 2 * k1max))
    if h > 1:
        g2 += (h - 1) * (2.0 * 2 * n1 * 4 * k1max / te(2 * n1, 4 * k1max))
    touches = ((h + 1) * 4 * k1max + max(h - 1, 0) * 2 * k1max
               + (h + 1) * 2 * k1max)
    gproj = 2.0 * (h + 1) * 2 * k1max * cfg.num_filters / te(
        (h + 1) * 2 * k1max, cfg.num_filters)
    return {"n": n, "n1": n1, "n2": n2, "k1max": k1max, "h": h,
            "st1_flops": st1_flops, "g2_qflops": g2, "touches": touches,
            "gproj_qflops": gproj}


def ablate_config(cfg, b, t, tag):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    audio_s = b * t / cfg.sample_rate
    mu = model_units(cfg)
    fps = cfg.sample_rate / cfg.frame_step
    print(f"\n[{tag}] n={mu['n']} n1={mu['n1']} n2={mu['n2']} "
          f"k1max={mu['k1max']} fps={fps:.1f}", flush=True)
    assert _librosa_pallas_ok(cfg), f"{tag}: kernel does not dispatch"

    def mk(k):
        return jnp.asarray(rng.normal(0, 0.1, (k, b, t)).astype(np.float32))

    secs = {}
    for ab in ("window", "stage1", "stage2", None):
        name = ab or "full"
        v, s = bench._slope_timer(
            lambda x, a=ab: ct_mel_pallas(x, cfg, ablate=a).sum(),
            mk, audio_s,
        )
        secs[name] = 1.0 / v
        print(f"  {name:7s}: {v:9.0f} audio-s/s = {1e6/v:8.3f} us/as  "
              f"spread {s:.3f}", flush=True)

    # per-unit rates (the calibrated constants' definitions)
    win_rate = secs["window"] / (mu["n"] * fps)  # s/sample (incl. DMA)
    st1_rate = (secs["stage1"] - secs["window"]) / (mu["st1_flops"] * fps)
    st2_rate = (secs["stage2"] - secs["stage1"]) / (mu["g2_qflops"] * fps)
    epi_s = secs["full"] - secs["stage2"]
    # epilogue = touches at the vreg rate + the projection GEMM; report the
    # residual touch rate after charging the GEMM at the measured st2 rate
    epi_touch = (epi_s - mu["gproj_qflops"] * fps * st2_rate) / (
        mu["touches"] * fps)
    print(f"  per-unit: window+dma {win_rate:.3e} s/sample | "
          f"stage1 {st1_rate:.3e} s/flop | "
          f"stage2 {1/st2_rate/1e12:.1f} q-TFLOP/s | "
          f"epilogue {epi_touch:.3e} s/touch", flush=True)
    return {"win": win_rate, "st1": st1_rate, "st2": st2_rate,
            "epi": epi_touch}


def main():
    cal = ablate_config(librosa_config(22050), 32, 220500, "2048/512 cal")
    alt = ablate_config(
        librosa_config(22050, n_fft=1024, hop_length=256, n_mels=128),
        32, 220500, "1024/256 alt")
    print("\ntransfer ratios (alt/cal):", flush=True)
    for k in ("win", "st1", "st2", "epi"):
        print(f"  {k}: {alt[k]/cal[k]:.3f}", flush=True)


if __name__ == "__main__":
    main()
