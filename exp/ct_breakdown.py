"""Stage breakdown of the librosa CT mel path on the real TPU.

Where do the ~59% of non-MXU cycles go?  Time, with the slope method:
  full        — mel_spectrogram_librosa as shipped
  high        — same at precision=high (3-pass)
  noconcat    — frames pre-materialized (isolates the r-slice concat cost)
  gemms       — CT stages + projection only on pre-windowed frames
  stage2_proj — stage-2 GEMM + projection only (the FLOPs core)

RESULTS (TPU v5e, 2026-08-19):

    full            2.286 ms     140.0k audio-s/s
    high            2.491 ms     128.5k audio-s/s
    noconcat        1.994 ms     160.5k audio-s/s
    gemms           2.589 ms     123.6k audio-s/s   (reads frames from HBM)
    stage2_proj     0.802 ms     399.1k audio-s/s

Takeaways: the FLOPs core (stage-2 batched GEMMs + mel projection) is only
0.80 ms — 65% of the pipeline is frame materialization (4x signal bytes),
the window multiply, and the stage-1 batched-tiny GEMM (per-frame M=32,
K=16, N=128 — far below an MXU tile, so it is HBM-round-trip-bound, not
FLOPs-bound).  "gemms" being *slower* than "full" confirms it: feeding the
same GEMMs from a pre-materialized HBM frames tensor loses to the fused
producer.  The remaining ~2.5x on this path therefore needs a Pallas kernel
that builds windowed (N2, N1) frames in VMEM straight from the signal and
runs stage 1 as broadcast-scalar VPU FMAs (131 kFLOP/frame — trivial next
to stage 2), keeping every intermediate in VMEM.  XLA-level reformulations
were tried and lost: swapping decimation order needs a stride-16 transpose
of every frame; a dense merged stage-1+window matrix is 64x the FLOPs.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from mfcc_rust_tpu import features, librosa_config
from mfcc_rust_tpu.constants import constant_bundle
from mfcc_rust_tpu.ops.fft import (
    _ct_stages,
    ct_power_project,
    good_factorization,
    permute_weights_for_ct,
)


def slope(fn, make_xs, k1=2, k2=6):
    def timed(k):
        xs = make_xs(k)
        f = jax.jit(
            lambda xs: lax.scan(lambda c, x: (c + fn(x), None), jnp.float32(0), xs)[0]
        )
        float(f(xs))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(xs))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k2) - timed(k1)) / (k2 - k1)


def main():
    rng = np.random.default_rng(0)
    lcfg = librosa_config(22050)
    B, T = 32, 220500
    n = lcfg.fft_points
    hop = lcfg.frame_step
    n1, n2 = good_factorization(n)
    count = 1 + (T + 2 * (n // 2) - n) // hop
    audio_s = B * 10.0

    bundle = constant_bundle(lcfg)
    fbp = jnp.asarray(permute_weights_for_ct(bundle["fbank"], n, (n1, n2)).T, jnp.float32)
    win = jnp.asarray(bundle["window"].reshape(n2, n1), jnp.float32)

    def mk_sig(k):
        return jnp.asarray(rng.normal(0, 0.1, (k, B, T)).astype(np.float32))

    def mk_frames(k):
        return jnp.asarray(
            rng.normal(0, 0.1, (k, B, count, n2, n1)).astype(np.float32)
        )

    def report(name, v):
        print(f"{name:12s} {v*1e3:8.3f} ms  {audio_s/v/1e3:8.1f}k audio-s/s", flush=True)

    report("full", slope(lambda x: features.mel_spectrogram_librosa(x, lcfg).sum(), mk_sig))
    hi = lcfg.replace(precision="high")
    report("high", slope(lambda x: features.mel_spectrogram_librosa(x, hi).sum(), mk_sig))

    def noconcat(fr):
        return ct_power_project(fr * win, n, n1, n2, fbp, "highest").sum()

    report("noconcat", slope(noconcat, mk_frames))

    def gemms(fr):
        return ct_power_project(fr, n, n1, n2, fbp, "highest").sum()

    report("gemms", slope(gemms, mk_frames))

    k1max = fbp.shape[0] // n2

    def stage2_proj(fr):
        # skip stage 1/twiddle: fr doubles as z; one merged stage-2 GEMM + proj
        from mfcc_rust_tpu.ops.fft import _ct_stage_matrices

        _, st2 = _ct_stage_matrices(n, n1, n2, k1max)
        z = fr.reshape(fr.shape[:-2] + (n2 // 2, 2 * n1))
        out = jnp.matmul(z, jnp.asarray(st2, fr.dtype), precision="highest")
        power = out[..., :k1max] * out[..., :k1max]
        flat = power.reshape(power.shape[:-2] + (-1,))
        proj = fbp[: flat.shape[-1]]
        return jnp.matmul(flat, proj, precision="highest").sum()

    report("stage2_proj", slope(stage2_proj, mk_frames))


if __name__ == "__main__":
    main()
