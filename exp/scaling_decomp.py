"""Decompose the virtual-mesh @8dev/@1dev = 0.85 ratio (VERDICT r4 weak #4:
two rounds of an unexplained sub-unity number on a line whose pass bar is
1.0).

The offending line compares thr(B=16 @ 1dev) vs thr(B=128 @ 8dev) — i.e.
DIFFERENT total work — on 8 virtual CPU devices that timeshare one host's
cores.  Candidate explanations, each isolated here:

  (a) batch-size effect: thr(B) on ONE device across B = 16/32/64/128 —
      if per-audio-second throughput falls with B (cache footprint), the
      cross-B comparison is biased regardless of sharding.
  (b) sharding overhead at EQUAL work: thr(B=128 @ 1dev) vs
      thr(B=128 @ 8dev) — the honest wiring-cost measurement.
  (c) psum cost: (b)'s 8dev case with psum_moments patched to identity
      (local moments, no collective).
  (d) device-count trend at fixed per-device work: B=16/dev at n_dev =
      1/2/4/8 — shared-core contention decays smoothly with n_dev;
      a wiring step appears at 1->2 and stays flat.

Run (CPU, no tunnel): python exp/scaling_decomp.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    import mfcc_rust_tpu.parallel.data as data
    from mfcc_rust_tpu import FeatureConfig
    from mfcc_rust_tpu.parallel import extraction_step, make_mesh

    cfg = FeatureConfig(sample_rate=16000)
    rng = np.random.default_rng(0)
    t = 160000

    def run(devices, b, n_seq=1, reps=6):
        n = len(devices)
        mesh = make_mesh(n_data=n // n_seq, n_seq=n_seq, devices=devices)
        sig = rng.normal(0, 0.1, (b, t)).astype(np.float32)
        lens = np.full(b, t, np.int64)
        out = extraction_step(sig, lens, cfg, mesh, "mfcc")
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = extraction_step(sig, lens, cfg, mesh, "mfcc")
            float(out[2].count)
            best = min(best, time.perf_counter() - t0)
        return b * (t / cfg.sample_rate) / best

    devs = jax.devices()
    n_dev = len(devs)
    print(f"{n_dev} virtual CPU devices", flush=True)

    print("\n(a) batch-size effect on ONE device:", flush=True)
    one = {}
    for b in (16, 32, 64, 128):
        one[b] = run(devs[:1], b)
        print(f"  B={b:4d} @1dev: {one[b]:9.1f} audio-s/s", flush=True)

    print("\n(b) equal work, sharded vs not:", flush=True)
    all128 = run(devs, 128)
    print(f"  B=128 @8dev: {all128:9.1f} audio-s/s "
          f"-> equal-work ratio {all128/one[128]:.4f}", flush=True)
    print(f"  (old line's cross-B ratio: {all128/one[16]:.4f})", flush=True)

    print("\n(c) psum cost (B=128 @8dev, psum patched out):", flush=True)
    real_psum = data.psum_moments
    try:
        data.psum_moments = lambda m, axes: m
        nopsum = run(devs, 128)
    finally:
        data.psum_moments = real_psum
    print(f"  no-psum: {nopsum:9.1f} audio-s/s "
          f"-> psum overhead {max(0.0, 1 - all128/nopsum):.2%}", flush=True)

    print("\n(d) fixed per-device work (16 rows/dev) across device counts:",
          flush=True)
    prev = None
    for nd in (1, 2, 4, 8):
        if n_dev % nd:
            continue
        v = run(devs[:nd], 16 * nd)
        note = "" if prev is None else f"  (x{v/prev:.2f} vs previous)"
        print(f"  {nd}dev B={16*nd:4d}: {v:9.1f} audio-s/s{note}", flush=True)
        prev = v


if __name__ == "__main__":
    main()
