"""Lean TPU shootout of librosa-CT variants — device-side data generation.

The earlier harnesses (ct_variants2, ct_packed) generated frame tensors on
the host: ~900 MB per timed call through the axon tunnel, which times out.
Here the scanned inputs are built ON DEVICE (jax.random) inside the jitted
setup, so only scalars cross the tunnel.

Variants:
  shipped  — ct_power_project (128, 16), as in ops/fft.py
  packed   — real-packing: M=1024 complex CT + Hermitian untangle (exp/ct_packed)
  e2e      — full mel_spectrogram_librosa (signal in, mel out)
  e2e_hi   — same at precision="high" (3-pass MXU)
  e2e_def  — same at precision="default" (bf16 MXU)
Accuracy of the precision modes vs the f64 oracle is reported first.

RESULTS (TPU v5e, 2026-08-18; note the device-side RNG runs inside the
timed scan, so kernel-variant lines carry ~4x the RNG overhead of e2e
lines — compare within a shape, not across):

    acc highest  max-rel 4.84e-07 med-rel 5.40e-08
    acc high     max-rel 9.22e-05 med-rel 2.87e-05
    acc default  max-rel 2.37e-02 med-rel 1.53e-03
    shipped       1.927 ms     166.1k audio-s/s
    packed        4.213 ms      76.0k audio-s/s
    e2e           3.003 ms     106.6k audio-s/s
    e2e_hi        2.508 ms     127.6k audio-s/s
    e2e_def       1.177 ms     271.9k audio-s/s

Takeaways: (1) real-packing loses ~2x (see exp/ct_packed.py); (2) the MXU
pass count is the remaining lever — precision="high" buys ~20% e2e at
~1e-4 max-rel accuracy, bf16 ~2.5x at ~2e-2; (3) framing overhead is ~11%
of e2e, so kernel-side work is done.
"""

import sys
import time
import dataclasses

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax import lax

from mfcc_rust_tpu import features, librosa_config
from mfcc_rust_tpu.constants import constant_bundle
from mfcc_rust_tpu.ops.fft import ct_power_project, permute_weights_for_ct
from exp.ct_packed import packed_power_mel, M

lcfg = librosa_config(22050)
N = lcfg.fft_points
bundle = constant_bundle(lcfg)
FB = bundle["fbank"]
WIN = bundle["window"]

B, T = 32, 220500
COUNT = 1 + (T + 2 * (N // 2) - N) // lcfg.frame_step
AUDIO_S = B * 10.0


def slope(make_body, shape, k1=1, k2=3):
    """make_body(x)->scalar over device-generated x of `shape`; scan over k
    device-side random batches."""

    def timed(k):
        def run(seed):
            def step(c, i):
                x = jax.random.normal(
                    jax.random.fold_in(jax.random.PRNGKey(0), seed + i),
                    shape,
                    jnp.float32,
                ) * 0.1
                return c + make_body(x), None

            return lax.scan(step, jnp.float32(0), jnp.arange(k))[0]

        f = jax.jit(run)
        float(f(jnp.int32(0)))
        best = float("inf")
        for t in range(4):
            t0 = time.perf_counter()
            float(f(jnp.int32(t)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k2) - timed(k1)) / (k2 - k1)


def report(name, per_call):
    print(f"{name:10s} {per_call*1e3:8.3f} ms  "
          f"{AUDIO_S/per_call/1e3:8.1f}k audio-s/s", flush=True)


def main():
    # --- accuracy of precision modes on-device (small clip) ---------------
    rng = np.random.default_rng(0)
    y32 = rng.normal(0, 0.1, 22050 * 2).astype(np.float32)
    import tests.golden.librosa_ref as LR

    ref = LR.melspectrogram(y32.astype(np.float64), sr=22050)
    for prec in ("highest", "high", "default"):
        cfg = dataclasses.replace(lcfg, precision=prec)
        got = np.asarray(jax.jit(
            lambda x: features.mel_spectrogram_librosa(x, cfg)
        )(jnp.asarray(y32)))
        rel = np.abs(got - ref) / (np.abs(ref) + 1e-12)
        print(f"acc {prec:8s} max-rel {rel.max():.2e} "
              f"med-rel {np.median(rel):.2e}", flush=True)

    # --- kernel shootout on pre-framed input ------------------------------
    fbp = jnp.asarray(permute_weights_for_ct(FB, N, (128, 16)).T, jnp.float32)
    report("shipped", slope(
        lambda x: ct_power_project(x, N, 128, 16, fbp).sum(),
        (B, COUNT, 16, 128),
    ))
    fbt = jnp.asarray(FB[:, :M].T, jnp.float32)
    report("packed", slope(
        lambda x: packed_power_mel(x.reshape(B, COUNT, N), fbt).sum(),
        (B, COUNT, 16, 128),
    ))

    # --- end-to-end -------------------------------------------------------
    report("e2e", slope(
        lambda x: features.mel_spectrogram_librosa(x, lcfg).sum(), (B, T)))
    cfg_hi = dataclasses.replace(lcfg, precision="high")
    report("e2e_hi", slope(
        lambda x: features.mel_spectrogram_librosa(x, cfg_hi).sum(), (B, T)))
    cfg_def = dataclasses.replace(lcfg, precision="default")
    report("e2e_def", slope(
        lambda x: features.mel_spectrogram_librosa(x, cfg_def).sum(), (B, T)))


if __name__ == "__main__":
    main()
