"""On-TPU A/B + throughput for the fused CT mel Pallas kernel.

Numerics: max rel err of the kernel vs the XLA CT path (pallas="off").
Throughput: slope-timed XLA path vs the kernel at several frame-tile sizes
and grid-semantics variants.  NOTE features.mel_spectrogram_librosa
dispatches to the kernel on TPU by default — always benchmark the XLA side
with pallas="off".
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from mfcc_rust_tpu import features, librosa_config
from mfcc_rust_tpu.ops.pallas.ct_mel import ct_mel_pallas


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
    xcfg = lcfg.replace(pallas="off")
    B, T = 32, 220500
    audio_s = B * 10.0

    # ---- numerics A/B on the chip ------------------------------------------
    sig = rng.normal(0, 0.1, (2, 66150)).astype(np.float32)
    ref = np.asarray(features.mel_spectrogram_librosa(jnp.asarray(sig), xcfg))
    out = np.swapaxes(
        np.asarray(ct_mel_pallas(jnp.asarray(sig), lcfg, tile_f=128)), -1, -2
    )
    err = (np.abs(out - ref) / (np.abs(ref) + 1e-8)).max()
    print(f"A/B tile_f=128: max rel err vs XLA CT = {err:.3e}", flush=True)

    def mk_sig(k):
        return jnp.asarray(rng.normal(0, 0.1, (k, B, T)).astype(np.float32))

    def report(name, v):
        print(f"{name:26s} {v*1e3:8.3f} ms  {audio_s/v/1e3:8.1f}k audio-s/s",
              flush=True)

    report("xla (pallas=off)", slope(
        lambda x: features.mel_spectrogram_librosa(x, xcfg).sum(), mk_sig))
    for tf in (96, 128, 192):
        report(f"pallas tile_f={tf}", slope(
            lambda x, tf=tf: ct_mel_pallas(x, lcfg, tile_f=tf).sum(), mk_sig))
    report("pallas tf=128 seq-batch", slope(
        lambda x: ct_mel_pallas(x, lcfg, tile_f=128,
                                parallel_batch=False).sum(), mk_sig))


if __name__ == "__main__":
    main()
