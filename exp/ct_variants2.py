"""Second round of CT librosa-path variants (after fold-tw landed).

  v1_128x16 — shipped ct_power_project, factors (128, 16)
  v64x32    — factors (64, 32): stage-2 FLOPs halve (2·N·N1), stage-1 depth
              doubles (K=32) but lane width drops to 64
  vsq       — factors (128, 16), square the WHOLE (r, 2·k1max) stage-2 output
              and project with the filterbank stacked over the cos and sin
              halves (no k1max lane slice; projection K doubles)
  e2e       — full mel_spectrogram_librosa as shipped (for the README number)
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
    _ct_foldtw_matrices,
    _ct_stage_matrices,
    ct_power_project,
    permute_weights_for_ct,
)

lcfg = librosa_config(22050)
N = lcfg.fft_points
HOP = lcfg.frame_step
bundle = constant_bundle(lcfg)
FB = bundle["fbank"]
WIN = bundle["window"]


def slope(fn, make_xs, k1=2, k2=8):
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


def make_proj(n1, n2):
    return permute_weights_for_ct(FB, N, (n1, n2)).T


def vsq(frames, fbp_np, n1, n2, precision="highest"):
    """Square the whole merged X and project with [fb_cos; fb_sin]."""
    k1max = fbp_np.shape[0] // n2
    dt = frames.dtype
    st1_np, _ = _ct_stage_matrices(N, n1, n2, k1max)
    a_np, b_np = _ct_foldtw_matrices(N, n1, n2, k1max)
    y = jnp.matmul(jnp.asarray(st1_np, dt), frames, precision=precision)
    ir, ii = y[..., :n2, :], y[..., n2:, :]
    x = jnp.einsum("...rn,rnk->...rk", ir, jnp.asarray(a_np, dt),
                   precision=precision) + jnp.einsum(
        "...rn,rnk->...rk", ii, jnp.asarray(b_np, dt), precision=precision)
    # stacked projection over both the Xr and Xi halves: the (r, 2*k1max)
    # plane flattens to rows [r*2*k1max + {cos: 0..k1max, sin: k1max..}]
    m = fbp_np.shape[1]
    w = np.zeros((n2, 2 * k1max, m))
    fb3 = fbp_np.reshape(n2, k1max, m)
    w[:, :k1max] = fb3
    w[:, k1max:] = fb3
    flat = (x * x).reshape(x.shape[:-2] + (-1,))
    return jnp.matmul(flat, jnp.asarray(w.reshape(-1, m), dt),
                      precision=precision)


def main():
    rng = np.random.default_rng(0)
    B, T = 32, 220500
    count = 1 + (T + 2 * (N // 2) - N) // HOP
    audio_s = B * 10.0

    fbp128 = make_proj(128, 16)
    fbp64 = make_proj(64, 32)

    # correctness: all variants equal on the same frames (f32)
    f1 = rng.normal(0, 0.1, (3, 5, 2048)).astype(np.float32)
    w1 = (f1 * WIN).astype(np.float32)
    r128 = ct_power_project(jnp.asarray(w1.reshape(3, 5, 16, 128)), N, 128, 16,
                            jnp.asarray(fbp128, jnp.float32))
    r64 = ct_power_project(jnp.asarray(w1.reshape(3, 5, 32, 64)), N, 64, 32,
                           jnp.asarray(fbp64, jnp.float32))
    rsq = vsq(jnp.asarray(w1.reshape(3, 5, 16, 128)), fbp128, 128, 16)
    for name, got in [("v64x32", r64), ("vsq", rsq)]:
        err = float(jnp.max(jnp.abs(got - r128) / (jnp.abs(r128) + 1e-30)))
        print(f"{name} relerr: {err:.2e}", flush=True)
        assert err < 2e-5, name

    def mk(n2, n1):
        def go(k):
            return jnp.asarray(
                rng.normal(0, 0.1, (k, B, count, n2, n1)).astype(np.float32)
            )
        return go

    def report(name, v):
        print(f"{name:10s} {v*1e3:8.3f} ms  {audio_s/v/1e3:8.1f}k audio-s/s",
              flush=True)

    report("v1_128x16", slope(
        lambda fr: ct_power_project(fr, N, 128, 16,
                                    jnp.asarray(fbp128, jnp.float32)).sum(),
        mk(16, 128)))
    report("v64x32", slope(
        lambda fr: ct_power_project(fr, N, 64, 32,
                                    jnp.asarray(fbp64, jnp.float32)).sum(),
        mk(32, 64)))
    report("vsq", slope(lambda fr: vsq(fr, fbp128, 128, 16).sum(), mk(16, 128)))

    def mk_sig(k):
        return jnp.asarray(rng.normal(0, 0.1, (k, B, T)).astype(np.float32))

    report("e2e", slope(
        lambda x: features.mel_spectrogram_librosa(x, lcfg).sum(), mk_sig))


if __name__ == "__main__":
    main()
