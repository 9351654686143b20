"""A/B: force materialization of the fused chunk-GEMM's big operand with
jax.lax.optimization_barrier (r5).

Hypothesis from exp/hoppad_ablation_r05: the 512/160 DFT GEMM's measured
delta (1.72 us/as) is ~61% of the 3-pass MXU rate for a K=640 (5x128
tile-exact) dot, while the isolated materialization pass costs only
0.18 us/as — consistent with XLA fusing the shifted-slice concat INTO the
dot as r accumulated K=hop dots, each padding 160->256 (62% K util).
A barrier between the concat and the dot forces one materialized operand
and one clean K=r*hop dot.  Tested on BOTH fused-wall configs:

  * librosa 512/160/80 @16k (hoppad-wall lowering, r=4, K=640)
  * speechpy MFCC 20ms/10ms @16k headline (chunk-gemm-fused, r=2, K=320)

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/hoppad_barrier_ab.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from mfcc_rust_tpu import FeatureConfig, features, librosa_config  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    # --- librosa hoppad 512/160/80: shipped vs barrier, inline pipeline ---
    from mfcc_rust_tpu.constants import chunk_gemm_wall, constant_bundle

    cfg = librosa_config(16000, n_fft=512, hop_length=160, n_mels=80)
    b, t = 64, 160000
    audio_s = b * 10.0
    n, hop = cfg.fft_points, cfg.frame_step
    bundle = constant_bundle(cfg)
    kmax = bundle["fbank_kmax"]
    c64, s64 = bundle["dft_windowed"]
    wall = np.concatenate([c64[:, :kmax], s64[:, :kmax]], axis=1)
    fl = wall.shape[0]
    r = -(-fl // hop)
    wall_pad = np.zeros((r * hop, wall.shape[1]), dtype=np.float32)
    wall_pad[:fl] = wall
    fb2 = features._stacked_fb(bundle["fbank"], kmax, 2 * kmax)

    def pipeline(x, barrier):
        pad = [(0, 0)] * (x.ndim - 1) + [(n // 2, n // 2)]
        sig = jnp.pad(x, pad, mode=cfg.pad_mode)
        count = 1 + (sig.shape[-1] - n) // hop
        need = (count + r - 1) * hop
        if need > sig.shape[-1]:
            p2 = [(0, 0)] * (sig.ndim - 1) + [(0, need - sig.shape[-1])]
            sig = jnp.pad(sig, p2)
        ch = sig[..., :need].reshape(sig.shape[:-1] + (count + r - 1, hop))
        big = jnp.concatenate(
            [ch[..., s : s + count, :] for s in range(r)], axis=-1
        )
        if barrier:
            big = jax.lax.optimization_barrier(big)
        y = jnp.matmul(big, jnp.asarray(wall_pad, sig.dtype),
                       precision=cfg.precision)
        mel = jnp.matmul(y * y, jnp.asarray(fb2, sig.dtype),
                         precision=cfg.precision)
        return jnp.swapaxes(mel, -1, -2).sum()

    def mk(k):
        return jnp.asarray(rng.normal(0, 0.1, (k, b, t)).astype(np.float32))

    for barrier in (False, True, False, True):
        v, s = bench._slope_timer(
            lambda x, bb=barrier: pipeline(x, bb), mk, audio_s)
        print(f"librosa 512/160 barrier={barrier}: {v:9.0f} audio-s/s  "
              f"spread {s:.3f}", flush=True)

    # --- speechpy headline (fused K=320): shipped vs barrier via the
    # _chunk_gemm barrier knob (monkeypatched here; shipped if it wins) ---
    cfg_h = FeatureConfig(sample_rate=16000)
    bh, th = 48, 160000
    audio_h = bh * 10.0

    real_chunk_gemm = features._chunk_gemm

    def chunk_gemm_barrier(signal, wall2, n_frames, hop2, precision,
                           fuse=None):
        r2 = np.asarray(wall2).shape[0] // hop2
        wj = jnp.asarray(wall2, signal.dtype)
        need = (n_frames + r2 - 1) * hop2
        if need > signal.shape[-1]:
            p = [(0, 0)] * (signal.ndim - 1) + [(0, need - signal.shape[-1])]
            signal = jnp.pad(signal, p)
        ch = signal[..., :need].reshape(
            signal.shape[:-1] + (n_frames + r2 - 1, hop2))
        if fuse is None:
            fuse = r2 > 1 and hop2 % 128 != 0
        if fuse and r2 > 1:
            big = jnp.concatenate(
                [ch[..., s : s + n_frames, :] for s in range(r2)], axis=-1)
            big = jax.lax.optimization_barrier(big)
            return ch, jnp.matmul(big, wj, precision=precision)
        y = None
        for s in range(r2):
            part = jnp.matmul(ch[..., s : s + n_frames, :],
                              wj[s * hop2 : (s + 1) * hop2],
                              precision=precision)
            y = part if y is None else y + part
        return ch, y

    def mk_h(k):
        return jnp.asarray(
            rng.normal(0, 0.1, (k, bh, th)).astype(np.float32))

    for tag, fn in (("shipped", real_chunk_gemm),
                    ("barrier", chunk_gemm_barrier),
                    ("shipped", real_chunk_gemm),
                    ("barrier", chunk_gemm_barrier)):
        features._chunk_gemm = fn
        try:
            v, s = bench._slope_timer(
                lambda x: features.mfcc(x, cfg_h).sum(), mk_h, audio_h)
        finally:
            features._chunk_gemm = real_chunk_gemm
        print(f"headline MFCC {tag}: {v:9.0f} audio-s/s  spread {s:.3f}",
              flush=True)

    # numerics guard: barrier must be bitwise-neutral
    x = jnp.asarray(rng.normal(0, 0.1, (2, 48000)).astype(np.float32))
    a = np.asarray(pipeline_out_check(x, cfg, wall_pad, fb2, n, hop, r,
                                      False))
    bnp = np.asarray(pipeline_out_check(x, cfg, wall_pad, fb2, n, hop, r,
                                        True))
    print("barrier bitwise-equal:", bool((a == bnp).all()), flush=True)


def pipeline_out_check(x, cfg, wall_pad, fb2, n, hop, r, barrier):
    import jax
    import jax.numpy as jnp

    pad = [(0, 0)] * (x.ndim - 1) + [(n // 2, n // 2)]
    sig = jnp.pad(x, pad, mode=cfg.pad_mode)
    count = 1 + (sig.shape[-1] - n) // hop
    need = (count + r - 1) * hop
    if need > sig.shape[-1]:
        p2 = [(0, 0)] * (sig.ndim - 1) + [(0, need - sig.shape[-1])]
        sig = jnp.pad(sig, p2)
    ch = sig[..., :need].reshape(sig.shape[:-1] + (count + r - 1, hop))
    big = jnp.concatenate(
        [ch[..., s : s + count, :] for s in range(r)], axis=-1
    )
    if barrier:
        big = jax.lax.optimization_barrier(big)
    y = jnp.matmul(big, jnp.asarray(wall_pad, sig.dtype),
                   precision=cfg.precision)
    mel = jnp.matmul(y * y, jnp.asarray(fb2, sig.dtype),
                     precision=cfg.precision)
    return jnp.swapaxes(mel, -1, -2)


if __name__ == "__main__":
    main()
