"""A/B: the DFT framing stage as a strided convolution (r5).

``frames @ wall`` (frame_len window, hop stride) is exactly
``lax.conv_general_dilated(signal, wall_as_filters, stride=hop)`` — no
materialized operand, and XLA's conv emitter chooses its own im2col/MXU
strategy.  The shipped concat-fused chunk-GEMM runs at ~53% of the 3-pass
MXU rate on the 512/160 config (exp/hoppad_ablation_r05), so a different
emitter could win.  Measured y-stage-only and full-pipeline A/B at:

  * speechpy headline wall (K=320, N=260, hop 160)
  * librosa 512/160 hoppad wall (K=640, N=512, hop 160)

Numerics gate: conv output must match the chunk-GEMM y bitwise-ish
(same dot algebra, different association — allow ~1e-5 rel).

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/conv_frontend_ab.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from mfcc_rust_tpu import FeatureConfig, features, librosa_config  # noqa: E402
from mfcc_rust_tpu.constants import chunk_gemm_wall, constant_bundle  # noqa: E402


def conv_y(signal, wall_pad, fl, hop, n_frames, precision):
    """(B, T) x (r*hop, W) wall -> (B, n_frames, W) via strided conv.
    The wall's rows beyond fl are zero, so only fl true taps matter; we
    pass the first fl rows as the filter (width fl, stride hop)."""
    import jax.numpy as jnp
    from jax import lax

    w = wall_pad[:fl]  # (fl, W)
    # NWC input, WIO filters: (B, T, 1) conv (fl, 1, W) -> (B, F, W)
    x = signal[..., None]
    filt = jnp.asarray(w, signal.dtype)[:, None, :]
    out = lax.conv_general_dilated(
        x, filt, window_strides=(hop,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=precision,
    )
    return out[:, :n_frames, :]


def ab(tag, wall, fl, hop, b, t, cfg_precision):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    audio_s = b * t / 16000.0
    r = -(-fl // hop)
    wall_pad = np.zeros((r * hop, wall.shape[1]), dtype=np.float32)
    wall_pad[:fl] = wall
    n_frames = (t - fl) // hop + 1

    # numerics gate
    sig = jnp.asarray(rng.normal(0, 0.1, (2, 16000)).astype(np.float32))
    nf = (16000 - fl) // hop + 1
    _, y_ref = features._chunk_gemm(sig, wall_pad, nf, hop, cfg_precision)
    y_conv = conv_y(sig, wall_pad, fl, hop, nf, cfg_precision)
    a, b_ = np.asarray(y_conv), np.asarray(y_ref)
    err = float(np.max(np.abs(a - b_)) / np.max(np.abs(b_)))
    print(f"[{tag}] conv-vs-chunkgemm max norm err: {err:.2e}", flush=True)

    def mk(k):
        return jnp.asarray(rng.normal(0, 0.1, (k, b, t)).astype(np.float32))

    v, s = bench._slope_timer(
        lambda x: features._chunk_gemm(x, wall_pad, n_frames, hop,
                                       cfg_precision)[1].sum(),
        mk, audio_s)
    print(f"[{tag}] chunk-gemm y: {v:9.0f} audio-s/s  spread {s:.3f}",
          flush=True)
    v, s = bench._slope_timer(
        lambda x: conv_y(x, wall_pad, fl, hop, n_frames,
                         cfg_precision).sum(),
        mk, audio_s)
    print(f"[{tag}] conv y:      {v:9.0f} audio-s/s  spread {s:.3f}",
          flush=True)


def main():
    cfg = FeatureConfig(sample_rate=16000)
    wd = chunk_gemm_wall(cfg, True)
    ab("speechpy 320/160", np.asarray(wd["wall"])[: cfg.frame_size],
       cfg.frame_size, cfg.frame_step, 48, 160000, cfg.precision)

    pcfg = librosa_config(16000, n_fft=512, hop_length=160, n_mels=80)
    bundle = constant_bundle(pcfg)
    kmax = bundle["fbank_kmax"]
    c64, s64 = bundle["dft_windowed"]
    wall = np.concatenate([c64[:, :kmax], s64[:, :kmax]], axis=1)
    ab("librosa 512/160", wall, 512, 160, 64, 160000, pcfg.precision)


if __name__ == "__main__":
    main()
