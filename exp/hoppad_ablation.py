"""Per-stage on-chip ablation of the hoppad-wall librosa lowering
(VERDICT r4 #2: the 512/160/80 @16 kHz production config reports
sol_fraction = expected_fraction = 0.571 with no stage decomposition —
43% of light unexplained).

The lowering (features.mel_spectrogram_librosa, hoppad branch):
  center-pad -> materialize the fused big operand (r=4 shifted hop-chunk
  slices, K = r*hop = 640) -> ONE DFT GEMM (640 x 2*kmax) -> y*y ->
  mel projection GEMM (2*kmax x n_mels) -> output transpose (swapaxes).

Cumulative variants (each .sum()-terminated; the sum epilogue's read pass
largely cancels in the deltas but is measured separately as a floor):

  pad      : center pad only
  mat      : + big-operand materialization (concat of r shifted slices)
  gemm     : + the K=r*hop DFT GEMM
  mel      : + y*y and the mel projection (no transpose)
  full     : + the output swapaxes (= the shipped pipeline)

CAVEAT on 'mat': it is a DIFFERENT program, not an in-pipeline stage —
in the 'gemm'/'mel'/'full' programs XLA fuses the concat INTO the dot
(proved by exp/hoppad_barrier_ab: forcing materialization is slower), so
the model stage is (gemm - pad), the fused dot including its framing.
Deltas feed the calibrated stage model in utils/profiling.py (same
pattern as the CT kernel's constants).

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/hoppad_ablation.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from mfcc_rust_tpu import features, librosa_config  # noqa: E402
from mfcc_rust_tpu.constants import constant_bundle  # noqa: E402


def run_config(cfg, b, t, tag):
    import jax.numpy as jnp

    audio_s = b * t / cfg.sample_rate
    rng = np.random.default_rng(0)

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
    print(f"[{tag}] kmax={kmax} r={r} K={r*hop} N={wall.shape[1]}",
          flush=True)

    def pipeline(x, upto):
        pad = [(0, 0)] * (x.ndim - 1) + [(n // 2, n // 2)]
        sig = jnp.pad(x, pad, mode=cfg.pad_mode)
        if upto == "pad":
            return sig.sum()
        count = 1 + (sig.shape[-1] - n) // hop
        need = (count + r - 1) * hop
        if need > sig.shape[-1]:
            p2 = [(0, 0)] * (sig.ndim - 1) + [(0, need - sig.shape[-1])]
            sig = jnp.pad(sig, p2)
        ch = sig[..., :need].reshape(sig.shape[:-1] + (count + r - 1, hop))
        big = jnp.concatenate(
            [ch[..., s : s + count, :] for s in range(r)], axis=-1
        )
        if upto == "mat":
            return big.sum()
        y = jnp.matmul(big, jnp.asarray(wall_pad, sig.dtype),
                       precision=cfg.precision)
        if upto == "gemm":
            return y.sum()
        mel = jnp.matmul(y * y, jnp.asarray(fb2, sig.dtype),
                         precision=cfg.precision)
        if upto == "mel":
            return mel.sum()
        return jnp.swapaxes(mel, -1, -2).sum()

    def mk(k):
        return jnp.asarray(rng.normal(0, 0.1, (k, b, t)).astype(np.float32))

    # shipped-path equivalence guard (the inlined pipeline must be the
    # production lowering): compare full outputs on one small batch
    def pipeline_out(x):
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
        y = jnp.matmul(big, jnp.asarray(wall_pad, sig.dtype),
                       precision=cfg.precision)
        mel = jnp.matmul(y * y, jnp.asarray(fb2, sig.dtype),
                         precision=cfg.precision)
        return jnp.swapaxes(mel, -1, -2)

    sig2 = jnp.asarray(rng.normal(0, 0.1, (2, 48000)).astype(np.float32))
    ship = np.asarray(
        features.mel_spectrogram_librosa(sig2, cfg.replace(pallas="off"))
    )
    mine = np.asarray(pipeline_out(sig2))
    err = float(np.max(np.abs(mine - ship) / (np.abs(ship) + 1e-8)))
    print(f"inline-vs-shipped max rel err: {err:.2e}", flush=True)
    assert err < 1e-5, "inlined ablation pipeline diverged from shipped"

    results = {}
    for stage in ("pad", "mat", "gemm", "mel", "full"):
        v, s = bench._slope_timer(
            lambda x, st=stage: pipeline(x, st), mk, audio_s
        )
        results[stage] = 1.0 / v  # seconds per audio-second
        print(f"{stage:5s}: {v:9.0f} audio-s/s = {1e6/v:8.3f} us/audio-s  "
              f"spread {s:.3f}", flush=True)

    # the shipped entry itself (sanity: should match 'full')
    v, s = bench._slope_timer(
        lambda x: features.mel_spectrogram_librosa(
            x, cfg.replace(pallas="off")).sum(),
        mk, audio_s,
    )
    print(f"shipped mel_spectrogram_librosa: {v:9.0f} audio-s/s  "
          f"spread {s:.3f}", flush=True)

    print("\nstage deltas (us/audio-s):", flush=True)
    order = ["pad", "mat", "gemm", "mel", "full"]
    prev = 0.0
    for st in order:
        d = (results[st] - prev) * 1e6
        print(f"  {st:5s}: +{d:8.3f}", flush=True)
        prev = results[st]
    fps = cfg.sample_rate / hop
    up = lambda x: -(-x // 128) * 128
    pad_rate = results["pad"] / cfg.sample_rate
    gq = 2.0 * up(r * hop) * up(wall.shape[1]) * fps
    dot_s = results["gemm"] - results["pad"]  # fused dot incl. framing
    dot_rate = gq / dot_s
    tail_s = results["mel"] - results["gemm"]
    tail_rate = tail_s / ((wall.shape[1] + cfg.num_filters) * fps)
    print(f"[{tag}] per-unit: pad {pad_rate:.3e} s/sample | fused-dot "
          f"{dot_rate/1e12:.1f} q-TFLOP/s | tail {tail_rate:.3e} s/elem",
          flush=True)
    return {"pad": pad_rate, "dot": dot_rate, "tail": tail_rate}


def main():
    cal = run_config(
        librosa_config(16000, n_fft=512, hop_length=160, n_mels=80),
        64, 160000, "512/160/80 cal")
    alt = run_config(
        librosa_config(16000, n_fft=768, hop_length=160, n_mels=80),
        64, 160000, "768/160/80 alt")
    print("\ntransfer ratios (alt/cal):", flush=True)
    for k in ("pad", "dot", "tail"):
        print(f"  {k}: {alt[k]/cal[k]:.3f}", flush=True)


if __name__ == "__main__":
    main()
