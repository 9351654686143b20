"""Recalibrate the achievable-rate ('expected') models whose measured
throughput EXCEEDS them (VERDICT r4 weak #1: vorbis melspec 1.0846,
strict-mode MFCC 1.0932 — a best-estimate that measurement beats by 8-13%
is miscalibrated; the librosa-strict 1.1292 line is a separate bug: the
Pallas kernel hard-codes Mosaic HIGHEST so its rate never changes with
cfg.precision, fixed in utils/profiling.py directly).

Measurements (slope harness, same-process):
  * dot-only effective rates at the EXACT dispatched GEMM shapes of the two
    offending lowerings, at precision=high (3-pass) and highest (6-pass):
    the model charges peak/passes divided by ceil-to-128 tile efficiency;
    the measured rate replaces that product where it disagrees.
  * stage splits: y-only (DFT GEMM) vs full pipeline for both lowerings,
    giving a measured serial tail that bounds the non-GEMM stages.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/expected_calib.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from mfcc_rust_tpu import FeatureConfig, features, vorbis_config  # noqa: E402
from mfcc_rust_tpu.constants import chunk_gemm_wall, vorbis_chunk_wall  # noqa: E402


def dot_rate(mk_operand, w_np, precision, audio_equiv, label):
    """Effective q-TFLOP/s of matmul(operand, W) at the given precision."""
    import jax.numpy as jnp

    w = jnp.asarray(w_np, jnp.float32)

    v, s = bench._slope_timer(
        lambda x: jnp.matmul(x, w, precision=precision).sum(),
        mk_operand, audio_equiv,
    )
    # v is 'audio-equiv units per second'; time per unit = 1/v
    print(f"  {label}: {v:10.1f} unit/s  spread {s:.3f}", flush=True)
    return v, s


def main():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    up128 = lambda x: -(-x // 128) * 128

    # ---- strict-mode speechpy MFCC (chunk-gemm-fused lowering) ----
    cfg_s = FeatureConfig(sample_rate=16000, precision="highest")
    wd = chunk_gemm_wall(cfg_s, True)
    hop = cfg_s.frame_step
    K = wd["r"] * hop  # fused K (320 for 20ms/10ms)
    W = np.asarray(wd["wall"], np.float32)
    N = W.shape[1]
    b, f = 48, 1000
    flops_q = 2.0 * up128(K) * up128(N) * f  # per batch row-block
    print(f"strict chunk-gemm dot: K={K} N={N} (pad {up128(K)}x{up128(N)})",
          flush=True)

    def mk_big(k):
        return jnp.asarray(
            rng.normal(0, 0.1, (k, b, f, K)).astype(np.float32))

    for prec in ("highest", "high"):
        v, s = dot_rate(mk_big, W, prec, 1.0, f"dot {prec} (per-dispatch)")
        eff = v * b * flops_q / 1e12
        print(f"    -> effective {eff:.1f} q-TFLOP/s at {prec}", flush=True)

    # stage split: y-only vs full strict MFCC (B=48, 10 s, as in the suite)
    t = 160000
    audio_s = b * 10.0

    def mk_sig(k):
        return jnp.asarray(
            rng.normal(0, 0.1, (k, b, t)).astype(np.float32))

    v, s = bench._slope_timer(
        lambda x: features._chunk_gemm(
            x, wd["wall"], t // hop, hop, "highest")[1].sum(),
        mk_sig, audio_s,
    )
    print(f"strict y-only:  {v:9.0f} audio-s/s  spread {s:.3f}", flush=True)
    y_s = 1.0 / v
    v, s = bench._slope_timer(
        lambda x: features.mfcc(x, cfg_s).sum(), mk_sig, audio_s,
    )
    print(f"strict full:    {v:9.0f} audio-s/s  spread {s:.3f}", flush=True)
    print(f"strict measured tail (full - y): {(1/v - y_s)*1e6:.3f} us/as",
          flush=True)

    # ---- vorbis mel_spectrogram (vorbis-chunk-gemm lowering) ----
    vcfg = vorbis_config(16000)
    vw = vorbis_chunk_wall(vcfg)
    vhop = vw["hop"]
    VW = np.asarray(vw["wall"], np.float32)
    NV = VW.shape[1]
    print(f"\nvorbis dot: r={vw['r']} K={vhop} N={NV} "
          f"(pad {up128(vhop)}x{up128(NV)})", flush=True)
    fv = 1000  # frames per 10 s row at stream hop
    fv = (160000 // vhop)

    def mk_vch(k):
        return jnp.asarray(
            rng.normal(0, 0.1, (k, 48, fv, vhop)).astype(np.float32))

    v, s = dot_rate(mk_vch, VW[:vhop], vcfg.precision,
                    1.0, f"dot {vcfg.precision} (one shifted block)")
    eff = v * 48 * 2.0 * up128(vhop) * up128(NV) * fv / 1e12
    print(f"    -> effective {eff:.1f} q-TFLOP/s", flush=True)

    tv = 160000 - (160000 % vhop)
    audio_v = 48 * tv / 16000.0

    def mk_vsig(k):
        return jnp.asarray(
            rng.normal(0, 0.1, (k, 48, tv)).astype(np.float32))

    v, s = bench._slope_timer(
        lambda x: features._chunk_gemm(
            x, vw["wall"], tv // vhop, vhop, vcfg.precision)[1].sum(),
        mk_vsig, audio_v,
    )
    print(f"vorbis y-only:  {v:9.0f} audio-s/s  spread {s:.3f}", flush=True)
    y_s = 1.0 / v
    v, s = bench._slope_timer(
        lambda x: features.mel_spectrogram(x, vcfg).sum(), mk_vsig, audio_v,
    )
    print(f"vorbis full:    {v:9.0f} audio-s/s  spread {s:.3f}", flush=True)
    print(f"vorbis measured tail (full - y): {(1/v - y_s)*1e6:.3f} us/as",
          flush=True)

    # ---- pure padding-penalty probe: exact-tile vs padded N ----
    print("\npadding penalty (K=320->384, N=514->640 vs exact 384/640):",
          flush=True)
    for (kk, nn) in ((320, 514), (384, 640)):
        Wp = np.asarray(rng.normal(0, 0.1, (kk, nn)), np.float32)

        def mk_p(k, kk=kk):
            return jnp.asarray(
                rng.normal(0, 0.1, (k, 48, 1000, kk)).astype(np.float32))

        for prec in ("high", "highest"):
            v, s = dot_rate(mk_p, Wp, prec, 1.0, f"({kk}x{nn}) {prec}")
            eff_q = v * 48 * 2.0 * up128(kk) * up128(nn) * 1000 / 1e12
            eff_raw = v * 48 * 2.0 * kk * nn * 1000 / 1e12
            print(f"    -> {eff_q:.1f} q-TFLOP/s ({eff_raw:.1f} raw)",
                  flush=True)


if __name__ == "__main__":
    main()
