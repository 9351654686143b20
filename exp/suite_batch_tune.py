"""Batch-size tuning for the suite's non-headline lines (r4 follow-up to
the headline sweep): vorbis melspec, full-suite extract(), strict-mode
MFCC, librosa CT mel — is their configured batch on the B~16-48 plateau?
Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/suite_batch_tune.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import bench
import mfcc_rust_tpu as m
from mfcc_rust_tpu import features as F


def main():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    vcfg = m.vorbis_config(16000)
    scfg = m.speechpy_config(16000)
    hcfg = scfg.replace(precision="highest")
    lcfg = m.librosa_config(22050)

    cases = [
        ("vorbis melspec", lambda x: F.mel_spectrogram(x, vcfg).sum(),
         160000, (16, 32, 48, 64)),
        ("full-suite extract", lambda x: sum(
            (v[0].sum() + v[1].sum()) if isinstance(v, tuple) else v.sum()
            for v in F.extract(x, scfg,
                               which=("mfcc", "lmfe", "mfe", "ssc")).values()
         ), 160000, (16, 32, 48, 64)),
        ("MFCC highest strict", lambda x: F.mfcc(x, hcfg).sum(),
         160000, (16, 32, 48, 64)),
        ("librosa mel pallas", lambda x: F.mel_spectrogram_librosa(
            x, lcfg).sum(), 220500, (8, 16, 32, 64)),
    ]
    for name, fn, t, bs in cases:
        for b in bs:
            a_s = b * t / (22050.0 if "librosa" in name else 16000.0)
            mk = lambda k, b=b, t=t: jnp.asarray(
                rng.normal(0, 0.1, (k, b, t)).astype(np.float32))
            v, s = bench._slope_timer(fn, mk, a_s)
            print(f"{name:22s} B={b:3d}: {v:9.0f} audio-s/s  spread {s:.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
