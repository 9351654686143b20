"""Generate frozen .npy fixtures from the golden oracles (SURVEY §7 step 2).

The oracles in this package are executable specs; these fixtures freeze
their outputs on fixed inputs so that an accidental edit to an oracle (or a
numpy behavior change) is caught as a fixture mismatch rather than silently
shifting the compatibility contract.

Run: python -m tests.golden.gen_fixtures   (from the repo root)

``--external``: if the REAL upstream packages (librosa, speechpy) are
importable — they are NOT in this image, which has no network egress — run
them on the same fixture inputs and report the max abs/rel difference vs
the in-repo float64 oracles.  This is the one-command externality check for
an environment that does have the upstream packages (docs/PARITY.md,
"Oracle externality").
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from . import dfn_ref, librosa_ref, speechpy_ref

FIXTURE_DIR = Path(__file__).parent / "fixtures"


def fixture_inputs():
    rng = np.random.default_rng(20260817)
    sig16 = rng.normal(0, 0.1, 16000)
    t = np.arange(22050) / 22050.0
    clip22 = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1320 * t)
        + 0.05 * rng.normal(size=t.shape)
    )
    feat = rng.normal(1.0, 2.0, (120, 13))
    return sig16, clip22, feat


import functools


@functools.lru_cache(maxsize=1)
def compute_all():
    sig16, clip22, feat = fixture_inputs()
    return {
        "speechpy_mfcc": speechpy_ref.mfcc(sig16, 16000),
        "speechpy_mfe": speechpy_ref.mfe(sig16, 16000)[0],
        "speechpy_ssc": speechpy_ref.ssc(sig16, 16000),
        "speechpy_cmvnw": speechpy_ref.cmvnw(feat, 31, True),
        "speechpy_delta": speechpy_ref.derivative_extraction(feat, 2),
        "dfn_melspec": dfn_ref.mel_spectrogram1(sig16, 16000),
        "dfn_stft_power": np.abs(dfn_ref.stft1(sig16[:8000], 512, None, 16000, 0.01)) ** 2,
        "librosa_mel": librosa_ref.melspectrogram(clip22, 22050, 2048, 512),
        "librosa_mfcc": librosa_ref.mfcc(clip22, 22050),
    }


def main() -> None:
    FIXTURE_DIR.mkdir(exist_ok=True)
    for name, arr in compute_all().items():
        np.save(FIXTURE_DIR / f"{name}.npy", arr)
        print(f"wrote {name}: {arr.shape}")


def external_check() -> int:
    """Diff the in-repo oracles against REAL librosa/speechpy (if
    importable).  Returns the number of comparisons that ran."""
    sig16, clip22, feat = fixture_inputs()
    ours = compute_all()
    ran = 0

    def report(name, ext):
        nonlocal ran
        ext = np.asarray(ext, np.float64)
        mine = np.asarray(ours[name], np.float64)
        if ext.shape != mine.shape:
            print(f"{name}: SHAPE MISMATCH ext{ext.shape} vs ours{mine.shape}")
        else:
            d = np.abs(ext - mine)
            rel = d / (np.abs(ext) + 1e-12)
            print(f"{name}: max abs {d.max():.3e}  max rel {rel.max():.3e}")
        ran += 1

    try:
        import librosa

        report("librosa_mel", librosa.feature.melspectrogram(
            y=clip22, sr=22050, n_fft=2048, hop_length=512, n_mels=128))
        report("librosa_mfcc", librosa.feature.mfcc(y=clip22, sr=22050))
    except ImportError:
        print("librosa not importable here (expected in this image): "
              "skipping librosa external check")
    try:
        import speechpy

        report("speechpy_mfcc", speechpy.feature.mfcc(sig16, 16000))
        report("speechpy_mfe", speechpy.feature.mfe(sig16, 16000)[0])
        report("speechpy_cmvnw",
               speechpy.processing.cmvnw(feat, 31, True))
    except ImportError:
        print("speechpy not importable here (expected in this image): "
              "skipping speechpy external check")
    return ran


if __name__ == "__main__":
    import sys

    if "--external" in sys.argv:
        external_check()
    else:
        main()
