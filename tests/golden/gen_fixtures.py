"""Generate frozen .npy fixtures from the golden oracles (SURVEY §7 step 2).

The oracles in this package are executable specs; these fixtures freeze
their outputs on fixed inputs so that an accidental edit to an oracle (or a
numpy behavior change) is caught as a fixture mismatch rather than silently
shifting the compatibility contract.

Run: python -m tests.golden.gen_fixtures   (from the repo root)
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


if __name__ == "__main__":
    main()
