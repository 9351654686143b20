"""Export a pipeline for inference embedding — the tract-deployment analogue.

The reference's deployment story is "compile the Rust crate next to tract";
here any jitted pipeline serializes to a portable StableHLO artifact that an
inference process loads without this package.

Run: python examples/export_inference.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import tempfile

import numpy as np

import mfcc_rust_tpu as ss
from mfcc_rust_tpu import FeatureConfig
from mfcc_rust_tpu.export import export_pipeline, load_pipeline, stablehlo_text

cfg = FeatureConfig(sample_rate=16000)
artifact = tempfile.mktemp(suffix=".jaxexport")

export_pipeline(cfg, "mfcc", signal_shape=(1, 16000), path=artifact)
print("exported:", artifact)

# "inference side": load and call without touching the feature library
fn = load_pipeline(artifact)
signal = np.random.default_rng(0).normal(0, 0.1, (1, 16000)).astype(np.float32)
feats = np.asarray(fn(signal))
print("inference output:", feats.shape)

ref = ss.mfcc(signal[0], 16000, bucket=False)
# atol 1e-4: the facade runs the (T,) lowering, the export the (1, T) one —
# at the precision="high" (bf16x3) default their MXU accumulation orders
# differ by ~3e-5; the export matches the same-shape library call to ~1e-7
print("matches library:", np.allclose(feats[0], ref, atol=1e-4))

hlo = stablehlo_text(cfg, "mfcc", (1, 16000))
print("stablehlo ops: dot_general" if "dot_general" in hlo else "?",
      "| fft-free:", "fft" not in hlo)
