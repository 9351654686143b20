"""Export layer: serialize/deserialize round-trip and StableHLO lowering."""

import jax.numpy as jnp
import numpy as np

import mfcc_rust_tpu as m
from mfcc_rust_tpu import features as F
from mfcc_rust_tpu.export import (
    export_pipeline,
    flops_estimate,
    load_pipeline,
    stablehlo_text,
)

CFG = m.speechpy_config(16000)


def test_export_roundtrip(tmp_path, rng):
    p = tmp_path / "mfcc.jaxexport"
    export_pipeline(CFG, "mfcc", (2, 8000), path=str(p))
    fn = load_pipeline(str(p))
    sig = jnp.asarray(rng.normal(0, 0.1, (2, 8000)).astype(np.float32))
    out = np.asarray(fn(sig))
    ref = np.asarray(F.mfcc(sig, CFG))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_stablehlo_contains_constants():
    txt = stablehlo_text(CFG, "mfcc", (1, 8000))
    # the pipeline must be pure GEMMs over baked constants: no fft op,
    # dot_generals present
    assert "dot_general" in txt
    assert "fft" not in txt


def test_flops_estimate():
    fl = flops_estimate(CFG, "mfcc", (1, 16000))
    if fl is not None:  # cost analysis availability is backend-dependent
        assert fl > 1e7  # ~34.5 MFLOP expected for 1 s (98 frames x ~350 kFLOP)
