"""Headline benchmark: MFCC-13 extraction throughput at 16 kHz.

Prints ONE JSON line: audio-seconds processed per wall-clock second per chip
for the flagship batched MFCC pipeline (speechpy defaults: 25→20 ms frames /
10 ms hop, 40 mels, fft 512 — BASELINE.json config 1 scaled to a batch).

The reference publishes no numbers (SURVEY §6), so ``vs_baseline`` is
reported against the north-star target of 50,000 audio-seconds/s/chip
(BASELINE.json).
"""

import json
import time

import numpy as np

TARGET = 50_000.0  # north-star audio-seconds/s/chip (BASELINE.json)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mfcc_rust_tpu import FeatureConfig, features

    cfg = FeatureConfig(sample_rate=16000)
    batch, seconds, k_batches = 64, 10, 16
    t = seconds * cfg.sample_rate
    rng = np.random.default_rng(0)
    # K distinct batches scanned in ONE device call: amortizes host/tunnel
    # dispatch latency and (being distinct data) defeats any CSE/caching, so
    # the measurement is true device throughput.  A scalar is pulled to host
    # per call to force completion (block_until_ready alone is not a reliable
    # completion barrier through the remote-execution tunnel).
    xs = jnp.asarray(rng.normal(0, 0.1, (k_batches, batch, t)).astype(np.float32))

    def body(c, x):
        return c + features.mfcc(x, cfg).sum(), None

    fn = jax.jit(lambda xs: lax.scan(body, jnp.float32(0), xs)[0])
    float(fn(xs))  # compile + warm

    best = 0.0
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(xs))  # host scalar read == hard completion barrier
        dt = time.perf_counter() - t0
        best = max(best, k_batches * batch * seconds / dt)
    value = best
    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_sec_per_chip (MFCC-13, 16kHz)",
                "value": round(value, 1),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
