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
    batch, seconds = 64, 10
    k1, k2 = 4, 16
    t = seconds * cfg.sample_rate
    rng = np.random.default_rng(0)

    # Methodology: K distinct batches scanned in ONE device call (distinct
    # data defeats CSE/caching), a host scalar read as the completion barrier
    # (block_until_ready is not reliable through the remote-execution
    # tunnel), and a two-point SLOPE over K to cancel the fixed ~25 ms
    # per-call dispatch overhead — the slope is pure device time per batch.
    def timed(k):
        xs = jnp.asarray(rng.normal(0, 0.1, (k, batch, t)).astype(np.float32))
        fn = jax.jit(
            lambda xs: lax.scan(
                lambda c, x: (c + features.mfcc(x, cfg).sum(), None),
                jnp.float32(0), xs,
            )[0]
        )
        float(fn(xs))  # compile + warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(fn(xs))  # host scalar read == hard completion barrier
            best = min(best, time.perf_counter() - t0)
        return best

    per_batch = (timed(k2) - timed(k1)) / (k2 - k1)
    value = batch * seconds / per_batch
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
