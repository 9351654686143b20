"""On-chip timing: (1) librosa mel at precision highest vs high (both should
ride the same Pallas CT kernel at the same speed), (2) mfcc_librosa stage
breakdown — mel kernel alone, +power_to_db, +DCT — to find the 297k-vs-380k
gap's location."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from mfcc_rust_tpu import features, librosa_config

b2, t2 = 32, 160000
rng = np.random.default_rng(0)
K = 8


def slope(fn, make):
    """two-point slope: wall(K reps) - wall(1 rep) over (K-1) reps, best of 4
    (the host scalar read is the completion barrier through the tunnel)."""
    x1, xk = make(1), make(K)
    f1 = jax.jit(lambda x: fn(x[0]))
    fk = jax.jit(lambda x: jax.lax.scan(lambda c, xi: (c + fn(xi), 0.0), 0.0, x)[0])
    float(f1(x1)); float(fk(xk))  # compile

    def best(f, x):
        b = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(x))
            b = min(b, time.perf_counter() - t0)
        return b

    dt = (best(fk, xk) - best(f1, x1)) / (K - 1)
    return b2 * (t2 / 16000.0) / dt


def make(k):
    return jnp.asarray(rng.normal(0, 0.1, (k, b2, t2)).astype(np.float32))


cfg_hst = librosa_config(16000)
cfg_high = cfg_hst.replace(precision="high")

for name, cfg in (("highest", cfg_hst), ("high", cfg_high)):
    v = slope(lambda x, c=cfg: features.mel_spectrogram_librosa(x, c).sum(), make)
    print(f"librosa mel precision={name:8s}: {v/1e3:8.1f}k audio-s/s", flush=True)

from mfcc_rust_tpu.features import dct2_ortho, power_to_db

cfg20 = cfg_hst.replace(num_cepstral=20)
stages = {
    "mel only": lambda x: features.mel_spectrogram_librosa(x, cfg20).sum(),
    "mel+swap": lambda x: jnp.swapaxes(
        features.mel_spectrogram_librosa(x, cfg20), -1, -2).sum(),
    "mel+swap+db": lambda x: power_to_db(jnp.swapaxes(
        features.mel_spectrogram_librosa(x, cfg20), -1, -2)).sum(),
    "full mfcc_librosa": lambda x: features.mfcc_librosa(x, cfg20).sum(),
}
for name, fn in stages.items():
    v = slope(fn, make)
    print(f"{name:20s}: {v/1e3:8.1f}k audio-s/s", flush=True)
