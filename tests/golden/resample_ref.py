"""Independent float64 oracle for polyphase resampling.

Literal textbook implementation — zero-stuff, full convolution, centered
decimation — with the same published semantics the op targets
(scipy.signal.resample_poly, window=('kaiser', 5.0)): no shared code with
mfcc_rust_tpu.ops.resample beyond the spec itself.
"""

import math

import numpy as np


def _filter(up: int, down: int, beta: float = 5.0, half_factor: int = 10):
    max_rate = max(up, down)
    half = half_factor * max_rate
    n = np.arange(-half, half + 1, dtype=np.float64)
    h = np.sinc(n / max_rate) / max_rate
    h = h * np.kaiser(2 * half + 1, beta)
    h = h / h.sum()
    return h * up, half


def resample_poly_ref(x: np.ndarray, up: int, down: int) -> np.ndarray:
    """1-D float64 reference: y[m] = (h * zero_stuff(x))[m*down + half]."""
    x = np.asarray(x, np.float64)
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == down:
        return x.copy()
    h, half = _filter(up, down)
    n = len(x)
    xz = np.zeros(n * up, np.float64)
    xz[::up] = x
    y_full = np.convolve(xz, h)  # length n*up + 2*half
    n_out = -(-n * up // down)
    idx = half + down * np.arange(n_out)
    y_full = np.pad(y_full, (0, max(0, idx[-1] + 1 - len(y_full))))
    return y_full[idx]
