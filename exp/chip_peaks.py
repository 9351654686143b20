"""Empirical chip peaks: device kind, big-GEMM TFLOP/s per precision tier,
and HBM copy bandwidth.  Pins the roofline model's constants to THIS chip
(utils/profiling.CHIP_SPECS — VERDICT r2 missing #2).

Timing: a serial carry-chain of K dependent steps inside ONE device call
(per-step work >> the ~25 ms tunnel dispatch latency only in aggregate), and
the (K2 - K1) slope cancels the fixed overhead.  5 independent slopes,
median + spread."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

print("devices:", jax.devices(), flush=True)
print("device_kind:", jax.devices()[0].device_kind, flush=True)

rng = np.random.default_rng(0)
# NOTE: 4096-sized chains wedged the remote compile helper indefinitely
# (two 30-min runs with zero output, no CPU progress); 2048 with longer
# chains compiles normally and gives >= 100 ms of device work per call.
K1, K2 = 40, 200


def slope(build, work_per_step, n_slopes=5, unit=1e12):
    """build(k) -> zero-arg callable returning a host float.  Operands must
    be jit ARGUMENTS, not closures — closed-over device arrays embed as
    64 MB HLO constants and stall the remote compile helper."""
    f1 = build(K1)
    f2 = build(K2)
    float(f1()); float(f2())  # compile + warm
    vals = []
    for _ in range(n_slopes):
        t0 = time.perf_counter(); float(f1()); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f2()); tb = time.perf_counter() - t0
        vals.append(work_per_step * (K2 - K1) / (tb - ta) / unit)
    vals.sort()
    return vals[len(vals) // 2], (vals[-1] - vals[0]) / vals[len(vals) // 2]


def gemm_chain(n, dtype, precision):
    a0 = jnp.asarray(rng.normal(0, 1, (n, n)) / np.sqrt(n), dtype)
    b = jnp.asarray(rng.normal(0, 1, (n, n)) / np.sqrt(n), dtype)

    def build(k):
        f = jax.jit(
            lambda a0, b: lax.scan(
                lambda c, _: (jnp.matmul(c, b, precision=precision), None),
                a0, None, length=k,
            )[0][0, 0].astype(jnp.float32)
        )
        return lambda: f(a0, b)

    return build


N = 2048
for name, dt, prec in (
    ("bf16 x bf16", jnp.bfloat16, "default"),
    ("f32 default (1-pass bf16)", jnp.float32, "default"),
    ("f32 high (3-pass)", jnp.float32, "high"),
    ("f32 highest (6-pass)", jnp.float32, "highest"),
):
    med, spr = slope(gemm_chain(N, dt, prec), 2.0 * N**3)
    print(f"peak GEMM {name:28s}: {med:8.1f} TFLOP/s  (spread {spr:.1%})",
          flush=True)

# HBM bandwidth: big-array carry update, read + write = 1 GB per step
n = 128 * 1024 * 1024
x0 = jnp.asarray(rng.normal(0, 1, n).astype(np.float32))


def bw_build(k):
    f = jax.jit(lambda x0: lax.scan(
        lambda c, _: (c * 0.999 + 0.001, None), x0, None, length=k)[0][0])
    return lambda: f(x0)


med, spr = slope(bw_build, 2.0 * n * 4, unit=1e9)
print(f"HBM stream (read+write) bandwidth: {med:8.1f} GB/s  (spread {spr:.1%})",
      flush=True)
