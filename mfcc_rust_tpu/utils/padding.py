"""Array-utility parity shims (reference: speechsauce/src/util.rs).

The reference hand-rolls numpy semantics that JAX already provides; these
thin wrappers exist so every util.rs entry point has a named, tested
equivalent (SURVEY C15-C18):

* ``pad``         — util.rs:75-125 (Constant / Symmetric / Edge 2-D np.pad)
* ``repeat_axis`` — util.rs:20-25 (np.tile along an axis)
* ``pad_center``  — util.rs:40-63 (librosa-style center pad)
* ``array_log``   — util.rs:372-381 (the ArrayLog trait's elementwise ln)

Unlike util.rs these are n-D, jit-safe, and support "reflect" too.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

PAD_MODES = ("constant", "symmetric", "edge", "reflect")


def pad(
    x: jnp.ndarray,
    pad_width: Sequence[Tuple[int, int]],
    mode: str = "constant",
    constant_value: float = 0.0,
) -> jnp.ndarray:
    """np.pad equivalent of util.rs's PadType::{Constant,Symmetric,Edge}."""
    if mode not in PAD_MODES:
        raise ValueError(f"unknown pad mode {mode!r}; expected one of {PAD_MODES}")
    if mode == "constant":
        return jnp.pad(x, list(pad_width), constant_values=constant_value)
    return jnp.pad(x, list(pad_width), mode=mode)


def repeat_axis(x: jnp.ndarray, axis: int, n: int) -> jnp.ndarray:
    """Tile ``x`` n times along ``axis`` (util.rs:20-25)."""
    reps = [1] * x.ndim
    reps[axis] = n
    return jnp.tile(x, reps)


def pad_center(w: jnp.ndarray, size: int) -> jnp.ndarray:
    """Center-pad a 1-D array to ``size`` (util.rs:40-63; the reference left
    its test as todo!())."""
    n = w.shape[-1]
    if size < n:
        raise ValueError(f"target size {size} < input size {n}")
    lpad = (size - n) // 2
    return jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(lpad, size - n - lpad)])


def array_log(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise natural log (the ArrayLog trait, util.rs:372-381)."""
    return jnp.log(x)
