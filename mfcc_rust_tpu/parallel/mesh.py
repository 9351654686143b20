"""Device mesh construction.

The reference has zero parallelism (SURVEY §2: no threads, no SIMD, no
distributed backend; its ``RefCell`` state is explicitly single-threaded).
The TPU-native equivalent is a 2-D logical mesh:

* ``data``  — data parallelism over utterances/batches (across chips and
  hosts; collectives ride ICI within a slice, DCN across hosts).
* ``seq``   — sequence (time-axis) parallelism for very long single
  utterances via halo-exchange blockwise framing
  (:mod:`mfcc_rust_tpu.parallel.halo`) — the distributed generalization of
  the reference's O(window) streaming carry (config.rs:126, functions.rs:128-159).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize JAX multi-host execution (call once, before any device
    use) and return (process_index, process_count).  On managed TPU pods the
    arguments are auto-detected; pass them explicitly elsewhere.  After this,
    :func:`make_mesh` spans every chip in the slice and the psum'd corpus
    moments in :mod:`mfcc_rust_tpu.parallel.data` reduce across hosts."""
    import jax

    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def make_mesh(
    n_data: Optional[int] = None,
    n_seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, seq) mesh.  Defaults to all devices on the data axis."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_data is None:
        n_data = len(devices) // n_seq
    if n_data * n_seq != len(devices):
        devices = devices[: n_data * n_seq]
    arr = np.asarray(devices).reshape(n_data, n_seq)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over data, everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def data_seq_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, time) sharded over (data, seq)."""
    return NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
