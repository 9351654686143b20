"""Subprocess worker for the true two-process multi-host test
(tests/test_multihost.py): initialize jax.distributed against a localhost
coordinator, run a CorpusRunner over this process's corpus slice on a
HOST-LOCAL mesh, and write a per-host checkpoint for the parent to merge.

Run as:  python -m tests.multihost_worker <coord> <pid> <nprocs> <dir>
"""

import json
import sys


def main(coordinator: str, process_id: int, num_processes: int,
         work_dir: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from mfcc_rust_tpu import FeatureConfig
    from mfcc_rust_tpu.parallel import make_mesh
    from mfcc_rust_tpu.parallel.mesh import initialize_multihost
    from mfcc_rust_tpu.parallel.runner import CorpusRunner

    pidx, pcount = initialize_multihost(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert pidx == process_id and pcount == num_processes, (pidx, pcount)
    n_local = jax.local_device_count()
    n_global = len(jax.devices())
    assert n_global == n_local * num_processes, (n_global, n_local)

    paths = json.load(open(f"{work_dir}/paths.json"))
    cfg = FeatureConfig(sample_rate=16000)
    mesh = make_mesh(devices=jax.local_devices())  # host-local (see runner)
    runner = CorpusRunner(
        paths, cfg, mesh, batch_size=2,
        out_dir=f"{work_dir}/out",  # shared dir: writes are idempotent
        checkpoint_path=f"{work_dir}/host{process_id}.npz",
        process_index=pidx, process_count=pcount,
    )
    moments = runner.run()
    print(json.dumps({"process": pidx, "count": float(moments.count),
                      "local_devices": n_local}))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
