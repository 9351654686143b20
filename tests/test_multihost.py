"""True multi-process multi-host test: two OS processes, each its own JAX
runtime, joined through ``jax.distributed`` via a localhost coordinator
(SURVEY §4's "multi-host tests on a single host" mandate, upgraded from the
in-process simulation of test_runner.py — VERDICT r2 missing #3).

Each process runs :class:`CorpusRunner` over its slice of the corpus on a
host-local mesh; the parent merges the per-host checkpoints deterministically
and compares against a single-process reference run."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

import mfcc_rust_tpu as m
from mfcc_rust_tpu.parallel import make_mesh
from mfcc_rust_tpu.parallel.runner import CorpusRunner, merge_checkpoints
from mfcc_rust_tpu.runtime import write_wav

CFG = m.speechpy_config(16000)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_corpus(tmp_path, rng):
    paths = []
    for i in range(8):
        clip = rng.normal(0, 0.1, 8000 + 777 * i).astype(np.float32)
        clip = clip.clip(-1, 1)
        p = tmp_path / f"utt{i:02d}.wav"
        write_wav(str(p), clip, 16000)
        paths.append(str(p))
    (tmp_path / "out").mkdir()
    json.dump(paths, open(tmp_path / "paths.json", "w"))

    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # 2 virtual CPU devices per process -> 4 global devices
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        )
        + " --xla_force_host_platform_device_count=2"
    )
    env["JAX_PLATFORMS"] = "cpu"
    repo = str(Path(__file__).resolve().parent.parent)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests.multihost_worker", coord, str(i),
             "2", str(tmp_path)],
            cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
            outs.append(json.loads(out.strip().splitlines()[-1]))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    assert {o["process"] for o in outs} == {0, 1}
    assert all(o["local_devices"] == 2 for o in outs)

    # every utterance written exactly once across the two hosts
    written = sorted(f.name for f in (tmp_path / "out").glob("*.npy"))
    assert written == [f"utt{i:02d}.npy" for i in range(8)]

    # deterministic cross-host merge == single-process reference
    merged = merge_checkpoints(
        [str(tmp_path / "host0.npz"), str(tmp_path / "host1.npz")],
        CFG.num_cepstral,
    )
    single = CorpusRunner(paths, CFG, make_mesh(n_data=2, n_seq=1,
                                                devices=None),
                          batch_size=2).run()
    assert int(merged.count) == int(single.count)
    np.testing.assert_allclose(np.asarray(merged.mean),
                               np.asarray(single.mean), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(merged.m2),
                               np.asarray(single.m2), rtol=1e-4, atol=1e-4)
