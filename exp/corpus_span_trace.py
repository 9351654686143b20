"""Per-call wall-clock span trace of the corpus runner (VERDICT r4 #1).

The r4 wire model charged 0.508 s of SERIAL per-call fixed cost (13 puts +
4 fetches x ~30 ms) and matched actual dispatch+fetch to 5% — yet grouping
13 puts into 4 (put_group) measured NEUTRAL.  Both cannot be right.  This
experiment records start/end wall-clock timestamps of EVERY device_put,
jit dispatch, and fetch during a bench-identical corpus run (f32 and f16
wires), then probes the link's concurrency law directly:

  * does device_put block for the transfer, or return immediately?
  * do two concurrent D2H fetches go faster than serial (per-direction
    parallelism)?
  * does an H2D put running concurrently with a D2H fetch slow either
    down (shared-link serialization)?

Artifacts: exp/corpus_spans_r05.json (raw spans) and the printed analysis
(span unions, overlap depth, per-call effective bandwidth, probe results).
Run on the real chip: PYTHONPATH=/root/repo:/root/.axon_site python
exp/corpus_span_trace.py
"""

import json
import os
import shutil
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

SPANS = []  # (name, t0, t1, bytes, thread)
T_BASE = [0.0]
RECORDING = [False]


def _rec(name, t0, t1, nbytes):
    if RECORDING[0]:
        SPANS.append((name, t0 - T_BASE[0], t1 - T_BASE[0], nbytes,
                      threading.current_thread().name))


def _np_bytes(x):
    """Bytes of host arrays in a pytree (device arrays ship nothing new)."""
    total = 0
    for leaf in jax.tree.leaves(x):
        if isinstance(leaf, np.ndarray):
            total += leaf.nbytes
    return total


def _dev_bytes(tree):
    total = 0
    for leaf in jax.tree.leaves(tree):
        n = 1
        for s in leaf.shape:
            n *= s
        total += n * leaf.dtype.itemsize
    return total


def install_patches():
    from mfcc_rust_tpu.parallel import data

    real_put = jax.device_put
    real_fetch = data.fetch_outputs
    real_impl = data._extraction_step_packed_out_impl

    def put(x, *a, **kw):
        t0 = time.perf_counter()
        out = real_put(x, *a, **kw)
        _rec("put", t0, time.perf_counter(), _np_bytes(x))
        return out

    def fetch(tree):
        t0 = time.perf_counter()
        out = real_fetch(tree)
        _rec("fetch", t0, time.perf_counter(), _dev_bytes(tree))
        return out

    def impl(*a, **kw):
        t0 = time.perf_counter()
        out = real_impl(*a, **kw)
        _rec("jit_enqueue", t0, time.perf_counter(), 0)
        return out

    jax.device_put = put
    data.fetch_outputs = fetch
    data._extraction_step_packed_out_impl = impl


def union_seconds(spans):
    ivs = sorted((t0, t1) for _, t0, t1, _, _ in spans)
    total, cur0, cur1 = 0.0, None, None
    for a, b in ivs:
        if cur1 is None or a > cur1:
            if cur1 is not None:
                total += cur1 - cur0
            cur0, cur1 = a, b
        else:
            cur1 = max(cur1, b)
    if cur1 is not None:
        total += cur1 - cur0
    return total


def max_depth(spans):
    ev = []
    for _, t0, t1, _, _ in spans:
        ev.append((t0, 1))
        ev.append((t1, -1))
    ev.sort()
    d = best = 0
    for _, s in ev:
        d += s
        best = max(best, d)
    return best


def analyze(label, wall, meter):
    by = {}
    for s in SPANS:
        by.setdefault(s[0], []).append(s)
    print(f"\n=== {label}: wall {wall:.3f}s ===")
    print("scopes:", {k: round(v, 3) for k, v in meter.scopes.items()})
    print("counters:", {k: round(v) for k, v in meter.counters.items()})
    out = {}
    for name, spans in sorted(by.items()):
        tot = sum(t1 - t0 for _, t0, t1, _, _ in spans)
        uni = union_seconds(spans)
        byt = sum(b for *_, b, _ in spans)
        out[name] = {"n": len(spans), "total_s": round(tot, 3),
                     "union_s": round(uni, 3), "mb": round(byt / 1e6, 2),
                     "mb_per_union_s": round(byt / 1e6 / uni, 1) if uni else 0,
                     "max_concurrency": max_depth(spans)}
        print(f"{name:12s} n={len(spans):3d} total={tot:7.3f}s "
              f"union={uni:7.3f}s bytes={byt/1e6:8.2f}MB "
              f"eff_bw={byt/1e6/uni if uni else 0:7.1f}MB/s "
              f"depth={max_depth(spans)}")
    allsp = [s for s in SPANS if s[0] in ("put", "fetch")]
    link_union = union_seconds(allsp)
    print(f"link busy (put|fetch union): {link_union:.3f}s "
          f"= {link_union/wall:.1%} of wall")
    out["link_union_s"] = round(link_union, 3)
    out["wall_s"] = round(wall, 3)
    # the longest individual calls
    for name in ("put", "fetch"):
        spans = sorted(by.get(name, []), key=lambda s: s[2] - s[1],
                       reverse=True)[:6]
        for _, t0, t1, b, th in spans:
            print(f"  top {name}: t0={t0:7.3f} dur={t1-t0:6.3f}s "
                  f"{b/1e6:7.2f}MB -> {b/1e6/max(t1-t0,1e-9):6.1f}MB/s [{th}]")
    return out


def run_corpus(paths, total_audio, cfg, mesh, tmp, tag, wire_dtype=None):
    from mfcc_rust_tpu.parallel.runner import CorpusRunner

    out_dir = f"{tmp}/{tag}"
    r = CorpusRunner(paths, cfg, mesh, batch_size=128, out_dir=out_dir,
                     n_io_threads=8, wire_dtype=wire_dtype, fetch_every=4)
    SPANS.clear()
    T_BASE[0] = time.perf_counter()
    RECORDING[0] = True
    t0 = time.perf_counter()
    r.run()
    wall = time.perf_counter() - t0
    RECORDING[0] = False
    shutil.rmtree(out_dir)
    return wall, r.meter, list(SPANS)


def link_probes():
    """Direct measurement of the tunnel's concurrency law."""
    print("\n=== link-law probes ===")
    res = {}

    def h2d_complete(nbytes):
        buf = np.zeros(nbytes // 2, dtype=np.int16)
        t0 = time.perf_counter()
        dev = jax.device_put(buf)
        float(jnp.sum(dev[:1].astype(jnp.float32)))
        return time.perf_counter() - t0, dev

    def h2d_return(nbytes):
        buf = np.zeros(nbytes // 2, dtype=np.int16)
        t0 = time.perf_counter()
        dev = jax.device_put(buf)
        return time.perf_counter() - t0, dev

    def fresh_dev(nbytes, i):
        dev = jax.device_put(np.full(nbytes // 4, float(i), np.float32))
        float(jnp.sum(dev[:1]))
        return dev

    def d2h(dev):
        t0 = time.perf_counter()
        np.asarray(dev)
        return time.perf_counter() - t0

    # warm the paths
    h2d_complete(1 << 20)
    d2h(fresh_dev(1 << 20, 0))

    for mb in (2, 24):
        ts = [h2d_complete(mb << 20)[0] for _ in range(3)]
        res[f"h2d_complete_{mb}mb"] = min(ts)
        ts = [h2d_return(mb << 20)[0] for _ in range(3)]
        res[f"h2d_return_{mb}mb"] = min(ts)
    for mb in (1, 8):
        ts = [d2h(fresh_dev(mb << 20, i)) for i in range(3)]
        res[f"d2h_{mb}mb"] = min(ts)

    # two concurrent 8MB D2H fetches vs two serial
    devs = [fresh_dev(8 << 20, 10 + i) for i in range(4)]
    t0 = time.perf_counter()
    d2h(devs[0]); d2h(devs[1])
    res["d2h_2x8mb_serial"] = time.perf_counter() - t0
    outs = [None, None]
    def _f(i, d):
        outs[i] = d2h(d)
    th = [threading.Thread(target=_f, args=(i, devs[2 + i])) for i in range(2)]
    t0 = time.perf_counter()
    for t in th: t.start()
    for t in th: t.join()
    res["d2h_2x8mb_concurrent"] = time.perf_counter() - t0
    res["d2h_concurrent_each"] = outs

    # H2D (24MB, completion-read) concurrent with D2H (8MB)
    dev = fresh_dev(8 << 20, 42)
    got = {}
    def _fd():
        got["d2h"] = d2h(dev)
    def _fh():
        t0 = time.perf_counter()
        h2d_complete(24 << 20)
        got["h2d"] = time.perf_counter() - t0
    ta, tb = threading.Thread(target=_fd), threading.Thread(target=_fh)
    t0 = time.perf_counter()
    ta.start(); tb.start(); ta.join(); tb.join()
    res["h2d24_d2h8_concurrent_wall"] = time.perf_counter() - t0
    res["h2d24_d2h8_each"] = dict(got)

    # does an UNREAD put's transfer steal link from a following fetch?
    dev = fresh_dev(8 << 20, 77)
    buf = np.zeros(12 << 20, dtype=np.int16)  # 24MB
    t0 = time.perf_counter()
    d_unused = jax.device_put(buf)
    t_put_ret = time.perf_counter() - t0
    t_fetch_after_put = d2h(dev)
    float(jnp.sum(d_unused[:1].astype(jnp.float32)))  # force completion
    res["put24_return"] = t_put_ret
    res["d2h8_after_unread_put24"] = t_fetch_after_put

    for k, v in res.items():
        print(f"  {k}: {v}")
    return res


def main():
    from mfcc_rust_tpu import FeatureConfig
    from mfcc_rust_tpu.parallel import make_mesh
    from mfcc_rust_tpu.runtime import write_wav

    rng = np.random.default_rng(0)
    n_files = 192
    secs = np.clip(rng.lognormal(np.log(6.0), 0.6, n_files), 1.0, 35.0)
    cfg = FeatureConfig(sample_rate=16000)
    mesh = make_mesh(n_seq=1)
    tmp = tempfile.mkdtemp(prefix="span_trace_")
    results = {}
    try:
        paths = []
        total_audio = 0.0
        for i, s in enumerate(secs):
            clip = rng.normal(0, 0.1, int(s * 16000)).astype(np.float32)
            np.clip(clip, -1.0, 1.0, out=clip)
            p = f"{tmp}/utt{i:05d}.wav"
            write_wav(p, clip, 16000)
            paths.append(p)
            total_audio += len(clip) / 16000.0
        print(f"corpus: {n_files} files, {total_audio:.1f} audio-s")

        install_patches()
        # warm (compiles) — not recorded
        run_corpus(paths, total_audio, cfg, mesh, tmp, "warm")
        run_corpus(paths, total_audio, cfg, mesh, tmp, "warm16",
                   wire_dtype="float16")

        raw = {}
        for tag, wd in (("f32", None), ("f16", "float16")):
            walls = []
            for rep in range(3):
                wall, meter, spans = run_corpus(
                    paths, total_audio, cfg, mesh, tmp, f"{tag}{rep}",
                    wire_dtype=wd)
                walls.append((wall, meter, spans))
            walls.sort(key=lambda x: x[0])
            wall, meter, spans = walls[1]  # median run
            SPANS.clear()
            SPANS.extend(spans)
            results[tag] = analyze(f"{tag} wire (median of 3; walls "
                                   f"{[round(w[0],3) for w in walls]})",
                                   wall, meter)
            results[tag]["throughput"] = round(total_audio / wall, 1)
            raw[tag] = spans
        results["probes"] = link_probes()
        art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "corpus_spans_r05.json")
        with open(art, "w") as f:
            json.dump({"results": results, "total_audio_s": total_audio,
                       "spans": raw}, f)
        print(f"\nartifact: {art}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
