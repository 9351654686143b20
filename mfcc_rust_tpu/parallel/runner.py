"""Corpus extraction runner: streaming multi-host feature extraction with
checkpoint/resume and corpus CMVN.

The reference has no batch/corpus tooling at all (SURVEY §5: no checkpoint,
no recovery, no metrics).  This runner provides the BASELINE.json config-5
workload: iterate a corpus of WAV files through the native prefetch loader,
length-bucket into static-shape batches, extract on the device mesh, write
per-utterance outputs idempotently, accumulate corpus CMVN moments, and
checkpoint (done-mask + moments) so a killed job resumes without recompute.

Multi-host: each host runs a runner over its slice of the file list
(``paths[process_index::process_count]``); per-batch moments are already
psum'd across the mesh by ``extraction_step``; host-local running moments are
checkpointed and merged deterministically with
:func:`mfcc_rust_tpu.parallel.stats.tree_merge` (fixed association order).
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Callable, List, Optional, Sequence

import jax
import numpy as np

from ..config import FeatureConfig
from ..ops.framing import speechpy_frame_counts
from ..utils.bucketing import bucket_length
from ..utils.profiling import Meter
from .data import extraction_step
from .mesh import DATA_AXIS, SEQ_AXIS, make_mesh
from .stats import CorpusMoments, tree_merge


def _config_fingerprint(cfg: FeatureConfig, n_paths: int, dim: int) -> str:
    """Stable across processes: Python's hash() is salted per interpreter
    (PYTHONHASHSEED), which would make every cross-process resume fail."""
    import dataclasses
    import hashlib

    blob = repr(sorted(dataclasses.asdict(cfg).items())).encode()
    return f"{hashlib.sha256(blob).hexdigest()[:16]}:{n_paths}:{dim}"


class CheckpointStore:
    """npz checkpoint: done mask + running moments + config fingerprint.

    ``dim`` is an int for a single feature, or a {feature_name: dim} dict for
    a multi-feature run — then ``moments`` is a matching dict and the npz
    holds per-feature ``count_<name>`` / ``mean_<name>`` / ``m2_<name>``
    arrays (legacy total/total_sq checkpoints load with a conversion)."""

    def __init__(self, path: str, n_paths: int, cfg: FeatureConfig, dim):
        self.path = Path(path)
        self.n_paths = n_paths
        self.multi = isinstance(dim, dict)
        self.fingerprint = _config_fingerprint(
            cfg, n_paths, repr(sorted(dim.items())) if self.multi else dim
        )
        self.done = np.zeros(n_paths, dtype=bool)
        if self.multi:
            self.moments = {k: CorpusMoments.zeros(d) for k, d in dim.items()}
        else:
            self.moments = CorpusMoments.zeros(dim)
        if self.path.exists():
            self._load()

    @staticmethod
    def _read_moments(z, suffix: str = "") -> CorpusMoments:
        # plain numpy: host-side moment accumulation must not touch the
        # device (CorpusMoments ops are namespace-agnostic)
        if "mean" + suffix in getattr(z, "files", z):
            return CorpusMoments(
                np.asarray(z["count" + suffix]),
                np.asarray(z["mean" + suffix]),
                np.asarray(z["m2" + suffix]),
            )
        # legacy (sum, sum_sq, count) checkpoint: convert to Welford form
        # (loses the old form's cancellation error, nothing else)
        total = np.asarray(z["total" + suffix], np.float64)
        total_sq = np.asarray(z["total_sq" + suffix], np.float64)
        count = float(z["count" + suffix])
        mean = total / max(count, 1.0)
        m2 = np.maximum(total_sq - total * mean, 0.0)
        return CorpusMoments(
            np.float32(count),
            mean.astype(np.float32),
            m2.astype(np.float32),
        )

    def _load(self) -> None:
        z = np.load(self.path, allow_pickle=False)
        if str(z["fingerprint"]) != self.fingerprint:
            raise ValueError(
                f"checkpoint {self.path} was written for a different "
                f"config/corpus ({z['fingerprint']} != {self.fingerprint})"
            )
        self.done = z["done"]
        if self.multi:
            self.moments = {
                k: self._read_moments(z, f"_{k}") for k in self.moments
            }
        else:
            self.moments = self._read_moments(z)

    def save(self) -> None:
        tmp = self.path.with_suffix(".tmp.npz")
        arrays = {}
        items = (
            [(f"_{k}", m) for k, m in self.moments.items()]
            if self.multi
            else [("", self.moments)]
        )
        for suffix, m in items:
            arrays["count" + suffix] = np.asarray(m.count)
            arrays["mean" + suffix] = np.asarray(m.mean)
            arrays["m2" + suffix] = np.asarray(m.m2)
        np.savez(tmp, fingerprint=self.fingerprint, done=self.done, **arrays)
        os.replace(tmp, self.path)

    def mark(self, indices: Sequence[int], moments) -> None:
        self.done[list(indices)] = True
        if self.multi:
            self.moments = {
                k: self.moments[k].merge(moments[k]) for k in self.moments
            }
        else:
            self.moments = self.moments.merge(moments)


def merge_checkpoints(paths: Sequence[str], dim: int,
                      features: Optional[Sequence[str]] = None):
    """Deterministic cross-host merge of per-host checkpoint moments.
    Pass ``features`` for multi-feature checkpoints; returns a dict then."""
    if features is not None:
        return {
            name: tree_merge([
                CheckpointStore._read_moments(np.load(p, allow_pickle=False),
                                              f"_{name}")
                for p in sorted(paths)
            ])
            for name in features
        }
    parts = []
    for p in sorted(paths):
        z = np.load(p, allow_pickle=False)
        parts.append(CheckpointStore._read_moments(z))
    return tree_merge(parts)


class CorpusRunner:
    """Extract features for a corpus of WAV files on a device mesh."""

    def __init__(
        self,
        paths: Sequence[str],
        cfg: Optional[FeatureConfig] = None,
        mesh=None,
        feature: str = "mfcc",
        batch_size: int = 32,
        out_dir: Optional[str] = None,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 8,
        process_index: int = 0,
        process_count: int = 1,
        n_io_threads: int = 4,
        max_seconds: float = 240.0,
        on_batch: Optional[Callable[[dict], None]] = None,
        resample: bool = False,
        fetch_every: int = 1,
        fetch_threads: int = 4,
        write_threads: int = 2,
        packed_output: bool = True,
        wire_dtype: Optional[str] = None,
        pool_growth: Optional[float] = None,
    ):
        self.all_paths = [str(p) for p in paths]
        # host shard of the corpus
        self.indices = list(range(process_index, len(self.all_paths), process_count))
        self.max_seconds = max_seconds
        # Deterministic, collision-free output names in one explicit pass
        # over corpus-index order: the first file with a given stem keeps it;
        # later collisions take an index suffix, then trailing underscores
        # until unused.  The mapping depends only on the path list, so every
        # restart reproduces it and resume stays idempotent.
        self._out_names = {}
        used = set()
        for i, p in enumerate(self.all_paths):
            name = Path(p).stem
            if name in used:
                name = f"{name}_{i:06d}"
            while name in used:
                name += "_"
            used.add(name)
            self._out_names[i] = f"{name}.npy"
        self.cfg = cfg if cfg is not None else FeatureConfig(sample_rate=16000)
        self.mesh = mesh if mesh is not None else make_mesh(n_seq=1)
        # Multi-host model: each host runs its OWN runner over its file slice
        # with a HOST-LOCAL mesh (psum then reduces host-locally and the
        # per-host checkpoint moments tree-merge to the corpus total).  A
        # global multi-controller mesh here would psum every batch across all
        # hosts and the checkpoint merge would double-count.
        if process_count > 1:
            pidx = jax.process_index()
            if any(d.process_index != pidx for d in self.mesh.devices.flat):
                raise ValueError(
                    "CorpusRunner with process_count > 1 requires a host-local"
                    " mesh (make_mesh(devices=jax.local_devices()))"
                )
        self.multi = isinstance(feature, (tuple, list))
        self.feature = tuple(feature) if self.multi else feature
        self.batch_size = batch_size
        self.out_dir = Path(out_dir) if out_dir else None
        if self.out_dir:
            self.out_dir.mkdir(parents=True, exist_ok=True)

        def _feat_dim(name: str) -> int:
            if name == "mfcc":
                return self.cfg.num_cepstral
            if name == "energy":
                return 1
            return self.cfg.num_filters

        if self.multi:
            dim = {name: _feat_dim(name) for name in self.feature}
            # multi-feature outputs are .npz bundles, one array per feature
            self._out_names = {
                i: name[: -len(".npy")] + ".npz"
                for i, name in self._out_names.items()
            }
        else:
            dim = _feat_dim(feature)
        self.dim = dim
        self.store = (
            CheckpointStore(checkpoint_path, len(self.all_paths), self.cfg, dim)
            if checkpoint_path
            else None
        )
        self.checkpoint_every = checkpoint_every
        self.n_io_threads = n_io_threads
        self.meter = Meter()
        self.on_batch = on_batch
        # resample=True: files whose rate differs from cfg.sample_rate are
        # polyphase-resampled on device (per-batch, same-rate batches)
        # instead of raising
        self.resample = resample
        # Dispatch-ahead depth: extraction_step calls are asynchronous, so up
        # to ``fetch_every`` batches stay in flight on device and their output
        # pytrees come back in ONE packed device->host transfer.  With the
        # r2 padded-output layout a grouped fetch measured ~3x SLOWER
        # through this image's tunnel (exp/corpus_ab.py); with r3's packed
        # valid-frame outputs depth 4 is ~7% FASTER
        # (exp/corpus_fetch_tuning_r03_results.txt) but delays per-batch
        # consume/checkpoint granularity, so the default stays 1 and the
        # knob is for throughput-critical runs.  Results are consumed in
        # dispatch order either way, so moment merges stay bitwise
        # deterministic (test_runner_fetch_depth_invariance).
        self.fetch_every = max(1, int(fetch_every))
        # Overlapped fetches: device->host transfers for different batches
        # pipeline through the link (measured 2.6-3.5x on this image's
        # tunnel with 1-2 concurrent fetches, exp/tunnel_overlap.py; 4
        # threads buy a further ~8% with packed outputs,
        # exp/corpus_fetch_tuning_r03_results.txt), so fetch groups run in
        # a small thread pool while the main thread keeps decoding and
        # dispatching.  Results are still CONSUMED (moments merged, outputs
        # written, checkpoint marked) strictly in dispatch order on the
        # main thread — a bounded deque of futures — so determinism and
        # failure semantics are unchanged.  0 = fetch synchronously on the
        # main thread.
        self.fetch_threads = max(0, int(fetch_threads))
        # Per-utterance .npy/.npz writes run in a small writer pool so file
        # I/O overlaps decode/dispatch/fetch instead of billing the main
        # thread (part of the corpus host overhead).  Writes are flushed
        # before every checkpoint save, so "done" is never durable before
        # its outputs are.  0 = write synchronously.
        self.write_threads = max(0, int(write_threads))
        # Packed OUTPUT transfers: the device packs only the valid frames of
        # every feature head into dense (n_pk, ...) buffers before the fetch
        # (parallel.data._pack_frame_tree), so the device->host wire skips
        # batch padding (~25% on the bucket grid) and the mask plane; the
        # host reconstructs per-utterance slices from frame_counts_host
        # (exact integer mirror of the device mask).  Measured on this
        # image's tunnel the D2H link is ~5x slower than H2D, making output
        # bytes a first-order corpus cost.
        self.packed_output = bool(packed_output)
        # Opt-in 16-bit feature WIRE ("float16"/"bfloat16"): quantizes the
        # packed output leaves on device before the fetch, halving D2H bytes
        # (the ~5x-slower direction).  Lossy: outputs carry f16's 2^-11
        # relative quantization (parallel.data._cast_wire) and are written
        # in the wire dtype.  Moments/CMVN stay f32.
        self.wire_dtype = wire_dtype
        if wire_dtype is not None and not self.packed_output:
            raise ValueError("wire_dtype requires packed_output=True")
        # pool_growth=None (default): batches pool per (rate, length
        # bucket) on the fine default grid — a 1 s clip never pads to a
        # 35 s neighbor.  A float (e.g. 2.5) pools on a COARSER geometric
        # band grid; each batch still dispatches at the fine bucket of its
        # own longest clip.  The r4 rationale for coarse banding (a fixed
        # round trip per dispatch) was corrected by the r5 span trace:
        # device_put is asynchronous, so dispatches pay NO serial fixed
        # cost — only FETCH groups do, and fetch_every already amortizes
        # those.  The knob remains for links where puts genuinely block.
        # A SINGLE mixed-length pool was measured slower either way (896
        # vs 1179 audio-s/s): padding is free on the wire (packed
        # transfers both ways) but the (B, T) rebuild gather costs per
        # PADDED element — a 1 s clip in a 35 s batch gathers 35x its
        # samples.
        self.pool_growth = pool_growth

    # ------------------------------------------------------------------ run --
    def run(self) -> CorpusMoments:
        from ..runtime import AudioLoader

        todo = [
            i for i in self.indices
            if not (self.store is not None and self.store.done[i])
        ]
        if self.store is not None:
            moments = self.store.moments
        elif self.multi:
            moments = {k: CorpusMoments.zeros(d) for k, d in self.dim.items()}
        else:
            moments = CorpusMoments.zeros(self.dim)
        if not todo:
            return moments

        n_data = self.mesh.shape[DATA_AXIS]
        n_seq = self.mesh.shape[SEQ_AXIS]
        hop = (
            self.cfg.stream_hop if self.feature == "melspec"
            else self.cfg.frame_step
        )
        align = n_seq * hop

        # Reorder-buffer depth: the in-order loader can only run `capacity`
        # clips ahead of the consumer, but a batch dispatches only after
        # batch_size clips arrive — with the default 16 the decoder stalls
        # at every batch boundary (head-of-line refill shows up as the
        # meter's decode_wait).  Sizing it past one full batch lets decode
        # run ahead under the device/fetch time; memory stays bounded at
        # ~capacity clips.
        loader = AudioLoader(
            [self.all_paths[i] for i in todo], n_threads=self.n_io_threads,
            max_seconds=self.max_seconds,
            capacity=max(32, 2 * self.batch_size),
        )
        # pending pools keyed by source sample rate: batches are same-rate so
        # one device resample call handles the whole padded batch
        pending: dict = {}
        batches_since_ckpt = 0
        # batches dispatched to the device but not yet fetched, in dispatch
        # order: [(utt ids, output pytree, audio seconds)]
        inflight: List[tuple] = []
        # fetch groups in flight in the pool, oldest first
        from collections import deque

        pending_fetches: deque = deque()
        executor = None
        writer = None
        write_futures: List = []
        from concurrent.futures import ThreadPoolExecutor

        if self.fetch_threads:
            executor = ThreadPoolExecutor(
                self.fetch_threads, thread_name_prefix="corpus-fetch"
            )
        if self.write_threads and self.out_dir:
            writer = ThreadPoolExecutor(
                self.write_threads, thread_name_prefix="corpus-write"
            )
        max_pending = self.fetch_threads + 2

        def tree_bytes(tree) -> int:
            # wire bytes of a pytree of device arrays (feeds the bench
            # wire-cost model; the packed fetch ships ~exactly these bytes)
            total = 0
            for leaf in jax.tree.leaves(tree):
                n = 1
                for s in leaf.shape:
                    n *= s
                total += n * leaf.dtype.itemsize
            return total

        def write_one(out_path: Path, payload) -> None:
            if out_path.exists():
                return  # idempotent restart-safe output
            if isinstance(payload, dict):
                tmp = out_path.with_suffix(".tmp.npz")
                np.savez(tmp, **payload)
            else:
                tmp = out_path.with_suffix(".tmp.npy")
                np.save(tmp, payload)
            os.replace(tmp, out_path)

        def flush_writes() -> None:
            # durability barrier: all submitted outputs on disk (and any
            # writer exception re-raised) before a checkpoint can mark done
            nonlocal write_futures
            for f in write_futures:
                f.result()
            write_futures = []

        def dispatch(batch: List[tuple], src_rate: int):
            import math

            ids = [todo[j] for j, _, _ in batch]
            # loader-metadata provenance: requantize losslessly without the
            # per-sample verify pass when every clip is mono PCM16
            exact = all(meta.pcm16_exact for _, _, meta in batch)
            b = len(batch)
            # partial tail batches round up to a power of two (then to the
            # data axis): a handful of compiled batch shapes instead of one
            # per remainder size; padded rows carry length 0 -> fully masked
            b_pad = b if b >= self.batch_size else 1 << (b - 1).bit_length()
            b_pad = ((b_pad + n_data - 1) // n_data) * n_data
            src_lengths = np.array([len(s) for _, s, _ in batch], dtype=np.int64)
            if src_rate == self.cfg.sample_rate:
                lengths = src_lengths
                bucket = bucket_length(int(lengths.max()))
                bucket = ((bucket + align - 1) // align) * align
                # packed transfer: ship only true samples (int16 when the
                # clips are exactly PCM16) and rebuild the padded (B, T)
                # block on device — host->device bytes are the corpus
                # bottleneck on remote-attached chips
                from .data import (extraction_step_packed, frame_counts_host,
                                   pack_signals)

                with self.meter.measure(0.0, scope="pack"):
                    flat, offsets, lens = pack_signals(
                        [s for _, s, _ in batch], b_pad, self.mesh,
                        pcm16_exact=exact,
                    )
                counts = None
                if self.packed_output:
                    counts = np.zeros(b_pad, dtype=np.int64)
                    counts[:b] = frame_counts_host(
                        lengths, self.cfg, self.feature
                    )
                # bytes as actually shipped (ADVICE r4): offsets/lengths go
                # over the wire as int32, and packed outputs add the int32
                # frame-offsets array to the same device_put
                n_i32 = 2 + (1 if counts is not None else 0)
                self.meter.bump("h2d_bytes",
                                flat.nbytes + n_i32 * 4 * b_pad)
                audio_sec = float(lengths.sum()) / self.cfg.sample_rate
                self.meter.bump("dispatches")
                with self.meter.measure(0.0, scope="dispatch"), \
                        self.meter.span("dispatch"):
                    out = extraction_step_packed(
                        flat, offsets, lens, bucket, self.cfg, self.mesh,
                        self.feature, frame_counts=counts,
                        wire_dtype=self.wire_dtype,
                    )
                inflight.append((ids, out, audio_sec, counts))
                if len(inflight) >= self.fetch_every:
                    drain()
                return
            else:
                g = math.gcd(self.cfg.sample_rate, src_rate)
                up, down = self.cfg.sample_rate // g, src_rate // g
                lengths = -(-src_lengths * up // down)
                # source bucket: multiple of `down` (integer output length)
                # and of down*align/gcd(align, up) (aligned output bucket)
                step = down * align // math.gcd(align, up)
                m0 = bucket_length(int(src_lengths.max()))
                src_bucket = ((m0 + step - 1) // step) * step
                # packed transfer at the SOURCE rate, unpack+resample fused
                # in one device program (zero padding is transparent through
                # the linear resampler: the filter sees zeros beyond the
                # true length either way, so row r's first ceil(len*up/down)
                # output samples are exactly the unpadded resample)
                from .data import pack_signals, unpack_resample

                with self.meter.measure(0.0, scope="pack"):
                    flat, offsets, src_lens = pack_signals(
                        [s for _, s, _ in batch], b_pad, self.mesh,
                        pcm16_exact=exact,
                    )
                # int32 wire sizes as shipped (ADVICE r4)
                self.meter.bump("h2d_bytes", flat.nbytes + 2 * 4 * b_pad)
                self.meter.bump("dispatches")
                with self.meter.span("dispatch"):
                    sig = unpack_resample(
                        flat, offsets, src_lens, src_bucket, up, down,
                        self.mesh
                    )
            lens = np.zeros(b_pad, dtype=np.int64)
            lens[:b] = lengths
            counts = None
            if self.packed_output:
                from .data import frame_counts_host

                counts = np.zeros(b_pad, dtype=np.int64)
                counts[:b] = frame_counts_host(lengths, self.cfg, self.feature)
            # the extraction_step below issues its OWN device_put for the
            # int32 lengths (+ frame offsets on packed outputs); the signal
            # block is already a device array and ships nothing (ADVICE r4:
            # this put was neither byte- nor call-counted)
            self.meter.bump("dispatches")
            self.meter.bump(
                "h2d_bytes", (2 if counts is not None else 1) * 4 * b_pad
            )
            audio_sec = float(lengths.sum()) / self.cfg.sample_rate
            # asynchronous: enqueues device work and returns device arrays
            with self.meter.measure(0.0, scope="dispatch"), \
                    self.meter.span("dispatch"):
                out = extraction_step(
                    sig, lens, self.cfg, self.mesh, self.feature,
                    frame_counts=counts, wire_dtype=self.wire_dtype,
                )
            inflight.append((ids, out, audio_sec, counts))
            if len(inflight) >= self.fetch_every:
                drain()

        def drain():
            # submit the in-flight group for fetching (ONE packed transfer
            # per group); with fetch threads, the transfer overlaps further
            # dispatch/decode and older groups are consumed once the bounded
            # queue fills — always in dispatch order
            if not inflight:
                return
            from .data import fetch_outputs

            records = list(inflight)
            inflight.clear()
            trees = [r[1] for r in records]
            self.meter.bump("fetch_groups")
            self.meter.bump("d2h_bytes", tree_bytes(trees))
            if executor is None:
                group_audio = sum(r[2] for r in records)
                with self.meter.measure(group_audio, scope="fetch"), \
                        self.meter.span("fetch"):
                    fetched = fetch_outputs(trees)
                consume(records, fetched)
                return

            def timed_fetch(trees=trees):
                # the span records the transfer's true start/end inside the
                # pool thread; the main thread's "fetch" scope only bills
                # its residual wait (r5: the wire model compares predicted
                # link seconds against the span union, not scopes)
                with self.meter.span("fetch"):
                    return fetch_outputs(trees)

            pending_fetches.append((records, executor.submit(timed_fetch)))
            while len(pending_fetches) > max_pending:
                consume_oldest()

        def consume_oldest():
            records, fut = pending_fetches.popleft()
            group_audio = sum(r[2] for r in records)
            # only the residual wait bills here: the transfer itself ran
            # concurrently in the fetch pool
            with self.meter.measure(group_audio, scope="fetch"):
                fetched = fut.result()
            consume(records, fetched)

        def consume(records, fetched):
            nonlocal moments, batches_since_ckpt
            for (ids, _, audio_sec, counts), out in zip(records, fetched):
                if counts is not None:
                    feats, batch_moments = out
                    row_off = np.zeros(len(ids) + 1, dtype=np.int64)
                    np.cumsum(counts[: len(ids)], out=row_off[1:])
                else:
                    feats, mask, batch_moments = out
                if self.multi:
                    feats = {
                        k: (v[0] if k == "mfe" else v)
                        for k, v in feats.items()
                    }
                    moments = {
                        k: moments[k].merge(batch_moments[k]) for k in moments
                    }
                else:
                    moments = moments.merge(batch_moments)
                if self.out_dir:
                    for r, utt_id in enumerate(ids):
                        out_path = self.out_dir / self._out_names[utt_id]
                        if counts is not None:
                            lo, hi = int(row_off[r]), int(row_off[r + 1])
                            if self.multi:
                                payload = {
                                    k: v[lo:hi] for k, v in feats.items()
                                }
                            else:
                                payload = feats[lo:hi]
                        elif self.multi:
                            n_valid = int(mask[r].sum())
                            payload = {
                                k: v[r, :n_valid] for k, v in feats.items()
                            }
                        else:
                            payload = feats[r, : int(mask[r].sum())]
                        if writer is not None:
                            write_futures.append(
                                writer.submit(write_one, out_path, payload)
                            )
                        else:
                            with self.meter.measure(0.0, scope="write"):
                                write_one(out_path, payload)
                if self.store is not None:
                    self.store.mark(ids, batch_moments)
                    batches_since_ckpt += 1
                    if batches_since_ckpt >= self.checkpoint_every:
                        flush_writes()
                        self.store.save()
                        batches_since_ckpt = 0
                if self.on_batch:
                    self.on_batch(
                        {"utts": len(ids), "audio_seconds": audio_sec,
                         "throughput": self.meter.throughput}
                    )

        import math

        try:
            # the "run" span brackets the whole consume loop so the wire
            # model can split wall into ramp (start -> first dispatch),
            # link-busy (dispatch/fetch span union) and tail
            self.meter.spans.append(("run", time.perf_counter(), 0.0))
            it = iter(loader)
            while True:
                with self.meter.measure(0.0, scope="decode_wait"):
                    rec = next(it, None)
                if rec is None:
                    break
                j, samples, sr, meta = rec
                if sr != self.cfg.sample_rate and not self.resample:
                    raise ValueError(
                        f"{self.all_paths[todo[j]]}: sample rate {sr} != "
                        f"config {self.cfg.sample_rate} "
                        "(pass resample=True to convert)"
                    )
                # frame-count check at the TARGET rate (post-resample length)
                if sr == self.cfg.sample_rate:
                    n_t = len(samples)
                else:
                    g = math.gcd(self.cfg.sample_rate, sr)
                    n_t = -(
                        -len(samples) * (self.cfg.sample_rate // g) // (sr // g)
                    )
                # drop utterances too short to produce one frame (reference
                # yields an empty matrix for these, feature.rs:102-104); the
                # vorbis/melspec path frames any length (ceil(L/hop) chunks)
                if self.feature == "melspec":
                    num = -(-n_t // hop)
                else:
                    num, _ = speechpy_frame_counts(
                        n_t, self.cfg.frame_size, hop, zero_padding=False
                    )
                if num <= 0:
                    if self.store is not None:
                        self.store.done[todo[j]] = True
                    continue
                # pools key on (rate, length bucket); wire-optimized runs
                # use a coarser band grid (pool_growth) — see __init__
                key = (sr, bucket_length(len(samples))
                       if self.pool_growth is None
                       else bucket_length(len(samples),
                                          growth=self.pool_growth))
                pool = pending.setdefault(key, [])
                pool.append((j, samples, meta))
                if len(pool) >= self.batch_size:
                    dispatch(pool, sr)
                    pending[key] = []
            for (sr, _), pool in pending.items():
                if pool:
                    dispatch(pool, sr)
            drain()
            while pending_fetches:
                consume_oldest()
            flush_writes()
        finally:
            for i, (n, t0, t1) in enumerate(self.meter.spans):
                if n == "run" and t1 == 0.0:
                    self.meter.spans[i] = ("run", t0, time.perf_counter())
            if executor is not None:
                executor.shutdown(wait=True)
            if writer is not None:
                writer.shutdown(wait=True)
        if self.store is not None:
            self.store.moments = moments
            self.store.save()
        return moments
