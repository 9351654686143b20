"""Incremental chunk-GEMM streaming frontend (VERDICT r1 #8).

The recompute streaming path re-runs the framed pipeline over an
``n_frames*hop + frame_len`` window per call, multiplying every hop-chunk
against the DFT wall ``r = frame_len/hop`` times across its lifetime.  Here
each chunk is multiplied ONCE — ``g[s] = chunk @ wall_block_s`` for all r
shift blocks in a single GEMM — and the per-frame partial sums are carried
explicitly across calls, the streaming analogue of the batch chunk-GEMM
identity (features._chunk_gemm).  process() cost is O(new samples), state
is O(r) frames.

Functionalizes what the reference's ``analysis_mem`` ring buffer does
serially for its own streaming STFT (speechsauce/src/config.rs:162,
functions.rs:125-170), generalized to the speechpy and librosa framings
(which the reference cannot stream at all).

Accumulation-order parity: within a frame, contributions arrive in
ascending shift order — the exact association order of the batch lowering —
so a fed-in-chunks session reproduces the batch output bit-for-bit (gated
by tests/test_models.py's streaming-equality suite, which runs through this
path).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FeatureConfig


def incremental_supported(cfg: FeatureConfig, feature: str) -> bool:
    from ..features import _fast_path_ok

    if cfg.preemphasis_cof:
        return False
    # The carried frontend's emission clock is CHUNK-quantized: frame f is
    # emitted only after chunk f + r - 1 is consumed.  For hop-misaligned
    # frames (fl % hop != 0, r = ceil) the frame is mathematically ready up
    # to hop - fl%hop samples EARLIER than the chunk boundary, so under
    # ragged feeds the session's ready-count (what the batch transform
    # would emit for the samples seen) can exceed the frontend's emissions
    # — those configs stream through the recompute fallback instead
    # (StreamingFeatures.process), which is exact for any fl/hop.
    if cfg.frame_size % cfg.frame_step != 0:
        return False
    if feature == "mel_librosa":
        # librosa frames by n_fft; the wall needs whole hop blocks
        return cfg.frame_size == cfg.fft_points
    if feature in ("mfcc", "lmfe", "mfe"):
        return _fast_path_ok(cfg)
    return False


class IncrementalFrontend:
    """Carried-state streaming executor for one (cfg, feature) pair.

    feed(samples) -> (K_new_rows ...) frame rows in emission order; the
    caller (StreamingFeatures) handles sample accounting / which rows are
    real frames.  State: ``rem`` (< hop leftover samples, numpy) and
    ``pending`` ((P, W) partial GEMM rows + (P,) partial energy sums).

    Frame-row layout: with C chunks consumed, the next emitted row is frame
    ``C - P`` (P = r - 1 + lag; lag=1 reproduces speechpy's one-frame
    emission lag, lag=0 librosa's emit-on-complete) — rows for negative
    frame indices are warm-up garbage the caller discards.
    """

    #: chunk-count buckets for the jitted step (greedy largest-first split —
    #: padding is impossible here because zero chunks would advance the
    #: frame clock)
    K_BUCKETS = (64, 16, 4, 1)

    def __init__(self, cfg: FeatureConfig, feature: str):
        if not incremental_supported(cfg, feature):
            raise ValueError(f"incremental streaming unsupported for {feature!r}")
        self.cfg = cfg
        self.feature = feature
        from ..constants import chunk_gemm_wall, constant_bundle
        from ..features import _stacked_fb

        bundle = constant_bundle(cfg)
        self.lag = 0 if feature == "mel_librosa" else 1
        if feature == "mel_librosa":
            kmax = bundle["fbank_kmax"]
            c64, s64 = bundle["dft_windowed"]
            fl = c64.shape[0]
            rows = -(-fl // cfg.frame_step) * cfg.frame_step  # ceil whole hops
            wall = np.zeros((rows, 2 * kmax))
            wall[:fl, :kmax] = c64[:, :kmax]
            wall[:fl, kmax:] = s64[:, :kmax]
            self._fb2 = _stacked_fb(bundle["fbank"], kmax, 2 * kmax)
            self._want_energy = False
            self._w2 = None
        else:
            # energy is needed for mfe always and for mfcc's dc-elimination
            self._want_energy = (
                feature == "mfe"
                or (feature == "mfcc" and cfg.dc_elimination)
            )
            wd = chunk_gemm_wall(cfg, self._want_energy)
            wall = wd["wall"]
            self._w2 = wd["w2"]  # (r, hop)
            kmax = wd["kmax"]
            self._fb2 = _stacked_fb(
                bundle["fbank"], kmax, wall.shape[1], 1.0 / cfg.fft_points
            )
        self._kmax = kmax
        self.hop = cfg.frame_step
        self.r = wall.shape[0] // self.hop
        self.P = self.r - 1 + self.lag
        self.W = wall.shape[1]
        # (hop, r*W): one GEMM per chunk covers every shift block
        self._wcat = np.ascontiguousarray(
            np.concatenate(
                [wall[s * self.hop : (s + 1) * self.hop] for s in range(self.r)],
                axis=1,
            )
        )
        self._dct = bundle["dct"]
        self._steps = {}
        self.reset()

    def reset(self) -> None:
        dt = jnp.dtype(self.cfg.dtype)
        self.rem = np.zeros(0, dtype=dt)
        self.pending = jnp.zeros((self.P, self.W), dtype=dt)
        self.pending_e = jnp.zeros((self.P,), dtype=dt)

    # ------------------------------------------------------------- jit step --
    def _step_fn(self, k: int):
        """Jitted (chunks (k, hop), pend, pend_e) ->
        (rows (k, D)[, energies (k,)], new_pend, new_pend_e)."""
        if k in self._steps:
            return self._steps[k]
        cfg = self.cfg
        r, P, W, hop = self.r, self.P, self.W, self.hop
        dt = jnp.dtype(cfg.dtype)
        wcat = jnp.asarray(self._wcat, dt)
        fb2 = jnp.asarray(self._fb2, dt)
        w2 = None if self._w2 is None else jnp.asarray(self._w2, dt)  # (r, hop)
        want_e = self._want_energy
        feature = self.feature
        n = cfg.fft_points

        def step(chunks, pend, pend_e):
            g = jnp.matmul(chunks, wcat, precision=cfg.precision)
            g = g.reshape(k, r, W)
            acc = jnp.concatenate([pend, jnp.zeros((k, W), dt)], axis=0)
            for s in range(r):
                acc = acc.at[P - s : P - s + k].add(g[:, s])
            y = acc[:k]
            new_pend = acc[k:]
            e = None
            new_pend_e = pend_e
            if want_e:
                # per-(chunk, shift) windowed sum of squares — the streaming
                # form of features._parseval_energies' per-chunk reductions
                ge = jnp.matmul(
                    chunks * chunks, w2.T,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (k, r)
                acc_e = jnp.concatenate([pend_e, jnp.zeros((k,), dt)])
                for s in range(r):
                    acc_e = acc_e.at[P - s : P - s + k].add(ge[:, s])
                from ..ops.spectrum import zero_handling

                s0 = y[:, 2 * self._kmax]
                s1 = y[:, 2 * self._kmax + 1]
                e = zero_handling(
                    (n * acc_e[:k] + s0 * s0 + s1 * s1) / (2.0 * n)
                )
                new_pend_e = acc_e[k:]

            # feature head on the k emitted rows
            if feature == "mel_librosa":
                rows = jnp.matmul(y * y, fb2, precision=cfg.precision)
                return rows, new_pend, new_pend_e
            from ..ops.dct import dct2_ortho
            from ..ops.spectrum import zero_handling

            mel = zero_handling(
                jnp.matmul(y * y, fb2, precision=cfg.precision)
            )
            if feature == "mfe":
                return (mel, e), new_pend, new_pend_e
            logm = jnp.log(mel)
            if feature == "lmfe":
                return logm, new_pend, new_pend_e
            coeffs = dct2_ortho(logm, cfg)
            if cfg.dc_elimination:
                coeffs = coeffs.at[:, 0].set(jnp.log(e))
            return coeffs, new_pend, new_pend_e

        fn = jax.jit(step)
        self._steps[k] = fn
        return fn

    # ----------------------------------------------------------------- feed --
    def feed(self, samples: np.ndarray):
        """Consume samples; returns the emitted rows (list of arrays, frame
        order; includes warm-up rows for negative frame indices — caller
        trims by its ready-count accounting)."""
        buf = np.concatenate([self.rem, np.asarray(samples, self.rem.dtype)])
        n_chunks = len(buf) // self.hop
        self.rem = buf[n_chunks * self.hop :]
        outs = []
        pos = 0
        left = n_chunks
        while left > 0:
            k = next(b for b in self.K_BUCKETS if b <= left)
            chunks = jnp.asarray(
                buf[pos * self.hop : (pos + k) * self.hop].reshape(k, self.hop)
            )
            rows, self.pending, self.pending_e = self._step_fn(k)(
                chunks, self.pending, self.pending_e
            )
            outs.append(rows)
            pos += k
            left -= k
        return outs
