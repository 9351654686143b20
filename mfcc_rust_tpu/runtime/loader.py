"""Threaded prefetching corpus loader (native C++ backend, Python fallback)."""

from __future__ import annotations

import ctypes
from typing import Iterator, List, Tuple

import numpy as np

from .build import load_native
from .wav import read_wav


class AudioLoader:
    """Iterate decoded utterances ``(index, float32 samples, sample_rate)``
    in worker-arrival order, decoding ``n_threads`` files ahead of the
    consumer.  The native backend keeps host CPUs saturated while the device
    computes; the fallback decodes inline."""

    def __init__(
        self,
        paths: List[str],
        n_threads: int = 4,
        capacity: int = 16,
        mix_mono: bool = True,
        max_seconds: float = 240.0,
        max_sample_rate: int = 48000,
        warn_truncated: bool = True,
    ):
        self.paths = [str(p) for p in paths]
        self.n_threads = n_threads
        self.capacity = capacity
        self.mix_mono = mix_mono
        self.max_frames = int(max_seconds * max_sample_rate)
        self.warn_truncated = warn_truncated
        self._lib = load_native()
        # interleaved mode: size the consumer buffer from the corpus's actual
        # max channel count (header probe is cheap) instead of a fixed
        # worst-case that wastes memory and silently truncates wide files
        self._max_ch = 1
        if not mix_mono:
            from .wav import wav_info

            for p in self.paths:
                try:
                    self._max_ch = max(self._max_ch, wav_info(p).channels)
                except IOError:
                    pass  # decode errors surface later with a real message

    def _maybe_warn(self, idx: int, frames: int) -> None:
        if self.warn_truncated and frames >= self.max_frames:
            import warnings

            warnings.warn(
                f"{self.paths[idx]}: decoded {frames} frames == max_frames "
                f"cap; the file was likely truncated (raise max_seconds)",
                stacklevel=2,
            )

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray, int]]:
        if self._lib is None:
            yield from self._iter_fallback()
            return
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths]
        )
        handle = self._lib.loader_create(
            arr, len(self.paths), self.n_threads, self.capacity,
            1 if self.mix_mono else 0, self.max_frames,
        )
        buf_values = self.max_frames * (1 if self.mix_mono else self._max_ch)
        buf = np.empty(buf_values, dtype=np.float32)
        idx = ctypes.c_int()
        frames = ctypes.c_uint32()
        ch = ctypes.c_uint32()
        sr = ctypes.c_uint32()
        try:
            while True:
                rc = self._lib.loader_next(
                    handle, ctypes.byref(idx),
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    buf_values, ctypes.byref(frames), ctypes.byref(ch),
                    ctypes.byref(sr),
                )
                if rc == 1:
                    return
                if rc < 0:
                    raise IOError(
                        f"decode failed for {self.paths[idx.value]} (code {rc})"
                    )
                self._maybe_warn(idx.value, frames.value)
                out = buf[: frames.value * ch.value].copy()
                if ch.value > 1:
                    out = out.reshape(-1, ch.value)
                yield idx.value, out, sr.value
        finally:
            self._lib.loader_destroy(handle)

    def _iter_fallback(self) -> Iterator[Tuple[int, np.ndarray, int]]:
        for i, p in enumerate(self.paths):
            samples, sr = read_wav(p, self.mix_mono, self.max_frames)
            self._maybe_warn(i, samples.shape[0])
            yield i, samples, sr
