"""Golden float64 numpy oracle for the reference's streaming ("DFN") STFT and
mel-spectrogram path (functions.rs:86-233, feature.rs:151-174).

This is a faithful *stateful, frame-by-frame* simulation of
``frame_analysis``/``stft1``/``stft2`` — including the warm-up frame drop, the
never-written trailing zero rows, and the ``wnorm`` scaling — used to prove
the batch (stateless) and streaming (explicit-carry) JAX implementations
reproduce it exactly.  Unlike the reference, state is explicit here, so there
is no cross-call leakage (reference bug #5, SURVEY §4).
"""

from __future__ import annotations

import numpy as np


def vorbis_window(n_fft):
    nh = n_fft // 2
    i = np.arange(n_fft, dtype=np.float64)
    s = np.sin(0.5 * np.pi * (i + 0.5) / nh)
    return np.sin(0.5 * np.pi * s * s)


class AnalysisState:
    """Explicit version of SpeechConfig's analysis_mem (config.rs:162)."""

    def __init__(self, n_fft, frame_size):
        self.n_fft = n_fft
        self.frame_size = frame_size
        self.mem = np.zeros(n_fft - frame_size)
        self.window = vorbis_window(n_fft)
        self.wnorm = 1.0 / (n_fft**2 / (2.0 * frame_size))

    def frame_analysis(self, chunk):
        """One hop: window the (mem ++ chunk) frame, rfft, scale, shift mem
        (functions.rs:125-170)."""
        assert len(chunk) == self.frame_size
        buf = np.concatenate([self.mem, chunk]) * self.window
        self.mem = np.concatenate([self.mem, chunk])[self.frame_size :]
        return np.fft.rfft(buf) * self.wnorm


def stft1(signal, n_fft=512, frame_size=None, sample_rate=16000, frame_length=0.02,
          state=None):
    """1-D streaming STFT -> (T', F) complex (functions.rs:199-233).

    Output layout matches the reference exactly: the first n_pad computed
    frames are dropped and n_pad *zero* rows remain at the tail (the output
    array is allocated with ceil(T/F)+n_pad rows, only ceil(T/F) are written,
    then the first n_pad are sliced off)."""
    frame_size = int(sample_rate * frame_length) if frame_size is None else frame_size
    n_pad = n_fft // frame_size - 1
    ttd = len(signal)
    n_chunks = int(np.ceil(ttd / frame_size))
    tfd = n_chunks + n_pad
    st = AnalysisState(n_fft, frame_size) if state is None else state
    out = np.zeros((tfd, n_fft // 2 + 1), dtype=np.complex128)
    for c in range(n_chunks):
        chunk = signal[c * frame_size : (c + 1) * frame_size]
        if len(chunk) < frame_size:
            chunk = np.concatenate([chunk, np.zeros(frame_size - len(chunk))])
        out[c] = st.frame_analysis(chunk)
    return out[n_pad:]


def stft2(signals, n_fft=512, frame_size=None, sample_rate=16000, frame_length=0.02,
          reset_per_channel=True):
    """(C, T) -> (C, T', F) (functions.rs:86-123).

    The reference runs all channels through ONE shared AnalysisState
    sequentially, so state leaks across channels (and across calls — bug #5,
    SURVEY §4).  The build's batch mode is stateless per channel (SURVEY
    §3.3), which is the default here; pass ``reset_per_channel=False`` to
    reproduce the reference's leaking behavior."""
    frame_size = int(sample_rate * frame_length) if frame_size is None else frame_size
    st = None if reset_per_channel else AnalysisState(n_fft, frame_size)
    outs = []
    for ch in signals:
        outs.append(stft1(ch, n_fft, frame_size, state=st))
    return np.stack(outs)


def speechpy_filterbanks_for_melspec(num_filters, n_fft, sample_rate, low, high):
    from .speechpy_ref import filterbanks

    return filterbanks(num_filters, n_fft // 2 + 1, sample_rate, low, high)


def mel_spectrogram1(signal, sample_rate=16000, n_fft=512, frame_length=0.02,
                     num_filters=40, low=0.0, high=None):
    """(M, T): |stft1|^2 then einsum 'ft,mf->mt' (feature.rs:151-161)."""
    # NOTE reference bug (undocumented in SURVEY): feature.rs:161 writes
    # einsum!("ft,mf->mt", s, fb) but stft1 returns (time, freq), so the
    # contraction dims (tfd vs freq_size) cannot match and the reference
    # would panic at runtime for any non-square spectrogram (no test covers
    # it, lib.rs:8-135).  The evident intent — matching the correct 2-D path
    # "ntf,mf->nmt" (feature.rs:173) — is implemented here.
    s = np.abs(stft1(signal, n_fft, None, sample_rate, frame_length)) ** 2
    fb = speechpy_filterbanks_for_melspec(num_filters, n_fft, sample_rate, low,
                                          sample_rate / 2 if high is None else high)
    return np.einsum("tf,mf->mt", s, fb)


def mel_spectrogram2(signals, sample_rate=16000, n_fft=512, frame_length=0.02,
                     num_filters=40, low=0.0, high=None):
    """(N, M, T) batched variant (feature.rs:163-174)."""
    s = np.abs(stft2(signals, n_fft, None, sample_rate, frame_length)) ** 2
    fb = speechpy_filterbanks_for_melspec(num_filters, n_fft, sample_rate, low,
                                          sample_rate / 2 if high is None else high)
    return np.einsum("ntf,mf->nmt", s, fb)
