"""Streaming mel extraction with explicit, resettable state.

The reference's streaming STFT hides its ring buffer in a RefCell and leaks
state across calls (SURVEY §4 bug #5); here the session carry is explicit
and the chunked stream is bit-equal to the batch transform.

Run: python examples/streaming.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import mfcc_rust_tpu as ss
from mfcc_rust_tpu import vorbis_config
from mfcc_rust_tpu.models import StreamingExtractor

sr = 16000
cfg = vorbis_config(sr)
hop = cfg.stream_hop
signal = np.random.default_rng(0).normal(0, 0.1, hop * 100).astype(np.float32)

session = StreamingExtractor(cfg)
chunks = np.split(signal, 10)  # 10 chunks of 10 hops each
streamed = [session.process(c) for c in chunks]
streamed.append(session.finalize())
streamed = np.concatenate(streamed, axis=0)

batch = ss.mel_spectrogram(signal, sr).T
print("streamed:", streamed.shape, "batch:", batch.shape)
print("max difference:", np.abs(streamed - batch).max())
