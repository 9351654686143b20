"""Basic feature extraction — the speechpy-compatible surface.

Run: python examples/basic_features.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import mfcc_rust_tpu as ss

sr = 16000
t = np.arange(sr * 2) / sr
signal = (0.6 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

# MFCC with speechpy defaults (20 ms frames, 10 ms hop, 40 mels, 13 cepstra)
mfcc = ss.mfcc(signal, sr)
print("mfcc:", mfcc.shape)

# mel filterbank energies + per-frame energies
fbe, energy = ss.mfe(signal, sr)
print("mfe:", fbe.shape, "energy:", energy.shape)

# log-FBE, spectral subband centroids
print("lmfe:", ss.lmfe(signal, sr).shape)
print("ssc:", ss.ssc(signal, sr).shape)

# reference-parity mel spectrogram (vorbis streaming STFT path); 2-D input
# dispatches to the batched variant
print("mel 1-D:", ss.mel_spectrogram(signal, sr).shape)
print("mel 2-D:", ss.mel_spectrogram(np.stack([signal, signal]), sr).shape)

# post-processing: deltas and CMVN
cube = ss.extract_derivative_feature(mfcc)
print("feature cube:", cube.shape)
norm = ss.cmvn(mfcc, variance_normalization=True)
print("cmvn mean ~0:", float(abs(norm.mean(0)).max()))

# librosa-compatible family
y = np.random.default_rng(0).normal(0, 0.1, 22050).astype(np.float32)
print("librosa mel:", ss.mel_spectrogram_librosa(y, 22050).shape)
print("librosa mfcc:", ss.mfcc_librosa(y, 22050).shape)

# librosa-style deltas (Savitzky-Golay) and on-device resampling
mf = ss.mfcc_librosa(y, 22050)
print("librosa delta:", ss.delta_librosa(mf).shape)
print("resampled 22.05k -> 16k:", ss.resample(y, 22050, 16000).shape)
