"""Torch training-pipeline integration — the train-in-Python story.

The reference's purpose is identical features at train time (Python) and
deploy time (reference README.md:3); torch users get that through
``mfcc_rust_tpu.torch_compat``: tensor-in/tensor-out wrappers of the whole
facade plus nn.Module transforms for Dataset/DataLoader pipelines.

Run: python examples/torch_pipeline.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import torch

from mfcc_rust_tpu import torch_compat as ttc

sr = 16000
rng = np.random.default_rng(0)

# --- functional: tensor in, tensor out -------------------------------------
wave = torch.from_numpy(rng.normal(0, 0.1, (sr * 3,)).astype(np.float32))
feats = ttc.mfcc(wave, sr)
print("mfcc:", tuple(feats.shape), feats.dtype)

# several features from one frontend pass
multi = ttc.extract(wave, sr, which=("mfcc", "lmfe", "ssc"))
print("extract:", {k: tuple(v.shape) for k, v in multi.items() if k != "mfe"})

# --- as a Dataset transform --------------------------------------------------
class ToneDataset(torch.utils.data.Dataset):
    """Toy dataset: random tones -> (librosa-semantics MFCC, label)."""

    def __init__(self, n, transform):
        self.freqs = rng.uniform(200, 2000, n)
        self.transform = transform

    def __len__(self):
        return len(self.freqs)

    def __getitem__(self, i):
        t = np.arange(22050, dtype=np.float32) / 22050
        wav = torch.from_numpy(0.5 * np.sin(2 * np.pi * self.freqs[i] * t))
        return self.transform(wav), float(self.freqs[i])


transform = ttc.MFCC(sr=22050, n_mfcc=13)
ds = ToneDataset(8, transform)
loader = torch.utils.data.DataLoader(ds, batch_size=4)
for batch, labels in loader:
    print("dataloader batch:", tuple(batch.shape), "labels:", [round(float(x)) for x in labels])

# the same extractor drops into an nn.Sequential preprocessing head
pipe = torch.nn.Sequential(ttc.MelSpectrogram(sr=22050, n_mels=64))
mel = pipe(torch.from_numpy(rng.normal(0, 0.1, (2, 22050)).astype(np.float32)))
print("nn.Sequential mel:", tuple(mel.shape))
