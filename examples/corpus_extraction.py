"""Corpus-scale extraction: device mesh + prefetch loader + checkpointed
corpus CMVN.

Run: python examples/corpus_extraction.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os
import tempfile

import numpy as np

from mfcc_rust_tpu import FeatureConfig
from mfcc_rust_tpu.parallel import make_mesh
from mfcc_rust_tpu.parallel.runner import CorpusRunner
from mfcc_rust_tpu.runtime import write_wav

# synthesize a tiny "corpus"
work = tempfile.mkdtemp()
rng = np.random.default_rng(0)
paths = []
for i in range(12):
    n = 16000 + 2000 * i
    clip = rng.normal(0, 0.1, n).astype(np.float32).clip(-1, 1)
    p = os.path.join(work, f"utt{i:03d}.wav")
    write_wav(p, clip, 16000)
    paths.append(p)

runner = CorpusRunner(
    paths,
    FeatureConfig(sample_rate=16000),
    make_mesh(),                       # all local devices on the data axis
    batch_size=4,
    out_dir=os.path.join(work, "feats"),
    checkpoint_path=os.path.join(work, "state.npz"),
    on_batch=lambda info: print("  batch:", info),
)
moments = runner.run()

print("corpus frames:", int(moments.count))
print("corpus mean[:4]:", np.asarray(moments.mean)[:4])
print("throughput:", runner.meter.report()["audio_seconds_per_sec"], "audio-s/s")
print("features in:", os.path.join(work, "feats"))

# a second run resumes from the checkpoint and is a no-op
again = CorpusRunner(paths, FeatureConfig(sample_rate=16000), make_mesh(),
                     batch_size=4, checkpoint_path=os.path.join(work, "state.npz"))
again.run()
print("resume processed batches:", again.meter.batches, "(0 = resumed clean)")

# multi-feature: one frontend pass writes an .npz bundle per utterance and
# keeps per-feature corpus moments (same thing via the CLI:
#   python -m mfcc_rust_tpu 'corpus/*.wav' --feature mfcc,lmfe,ssc --out-dir ...)
multi = CorpusRunner(
    paths,
    FeatureConfig(sample_rate=16000),
    make_mesh(),
    feature=("mfcc", "lmfe", "ssc", "energy"),
    batch_size=4,
    out_dir=os.path.join(work, "feats_multi"),
)
mmoments = multi.run()
print("multi-feature moments:",
      {k: tuple(np.asarray(v.mean).shape) for k, v in mmoments.items()})
bundle = np.load(os.path.join(work, "feats_multi", "utt000.npz"))
print("utt000 bundle:", {k: bundle[k].shape for k in bundle.files})
