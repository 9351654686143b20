"""speechpy drop-in: ``from mfcc_rust_tpu.compat import speechpy`` and use
``speechpy.feature.mfcc`` / ``speechpy.processing.cmvn`` exactly as with
astorfi/speechpy — same module layout, signatures and defaults, backed by the
TPU pipelines (with SURVEY §4's reference bugs fixed, i.e. true speechpy
semantics)."""

from . import feature, processing  # noqa: F401
