from . import bucketing  # noqa: F401
from .bucketing import bucket_batch, bucket_length, pad_to_bucket  # noqa: F401
