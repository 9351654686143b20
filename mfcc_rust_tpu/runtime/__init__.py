"""Native runtime layer: C++ WAV codec + threaded prefetch loader.

Built lazily with g++ into a cached shared object and bound via ctypes (this
image has no pybind11).  A pure-Python/scipy fallback keeps everything
working when no compiler is available.
"""

from .build import native_available  # noqa: F401
from .loader import AudioLoader  # noqa: F401
from .wav import read_wav, wav_info, write_wav  # noqa: F401
