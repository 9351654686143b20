"""DSP primitive ops (the TPU-native L2 layer; reference:
speechsauce/src/processing.rs + functions.rs)."""

from . import dct, delta, framing, mel, normalize, resample, spectrum, ssc, stft  # noqa: F401
from .resample import resample_poly  # noqa: F401
from .resample import resample as resample_audio  # noqa: F401
from .delta import delta as time_delta  # noqa: F401
from .delta import delta_librosa, derivative_extraction, extract_derivative_feature  # noqa: F401
from .framing import frame_signal, preemphasis, stack_frames  # noqa: F401
from .normalize import apply_corpus_cmvn, cmvn, cmvnw, masked_moments  # noqa: F401
from .spectrum import (  # noqa: F401
    fft_spectrum,
    log_power_spectrum,
    power_spectrum,
    power_to_db,
    zero_handling,
)
from .stft import (  # noqa: F401
    stft_framed,
    stft_streaming,
    stft_vorbis,
    stft_vorbis_power,
    streaming_init,
    streaming_step,
)
