"""DSP core + TPU kernels: STFT/iSTFT, windows, resize, audio utilities."""

from .stft import (  # noqa: F401
    STFTConfig,
    frame_signal,
    griffin_lim,
    istft,
    magphase,
    overlap_add,
    polar,
    reconstruct,
    spectrogram,
    stft,
)
from .resize import (  # noqa: F401
    resize_bilinear,
    resize_nearest,
    upsample_nearest,
)
from .windows import get_window, hann  # noqa: F401
from . import audio  # noqa: F401
