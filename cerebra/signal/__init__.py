"""Signal processing: filters, spectrograms, normalization, windowing.

Device-side (jit/vmap/Pallas-friendly) re-design of the reference's
scipy/MNE/librosa host loops:
- utils/EEGFilters.py:4-44 (filter design bank) → `filters.design_*`
- utils/Utilities.py:411-428 (per-sample/channel filtfilt double loop) →
  one vmapped `filters.filtfilt` scan or one `filters.filtfilt_fft` call
- EEG-BarlowNetworks/barlow_utils.py:53-60 (librosa mel) → `spectro`
- per-sample normalizations (utils/PerilsEEGDataset.py:454-461, 575-587) →
  pure batched ops in `norm`
"""

from cerebra.signal.filters import (  # noqa: F401
    FilterSpec,
    design_bandpass,
    design_notch,
    lfilter,
    filtfilt,
    filtfilt_fft,
)
from cerebra.signal.norm import (  # noqa: F401
    channel_wise_norm,
    z2_score_norm,
    global_scalar_norm,
    random_channel_norm_view,
    three_view_augment,
)
from cerebra.signal.windows import time_window, random_time_crop, multicrop_views  # noqa: F401
from cerebra.signal.spectro import stft_magnitude, mel_filterbank, melspectrogram  # noqa: F401
