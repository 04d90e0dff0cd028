"""BDF → .pth ingest (reference ConvertToPth.py:47-201), MNE-free.

Pipeline parity:
1. read BDF (pure-numpy reader, cerebra.data.bdf);
2. re-reference to the mean of channels 96/97 0-based (ConvertToPth.py:75);
3. resample ×DownSampling_Frequency_ratio (4096→2048 Hz, :79-81) via
   scipy.signal.resample_poly;
4. events from the Status channel (rising edges to STATUS_EVENT=65280,
   replacing the MNE event-layout surgery of :87-96);
5. optional zero-phase band-pass 14–71 Hz and 60 Hz notch (:106-111) —
   executed on DEVICE with the batched FFT filtfilt (whole recording at
   once);
6. drop EXG*/Status channels (:114-119);
7. slice Sampling/4 = 512-sample epochs from each event (:124-133);
8. global per-channel mean/std (:140-141);
9. labels from image.pkl + the stimulus sequence file (:148-166);
10. write the reference .pth dict (:170-201) via save_corpus_pth.
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Sequence, Tuple

import numpy as np

from cerebra.data.bdf import read_raw_bdf
from cerebra.data.schema import RawCorpus, save_corpus_pth

_ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")
IMAGE_CLASS_MAPPINGS = os.path.join(_ASSETS, "image.pkl")
IMAGE_BLOCK_SEQUENCE = os.path.join(_ASSETS, "image-block.txt")
IMAGE_RAPID_SEQUENCE = os.path.join(_ASSETS, "image-rapid-event.txt")

STATUS_EVENT = 65280  # ConvertToPth.py:38
DEFAULT_BAD_CHANNELS = (
    "EXG1", "EXG2", "EXG3", "EXG4", "EXG5", "EXG6", "EXG7", "EXG8", "Status",
)


def find_status_events(status: np.ndarray, code: int = STATUS_EVENT) -> np.ndarray:
    """Sample indices where the status word rises to `code` (the MNE
    find_events equivalent after the reference's axis surgery)."""
    hits = status == code
    rising = hits & ~np.concatenate([[False], hits[:-1]])
    return np.nonzero(rising)[0]


def load_stimulus_labels(
    sequence_file: str, mappings_file: str = IMAGE_CLASS_MAPPINGS
) -> Tuple[List[str], List[int], List[str]]:
    """(image_names, class_ids, wnids) from the presentation sequence +
    name→class pickle (ConvertToPth.py:148-166)."""
    with open(mappings_file, "rb") as f:
        image_class_mappings = pickle.load(f)
    wnid_to_class: dict = {}
    for key, val in image_class_mappings.items():
        wnid = key.split("_")[0]
        wnid_to_class.setdefault(wnid, val)
    names, classes = [], []
    with open(sequence_file) as f:
        for line in f:
            name = line.strip().split(".")[0]
            if not name:
                continue
            names.append(name)
            classes.append(int(image_class_mappings[name]))
    return names, classes, list(wnid_to_class.keys())


def convert_bdf_to_pth(
    bdf_path: str,
    out_path: str,
    subject: int,
    sequence_file: str = IMAGE_RAPID_SEQUENCE,
    mappings_file: str = IMAGE_CLASS_MAPPINGS,
    reference_channels: Sequence[int] = (96, 97),
    downsample_ratio: float = 0.5,
    down_ratio_for_timesamples: int = 4,
    apply_bandpass: bool = True,
    band: Tuple[float, float] = (14.0, 71.0),
    apply_notch: bool = False,
    notch_freq: float = 60.0,
    bad_channels: Sequence[str] = DEFAULT_BAD_CHANNELS,
    expected_samples: Optional[int] = None,
    use_device_filters: bool = True,
) -> RawCorpus:
    """Full ingest; writes `out_path` and returns the RawCorpus."""
    from scipy.signal import resample_poly

    # prefer the native multithreaded C++ decoder (bit-identical to the
    # numpy reader — tests/test_ingest.py pins it); fall back when no
    # toolchain is available
    try:
        from cerebra.data import native_bdf

        bdf = native_bdf.read_raw_bdf(bdf_path) if native_bdf.available() else read_raw_bdf(bdf_path)
    except Exception:
        bdf = read_raw_bdf(bdf_path)
    sig = bdf.signals
    names = bdf.channel_names

    # 2) re-reference (average of the two reference electrodes)
    if max(reference_channels) >= sig.shape[0]:
        raise ValueError(
            f"reference channels {tuple(reference_channels)} out of range for a "
            f"{sig.shape[0]}-channel recording — pass indices valid for this rig "
            f"(the 96,97 default is the 128-channel BioSemi layout)"
        )
    ref = sig[list(reference_channels)].mean(axis=0, keepdims=True)
    eeg_rows = [i for i, n in enumerate(names) if not n.lower().startswith("status")]
    sig = sig.copy()
    sig[eeg_rows] -= ref

    # 3) resample
    up, down = (1, int(round(1 / downsample_ratio))) if downsample_ratio < 1 else (
        int(round(downsample_ratio)), 1,
    )
    # the ACTUAL resampled rate — resample_poly applies up/down, which only
    # equals sample_rate*downsample_ratio when 1/downsample_ratio is an
    # integer; epoch_len and the filter design must track the real rate
    sampling = bdf.sample_rate * up / down
    sig = resample_poly(sig, up, down, axis=-1).astype(np.float32)
    epoch_len = int(sampling) // down_ratio_for_timesamples  # 2048/4 → 512

    # 4) events — detect rising edges on the RAW full-rate status channel,
    # then map onsets to resampled indices. Plain status[::down] slicing
    # would drop trigger words shorter than `down` raw samples and shift
    # edges that start on non-multiple indices (the reference finds events
    # on the MNE-resampled stim channel, ConvertToPth.py:87-96). The
    # reference then drops the FIRST found event unconditionally ("remove
    # first event, its useless", ConvertToPth.py:89); recordings carry a
    # session-start trigger before the stimulus train.
    events = (find_status_events(bdf.status) * up) // down
    events = events[events < sig.shape[1]]
    if len(events) > 0:
        events = events[1:]

    # 5) filters — on device, whole recording in one batched call
    if apply_bandpass or apply_notch:
        import jax.numpy as jnp

        from cerebra.signal.filters import (
            bandpass_notch_pipeline,
            design_notch,
            filtfilt,
            filtfilt_fft,
        )

        x = jnp.asarray(sig)
        if apply_bandpass:
            x = bandpass_notch_pipeline(
                x, sampling, band=band,
                notch=notch_freq if apply_notch else None,
                order=4, use_fft=use_device_filters,
            )
        else:  # notch only
            apply_fn = filtfilt_fft if use_device_filters else filtfilt
            x = apply_fn(design_notch(notch_freq, fs=sampling), x)
        sig = np.asarray(x, dtype=np.float32)

    # 6) drop EXG/Status channels
    keep = [i for i, n in enumerate(names) if n not in set(bad_channels)]
    kept_names = [names[i] for i in keep]
    sig = sig[keep]

    # 7) epoch slicing
    names_list, classes, wnids = load_stimulus_labels(sequence_file, mappings_file)
    n_expected = expected_samples if expected_samples is not None else len(names_list)
    C = sig.shape[0]
    eeg = np.zeros((n_expected, C, epoch_len), dtype=np.float32)
    added = 0
    for i, ev in enumerate(events[:n_expected]):
        seg = sig[:, ev : ev + epoch_len]
        eeg[i, :, : seg.shape[1]] = seg
        added += 1
    if added != n_expected:
        raise ValueError(f"expected {n_expected} stimulus events, found {added}")

    # 8) global per-channel stats (over all epochs × time, ConvertToPth:140)
    flat = eeg.transpose(0, 2, 1).reshape(-1, C)
    means = flat.mean(axis=0).astype(np.float32)
    stds = flat.std(axis=0).astype(np.float32)

    raw = RawCorpus(
        eeg=eeg,
        labels=np.asarray(classes[:n_expected], dtype=np.int32),
        image_idx=np.arange(n_expected, dtype=np.int32),
        subjects=np.full(n_expected, subject, dtype=np.int32),
        wnids=wnids,
        image_names=names_list[:n_expected],
        means=means,
        stddevs=stds,
    )
    save_corpus_pth(out_path, raw)
    return raw
