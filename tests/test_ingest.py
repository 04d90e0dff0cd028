"""Ingest tests: BDF round-trip with the pure-numpy reader/writer, full
convert pipeline on a synthetic recording (event slicing, stats, .pth)."""

import numpy as np
import pytest

from cerebra.data.bdf import BDFData, read_raw_bdf, write_raw_bdf
from cerebra.data.ingest import STATUS_EVENT, convert_bdf_to_pth, find_status_events
from cerebra.data.schema import load_corpus_pth


def _make_recording(tmp_path, n_eeg=8, fs=256, seconds=30, n_events=8):
    rng = np.random.default_rng(0)
    T = fs * seconds
    names = [f"A{i+1}" for i in range(n_eeg)] + ["EXG1", "EXG2"]
    sig = rng.normal(0, 20.0, size=(len(names), T)).astype(np.float32)
    status = np.zeros(T, dtype=np.int64)
    starts = np.linspace(fs, T - fs * 3, n_events).astype(int)
    for s in starts:
        status[s : s + 10] = STATUS_EVENT
    path = str(tmp_path / "rec.bdf")
    write_raw_bdf(path, sig, names, fs, status=status)
    return path, sig, names, status, starts


def test_bdf_roundtrip(tmp_path):
    path, sig, names, status, _ = _make_recording(tmp_path)
    bdf = read_raw_bdf(path)
    assert bdf.channel_names[: len(names)] == names
    assert bdf.sample_rate == 256.0
    # 24-bit quantization of ±262144 range → lsb = 0.0625 µV
    np.testing.assert_allclose(bdf.signals[: len(names), : sig.shape[1]], sig, atol=0.04)
    np.testing.assert_array_equal(bdf.status[: len(status)], status & 0xFFFF)


def test_native_bdf_reader_matches_python(tmp_path):
    """The C++ data-loader (native/bdf_reader.cpp, multithreaded 24-bit
    decode) returns bit-identical signals/labels/status/rate to the
    pure-numpy reader."""
    from cerebra.data import native_bdf

    if not native_bdf.available():
        pytest.skip("no C++ toolchain")
    path, _, _, _, _ = _make_recording(tmp_path)
    py = read_raw_bdf(path)
    nat = native_bdf.read_raw_bdf(path)
    assert nat.channel_names == py.channel_names
    assert nat.sample_rate == py.sample_rate
    np.testing.assert_array_equal(nat.signals, py.signals)
    np.testing.assert_array_equal(nat.status, py.status)


def test_find_status_events():
    status = np.zeros(100, dtype=np.int64)
    status[10:14] = STATUS_EVENT
    status[50:52] = STATUS_EVENT
    ev = find_status_events(status)
    np.testing.assert_array_equal(ev, [10, 50])


def test_convert_bdf_to_pth_pipeline(tmp_path):
    fs, n_events = 256, 8
    path, sig, names, status, starts = _make_recording(tmp_path, fs=fs, n_events=n_events + 1)
    # stimulus tables for the synthetic recording
    import pickle

    wnids = ["n01000001", "n01000002"]
    mapping = {f"{wnids[i % 2]}_{i:04d}": i % 2 for i in range(n_events)}
    mfile = str(tmp_path / "image.pkl")
    with open(mfile, "wb") as f:
        pickle.dump(mapping, f)
    sfile = str(tmp_path / "seq.txt")
    with open(sfile, "w") as f:
        for k in mapping:
            f.write(k + ".JPEG\n")

    out = str(tmp_path / "out.pth")
    raw = convert_bdf_to_pth(
        path, out, subject=3,
        sequence_file=sfile, mappings_file=mfile,
        reference_channels=(0, 1),
        downsample_ratio=0.5,
        down_ratio_for_timesamples=4,
        apply_bandpass=True, band=(4.0, 40.0),
        bad_channels=("EXG1", "EXG2", "Status"),
        expected_samples=n_events,
    )
    # 256 Hz × 0.5 = 128 Hz; epoch = 128 // 4 = 32 samples; EXG dropped
    assert raw.eeg.shape == (n_events, 8, 32)
    assert raw.means.shape == (8,) and raw.stddevs.shape == (8,)
    assert list(raw.subjects) == [3] * n_events
    back = load_corpus_pth(out)
    np.testing.assert_allclose(back.eeg, raw.eeg, rtol=1e-6)
    assert back.wnids == wnids


def test_reference_stimulus_assets_load():
    from cerebra.data.ingest import load_stimulus_labels, IMAGE_RAPID_SEQUENCE

    names, classes, wnids = load_stimulus_labels(IMAGE_RAPID_SEQUENCE)
    assert len(names) == 2000  # 2000 stimuli (SURVEY.md §2.1)
    assert len(wnids) == 40  # 40 ImageNet classes
    assert all(0 <= c < 40 for c in classes)
