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


def _manual_bdf(path, channels):
    """Write a minimal BDF with explicit per-channel (phys_min, phys_max,
    dig_min, dig_max, samples[int]) — exercises reader paths the symmetric
    write_raw_bdf never produces (DC offset, inverted polarity)."""
    C = len(channels)
    T = len(channels[0][4])

    def f(s, w):
        return str(s)[:w].ljust(w).encode("ascii")

    hdr = bytearray()
    hdr += bytes([0xFF]) + f("BIOSEMI", 7)
    hdr += f("p", 80) + f("r", 80) + f("01.01.20", 8) + f("00.00.00", 8)
    hdr += f(256 * (1 + C), 8) + f("24BIT", 44)
    hdr += f(1, 8) + f(1, 8) + f(C, 4)
    for field, width in (
        (lambda c: f"ch", 16), (lambda c: "t", 80), (lambda c: "uV", 8),
        (lambda c: c[0], 8), (lambda c: c[1], 8),
        (lambda c: c[2], 8), (lambda c: c[3], 8),
        (lambda c: "none", 80), (lambda c: T, 8), (lambda c: "", 32),
    ):
        for c in channels:
            hdr += f(field(c), width)
    body = bytearray()
    for c in channels:
        for v in c[4]:
            u = v & 0xFFFFFF
            body += bytes([u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF])
    with open(path, "wb") as fh:
        fh.write(bytes(hdr) + bytes(body))


def test_bdf_affine_offset_and_inverted_polarity(tmp_path):
    """The spec's full dig→physical map (phys = (dig−dig_min)·gain +
    phys_min): asymmetric ranges carry a DC offset, and dig_min > dig_max
    (EDF sign-flip convention) must yield a negative gain, not a clamped
    denominator."""
    path = str(tmp_path / "m.bdf")
    digs = [-1000, 0, 500, 1000]
    _manual_bdf(path, [
        (-100, 300, -1000, 1000, digs),   # gain 0.2, offset +100
        (-100, 300, 1000, -1000, digs),   # inverted: gain -0.2, offset +100
        (0, 0, 0, 0, digs),               # degenerate: raw digital values
    ])
    bdf = read_raw_bdf(path)
    d = np.asarray(digs, dtype=np.float64)
    np.testing.assert_allclose(bdf.signals[0], d * 0.2 + 100.0, rtol=1e-6)
    np.testing.assert_allclose(bdf.signals[1], d * -0.2 + 100.0, rtol=1e-6)
    np.testing.assert_allclose(bdf.signals[2], d, rtol=1e-6)

    from cerebra.data import native_bdf

    if native_bdf.available():
        nat = native_bdf.read_raw_bdf(path)
        # not assert_array_equal: g++ may contract v*gain+offset into an FMA,
        # shifting exact-zero results by ~1e-15 vs numpy's two-step rounding
        np.testing.assert_allclose(nat.signals, bdf.signals, atol=1e-9)
