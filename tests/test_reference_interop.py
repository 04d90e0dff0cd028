"""Cross-interop proof: corpora WE write are loadable by the REFERENCE's own
dataset class, and its __getitem__ EEG matches our EEGCorpus windows exactly.

The reference tree is mounted read-only at /root/reference (public untrusted
research code — we import its loader class purely as a parity oracle). The
whole module skips when the reference or its dependencies are absent.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)


from tests._reference_stubs import stub_torchvision as _stub_torchvision


@pytest.fixture(scope="module")
def reference_dataset_cls(tmp_path_factory):
    """Import the reference PerilsEEGDataset (needs an images_root with
    labels.txt; its ctor only reads the label table)."""
    try:
        _stub_torchvision()
        sys.path.insert(0, REFERENCE)
        from utils.PerilsEEGDataset import EEGDataset  # noqa: PLC0415
    except Exception as e:  # missing torch extras etc.
        pytest.skip(f"reference loader not importable: {e}")
    finally:
        sys.path.remove(REFERENCE)
    return EEGDataset


def test_reference_loader_reads_our_pth(tmp_path, reference_dataset_cls):
    from cerebra.data import EEGCorpus, make_synthetic_corpus, save_corpus_pth
    from cerebra.data.schema import RawCorpus

    rng = np.random.default_rng(0)
    n, c, t = 12, 6, 40
    wnids = ["n01000001", "n01000002", "n01000003"]
    raw = RawCorpus(
        eeg=rng.normal(size=(n, c, t)).astype(np.float32),
        labels=(np.arange(n) % 3).astype(np.int32),
        image_idx=np.arange(n, dtype=np.int32),
        subjects=np.ones(n, dtype=np.int32),
        wnids=wnids,
        image_names=[f"{wnids[i % 3]}_{i:05d}" for i in range(n)],
        means=rng.normal(size=c).astype(np.float32),
        stddevs=rng.uniform(0.5, 2.0, size=c).astype(np.float32),
    )
    pth = str(tmp_path / "ours.pth")
    save_corpus_pth(pth, raw)

    # images_root with the labels.txt table the reference ctor parses and a
    # tiny JPEG per stimulus (the reference __getitem__ opens them)
    images_root = tmp_path / "images"
    images_root.mkdir()
    (images_root / "labels.txt").write_text(
        "n01000001 1 padlock\nn01000002 2 tabby\nn01000003 3 banjo\n"
    )
    from PIL import Image

    for name in raw.image_names:
        d = images_root / name.split("_")[0]
        d.mkdir(exist_ok=True)
        Image.new("RGB", (8, 8)).save(str(d / f"{name}.JPEG"))

    time_low, time_high = 5, 35
    ref_ds = reference_dataset_cls(
        eeg_signals_path=pth,
        eeg_splits_path=None,
        subject=1,
        time_low=time_low,
        time_high=time_high,
        imagesRoot=str(images_root),
    )
    assert len(ref_ds) == n

    ours = EEGCorpus.from_pth(pth, labels_txt=str(images_root / "labels.txt")).window(
        time_low, time_high
    )
    for i in (0, 3, n - 1):
        ref_eeg, ref_label, _image, idx, _feat = (
            ref_ds.subsetData and ref_ds[i]
        )  # 5-tuple contract
        np.testing.assert_allclose(
            np.asarray(ref_eeg), ours.eeg[i], rtol=1e-6, atol=1e-6
        )
        assert ref_label["ClassId"] == int(ours.labels[i])
        assert ref_label["ClassName"] == ours.label_dict(i)["ClassName"]
        assert idx == i
    # Perils scalar stats agree (utils/PerilsEEGDataset.py:90-103)
    assert abs(float(ref_ds.mean) - ours.mean) < 1e-5
    assert abs(float(ref_ds.std) - ours.std) < 1e-4


def test_reference_loader_reads_our_ingest_output(tmp_path, reference_dataset_cls):
    """End-to-end: BDF → our converter → reference loader."""
    import pickle

    from cerebra.data.bdf import write_raw_bdf
    from cerebra.data.ingest import STATUS_EVENT, convert_bdf_to_pth

    rng = np.random.default_rng(1)
    fs, n_events = 256, 6
    T = fs * 30
    names = [f"A{i+1}" for i in range(8)] + ["EXG1", "EXG2"]
    sig = rng.normal(0, 20.0, size=(len(names), T)).astype(np.float32)
    status = np.zeros(T, dtype=np.int64)
    for s in np.linspace(fs, T - fs * 4, n_events + 1).astype(int):
        status[s : s + 10] = STATUS_EVENT
    bdf = str(tmp_path / "rec.bdf")
    write_raw_bdf(bdf, sig, names, fs, status=status)

    wnids = ["n01000001", "n01000002"]
    mapping = {f"{wnids[i % 2]}_{i:04d}": i % 2 for i in range(n_events)}
    with open(tmp_path / "image.pkl", "wb") as f:
        pickle.dump(mapping, f)
    seq = tmp_path / "seq.txt"
    seq.write_text("".join(k + ".JPEG\n" for k in mapping))

    out = str(tmp_path / "converted.pth")
    convert_bdf_to_pth(
        bdf, out, subject=2, sequence_file=str(seq),
        mappings_file=str(tmp_path / "image.pkl"), reference_channels=(0, 1),
        apply_bandpass=False, bad_channels=("EXG1", "EXG2", "Status"),
        expected_samples=n_events,
    )

    images_root = tmp_path / "images"
    images_root.mkdir()
    images_root.joinpath("labels.txt").write_text(
        "n01000001 1 padlock\nn01000002 2 tabby\n"
    )
    from PIL import Image

    for name in mapping:
        d = images_root / name.split("_")[0]
        d.mkdir(exist_ok=True)
        Image.new("RGB", (8, 8)).save(str(d / f"{name}.JPEG"))
    ref_ds = reference_dataset_cls(
        eeg_signals_path=out, eeg_splits_path=None, subject=2,
        time_low=0, time_high=32, imagesRoot=str(images_root),
    )
    assert len(ref_ds) == n_events
    eeg0, label0, _img, _i, _f = ref_ds[0]
    assert tuple(np.asarray(eeg0).shape) == (32, 8)  # (T, C) sample contract
    assert label0["ClassName"] in ("padlock", "tabby")
