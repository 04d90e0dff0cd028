"""Golden tests for the .pth corpus contract (ConvertToPth.py:170-201) and
corpus semantics (split/window/norm parity with the reference loaders)."""

import numpy as np
import pytest
import torch

from cerebra.data import (
    EEGCorpus,
    LabelCatalog,
    load_corpus_pth,
    make_synthetic_corpus,
    random_split_indices,
    save_corpus_pth,
)
from cerebra.data.schema import RawCorpus


def _tiny_raw(n=10, c=4, t=16, seed=0):
    rng = np.random.default_rng(seed)
    wnids = ["n01000001", "n01000002"]
    return RawCorpus(
        eeg=rng.normal(size=(n, c, t)).astype(np.float32),
        labels=(np.arange(n) % 2).astype(np.int32),
        image_idx=np.arange(n, dtype=np.int32),
        subjects=np.ones(n, dtype=np.int32),
        wnids=wnids,
        image_names=[f"{wnids[i % 2]}_{i:05d}" for i in range(n)],
        means=rng.normal(size=c).astype(np.float32),
        stddevs=rng.uniform(0.5, 2.0, size=c).astype(np.float32),
    )


def test_pth_roundtrip(tmp_path):
    raw = _tiny_raw()
    path = str(tmp_path / "corpus.pth")
    save_corpus_pth(path, raw)
    back = load_corpus_pth(path)
    np.testing.assert_allclose(back.eeg, raw.eeg, rtol=0, atol=0)
    np.testing.assert_array_equal(back.labels, raw.labels)
    np.testing.assert_array_equal(back.image_idx, raw.image_idx)
    assert back.wnids == raw.wnids
    assert back.image_names == raw.image_names
    np.testing.assert_allclose(back.means, raw.means)
    np.testing.assert_allclose(back.stddevs, raw.stddevs)


def test_pth_is_reference_shaped(tmp_path):
    """The saved dict must have the exact reference keys/types so the
    reference loaders (utils/PerilsEEGDataset.py:56-103) could consume it."""
    raw = _tiny_raw()
    path = str(tmp_path / "corpus.pth")
    save_corpus_pth(path, raw)
    loaded = torch.load(path, weights_only=False)
    assert set(loaded.keys()) == {"dataset", "labels", "images", "means", "stddevs"}
    rec = loaded["dataset"][0]
    assert set(rec.keys()) == {"eeg", "image", "label", "subject"}
    assert isinstance(rec["eeg"], torch.Tensor) and rec["eeg"].shape == (4, 16)
    assert isinstance(rec["image"], int) and isinstance(rec["label"], int)
    assert loaded["means"][0].shape == (1, 4)


def test_corpus_time_major_and_scalar_stats():
    raw = _tiny_raw()
    corpus = EEGCorpus.from_raw(raw)
    assert corpus.eeg.shape == (10, 16, 4)  # (N, T, C)
    np.testing.assert_allclose(corpus.eeg[0].T, raw.eeg[0], atol=0)
    # Perils scalar stats: mean over records of per-record mean/std
    # (utils/PerilsEEGDataset.py:90-103; torch .std() is ddof=1)
    t = torch.from_numpy(raw.eeg)
    expect_mean = float(np.mean([t[i].mean().item() for i in range(10)]))
    expect_std = float(np.mean([t[i].std().item() for i in range(10)]))
    assert abs(corpus.mean - expect_mean) < 1e-6
    assert abs(corpus.std - expect_std) < 1e-5


def test_window_and_channel_select():
    corpus = make_synthetic_corpus(n_per_class=2, n_classes=3, n_channels=8, n_samples=32)
    w = corpus.window(4, 20)
    assert w.eeg.shape == (6, 16, 8)
    np.testing.assert_allclose(w.eeg, corpus.eeg[:, 4:20, :])
    s = w.select_channels([1, 5])
    assert s.eeg.shape == (6, 16, 2)
    np.testing.assert_allclose(s.eeg[..., 0], w.eeg[..., 1])


def test_random_split_matches_torch_reference():
    """Exact parity with torch.utils.data.random_split(gen seed 43)
    (LstmDistillFromDinoV2Train.py:289-290)."""
    n = 57
    train_idx, val_idx = random_split_indices(n, [0.8, 0.2], seed=43)
    ds = torch.utils.data.TensorDataset(torch.arange(n))
    g = torch.Generator().manual_seed(43)
    tr, va = torch.utils.data.random_split(ds, [0.8, 0.2], generator=g)
    np.testing.assert_array_equal(np.array(tr.indices), train_idx)
    np.testing.assert_array_equal(np.array(va.indices), val_idx)
    assert len(set(train_idx) & set(val_idx)) == 0
    assert len(train_idx) + len(val_idx) == n


def test_label_forms():
    corpus = make_synthetic_corpus(n_per_class=2, n_classes=3)
    d = corpus.label_dict(0)
    assert set(d.keys()) == {"ClassId", "ClassName", "imagenetClassId"}
    assert d["ClassId"] == int(corpus.labels[0])
    onehot = corpus.onehot_labels()
    assert onehot.shape == (6, 3)
    np.testing.assert_array_equal(onehot.argmax(-1), corpus.labels)


def test_labels_txt_catalog(tmp_path):
    path = tmp_path / "labels.txt"
    path.write_text(
        "n01000002 12 xx yy tabby\n"
        "n01000001 7 zz padlock\n"
        "n09999999 1 unused\n"
    )
    cat = LabelCatalog.from_labels_txt(str(path), ["n01000001", "n01000002"])
    assert cat.class_id_to_str == {0: "padlock", 1: "tabby"}
    assert cat.class_str_to_id["tabby"] == 1
    assert cat.label_dict(0)["imagenetClassId"] == "7"


def test_subject_filtering(tmp_path):
    raw = _tiny_raw()
    raw.subjects[:4] = 2
    path = str(tmp_path / "c.pth")
    save_corpus_pth(path, raw)
    c2 = EEGCorpus.from_pth(path, subject=2)
    assert c2.n == 4
    call = EEGCorpus.from_pth(path, subject=0, exclude_subjects=[2])
    assert call.n == 6


def test_split_file(tmp_path):
    raw = _tiny_raw()
    path = str(tmp_path / "c.pth")
    save_corpus_pth(path, raw)
    split_path = str(tmp_path / "splits.pth")
    torch.save({"splits": [{"train": [0, 2, 4], "val": [1], "test": [3, 5]}]}, split_path)
    c = EEGCorpus.from_pth(path, split_path=split_path, subset="train", subject=1)
    assert c.n == 3
    np.testing.assert_array_equal(c.image_idx, [0, 2, 4])


def test_epoch_batches_small_corpus():
    """batch_size > n must wrap-pad, not crash (found by CLI probing)."""
    from cerebra.data.sampling import epoch_batches

    batches, mask = epoch_batches(7, 16, seed=0, epoch=0)
    assert batches.shape == (1, 16) and mask.shape == (1, 16)
    assert mask.sum() == 7
    assert set(batches.flatten()) == set(range(7))
    b2, m2 = epoch_batches(3, 16)
    assert b2.shape == (1, 16) and m2.sum() == 3
