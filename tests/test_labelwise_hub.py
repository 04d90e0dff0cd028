"""Oracles for the round-4 surface closures (VERDICT round 3 #6):

- cerebra.data.labelwise vs the reference Utilities class's own methods
  (load_data_label_wise / prepareEEGData / PrepapreDataforVis / CalcEEGMean,
  utils/Utilities.py:225-408) run on an equivalent fake dataset;
- cerebra.models.hub offline-safe weight resolution
  (dino/hubconf.py, utils/utils.py:71-129).
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_utilities():
    from tests._reference_stubs import stub_torchvision

    stub_torchvision()
    from cerebra.eval import faiss_stub

    faiss_stub.install()
    sys.path.insert(0, REFERENCE)
    try:
        from utils.Utilities import Utilities
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference Utilities not importable: {e}")
    finally:
        sys.path.remove(REFERENCE)
    return Utilities()


def _corpus(n=12, t=20, c=128, n_classes=3, feature_dim=8, seed=0):
    from cerebra.data.corpus import EEGCorpus
    from cerebra.data.schema import LabelCatalog

    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, size=n).astype(np.int32)
    wnids = [f"n{k:08d}" for k in range(n_classes)]
    return EEGCorpus(
        eeg=rng.normal(size=(n, t, c)).astype(np.float32),
        labels=labels,
        image_idx=np.arange(n, dtype=np.int32),
        subjects=np.zeros(n, dtype=np.int32),
        catalog=LabelCatalog.synthetic(wnids),
        image_names=[f"{wnids[labels[i]]}_{i}" for i in range(n)],
        image_features=rng.normal(size=(n, feature_dim)).astype(np.float32),
    )


class _FakeRefDataset:
    """Iterable with the reference 4/5-tuple sample contract + getImagePath
    (utils/PerilsEEGDataset.py:541-623, :157-166)."""

    def __init__(self, corpus, tuples=5):
        import torch

        self.corpus = corpus
        self.tuples = tuples
        self.torch = torch

    def getImagePath(self, i):
        return self.corpus.image_names[int(self.corpus.image_idx[i])]

    def __iter__(self):
        t = self.torch
        for i in range(self.corpus.n):
            eeg = t.from_numpy(np.asarray(self.corpus.eeg[i]))
            label = {"ClassId": int(self.corpus.labels[i])}
            image = t.full((3, 4, 4), float(i))  # distinct per sample
            img_f = t.from_numpy(np.asarray(self.corpus.image_features[i]))
            if self.tuples == 4:
                yield eeg, label, image, i
            else:
                yield eeg, label, image, i, img_f


def test_load_data_label_wise_matches_reference(ref_utilities):
    corpus = _corpus()
    ref = ref_utilities.load_data_label_wise(
        _FakeRefDataset(corpus, tuples=4), None, None, None,
        process_data_with_model=False,
    )
    from cerebra.data.labelwise import load_data_label_wise

    ours = load_data_label_wise(corpus)
    assert set(ref) == set(ours)
    for c in ref:
        assert ref[c]["images"] == ours[c]["images"]
        assert len(ref[c]["eeg"]) == len(ours[c]["eeg"])
        for a, b in zip(ref[c]["eeg"], ours[c]["eeg"]):
            np.testing.assert_array_equal(a.numpy(), b)
        assert all(p is None for p in ours[c]["pred_eeg"])


def test_prepare_eeg_data_matches_reference(ref_utilities):
    corpus = _corpus()
    ref_lw = ref_utilities.load_data_label_wise(
        _FakeRefDataset(corpus, tuples=4), None, None, None, False
    )
    ref_feats, ref_labels = ref_utilities.prepareEEGData(ref_lw)
    from cerebra.data.labelwise import load_data_label_wise, prepare_eeg_data

    feats, labels = prepare_eeg_data(load_data_label_wise(corpus))
    assert labels == ref_labels
    np.testing.assert_allclose(feats, ref_feats)


def test_prepare_data_for_vis_matches_reference(ref_utilities):
    corpus = _corpus()
    ref_lw, ref_feats, ref_labels, ref_imgf = ref_utilities.PrepapreDataforVis(
        _FakeRefDataset(corpus, tuples=5)
    )
    from cerebra.data.labelwise import prepare_data_for_vis

    images = np.stack(
        [np.full((3, 4, 4), float(i), np.float32) for i in range(corpus.n)]
    )
    lw, feats, labels, img_f = prepare_data_for_vis(corpus, images=images)
    assert labels == ref_labels
    np.testing.assert_allclose(feats, ref_feats)
    assert set(lw) == set(ref_lw)
    # the reference appends the sample's image TENSOR (:276) — pin content
    for c in ref_lw:
        assert len(ref_lw[c]["images"]) == len(lw[c]["images"])
        for a, b in zip(ref_lw[c]["images"], lw[c]["images"]):
            np.testing.assert_array_equal(a.numpy(), b)
    np.testing.assert_allclose(img_f, ref_imgf.numpy())

    # name-backed fallback (no pixel bank): image names, like
    # load_data_label_wise's imagePath slot
    lw_names, *_ = prepare_data_for_vis(corpus)
    for c in lw_names:
        assert all(isinstance(x, str) for x in lw_names[c]["images"])


def test_calc_eeg_mean_matches_reference(ref_utilities):
    corpus = _corpus()  # 128 channels: CalcEEGMean hardcodes torch.zeros(128)
    _, ref_means = ref_utilities.CalcEEGMean(_FakeRefDataset(corpus, tuples=5), image_size=4)
    from cerebra.data.labelwise import calc_eeg_mean

    ours = calc_eeg_mean(corpus)
    assert sorted(ours) == sorted(ref_means)
    for c in ours:
        np.testing.assert_allclose(
            ours[c]["eeg"]["mean"], ref_means[c]["eeg"]["mean"], rtol=1e-5, atol=1e-8
        )
        np.testing.assert_allclose(
            ours[c]["eeg"]["std"], ref_means[c]["eeg"]["std"], rtol=1e-4, atol=1e-8
        )


def test_calc_mean_matches_reference(ref_utilities):
    import torch

    corpus = _corpus()
    rng = np.random.default_rng(1)
    images = rng.uniform(size=(corpus.n, 3, 4, 4)).astype(np.float32)

    class WithImages(_FakeRefDataset):
        def __iter__(self):
            for i in range(self.corpus.n):
                yield (
                    torch.from_numpy(np.asarray(self.corpus.eeg[i])),
                    {"ClassId": int(self.corpus.labels[i])},
                    torch.from_numpy(images[i]),
                    i,
                    torch.zeros(2),
                )

    _, ref_means = ref_utilities.CalcMean(WithImages(corpus), image_size=4)
    from cerebra.data.labelwise import calc_mean

    ours = calc_mean(images, corpus.labels)
    for c in ours:
        np.testing.assert_allclose(ours[c]["mean"], ref_means[c]["mean"], rtol=1e-5)
        np.testing.assert_allclose(ours[c]["std"], ref_means[c]["std"], rtol=1e-4)


def test_plot_sample_eeg_channels(tmp_path):
    from cerebra.utils.plotting import plot_sample_eeg_channels

    out = tmp_path / "ch.png"
    plot_sample_eeg_channels(
        np.zeros((2, 16, 8)), [0, 3], save_figure=True, save_figure_name=str(out)
    )
    assert out.exists() and out.stat().st_size > 0


# ------------------------------------------------------------------- hub
def test_hub_registry_names_match_reference_hubconf():
    """Every in-scope hubconf constructor name resolves (dino/hubconf.py)."""
    from cerebra.models import hub

    for name in ("dino_vits16", "dino_vits8", "dino_vitb16", "dino_vitb8",
                 "dino_resnet50", "dinov2_vits14"):
        assert name in hub.HUB
    with pytest.raises(ValueError, match="unknown hub model"):
        hub.load("dino_nonexistent")
    # URL table parity with utils/utils.py:85-104 incl. the external xcit rows
    assert len(hub.PRETRAINED_URLS) == 9
    assert len(hub.LINEAR_URLS) == 5


@pytest.mark.slow  # one 12-block ViT init; registry/loader tests stay fast
def test_hub_offline_fallback_returns_random_weights(monkeypatch, capsys):
    """Zero-egress env + no cache → the reference's own 'random weights'
    message (utils/utils.py:109) and a working random init."""
    from cerebra.models import hub

    monkeypatch.delenv("CEREBRA_HUB_CACHE", raising=False)
    monkeypatch.setenv("CEREBRA_HUB_OFFLINE", "1")
    model, params = hub.dino_vits16(pretrained=True, img_size=32)
    assert "random weights" in capsys.readouterr().out
    assert params["patch_embed"]["kernel"].shape == (16, 16, 3, 384)


def test_load_pretrained_weights_local_checkpoint(tmp_path, capsys):
    """Local-file branch (utils/utils.py:72-82): checkpoint_key selection +
    module./backbone. stripping + flax import."""
    import torch

    from tests.test_dinov2_vit import _random_dinov2_state_dict

    rng = np.random.default_rng(0)
    sd = _random_dinov2_state_dict(rng, embed=32, depth=2, patch=14, grid=2)
    sd = {k: v for k, v in sd.items() if "ls1" not in k and "ls2" not in k}
    wrapped = {"teacher": {f"module.backbone.{k}": v for k, v in sd.items()}}
    path = tmp_path / "ckpt.pth"
    torch.save(wrapped, str(path))

    from cerebra.models.hub import load_pretrained_weights

    params = load_pretrained_weights(
        "vit_small", 16, pretrained_weights=str(path), checkpoint_key="teacher", depth=2
    )
    out = capsys.readouterr().out
    assert "Take key teacher" in out and "loaded" in out
    np.testing.assert_allclose(
        params["block_0"]["attn"]["qkv"]["kernel"],
        sd["blocks.0.attn.qkv.weight"].numpy().T,
    )


def test_load_pretrained_weights_cache_fallback(tmp_path, monkeypatch, capsys):
    """URL-table branch resolved from CEREBRA_HUB_CACHE by basename
    (utils/utils.py:84-107 without egress)."""
    import torch

    from tests.test_dinov2_vit import _random_dinov2_state_dict

    rng = np.random.default_rng(1)
    sd = _random_dinov2_state_dict(rng, embed=32, depth=2, patch=14, grid=2)
    sd = {k: v for k, v in sd.items() if "ls1" not in k and "ls2" not in k}
    torch.save(sd, str(tmp_path / "dino_deitsmall16_pretrain.pth"))
    monkeypatch.setenv("CEREBRA_HUB_CACHE", str(tmp_path))

    from cerebra.models.hub import load_pretrained_weights

    params = load_pretrained_weights("vit_small", 16, pretrained_weights="", depth=2)
    assert "reference pretrained DINO weights" in capsys.readouterr().out
    assert params["pos_embed"].shape == sd["pos_embed"].numpy().shape


def test_load_pretrained_linear_weights(tmp_path, monkeypatch, capsys):
    import torch

    w = torch.randn(10, 384)
    b = torch.randn(10)
    torch.save(
        {"state_dict": {"module.linear.weight": w, "module.linear.bias": b}},
        str(tmp_path / "dino_deitsmall16_linearweights.pth"),
    )
    monkeypatch.setenv("CEREBRA_HUB_CACHE", str(tmp_path))
    from cerebra.models.hub import load_pretrained_linear_weights

    dense = load_pretrained_linear_weights("vit_small", 16)
    assert "pretrained linear weights" in capsys.readouterr().out
    np.testing.assert_allclose(dense["kernel"], w.numpy().T)
    assert load_pretrained_linear_weights("vit_small", 99) is None
