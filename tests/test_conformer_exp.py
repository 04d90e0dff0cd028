"""Conformer ExP trainer (utils/Conformer.py:222-417): S&R augmentation
semantics, .mat ingest parity, and the end-to-end recipe/CLI."""

import os

import jax
import numpy as np
import pytest

from cerebra.train.conformer_recipe import (
    ExPConfig,
    conformer_exp_train,
    load_bciiv_mat,
    make_interaug,
    make_synthetic_bciiv,
)


def _toy_corpus(seed=0, n_per_class=9, n_classes=4, C=3, T=40):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(n_per_class * n_classes, 1, C, T)).astype(np.float32)
    labels = np.repeat(np.arange(n_classes), n_per_class).astype(np.int64)
    # class-coded offset so provenance is detectable
    data += labels[:, None, None, None] * 10.0
    perm = rng.permutation(len(data))
    return data[perm], labels[perm]


def test_interaug_stitches_same_class_segments():
    """Every augmented trial of class c is built ONLY from class-c trials,
    and each temporal segment matches some source trial's SAME segment —
    the S&R contract (utils/Conformer.py:254-281)."""
    data, labels = _toy_corpus()
    n_segments, n_out = 8, 5
    interaug = make_interaug(data, labels, 4, n_out, n_segments)
    aug, aug_y = jax.jit(interaug)(jax.random.key(0))
    aug, aug_y = np.asarray(aug), np.asarray(aug_y)
    assert aug.shape == (4 * n_out, 1, 3, 40)
    assert sorted(np.bincount(aug_y).tolist()) == [n_out] * 4
    seg_len = 40 // n_segments
    for i in range(len(aug)):
        cls_trials = data[labels == aug_y[i]]
        for j in range(n_segments):
            seg = aug[i, ..., j * seg_len : (j + 1) * seg_len]
            src_segs = cls_trials[..., j * seg_len : (j + 1) * seg_len]
            match = np.isclose(src_segs, seg[None]).all(axis=(1, 2, 3))
            assert match.any(), f"aug trial {i} segment {j} has no source"


def test_interaug_preserves_distribution():
    """S&R recombines real segments, so per-class mean/std are preserved."""
    rng = np.random.default_rng(1)
    data = rng.normal(loc=2.0, scale=3.0, size=(120, 1, 4, 64)).astype(np.float32)
    labels = np.repeat(np.arange(4), 30).astype(np.int64)
    interaug = make_interaug(data, labels, 4, 200, 8)
    aug, aug_y = interaug(jax.random.key(1))
    aug = np.asarray(aug)
    assert abs(aug.mean() - data.mean()) < 0.05
    assert abs(aug.std() - data.std()) < 0.05


def test_interaug_randomizes_between_keys():
    data, labels = _toy_corpus(seed=2)
    interaug = make_interaug(data, labels, 4, 4, 8)
    a1, _ = interaug(jax.random.key(1))
    a2, _ = interaug(jax.random.key(2))
    assert not np.allclose(np.asarray(a1), np.asarray(a2))


def test_load_bciiv_mat_roundtrip(tmp_path):
    """Ingest parity: (time, electrode, trial) .mat layout → (N,1,C,T),
    1-based → 0-based labels, train-stat standardization of both splits
    (utils/Conformer.py:281-320)."""
    import scipy.io as sio

    rng = np.random.default_rng(3)
    C, T, N = 5, 50, 12
    train = rng.normal(loc=1.0, scale=2.0, size=(T, C, N))
    test = rng.normal(loc=1.0, scale=2.0, size=(T, C, 8))
    sio.savemat(tmp_path / "A03T.mat",
                {"data": train, "label": np.tile(np.arange(1, 5), 3)[None].T.reshape(1, -1).T})
    sio.savemat(tmp_path / "A03E.mat",
                {"data": test, "label": np.tile(np.arange(1, 5), 2)[None].T.reshape(1, -1).T})
    tr_x, tr_y, te_x, te_y = load_bciiv_mat(str(tmp_path), 3)
    assert tr_x.shape == (N, 1, C, T)
    assert te_x.shape == (8, 1, C, T)
    assert tr_y.min() == 0 and tr_y.max() == 3
    # standardized with train stats: train is exactly zero-mean/unit-std
    assert abs(tr_x.mean()) < 1e-5 and abs(tr_x.std() - 1.0) < 1e-4
    # raw layout preserved: trial 0 of train equals column 0 transposed
    want = (np.transpose(train, (2, 1, 0))[0] - train.mean()) / train.std()
    np.testing.assert_allclose(tr_x[0, 0], want, rtol=1e-5)


@pytest.mark.slow
def test_conformer_exp_cli_end_to_end(tmp_path):
    """CLI runs on the synthetic backend and learns above chance; writes the
    reference's log_subject{n}.txt and sub_result.txt artifacts."""
    from cerebra.cli.conformer_train import main

    results = main(
        ["--synthetic", "--subjects", "1", "--n_epochs", "8", "--batch_size", "16",
         "--depth", "1", "--emb_size", "20", "--out_features", "16",
         "--synthetic_per_class", "12", "--synthetic_channels", "6",
         "--synthetic_samples", "200", "--use_bf16", "false",
         "--log_dir", str(tmp_path), "--devices", "1"]
    )
    subject, best, aver = results[0]
    assert best > 0.3  # 4 classes, chance = 0.25
    log = (tmp_path / "log_subject1.txt").read_text()
    assert "The best accuracy is:" in log
    assert (tmp_path / "sub_result.txt").exists()
    assert (tmp_path / "conformer_subject1_orbax").exists()


def test_fused_patch_embed_matches_conv_pair():
    """The fused (C,25)-kernel patch embed must equal the reference's
    temporal+spatial conv pair exactly (same param tree, float-reassociation
    tolerance) — the round-4 conformer MXU lever."""
    import jax
    import jax.numpy as jnp

    from cerebra.models.conformer import PatchEmbedding

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 1, 22, 300)), jnp.float32)
    fused = PatchEmbedding(fused=True)
    plain = PatchEmbedding(fused=False)
    variables = plain.init(jax.random.key(0), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(
        fused.init(jax.random.key(0), x, train=False)
    )
    got = fused.apply(variables, x, train=False)
    want = plain.apply(variables, x, train=False)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
