"""Training-layer tests: schedules vs reference formula, optimizer semantics,
EMA, checkpoints round-trip, end-to-end recipes learn on synthetic data."""

import optax
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from cerebra.data import make_synthetic_corpus
from cerebra.train import cosine_scheduler, ema_update, make_optimizer, per_param_clip
from cerebra.train.checkpoints import (
    export_dino_pth,
    import_dino_pth,
    restore_orbax,
    save_orbax,
    torch_state_dict_to_wrapped,
    wrapped_to_torch_state_dict,
)
from cerebra.train.recipes import (
    DinoSelfDistillConfig,
    FeatureDistillConfig,
    build_dino_models,
    dino_selfdistill_train,
    feature_distill_train,
)


def test_cosine_scheduler_reference_formula():
    s = cosine_scheduler(1.0, 0.1, epochs=4, niter_per_ep=10, warmup_epochs=1)
    assert len(s) == 40
    np.testing.assert_allclose(s[:10], np.linspace(0, 1.0, 10))
    iters = np.arange(30)
    want = 0.1 + 0.5 * (1.0 - 0.1) * (1 + np.cos(np.pi * iters / 30))
    np.testing.assert_allclose(s[10:], want)


def test_per_param_clip_is_per_parameter():
    tx = per_param_clip(1.0)
    grads = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([0.1])}
    clipped, _ = tx.update(grads, tx.init(None))
    np.testing.assert_allclose(np.asarray(clipped["a"]), [0.6, 0.8], rtol=1e-4)  # norm 5 → 1
    np.testing.assert_allclose(np.asarray(clipped["b"]), [0.1], rtol=1e-5)  # untouched


def test_ema_update():
    t = {"w": jnp.ones((3,))}
    s = {"w": jnp.zeros((3,))}
    out = ema_update(t, s, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)


def test_optimizer_zoo_builds_and_steps():
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    for name in ("adamw", "adam", "sgd", "rmsprop", "lars"):
        tx = make_optimizer(name, 1e-2, weight_decay=0.01, params_mask_source=params)
        st = tx.init(params)
        upd, _ = tx.update(grads, st, params)
        assert jax.tree.structure(upd) == jax.tree.structure(params)


@pytest.mark.slow
def test_feature_distill_learns_synthetic():
    corpus = make_synthetic_corpus(
        seed=0, n_per_class=10, n_classes=5, n_channels=8, n_samples=64,
        feature_dim=16, class_signal_scale=2.0,
    )
    n = corpus.n
    tr = np.arange(n) % 5 != 0
    va = ~tr
    cfg = FeatureDistillConfig(
        num_epochs=16, batch_size=8, validation_frequency=5,
        lstm_size=16, lstm_layers=1, warmup_teacher_temp_epochs=4,
        warmup_teacher_temp=1.0, teacher_temp=0.5,
    )
    state, hist = feature_distill_train(
        corpus.eeg[tr], corpus.image_features[tr], corpus.labels[tr],
        corpus.eeg[va], corpus.image_features[va], corpus.labels[va],
        config=cfg, log_fn=lambda s: None,
    )
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    # retrieval above chance (5 classes → chance recall ≈ top-k dependent but
    # a learning signal of scale 2 should give well above 20% hit-any-rate)
    last_recall = hist["recall"][-1][1]
    assert last_recall > 30.0
    assert hist["best"][0][0] >= 0


def test_dino_selfdistill_runs_and_updates():
    corpus = make_synthetic_corpus(
        seed=1, n_per_class=8, n_classes=4, n_channels=8, n_samples=96,
        class_signal_scale=1.0,
    )
    cfg = DinoSelfDistillConfig(
        epochs=2, batch_size_per_device=8, out_dim=32, embed_dim=16,
        lstm_layers=1, global_length=48, local_length=24, warmup_epochs=1,
    )
    state, hist = dino_selfdistill_train(corpus.eeg, config=cfg, log_fn=lambda s: None)
    assert int(state.step) == 2 * (corpus.n // 8)
    assert np.isfinite(hist["loss"]).all()
    # teacher moved away from init (EMA with m<1 applied)
    assert float(jnp.abs(state.center).sum()) > 0.0


def test_dino_pth_checkpoint_roundtrip(tmp_path):
    cfg = DinoSelfDistillConfig(out_dim=32, embed_dim=16, lstm_layers=2, global_length=48)
    backbone, head = build_dino_models(8, cfg)
    b = backbone.init(jax.random.key(0), jnp.zeros((1, 48, 8)), features_only=True)["params"]
    h = head.init(jax.random.key(1), jnp.zeros((1, 16)))["params"]
    wrapped = {"backbone": b, "head": h}
    center = np.random.default_rng(0).normal(size=(1, 32)).astype(np.float32)

    path = str(tmp_path / "checkpoint.pth")
    export_dino_pth(path, wrapped, wrapped, center, epoch=7)
    student, teacher, center2, epoch = import_dino_pth(path)
    np.testing.assert_allclose(center2, center)
    assert epoch == 8  # reference saves epoch+1 (LstmDistillation.py:638)

    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 48, 8)).astype(np.float32))
    out1 = head.apply({"params": h}, backbone.apply({"params": b}, x, features_only=True))
    out2 = head.apply(
        {"params": student["head"]},
        backbone.apply({"params": student["backbone"]}, x, features_only=True),
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    # torch-naming sanity: the reference eval loader strips "backbone." from
    # teacher keys (LstmDistillFromDinoV2Eval.py:309-313)
    sd = wrapped_to_torch_state_dict(wrapped)
    assert "backbone.lstm.weight_ih_l0" in sd
    assert "head.mlp.0.weight" in sd and "head.last_layer.weight_g" in sd
    back = torch_state_dict_to_wrapped(sd)
    np.testing.assert_allclose(
        np.asarray(back["head"]["last_layer"]["v"]), np.asarray(h["last_layer"]["v"]), atol=1e-7
    )


def test_orbax_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6).reshape(2, 3).astype(jnp.float32), "b": {"c": jnp.ones((4,))}}
    path = str(tmp_path / "ckpt")
    save_orbax(path, tree)
    back = restore_orbax(path)
    np.testing.assert_allclose(np.asarray(back["a"]), np.asarray(tree["a"]))
    np.testing.assert_allclose(np.asarray(back["b"]["c"]), 1.0)


@pytest.mark.slow
def test_dino_auto_resume(tmp_path):
    """Interrupt-and-resume: a run stopped after 1 epoch continues from its
    orbax checkpoint and lands at the same step count as an uninterrupted
    run (preemption-safe restarts, SURVEY.md §5 failure detection)."""
    from cerebra.data import make_synthetic_corpus
    from cerebra.train.resume import AutoResume

    corpus = make_synthetic_corpus(seed=2, n_per_class=8, n_classes=2, n_channels=8,
                                   n_samples=96)
    cfg = DinoSelfDistillConfig(
        epochs=2, batch_size_per_device=8, out_dim=16, embed_dim=8,
        lstm_layers=1, global_length=48, local_length=24, warmup_epochs=0,
    )
    d = str(tmp_path / "resume")
    r1 = AutoResume(d)
    s1, _ = dino_selfdistill_train(
        corpus.eeg, config=DinoSelfDistillConfig(**{**cfg.__dict__, "epochs": 1}),
        log_fn=lambda s: None, resume=r1,
    )
    assert r1.latest_step() == int(s1.step)
    # resume into a 2-epoch run: only epoch 1 should execute
    logs = []
    r2 = AutoResume(d)
    s2, hist = dino_selfdistill_train(
        corpus.eeg, config=cfg, log_fn=logs.append, resume=r2,
    )
    assert any("auto-resume" in l for l in logs)
    assert int(s2.step) == 2 * (corpus.n // 8)
    assert len(hist["loss"]) == 1  # only the remaining epoch ran


def test_sgd_rmsprop_coupled_weight_decay_matches_torch():
    """torch couples weight decay for SGD/RMSprop/Adam (L2 added to the grad
    BEFORE momentum/adaptive scaling); make_optimizer must reproduce that,
    not silently drop wd (it used to) nor apply adamw-style decoupled decay.
    Two steps so the momentum interaction with the decay term shows."""
    import torch

    rng = np.random.default_rng(3)
    w0 = rng.normal(size=(4, 4)).astype(np.float32)
    g1 = rng.normal(size=(4, 4)).astype(np.float32)
    g2 = rng.normal(size=(4, 4)).astype(np.float32)
    for name, torch_cls, kwargs in (
        ("sgd", torch.optim.SGD, dict(momentum=0.9)),
        ("rmsprop", torch.optim.RMSprop, dict(alpha=0.99, eps=1e-8)),
        ("adam", torch.optim.Adam, dict()),
    ):
        p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt = torch_cls([p], lr=1e-2, weight_decay=0.05, **kwargs)
        for g in (g1, g2):
            opt.zero_grad()
            p.grad = torch.from_numpy(g.copy())
            opt.step()
        want = p.detach().numpy()

        tx = make_optimizer(name, 1e-2, weight_decay=0.05)
        params = {"w": jnp.asarray(w0)}
        st = tx.init(params)
        for g in (g1, g2):
            upd, st = tx.update({"w": jnp.asarray(g)}, st, params)
            params = optax.apply_updates(params, upd)
        np.testing.assert_allclose(
            np.asarray(params["w"]), want, rtol=2e-4, atol=2e-6,
        )


def test_nan_loss_aborts_training():
    """The reference aborts on a non-finite loss (dino/main_dino.py:387-389);
    the whole-epoch scan must not keep burning epochs (and overwriting
    checkpoints) after the loss goes NaN."""
    from cerebra.train.recipes import FeatureDistillConfig, feature_distill_train

    rng = np.random.default_rng(0)
    eeg = rng.normal(size=(8, 32, 4)).astype(np.float32)
    eeg[0, 0, 0] = np.nan  # poison one sample → epoch-0 loss is NaN
    feats = rng.normal(size=(8, 16)).astype(np.float32)
    labels = np.arange(8, dtype=np.int32) % 2
    cfg = FeatureDistillConfig(num_epochs=3, batch_size=4, lstm_size=8,
                               lstm_layers=1, validation_frequency=0)
    with pytest.raises(FloatingPointError, match="Loss is nan"):
        feature_distill_train(eeg, feats, labels, eeg, feats, labels,
                              config=cfg, log_fn=lambda s: None)
