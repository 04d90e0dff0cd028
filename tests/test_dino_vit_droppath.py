"""Student stochastic depth in the main_dino recipe (dino/main_dino.py:105
default 0.1, applied to the student only, :183-190 — the teacher is built
without drop path)."""

import numpy as np
import pytest


def _train(drop_path_rate, epochs=2):
    from cerebra.train.dino_vit import DinoVitConfig, dino_vit_train

    rng = np.random.default_rng(0)
    eeg = rng.normal(size=(8, 48, 8)).astype(np.float32)
    cfg = DinoVitConfig(
        arch="vit_tiny", patch_size=16, out_dim=32, epochs=epochs,
        batch_size_per_device=4, global_size=32, local_size=16,
        local_crops_number=2, warmup_epochs=0, drop_path_rate=drop_path_rate,
    )
    return dino_vit_train(eeg, None, config=cfg, log_fn=lambda s: None)


@pytest.mark.slow  # two full recipe compiles (dpr on/off)
def test_student_drop_path_changes_training_and_stays_finite():
    _, hist0 = _train(0.0)
    _, hist1 = _train(0.9)  # heavy stochastic depth: must actually engage
    assert np.isfinite(hist0["loss"]).all()
    assert np.isfinite(hist1["loss"]).all()
    # the per-sample residual-branch mask must change the training
    # trajectory; identical losses would mean the mask never engaged
    assert not np.allclose(hist0["loss"], hist1["loss"])


def test_student_dropout_keys_differ_per_view_group():
    """ADVICE r4: two student view groups with the SAME token height must get
    distinct drop-path rng (the reference draws fresh randomness per
    forward) — the per-group fold_in in make_dino_step's stochastic path."""
    import jax
    import jax.numpy as jnp
    import optax

    from cerebra.train.steps import DinoTrainState, make_dino_step

    E, D = 4, 8

    def backbone_apply(p, x):
        return x.reshape(x.shape[0], -1) @ p["params"]["w"]

    def head_apply(p, f):
        return f @ p["params"]["wh"]

    seen = []

    def student_apply(p, x, key):
        seen.append(key)  # concrete at trace time: key flows from outside grad
        return backbone_apply(p, x)

    params = {
        "backbone": {"w": jnp.ones((6, E)) * 0.1},
        "head": {"wh": jnp.ones((E, D)) * 0.1},
    }
    tx = optax.sgd(0.1)

    def view_fn(key, batch):  # two groups with IDENTICAL view shapes
        return [batch[:, :2].swapaxes(0, 1), batch[:, 2:4].swapaxes(0, 1)]

    step = make_dino_step(
        backbone_apply, head_apply, tx,
        lr_schedule=jnp.ones(10) * 0.1, wd_schedule=jnp.zeros(10),
        momentum_schedule=jnp.full(10, 0.99),
        teacher_temp_by_epoch=jnp.full(10, 0.04), niter_per_ep=5,
        view_fn=view_fn, jit=False, student_backbone_apply=student_apply,
    )
    state = DinoTrainState(
        step=jnp.zeros([], jnp.int32), student_params=params,
        teacher_params=jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params), center=jnp.zeros((1, D)),
    )
    batch = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4, 2, 3)), jnp.float32)
    new_state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert len(seen) == 2
    k0, k1 = (np.asarray(jax.random.key_data(k)) for k in seen[:2])
    assert not np.array_equal(k0, k1)


def test_main_dino_cli_exposes_reference_drop_path_flag():
    import cerebra.cli.main_dino as cli

    # the reference flag and its default (dino/main_dino.py:105)
    import argparse
    import unittest.mock as mock

    seen = {}
    real_add = argparse.ArgumentParser.add_argument

    def spy(self, *a, **k):
        if a and a[0] == "--drop_path_rate":
            seen["default"] = k.get("default")
        return real_add(self, *a, **k)

    with mock.patch.object(argparse.ArgumentParser, "add_argument", spy):
        with pytest.raises(SystemExit):
            cli.main(["--help"])
    assert seen.get("default") == 0.1


def test_use_fused_kernels_auto_resolve_by_backend():
    """use_fused_mlp/use_fused_attn=None (the round-5 defaults) mean auto:
    fused on a real TPU (+51.8% recipe throughput combined, BENCH_AUX round
    5), XLA elsewhere — hermetic CPU tests and the virtual-device dryrun
    must stay unfused."""
    from cerebra.train.dino_vit import DinoVitConfig, build_vit

    auto = build_vit(DinoVitConfig(arch="vit_tiny"))
    assert auto.use_fused_mlp is False  # conftest pins the cpu backend
    assert auto.use_fused_attn is False
    forced = build_vit(
        DinoVitConfig(arch="vit_tiny", use_fused_mlp=True, use_fused_attn=True)
    )
    assert forced.use_fused_mlp is True
    assert forced.use_fused_attn is True


def test_fused_block_composes_drop_path_like_plain():
    """With drop_path active and train=True the fused half-blocks stay
    engaged: the kernel output's residual delta (out - x) is re-masked
    outside the kernel with the SAME per-sample stochastic-depth draw as
    the plain path (rng order parity), so fused and plain blocks agree
    under an identical dropout key. Matches dino/vision_transformer.py
    Block + drop_path (:95-132) semantics."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cerebra.models.vit import Block

    D, H, B, N = 64, 2, 4, 40
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    plain = Block(D, H, drop_path=0.5)
    fused = Block(D, H, drop_path=0.5, use_fused_mlp=True, use_fused_attn=True)
    params = plain.init(jax.random.key(0), x, False, False)["params"]
    key = jax.random.key(3)
    want = plain.apply({"params": params}, x, True, False, rngs={"dropout": key})
    got = fused.apply({"params": params}, x, True, False, rngs={"dropout": key})
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # a fresh key must actually drop some samples (mask is live, not a no-op)
    other = fused.apply(
        {"params": params}, x, True, False, rngs={"dropout": jax.random.key(4)}
    )
    assert float(jnp.abs(other - want).max()) > 1e-3
