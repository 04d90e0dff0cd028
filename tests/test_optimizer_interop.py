"""Optimizer-state `.pth` interop (utils/utils.py:152-184: the reference's
restart_from_checkpoint restores `optimizer` alongside student/teacher —
round 2 exported an empty slot, silently resetting Adam moments on resume).

Oracle: a REAL torch.optim.AdamW built with the reference's two param groups
(get_params_groups, utils/utils.py:636-647) must `load_state_dict` our
exported "optimizer" slot, and its moments must match ours; the torch
optimizer's own state_dict must then import back into optax unchanged.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cerebra.train.checkpoints import (
    adamw_state_from_torch,
    adamw_state_to_torch,
    export_dino_pth,
    import_dino_pth,
    wrapped_to_torch_state_dict,
)
from cerebra.train.recipes import DinoSelfDistillConfig, build_dino_models
from cerebra.train.steps import make_scheduled_optimizer


def _tiny_state():
    cfg = DinoSelfDistillConfig(
        out_dim=16, embed_dim=8, lstm_layers=2, global_length=12, local_length=8
    )
    backbone, head = build_dino_models(4, cfg)
    b = backbone.init(jax.random.key(0), jnp.zeros((1, 12, 4)), features_only=True)["params"]
    h = head.init(jax.random.key(1), jnp.zeros((1, 8)))["params"]
    params = {"backbone": b, "head": h}
    tx = make_scheduled_optimizer(
        "adamw", np.full((4,), 1e-3), np.full((4,), 0.04),
        params_mask_source=params, clip_grad=3.0,
    )
    opt_state = tx.init(params)
    # two updates so mu/nu are nonzero and count=2
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.1, params)
    for _ in range(2):
        updates, opt_state = tx.update(grads, opt_state, params)
    return params, tx, opt_state


def assert_restored(r_tree, o_tree):
    """Tree equality EXCEPT the frozen weight-norm gain g, which the
    checkpoint excludes (requires_grad semantics) — restored to zeros. (In a
    real run g's moments ARE zero via stop_gradient; _tiny_state feeds
    synthetic nonzero grads to every param, so the distinction shows.)"""
    assert "g" in r_tree["head"]["last_layer"] and "g" in o_tree["head"]["last_layer"]
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(r_tree),
        jax.tree_util.tree_leaves_with_path(o_tree),
    ):
        if any(getattr(k, "key", None) == "g" for k in pa):
            np.testing.assert_allclose(np.asarray(a), 0.0)
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.slow  # export direction; the import direction (reference .pth
# -> resumed training) stays in the fast suite below
def test_torch_adamw_loads_our_optimizer_slot(tmp_path):
    params, tx, opt_state = _tiny_state()
    opt_sd = adamw_state_to_torch(opt_state, lr=1e-3, weight_decay=0.04)

    # reconstruct the reference student: parameters in registration order,
    # two param groups (regularized / biases+1-D), EXCLUDING the frozen
    # weight-norm gain exactly like get_params_groups' requires_grad filter
    # does under the default norm_last_layer=True
    sd = wrapped_to_torch_state_dict(jax.tree.map(np.asarray, params))
    from cerebra.train.checkpoints import _grouped_param_names

    groups = _grouped_param_names(sd, frozen_gain=True)
    assert "head.last_layer.weight_g" not in [k for g in groups for k in g]
    torch_params = {
        k: torch.nn.Parameter(torch.from_numpy(np.ascontiguousarray(sd[k])))
        for g in groups
        for k in g
    }
    optimizer = torch.optim.AdamW(
        [
            {"params": [torch_params[k] for k in groups[0]]},
            {"params": [torch_params[k] for k in groups[1]], "weight_decay": 0.0},
        ],
        lr=1e-3, weight_decay=0.04,
    )
    optimizer.load_state_dict(opt_sd)  # the restart_from_checkpoint call

    # moments land on the right torch parameters
    from cerebra.train.checkpoints import _find_adam_state

    adam = _find_adam_state(opt_state)
    mu_sd = wrapped_to_torch_state_dict(jax.tree.map(np.asarray, adam.mu))
    name = "backbone.lstm.weight_ih_l0"
    got = optimizer.state[torch_params[name]]["exp_avg"].numpy()
    np.testing.assert_allclose(got, mu_sd[name], rtol=1e-6)
    assert float(optimizer.state[torch_params[name]]["step"]) == 2.0

    # torch's own state_dict imports back losslessly (before stepping: torch
    # mutates exp_avg in place and the export shares those buffers).
    # The frozen gain g is excluded from the checkpoint (requires_grad
    # semantics); in a real run its grads are stop_gradient-zero so its
    # moments are zero — here the synthetic grads were nonzero, so compare
    # everything EXCEPT g and assert g restored to (template) zeros.
    restored = adamw_state_from_torch(opt_sd, tx.init(params))
    r_adam = _find_adam_state(restored)
    assert_restored(r_adam.mu, adam.mu)
    assert_restored(r_adam.nu, adam.nu)
    assert int(r_adam.count) == int(adam.count)

    # a torch step must run (proves param_groups carry every required field)
    for p in torch_params.values():
        p.grad = torch.zeros_like(p)
    optimizer.step()


@pytest.mark.slow  # edge-case import; core roundtrip covered by
# test_export_import_dino_pth_roundtrips_optimizer in the fast suite
def test_import_tolerates_lazy_torch_state_and_unfrozen_gain(tmp_path):
    """Two real reference checkpoint shapes: (1) params whose grads were
    cancelled all run (freeze_last_layer) have ids but NO state entry —
    torch inits state lazily; the import falls back to zero moments.
    (2) norm_last_layer=False runs include weight_g — auto-detected from
    the id count."""
    params, tx, opt_state = _tiny_state()
    from cerebra.train.checkpoints import _find_adam_state

    # (1) drop the last id's state entry (simulates a frozen last layer)
    opt_sd = adamw_state_to_torch(opt_state, lr=1e-3, weight_decay=0.04)
    all_ids = [i for g in opt_sd["param_groups"] for i in g["params"]]
    dropped = all_ids[-1]
    del opt_sd["state"][dropped]
    restored = adamw_state_from_torch(opt_sd, tx.init(params))
    adam = _find_adam_state(restored)
    # the dropped param's moments are zero (template), the rest restored
    leaves = jax.tree.leaves(adam.mu)
    assert any(float(np.abs(np.asarray(a)).max()) > 0 for a in leaves)

    # (2) unfrozen gain: one extra id, still imports
    opt_sd2 = adamw_state_to_torch(opt_state, lr=1e-3, weight_decay=0.04,
                                   norm_last_layer=False)
    n2 = len([i for g in opt_sd2["param_groups"] for i in g["params"]])
    n1 = len(all_ids)
    assert n2 == n1 + 1
    restored2 = adamw_state_from_torch(opt_sd2, tx.init(params))
    a2 = _find_adam_state(restored2)
    assert int(a2.count) == 2


@pytest.mark.slow  # edge-case import (mixed lazy step counts); the core
# import path runs fast via test_export_import_dino_pth_roundtrips_optimizer
def test_import_takes_max_step_across_lazy_param_states():
    """torch inits per-param state lazily, so params frozen for part of the
    run carry SMALLER step counters; the single optax count must restore to
    the max (the true step count), not whichever id iterates last
    (ADVICE round 3)."""
    import torch

    params, tx, opt_state = _tiny_state()
    from cerebra.train.checkpoints import _find_adam_state

    opt_sd = adamw_state_to_torch(opt_state, lr=1e-3, weight_decay=0.04)
    all_ids = sorted(i for g in opt_sd["param_groups"] for i in g["params"])
    # the LAST-iterated ids lag (e.g. last layer unfrozen late in the run)
    for pid in all_ids[len(all_ids) // 2:]:
        opt_sd["state"][pid]["step"] = torch.tensor(1.0)
    restored = adamw_state_from_torch(opt_sd, tx.init(params))
    assert int(_find_adam_state(restored).count) == 2  # max, not last-wins


def test_export_import_dino_pth_roundtrips_optimizer(tmp_path):
    params, tx, opt_state = _tiny_state()
    center = np.zeros((1, 16), np.float32)
    path = str(tmp_path / "checkpoint.pth")
    export_dino_pth(
        path, jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, params),
        center, epoch=3, opt_state=opt_state, lr=1e-3, weight_decay=0.04,
    )
    student, teacher, c2, epoch, restored = import_dino_pth(
        path, opt_state_template=tx.init(params)
    )
    assert epoch == 4
    from cerebra.train.checkpoints import _find_adam_state

    adam, r_adam = _find_adam_state(opt_state), _find_adam_state(restored)
    assert int(r_adam.count) == int(adam.count) == 2
    assert_restored(r_adam.mu, adam.mu)
    # and the restored state must actually drive another optimizer step
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.1, params)
    updates, _ = tx.update(grads, restored, params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(updates))


@pytest.mark.slow  # end-to-end resume-through-training (16 s on 1 vCPU);
# schedule fast-forward + optimizer roundtrip stay in the fast suite
def test_recipe_resumes_through_training_from_reference_pth(tmp_path):
    """The restart_from_checkpoint contract end-to-end: train → export the
    reference-layout checkpoint → resume a fresh recipe run FROM that .pth
    and train a further epoch. The resumed run starts at the saved epoch
    with restored Adam moments (nonzero count) and keeps training."""
    import jax.numpy as jnp

    from cerebra.train.checkpoints import _find_adam_state
    from cerebra.train.recipes import DinoSelfDistillConfig, dino_selfdistill_train

    rng = np.random.default_rng(0)
    eeg = rng.normal(size=(16, 32, 4)).astype(np.float32)
    cfg = DinoSelfDistillConfig(
        epochs=2, batch_size_per_device=8, out_dim=16, embed_dim=8,
        lstm_layers=1, global_length=16, local_length=8, warmup_epochs=0,
    )
    state, _ = dino_selfdistill_train(eeg, config=cfg, log_fn=lambda s: None)
    path = str(tmp_path / "checkpoint.pth")
    export_dino_pth(
        path,
        jax.tree.map(np.asarray, state.student_params),
        jax.tree.map(np.asarray, state.teacher_params),
        np.asarray(state.center), epoch=1,  # export writes epoch+1 = 2
        opt_state=state.opt_state,
    )
    cfg3 = DinoSelfDistillConfig(
        epochs=3, batch_size_per_device=8, out_dim=16, embed_dim=8,
        lstm_layers=1, global_length=16, local_length=8, warmup_epochs=0,
    )
    state2, hist = dino_selfdistill_train(
        eeg, config=cfg3, log_fn=lambda s: None, resume_pth=path
    )
    assert len(hist["loss"]) == 1  # epochs 2..3 only
    assert np.isfinite(hist["loss"]).all()
    niter = 16 // 8
    assert int(state2.step) == 3 * niter
    adam = _find_adam_state(state2.opt_state)
    assert int(adam.count) > niter  # moments carried over, not reset
    # the resumed run actually started from the exported weights
    w0 = np.asarray(state.student_params["backbone"]["lstm"]["w_ih_l0"])
    w2 = np.asarray(state2.student_params["backbone"]["lstm"]["w_ih_l0"])
    assert not np.allclose(w0, w2)  # it trained further
    assert np.abs(w0 - w2).max() < 0.3  # ...from w0, not from a fresh init


def test_resume_fast_forwards_schedule_counts():
    """lr/wd schedules are evaluated at InjectHyperparamsState.count
    (steps.py inject_hyperparams wrapper), NOT at the Adam moment count —
    a resume that restored only ScaleByAdamState silently replayed the
    warmup schedule from step 0."""
    import optax

    params, tx, opt_state = _tiny_state()
    opt_sd = adamw_state_to_torch(opt_state, lr=1e-3, weight_decay=0.04)

    # a RAMP schedule so the replay would be visible in the applied lr
    lr_sched = np.array([1e-4, 2e-4, 3e-4, 4e-4], np.float32)
    wd_sched = np.array([0.01, 0.02, 0.03, 0.04], np.float32)
    tx2 = make_scheduled_optimizer(
        "adamw", lr_sched, wd_sched, params_mask_source=params, clip_grad=3.0
    )
    restored = adamw_state_from_torch(opt_sd, tx2.init(params))

    def find_inject(state):
        # optax names this InjectHyperparamsState or (newer)
        # InjectStatefulHyperparamsState — match on the fields
        if hasattr(state, "_fields") and "hyperparams" in state._fields:
            return state
        if isinstance(state, tuple):
            for x in state:
                r = find_inject(x)
                if r is not None:
                    return r
        return None

    inj = find_inject(restored)
    assert inj is not None and int(inj.count) == 2

    # the post-resume step must use schedule index 2, not 0
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.1, params)
    _, new_state = tx2.update(grads, restored, params)
    inj2 = find_inject(new_state)
    np.testing.assert_allclose(float(inj2.hyperparams["learning_rate"]), lr_sched[2])
    np.testing.assert_allclose(float(inj2.hyperparams["weight_decay"]), wd_sched[2])
