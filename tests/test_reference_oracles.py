"""Parity oracles: run the REFERENCE's own infra functions (mounted read-only
at /root/reference) against ours — schedules, per-param clipping, LARS — so
behavioral claims are pinned to the actual reference code, not to our reading
of it."""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_utils():
    sys.path.insert(0, REFERENCE)
    try:
        from utils import utils as ref  # noqa: PLC0415
    except Exception as e:
        pytest.skip(f"reference utils not importable: {e}")
    finally:
        sys.path.remove(REFERENCE)
    return ref


def test_cosine_scheduler_matches_reference(ref_utils):
    from cerebra.train.schedules import cosine_scheduler

    for kwargs in (
        dict(base_value=0.5, final_value=1e-6, epochs=10, niter_per_ep=7, warmup_epochs=2),
        dict(base_value=0.996, final_value=1.0, epochs=5, niter_per_ep=13),
        dict(base_value=0.04, final_value=0.4, epochs=3, niter_per_ep=20),
    ):
        ours = cosine_scheduler(**kwargs)
        theirs = ref_utils.cosine_scheduler(**kwargs)
        np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_per_param_clip_matches_reference(ref_utils):
    """clip_gradients (utils/utils.py:132-141) vs our per_param_clip optax
    transform — same per-parameter norms after clipping."""
    import torch

    import jax.numpy as jnp

    from cerebra.train.optim import per_param_clip

    rng = np.random.default_rng(0)
    shapes = [(4, 6), (10,), (3, 3, 3)]
    grads_np = [rng.normal(scale=3.0, size=s).astype(np.float32) for s in shapes]

    # reference path: torch params with .grad, clip in place
    model = torch.nn.ParameterList(
        [torch.nn.Parameter(torch.zeros(s)) for s in shapes]
    )
    for p, g in zip(model, grads_np):
        p.grad = torch.from_numpy(g.copy())
    ref_utils.clip_gradients(model, clip=2.0)
    ref_clipped = [p.grad.numpy() for p in model]

    tx = per_param_clip(2.0)
    ours, _ = tx.update([jnp.asarray(g) for g in grads_np], tx.init(None))
    for a, b in zip(ours, ref_clipped):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-5, atol=1e-6)


def test_lars_matches_reference_single_step(ref_utils):
    """One LARS step, reference implementation (utils/utils.py:557-595,
    momentum 0.9, eta 0.001) vs optax.lars configured the same way."""
    import torch

    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(1)
    w_np = rng.normal(size=(8, 4)).astype(np.float32)
    g_np = rng.normal(size=(8, 4)).astype(np.float32)
    lr, wd = 0.1, 0.01

    p = torch.nn.Parameter(torch.from_numpy(w_np.copy()))
    opt = ref_utils.LARS([p], lr=lr, weight_decay=wd, momentum=0.9, eta=0.001)
    p.grad = torch.from_numpy(g_np.copy())
    opt.step()
    ref_w = p.detach().numpy()

    tx = optax.lars(
        learning_rate=lr, weight_decay=wd, momentum=0.9, trust_coefficient=0.001,
        nesterov=False,
    )
    params = {"w": jnp.asarray(w_np)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g_np)}, state, params)
    ours_w = np.asarray(optax.apply_updates(params, updates)["w"])
    np.testing.assert_allclose(ours_w, ref_w, rtol=1e-4, atol=1e-6)
