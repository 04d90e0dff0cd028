"""Optimizers as optax chains, with the reference's param-group semantics.

- optimizer selection AdamW/SGD/LARS (dino/main_dino.py:245-250), RMSprop
  (LstmDistillFromDinoV2Train.py:329), Adam (LSTMDistill.py:322);
- "regularized vs not_regularized" param groups — no weight decay on biases
  and 1-D params (utils/utils.py:636-647) — expressed as an optax mask;
- per-parameter gradient-norm clipping (utils/utils.py:132-141: each param's
  grad is clipped to `clip` individually, NOT a global norm);
- `cancel_gradients_last_layer` (utils/utils.py:144-149) as a grad-tree mask
  switched by a traced epoch (lax.cond-free: a where on a scalar predicate).

Learning-rate/WD schedules are injected per step (`optax.inject_hyperparams`)
to mirror the reference's per-iteration param_group mutation
(LstmDistillation.py:543-547).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def no_weight_decay_mask(params) -> Any:
    """True where weight decay applies: ndim > 1 (utils/utils.py:636-647
    excludes biases and all 1-D tensors)."""
    return jax.tree.map(lambda p: jnp.ndim(p) > 1, params)


def per_param_clip(clip: float) -> optax.GradientTransformation:
    """Per-parameter L2-norm clip (utils/utils.py:132-141): each parameter's
    gradient is scaled by min(1, clip/(||g||+1e-6)) independently."""

    def update_fn(updates, state, params=None):
        del params

        def clip_one(g):
            norm = jnp.linalg.norm(g.astype(jnp.float32))
            coef = jnp.minimum(clip / (norm + 1e-6), 1.0)
            return (g * coef).astype(g.dtype)

        return jax.tree.map(clip_one, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def cancel_last_layer_grads(grads, epoch: jax.Array, freeze_last_layer: int):
    """Zero DINOHead last-layer grads while epoch < freeze_last_layer
    (utils/utils.py:144-149), traced-epoch safe."""
    keep = (epoch >= freeze_last_layer).astype(jnp.float32)

    def mask(path, g):
        is_last = any(getattr(k, "key", None) == "last_layer" for k in path)
        return g * keep if is_last else g

    return jax.tree_util.tree_map_with_path(mask, grads)


def make_optimizer(
    name: str,
    learning_rate: float | Callable = 1e-3,
    weight_decay: float = 0.0,
    params_mask_source=None,
    clip_grad: Optional[float] = None,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    """Build the reference optimizer zoo.

    name ∈ {adamw, adam, sgd, rmsprop, lars}. `learning_rate` may be a
    schedule (callable of step). Weight decay is masked to ndim>1 params when
    `params_mask_source` (a params pytree) is given — the reference's
    param-group split.
    """
    mask = None
    if params_mask_source is not None:
        mask = no_weight_decay_mask(params_mask_source)

    if name == "adamw":
        tx = optax.adamw(learning_rate, weight_decay=weight_decay, mask=mask)
    elif name in ("adam", "sgd", "rmsprop"):
        inner = {
            "adam": lambda: optax.adam(learning_rate),
            "sgd": lambda: optax.sgd(learning_rate, momentum=momentum),
            # torch.optim.RMSprop defaults: alpha=0.99, eps=1e-8 added
            # OUTSIDE the sqrt — optax defaults eps INSIDE; eps_in_sqrt=False
            # is required for exact torch parity (pinned in test_train.py)
            "rmsprop": lambda: optax.rmsprop(
                learning_rate, decay=0.99, eps=1e-8, eps_in_sqrt=False
            ),
        }[name]()
        if weight_decay:
            # torch couples weight decay for these optimizers: wd*param is
            # added to the GRADIENT before momentum/adaptive scaling
            # (unlike adamw's decoupled decay) — chain add_decayed_weights
            # in FRONT of the inner transform to match.
            wd = optax.add_decayed_weights(weight_decay, mask=mask)
            inner = optax.chain(wd, inner)
        tx = inner
    elif name == "lars":
        tx = optax.lars(
            learning_rate,
            weight_decay=weight_decay,
            trust_coefficient=0.001,
            weight_decay_mask=mask if mask is not None else True,
            trust_ratio_mask=mask if mask is not None else True,
        )
    else:
        raise ValueError(f"unknown optimizer: {name}")

    if clip_grad is not None:
        tx = optax.chain(per_param_clip(clip_grad), tx)
    return tx
