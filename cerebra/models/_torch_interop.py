"""Shared torch-interop/init helpers for the model zoo.

One home for two helpers that had drifted into per-module copies:

- ``trunc_normal_init``: the reference's ``trunc_normal_(std=.02)`` weight
  init (dino/vision_transformer.py:165-167 applies it to every nn.Linear;
  DINOHead does the same, :268-272).
- ``strip_torch_prefixes``: checkpoint-key prefix stripping
  (utils/utils.py:71-109 strips ``module.`` and the selected checkpoint
  key's ``backbone.``/``teacher.`` wrappers before load_state_dict).
  Callers pass the prefix tuple their reference counterpart strips.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_STRIP_PREFIXES: Tuple[str, ...] = ("module.", "teacher.", "backbone.")


def trunc_normal_init(std: float, a: float = -2.0, b: float = 2.0):
    """flax initializer matching the reference's ``trunc_normal_``
    (dino/utils.py:548-550): ``a``/``b`` are ABSOLUTE truncation bounds, not
    multiples of σ — at std=.02 the default ±2 window is ±100σ, i.e. an
    effectively untruncated normal with std exactly 0.02 (truncating at ±2σ
    instead would shrink the realized std to 0.88σ)."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, a / std, b / std, shape, dtype)

    return init


def strip_torch_prefixes(
    state_dict: Dict,
    prefixes: Sequence[str] = DEFAULT_STRIP_PREFIXES,
    dtype=np.float32,
) -> Dict[str, np.ndarray]:
    """{key: tensor} → {stripped key: np array}; each key loses every listed
    prefix it starts with (checked in order, once each, like the reference's
    sequential ``k.startswith`` loops)."""
    out = {}
    for k, v in state_dict.items():
        for pref in prefixes:
            if k.startswith(pref):
                k = k[len(pref) :]
        out[k] = np.asarray(v, dtype=dtype) if dtype is not None else v
    return out
