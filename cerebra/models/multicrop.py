"""Multi-crop forwarding (utils/utils.py:598-633 MultiCropWrapper, TPU-style).

The reference wrapper groups same-resolution crops and runs one backbone
forward per group, then the head on the concatenation. Here crops arrive
already stacked per resolution group ((n_views, B, L, C), see
cerebra.signal.windows.multicrop_views), so each group is ONE reshaped
batched forward — maximal MXU batch, no Python-side grouping logic.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def multicrop_forward(
    backbone: Callable[..., jax.Array],
    head: Callable[[jax.Array], jax.Array],
    view_groups: Sequence[jax.Array],
    backbone_takes_group_index: bool = False,
) -> jax.Array:
    """Run `backbone` once per same-length view group and `head` once on the
    concatenated features.

    view_groups: sequence of (n_views_g, B, ...) arrays (trailing view shape
    may differ between groups — temporal crops, image crops, ...). Returns
    (total_views · B, out_dim), views ordered group-by-group then
    view-by-view — matching the reference's cat order.

    With `backbone_takes_group_index`, the backbone is called as
    ``backbone(flat, group_index)`` — stochastic students fold the index
    into their dropout rng so same-shape groups get distinct masks, while
    the group/view ordering stays defined HERE for every caller.
    """
    feats = []
    for gi, group in enumerate(view_groups):
        n_views, B = group.shape[:2]
        flat = group.reshape((n_views * B,) + group.shape[2:])
        feats.append(backbone(flat, gi) if backbone_takes_group_index else backbone(flat))
    return head(jnp.concatenate(feats, axis=0))
