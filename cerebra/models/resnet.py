"""ResNet-50 (flax) — backbone for ResnetFeatureRegressor
(utils/ResnetFeatureRegressor.py:6-35) and the Barlow Twins towers
(EEG-BarlowNetworks/net.py:15-20).

Standard bottleneck ResNet; `zero_init_residual` matches the Barlow ctor
(net.py:15). Pretrained ImageNet weights can't be downloaded here (zero
egress) — `import_torchvision_state_dict` loads them from a local torch file
when available.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class BottleneckBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    zero_init_residual: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        norm = partial(nn.BatchNorm, use_running_average=not train, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.features, (3, 3), self.strides, use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = norm(
            scale_init=nn.initializers.zeros if self.zero_init_residual else nn.initializers.ones
        )(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features * 4, (1, 1), self.strides, use_bias=False, dtype=self.dtype,
                name="downsample_conv",
            )(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    num_classes: int = 0  # 0 → return pooled features (fc := Identity)
    zero_init_residual: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        """x: (B, H, W, 3) NHWC → pooled (B, 2048) features (or logits)."""
        norm = partial(nn.BatchNorm, use_running_average=not train, dtype=self.dtype)
        y = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                y = BottleneckBlock(
                    64 * 2**i, strides, self.zero_init_residual, dtype=self.dtype
                )(y, train=train)
        y = jnp.mean(y, axis=(1, 2))  # global average pool → (B, 2048)
        if self.num_classes:
            y = nn.Dense(self.num_classes, dtype=self.dtype)(y)
        return y


def resnet50(num_classes: int = 0, zero_init_residual: bool = False, dtype=None) -> ResNet:
    return ResNet((3, 4, 6, 3), num_classes, zero_init_residual, dtype)


class ResnetFeatureRegressor(nn.Module):
    """ResNet-50 (trainable) + linear regression head
    (utils/ResnetFeatureRegressor.py:6-35). Input NHWC images."""

    output_size: int
    num_features: int = 2048
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        feats = resnet50(dtype=self.dtype, zero_init_residual=False)(x, train=train)
        return nn.Dense(self.output_size, dtype=self.dtype, name="fc")(feats)
