"""EEG-ChannelNet-style conv blocks (reference layers.py:5-105; not imported
anywhere in the reference tree but part of its surface — SURVEY.md §2.4).

ConvLayer2D: BN → ReLU → Conv → Dropout (pre-activation order, layers.py:5-15).
TemporalBlock: parallel multi-dilation temporal convs, channel-concat (:17-45).
SpatialBlock: parallel multi-kernel-height spatial convs, channel-concat (:47-82).
ResidualBlock: standard 3×3 conv pair with skip (:84-105).
Inputs are NHWC.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvLayer2D(nn.Module):
    out_channels: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    drop_p: float = 0.2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_channels, self.kernel, self.strides,
            padding=((self.padding[0],) * 2, (self.padding[1],) * 2),
            kernel_dilation=self.dilation, dtype=self.dtype,
        )(x)
        return nn.Dropout(self.drop_p, deterministic=not train)(x)


class TemporalBlock(nn.Module):
    out_channels: int
    n_layers: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    dilation_list: Sequence[Tuple[int, int]]
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        dilations = list(self.dilation_list)
        if len(dilations) < self.n_layers:
            dilations += [dilations[-1]] * (self.n_layers - len(dilations))
        outs = []
        for d in dilations[: self.n_layers]:
            filter_size = self.kernel_size[1] * d[1] - 1
            pad = math.floor((filter_size - 1) / 2) - 1 * (d[1] // 2 - 1)
            outs.append(
                ConvLayer2D(
                    self.out_channels, self.kernel_size, self.strides, (0, pad), d,
                    dtype=self.dtype,
                )(x, train=train)
            )
        return jnp.concatenate(outs, axis=-1)


class SpatialBlock(nn.Module):
    out_channels: int
    num_spatial_layers: int
    strides: Tuple[int, int]
    input_height: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        outs = []
        for i in range(self.num_spatial_layers):
            kernel = (self.input_height // (i + 1), 1)
            pad = math.floor((kernel[0] - 1) / 2)
            outs.append(
                ConvLayer2D(
                    self.out_channels, kernel, self.strides, (pad, 0), (1, 1),
                    dtype=self.dtype,
                )(x, train=train)
            )
        return jnp.concatenate(outs, axis=-1)


class ResidualBlock(nn.Module):
    out_channels: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        norm = lambda name=None: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name=name
        )
        y = nn.Conv(self.out_channels, (3, 3), self.strides, padding=1, use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if x.shape != y.shape:
            x = nn.Conv(self.out_channels, (1, 1), self.strides, use_bias=False,
                        dtype=self.dtype, name="downsample")(x)
        return nn.relu(y + x)
