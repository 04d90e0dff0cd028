"""Projection heads: DINOHead with weight-normalized prototype layer.

Rebuild of dino/vision_transformer.py:257-291 (duplicated at
LstmDistillation.py:65-99): nlayers-MLP (GELU, optional BN) → bottleneck →
L2-normalize → weight-norm Linear(bottleneck→out_dim, no bias) whose gain g
is fixed at 1 when `norm_last_layer` (reference freezes weight_g).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cerebra.models._torch_interop import trunc_normal_init as _trunc_normal


class WeightNormDense(nn.Module):
    """y = x @ (g · v / ||v||_col); g frozen at 1 when norm_gain_fixed.

    Mirrors nn.utils.weight_norm(nn.Linear(..., bias=False)) with
    weight_g.fill_(1) (dino/vision_transformer.py:274-277). With the gain
    fixed this is cosine-prototype logits — each output column has unit norm.
    """

    features: int
    norm_gain_fixed: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        v = self.param("v", _trunc_normal(0.02), (x.shape[-1], self.features), self.param_dtype)
        g = self.param("g", nn.initializers.ones, (self.features,), self.param_dtype)
        if self.norm_gain_fixed:
            g = jax.lax.stop_gradient(g)
        kernel = g * v / (jnp.linalg.norm(v, axis=0, keepdims=True) + 1e-12)
        return x @ kernel.astype(x.dtype)


class DINOHead(nn.Module):
    in_dim: int  # kept for parity with the reference ctor signature
    out_dim: int
    use_bn: bool = False
    norm_last_layer: bool = True
    nlayers: int = 3
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, kernel_init=_trunc_normal(0.02))
        nlayers = max(self.nlayers, 1)
        if nlayers == 1:
            x = nn.Dense(self.bottleneck_dim, **kw)(x)
        else:
            x = nn.Dense(self.hidden_dim, **kw)(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
            x = nn.gelu(x)
            for _ in range(nlayers - 2):
                x = nn.Dense(self.hidden_dim, **kw)(x)
                if self.use_bn:
                    x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
                x = nn.gelu(x)
            x = nn.Dense(self.bottleneck_dim, **kw)(x)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        return WeightNormDense(
            self.out_dim, norm_gain_fixed=self.norm_last_layer, param_dtype=self.param_dtype,
            name="last_layer",
        )(x)
