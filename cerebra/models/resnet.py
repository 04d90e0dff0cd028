"""ResNet-50 (flax) — backbone for ResnetFeatureRegressor
(utils/ResnetFeatureRegressor.py:6-35) and the Barlow Twins towers
(EEG-BarlowNetworks/net.py:15-20).

Standard bottleneck ResNet; `zero_init_residual` matches the Barlow ctor
(net.py:15). Pretrained ImageNet weights can't be downloaded here (zero
egress) — `import_torchvision_resnet50` maps a torchvision state_dict into
flax variables and `load_pretrained_resnet50` reads one from a local torch
file when available; forward parity with the torch graph is oracle-tested in
tests/test_resnet_torch_parity.py.
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
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        # explicit (1,1) padding, NOT 'SAME': for stride-2 the two sampling
        # grids differ (torch pads symmetrically, SAME pads trailing-heavy),
        # and torchvision-weight parity needs torch's grid
        y = nn.Conv(
            self.features, (3, 3), self.strides, padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype,
        )(y)
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
    width: int = 64  # stem width (torchvision inplanes); 64 for resnet50
    remat: bool = False  # nested rematerialization: the backward keeps only
    # the 4 stage-boundary activations (jax.checkpoint per stage) and, inside
    # a stage's recompute, only block boundaries (nested checkpoint per
    # block). Per-block alone was measured insufficient at Barlow B=512 on
    # 16 GB HBM: the 16 block boundaries of 2 towers are themselves ~10 GB.

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        """x: (B, H, W, 3) NHWC → pooled (B, 2048) features (or logits)."""
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, dtype=self.dtype)
        y = nn.Conv(self.width, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        block_cls = BottleneckBlock
        if self.remat:
            # same lifted-remat idiom as models/vit.py: train is static
            # (counting self=0); BN batch_stats mutations are threaded by
            # the lifted transform
            block_cls = nn.remat(BottleneckBlock, static_argnums=(2,))
        k = 0
        for i, n_blocks in enumerate(self.stage_sizes):
            def stage(mdl, y, train, i=i, n_blocks=n_blocks, k0=k):
                kk = k0
                for j in range(n_blocks):
                    strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                    # name pinned to the plain path's auto-name (and parented
                    # to the ResNet scope, not a Stage submodule) so
                    # remat=True shares variable trees/checkpoints with
                    # remat=False and with the torchvision importer
                    y = block_cls(
                        self.width * 2**i, strides, self.zero_init_residual,
                        dtype=self.dtype, name=f"BottleneckBlock_{kk}",
                        parent=mdl,
                    )(y, train)
                    kk += 1
                return y

            if self.remat:
                y = nn.remat(stage, static_argnums=(2,))(self, y, train)
            else:
                y = stage(self, y, train)
            k += n_blocks
        y = jnp.mean(y, axis=(1, 2))  # global average pool → (B, 2048)
        if self.num_classes:
            y = nn.Dense(self.num_classes, dtype=self.dtype)(y)
        return y


def resnet50(num_classes: int = 0, zero_init_residual: bool = False, dtype=None,
             remat: bool = False) -> ResNet:
    return ResNet((3, 4, 6, 3), num_classes, zero_init_residual, dtype, remat=remat)


def _np(t):
    import numpy as np

    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _bn(sd, prefix):
    return (
        {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])},
        {"mean": _np(sd[prefix + ".running_mean"]), "var": _np(sd[prefix + ".running_var"])},
    )


def _conv(sd, key):
    # torch (O, I, kh, kw) → flax (kh, kw, I, O)
    return {"kernel": _np(sd[key]).transpose(2, 3, 1, 0)}


def import_torchvision_resnet50(
    state_dict, num_classes: int = 0, stage_sizes: Sequence[int] = (3, 4, 6, 3)
):
    """torchvision `resnet50().state_dict()` → flax `{"params", "batch_stats"}`
    variables for `ResNet` above (the pretrained backbone the reference loads
    at utils/ResnetFeatureRegressor.py:11-12 via ResNet50_Weights.DEFAULT).

    `num_classes=0` drops the classifier (the reference strips it,
    ResnetFeatureRegressor.py:15); `num_classes=1000` maps `fc.*` onto
    `Dense_0`. Accepts torch tensors or numpy arrays as values.
    """
    sd = state_dict
    params = {"Conv_0": _conv(sd, "conv1.weight")}
    stats = {}
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, "bn1")
    k = 0
    for stage, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            t = f"layer{stage + 1}.{j}"
            bp, bs = {}, {}
            for c in range(3):
                bp[f"Conv_{c}"] = _conv(sd, f"{t}.conv{c + 1}.weight")
                bp[f"BatchNorm_{c}"], bs[f"BatchNorm_{c}"] = _bn(sd, f"{t}.bn{c + 1}")
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv(sd, f"{t}.downsample.0.weight")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(sd, f"{t}.downsample.1")
            params[f"BottleneckBlock_{k}"] = bp
            stats[f"BottleneckBlock_{k}"] = bs
            k += 1
    if num_classes:
        params["Dense_0"] = {
            "kernel": _np(sd["fc.weight"]).transpose(1, 0),
            "bias": _np(sd["fc.bias"]),
        }
    import jax.numpy as jnp

    as_jnp = lambda tree: jax.tree.map(jnp.asarray, tree)
    return {"params": as_jnp(params), "batch_stats": as_jnp(stats)}


def load_pretrained_resnet50(path: str, num_classes: int = 0):
    """Load a locally saved torchvision resnet50 checkpoint (.pth state_dict —
    zero-egress stand-in for ResNet50_Weights.DEFAULT) into flax variables."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return import_torchvision_resnet50(sd, num_classes=num_classes)


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


def init_feature_regressor(
    rng: jax.Array,
    output_size: int,
    pretrained_path: Optional[str] = None,
    image_size: int = 224,
    dtype=None,
):
    """(model, variables) for ResnetFeatureRegressor; with `pretrained_path`
    the backbone slot is replaced by imported torchvision ImageNet weights —
    the reference's `resnet50(weights=ResNet50_Weights.DEFAULT)`
    (utils/ResnetFeatureRegressor.py:11-12) — while the regression head keeps
    its fresh init (the reference's new nn.Linear, :22)."""
    model = ResnetFeatureRegressor(output_size, dtype=dtype)
    variables = model.init(rng, jnp.zeros((1, image_size, image_size, 3)), train=False)
    if pretrained_path:
        pre = load_pretrained_resnet50(pretrained_path, num_classes=0)
        params = dict(variables["params"])
        stats = dict(variables["batch_stats"])
        params["ResNet_0"] = pre["params"]
        stats["ResNet_0"] = pre["batch_stats"]
        variables = {"params": params, "batch_stats": stats}
    return model, variables
