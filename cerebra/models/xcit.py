"""XCiT — Cross-Covariance Image Transformer backbones for the DINO hub.

The reference registers four DINO-pretrained XCiT backbones
(dino/hubconf.py:99-151: dino_xcit_small_12_p16/p8, dino_xcit_medium_24_p16/p8)
but pulls the ARCHITECTURE from the external `facebookresearch/xcit` hub repo
— the model code is out of the reference tree. This module implements that
architecture natively in flax (XCiT paper: El-Nouby et al., 2021,
arXiv:2106.09681) so the hub names build real models, with a torch-layout
importer (`import_xcit_torch`) matching the upstream state-dict naming so the
fbaipublicfiles DINO checkpoints load when cached.

Architecture (upstream `xcit.py` semantics):

- ConvPatchEmbed: stride-2 [Conv3x3(no bias) + BatchNorm] stages with GELU
  between — 4 stages for patch 16 (3→D/8→D/4→D/2→D), 3 for patch 8
  (3→D/4→D/2→D).
- PositionalEncodingFourier: DETR-style sinusoidal encoding of normalized
  (y, x) patch-grid positions (hidden 32 each, temperature 10000) projected
  to D by a 1×1 conv (`token_projection`), added to the patch tokens.
- `depth` XCABlocks, each three residual branches with learned per-channel
  LayerScale gammas (init `eta`):
    x += γ1·XCA(LN1(x));  x += γ3·LPI(LN3(x));  x += γ2·MLP(LN2(x))
  XCA (cross-covariance attention) attends over the CHANNEL axis: per-head
  q,k,v of shape (d_head, N), q and k L2-normalized along N, logits
  (d_head × d_head) scaled by a LEARNED per-head temperature. LPI (local
  patch interaction) is depthwise-Conv3x3 → GELU → BatchNorm →
  depthwise-Conv3x3 on the (Hp, Wp) token grid.
- CLS token appended AFTER the XCA stack, then 2 ClassAttentionBlocks
  (CaiT-style: only the CLS token queries). NOTE: the upstream block's final
  residual is `x_res + cat([γ2·MLP(cls), x[:, 1:]])`, which doubles the
  patch tokens — a quirk of the official implementation, reproduced here
  because the published DINO weights were trained with it.
- Final LayerNorm; the DINO backbones are headless (num_classes=0) and
  return the CLS feature.

No executable oracle exists in this environment (the architecture is not in
/root/reference and timm/torchvision are absent); tests cross-check against
a minimal torch mirror written from the same public spec
(tests/test_xcit.py).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cerebra.models._torch_interop import strip_torch_prefixes
from cerebra.models._torch_interop import trunc_normal_init as _trunc_normal


def fourier_pos_encoding(
    gh: int, gw: int, hidden_dim: int = 32, temperature: float = 10000.0
) -> np.ndarray:
    """(gh*gw, 2*hidden_dim) sinusoidal grid encoding, BEFORE the learned
    1×1 projection. Matches upstream PositionalEncodingFourier: cumsum-style
    1-based positions normalized to (0, 2π], interleaved sin/cos per axis,
    y-part concatenated before x-part."""
    eps, scale = 1e-6, 2 * math.pi
    y = (np.arange(1, gh + 1, dtype=np.float32) / (gh + eps) * scale)[:, None]
    x = (np.arange(1, gw + 1, dtype=np.float32) / (gw + eps) * scale)[None, :]
    y = np.broadcast_to(y, (gh, gw))
    x = np.broadcast_to(x, (gh, gw))
    dim_t = np.arange(hidden_dim, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / hidden_dim)
    pos_x = x[:, :, None] / dim_t  # (gh, gw, hidden)
    pos_y = y[:, :, None] / dim_t

    def interleave(p):
        return np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])], axis=-1).reshape(
            gh, gw, -1
        )

    pos = np.concatenate([interleave(pos_y), interleave(pos_x)], axis=-1)
    return pos.reshape(gh * gw, 2 * hidden_dim)


class ConvPatchEmbed(nn.Module):
    """Stride-2 conv tower: 4 stages for patch 16, 3 for patch 8."""

    embed_dim: int
    patch_size: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, int, int]:
        D = self.embed_dim
        if self.patch_size == 16:
            widths = (D // 8, D // 4, D // 2, D)
        elif self.patch_size == 8:
            widths = (D // 4, D // 2, D)
        else:
            raise ValueError(f"XCiT supports patch 8/16, got {self.patch_size}")
        for i, w in enumerate(widths):
            x = nn.Conv(
                w, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False,
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn_{i}",
            )(x)
            if i < len(widths) - 1:
                x = nn.gelu(x, approximate=False)
        B, gh, gw, _ = x.shape
        return x.reshape(B, gh * gw, D), gh, gw


class XCA(nn.Module):
    """Cross-covariance attention: (d_head × d_head) logits over the channel
    axis from L2-normalized q/k, scaled by a learned per-head temperature."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, D = x.shape
        H, d = self.num_heads, D // self.num_heads
        temperature = self.param(
            "temperature", nn.initializers.ones_init(), (H, 1, 1)
        )
        qkv = nn.Dense(3 * D, use_bias=self.qkv_bias, dtype=self.dtype, kernel_init=_trunc_normal(0.02), name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, d)
        # (B, H, d, N): channels are the attention axis
        q, k, v = (jnp.swapaxes(qkv[:, :, i].transpose(0, 2, 1, 3), -2, -1) for i in range(3))
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jax.nn.softmax((q @ jnp.swapaxes(k, -2, -1)) * temperature, axis=-1)
        out = (attn @ v).transpose(0, 3, 1, 2).reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype, kernel_init=_trunc_normal(0.02), name="proj")(out)


class LPI(nn.Module):
    """Local patch interaction: two depthwise 3×3 convs over the token grid
    with GELU + BatchNorm between."""

    dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, gh: int, gw: int, train: bool = False) -> jax.Array:
        B, N, D = x.shape
        h = x.reshape(B, gh, gw, D)
        h = nn.Conv(
            D, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=D,
            dtype=self.dtype, name="conv1",
        )(h)
        h = nn.gelu(h, approximate=False)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(h)
        h = nn.Conv(
            D, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=D,
            dtype=self.dtype, name="conv2",
        )(h)
        return h.reshape(B, N, D)


class XCABlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    eta: float = 1.0
    drop_path: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, gh: int, gw: int, train: bool = False) -> jax.Array:
        g_init = nn.initializers.constant(self.eta)
        gamma1 = self.param("gamma1", g_init, (self.dim,))
        gamma2 = self.param("gamma2", g_init, (self.dim,))
        gamma3 = self.param("gamma3", g_init, (self.dim,))
        y = XCA(self.dim, self.num_heads, dtype=self.dtype, name="attn")(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        )
        x = x + self._drop_path(gamma1 * y, train)
        y = LPI(self.dim, dtype=self.dtype, name="local_mp")(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm3")(x), gh, gw, train
        )
        x = x + self._drop_path(gamma3 * y, train)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, kernel_init=_trunc_normal(0.02), name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, kernel_init=_trunc_normal(0.02), name="mlp_fc2")(h)
        return x + self._drop_path(gamma2 * h, train)

    def _drop_path(self, x: jax.Array, train: bool) -> jax.Array:
        if self.drop_path == 0.0 or not train:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask / keep


class ClassAttention(nn.Module):
    """CaiT class attention: only the CLS token queries; patch tokens pass
    through unchanged (the block adds its own residual)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, D = x.shape
        H, d = self.num_heads, D // self.num_heads
        qkv = nn.Dense(3 * D, use_bias=self.qkv_bias, dtype=self.dtype, kernel_init=_trunc_normal(0.02), name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, d).transpose(2, 0, 3, 1, 4)  # (3, B, H, N, d)
        q, k, v = qkv[0], qkv[1], qkv[2]
        qc = q[:, :, :1]  # (B, H, 1, d) — CLS query only
        attn = jax.nn.softmax(jnp.sum(qc * k, axis=-1) * d**-0.5, axis=-1)  # (B, H, N)
        cls = (attn[:, :, None, :] @ v).swapaxes(1, 2).reshape(B, 1, D)
        cls = nn.Dense(D, dtype=self.dtype, kernel_init=_trunc_normal(0.02), name="proj")(cls)
        return jnp.concatenate([cls, x[:, 1:]], axis=1)


class ClassAttentionBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    eta: float = 1.0
    tokens_norm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g_init = nn.initializers.constant(self.eta)
        gamma1 = self.param("gamma1", g_init, (self.dim,))
        gamma2 = self.param("gamma2", g_init, (self.dim,))
        y = ClassAttention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        )
        x = x + gamma1 * y
        norm2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")
        if self.tokens_norm:
            x = norm2(x)
        else:
            x = jnp.concatenate([norm2(x[:, :1]), x[:, 1:]], axis=1)
        # Upstream quirk, reproduced for weight parity: the MLP branch's
        # residual re-adds the FULL token sequence, so patch tokens double
        # (x_res[:,1:] + x[:,1:]) while only the CLS token gets the MLP.
        x_res = x
        cls = x[:, :1]
        cls = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, kernel_init=_trunc_normal(0.02), name="mlp_fc1")(cls)
        cls = nn.gelu(cls, approximate=False)
        cls = nn.Dense(self.dim, dtype=self.dtype, kernel_init=_trunc_normal(0.02), name="mlp_fc2")(cls)
        x = jnp.concatenate([gamma2 * cls, x[:, 1:]], axis=1)
        return x_res + x


class XCiT(nn.Module):
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 8
    mlp_ratio: float = 4.0
    eta: float = 1.0
    tokens_norm: bool = True
    cls_attn_layers: int = 2
    drop_path_rate: float = 0.0
    pos_hidden_dim: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, H, W, 3) NHWC
        train: bool = False,
        return_all_tokens: bool = False,
    ):
        B = x.shape[0]
        D = self.embed_dim
        tokens, gh, gw = ConvPatchEmbed(
            D, self.patch_size, dtype=self.dtype, name="patch_embed"
        )(x, train)
        # sinusoidal grid encoding (host-constant for the static grid) + the
        # learned 1×1 projection (a Dense over the feature axis ≡ 1×1 conv)
        pos = jnp.asarray(fourier_pos_encoding(gh, gw, self.pos_hidden_dim))
        pos = nn.Dense(D, dtype=self.dtype, kernel_init=_trunc_normal(0.02), name="token_projection")(pos)
        tokens = tokens + pos[None]
        for i in range(self.depth):
            tokens = XCABlock(
                D, self.num_heads, self.mlp_ratio, eta=self.eta,
                drop_path=self.drop_path_rate, dtype=self.dtype, name=f"block_{i}",
            )(tokens, gh, gw, train)
        cls_token = self.param("cls_token", _trunc_normal(0.02), (1, 1, D))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, D)), tokens], axis=1
        )
        for i in range(self.cls_attn_layers):
            tokens = ClassAttentionBlock(
                D, self.num_heads, self.mlp_ratio, eta=self.eta,
                tokens_norm=self.tokens_norm, dtype=self.dtype, name=f"cls_block_{i}",
            )(tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)
        return tokens if return_all_tokens else tokens[:, 0]


def xcit_small_12_p16(**kw) -> XCiT:
    """dino_xcit_small_12_p16 backbone (dino/hubconf.py:98-110)."""
    return XCiT(patch_size=16, embed_dim=384, depth=12, num_heads=8, eta=1.0, **kw)


def xcit_small_12_p8(**kw) -> XCiT:
    """dino_xcit_small_12_p8 backbone (dino/hubconf.py:112-124)."""
    return XCiT(patch_size=8, embed_dim=384, depth=12, num_heads=8, eta=1.0, **kw)


def xcit_medium_24_p16(**kw) -> XCiT:
    """dino_xcit_medium_24_p16 backbone (dino/hubconf.py:126-138)."""
    return XCiT(patch_size=16, embed_dim=512, depth=24, num_heads=8, eta=1e-5, **kw)


def xcit_medium_24_p8(**kw) -> XCiT:
    """dino_xcit_medium_24_p8 backbone (dino/hubconf.py:140-151)."""
    return XCiT(patch_size=8, embed_dim=512, depth=24, num_heads=8, eta=1e-5, **kw)


XCIT_CONSTRUCTORS = {
    "xcit_small_12_p16": xcit_small_12_p16,
    "xcit_small_12_p8": xcit_small_12_p8,
    "xcit_medium_24_p16": xcit_medium_24_p16,
    "xcit_medium_24_p8": xcit_medium_24_p8,
}


def _bn(sd, prefix):
    return (
        {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]},
        {"mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"]},
    )


def _ln(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _dense(sd, prefix):
    return {"kernel": sd[prefix + ".weight"].T, "bias": sd[prefix + ".bias"]}


def import_xcit_torch(
    state_dict, depth: int = 12, patch_size: int = 16, cls_attn_layers: int = 2
) -> dict:
    """Upstream facebookresearch/xcit state dict → flax variables for XCiT.

    Key layout: `patch_embed.proj.{0,2,4,6}.{0,1}.*` (conv towers are
    Sequential(conv, BN) pairs with GELUs at odd indices),
    `pos_embeder.token_projection.*` (1×1 conv), `blocks.{i}.*`
    (norm1/attn/norm3/local_mp/norm2/mlp + gamma1/2/3),
    `cls_attn_blocks.{i}.*`, `cls_token`, `norm.*`. Accepts
    `module./teacher./backbone.` prefixes like import_vit_torch."""
    sd = strip_torch_prefixes(state_dict)

    params: dict = {"cls_token": sd["cls_token"]}
    stats: dict = {}

    n_stages = 4 if patch_size == 16 else 3
    pe_p, pe_s = {}, {}
    for i in range(n_stages):
        conv = sd[f"patch_embed.proj.{2 * i}.0.weight"]  # (O, I, 3, 3) → HWIO
        pe_p[f"conv_{i}"] = {"kernel": np.transpose(conv, (2, 3, 1, 0))}
        bn_p, bn_s = _bn(sd, f"patch_embed.proj.{2 * i}.1")
        pe_p[f"bn_{i}"], pe_s[f"bn_{i}"] = bn_p, bn_s
    params["patch_embed"], stats["patch_embed"] = pe_p, pe_s

    # token_projection is a 1×1 conv (D, 64, 1, 1) ≡ Dense kernel (64, D)
    w = sd["pos_embeder.token_projection.weight"]
    params["token_projection"] = {
        "kernel": np.transpose(w[:, :, 0, 0], (1, 0)),
        "bias": sd["pos_embeder.token_projection.bias"],
    }

    def _dwconv(prefix):
        w = sd[prefix + ".weight"]  # (D, 1, 3, 3) depthwise → HWIO (3, 3, 1, D)
        return {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": sd[prefix + ".bias"]}

    for i in range(depth):
        b = f"blocks.{i}."
        bn_p, bn_s = _bn(sd, b + "local_mp.bn")
        params[f"block_{i}"] = {
            "gamma1": sd[b + "gamma1"],
            "gamma2": sd[b + "gamma2"],
            "gamma3": sd[b + "gamma3"],
            "norm1": _ln(sd, b + "norm1"),
            "norm2": _ln(sd, b + "norm2"),
            "norm3": _ln(sd, b + "norm3"),
            "attn": {
                "temperature": sd[b + "attn.temperature"],
                "qkv": _dense(sd, b + "attn.qkv"),
                "proj": _dense(sd, b + "attn.proj"),
            },
            "local_mp": {
                "conv1": _dwconv(b + "local_mp.conv1"),
                "conv2": _dwconv(b + "local_mp.conv2"),
                "bn": bn_p,
            },
            "mlp_fc1": _dense(sd, b + "mlp.fc1"),
            "mlp_fc2": _dense(sd, b + "mlp.fc2"),
        }
        stats[f"block_{i}"] = {"local_mp": {"bn": bn_s}}

    for i in range(cls_attn_layers):
        b = f"cls_attn_blocks.{i}."
        params[f"cls_block_{i}"] = {
            "gamma1": sd[b + "gamma1"],
            "gamma2": sd[b + "gamma2"],
            "norm1": _ln(sd, b + "norm1"),
            "norm2": _ln(sd, b + "norm2"),
            "attn": {"qkv": _dense(sd, b + "attn.qkv"), "proj": _dense(sd, b + "attn.proj")},
            "mlp_fc1": _dense(sd, b + "mlp.fc1"),
            "mlp_fc2": _dense(sd, b + "mlp.fc2"),
        }
    params["norm"] = _ln(sd, "norm")
    return {"params": params, "batch_stats": stats}
