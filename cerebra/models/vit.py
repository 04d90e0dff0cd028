"""DINO Vision Transformer (dino/vision_transformer.py:134-254).

timm-style ViT with the DINO extras:
- `get_last_selfattention` (:216-223): attention maps of the final block;
- `get_intermediate_layers` (:225-233): normalized outputs of the last n
  blocks;
- positional-embedding interpolation for off-grid input sizes (:174-194),
  done with jax.image.resize (bicubic) over the (grid, grid, D) pos table;
- stochastic depth (drop_path) per block;
- vit_tiny/small/base constructors (:236-254) — embed 192/384/768.

Used by the EEG-as-image DINO recipe (dino/main_dino.py) and the DinoModel
inference wrapper; `import_dino_vit_torch` loads reference checkpoints with
the usual prefix stripping.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cerebra.models._torch_interop import strip_torch_prefixes
from cerebra.models._torch_interop import trunc_normal_init as _trunc_normal


class Attention(nn.Module):
    dim: int
    num_heads: int = 6
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Optional[Any] = None
    # Fused Pallas flash attention (TPU only): never materializes the
    # (B, H, N, N) probability matrix in HBM.  Engaged only when the caller
    # does not need the attention map, attn_drop == 0, and N >= flash_min_seq
    # (short local-crop sequences pay more in 128-padding than they save).
    use_flash: bool = False
    flash_min_seq: int = 512

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True, need_weights: bool = True
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Returns (out, attn) like the reference Attention (:68-92).

        ``attn`` is None on the fused flash path (``need_weights=False``)."""
        B, N, D = x.shape
        H = self.num_heads
        qkv = nn.Dense(3 * D, use_bias=self.qkv_bias, dtype=self.dtype, kernel_init=_trunc_normal(0.02), name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, D // H)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # (B, H, N, d)
        scale = (D // H) ** -0.5
        if (
            self.use_flash
            and not need_weights
            and self.attn_drop == 0.0
            and N >= self.flash_min_seq
        ):
            out = _flash_mha(q, k, v, scale).transpose(0, 2, 1, 3).reshape(B, N, D)
            attn = None
        else:
            attn = jax.nn.softmax((q * scale) @ jnp.swapaxes(k, -2, -1), axis=-1)
            attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
            out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
        out = nn.Dense(D, dtype=self.dtype, kernel_init=_trunc_normal(0.02), name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out, attn


def _flash_mha(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Pallas TPU flash attention over (B, H, N, d) q/k/v.

    Pads N up to a multiple of the kernel's 128-token blocks; padded tokens
    carry a different segment id than real ones, so they are masked out of
    every real query's softmax (and padded-query outputs are sliced away —
    their k/v gradients die in the pad's transpose-slice)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, H, N, _ = q.shape
    n_pad = -N % 128
    if n_pad:
        pad = ((0, 0), (0, 0), (0, n_pad), (0, 0))
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
        seg = jnp.broadcast_to(
            (jnp.arange(N + n_pad) < N).astype(jnp.int32)[None, :], (B, N + n_pad)
        )
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None
    # Large sequence blocks: the kernel's 128-token defaults leave each grid
    # cell with a (128,64)@(64,128) matmul — far too little work per cell at
    # ViT scale. Use the largest block that divides the padded length.
    np_ = N + n_pad
    blk = max(b for b in (896, 512, 448, 256, 128) if np_ % b == 0 and b <= np_)
    bs = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    out = flash_attention(
        q, k, v, segment_ids=segment_ids, sm_scale=scale, block_sizes=bs
    )
    return out[:, :, :N, :]


class _DenseParams(nn.Module):
    """nn.Dense-shaped (kernel, bias) WITHOUT applying the layer — same
    names/shapes/initializers, so the fused-kernel path keeps the exact
    param tree (and torch-import mapping) of the XLA path."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        # same trunc_normal(.02) as the applied nn.Dense layers (the
        # reference's _init_weights, dino/vision_transformer.py:165-167) so
        # fused and unfused paths draw identical init distributions
        kernel = self.param(
            "kernel", _trunc_normal(0.02), (self.in_dim, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class _LayerNormParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(), (self.dim,))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.dim,))
        return scale, bias


class _AttnParams(nn.Module):
    """The Attention module's (qkv, proj) Dense params WITHOUT applying the
    layers — same tree as Attention, consumed by the fused Pallas path."""

    dim: int

    @nn.compact
    def __call__(self):
        wqkv, bqkv = _DenseParams(self.dim, 3 * self.dim, name="qkv")()
        wproj, bproj = _DenseParams(self.dim, self.dim, name="proj")()
        return wqkv, bqkv, wproj, bproj


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    # LayerScale (DINOv2 blocks): learned per-channel gamma on each residual
    # branch, init 1e-5. Absent in DINO v1 (dino/vision_transformer.py:95-132).
    layer_scale: bool = False
    layer_scale_init: float = 1e-5
    dtype: Optional[Any] = None
    use_flash: bool = False
    # Fused Pallas MLP half-block (LN2→fc1→GELU→fc2→residual in one kernel
    # pair, recompute backward — cerebra.models.pallas_vit_mlp). Identical
    # param tree. Under active drop_path the kernel stays engaged: the
    # per-sample mask/keep factor is passed in as the branch scale and
    # applied INSIDE the kernel (mask drawn outside, same rng stream).
    use_fused_mlp: bool = False
    # Fused Pallas attention half-block (LN1→QKV→MHA→proj→residual in one
    # kernel pair, recompute backward — cerebra.models.pallas_vit_attn).
    # Identical param tree; engaged whenever the attention map is not
    # needed (drop_path rides inside the kernel, as above).
    use_fused_attn: bool = False
    # Mosaic lowering knobs for the fused kernels (interpret-mode tests
    # cannot see lowering rejections — CLAUDE.md blind spot): the sequence
    # pad multiple for the fused attention half-block and the token-tile
    # height for the fused MLP half-block. Exposed so a real-TPU rejection
    # (e.g. a %16 partial tile) has a flag-level workaround (retry pad=128)
    # without a code change.
    fused_attn_pad: int = 16
    fused_mlp_tile_m: int = 256
    # engage the fused kernels only when the token count N is at least this
    # (0 = always). The dinoparts step decomposition measured the fused
    # half-blocks flat-to-slightly-worse at the 4×96 local-crop shape
    # (N=145) while winning big at N=785 — gate locals back onto XLA. Both
    # branches declare the identical param tree, so view groups on either
    # side of the gate share one set of variables.
    fused_min_seq: int = 0

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True, return_attention: bool = False
    ):
        seq_gate = x.shape[1] >= self.fused_min_seq
        if self.use_fused_attn and seq_gate and not return_attention:
            from cerebra.models.pallas_vit_attn import fused_attn_residual

            g, b = _LayerNormParams(self.dim, name="norm1")()
            wqkv, bqkv, wproj, bproj = _AttnParams(self.dim, name="attn")()
            if self.layer_scale:
                # fold the residual-branch gamma into proj (the kernel adds
                # the residual internally): proj(o)·ls1 = o @ (Wp·ls1) + bp·ls1
                ls1 = self.param(
                    "ls1_gamma", nn.initializers.constant(self.layer_scale_init),
                    (self.dim,),
                )
                wproj = wproj * ls1[None, :]
                bproj = bproj * ls1
            # x keeps its stream dtype (f32 residual stream under bf16
            # compute, like the unfused x + Attention(dtype=bf16)(...));
            # stochastic depth rides INSIDE the kernel as the per-sample
            # branch scale (rng draw order matches the unfused path exactly)
            x = fused_attn_residual(
                x, g, b, wqkv, bqkv, wproj, bproj, self.num_heads,
                self.fused_attn_pad, self.dtype,
                self._drop_path_scale(x.shape[0], train),
            )
        else:
            y, attn = Attention(
                self.dim, self.num_heads, dtype=self.dtype, use_flash=self.use_flash,
                name="attn",
            )(
                nn.LayerNorm(dtype=self.dtype, name="norm1")(x),
                train=train,
                need_weights=return_attention,
            )
            if return_attention:
                return attn
            if self.layer_scale:
                y = y * self.param(
                    "ls1_gamma",
                    nn.initializers.constant(self.layer_scale_init),
                    (self.dim,),
                )
            x = x + self._drop_path(y, train)
        F = int(self.dim * self.mlp_ratio)
        if self.use_fused_mlp and seq_gate:
            from cerebra.models.pallas_vit_mlp import fused_mlp_residual

            g, b = _LayerNormParams(self.dim, name="norm2")()
            w1, b1 = _DenseParams(self.dim, F, name="mlp_fc1")()
            w2, b2 = _DenseParams(F, self.dim, name="mlp_fc2")()
            if self.layer_scale:
                # fold the residual-branch gamma into fc2 (the kernel adds
                # the residual internally): fc2(y)·ls2 = y @ (w2·ls2) + b2·ls2
                ls2 = self.param(
                    "ls2_gamma", nn.initializers.constant(self.layer_scale_init),
                    (self.dim,),
                )
                w2 = w2 * ls2[None, :]
                b2 = b2 * ls2
            B, N, D = x.shape
            # x keeps its stream dtype; only the branch matmuls run in
            # self.dtype (flax Dense(dtype=...) semantics). The per-sample
            # drop-path scale is expanded to rows (b-major, matching the
            # reshape) and applied inside the kernel.
            scale = self._drop_path_scale(B, train)
            if scale is not None:
                scale = jnp.broadcast_to(scale[:, None], (B, N)).reshape(B * N)
            return fused_mlp_residual(
                x.reshape(B * N, D), g, b, w1, b1, w2, b2,
                self.fused_mlp_tile_m, self.dtype, scale,
            ).reshape(B, N, D)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(F, dtype=self.dtype, kernel_init=_trunc_normal(0.02), name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU default (exact erf)
        h = nn.Dense(self.dim, dtype=self.dtype, kernel_init=_trunc_normal(0.02), name="mlp_fc2")(h)
        if self.layer_scale:
            h = h * self.param(
                "ls2_gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,)
            )
        return x + self._drop_path(h, train)

    def _drop_path(self, x: jax.Array, train: bool) -> jax.Array:
        if self.drop_path == 0.0 or not train:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask / keep

    def _drop_path_scale(self, batch: int, train: bool):
        """The per-sample mask/keep factor of _drop_path as a (B,) vector
        for the fused kernels' in-kernel branch scale — SAME rng stream and
        draw position, so fused and plain paths consume identical
        randomness."""
        if self.drop_path == 0.0 or not train:
            return None
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (batch, 1, 1))
        return mask.reshape(batch).astype(jnp.float32) / keep


class VisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    layer_scale: bool = False  # True = DINOv2-style blocks
    dtype: Optional[Any] = None
    use_flash: bool = False  # Pallas flash attention on TPU (globals only)
    use_fused_mlp: bool = False  # fused Pallas MLP half-block (pallas_vit_mlp)
    use_fused_attn: bool = False  # fused Pallas attention half-block (pallas_vit_attn)
    fused_attn_pad: int = 16  # Mosaic seq-pad multiple for the fused attention
    fused_mlp_tile_m: int = 256  # token-tile height for the fused MLP
    fused_min_seq: int = 0  # fused kernels only at token count >= this (0 = always)
    # jax.checkpoint each block (save only matmul outputs): trades GELU/LN/
    # softmax recompute for the backward's saved-activation HBM streams.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, H, W, 3) NHWC
        train: bool = False,
        return_all_tokens: bool = False,
        return_attention_of_last_block: bool = False,
        n_intermediate: int = 0,
    ):
        B, H, W, _ = x.shape
        patches = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)  # VALID: torch Conv2d is unpadded, floor-truncating partial
        # patches (flax's default SAME would zero-pad a 230px input to a
        # 15x15 grid where the reference produces 14x14)
        gh, gw = patches.shape[1], patches.shape[2]
        tokens = patches.reshape(B, gh * gw, self.embed_dim)

        cls_token = self.param("cls_token", _trunc_normal(0.02), (1, 1, self.embed_dim))
        n_patches_train = (self.img_size // self.patch_size) ** 2
        pos_embed = self.param(
            "pos_embed", _trunc_normal(0.02), (1, n_patches_train + 1, self.embed_dim)
        )
        pos = _interpolate_pos_embed(pos_embed, gh, gw)
        tokens = jnp.concatenate([jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)), tokens], 1)
        tokens = tokens + pos

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        final_norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        intermediates: List[jax.Array] = []
        block_cls = Block
        if self.remat:
            block_cls = nn.remat(
                Block,
                static_argnums=(2, 3),  # train / return_attention (counting self=0)
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        for i in range(self.depth):
            block = block_cls(
                self.embed_dim, self.num_heads, self.mlp_ratio, float(dpr[i]),
                layer_scale=self.layer_scale, dtype=self.dtype,
                use_flash=self.use_flash, use_fused_mlp=self.use_fused_mlp,
                use_fused_attn=self.use_fused_attn,
                fused_attn_pad=self.fused_attn_pad,
                fused_mlp_tile_m=self.fused_mlp_tile_m,
                fused_min_seq=self.fused_min_seq,
                name=f"block_{i}",
            )
            if return_attention_of_last_block and i == self.depth - 1:
                # positional: remat's static_argnums can't see kwargs
                return block(tokens, train, True)
            tokens = block(tokens, train, False)
            if n_intermediate and i >= self.depth - n_intermediate and i < self.depth - 1:
                # the reference norms EVERY returned layer
                # (dino/vision_transformer.py:232)
                intermediates.append(final_norm(tokens))
        tokens = final_norm(tokens)
        if n_intermediate:
            return intermediates + [tokens]
        if return_all_tokens:
            return tokens
        return tokens[:, 0]  # CLS feature (the reference forward, :211-214)


def _interpolate_pos_embed(pos_embed: jax.Array, gh: int, gw: int) -> jax.Array:
    """Bicubic pos-embed interpolation (dino/vision_transformer.py:174-194)."""
    n = pos_embed.shape[1] - 1
    if gh * gw == n and gh == gw:
        # the reference short-circuits only for npatch == N AND w == h
        # (dino/vision_transformer.py:177): a non-square grid with the same
        # token count must still be re-interpolated to its real geometry
        return pos_embed
    cls_pos, patch_pos = pos_embed[:, :1], pos_embed[:, 1:]
    g0 = int(math.sqrt(n))
    patch_pos = patch_pos.reshape(1, g0, g0, -1)
    patch_pos = jax.image.resize(patch_pos, (1, gh, gw, patch_pos.shape[-1]), "bicubic")
    return jnp.concatenate([cls_pos, patch_pos.reshape(1, gh * gw, -1)], axis=1)


def vit_tiny(patch_size: int = 16, **kw) -> VisionTransformer:
    return VisionTransformer(patch_size=patch_size, embed_dim=192, depth=12, num_heads=3, **kw)


def vit_small(patch_size: int = 16, **kw) -> VisionTransformer:
    return VisionTransformer(patch_size=patch_size, embed_dim=384, depth=12, num_heads=6, **kw)


def vit_base(patch_size: int = 16, **kw) -> VisionTransformer:
    return VisionTransformer(patch_size=patch_size, embed_dim=768, depth=12, num_heads=12, **kw)


def vit_small_dinov2(img_size: int = 518, **kw) -> VisionTransformer:
    """DINOv2 ViT-S/14 (the reference's frozen teacher,
    LstmDistillFromDinoV2Train.py:144-146: torch.hub dinov2_vits14): patch 14,
    LayerScale blocks, 37×37 pos grid at the 518-px training size — off-grid
    inputs (e.g. 224) go through pos-embed interpolation like upstream."""
    return VisionTransformer(
        img_size=img_size, patch_size=14, embed_dim=384, depth=12, num_heads=6,
        layer_scale=True, **kw,
    )


def import_vit_torch(state_dict, depth: int = 12, layer_scale: bool = False) -> dict:
    """timm-style torch ViT state dict → flax params for VisionTransformer.

    One importer for both reference teacher families (VERDICT round 3 #9):
    DINO v1 (dino/vision_transformer.py:134-254) and, with
    ``layer_scale=True``, the torch.hub dinov2_vits14 layout — identical
    except for LayerScale gammas `blocks.{i}.ls{1,2}.gamma` and an
    inference-unused `mask_token` (skipped). Accepts checkpoint keys carrying
    `module./teacher./backbone.` prefixes (utils/DinoModel.py:60-78
    prefix-stripping)."""
    sd = strip_torch_prefixes(state_dict)

    p: dict = {}
    p["cls_token"] = sd["cls_token"]
    p["pos_embed"] = sd["pos_embed"]
    w = sd["patch_embed.proj.weight"]  # (D, 3, P, P) → HWIO
    p["patch_embed"] = {
        "kernel": np.transpose(w, (2, 3, 1, 0)),
        "bias": sd["patch_embed.proj.bias"],
    }
    for i in range(depth):
        b = f"blocks.{i}."
        blk = {
            "norm1": {"scale": sd[b + "norm1.weight"], "bias": sd[b + "norm1.bias"]},
            "norm2": {"scale": sd[b + "norm2.weight"], "bias": sd[b + "norm2.bias"]},
            "attn": {
                "qkv": {"kernel": sd[b + "attn.qkv.weight"].T, "bias": sd[b + "attn.qkv.bias"]},
                "proj": {"kernel": sd[b + "attn.proj.weight"].T, "bias": sd[b + "attn.proj.bias"]},
            },
            "mlp_fc1": {"kernel": sd[b + "mlp.fc1.weight"].T, "bias": sd[b + "mlp.fc1.bias"]},
            "mlp_fc2": {"kernel": sd[b + "mlp.fc2.weight"].T, "bias": sd[b + "mlp.fc2.bias"]},
        }
        if layer_scale:
            blk["ls1_gamma"] = sd[b + "ls1.gamma"]
            blk["ls2_gamma"] = sd[b + "ls2.gamma"]
        p[f"block_{i}"] = blk
    p["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    return {"params": p}


def import_dino_vit_torch(state_dict, depth: int = 12) -> dict:
    """DINO v1 layout (no LayerScale) — see import_vit_torch."""
    return import_vit_torch(state_dict, depth=depth, layer_scale=False)


def import_dinov2_vit_torch(state_dict, depth: int = 12) -> dict:
    """DINOv2 torch.hub layout (LayerScale) — see import_vit_torch."""
    return import_vit_torch(state_dict, depth=depth, layer_scale=True)
