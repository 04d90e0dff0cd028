"""DinoModel — inference wrapper bundling a DINO ViT backbone, optional
DINOHead, checkpoint import, and the DINO-v1 image preprocessing
(utils/DinoModel.py:37-100 + dino_args defaults :11-34).

Replaces torch.hub downloads with local checkpoint import
(`from_torch_checkpoint`: module./backbone./head-prefix stripping like
utils/DinoModel.py:60-78) or random init for smoke tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cerebra.models.heads import DINOHead
from cerebra.models.vit import VisionTransformer, import_dino_vit_torch, vit_base, vit_small, vit_tiny
from cerebra.signal.image_aug import IMAGENET_MEAN, IMAGENET_STD
from cerebra.signal.windows import tile_eeg_to_image


def dino_image_transform(image: np.ndarray, image_size: int = 224) -> np.ndarray:
    """Resize-256 → center-crop → ImageNet-normalize (utils/DinoModel.py:83-88
    and the torch.hub DINOv2 default transform), NHWC numpy — standalone so
    feature extraction doesn't need to build a model for preprocessing."""
    img = jnp.asarray(image, dtype=jnp.float32)
    if img.max() > 2.0:
        img = img / 255.0
    H, W = img.shape[:2]
    # short side resized EXACTLY to 256 (torchvision Resize semantics: long
    # side truncates via int()), but never smaller than the crop itself
    # (image_size > 256, e.g. DINOv2's native 518, would otherwise make the
    # center-crop offsets negative)
    target = max(256, int(image_size))
    if H <= W:
        new_h, new_w = target, int(target * W / H)
    else:
        new_h, new_w = int(target * H / W), target
    img = jax.image.resize(img, (new_h, new_w, 3), "bilinear")
    top = (img.shape[0] - image_size) // 2
    left = (img.shape[1] - image_size) // 2
    img = img[top : top + image_size, left : left + image_size]
    return np.asarray((img - IMAGENET_MEAN) / IMAGENET_STD)


@dataclasses.dataclass
class DinoArgs:
    """dino_args defaults (utils/DinoModel.py:11-34)."""

    arch: str = "vit_small"
    patch_size: int = 8
    out_dim: int = 65536
    image_size: int = 224
    use_head: bool = True
    norm_last_layer: bool = True
    use_bn_in_head: bool = False


class DinoModel:
    def __init__(self, args: DinoArgs = DinoArgs(), params: Optional[dict] = None, seed: int = 0):
        ctor = {"vit_tiny": vit_tiny, "vit_small": vit_small, "vit_base": vit_base}[args.arch]
        self.args = args
        self.backbone: VisionTransformer = ctor(patch_size=args.patch_size,
                                                img_size=args.image_size)
        self.head = (
            DINOHead(in_dim=self.backbone.embed_dim, out_dim=args.out_dim,
                     use_bn=args.use_bn_in_head, norm_last_layer=args.norm_last_layer)
            if args.use_head
            else None
        )
        if params is None:
            k1, k2 = jax.random.split(jax.random.key(seed))
            dummy = jnp.zeros((1, args.image_size, args.image_size, 3))
            params = {"backbone": self.backbone.init(k1, dummy)["params"]}
            if self.head is not None:
                params["head"] = self.head.init(
                    k2, jnp.zeros((1, self.backbone.embed_dim))
                )["params"]
        self.params = params
        # params are a runtime ARGUMENT of the jit, never a closure: closed-
        # over weights are baked into the compiled HLO as constants (~43M
        # f32 params for vit_small/8 + 65536-dim head), re-uploaded through
        # the remote-compile tunnel per jit signature (CLAUDE.md rule)
        self._forward = jax.jit(self._apply)

    # ------------------------------------------------------------- forward
    def _apply(self, params: dict, images: jax.Array) -> jax.Array:
        feats = self.backbone.apply({"params": params["backbone"]}, images)
        if self.head is not None and "head" in params:
            feats = self.head.apply({"params": params["head"]}, feats)
        return feats

    def __call__(self, images: jax.Array) -> jax.Array:
        """images: (B, H, W, 3) NHWC, already preprocessed."""
        return self._forward(self.params, images)

    # ---------------------------------------------------------- transforms
    def dinov1_transform(self, image: np.ndarray) -> np.ndarray:
        """Resize-256 → center-crop-224 → ImageNet-normalize
        (utils/DinoModel.py:83-88), NHWC numpy."""
        return dino_image_transform(image, self.args.image_size)

    def features_from_eeg(self, key: jax.Array, eeg: jax.Array) -> jax.Array:
        """EEG (B, T, C) → tiled EEG-images → DINO features
        (transformEEGDataDino pass_eeg=True, utils/PerilsEEGDataset.py:410-449)."""
        keys = jax.random.split(key, eeg.shape[0])

        def one(k, e):
            return jnp.transpose(tile_eeg_to_image(k, e.T, self.args.image_size), (1, 2, 0))

        imgs = jax.vmap(one)(keys, eeg)
        return self(imgs)

    # ----------------------------------------------------------- load/save
    @staticmethod
    def from_torch_checkpoint(
        path: str, args: DinoArgs = DinoArgs(), checkpoint_key: str = "teacher"
    ) -> "DinoModel":
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(ckpt, dict) and checkpoint_key in ckpt:
            ckpt = ckpt[checkpoint_key]
        from cerebra.models._torch_interop import strip_torch_prefixes

        # torch tensors stay tensors here (dtype=None); backbone./head.
        # routing below needs the wrapper prefixes intact except module.
        cleaned = strip_torch_prefixes(ckpt, prefixes=("module.",), dtype=None)
        backbone_sd = {
            k[len("backbone.") :] if k.startswith("backbone.") else k: v
            for k, v in cleaned.items()
            if not k.startswith("head.")
        }
        depth = {"vit_tiny": 12, "vit_small": 12, "vit_base": 12}[args.arch]
        params = {"backbone": import_dino_vit_torch(backbone_sd, depth=depth)["params"]}
        head_sd = {k[len("head.") :]: np.asarray(v) for k, v in cleaned.items() if k.startswith("head.")}
        if head_sd and args.use_head:
            from cerebra.train.checkpoints import _head_from_torch

            params["head"] = _head_from_torch(head_sd)
        return DinoModel(args, params=params)
