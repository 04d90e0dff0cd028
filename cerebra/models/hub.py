"""Named pretrained-model registry — the reference's torch.hub surface.

Reference behaviors replaced here:

- `dino/hubconf.py:1-151`: named constructors (dino_vits16/8, dino_vitb16/8,
  dino_resnet50, dino_xcit_*) build an architecture and load fixed
  fbaipublicfiles weight URLs (strict load, `fc` stripped on the resnet).
- `utils/utils.py:71-109` (`load_pretrained_weights`): local checkpoint
  first — optional `checkpoint_key` selection, `module.`/`backbone.` prefix
  stripping, non-strict load — else fall back to the (model_name,
  patch_size)-keyed URL table, else "random weights" with a message.
- `utils/utils.py:112-129` (`load_pretrained_linear_weights`): same URL
  fallback for the linear-probe weights (stored under a "state_dict" key).

TPU-native equivalent: constructors return `(module, params)` flax pairs.
Weight resolution is OFFLINE-SAFE and ordered: explicit local path →
`CEREBRA_HUB_CACHE` directory (URL basename match) → torch.hub download iff
the environment has egress (this one doesn't; guarded, never fatal) →
random init, printing the reference's own fallback message.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_DINO_BASE = "https://dl.fbaipublicfiles.com/dino/"

# (model_name, patch_size) → backbone weight URL — utils/utils.py:85-104.
# A key of patch_size=None matches on model_name ALONE: the reference's
# elif-chain ignores patch_size for the xcit and resnet50 rows
# (utils/utils.py:94-104), so e.g. ("xcit_small_12_p16", patch_size=8)
# still resolves the p16 URL there.
PRETRAINED_URLS: Dict[Tuple[str, Optional[int]], str] = {
    ("vit_small", 16): _DINO_BASE + "dino_deitsmall16_pretrain/dino_deitsmall16_pretrain.pth",
    ("vit_small", 8): _DINO_BASE + "dino_deitsmall8_pretrain/dino_deitsmall8_pretrain.pth",
    ("vit_base", 16): _DINO_BASE + "dino_vitbase16_pretrain/dino_vitbase16_pretrain.pth",
    ("vit_base", 8): _DINO_BASE + "dino_vitbase8_pretrain/dino_vitbase8_pretrain.pth",
    ("resnet50", None): _DINO_BASE + "dino_resnet50_pretrain/dino_resnet50_pretrain.pth",
    ("xcit_small_12_p16", None): _DINO_BASE + "dino_xcit_small_12_p16_pretrain/dino_xcit_small_12_p16_pretrain.pth",
    ("xcit_small_12_p8", None): _DINO_BASE + "dino_xcit_small_12_p8_pretrain/dino_xcit_small_12_p8_pretrain.pth",
    ("xcit_medium_24_p16", None): _DINO_BASE + "dino_xcit_medium_24_p16_pretrain/dino_xcit_medium_24_p16_pretrain.pth",
    ("xcit_medium_24_p8", None): _DINO_BASE + "dino_xcit_medium_24_p8_pretrain/dino_xcit_medium_24_p8_pretrain.pth",
}


def _url_for(model_name: str, patch_size: int) -> Optional[str]:
    """utils/utils.py:85-104 elif-chain: exact (name, patch) rows first,
    then the name-only rows (xcit/resnet50, where patch_size is ignored)."""
    return PRETRAINED_URLS.get(
        (model_name, patch_size), PRETRAINED_URLS.get((model_name, None))
    )

# (model_name, patch_size) → linear-probe weight URL — utils/utils.py:113-124.
# The resnet50 row matches by name alone there too (:122-124), hence None.
LINEAR_URLS: Dict[Tuple[str, Optional[int]], str] = {
    ("vit_small", 16): _DINO_BASE + "dino_deitsmall16_pretrain/dino_deitsmall16_linearweights.pth",
    ("vit_small", 8): _DINO_BASE + "dino_deitsmall8_pretrain/dino_deitsmall8_linearweights.pth",
    ("vit_base", 16): _DINO_BASE + "dino_vitbase16_pretrain/dino_vitbase16_linearweights.pth",
    ("vit_base", 8): _DINO_BASE + "dino_vitbase8_pretrain/dino_vitbase8_linearweights.pth",
    ("resnet50", None): _DINO_BASE + "dino_resnet50_pretrain/dino_resnet50_linearweights.pth",
}

# DINOv2 teacher (LstmDistillFromDinoV2Train.py:144-146 torch.hub call)
DINOV2_URLS: Dict[str, str] = {
    "dinov2_vits14": "https://dl.fbaipublicfiles.com/dinov2/dinov2_vits14/dinov2_vits14_pretrain.pth",
}


def _cached_file(url: str) -> Optional[str]:
    """Local file for a hub URL: CEREBRA_HUB_CACHE/<basename> (also checks
    torch.hub's own default checkpoint dir), or None."""
    name = url.rsplit("/", 1)[-1]
    candidates = []
    cache = os.environ.get("CEREBRA_HUB_CACHE")
    if cache:
        candidates.append(os.path.join(cache, name))
    try:
        import torch

        candidates.append(os.path.join(torch.hub.get_dir(), "checkpoints", name))
    except Exception:  # torch missing/misconfigured: cache probing only
        pass
    for c in candidates:
        if os.path.isfile(c):
            return c
    return None


def _fetch_state_dict(url: str, allow_download: bool = True):
    """Resolve a hub URL to a torch state dict, offline-safe. Returns None
    when the file is neither cached nor downloadable (zero-egress env)."""
    import torch

    path = _cached_file(url)
    if path is not None:
        return torch.load(path, map_location="cpu", weights_only=False)
    if allow_download and os.environ.get("CEREBRA_HUB_OFFLINE", "1") != "1":
        try:  # pragma: no cover — requires egress
            return torch.hub.load_state_dict_from_url(url=url, map_location="cpu")
        except Exception as e:
            print(f"[cerebra.hub] download failed for {url}: {e}")
    return None


def _build_vit(arch: str, patch_size: int, img_size: int, pretrained: bool, seed: int):
    from cerebra.models.vit import import_vit_torch, vit_base, vit_small

    ctor = {"vit_small": vit_small, "vit_base": vit_base}[arch]
    model = ctor(patch_size=patch_size, img_size=img_size)
    sd = _fetch_state_dict(PRETRAINED_URLS[(arch, patch_size)]) if pretrained else None
    if sd is not None:
        params = import_vit_torch(sd, depth=12)["params"]
    else:
        if pretrained:
            print("There is no reference weights available for this model => "
                  "We use random weights.")  # utils/utils.py:109
        dummy = jnp.zeros((1, img_size, img_size, 3))
        params = model.init(jax.random.key(seed), dummy)["params"]
    return model, params


def dino_vits16(pretrained: bool = True, img_size: int = 224, seed: int = 0):
    """ViT-Small/16 DINO (74.5% ImageNet k-NN — dino/hubconf.py:22-33)."""
    return _build_vit("vit_small", 16, img_size, pretrained, seed)


def dino_vits8(pretrained: bool = True, img_size: int = 224, seed: int = 0):
    """ViT-Small/8 DINO (78.3% ImageNet k-NN — dino/hubconf.py:36-48)."""
    return _build_vit("vit_small", 8, img_size, pretrained, seed)


def dino_vitb16(pretrained: bool = True, img_size: int = 224, seed: int = 0):
    """ViT-Base/16 DINO (76.1% ImageNet k-NN — dino/hubconf.py:51-64)."""
    return _build_vit("vit_base", 16, img_size, pretrained, seed)


def dino_vitb8(pretrained: bool = True, img_size: int = 224, seed: int = 0):
    """ViT-Base/8 DINO (77.4% ImageNet k-NN — dino/hubconf.py:67-80)."""
    return _build_vit("vit_base", 8, img_size, pretrained, seed)


def dino_resnet50(pretrained: bool = True, seed: int = 0):
    """ResNet-50 DINO, fc stripped (75.3% linear — dino/hubconf.py:83-97).
    Returns (module, variables) where variables carries params+batch_stats."""
    from cerebra.models.resnet import import_torchvision_resnet50, resnet50

    model = resnet50(num_classes=0)
    sd = _fetch_state_dict(PRETRAINED_URLS[("resnet50", None)]) if pretrained else None
    if sd is not None:
        variables = import_torchvision_resnet50(sd, num_classes=0)
    else:
        if pretrained:
            print("There is no reference weights available for this model => "
                  "We use random weights.")
        variables = model.init(jax.random.key(seed), jnp.zeros((1, 224, 224, 3)), train=False)
    return model, variables


def _build_xcit(name: str, pretrained: bool, seed: int, img_size: int):
    """dino_xcit_* hub constructors (dino/hubconf.py:98-151): the reference
    pulls the architecture from the external facebookresearch/xcit repo; here
    it is native flax (cerebra.models.xcit). Returns (module, variables)
    where variables carries params+batch_stats (conv-tower/LPI BatchNorms)."""
    from cerebra.models.xcit import XCIT_CONSTRUCTORS, import_xcit_torch

    model = XCIT_CONSTRUCTORS[name]()
    sd = _fetch_state_dict(PRETRAINED_URLS[(name, None)]) if pretrained else None
    if sd is not None:
        variables = import_xcit_torch(
            sd, depth=model.depth, patch_size=model.patch_size,
            cls_attn_layers=model.cls_attn_layers,
        )
    else:
        if pretrained:
            print("There is no reference weights available for this model => "
                  "We use random weights.")
        variables = model.init(jax.random.key(seed), jnp.zeros((1, img_size, img_size, 3)))
    return model, variables


def dino_xcit_small_12_p16(pretrained: bool = True, img_size: int = 224, seed: int = 0):
    """XCiT-S12/16 DINO (dino/hubconf.py:98-110)."""
    return _build_xcit("xcit_small_12_p16", pretrained, seed, img_size)


def dino_xcit_small_12_p8(pretrained: bool = True, img_size: int = 224, seed: int = 0):
    """XCiT-S12/8 DINO (dino/hubconf.py:112-124)."""
    return _build_xcit("xcit_small_12_p8", pretrained, seed, img_size)


def dino_xcit_medium_24_p16(pretrained: bool = True, img_size: int = 224, seed: int = 0):
    """XCiT-M24/16 DINO (dino/hubconf.py:126-138)."""
    return _build_xcit("xcit_medium_24_p16", pretrained, seed, img_size)


def dino_xcit_medium_24_p8(pretrained: bool = True, img_size: int = 224, seed: int = 0):
    """XCiT-M24/8 DINO (dino/hubconf.py:140-151)."""
    return _build_xcit("xcit_medium_24_p8", pretrained, seed, img_size)


def dinov2_vits14(pretrained: bool = True, img_size: int = 518, seed: int = 0):
    """DINOv2 ViT-S/14 — the reference's frozen distillation teacher
    (LstmDistillFromDinoV2Train.py:144-146)."""
    from cerebra.models.vit import import_dinov2_vit_torch, vit_small_dinov2

    model = vit_small_dinov2(img_size=img_size)
    sd = _fetch_state_dict(DINOV2_URLS["dinov2_vits14"]) if pretrained else None
    if sd is not None:
        params = import_dinov2_vit_torch(sd, depth=12)["params"]
    else:
        if pretrained:
            print("There is no reference weights available for this model => "
                  "We use random weights.")
        dummy = jnp.zeros((1, img_size, img_size, 3))
        params = model.init(jax.random.key(seed), dummy)["params"]
    return model, params


HUB: Dict[str, Callable] = {
    "dino_vits16": dino_vits16,
    "dino_vits8": dino_vits8,
    "dino_vitb16": dino_vitb16,
    "dino_vitb8": dino_vitb8,
    "dino_resnet50": dino_resnet50,
    "dino_xcit_small_12_p16": dino_xcit_small_12_p16,
    "dino_xcit_small_12_p8": dino_xcit_small_12_p8,
    "dino_xcit_medium_24_p16": dino_xcit_medium_24_p16,
    "dino_xcit_medium_24_p8": dino_xcit_medium_24_p8,
    "dinov2_vits14": dinov2_vits14,
}


def load(name: str, **kw):
    """`torch.hub.load("facebookresearch/dino", name)` equivalent:
    constructor lookup by name."""
    if name not in HUB:
        raise ValueError(f"unknown hub model {name!r}; available: {sorted(HUB)}")
    return HUB[name](**kw)


def load_pretrained_weights(
    model_name: str,
    patch_size: int,
    pretrained_weights: str = "",
    checkpoint_key: Optional[str] = "teacher",
    depth: int = 12,
) -> Optional[dict]:
    """utils/utils.py:71-109 semantics. Returns None for the final "random
    weights" branch (callers keep their init). Return shape is per family:
    vit_* → bare flax params; xcit_* → the FULL variables dict
    ({"params", "batch_stats"} — the conv tower/LPI BatchNorms need both);
    anything else → the raw torch state dict for the caller's own importer.

    1. `pretrained_weights` names a local file: torch.load, select
       `checkpoint_key` if present, strip `module./backbone.`, import.
    2. else the (model_name, patch_size) URL table, offline-safe.
    """
    from cerebra.models.vit import import_vit_torch

    def _import(sd):
        """ViT archs map onto the flax VisionTransformer and return bare
        params; xcit archs map onto cerebra.models.xcit and return the full
        variables dict (params+batch_stats). The remaining non-ViT row of
        the URL table (resnet50) has no importer here — return its raw state
        dict like the reference's model-agnostic load_state_dict
        (utils/utils.py:84-107) rather than crashing in import_vit_torch."""
        if model_name.startswith("vit_"):
            return import_vit_torch(sd, depth=depth)["params"]
        if model_name.startswith("xcit_"):
            from cerebra.models.xcit import XCIT_CONSTRUCTORS, import_xcit_torch

            m = XCIT_CONSTRUCTORS[model_name]()
            return import_xcit_torch(
                sd, depth=m.depth, patch_size=m.patch_size,
                cls_attn_layers=m.cls_attn_layers,
            )
        print(f"{model_name} has no flax importer; returning the raw torch "
              "state dict for the caller's own importer.")
        return sd

    if pretrained_weights and os.path.isfile(pretrained_weights):
        import torch

        sd = torch.load(pretrained_weights, map_location="cpu", weights_only=False)
        if checkpoint_key is not None and checkpoint_key in sd:
            print(f"Take key {checkpoint_key} in provided checkpoint dict")
            sd = sd[checkpoint_key]
        sd = {k: v for k, v in sd.items() if not k.startswith(("head.", "module.head."))}
        params = _import(sd)
        print(f"Pretrained weights found at {pretrained_weights} and loaded")
        return params
    print("Please use the `--pretrained_weights` argument to indicate the "
          "path of the checkpoint to evaluate.")
    url = _url_for(model_name, patch_size)
    sd = _fetch_state_dict(url) if url else None
    if sd is not None:
        print("Since no pretrained weights have been provided, we load the "
              "reference pretrained DINO weights.")
        return _import(sd)
    print("There is no reference weights available for this model => "
          "We use random weights.")
    return None


def load_pretrained_linear_weights(model_name: str, patch_size: int) -> Optional[dict]:
    """utils/utils.py:112-129 → {"kernel": (in, out), "bias": (out,)} flax
    Dense params for the linear probe, or None ("random linear weights")."""
    url = LINEAR_URLS.get((model_name, patch_size), LINEAR_URLS.get((model_name, None)))
    sd = _fetch_state_dict(url) if url else None
    if sd is None:
        print("We use random linear weights.")
        return None
    sd = sd["state_dict"]  # utils/utils.py:127
    w = np.asarray(sd["module.linear.weight"], dtype=np.float32)
    b = np.asarray(sd["module.linear.bias"], dtype=np.float32)
    print("We load the reference pretrained linear weights.")
    return {"kernel": w.T, "bias": b}
