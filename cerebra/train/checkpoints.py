"""Checkpointing: orbax natively, reference `.pth` layouts for interop.

The reference saves torch dicts keyed student/teacher/optimizer/epoch/args/
dino_loss (LstmDistillation.py:634-646, dino/main_dino.py:297-309), rank-0
only (utils/utils.py:447-449), and restores with prefix-stripping loaders
(utils/utils.py:71-109, 152-184). Here:

- `save_orbax` / `restore_orbax`: the native path (async-capable, sharded).
- `export_dino_pth` / `import_dino_pth`: write/read the reference layout —
  MultiCropWrapper naming `backbone.*` + `head.mlp.{0,2,4}.*` +
  `head.last_layer.weight_{g,v}` — so reference tooling can consume our
  checkpoints and vice versa.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from cerebra.models.lstm import export_torch_state_dict, import_torch_state_dict


# ------------------------------------------------------------------- orbax
def save_orbax(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def restore_orbax(path: str, template: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, args=ocp.args.PyTreeRestore(template))
        return ckptr.restore(path)


# ----------------------------------------------------------- .pth interop
def _head_to_torch(head_params: Dict) -> Dict[str, np.ndarray]:
    """flax DINOHead params → torch DINOHead state-dict naming
    (dino/vision_transformer.py:257-291: mlp Sequential indices 0/2/4 for the
    no-BN 3-layer case; weight-norm last layer stores weight_g (out,1) and
    weight_v (out, in))."""
    out = {}
    dense_names = sorted(
        (k for k in head_params if k.startswith("Dense_")), key=lambda s: int(s.split("_")[1])
    )
    for i, name in enumerate(dense_names):
        idx = i * 2  # Linear, GELU, Linear, GELU, Linear → indices 0, 2, 4
        out[f"mlp.{idx}.weight"] = np.asarray(head_params[name]["kernel"]).T
        out[f"mlp.{idx}.bias"] = np.asarray(head_params[name]["bias"])
    ll = head_params["last_layer"]
    out["last_layer.weight_v"] = np.asarray(ll["v"]).T  # (out, in)
    out["last_layer.weight_g"] = np.asarray(ll["g"]).reshape(-1, 1)
    return out


def _head_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    mlp_idx = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("mlp.") and k.endswith(".weight")}
    )
    head: Dict = {}
    for i, idx in enumerate(mlp_idx):
        head[f"Dense_{i}"] = {
            "kernel": np.asarray(sd[f"mlp.{idx}.weight"], dtype=np.float32).T,
            "bias": np.asarray(sd[f"mlp.{idx}.bias"], dtype=np.float32),
        }
    head["last_layer"] = {
        "v": np.asarray(sd["last_layer.weight_v"], dtype=np.float32).T,
        "g": np.asarray(sd["last_layer.weight_g"], dtype=np.float32).reshape(-1),
    }
    return head


def wrapped_to_torch_state_dict(wrapped_params: Dict, ddp_module_prefix: bool = False) -> Dict:
    """{"backbone": ..., "head": ...} flax params → the reference
    MultiCropWrapper state-dict (utils/utils.py:598-633 naming)."""
    out = {}
    backbone_sd = export_torch_state_dict({"params": wrapped_params["backbone"]})
    for k, v in backbone_sd.items():
        out[f"backbone.{k}"] = v
    for k, v in _head_to_torch(wrapped_params["head"]).items():
        out[f"head.{k}"] = v
    if ddp_module_prefix:  # student is DDP-wrapped in the reference
        out = {f"module.{k}": v for k, v in out.items()}
    return out


def torch_state_dict_to_wrapped(sd: Dict) -> Dict:
    """Inverse, with module./backbone-prefix tolerance."""
    cleaned = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        cleaned[k] = np.asarray(v, dtype=np.float32)
    backbone_sd = {k[len("backbone.") :]: v for k, v in cleaned.items() if k.startswith("backbone.")}
    head_sd = {k[len("head.") :]: v for k, v in cleaned.items() if k.startswith("head.")}
    backbone = import_torch_state_dict(backbone_sd, strip_prefixes=())["params"]
    return {"backbone": backbone, "head": _head_from_torch(head_sd)}


def export_dino_pth(
    path: str,
    student_params: Dict,
    teacher_params: Dict,
    center: np.ndarray,
    epoch: int,
    args: Optional[dict] = None,
) -> None:
    """Write the LstmDistillation.py:634-646 checkpoint layout."""
    import torch

    def to_t(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}

    payload = {
        "student": to_t(wrapped_to_torch_state_dict(student_params, ddp_module_prefix=True)),
        "teacher": to_t(wrapped_to_torch_state_dict(teacher_params)),
        "optimizer": {},  # optax state is saved via orbax; torch can't consume it
        "epoch": int(epoch) + 1,
        "args": args or {},
        "dino_loss": {"center": torch.from_numpy(np.asarray(center))},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(payload, path)


def import_dino_pth(path: str):
    """Read a reference-layout checkpoint → (student_params, teacher_params,
    center, epoch). Applies the strict `backbone.`-strip semantics of the
    eval loader (LstmDistillFromDinoV2Eval.py:309-313) via
    torch_state_dict_to_wrapped."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    student = torch_state_dict_to_wrapped(ckpt["student"])
    teacher = torch_state_dict_to_wrapped(ckpt["teacher"])
    center = np.asarray(ckpt.get("dino_loss", {}).get("center", np.zeros((1, 1))))
    return student, teacher, center, int(ckpt.get("epoch", 0))
