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

import functools
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cerebra.models.lstm import export_torch_state_dict, import_torch_state_dict


# ----------------------------------------------------------- host export
def host_replicated(tree: Any) -> Any:
    """Pytree of jax.Arrays → pytree of host numpy arrays, correct under ANY
    sharding and process count.

    Leaves that are not fully addressable on this process (e.g. the DINO
    prototype matrix / Adam moments / center TP-sharded P(None, "model")
    across processes — cerebra.parallel.tp.shard_dino_state) are first
    re-replicated with a collective identity-jit; `np.asarray` on such a
    leaf would raise. MUST therefore be called on ALL processes (like the
    reference's implicit DDP replication that makes save_on_master trivial,
    utils/utils.py:447-449); gate only the file WRITE on rank 0, never this
    gather.
    """
    def fix(leaf):
        if isinstance(leaf, jax.Array) and not (
            leaf.is_fully_addressable or leaf.sharding.is_fully_replicated
        ):
            leaf = _replicate(leaf.sharding.mesh)(leaf)
        return np.asarray(leaf)

    return jax.tree.map(fix, tree)


@functools.lru_cache(maxsize=None)
def _replicate(mesh):
    """One cached collective identity-jit per mesh: a fresh
    `jax.jit(lambda x: x, ...)` per leaf per call would defeat the jit
    cache (the cache key includes the function object) and re-pay a
    remote-compile round trip per leaf per checkpoint epoch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))


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


# ---------------------------------------------- optimizer-state interop
_LSTM_KIND_ORDER = ("weight_ih", "weight_hh", "bias_ih", "bias_hh")


def _registration_order(keys) -> list:
    """Sort torch state-dict keys into nn.Module PARAMETER REGISTRATION
    order for the reference student — MultiCropWrapper(backbone=Model LSTM,
    head=DINOHead) (utils/utils.py:607-612): torch optimizer param ids are
    positions in this order, not dict order."""

    def rank(k):
        if k.startswith("backbone.lstm."):
            kind, layer = k[len("backbone.lstm."):].rsplit("_l", 1)
            return (0, int(layer), _LSTM_KIND_ORDER.index(kind), k)
        if k.startswith("backbone.fc."):
            return (1, 0, 0 if k.endswith(".weight") else 1, k)
        if k.startswith("backbone.head."):
            return (2, 0, 0 if k.endswith(".weight") else 1, k)
        if k.startswith("head.mlp."):
            idx = int(k.split(".")[2])
            return (3, idx, 0 if k.endswith(".weight") else 1, k)
        if k == "head.last_layer.weight_g":  # weight_norm registers g then v
            return (4, 0, 0, k)
        if k == "head.last_layer.weight_v":
            return (4, 0, 1, k)
        return (5, 0, 0, k)

    return sorted(keys, key=rank)


_FROZEN_GAIN = "head.last_layer.weight_g"


def _grouped_param_names(sd: Dict[str, np.ndarray], frozen_gain: bool = True) -> list:
    """Reference get_params_groups (utils/utils.py:636-647): group 0 =
    regularized, group 1 = biases/1-D params; torch ids enumerate group 0
    then group 1. With the reference default norm_last_layer=True the
    weight-norm gain has requires_grad=False (vision_transformer.py:276-277)
    and get_params_groups SKIPS it — `frozen_gain` mirrors that."""
    ordered = _registration_order(sd.keys())
    if frozen_gain:
        ordered = [k for k in ordered if k != _FROZEN_GAIN]
    reg = [k for k in ordered if not (k.endswith(".bias") or np.ndim(sd[k]) == 1)]
    not_reg = [k for k in ordered if k.endswith(".bias") or np.ndim(sd[k]) == 1]
    return [reg, not_reg]


def _find_adam_state(opt_state):
    """Locate the ScaleByAdamState inside an optax chain/inject wrapper."""
    import optax

    found = []

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            found.append(node)
            return
        if isinstance(node, tuple):  # includes NamedTuple optax states
            for x in node:
                walk(x)

    walk(opt_state)
    if not found:
        raise ValueError("no ScaleByAdamState found in optimizer state")
    return found[0]


def _replace_adam_state(opt_state, new_adam):
    import optax

    def rebuild(node):
        if isinstance(node, optax.ScaleByAdamState):
            return new_adam
        if isinstance(node, dict):
            return {k: rebuild(v) for k, v in node.items()}
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            out = type(node)(*[rebuild(x) for x in node])
            # schedules are evaluated at THEIR OWN counters, not at the Adam
            # moment count: inject_hyperparams keeps a top-level count AND
            # (newer optax) one WrappedScheduleState(count) per hyperparam in
            # hyperparams_states; scale_by_schedule keeps its own too.
            # Leaving any of them at the template's 0 silently replays the
            # lr/wd warmup after a .pth resume. Fast-forward EVERY count in
            # the optimizer tree — each a FRESH buffer (aliasing one array
            # across states would make a later donating jit reject
            # "donate the same buffer twice").
            if "count" in node._fields:
                out = out._replace(
                    count=jnp.asarray(np.asarray(new_adam.count), dtype=out.count.dtype)
                )
            return out
        if isinstance(node, tuple):
            return tuple(rebuild(x) for x in node)
        return node

    return rebuild(opt_state)


_TORCH_ADAMW_GROUP_DEFAULTS = dict(
    lr=0.0005, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.04, amsgrad=False,
    maximize=False, foreach=None, capturable=False, differentiable=False,
    fused=None,
)


def adamw_state_to_torch(
    opt_state, lr: float = 0.0005, weight_decay: float = 0.04,
    norm_last_layer: bool = True,
) -> dict:
    """optax AdamW moments → `torch.optim.AdamW.state_dict()` layout, so the
    reference's restart_from_checkpoint (utils/utils.py:152-184) restores a
    REAL optimizer from our checkpoint instead of silently resetting it.

    The exp_avg/exp_avg_sq trees mirror the param tree, so the same
    flax→torch name mapping applies; ids follow the reference's two
    param_groups (regularized first — utils/utils.py:636-647). With
    `norm_last_layer` (the reference default) the frozen weight-norm gain is
    excluded, matching get_params_groups' requires_grad filter — our optax
    moments for it are zero anyway (stop_gradient)."""
    import torch

    adam = _find_adam_state(opt_state)
    mu_sd = wrapped_to_torch_state_dict(jax.tree.map(np.asarray, adam.mu))
    nu_sd = wrapped_to_torch_state_dict(jax.tree.map(np.asarray, adam.nu))
    step = float(np.asarray(adam.count))
    groups = _grouped_param_names(mu_sd, frozen_gain=norm_last_layer)
    state, param_groups, next_id = {}, [], 0
    for gi, names in enumerate(groups):
        ids = []
        for k in names:
            state[next_id] = {
                "step": torch.tensor(step),
                "exp_avg": torch.from_numpy(np.ascontiguousarray(mu_sd[k])),
                "exp_avg_sq": torch.from_numpy(np.ascontiguousarray(nu_sd[k])),
            }
            ids.append(next_id)
            next_id += 1
        g = dict(_TORCH_ADAMW_GROUP_DEFAULTS)
        g["lr"] = lr
        g["weight_decay"] = weight_decay if gi == 0 else 0.0
        g["params"] = ids
        param_groups.append(g)
    return {"state": state, "param_groups": param_groups}


def adamw_state_from_torch(opt_sd: dict, opt_state_template):
    """Inverse: a torch AdamW state_dict (reference checkpoint "optimizer"
    slot) → our optax opt_state with mu/nu/count restored. Resuming a
    reference run keeps its Adam moments instead of restarting them.

    Robust to two real reference behaviors: (1) the frozen weight-norm gain
    is absent from the checkpoint's param_groups when norm_last_layer=True
    (requires_grad filter in get_params_groups) — detected by the id count;
    (2) torch creates per-param state LAZILY, so params whose grads were
    cancelled for the whole run so far (cancel_gradients_last_layer during
    freeze_last_layer epochs, utils/utils.py:144-149) have ids but no state
    entry — those fall back to the template's (zero) moments, exactly
    torch's own lazy-init semantics."""
    import jax.numpy as jnp
    import optax

    adam = _find_adam_state(opt_state_template)
    mu_t = jax.tree.map(np.asarray, adam.mu)
    nu_t = jax.tree.map(np.asarray, adam.nu)
    mu_sd_template = wrapped_to_torch_state_dict(mu_t)
    nu_sd_template = wrapped_to_torch_state_dict(nu_t)
    ids = [i for g in opt_sd["param_groups"] for i in g["params"]]
    flat_names = None
    for frozen_gain in (True, False):
        groups = _grouped_param_names(mu_sd_template, frozen_gain=frozen_gain)
        names = [k for g in groups for k in g]
        if len(names) == len(ids):
            flat_names = names
            break
    if flat_names is None:
        raise ValueError(
            f"optimizer state has {len(ids)} params; expected "
            f"{len([k for g in _grouped_param_names(mu_sd_template, False) for k in g])} "
            f"(or one fewer with a frozen weight-norm gain)"
        )
    mu_sd = dict(mu_sd_template)  # excluded/lazy params keep template moments
    nu_sd = dict(nu_sd_template)
    # torch keeps a per-param step under lazy init (frozen-gain /
    # cancel_gradients_last_layer params lag behind); optax has ONE count.
    # Take the MAX across entries — the true number of optimizer steps the
    # run performed — instead of whichever id iterates last (ADVICE round 3).
    steps = []
    for name, pid in zip(flat_names, ids):
        entry = opt_sd["state"].get(pid)
        if entry is None:  # torch lazy init: no grad yet → no state entry
            continue
        mu_sd[name] = np.asarray(entry["exp_avg"], dtype=np.float32)
        nu_sd[name] = np.asarray(entry["exp_avg_sq"], dtype=np.float32)
        steps.append(float(np.asarray(entry["step"])))
    step = max(steps) if steps else float(np.asarray(adam.count))
    new_adam = optax.ScaleByAdamState(
        count=jnp.asarray(step, dtype=jnp.int32),
        mu=torch_state_dict_to_wrapped(mu_sd),
        nu=torch_state_dict_to_wrapped(nu_sd),
    )
    return _replace_adam_state(opt_state_template, new_adam)


def export_dino_pth(
    path: str,
    student_params: Dict,
    teacher_params: Dict,
    center: np.ndarray,
    epoch: int,
    args: Optional[dict] = None,
    opt_state=None,
    lr: float = 0.0005,
    weight_decay: float = 0.04,
    norm_last_layer: bool = True,
) -> None:
    """Write the LstmDistillation.py:634-646 checkpoint layout (with a real
    torch-AdamW "optimizer" slot when `opt_state` is given;
    `norm_last_layer` must match the run's flag so the frozen gain is
    excluded from param ids like the reference's get_params_groups)."""
    import torch

    def to_t(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}

    payload = {
        "student": to_t(wrapped_to_torch_state_dict(student_params, ddp_module_prefix=True)),
        "teacher": to_t(wrapped_to_torch_state_dict(teacher_params)),
        "optimizer": (
            adamw_state_to_torch(
                opt_state, lr=lr, weight_decay=weight_decay,
                norm_last_layer=norm_last_layer,
            )
            if opt_state is not None
            else {}
        ),
        "epoch": int(epoch) + 1,
        "args": args or {},
        "dino_loss": {"center": torch.from_numpy(np.asarray(center))},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(payload, path)


def import_dino_pth(path: str, opt_state_template=None):
    """Read a reference-layout checkpoint → (student_params, teacher_params,
    center, epoch[, opt_state]). Applies the strict `backbone.`-strip
    semantics of the eval loader (LstmDistillFromDinoV2Eval.py:309-313) via
    torch_state_dict_to_wrapped. With `opt_state_template`, also restores
    the torch-AdamW "optimizer" slot into optax form (the
    restart_from_checkpoint contract, utils/utils.py:152-184)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    student = torch_state_dict_to_wrapped(ckpt["student"])
    teacher = torch_state_dict_to_wrapped(ckpt["teacher"])
    center = np.asarray(ckpt.get("dino_loss", {}).get("center", np.zeros((1, 1))))
    epoch = int(ckpt.get("epoch", 0))
    if opt_state_template is None:
        return student, teacher, center, epoch
    opt_sd = ckpt.get("optimizer") or {}
    opt_state = (
        adamw_state_from_torch(opt_sd, opt_state_template)
        if opt_sd
        else opt_state_template
    )
    return student, teacher, center, epoch, opt_state
