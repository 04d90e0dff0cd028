"""The reconstructed `models/lstm.Model` — the reference's flagship encoder.

The reference imports `from models.lstm import Model` in all four
LstmDistill* entry points, but `models/` is MISSING from its tree
(SURVEY.md §0). The class is reconstructed from its call sites:

- ctor `Model(input_size, lstm_size, lstm_layers, output_size,
  include_top=True)` (LstmDistillFromDinoV2Train.py:323);
- consumes (B, T, C) EEG; with include_top returns `(features, cls_pred)`
  (LstmDistillFromDinoV2Train.py:365), without it returns features only
  (LstmDistillation.py:427-428);
- used as a MultiCropWrapper backbone whose `.fc`/`.head` are replaced by
  Identity, after which its output dim equals `lstm_size`
  (LstmDistillation.py:426-440: embed_dim = lstm_size = 128 feeds
  DINOHead(128, ...)) — i.e. the raw last hidden state;
- README.md:5-8 points at the Spampinato-style Kaggle LSTM: stacked LSTM →
  last hidden state → Linear + ReLU (features) → Linear class head.

TPU-first implementation notes (this is the headline windows/sec kernel,
SURVEY.md §8 "hard parts"):
- All four gates of all timesteps' INPUT projections are ONE batched matmul
  per layer: (B·T, C) @ (C, 4H) rides the MXU before the scan starts.
- The `lax.scan` over time then carries only the recurrent half:
  (B, H) @ (H, 4H) per step — the minimal sequential work.
- Gate order follows the torch convention [i, f, g, o] so checkpoints
  export/import to the reference `.pth` layout
  (lstm.weight_ih_l{k}/weight_hh_l{k}/bias_ih_l{k}/bias_hh_l{k}).
- `param_dtype` stays float32; `dtype=bfloat16` runs the matmuls on the MXU
  in bf16 with float32 cell state.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _uniform_init(scale: float):
    def init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


class LSTMStack(nn.Module):
    """Multi-layer LSTM over (B, T, C) → all hidden states of the top layer.

    Fused-gate formulation: per layer, input projections for every timestep
    are precomputed as one (B·T, in) @ (in, 4H) matmul; the recurrence then
    runs either as a `lax.scan` (CPU/reference path) or as the fused Pallas
    TPU kernel (cerebra.models.pallas_lstm — VMEM-resident carry, ~1.7× the
    scan's training throughput at Perils shapes). `use_pallas=None` picks the
    Pallas kernel automatically on TPU backends.
    """

    hidden_size: int
    num_layers: int = 1
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None
    # False = the backward returns a ZERO input cotangent and skips its dx
    # stream/matmul (training recipes: the LSTM is the first trainable
    # layer). Leave True for any caller that differentiates w.r.t. the EEG.
    input_grad: bool = True
    # True = return only h[-1] (B, H) instead of the full (B, T, H)
    # sequence. On the Pallas path this skips the (T, B, H) top-layer HBM
    # stream in inference and streams a (B, H) cotangent (not a mostly-zero
    # (T, B, H) one) in the backward — every model head here reads h[-1].
    last_state_only: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, _ = x.shape
        H = self.hidden_size
        scale = 1.0 / (H**0.5)  # torch LSTM default init range
        compute_dtype = self.dtype or x.dtype

        # Time-major through the whole stack: ONE (B,T,C)→(T,B,C) transpose
        # in and one back out, instead of a per-layer transpose of the 4×
        # wider (B,T,4H) projections (each of those materialized a ~4H-wide
        # HBM copy fwd + its mirror in the backward — ~3 ms/step at Perils
        # shapes).
        h_seq_t = jnp.swapaxes(x.astype(compute_dtype), 0, 1)  # (T, B, C)
        in_dims = [x.shape[-1]] + [H] * (self.num_layers - 1)
        params = []
        for layer, in_dim in enumerate(in_dims):
            params.append((
                self.param(f"w_ih_l{layer}", _uniform_init(scale), (in_dim, 4 * H), self.param_dtype),
                self.param(f"w_hh_l{layer}", _uniform_init(scale), (H, 4 * H), self.param_dtype),
                self.param(f"b_ih_l{layer}", _uniform_init(scale), (4 * H,), self.param_dtype),
                self.param(f"b_hh_l{layer}", _uniform_init(scale), (4 * H,), self.param_dtype),
            ))

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            # the fused whole-stack kernel: all layers × all timesteps in one
            # pallas_call pair, raw x streamed once, dW/db accumulated
            # in-kernel, H lane-padded to the 128-wide vregs
            from cerebra.models.pallas_lstm_stack import lstm_stack, lstm_stack_last

            layers = tuple(
                (
                    w_ih.astype(compute_dtype),
                    w_hh.astype(compute_dtype),
                    (b_ih + b_hh).astype(compute_dtype),
                )
                for (w_ih, w_hh, b_ih, b_hh) in params
            )
            if self.last_state_only:
                return lstm_stack_last(h_seq_t, layers, input_grad=self.input_grad)
            h_seq_t = lstm_stack(h_seq_t, layers, input_grad=self.input_grad)
        else:
            for w_ih, w_hh, b_ih, b_hh in params:
                # one MXU matmul for all timesteps' input gates: (T, B, 4H)
                x_proj_t = (
                    h_seq_t @ w_ih.astype(compute_dtype)
                    + (b_ih + b_hh).astype(compute_dtype)
                )
                w_hh_c = w_hh.astype(compute_dtype)
                h0 = jnp.zeros((B, H), dtype=compute_dtype)
                c0 = jnp.zeros((B, H), dtype=jnp.float32)  # cell state in f32

                def step(carry, xp, w_hh_c=w_hh_c):
                    h, c = carry
                    gates = xp + h @ w_hh_c  # (B, 4H)
                    i, f, g, o = jnp.split(gates.astype(jnp.float32), 4, axis=-1)
                    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                    h_new = (jax.nn.sigmoid(o) * jnp.tanh(c_new)).astype(compute_dtype)
                    return (h_new, c_new), h_new

                (_, _), h_seq_t = jax.lax.scan(step, (h0, c0), x_proj_t)
        if self.last_state_only:
            return h_seq_t[-1]  # (B, H)
        return jnp.swapaxes(h_seq_t, 0, 1)  # (B, T, H)


class Model(nn.Module):
    """Reconstructed `models.lstm.Model` (see module docstring).

    __call__(eeg (B, T, C), features_only=False):
      features_only=True  → raw last hidden state (B, lstm_size) — the
                            MultiCropWrapper backbone path (fc/head := Id).
      include_top=False   → features = relu(fc(h_last)) (B, output_size).
      include_top=True    → (features, cls_pred (B, n_classes)).
    """

    input_size: int
    lstm_size: int
    lstm_layers: int
    output_size: int
    include_top: bool = True
    n_classes: int = 40  # the EEG-ImageNet subset (SURVEY.md §0)
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    input_grad: bool = True  # see LSTMStack.input_grad

    @nn.compact
    def __call__(
        self, x: jax.Array, features_only: bool = False
    ) -> jax.Array | Tuple[jax.Array, jax.Array]:
        h_last = LSTMStack(
            self.lstm_size, self.lstm_layers, dtype=self.dtype,
            param_dtype=self.param_dtype, input_grad=self.input_grad,
            last_state_only=True, name="lstm"
        )(x)
        if features_only:
            return h_last
        feats = nn.relu(
            nn.Dense(self.output_size, dtype=self.dtype, param_dtype=self.param_dtype, name="fc")(h_last)
        )
        if not self.include_top:
            return feats
        cls = nn.Dense(
            self.n_classes, dtype=self.dtype, param_dtype=self.param_dtype, name="head"
        )(feats)
        return feats, cls


class InlineLSTM(nn.Module):
    """The inline LSTMModel of LSTMDistill.py:112-147 (4-layer) /
    LSTMDistillRetreival.py:85-115 (2-layer): LSTM → fc(output) → class head.

    The reference "transposes" its (B, C, T) input with `.view(B, C, T)` —
    a memory reinterpretation, not a transpose (SURVEY.md §7.4). Default here
    is a real transpose; `compat_view_bug=True` reproduces the reference's
    scrambled layout for parity experiments.
    """

    input_size: int
    hidden_size: int
    num_layers: int
    output_size: int
    n_classes: int = 40
    compat_view_bug: bool = False
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        if x.shape[-1] != self.input_size and x.shape[-2] == self.input_size:
            if self.compat_view_bug:
                x = x.reshape(x.shape[0], -1).reshape(x.shape[0], x.shape[2], x.shape[1])
            else:
                x = jnp.swapaxes(x, -1, -2)
        h_last = LSTMStack(
            self.hidden_size, self.num_layers, dtype=self.dtype,
            param_dtype=self.param_dtype, last_state_only=True, name="lstm"
        )(x)
        feats = nn.Dense(self.output_size, dtype=self.dtype, param_dtype=self.param_dtype, name="fc")(h_last)
        cls = nn.Dense(self.n_classes, dtype=self.dtype, param_dtype=self.param_dtype, name="head")(feats)
        return feats, cls


# ------------------------------------------------------------------ interop
def export_torch_state_dict(params) -> dict:
    """Map flax params → the torch `.pth` naming convention so reference
    tooling (strict `backbone.`-prefix loaders, LstmDistillFromDinoV2Eval.py:
    309-313) can consume our checkpoints. Returns numpy arrays keyed like
    `lstm.weight_ih_l0` / `fc.weight` / `head.weight`."""
    import numpy as np

    out = {}
    p = params["params"] if "params" in params else params
    lstm = p.get("lstm", {})
    for name, val in lstm.items():
        kind, layer = name.rsplit("_l", 1)
        torch_kind = {"w_ih": "weight_ih", "w_hh": "weight_hh", "b_ih": "bias_ih", "b_hh": "bias_hh"}[kind]
        arr = np.asarray(val)
        if arr.ndim == 2:
            arr = arr.T  # torch stores (4H, in)
        out[f"lstm.{torch_kind}_l{layer}"] = arr
    for mod in ("fc", "head"):
        if mod in p:
            out[f"{mod}.weight"] = np.asarray(p[mod]["kernel"]).T
            out[f"{mod}.bias"] = np.asarray(p[mod]["bias"])
    return out


def import_torch_state_dict(state_dict, strip_prefixes=("module.", "backbone.")) -> dict:
    """Inverse of `export_torch_state_dict`, with the reference's prefix
    stripping (utils/utils.py:71-109, LstmDistillFromDinoV2Eval.py:309-313)."""
    import numpy as np

    cleaned = {}
    for k, v in state_dict.items():
        for pref in strip_prefixes:
            if k.startswith(pref):
                k = k[len(pref) :]
        cleaned[k] = np.asarray(v, dtype=np.float32)
    params: dict = {"lstm": {}}
    for k, v in cleaned.items():
        if k.startswith("lstm."):
            name = k[len("lstm.") :]
            kind, layer = name.rsplit("_l", 1)
            flax_kind = {
                "weight_ih": "w_ih",
                "weight_hh": "w_hh",
                "bias_ih": "b_ih",
                "bias_hh": "b_hh",
            }[kind]
            params["lstm"][f"{flax_kind}_l{layer}"] = v.T if v.ndim == 2 else v
        elif k.endswith(".weight"):
            params.setdefault(k[: -len(".weight")], {})["kernel"] = v.T
        elif k.endswith(".bias"):
            params.setdefault(k[: -len(".bias")], {})["bias"] = v
    return {"params": params}
