"""Fused Pallas LSTM recurrence — the framework's hot kernel.

The XLA `lax.scan` LSTM pays per-iteration while-loop overhead and HBM
round-trips for the carry; at Perils shapes (B≈2k, H=96, T=460) that bounds
training at ~33k windows/s. This kernel runs the WHOLE time loop inside one
pallas_call:

- grid = (T, B/Bt): TPU grid steps execute sequentially (time major, batch
  tiles minor), so VMEM scratch carries (h, c) across timesteps with zero
  HBM traffic; batch tiling keeps per-step blocks inside the 16 MB VMEM
  budget at large batch;
- w_hh lives in VMEM for the entire loop (one load);
- per step/tile: one (Bt, H) @ (H, 4H) MXU matmul + VPU gate math;
- the input projections x_proj = x @ w_ih + b for ALL timesteps are computed
  OUTSIDE by one big XLA matmul (MXU-optimal), streamed in per-step blocks.

Backward design (v5e measurements drove this): the naive reverse-time kernel
recomputes gates every step (one MXU matmul + 4 transcendentals) and was
VPU-bound at ~25 µs/step f32 — 4-8× the forward's cost. Instead the training
forward saves the six DERIVATIVE PREFACTORS the backward actually needs,

    p_i = g·i(1-i)         p_f = c_prev·f(1-f)     p_g = i(1-g²)
    p_o = tanh(c)·o(1-o)   q   = o(1-tanh²c)       f,

the same 6H of per-step stream bandwidth the recompute design already paid
(4H gates + 2H cell pair), so the backward reduces to ~8 cheap VPU ops and
one MXU matmul per step — ZERO transcendentals, zero recompute:

    dh = dh_accum + g_up        dc = dc_accum + dh·q
    dgates = [dc·p_i, dc·p_f, dc·p_g, dh·p_o]
    dh_accum = dgates @ w_hhᵀ   dc_accum = dc·f

dW_hh = Σ_t h_{t-1}ᵀ dgates_t factors into ONE big XLA matmul over the
emitted dgates stream. The inference/teacher forward is a separate
pallas_call that emits h_all only (no residual streams).

Gate order [i, f, g, o] (torch convention) matching cerebra.models.lstm.
Measured (v5e-1, B=1024, T=460, H=96): fwd+bwd 5.1 ms bf16 / 8.2 ms f32 per
layer vs 7.1 / 12.9 ms for the recompute design; full 2-layer train step
52.9k -> 67.9k windows/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEFAULT_BATCH_TILE = 1024


def _interpret() -> bool:
    """Pallas compiles only for TPU; interpret elsewhere (tests on CPU)."""
    return jax.default_backend() != "tpu"


def _pick_tile(B: int, tile: int, H: int = 96, itemsize: int = 2) -> int:
    """Largest divisor of B not above `tile`, capped so each kernel's
    double-buffered per-step streams (~11H values/row each way) plus the
    full-batch f32 carry scratch stay inside the ~16 MB VMEM budget."""
    budget = 14 * 1024 * 1024 - 8 * B * H
    if budget <= 0:
        raise ValueError(
            f"LSTM batch {B} × hidden {H} needs {8 * B * H / 2**20:.1f} MB of "
            f"VMEM carry scratch alone — shard the batch (smaller per-device "
            f"batch or a data mesh) instead of growing the kernel"
        )
    cap = max(budget // (30 * H * itemsize), 128)
    tile = min(tile, int(cap))
    if B <= tile:
        return B
    # partial tiles must be sublane-aligned (%8) or Mosaic refuses to lower
    # (the same hardware-only constraint fixed in pallas_lstm_stack)
    for t in range(tile // 8 * 8, 0, -8):
        if B % t == 0:
            return t
    if _interpret():  # no Mosaic constraints off-TPU: keep lab flexibility
        while B % tile != 0:
            tile -= 1
        return tile
    raise ValueError(
        f"batch {B} has no 8-aligned tile ≤ {tile}; pad the batch to a "
        f"multiple of 8 (lstm_stack in pallas_lstm_stack does this "
        f"automatically — prefer it for product paths)"
    )


def _gate_slices(gates, H):
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    return i, f, g, o


def _fwd_infer_kernel(x_proj_ref, w_hh_ref, h_all_ref, h_scratch, c_scratch):
    """Inference forward: h_all only (teacher/eval path — no residuals)."""
    t = pl.program_id(0)
    b = pl.program_id(1)
    Bt = x_proj_ref.shape[1]
    off = b * Bt

    @pl.when(t == 0)
    def _():
        h_scratch[pl.ds(off, Bt)] = jnp.zeros_like(h_scratch[pl.ds(off, Bt)])
        c_scratch[pl.ds(off, Bt)] = jnp.zeros_like(c_scratch[pl.ds(off, Bt)])

    h = h_scratch[pl.ds(off, Bt)]
    c = c_scratch[pl.ds(off, Bt)]
    gates = (
        x_proj_ref[0]
        + jnp.dot(h.astype(w_hh_ref.dtype), w_hh_ref[:], preferred_element_type=jnp.float32)
    ).astype(jnp.float32)
    H = h.shape[-1]
    i, f, g, o = _gate_slices(gates, H)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    h_scratch[pl.ds(off, Bt)] = h_new
    c_scratch[pl.ds(off, Bt)] = c_new
    h_all_ref[0] = h_new.astype(h_all_ref.dtype)


def _fwd_train_kernel(
    x_proj_ref, w_hh_ref, h_all_ref, prefac_ref, qf_ref, h_scratch, c_scratch
):
    """Training forward: h_all + the backward's derivative prefactors."""
    t = pl.program_id(0)
    b = pl.program_id(1)
    Bt = x_proj_ref.shape[1]
    off = b * Bt

    @pl.when(t == 0)
    def _():
        h_scratch[pl.ds(off, Bt)] = jnp.zeros_like(h_scratch[pl.ds(off, Bt)])
        c_scratch[pl.ds(off, Bt)] = jnp.zeros_like(c_scratch[pl.ds(off, Bt)])

    h = h_scratch[pl.ds(off, Bt)]
    c_prev = c_scratch[pl.ds(off, Bt)]
    gates = (
        x_proj_ref[0]
        + jnp.dot(h.astype(w_hh_ref.dtype), w_hh_ref[:], preferred_element_type=jnp.float32)
    ).astype(jnp.float32)
    H = h.shape[-1]
    i, f, g, o = _gate_slices(gates, H)
    ig = i * g
    c_new = f * c_prev + ig
    tanh_c = jnp.tanh(c_new)
    h_new = o * tanh_c
    h_scratch[pl.ds(off, Bt)] = h_new
    c_scratch[pl.ds(off, Bt)] = c_new
    h_all_ref[0] = h_new.astype(h_all_ref.dtype)
    # derivative prefactors; shared subexpressions folded (s' = s - s²,
    # p_g = i - g·ig). One wide store per output (slice-wise stores measured
    # slower than the concat's single contiguous store).
    prefac = jnp.concatenate(
        [g * (i - i * i), c_prev * (f - f * f), i - g * ig, tanh_c * (o - o * o)],
        axis=-1,
    )
    prefac_ref[0] = prefac.astype(prefac_ref.dtype)
    qf = jnp.concatenate([o - o * tanh_c * tanh_c, f], axis=-1)
    qf_ref[0] = qf.astype(qf_ref.dtype)


def _bwd_kernel(prefac_ref, qf_ref, g_ref, w_hh_t_ref, dx_ref, dh_scratch, dc_scratch):
    """Reverse-time step (grid index maps already reversed): transcendental-
    free gradient algebra on saved prefactors. dh/dc accumulate in f32 VMEM
    scratch across all T steps."""
    t = pl.program_id(0)
    b = pl.program_id(1)
    Bt = prefac_ref.shape[1]
    off = b * Bt

    @pl.when(t == 0)
    def _():
        dh_scratch[pl.ds(off, Bt)] = jnp.zeros_like(dh_scratch[pl.ds(off, Bt)])
        dc_scratch[pl.ds(off, Bt)] = jnp.zeros_like(dc_scratch[pl.ds(off, Bt)])

    H = dh_scratch.shape[-1]
    dh = dh_scratch[pl.ds(off, Bt)] + g_ref[0].astype(jnp.float32)
    dc = dc_scratch[pl.ds(off, Bt)] + dh * qf_ref[0, :, :H].astype(jnp.float32)
    if prefac_ref.dtype == jnp.bfloat16:
        # bf16 streams: keep the f32 ACCUMULATORS (dh/dc carry over 100s of
        # steps) but form the products in bf16 against the stored prefactors
        # — no full-width f32 widen, and dgates feed the MXU without a
        # post-cast (measured 1.7× vs the widened form at Perils shapes)
        dc_n, dh_n = dc.astype(jnp.bfloat16), dh.astype(jnp.bfloat16)
    else:
        dc_n, dh_n = dc, dh
    pf = prefac_ref[0]
    dgates = jnp.concatenate(
        [dc_n * pf[:, :H], dc_n * pf[:, H : 2 * H], dc_n * pf[:, 2 * H : 3 * H],
         dh_n * pf[:, 3 * H :]],
        axis=-1,
    )
    dx_ref[0] = dgates.astype(dx_ref.dtype)
    dh_scratch[pl.ds(off, Bt)] = jnp.dot(
        dgates.astype(w_hh_t_ref.dtype), w_hh_t_ref[:], preferred_element_type=jnp.float32
    )
    dc_scratch[pl.ds(off, Bt)] = dc * qf_ref[0, :, H:].astype(jnp.float32)


def _fwd_infer_impl(x_proj: jax.Array, w_hh: jax.Array, batch_tile: int) -> jax.Array:
    T, B, four_h = x_proj.shape
    H = four_h // 4
    Bt = _pick_tile(B, batch_tile, H, x_proj.dtype.itemsize)
    nb = B // Bt
    return pl.pallas_call(
        _fwd_infer_kernel,
        grid=(T, nb),
        in_specs=[
            pl.BlockSpec((1, Bt, four_h), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, four_h), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Bt, H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), x_proj.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * four_h + 10 * T * B * four_h,
            bytes_accessed=x_proj.size * x_proj.dtype.itemsize + T * B * H * x_proj.dtype.itemsize,
            transcendentals=5 * T * B * H,
        ),
        interpret=_interpret(),
    )(x_proj, w_hh)


def _fwd_train_impl(x_proj: jax.Array, w_hh: jax.Array, batch_tile: int):
    T, B, four_h = x_proj.shape
    H = four_h // 4
    Bt = _pick_tile(B, batch_tile, H, x_proj.dtype.itemsize)
    nb = B // Bt
    h_all, prefac, qf = pl.pallas_call(
        _fwd_train_kernel,
        grid=(T, nb),
        in_specs=[
            pl.BlockSpec((1, Bt, four_h), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, four_h), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Bt, H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, four_h), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, 2 * H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), x_proj.dtype),
            jax.ShapeDtypeStruct((T, B, four_h), x_proj.dtype),
            jax.ShapeDtypeStruct((T, B, 2 * H), x_proj.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * four_h + 24 * T * B * four_h,
            bytes_accessed=(x_proj.size + T * B * 7 * H) * x_proj.dtype.itemsize,
            transcendentals=5 * T * B * H,
        ),
        interpret=_interpret(),
    )(x_proj, w_hh)
    return h_all, prefac, qf


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lstm_scan_pallas(
    x_proj: jax.Array, w_hh: jax.Array, batch_tile: int = _DEFAULT_BATCH_TILE
) -> jax.Array:
    """Run the LSTM recurrence over precomputed input projections.

    x_proj: (T, B, 4H) = x @ w_ih + b_ih + b_hh for every timestep;
    w_hh: (H, 4H). Returns h_all (T, B, H) in x_proj's dtype.
    """
    return _fwd_infer_impl(x_proj, w_hh, batch_tile)


def _vjp_fwd(x_proj, w_hh, batch_tile):
    h_all, prefac, qf = _fwd_train_impl(x_proj, w_hh, batch_tile)
    return h_all, (w_hh, h_all, prefac, qf)


def _vjp_bwd(batch_tile, residuals, g):
    w_hh, h_all, prefac, qf = residuals
    T, B, four_h = prefac.shape
    H = four_h // 4
    Bt = _pick_tile(B, batch_tile, H, prefac.dtype.itemsize)
    nb = B // Bt
    w_hh_t = jnp.swapaxes(w_hh, 0, 1)  # (4H, H)

    rev3 = lambda t, b: (T - 1 - t, b, 0)
    dx = pl.pallas_call(
        _bwd_kernel,
        grid=(T, nb),
        in_specs=[
            pl.BlockSpec((1, Bt, four_h), rev3, memory_space=pltpu.VMEM),  # prefac
            pl.BlockSpec((1, Bt, 2 * H), rev3, memory_space=pltpu.VMEM),  # (q, f)
            pl.BlockSpec((1, Bt, H), rev3, memory_space=pltpu.VMEM),  # upstream g
            pl.BlockSpec((four_h, H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Bt, four_h), rev3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, four_h), prefac.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * four_h + 8 * T * B * four_h,
            bytes_accessed=2 * prefac.size * prefac.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(prefac, qf, g, w_hh_t)
    # dW_hh = Σ_{t≥1} h_{t-1}ᵀ dgates_t (the t=0 term vanishes: h_prev = 0),
    # as one explicit 2-D MXU matmul — the einsum-with-shifted-concat form
    # materialized a full (T,B,H) copy and compiled ~3× slower
    dwhh = jnp.dot(
        h_all[:-1].reshape(-1, H).T,
        dx[1:].reshape(-1, four_h),
        preferred_element_type=jnp.float32,
    )
    return dx, dwhh.astype(w_hh.dtype)


lstm_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)
