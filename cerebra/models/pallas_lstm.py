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

The backward pass is a mirrored kernel over reversed time computing
dx_proj / dw_hh / dh accumulation in VMEM, wired via jax.custom_vjp, with
h_all/c_all saved as residuals (gates recomputed from x_proj + h_prev @ w_hh
— one extra MXU matmul instead of a (T, B, 4H) activation save).

Gate order [i, f, g, o] (torch convention) matching cerebra.models.lstm.
Measured (v5e-1, B=1024, T=460, H=96, 2 layers, fwd+bwd+sgd):
54.6k windows/s vs 31.4k for the lax.scan step.
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


def _pick_tile(B: int, tile: int, H: int = 96) -> int:
    """Largest divisor of B not above `tile`, capped so the backward kernel's
    per-step blocks + full-batch carry scratch stay inside the ~16 MB VMEM
    budget (measured: Bt=1024 @ H=128, B=4096 overflows by ~1 MB)."""
    # rough VMEM model: double-buffered streams ≈ 112·H bytes/row + 8·B·H
    # scratch; keep under ~12 MB with margin
    budget = 12 * 1024 * 1024 - 8 * B * H
    if budget <= 0:
        raise ValueError(
            f"LSTM batch {B} × hidden {H} needs {8 * B * H / 2**20:.1f} MB of "
            f"VMEM carry scratch alone — shard the batch (smaller per-device "
            f"batch or a data mesh) instead of growing the kernel"
        )
    cap = max(budget // (112 * H), 128)
    tile = min(tile, int(cap))
    if B <= tile:
        return B
    while B % tile != 0:
        tile -= 1
    return tile


def _fwd_kernel(x_proj_ref, w_hh_ref, h_all_ref, c_all_ref, h_scratch, c_scratch):
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
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    h_scratch[pl.ds(off, Bt)] = h_new
    c_scratch[pl.ds(off, Bt)] = c_new
    h_all_ref[0] = h_new.astype(h_all_ref.dtype)
    c_all_ref[0] = c_new


def _bwd_kernel(
    x_proj_ref, w_hh_t_ref, w_hh_ref, h_prev_ref, c_pair_ref, g_ref,
    dx_ref, dh_scratch, dc_scratch,
):
    """Reverse-time step (grid index maps already reversed). Carries dh
    (recurrent grad into h_t) and dc in VMEM scratch; emits dx_proj[t]
    (= dgates). dW_hh = Σ_t h_{t-1}ᵀ dgates_t is NOT accumulated here — it
    factors into ONE big XLA matmul over the emitted dgates stream, which
    removes an f32 transposed MXU matmul from every sequential step."""
    t = pl.program_id(0)
    b = pl.program_id(1)
    Bt = x_proj_ref.shape[1]
    off = b * Bt

    @pl.when(t == 0)
    def _():
        dh_scratch[pl.ds(off, Bt)] = jnp.zeros_like(dh_scratch[pl.ds(off, Bt)])
        dc_scratch[pl.ds(off, Bt)] = jnp.zeros_like(dc_scratch[pl.ds(off, Bt)])

    H = dh_scratch.shape[-1]
    h_prev = h_prev_ref[0]
    c_prev = c_pair_ref[0, :, :H]
    c_cur = c_pair_ref[0, :, H:]

    gates = (
        x_proj_ref[0]
        + jnp.dot(
            h_prev.astype(w_hh_ref.dtype), w_hh_ref[:], preferred_element_type=jnp.float32
        )
    ).astype(jnp.float32)
    i32 = jax.nn.sigmoid(gates[:, :H])
    f32_ = jax.nn.sigmoid(gates[:, H : 2 * H])
    g32 = jnp.tanh(gates[:, 2 * H : 3 * H])
    o32 = jax.nn.sigmoid(gates[:, 3 * H :])
    tanh_c32 = jnp.tanh(c_cur)

    if x_proj_ref.dtype == jnp.bfloat16:
        # bf16 mode: transcendentals + derivative PREFACTORS stay f32
        # (Mosaic rejects f32-scalar→bf16-vector splats inside sigmoid/tanh
        # on bf16), the derivative ALGEBRA runs in bf16 — 1.43× faster,
        # grad cosine vs the f32 path 0.9998 at Perils shapes
        bf = jnp.bfloat16
        i, f, g, o = i32.astype(bf), f32_.astype(bf), g32.astype(bf), o32.astype(bf)
        di_pre = (i32 * (1.0 - i32)).astype(bf)
        df_pre = (f32_ * (1.0 - f32_)).astype(bf)
        dg_pre = (1.0 - g32 * g32).astype(bf)
        do_pre = (o32 * (1.0 - o32)).astype(bf)
        dtanh = (1.0 - tanh_c32 * tanh_c32).astype(bf)
        tanh_c = tanh_c32.astype(bf)
        dh = (dh_scratch[pl.ds(off, Bt)] + g_ref[0].astype(jnp.float32)).astype(bf)
        dc32 = dc_scratch[pl.ds(off, Bt)] + (dh * o * dtanh).astype(jnp.float32)
        dc = dc32.astype(bf)
        do = dh * tanh_c * do_pre
        di = dc * g * di_pre
        df = dc * c_prev.astype(bf) * df_pre
        dg = dc * i * dg_pre
        dgates = jnp.concatenate([di, df, dg, do], axis=-1)  # (Bt, 4H) bf16
        dc_next = dc32 * f32_
    else:
        dh = dh_scratch[pl.ds(off, Bt)] + g_ref[0].astype(jnp.float32)
        dc = dc_scratch[pl.ds(off, Bt)] + dh * o32 * (1.0 - tanh_c32 * tanh_c32)
        do = dh * tanh_c32 * o32 * (1.0 - o32)
        di = dc * g32 * i32 * (1.0 - i32)
        df = dc * c_prev * f32_ * (1.0 - f32_)
        dg = dc * i32 * (1.0 - g32 * g32)
        dgates = jnp.concatenate([di, df, dg, do], axis=-1)  # (Bt, 4H)
        dc_next = dc * f32_

    dx_ref[0] = dgates.astype(dx_ref.dtype)
    dh_scratch[pl.ds(off, Bt)] = jnp.dot(
        dgates.astype(w_hh_t_ref.dtype), w_hh_t_ref[:], preferred_element_type=jnp.float32
    )
    dc_scratch[pl.ds(off, Bt)] = dc_next


def _lstm_scan_fwd_impl(x_proj: jax.Array, w_hh: jax.Array, batch_tile: int):
    T, B, four_h = x_proj.shape
    H = four_h // 4
    Bt = _pick_tile(B, batch_tile, H)
    nb = B // Bt
    h_all, c_all = pl.pallas_call(
        _fwd_kernel,
        grid=(T, nb),
        in_specs=[
            pl.BlockSpec((1, Bt, four_h), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, four_h), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Bt, H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), x_proj.dtype),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * four_h + 10 * T * B * four_h,
            bytes_accessed=x_proj.size * x_proj.dtype.itemsize + 2 * T * B * H * 4,
            transcendentals=4 * T * B * H,
        ),
        interpret=_interpret(),
    )(x_proj, w_hh)
    return h_all, c_all


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lstm_scan_pallas(
    x_proj: jax.Array, w_hh: jax.Array, batch_tile: int = _DEFAULT_BATCH_TILE
) -> jax.Array:
    """Run the LSTM recurrence over precomputed input projections.

    x_proj: (T, B, 4H) = x @ w_ih + b_ih + b_hh for every timestep;
    w_hh: (H, 4H). Returns h_all (T, B, H) in x_proj's dtype.
    """
    h_all, _ = _lstm_scan_fwd_impl(x_proj, w_hh, batch_tile)
    return h_all


def _vjp_fwd(x_proj, w_hh, batch_tile):
    h_all, c_all = _lstm_scan_fwd_impl(x_proj, w_hh, batch_tile)
    return h_all, (x_proj, w_hh, h_all, c_all)


def _vjp_bwd(batch_tile, residuals, g):
    x_proj, w_hh, h_all, c_all = residuals
    T, B, four_h = x_proj.shape
    H = four_h // 4
    Bt = _pick_tile(B, batch_tile, H)
    nb = B // Bt

    # h_prev / c_prev streams: shifted right by one (zeros at t=0)
    h_prev_all = jnp.concatenate([jnp.zeros((1, B, H), h_all.dtype), h_all[:-1]], axis=0)
    c_prev_all = jnp.concatenate([jnp.zeros((1, B, H), c_all.dtype), c_all[:-1]], axis=0)
    c_pair = jnp.concatenate([c_prev_all, c_all], axis=-1)  # (T, B, 2H)
    w_hh_t = jnp.swapaxes(w_hh, 0, 1)  # (4H, H)

    rev3 = lambda t, b: (T - 1 - t, b, 0)
    dx = pl.pallas_call(
        _bwd_kernel,
        grid=(T, nb),
        in_specs=[
            pl.BlockSpec((1, Bt, four_h), rev3, memory_space=pltpu.VMEM),  # x_proj
            pl.BlockSpec((four_h, H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, four_h), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, H), rev3, memory_space=pltpu.VMEM),  # h_prev
            pl.BlockSpec((1, Bt, 2 * H), rev3, memory_space=pltpu.VMEM),  # (c_prev, c)
            pl.BlockSpec((1, Bt, H), rev3, memory_space=pltpu.VMEM),  # upstream g
        ],
        out_specs=pl.BlockSpec((1, Bt, four_h), rev3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, four_h), x_proj.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * T * B * H * four_h,
            bytes_accessed=2 * x_proj.size * x_proj.dtype.itemsize,
            transcendentals=8 * T * B * H,
        ),
        interpret=_interpret(),
    )(x_proj, w_hh_t, w_hh, h_prev_all, c_pair, g)
    # dW_hh = Σ_t h_{t-1}ᵀ dgates_t — factored out of the sequential kernel
    # into ONE MXU matmul over the whole dgates stream. NOTE: in bf16 mode
    # dgates round to bf16 on the way out of the kernel (the in-kernel
    # accumulator used f32 terms); accumulation here is still f32, so the
    # difference is per-term rounding noise — acceptable for bf16 training,
    # exact in f32 mode (dx inherits x_proj's dtype)
    dwhh = jnp.einsum(
        "tbh,tbg->hg", h_prev_all, dx, preferred_element_type=jnp.float32
    )
    return dx, dwhh.astype(w_hh.dtype)


lstm_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)
