"""Fused multi-layer LSTM stack — one Pallas kernel for the WHOLE stack.

The per-layer kernel (cerebra.models.pallas_lstm) still pays, per layer:
an XLA x_proj matmul writing (T, B, 4H) to HBM, the kernel re-reading it,
the backward emitting dgates (T, B, 4H) to HBM, and three XLA matmuls
re-reading those streams for dW_ih / dW_hh / the inter-layer chain. At
Perils shapes that HBM ping-pong is the step's dominant cost (measured:
fwd-train 8.0 µs/step vs a 2.6 µs bandwidth bound, plus 0.8 ms/layer of
XLA-side projection matmuls).

This kernel runs ALL layers of ALL timesteps inside one pallas_call pair:

  forward (grid = (T, B/Bt), time major — sequential on TPU):
    per step, per layer: gates = x_t @ w_ih + b + h @ w_hh (two MXU
    matmuls, f32 accumulation), cell math on the VPU, carry (h, c) in f32
    VMEM scratch; the NEXT layer consumes h_new directly from registers —
    no inter-layer HBM traffic, no pre-computed x_proj. Residuals for the
    backward (h_all + derivative prefactors, see pallas_lstm.py's algebra)
    stream out per layer.

  backward (reverse-time grid): transcendental-free gradient algebra on the
    saved prefactors; dW_ih / dW_hh / db ACCUMULATE in f32 directly into
    VMEM-resident output blocks (constant index map) instead of streaming
    dgates to HBM for XLA-side contractions; the inter-layer chain
    dh_{l-1} += dgates_l @ w_ihᵀ_l is one in-kernel MXU matmul. Only dx
    (needed when the stack's input itself carries gradient, e.g. the
    recurrent autoencoder's decoder) leaves per step.

HBM traffic per (step, row): read x (C) + write h_all/prefac/qf (7H per
layer) forward; read prefac/qf/h streams + write dx (C) backward — vs the
per-layer design's additional 4H x_proj write+read, 4H dgates write + 3×4H
re-reads, per layer. Gate order [i, f, g, o] (torch convention), matching
cerebra.models.lstm checkpoint layout.

Used by LSTMStack (models/lstm.py) on TPU for any depth; parity with the
lax.scan reference is pinned in tests/test_pallas_lstm_stack.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_cap(H: int, n_layers: int, itemsize: int) -> int:
    """Largest batch tile whose double-buffered per-step blocks (~7H/layer
    each way + x) plus the per-tile f32 carries fit VMEM."""
    per_row = 8 * n_layers * H + 2 * (16 * H * n_layers + 4 * H) * itemsize
    return max(_VMEM_BUDGET // per_row, 8)


def _pick_tile(B: int, H: int, n_layers: int, itemsize: int) -> int:
    """Largest SUBLANE-ALIGNED divisor of B under the VMEM cap.

    The grid is batch-OUTER (one tile runs its whole time loop before the
    next starts), so carry scratch scales with the tile, not with B.
    Mosaic requires a block's second-to-last dim to be a multiple of 8
    unless it equals the whole array dim — so a partial tile must be
    8-aligned (a 400-batch eval once picked tile=100 and failed to lower
    on hardware; interpret mode never checks this)."""
    cap = _tile_cap(H, n_layers, itemsize)
    if B <= cap:
        return B
    for tile in range(min(B - 1, cap) // 8 * 8, 0, -8):
        if B % tile == 0:
            return tile
    raise ValueError(
        f"batch {B} has no 8-aligned tile under the VMEM cap {cap}; "
        f"pad the batch (lstm_stack does this automatically)"
    )


def _padded_batch(B: int, H: int, n_layers: int, itemsize: int) -> int:
    """Smallest padded batch ≥ B that _pick_tile can tile, balancing tile
    size across ceil(B/cap) grid rows (waste < 8 rows per grid row)."""
    cap = _tile_cap(H, n_layers, itemsize)
    if B <= cap:
        return B
    for tile in range(min(B - 1, cap) // 8 * 8, 0, -8):
        if B % tile == 0:
            return B  # an aligned divisor exists; no padding needed
    # clamp the balanced tile to the largest 8-aligned size under the cap:
    # when ceil(B/nb) lands within 7 of cap, rounding up would exceed it and
    # _pick_tile on the padded batch would silently fall back to a tiny
    # divisor (correct but slow)
    tile_max = cap // 8 * 8
    nb = -(-B // tile_max)
    tile = _round_up(-(-B // nb), 8)
    return nb * tile


def _cell(gates, c_prev, H):
    """f32 LSTM cell math + the backward's derivative prefactors."""
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    ig = i * g
    c_new = f * c_prev + ig
    tanh_c = jnp.tanh(c_new)
    h_new = o * tanh_c
    prefac = jnp.concatenate(
        [g * (i - i * i), c_prev * (f - f * f), i - g * ig, tanh_c * (o - o * o)],
        axis=-1,
    )
    qf = jnp.concatenate([o - o * tanh_c * tanh_c, f], axis=-1)
    return h_new, c_new, prefac, qf


def _fwd_train_kernel(n_layers, H, *refs):
    # refs: x, (w_ih, w_hh, b) × L, | outs: (h_all, prefac, qf) × L, | h_s, c_s
    x_ref = refs[0]
    w_refs = refs[1 : 1 + 3 * n_layers]
    out_refs = refs[1 + 3 * n_layers : 1 + 6 * n_layers]
    h_s, c_s = refs[-2], refs[-1]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_s[...] = jnp.zeros_like(h_s)
        c_s[...] = jnp.zeros_like(c_s)

    inp = x_ref[0]
    for l in range(n_layers):
        w_ih, w_hh, bias = w_refs[3 * l], w_refs[3 * l + 1], w_refs[3 * l + 2]
        h = h_s[l]
        c_prev = c_s[l]
        gates = (
            jnp.dot(inp, w_ih[:], preferred_element_type=jnp.float32)
            + jnp.dot(h.astype(w_hh.dtype), w_hh[:], preferred_element_type=jnp.float32)
            + bias[:].astype(jnp.float32)
        )
        h_new, c_new, prefac, qf = _cell(gates, c_prev, H)
        h_s[l] = h_new
        c_s[l] = c_new
        h_all_ref, prefac_ref, qf_ref = out_refs[3 * l : 3 * l + 3]
        inp = h_new.astype(x_ref.dtype)
        h_all_ref[0] = inp
        prefac_ref[0] = prefac.astype(prefac_ref.dtype)
        qf_ref[0] = qf.astype(qf_ref.dtype)


def _fwd_train_rc_kernel(n_layers, H, *refs):
    """Recompute-backward forward: store only (h_all, c_all) per layer —
    2H of residual stream instead of 7H (h + 4H prefac + 2H qf). The
    backward re-derives the gate activations from the streams (2 extra
    matmuls per layer-step), trading MXU flops for HBM bandwidth on a
    bandwidth-bound kernel."""
    # refs: x, (w_ih, w_hh, b) × L, | outs: (h_all, c_all) × L, | h_s, c_s
    x_ref = refs[0]
    w_refs = refs[1 : 1 + 3 * n_layers]
    out_refs = refs[1 + 3 * n_layers : 1 + 5 * n_layers]
    h_s, c_s = refs[-2], refs[-1]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_s[...] = jnp.zeros_like(h_s)
        c_s[...] = jnp.zeros_like(c_s)

    inp = x_ref[0]
    for l in range(n_layers):
        w_ih, w_hh, bias = w_refs[3 * l], w_refs[3 * l + 1], w_refs[3 * l + 2]
        h = h_s[l]
        c_prev = c_s[l]
        gates = (
            jnp.dot(inp, w_ih[:], preferred_element_type=jnp.float32)
            + jnp.dot(h.astype(w_hh.dtype), w_hh[:], preferred_element_type=jnp.float32)
            + bias[:].astype(jnp.float32)
        )
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c_new = f * c_prev + i * g
        h_new = o * jnp.tanh(c_new)
        h_s[l] = h_new
        c_s[l] = c_new
        h_ref, c_ref = out_refs[2 * l : 2 * l + 2]
        inp = h_new.astype(x_ref.dtype)
        h_ref[0] = inp
        c_ref[0] = c_new.astype(c_ref.dtype)


def _fwd_infer_kernel(n_layers, H, *refs):
    # refs: x, (w_ih, w_hh, b) × L | h_top_all | h_s, c_s
    x_ref = refs[0]
    w_refs = refs[1 : 1 + 3 * n_layers]
    h_top_ref = refs[1 + 3 * n_layers]
    h_s, c_s = refs[-2], refs[-1]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_s[...] = jnp.zeros_like(h_s)
        c_s[...] = jnp.zeros_like(c_s)

    inp = x_ref[0]
    for l in range(n_layers):
        w_ih, w_hh, bias = w_refs[3 * l], w_refs[3 * l + 1], w_refs[3 * l + 2]
        h = h_s[l]
        c_prev = c_s[l]
        gates = (
            jnp.dot(inp, w_ih[:], preferred_element_type=jnp.float32)
            + jnp.dot(h.astype(w_hh.dtype), w_hh[:], preferred_element_type=jnp.float32)
            + bias[:].astype(jnp.float32)
        )
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c_new = f * c_prev + i * g
        h_new = o * jnp.tanh(c_new)
        h_s[l] = h_new
        c_s[l] = c_new
        inp = h_new.astype(x_ref.dtype)
    h_top_ref[0] = inp


def _contract_rows(a, b):
    """(Bt, M)ᵀ @ (Bt, N) → (M, N) without an explicit transpose relayout."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(n_layers, H, C, need_dx, g_last_only, *refs):
    # refs: g_top, x_t, (h_prev, prefac, qf, w_hh_t, w_ih_t) × L,
    #       h_cur × (L-1) [inputs to layers 1..L-1 at time t],
    # outs: [dx if need_dx], (dwih, dwhh, db) × L | scratch: dh_s, dc_s
    # need_dx=False (input_grad=False callers: every training recipe — the
    # LSTM is the first trainable layer, so the EEG cotangent is dead) drops
    # the (T, B, C) dx stream AND layer 0's dgates @ w_ih_t matmul.
    # g_last_only=True: the upstream cotangent is a (B, H) VMEM-resident
    # block hitting only time T-1 (the h[-1]-head recipes) instead of a
    # (T, B, H) HBM stream of mostly zeros.
    g_ref = refs[0]
    x_ref = refs[1]
    per_l = refs[2 : 2 + 5 * n_layers]
    h_cur = refs[2 + 5 * n_layers : 1 + 6 * n_layers]
    n_out0 = 1 + 6 * n_layers
    dx_ref = refs[n_out0] if need_dx else None
    dw_refs = refs[n_out0 + int(need_dx) : n_out0 + int(need_dx) + 3 * n_layers]
    dh_s, dc_s = refs[-2], refs[-1]
    b = pl.program_id(0)
    t = pl.program_id(1)
    first = jnp.logical_and(t == 0, b == 0)

    @pl.when(t == 0)
    def _():
        dh_s[...] = jnp.zeros_like(dh_s)
        dc_s[...] = jnp.zeros_like(dc_s)

    @pl.when(first)
    def _():
        for r in dw_refs:
            r[...] = jnp.zeros_like(r)

    bf16 = per_l[1].dtype == jnp.bfloat16
    # the final grid row processes time 0, where h_prev must read as zero
    is_t0 = t == pl.num_programs(1) - 1
    if g_last_only:
        # grid row 0 processes time T-1 — the only step the head touches
        g_up = jnp.where(t == 0, g_ref[...].astype(jnp.float32), 0.0)
    else:
        g_up = g_ref[0].astype(jnp.float32)  # upstream grad hits the top layer
    for l in reversed(range(n_layers)):
        h_prev_ref, prefac_ref, qf_ref, w_hh_t_ref, w_ih_t_ref = per_l[5 * l : 5 * l + 5]
        dwih_ref, dwhh_ref, db_ref = dw_refs[3 * l : 3 * l + 3]
        dh = dh_s[l] + g_up
        dc = dc_s[l] + dh * qf_ref[0, :, :H].astype(jnp.float32)
        if bf16:
            # f32 accumulators, bf16 products (see pallas_lstm.py's notes)
            dc_n, dh_n = dc.astype(jnp.bfloat16), dh.astype(jnp.bfloat16)
        else:
            dc_n, dh_n = dc, dh
        pf = prefac_ref[0]
        dgates = jnp.concatenate(
            [dc_n * pf[:, :H], dc_n * pf[:, H : 2 * H], dc_n * pf[:, 2 * H : 3 * H],
             dh_n * pf[:, 3 * H :]],
            axis=-1,
        )
        # recurrent carry for this layer at the previous time step
        dh_s[l] = jnp.dot(
            dgates.astype(w_hh_t_ref.dtype), w_hh_t_ref[:],
            preferred_element_type=jnp.float32,
        )
        dc_s[l] = dc * qf_ref[0, :, H:].astype(jnp.float32)
        # weight grads accumulate into VMEM-resident f32 output blocks
        # (constant index maps — no per-step HBM dgates stream)
        h_prev = jnp.where(is_t0, jnp.zeros_like(pf[:, :H]), h_prev_ref[0])
        inp = x_ref[0] if l == 0 else h_cur[l - 1][0]
        dwih_ref[...] += _contract_rows(inp.astype(dgates.dtype), dgates)
        dwhh_ref[...] += _contract_rows(h_prev.astype(dgates.dtype), dgates)
        db_ref[...] += jnp.sum(dgates.astype(jnp.float32), axis=0, keepdims=True)
        # chain to the layer below (dx for layer 0 — skipped when unwanted)
        if l > 0 or need_dx:
            g_up = jnp.dot(
                dgates.astype(w_ih_t_ref.dtype), w_ih_t_ref[:],
                preferred_element_type=jnp.float32,
            )
    if need_dx:
        dx_ref[0] = g_up.astype(dx_ref.dtype)


def _bwd_rc_kernel(n_layers, H, C, *refs):
    """Backward with gate recomputation: streams h/c only. The recomputed
    f32 gates are BIT-IDENTICAL to the forward's (same bf16 inp/h_prev
    operands, same f32 accumulation); only the c_prev-dependent prefactor
    sees c through one extra bf16 rounding (the shipped kernel rounds the
    whole prefactor instead)."""
    # refs: g_top, x_t,
    #       (h_prev, c_prev, c_cur, w_ih, w_hh, b, w_hh_t, w_ih_t) × L,
    #       h_cur × (L-1) [inputs to layers 1..L-1 at time t],
    # outs: dx, (dwih, dwhh, db) × L | scratch: dh_s, dc_s
    g_ref = refs[0]
    x_ref = refs[1]
    per_l = refs[2 : 2 + 8 * n_layers]
    h_cur = refs[2 + 8 * n_layers : 1 + 9 * n_layers]
    dx_ref = refs[1 + 9 * n_layers]
    dw_refs = refs[2 + 9 * n_layers : 2 + 12 * n_layers]
    dh_s, dc_s = refs[-2], refs[-1]
    b = pl.program_id(0)
    t = pl.program_id(1)
    first = jnp.logical_and(t == 0, b == 0)

    @pl.when(t == 0)
    def _():
        dh_s[...] = jnp.zeros_like(dh_s)
        dc_s[...] = jnp.zeros_like(dc_s)

    @pl.when(first)
    def _():
        for r in dw_refs:
            r[...] = jnp.zeros_like(r)

    bf16 = per_l[0].dtype == jnp.bfloat16
    is_t0 = t == pl.num_programs(1) - 1  # final grid row processes time 0
    g_up = g_ref[0].astype(jnp.float32)
    for l in reversed(range(n_layers)):
        (h_prev_ref, c_prev_ref, c_cur_ref, w_ih_ref, w_hh_ref, b_ref,
         w_hh_t_ref, w_ih_t_ref) = per_l[8 * l : 8 * l + 8]
        dwih_ref, dwhh_ref, db_ref = dw_refs[3 * l : 3 * l + 3]
        inp = x_ref[0] if l == 0 else h_cur[l - 1][0]
        h_prev = jnp.where(is_t0, jnp.zeros_like(h_prev_ref[0]), h_prev_ref[0])
        c_prev = jnp.where(
            is_t0, jnp.zeros_like(c_prev_ref[0]), c_prev_ref[0]
        ).astype(jnp.float32)
        gates = (
            jnp.dot(inp, w_ih_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(h_prev, w_hh_ref[:], preferred_element_type=jnp.float32)
            + b_ref[:].astype(jnp.float32)
        )
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        tanh_c = jnp.tanh(c_cur_ref[0].astype(jnp.float32))

        dh = dh_s[l] + g_up
        dc = dc_s[l] + dh * (o - o * tanh_c * tanh_c)
        if bf16:
            dc_n, dh_n = dc.astype(jnp.bfloat16), dh.astype(jnp.bfloat16)
            pf = lambda a: a.astype(jnp.bfloat16)
        else:
            dc_n, dh_n = dc, dh
            pf = lambda a: a
        dgates = jnp.concatenate(
            [dc_n * pf(g * (i - i * i)),
             dc_n * pf(c_prev * (f - f * f)),
             dc_n * pf(i - g * (i * g)),
             dh_n * pf(tanh_c * (o - o * o))],
            axis=-1,
        )
        dh_s[l] = jnp.dot(
            dgates.astype(w_hh_t_ref.dtype), w_hh_t_ref[:],
            preferred_element_type=jnp.float32,
        )
        dc_s[l] = dc * f
        dwih_ref[...] += _contract_rows(inp.astype(dgates.dtype), dgates)
        dwhh_ref[...] += _contract_rows(h_prev.astype(dgates.dtype), dgates)
        db_ref[...] += jnp.sum(dgates.astype(jnp.float32), axis=0, keepdims=True)
        g_up = jnp.dot(
            dgates.astype(w_ih_t_ref.dtype), w_ih_t_ref[:],
            preferred_element_type=jnp.float32,
        )
    dx_ref[0] = g_up.astype(dx_ref.dtype)


def _row_spec(width, Bt):
    return pl.BlockSpec((1, Bt, width), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM)


def _rev_row_spec(width, Bt, T):
    return pl.BlockSpec(
        (1, Bt, width), lambda b, t: (T - 1 - t, b, 0), memory_space=pltpu.VMEM
    )


def _whole_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, t: (0,) * nd, memory_space=pltpu.VMEM)


def _layer_dims(x, layers):
    C = x.shape[-1]
    H = layers[0][1].shape[0]
    for l, (w_ih, w_hh, bias) in enumerate(layers):
        expect_in = C if l == 0 else H
        if w_ih.shape != (expect_in, 4 * H) or w_hh.shape != (H, 4 * H):
            raise ValueError(
                f"layer {l}: w_ih {w_ih.shape} / w_hh {w_hh.shape} do not "
                f"form a uniform stack (in={expect_in}, H={H})"
            )
    return C, H


def _fwd_train_impl(x, layers):
    T, B, C = x.shape
    L = len(layers)
    _, H = _layer_dims(x, layers)
    Bt = _pick_tile(B, H, L, x.dtype.itemsize)
    nb = B // Bt
    four_h = 4 * H

    in_specs = [_row_spec(C, Bt)]
    args = [x]
    for w_ih, w_hh, bias in layers:
        in_specs += [
            _whole_spec(w_ih.shape),
            _whole_spec(w_hh.shape),
            _whole_spec((1, four_h)),
        ]
        args += [w_ih, w_hh, bias.reshape(1, four_h)]
    out_specs, out_shapes = [], []
    for _ in range(L):
        out_specs += [_row_spec(H, Bt), _row_spec(four_h, Bt), _row_spec(2 * H, Bt)]
        out_shapes += [
            jax.ShapeDtypeStruct((T, B, H), x.dtype),
            jax.ShapeDtypeStruct((T, B, four_h), x.dtype),
            jax.ShapeDtypeStruct((T, B, 2 * H), x.dtype),
        ]
    outs = pl.pallas_call(
        functools.partial(_fwd_train_kernel, L, H),
        grid=(nb, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((L, Bt, H), jnp.float32),
            pltpu.VMEM((L, Bt, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    return outs  # [(h_all, prefac, qf)] × L flattened


def _fwd_infer_impl(x, layers):
    T, B, C = x.shape
    L = len(layers)
    _, H = _layer_dims(x, layers)
    Bt = _pick_tile(B, H, L, x.dtype.itemsize)
    nb = B // Bt
    four_h = 4 * H

    in_specs = [_row_spec(C, Bt)]
    args = [x]
    for w_ih, w_hh, bias in layers:
        in_specs += [
            _whole_spec(w_ih.shape),
            _whole_spec(w_hh.shape),
            _whole_spec((1, four_h)),
        ]
        args += [w_ih, w_hh, bias.reshape(1, four_h)]
    return pl.pallas_call(
        functools.partial(_fwd_infer_kernel, L, H),
        grid=(nb, T),
        in_specs=in_specs,
        out_specs=_row_spec(H, Bt),
        out_shape=jax.ShapeDtypeStruct((T, B, H), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((L, Bt, H), jnp.float32),
            pltpu.VMEM((L, Bt, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)


def _fwd_train_rc_impl(x, layers):
    T, B, C = x.shape
    L = len(layers)
    _, H = _layer_dims(x, layers)
    Bt = _pick_tile(B, H, L, x.dtype.itemsize)
    nb = B // Bt
    four_h = 4 * H

    in_specs = [_row_spec(C, Bt)]
    args = [x]
    for w_ih, w_hh, bias in layers:
        in_specs += [
            _whole_spec(w_ih.shape),
            _whole_spec(w_hh.shape),
            _whole_spec((1, four_h)),
        ]
        args += [w_ih, w_hh, bias.reshape(1, four_h)]
    out_specs, out_shapes = [], []
    for _ in range(L):
        out_specs += [_row_spec(H, Bt), _row_spec(H, Bt)]
        out_shapes += [
            jax.ShapeDtypeStruct((T, B, H), x.dtype),
            jax.ShapeDtypeStruct((T, B, H), x.dtype),
        ]
    outs = pl.pallas_call(
        functools.partial(_fwd_train_rc_kernel, L, H),
        grid=(nb, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((L, Bt, H), jnp.float32),
            pltpu.VMEM((L, Bt, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    return outs  # [(h_all, c_all)] × L flattened


@jax.custom_vjp
def lstm_stack_pallas_rc(
    x: jax.Array, layers: Sequence[Tuple[jax.Array, jax.Array, jax.Array]]
):
    """`lstm_stack_pallas` with the recompute backward: the forward stores
    only (h, c) per layer (2H instead of 7H of residual stream) and the
    backward re-derives gate activations with 2 extra matmuls per
    layer-step. Same contract, same inference kernel."""
    layers = tuple(tuple(l) for l in layers)
    return _fwd_infer_impl(x, layers)


def _vjp_fwd_rc(x, layers):
    layers = tuple(tuple(l) for l in layers)
    outs = _fwd_train_rc_impl(x, layers)
    h_top = outs[2 * (len(layers) - 1)]
    return h_top, (x, layers, outs)


def _vjp_bwd_rc(residuals, g):
    x, layers, outs = residuals
    T, B, C = x.shape
    L = len(layers)
    H = layers[0][1].shape[0]
    four_h = 4 * H
    Bt = _pick_tile(B, H, L, x.dtype.itemsize)
    nb = B // Bt

    prev_spec = pl.BlockSpec(
        (1, Bt, H),
        lambda b, t: (jnp.maximum(T - 2 - t, 0), b, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [_rev_row_spec(H, Bt, T), _rev_row_spec(C, Bt, T)]
    args = [g.astype(x.dtype), x]
    for l in range(L):
        h_all, c_all = outs[2 * l : 2 * l + 2]
        w_ih, w_hh, bias = layers[l]
        in_dim = C if l == 0 else H
        in_specs += [
            prev_spec,                       # h at t-1
            prev_spec,                       # c at t-1
            _rev_row_spec(H, Bt, T),         # c at t
            _whole_spec((in_dim, four_h)),   # w_ih (recompute)
            _whole_spec((H, four_h)),        # w_hh (recompute)
            _whole_spec((1, four_h)),        # bias (recompute)
            _whole_spec((four_h, H)),        # w_hh^T (chain)
            _whole_spec((four_h, in_dim)),   # w_ih^T (chain)
        ]
        args += [
            h_all, c_all, c_all, w_ih, w_hh, bias.reshape(1, four_h),
            jnp.swapaxes(w_hh, 0, 1), jnp.swapaxes(w_ih, 0, 1),
        ]
    for l in range(L - 1):
        in_specs.append(_rev_row_spec(H, Bt, T))
        args.append(outs[2 * l])
    out_specs = [_rev_row_spec(C, Bt, T)]
    out_shapes = [jax.ShapeDtypeStruct((T, B, C), x.dtype)]
    for l in range(L):
        in_dim = C if l == 0 else H
        out_specs += [
            _whole_spec((in_dim, four_h)),
            _whole_spec((H, four_h)),
            _whole_spec((1, four_h)),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((in_dim, four_h), jnp.float32),
            jax.ShapeDtypeStruct((H, four_h), jnp.float32),
            jax.ShapeDtypeStruct((1, four_h), jnp.float32),
        ]
    res = pl.pallas_call(
        functools.partial(_bwd_rc_kernel, L, H, C),
        grid=(nb, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((L, Bt, H), jnp.float32),
            pltpu.VMEM((L, Bt, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    dx = res[0]
    dlayers = []
    for l in range(L):
        dwih, dwhh, db = res[1 + 3 * l : 4 + 3 * l]
        w_ih, w_hh, bias = layers[l]
        dlayers.append(
            (dwih.astype(w_ih.dtype), dwhh.astype(w_hh.dtype), db[0].astype(bias.dtype))
        )
    return dx, tuple(dlayers)


lstm_stack_pallas_rc.defvjp(_vjp_fwd_rc, _vjp_bwd_rc)


@jax.custom_vjp
def lstm_stack_pallas(x: jax.Array, layers: Sequence[Tuple[jax.Array, jax.Array, jax.Array]]):
    """Fused multi-layer LSTM over time-major input.

    x: (T, B, C); layers: sequence of (w_ih (in, 4H), w_hh (H, 4H), b (4H,))
    with in = C for layer 0 and H after. Returns the TOP layer's hidden
    states (T, B, H) in x's dtype. All layers share one hidden size H
    (the torch nn.LSTM contract the reference's models assume).
    """
    layers = tuple(tuple(l) for l in layers)
    return _fwd_infer_impl(x, layers)


def _vjp_fwd(x, layers):
    layers = tuple(tuple(l) for l in layers)
    outs = _fwd_train_impl(x, layers)
    h_top = outs[3 * (len(layers) - 1)]
    return h_top, (x, layers, outs)


def _vjp_bwd(residuals, g, need_dx: bool = True, g_last_only: bool = False):
    x, layers, outs = residuals
    T, B, C = x.shape
    L = len(layers)
    H = layers[0][1].shape[0]
    four_h = 4 * H
    Bt = _pick_tile(B, H, L, x.dtype.itemsize)
    nb = B // Bt

    # h_all[l] at time t-1 feeds dW_hh[l]: reversed index map shifted one
    # row further into the past; the time-0 row is masked to zero in-kernel
    prev_spec = pl.BlockSpec(
        (1, Bt, H),
        lambda b, t: (jnp.maximum(T - 2 - t, 0), b, 0),
        memory_space=pltpu.VMEM,
    )
    if g_last_only:
        # g is (B, H): one VMEM-resident block per batch tile, not a stream
        g_spec = pl.BlockSpec((Bt, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM)
    else:
        g_spec = _rev_row_spec(H, Bt, T)
    in_specs = [g_spec, _rev_row_spec(C, Bt, T)]
    args = [g.astype(x.dtype), x]
    for l in range(L):
        h_all, prefac, qf = outs[3 * l : 3 * l + 3]
        w_ih, w_hh, _ = layers[l]
        in_specs += [
            prev_spec,
            _rev_row_spec(four_h, Bt, T),
            _rev_row_spec(2 * H, Bt, T),
            _whole_spec((four_h, H)),
            _whole_spec((four_h, C if l == 0 else H)),
        ]
        args += [h_all, prefac, qf, jnp.swapaxes(w_hh, 0, 1), jnp.swapaxes(w_ih, 0, 1)]
    for l in range(L - 1):
        # h_all[l] at time t: layer l+1's input row for dW_ih[l+1]
        in_specs.append(_rev_row_spec(H, Bt, T))
        args.append(outs[3 * l])
    out_specs = [_rev_row_spec(C, Bt, T)] if need_dx else []
    out_shapes = [jax.ShapeDtypeStruct((T, B, C), x.dtype)] if need_dx else []
    for l in range(L):
        in_dim = C if l == 0 else H
        out_specs += [
            _whole_spec((in_dim, four_h)),
            _whole_spec((H, four_h)),
            _whole_spec((1, four_h)),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((in_dim, four_h), jnp.float32),
            jax.ShapeDtypeStruct((H, four_h), jnp.float32),
            jax.ShapeDtypeStruct((1, four_h), jnp.float32),
        ]
    res = pl.pallas_call(
        functools.partial(_bwd_kernel, L, H, C, need_dx, g_last_only),
        grid=(nb, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((L, Bt, H), jnp.float32),
            pltpu.VMEM((L, Bt, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    n_dx = int(need_dx)
    dx = res[0] if need_dx else jnp.zeros_like(x)
    dlayers = []
    for l in range(L):
        dwih, dwhh, db = res[n_dx + 3 * l : n_dx + 3 + 3 * l]
        w_ih, w_hh, bias = layers[l]
        dlayers.append(
            (dwih.astype(w_ih.dtype), dwhh.astype(w_hh.dtype), db[0].astype(bias.dtype))
        )
    return dx, tuple(dlayers)


lstm_stack_pallas.defvjp(_vjp_fwd, _vjp_bwd)


@jax.custom_vjp
def lstm_stack_pallas_ndx(x: jax.Array, layers):
    """`lstm_stack_pallas` whose backward SKIPS the input cotangent.

    For callers where the LSTM is the first trainable layer (every training
    recipe here: the EEG upstream is data plus a fixed filter), the (T, B, C)
    dx stream and layer 0's dgates @ w_ih_t matmul are dead work XLA cannot
    eliminate from an opaque pallas_call. The returned x-cotangent is ZEROS —
    never differentiate through this variant w.r.t. the input."""
    layers = tuple(tuple(l) for l in layers)
    return _fwd_infer_impl(x, layers)


def _vjp_bwd_no_dx(residuals, g):
    return _vjp_bwd(residuals, g, need_dx=False)


lstm_stack_pallas_ndx.defvjp(_vjp_fwd, _vjp_bwd_no_dx)


def _fwd_infer_last_kernel(n_layers, H, *refs):
    # refs: x, (w_ih, w_hh, b) × L | h_last (Bt, H) | h_s, c_s
    # The h_last block has a CONSTANT index map per batch tile: it lives in
    # VMEM across the whole time loop and is flushed once — no (T, B, H)
    # HBM stream for heads that only read h[-1].
    x_ref = refs[0]
    w_refs = refs[1 : 1 + 3 * n_layers]
    h_last_ref = refs[1 + 3 * n_layers]
    h_s, c_s = refs[-2], refs[-1]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_s[...] = jnp.zeros_like(h_s)
        c_s[...] = jnp.zeros_like(c_s)

    inp = x_ref[0]
    for l in range(n_layers):
        w_ih, w_hh, bias = w_refs[3 * l], w_refs[3 * l + 1], w_refs[3 * l + 2]
        h = h_s[l]
        c_prev = c_s[l]
        gates = (
            jnp.dot(inp, w_ih[:], preferred_element_type=jnp.float32)
            + jnp.dot(h.astype(w_hh.dtype), w_hh[:], preferred_element_type=jnp.float32)
            + bias[:].astype(jnp.float32)
        )
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c_new = f * c_prev + i * g
        h_new = o * jnp.tanh(c_new)
        h_s[l] = h_new
        c_s[l] = c_new
        inp = h_new.astype(x_ref.dtype)
    h_last_ref[...] = inp  # revisited block: time T-1's write is the flush


def _fwd_infer_last_impl(x, layers):
    T, B, C = x.shape
    L = len(layers)
    _, H = _layer_dims(x, layers)
    Bt = _pick_tile(B, H, L, x.dtype.itemsize)
    nb = B // Bt
    four_h = 4 * H

    in_specs = [_row_spec(C, Bt)]
    args = [x]
    for w_ih, w_hh, bias in layers:
        in_specs += [
            _whole_spec(w_ih.shape),
            _whole_spec(w_hh.shape),
            _whole_spec((1, four_h)),
        ]
        args += [w_ih, w_hh, bias.reshape(1, four_h)]
    return pl.pallas_call(
        functools.partial(_fwd_infer_last_kernel, L, H),
        grid=(nb, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Bt, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((L, Bt, H), jnp.float32),
            pltpu.VMEM((L, Bt, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)


def _make_last_variant(need_dx: bool):
    """custom_vjp producing ONLY h[-1] (B, H) — the shape every model head
    here consumes. Forward-inference skips the (T, B, H) h_top HBM stream;
    the backward takes a (B, H) cotangent instead of streaming a (T, B, H)
    tensor of mostly zeros that XLA would otherwise also have to
    materialize. need_dx=False additionally drops the dx stream (see
    lstm_stack_pallas_ndx)."""

    @jax.custom_vjp
    def f(x, layers):
        layers = tuple(tuple(l) for l in layers)
        return _fwd_infer_last_impl(x, layers)

    def fwd(x, layers):
        layers = tuple(tuple(l) for l in layers)
        outs = _fwd_train_impl(x, layers)
        h_top = outs[3 * (len(layers) - 1)]
        return h_top[-1], (x, layers, outs)

    def bwd(residuals, g):
        return _vjp_bwd(residuals, g, need_dx=need_dx, g_last_only=True)

    f.defvjp(fwd, bwd)
    return f


lstm_stack_pallas_last = _make_last_variant(need_dx=True)
lstm_stack_pallas_last_ndx = _make_last_variant(need_dx=False)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def lstm_stack(
    x: jax.Array,
    layers: Sequence[Tuple[jax.Array, jax.Array, jax.Array]],
    pad_lanes: int | None = None,
    input_grad: bool = True,
) -> jax.Array:
    """lstm_stack_pallas with hidden-size LANE PADDING.

    TPU vregs are 128 lanes wide; an H that is not a multiple of 128 (the
    reference's H=96) misaligns every gate slice, forcing cross-lane rotates
    on most VPU ops (measured ~1.7× per-element overhead vs H=128). This
    wrapper zero-pads each gate block of every weight to Hp = ceil(H/128)·128
    and crops the result. The pad lanes stay EXACTLY zero through the
    recurrence (zero weights/bias give i=f=o=0.5, g=0 ⇒ c=h=0) and through
    the backward (zero w_hh/w_ih pad rows/cols kill every pad gradient), so
    values and gradients are bit-identical to the unpadded kernel up to f32
    associativity. Autodiff flows through the pad/crop, so the kernel's
    custom VJP runs entirely in padded space.

    pad_lanes: None = auto (128 on TPU, off elsewhere); 1 disables.
    input_grad: False drops the dx stream + layer-0 dx matmul from the
      backward (the x-cotangent comes back as ZEROS) — use only when the
      input is non-differentiable data, i.e. the LSTM is the first
      trainable layer, as in every training recipe here.
    """
    x, layers, B, Bp, H, Hp = _pad_for_kernel(x, layers, pad_lanes)
    h = (lstm_stack_pallas if input_grad else lstm_stack_pallas_ndx)(x, layers)
    if Bp != B:
        h = h[:, :B]
    return h[:, :, :H] if Hp != H else h


def _pad_for_kernel(x, layers, pad_lanes):
    """Lane-pad H to the 128-wide vregs and 8-align the batch (see
    lstm_stack's docstring for why both are safe/bit-exact)."""
    layers = tuple(tuple(l) for l in layers)
    H = layers[0][1].shape[0]
    if pad_lanes is None:
        pad_lanes = 128 if jax.default_backend() == "tpu" else 1
    Hp = _round_up(H, pad_lanes)

    if Hp != H:

        def pad_gate_cols(w, rows):
            w4 = w.reshape(rows, 4, H)
            return jnp.pad(w4, ((0, 0), (0, 0), (0, Hp - H))).reshape(rows, 4 * Hp)

        padded = []
        for l, (w_ih, w_hh, b) in enumerate(layers):
            if l > 0:
                w_ih = jnp.pad(w_ih, ((0, Hp - H), (0, 0)))
            w_ih_p = pad_gate_cols(w_ih, w_ih.shape[0])
            w_hh_p = pad_gate_cols(jnp.pad(w_hh, ((0, Hp - H), (0, 0))), Hp)
            b_p = jnp.pad(b.reshape(4, H), ((0, 0), (0, Hp - H))).reshape(4 * Hp)
            padded.append((w_ih_p, w_hh_p, b_p))
        layers = tuple(padded)

    # BATCH padding: partial tiles must be 8-aligned on TPU (see _pick_tile);
    # pad rows are zeros, their outputs/gradients are cropped by the callers
    B = x.shape[1]
    Bp = _padded_batch(B, Hp, len(layers), x.dtype.itemsize)
    if Bp != B:
        x = jnp.pad(x, ((0, 0), (0, Bp - B), (0, 0)))
    return x, layers, B, Bp, H, Hp


def lstm_stack_last(
    x: jax.Array,
    layers: Sequence[Tuple[jax.Array, jax.Array, jax.Array]],
    pad_lanes: int | None = None,
    input_grad: bool = True,
) -> jax.Array:
    """`lstm_stack` returning ONLY the final hidden state (B, H).

    Every model head in this repo consumes h[-1]; producing just it lets
    the inference kernel keep the top layer's states VMEM-resident (no
    (T, B, H) HBM stream) and the backward consume a (B, H) cotangent
    instead of a zero-padded (T, B, H) one. Same lane/batch padding and
    input_grad semantics as `lstm_stack`."""
    x, layers, B, Bp, H, Hp = _pad_for_kernel(x, layers, pad_lanes)
    h = (lstm_stack_pallas_last if input_grad else lstm_stack_pallas_last_ndx)(x, layers)
    if Bp != B:
        h = h[:B]
    return h[:, :H] if Hp != H else h
