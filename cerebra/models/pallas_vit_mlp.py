"""Fused ViT MLP half-block — one Pallas kernel pair for
``x + fc2(gelu(fc1(LN(x))))``.

Half of the transformer-block megakernel the round-3 dinoparts decomposition
pointed at (reference block: dino/vision_transformer.py:95-132; our XLA
version: cerebra.models.vit.Block). XLA runs this section as two dots plus
fusion regions whose intermediates (LN output, fc1 output, GELU output,
fc2 output) round-trip HBM at (M, 384/1536) bf16 each; here one kernel
reads the row tile once and writes the residual-added output once.

Backward is flash-style RECOMPUTE: the forward saves NOTHING (no LN stats,
no fc1/GELU activations — at main_dino global scale those saves are ~86 MB
of HBM stream per block). The backward kernel re-derives LN/fc1/GELU from x
inside VMEM (one extra (TM,D)@(D,F) MXU matmul per tile — the same
trade the fused LSTM stack makes) and accumulates dW1/db1/dW2/db2/dγ/dβ
into VMEM-resident f32 output blocks with constant index maps (grid is
sequential on TPU), so no dgates-style gradient streams hit HBM either.

Numerics: LN statistics and all gradient accumulation in f32; the two MXU
matmuls take bf16 operands with f32 accumulation when x is bf16 (matching
flax Dense(dtype=bf16) semantics). GELU is the exact-erf form (torch
nn.GELU default, like cerebra.models.vit.Block).

Zero row-padding is exact: padded rows produce garbage outputs that callers
slice away, and their zero cotangents contribute exactly zero to every
weight gradient (all paths are linear in dOut).

Parity with the XLA Block MLP half is pinned in
tests/test_pallas_vit_mlp.py; the ship/reject measurement lives in
benchmarks/kernel_lab.py::exp_vitmlp.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6  # flax nn.LayerNorm default, as used by vit.Block
_SQRT_2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vmem_params(limit_mib: int):
    """Raise Mosaic's scoped-vmem stack limit (default 16 MiB). The fused
    attention backward holds two (Np, Np) f32 score/d-score blocks plus the
    recomputed head tensors in VMEM at the recipe's global-crop shape
    (Np=800) — 16.61 MiB, 3.9% over the default limit (round-5 hardware
    smoke: "Scoped allocation ... exceeded scoped vmem limit by 622.0K").
    v5e VMEM is 128 MiB; a 64 MiB cap leaves the other half for Mosaic's
    input/output double buffering. Interpret mode takes no compiler params."""
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=limit_mib * 1024 * 1024)


def _erf(x):
    """erf for Mosaic: the TPU Pallas lowering has no ``erf`` primitive
    (NotImplementedError at lowering.py:1225, caught by the round-5 hardware
    smoke — interpret mode accepts it). Abramowitz & Stegun 7.1.26 rational
    approximation, max abs error 1.5e-7 over the line — below f32 noise for
    the GELU inputs seen here. exp/where/abs all lower on Mosaic."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.where(x < 0, -y, y)


def _gelu_exact(h):
    return 0.5 * h * (1.0 + _erf(h / _SQRT_2))


def _dgelu_exact(h):
    return 0.5 * (1.0 + _erf(h / _SQRT_2)) + h * jnp.exp(-0.5 * h * h) * _INV_SQRT_2PI


def _layernorm_f32(x):
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    return xc * rstd


def _contract_rows(a, b):
    """(TM, M)ᵀ @ (TM, N) → (M, N) without an explicit transpose relayout."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _matmul(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _matmul_bt(a, b):
    """a @ bᵀ contracting lane dims: (TM, N) @ (M, N)ᵀ → (TM, M)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(x_ref, s_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref, *, cdt, scaled):
    x = x_ref[...].astype(jnp.float32)
    xn = _layernorm_f32(x)
    y1 = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y1 = y1.astype(cdt)
    h = _matmul(y1, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    gh = _gelu_exact(h).astype(cdt)
    out = _matmul(gh, w2_ref[...]) + b2_ref[...].astype(jnp.float32)
    if scaled:
        # per-row branch scale (stochastic depth): out = x + s·branch,
        # with the mask/keep scale applied INSIDE the kernel instead of a
        # separate delta-recompute elementwise pass outside
        out = out * s_ref[...][:, :1].astype(jnp.float32)
    out_ref[...] = (x + out).astype(out_ref.dtype)


def _bwd_kernel(
    x_ref, dout_ref, s_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
    dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *, cdt,
    scaled,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in (dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            r[...] = jnp.zeros_like(r)

    x = x_ref[...].astype(jnp.float32)
    dout_raw = dout_ref[...].astype(jnp.float32)
    # the branch cotangent picks up the per-row scale; the residual
    # passthrough (dx = dout + …) does NOT
    dout = (
        dout_raw * s_ref[...][:, :1].astype(jnp.float32) if scaled else dout_raw
    )
    g = g_ref[...].astype(jnp.float32)

    # recompute the forward intermediates in VMEM
    xn = _layernorm_f32(x)
    y1 = (xn * g + b_ref[...].astype(jnp.float32)).astype(cdt)
    h = _matmul(y1, w1_ref[...]) + b1_ref[...].astype(jnp.float32)

    dt = cdt
    dout_n = dout.astype(dt)
    # fc2
    gh = _gelu_exact(h).astype(dt)
    dw2_ref[...] += _contract_rows(gh, dout_n)
    db2_ref[...] += jnp.sum(dout, axis=0, keepdims=True)
    dgh = _matmul_bt(dout_n, w2_ref[...])
    # gelu
    dh = dgh * _dgelu_exact(h)
    dh_n = dh.astype(dt)
    # fc1
    dw1_ref[...] += _contract_rows(y1, dh_n)
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dy1 = _matmul_bt(dh_n, w1_ref[...])
    # LN affine
    dg_ref[...] += jnp.sum(dy1 * xn, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dy1, axis=0, keepdims=True)
    dxn = dy1 * g
    # LN core backward (per row)
    m1 = jnp.mean(dxn, axis=1, keepdims=True)
    m2 = jnp.mean(dxn * xn, axis=1, keepdims=True)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    rstd = jax.lax.rsqrt(jnp.mean(xc * xc, axis=1, keepdims=True) + _LN_EPS)
    dx_ln = rstd * (dxn - m1 - xn * m2)
    dx_ref[...] = (dout_raw + dx_ln).astype(dx_ref.dtype)


def _row_spec(width: int, tile: int):
    return pl.BlockSpec((tile, width), lambda i: (i, 0))


def _whole_spec(shape: Tuple[int, ...]):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape))


def _pad_rows(x: jax.Array, tile: int) -> jax.Array:
    pad = -x.shape[0] % tile
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


def _prep(params, dtype):
    g, b, w1, b1, w2, b2 = params
    cast = lambda a: a.astype(dtype)
    return (
        cast(g).reshape(1, -1), cast(b).reshape(1, -1), cast(w1),
        cast(b1).reshape(1, -1), cast(w2), cast(b2).reshape(1, -1),
    )


def fused_mlp_residual(x, g, b, w1, b1, w2, b2, tile_m: int = 256,
                       compute_dtype=None, scale=None):
    """x + fc2(gelu_exact(fc1(layernorm(x)·g + b))) over rows of x (M, D).

    Params keep their caller dtype (typically f32 flax params); the MXU
    matmuls run in ``compute_dtype`` (default x.dtype) like flax
    Dense(dtype=...), while the residual STREAM (x in, out, dx) keeps
    x.dtype — so an f32 token stream through bf16 blocks stays f32, exactly
    like the unfused Block (x + Dense(dtype=bf16)(...) promotes to f32).

    ``scale`` (optional, (M,) f32): per-row residual-branch multiplier —
    out = x + scale·branch. Used for stochastic depth (the per-sample
    mask/keep factor applied INSIDE the kernel instead of recovering the
    branch outside with extra elementwise passes). Treated as a constant:
    no cotangent flows to it."""
    M = x.shape[0]
    if scale is None:
        s2 = jnp.ones((1, 128), jnp.float32)  # placeholder block, unused
        return _mlp_core(x, s2, g, b, w1, b1, w2, b2, tile_m, compute_dtype,
                         False)
    s2 = jnp.broadcast_to(
        jax.lax.stop_gradient(scale).reshape(M, 1).astype(jnp.float32),
        (M, 128),
    )
    return _mlp_core(x, s2, g, b, w1, b1, w2, b2, tile_m, compute_dtype, True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _mlp_core(x, s2, g, b, w1, b1, w2, b2, tile_m, compute_dtype, scaled):
    out, _ = _fwd(x, s2, g, b, w1, b1, w2, b2, tile_m, compute_dtype, scaled)
    return out


def _pad_scale(s2, tile_m, scaled):
    if not scaled:
        return jnp.ones((tile_m, 128), jnp.float32)
    return _pad_rows(s2, tile_m)


def _scale_spec(tile: int, scaled: bool):
    # unscaled: one shared all-ones block; scaled: per-row-tile blocks
    return pl.BlockSpec((tile, 128), (lambda i: (0, 0)) if not scaled else (lambda i: (i, 0)))


def _fwd(x, s2, g, b, w1, b1, w2, b2, tile_m, compute_dtype, scaled):
    M, D = x.shape
    F = w1.shape[1]
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    xp = _pad_rows(x, tile_m)
    sp = _pad_scale(s2, tile_m, scaled)
    grid = (xp.shape[0] // tile_m,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cdt=cdt, scaled=scaled),
        grid=grid,
        in_specs=[
            _row_spec(D, tile_m), _scale_spec(tile_m, scaled),
            _whole_spec((1, D)), _whole_spec((1, D)),
            _whole_spec((D, F)), _whole_spec((1, F)),
            _whole_spec((F, D)), _whole_spec((1, D)),
        ],
        out_specs=_row_spec(D, tile_m),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=_interpret(),
    )(xp, sp, *_prep((g, b, w1, b1, w2, b2), cdt))
    return out[:M], (x, s2, g, b, w1, b1, w2, b2)


def _bwd(tile_m, compute_dtype, scaled, res, dout):
    x, s2, g, b, w1, b1, w2, b2 = res
    M, D = x.shape
    F = w1.shape[1]
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    xp = _pad_rows(x, tile_m)
    sp = _pad_scale(s2, tile_m, scaled)
    dp = _pad_rows(dout.astype(x.dtype), tile_m)
    grid = (xp.shape[0] // tile_m,)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cdt=cdt, scaled=scaled),
        grid=grid,
        in_specs=[
            _row_spec(D, tile_m), _row_spec(D, tile_m),
            _scale_spec(tile_m, scaled),
            _whole_spec((1, D)), _whole_spec((1, D)),
            _whole_spec((D, F)), _whole_spec((1, F)), _whole_spec((F, D)),
        ],
        out_specs=[
            _row_spec(D, tile_m),
            _whole_spec((1, D)), _whole_spec((1, D)),
            _whole_spec((D, F)), _whole_spec((1, F)),
            _whole_spec((F, D)), _whole_spec((1, D)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xp.shape, x.dtype),
            jax.ShapeDtypeStruct((1, D), f32), jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, F), f32), jax.ShapeDtypeStruct((1, F), f32),
            jax.ShapeDtypeStruct((F, D), f32), jax.ShapeDtypeStruct((1, D), f32),
        ],
        interpret=_interpret(),
    )(xp, dp, sp, *_prep((g, b, w1, b1, w2, b2), cdt)[:5])
    dx, dg, db, dw1, db1, dw2, db2 = outs
    return (
        dx[:M].astype(x.dtype),
        jnp.zeros_like(s2),  # scale is a constant (stop_gradient'd mask)
        dg.reshape(g.shape).astype(g.dtype), db.reshape(b.shape).astype(b.dtype),
        dw1.astype(w1.dtype), db1.reshape(b1.shape).astype(b1.dtype),
        dw2.astype(w2.dtype), db2.reshape(b2.shape).astype(b2.dtype),
    )


_mlp_core.defvjp(_fwd, _bwd)
