"""Fused ViT attention half-block — one Pallas kernel pair for
``x + proj(MHA(LN(x)))``.

The other half of the transformer-block megakernel (reference block:
dino/vision_transformer.py:95-132; the MLP half lives in
cerebra.models.pallas_vit_mlp). XLA runs this section as LN + qkv dot +
two (B,N,3,H,d)↔(B,H,N,d) relayouts + per-head score/softmax/AV streams +
proj dot, each intermediate round-tripping HBM; here one kernel reads a
(N, D) sequence tile once and writes the residual-added output once, with
the (N, N) per-head probability matrices living only in VMEM (flash-style,
but with LN/QKV/proj fused in too).

Layout strategy (Mosaic-safe by construction): the grid is one cell per
sequence (batch element); heads are an UNROLLED python loop inside the
cell over weights pre-split on the host into (H, D, dh) / (H, dh, D)
stacks, so every in-kernel matmul is a clean 2-D full-block contraction —
no sub-128 lane slicing of the fused qkv matrix. The attention scale is
folded into the q weights on the host (q·s = x@(Wq·s) + bq·s), so the
kernel never handles it and the backward just re-scales dWq/dbq.

Backward is flash-style RECOMPUTE: the forward saves nothing; the backward
re-derives LN/q/k/v/softmax per head inside VMEM and accumulates
dWq/dWk/dWv/db*/dWp/dbp/dγ/dβ into VMEM-resident f32 blocks with constant
index maps (grid is sequential on TPU). dx streams out per row tile.

Sequence padding (N → Np, multiple of ``pad``): padded kv columns are
masked to -1e30 before the softmax (compile-time iota mask — N is static),
so real queries never attend to them; padded query rows produce garbage
that callers slice away, and their zero cotangents contribute exactly zero
to every weight gradient (verified in tests/test_pallas_vit_attn.py).

Numerics: LN statistics, softmax, and all gradient accumulation in f32;
matmuls take compute_dtype operands (default x.dtype) with f32
accumulation (flax Dense(dtype=bf16) semantics), while the residual
stream (x in, out, dx) keeps x.dtype. Parity with the XLA Attention half is pinned
in tests/test_pallas_vit_attn.py; the ship/reject measurement lives in
benchmarks/kernel_lab.py::exp_vitattn.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cerebra.models.pallas_vit_mlp import (
    _LN_EPS,
    _contract_rows,
    _interpret,
    _layernorm_f32,
    _matmul,
    _matmul_bt,
    _vmem_params,
    _whole_spec,
)

_MASK_VAL = -1e30


def _ln_affine(x_ref, g_ref, b_ref, cdt):
    """f32 LN + affine of the row tile, returned in (f32, f32, cdt) forms."""
    x = x_ref[...].astype(jnp.float32)
    xn = _layernorm_f32(x)
    y32 = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    return x, xn, y32.astype(cdt)


def _softmax_masked(s, n_real):
    """Row softmax of f32 scores with kv columns >= n_real masked out."""
    if n_real < s.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_real, s, _MASK_VAL)
    s = s - jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _fwd_kernel(
    x_ref, s_ref, g_ref, b_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
    bv_ref, wp_ref, bp_ref, out_ref, *, n_real: int, n_heads: int, cdt,
    scaled: bool,
):
    x, _, y = _ln_affine(x_ref, g_ref, b_ref, cdt)
    dt = cdt
    acc = bp_ref[...].astype(jnp.float32)  # (1, D) broadcasts over rows
    out = None
    for h in range(n_heads):
        q = (_matmul(y, wq_ref[h]) + bq_ref[h].astype(jnp.float32)).astype(dt)
        k = (_matmul(y, wk_ref[h]) + bk_ref[h].astype(jnp.float32)).astype(dt)
        v = (_matmul(y, wv_ref[h]) + bv_ref[h].astype(jnp.float32)).astype(dt)
        p = _softmax_masked(_matmul_bt(q, k), n_real).astype(dt)
        o = _matmul(p, v).astype(dt)
        contrib = _matmul(o, wp_ref[h])
        out = contrib if out is None else out + contrib
    out = out + acc
    if scaled:
        # per-sequence branch scale (stochastic depth): out = x + s·branch,
        # the mask/keep factor applied INSIDE the kernel (as a per-row
        # vector — lane-broadcast, the Mosaic-supported pattern)
        out = out * s_ref[...][:, :1].astype(jnp.float32)
    out_ref[...] = (x + out).astype(out_ref.dtype)


def _bwd_kernel(
    x_ref, dout_ref, s_ref, g_ref, b_ref, wq_ref, wk_ref, wv_ref, bq_ref,
    bk_ref, bv_ref, wp_ref,
    dx_ref, dg_ref, db_ref, dwq_ref, dwk_ref, dwv_ref, dbq_ref, dbk_ref,
    dbv_ref, dwp_ref, dbp_ref, *, n_real: int, n_heads: int, cdt,
    scaled: bool,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in (
            dg_ref, db_ref, dwq_ref, dwk_ref, dwv_ref,
            dbq_ref, dbk_ref, dbv_ref, dwp_ref, dbp_ref,
        ):
            r[...] = jnp.zeros_like(r)

    x, xn, y = _ln_affine(x_ref, g_ref, b_ref, cdt)
    dt = cdt
    dout_raw = dout_ref[...].astype(jnp.float32)
    # the branch cotangent picks up the per-sequence scale; the residual
    # passthrough (dx = dout + …) does NOT
    dout = (
        dout_raw * s_ref[...][:, :1].astype(jnp.float32) if scaled else dout_raw
    )
    dout_n = dout.astype(dt)
    dbp_ref[...] += jnp.sum(dout, axis=0, keepdims=True)

    dy = None
    for h in range(n_heads):
        # recompute the head's forward in VMEM
        q32 = _matmul(y, wq_ref[h]) + bq_ref[h].astype(jnp.float32)
        k32 = _matmul(y, wk_ref[h]) + bk_ref[h].astype(jnp.float32)
        v = (_matmul(y, wv_ref[h]) + bv_ref[h].astype(jnp.float32)).astype(dt)
        q, k = q32.astype(dt), k32.astype(dt)
        p = _softmax_masked(_matmul_bt(q, k), n_real)
        pb = p.astype(dt)
        o = _matmul(pb, v).astype(dt)
        # proj
        dwp_ref[h] += _contract_rows(o, dout_n)
        do = _matmul_bt(dout_n, wp_ref[h]).astype(dt)  # (Np, dh)
        # attention
        dp = _matmul_bt(do, v)  # (Np, Np) f32
        dv = _contract_rows(pb, do)  # (Np, dh) f32
        ds = (p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))).astype(dt)
        dq = _matmul(ds, k)  # (Np, dh) f32
        dk = _contract_rows(ds, q)  # s = q kᵀ ⇒ dk = dsᵀ q
        dqb, dkb, dvb = dq.astype(dt), dk.astype(dt), dv.astype(dt)
        # qkv weights
        dwq_ref[h] += _contract_rows(y, dqb)
        dwk_ref[h] += _contract_rows(y, dkb)
        dwv_ref[h] += _contract_rows(y, dvb)
        dbq_ref[h] += jnp.sum(dq, axis=0, keepdims=True)
        dbk_ref[h] += jnp.sum(dk, axis=0, keepdims=True)
        dbv_ref[h] += jnp.sum(dv, axis=0, keepdims=True)
        contrib = (
            _matmul_bt(dqb, wq_ref[h])
            + _matmul_bt(dkb, wk_ref[h])
            + _matmul_bt(dvb, wv_ref[h])
        )
        dy = contrib if dy is None else dy + contrib

    # LN affine + core backward (identical formulas to pallas_vit_mlp)
    dg_ref[...] += jnp.sum(dy * xn, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dxn = dy * g_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxn, axis=1, keepdims=True)
    m2 = jnp.mean(dxn * xn, axis=1, keepdims=True)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    rstd = jax.lax.rsqrt(jnp.mean(xc * xc, axis=1, keepdims=True) + _LN_EPS)
    dx_ln = rstd * (dxn - m1 - xn * m2)
    dx_ref[...] = (dout_raw + dx_ln).astype(dx_ref.dtype)


def _split_params(g, b, wqkv, bqkv, wproj, bproj, num_heads, dtype):
    """Host-side prep: head-split stacks in the kernel's layouts, the
    attention scale folded into the q slices, everything cast to the
    compute dtype. qkv feature order is i·D + h·dh + c (the reference's
    reshape(B,N,3,H,dh) — vision_transformer.py:74-77)."""
    D = wqkv.shape[0]
    dh = D // num_heads
    scale = dh ** -0.5
    cast = lambda a: a.astype(dtype)

    def w_stack(sl, s=1.0):
        return cast((wqkv[:, sl] * s).reshape(D, num_heads, dh).transpose(1, 0, 2))

    def b_stack(sl, s=1.0):
        return cast((bqkv[sl] * s).reshape(num_heads, 1, dh))

    wq = w_stack(slice(0, D), scale)
    wk = w_stack(slice(D, 2 * D))
    wv = w_stack(slice(2 * D, 3 * D))
    bq = b_stack(slice(0, D), scale)
    bk = b_stack(slice(D, 2 * D))
    bv = b_stack(slice(2 * D, 3 * D))
    wp = cast(wproj.reshape(num_heads, dh, D))
    return (
        cast(g).reshape(1, -1), cast(b).reshape(1, -1),
        wq, wk, wv, bq, bk, bv, wp, cast(bproj).reshape(1, -1),
    )


def _pad_seq(x, pad):
    B, N, D = x.shape
    n_pad = -N % pad
    if n_pad:
        x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
    return x.reshape(B * (N + n_pad), D), N + n_pad


def _seq_spec(width, np_):
    return pl.BlockSpec((np_, width), lambda i: (i, 0))


def fused_attn_residual(x, g, b, wqkv, bqkv, wproj, bproj, num_heads, pad=16,
                        compute_dtype=None, scale=None):
    """x + proj(MHA(layernorm(x)·g + b)) over (B, N, D) sequences.

    Params keep their caller dtype (typically f32 flax params); every MXU
    matmul runs in ``compute_dtype`` (default x.dtype) like flax
    Dense(dtype=...), while the residual STREAM (x in, out, dx) keeps
    x.dtype — an f32 token stream through bf16 blocks stays f32, exactly
    like the unfused Block. ``pad`` is the sequence-padding granularity
    (block sublane multiple).

    ``scale`` (optional, (B,) f32): per-sequence residual-branch multiplier
    — out = x + scale·branch. Used for stochastic depth (mask/keep applied
    INSIDE the kernel). Treated as a constant: no cotangent flows to it."""
    if scale is None:
        s2 = jnp.ones((1,), jnp.float32)  # placeholder, unused
        return _attn_core(x, s2, g, b, wqkv, bqkv, wproj, bproj, num_heads,
                          pad, compute_dtype, False)
    s2 = jax.lax.stop_gradient(scale).reshape(x.shape[0]).astype(jnp.float32)
    return _attn_core(x, s2, g, b, wqkv, bqkv, wproj, bproj, num_heads, pad,
                      compute_dtype, True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _attn_core(x, s2, g, b, wqkv, bqkv, wproj, bproj, num_heads, pad,
               compute_dtype, scaled):
    out, _ = _fwd(x, s2, g, b, wqkv, bqkv, wproj, bproj, num_heads, pad,
                  compute_dtype, scaled)
    return out


def _scale_rows(s2, B, np_, scaled):
    """Expand the (B,) scale to per-row (B·Np, 128) tiles. Mosaic lowers a
    (rows, 1)→(rows, lanes) lane-broadcast (the softmax-keepdims pattern)
    but NOT a (1, 1)→full-tile broadcast, so the scale rides as a row
    vector even though it is constant within a sequence."""
    if not scaled:
        return jnp.ones((1, 128), jnp.float32)
    return jnp.broadcast_to(
        s2.reshape(B, 1, 1), (B, np_, 128)
    ).reshape(B * np_, 128)


def _batch_scale_spec(np_: int, scaled: bool):
    if not scaled:
        return pl.BlockSpec((1, 128), lambda i: (0, 0))
    return pl.BlockSpec((np_, 128), lambda i: (i, 0))


def _fwd(x, s2, g, b, wqkv, bqkv, wproj, bproj, num_heads, pad, compute_dtype,
         scaled):
    B, N, D = x.shape
    dh = D // num_heads
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    xp, np_ = _pad_seq(x, pad)
    sp = _scale_rows(s2, B, np_, scaled)
    prepped = _split_params(g, b, wqkv, bqkv, wproj, bproj, num_heads, cdt)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_real=N, n_heads=num_heads, cdt=cdt,
                          scaled=scaled),
        grid=(B,),
        in_specs=[
            _seq_spec(D, np_), _batch_scale_spec(np_, scaled),
            _whole_spec((1, D)), _whole_spec((1, D)),
            _whole_spec((num_heads, D, dh)), _whole_spec((num_heads, D, dh)),
            _whole_spec((num_heads, D, dh)),
            _whole_spec((num_heads, 1, dh)), _whole_spec((num_heads, 1, dh)),
            _whole_spec((num_heads, 1, dh)),
            _whole_spec((num_heads, dh, D)), _whole_spec((1, D)),
        ],
        out_specs=_seq_spec(D, np_),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=_interpret(),
        compiler_params=_vmem_params(64),
    )(xp, sp, *prepped)
    out = out.reshape(B, np_, D)[:, :N]
    return out, (x, s2, g, b, wqkv, bqkv, wproj, bproj)


def _bwd(num_heads, pad, compute_dtype, scaled, res, dout):
    x, s2, g, b, wqkv, bqkv, wproj, bproj = res
    B, N, D = x.shape
    dh = D // num_heads
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    scale = dh ** -0.5
    xp, np_ = _pad_seq(x, pad)
    sp = _scale_rows(s2, B, np_, scaled)
    dp_, _ = _pad_seq(dout.astype(x.dtype), pad)
    prepped = _split_params(g, b, wqkv, bqkv, wproj, bproj, num_heads, cdt)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_real=N, n_heads=num_heads, cdt=cdt,
                          scaled=scaled),
        grid=(B,),
        in_specs=[
            _seq_spec(D, np_), _seq_spec(D, np_),
            _batch_scale_spec(np_, scaled),
            _whole_spec((1, D)), _whole_spec((1, D)),
            _whole_spec((num_heads, D, dh)), _whole_spec((num_heads, D, dh)),
            _whole_spec((num_heads, D, dh)),
            _whole_spec((num_heads, 1, dh)), _whole_spec((num_heads, 1, dh)),
            _whole_spec((num_heads, 1, dh)),
            _whole_spec((num_heads, dh, D)),
        ],
        out_specs=[
            _seq_spec(D, np_),
            _whole_spec((1, D)), _whole_spec((1, D)),
            _whole_spec((num_heads, D, dh)), _whole_spec((num_heads, D, dh)),
            _whole_spec((num_heads, D, dh)),
            _whole_spec((num_heads, 1, dh)), _whole_spec((num_heads, 1, dh)),
            _whole_spec((num_heads, 1, dh)),
            _whole_spec((num_heads, dh, D)), _whole_spec((1, D)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xp.shape, x.dtype),
            jax.ShapeDtypeStruct((1, D), f32), jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((num_heads, D, dh), f32),
            jax.ShapeDtypeStruct((num_heads, D, dh), f32),
            jax.ShapeDtypeStruct((num_heads, D, dh), f32),
            jax.ShapeDtypeStruct((num_heads, 1, dh), f32),
            jax.ShapeDtypeStruct((num_heads, 1, dh), f32),
            jax.ShapeDtypeStruct((num_heads, 1, dh), f32),
            jax.ShapeDtypeStruct((num_heads, dh, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ],
        interpret=_interpret(),
        compiler_params=_vmem_params(64),
    )(xp, dp_, sp, *prepped[:-1])
    dx, dg, db, dwq, dwk, dwv, dbq, dbk, dbv, dwp, dbp = outs

    # reassemble (H, D, dh) stacks into the caller's (D, 3D) qkv layout;
    # the q slices were scale-folded, so their grads re-scale (chain rule
    # through wq_s = wq·s).
    def unstack(w):
        return w.transpose(1, 0, 2).reshape(D, D)

    dwqkv = jnp.concatenate(
        [unstack(dwq) * scale, unstack(dwk), unstack(dwv)], axis=1
    )
    dbqkv = jnp.concatenate(
        [dbq.reshape(D) * scale, dbk.reshape(D), dbv.reshape(D)]
    )
    return (
        dx.reshape(B, np_, D)[:, :N].astype(x.dtype),
        jnp.zeros_like(s2),  # scale is a constant (stop_gradient'd mask)
        dg.reshape(g.shape).astype(g.dtype), db.reshape(b.shape).astype(b.dtype),
        dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
        dwp.reshape(D, D).astype(wproj.dtype), dbp.reshape(bproj.shape).astype(bproj.dtype),
    )


_attn_core.defvjp(_fwd, _bwd)
