"""Parity tests for the fused ViT MLP half-block kernel
(cerebra/models/pallas_vit_mlp.py) against the XLA formula used by
cerebra.models.vit.Block — interpret mode on CPU (Mosaic-lowering checks
happen on hardware; see CLAUDE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cerebra.models.pallas_vit_mlp import fused_mlp_residual


def _ref(x, g, b, w1, b1, w2, b2):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    xc = x32 - mu
    xn = xc * jax.lax.rsqrt((xc * xc).mean(-1, keepdims=True) + 1e-6)
    y1 = (xn * g + b).astype(x.dtype)
    h = (y1 @ w1.astype(x.dtype)).astype(jnp.float32) + b1
    gh = nn.gelu(h, approximate=False).astype(x.dtype)
    out = (gh @ w2.astype(x.dtype)).astype(jnp.float32) + b2
    return (x32 + out).astype(x.dtype)


def _params(rng, D, F):
    return (
        jnp.asarray(rng.normal(size=(D,)) * 0.1 + 1.0, jnp.float32),
        jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(D, F)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(F,)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(F, D)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(D,)) * 0.05, jnp.float32),
    )


@pytest.mark.parametrize("M", [64, 70])  # exact tile multiple + padded tail
def test_fused_mlp_forward_matches_xla(M, rng):
    D, F = 64, 256
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    params = _params(rng, D, F)
    out = fused_mlp_residual(x, *params, 32)
    np.testing.assert_allclose(out, _ref(x, *params), rtol=1e-5, atol=1e-5)


def test_fused_mlp_grads_match_xla(rng):
    D, F, M = 64, 256, 70
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    params = _params(rng, D, F)

    def loss_k(*a):
        return jnp.sum(jnp.sin(fused_mlp_residual(*a, 32)))

    def loss_r(*a):
        return jnp.sum(jnp.sin(_ref(*a)))

    gk = jax.grad(loss_k, argnums=tuple(range(7)))(x, *params)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(x, *params)
    for a, want in zip(gk, gr):
        scale = float(jnp.abs(want).max()) or 1.0
        np.testing.assert_allclose(a, want, rtol=5e-5, atol=5e-6 * scale)


def test_fused_mlp_bf16_close_to_f32_truth(rng):
    """bf16 stream: the kernel must stay within bf16 resolution of the f32
    reference (its LN stats and accumulations are f32)."""
    D, F, M = 128, 256, 96
    x32 = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    params = _params(rng, D, F)
    want = _ref(x32, *params)
    got = fused_mlp_residual(x32.astype(jnp.bfloat16), *params, 32)
    assert float(jnp.abs(got.astype(jnp.float32) - want).max()) < 0.05 * float(
        jnp.abs(want).max()
    )


def test_fused_mlp_padded_rows_do_not_pollute_grads(rng):
    """Zero-padded tail rows must contribute exactly zero to every weight
    gradient: compare an M=40 (tile 32 → 24 pad rows) run against the same
    rows evaluated at tile 8 (no padding)."""
    D, F, M = 64, 128, 40
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    params = _params(rng, D, F)

    def loss(tile):
        return lambda *a: jnp.sum(fused_mlp_residual(*a, tile) ** 2)

    g_pad = jax.grad(loss(32), argnums=(3, 5))(x, *params)
    g_exact = jax.grad(loss(8), argnums=(3, 5))(x, *params)
    for a, want in zip(g_pad, g_exact):
        np.testing.assert_allclose(a, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # two full Block inits + grads; kernel-level parity above
# stays in the fast suite (the 5-minute budget, CLAUDE.md)
@pytest.mark.parametrize("layer_scale", [False, True])
def test_block_fused_mlp_matches_plain(layer_scale, rng):
    """Block(use_fused_mlp=True) must keep the exact param tree and match
    the plain XLA block in value AND grads (incl. the folded ls2_gamma on
    the DINOv2 variant)."""
    from cerebra.models.vit import Block

    D, H, B, N = 64, 2, 2, 40
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    plain = Block(D, H, layer_scale=layer_scale)
    fused = Block(D, H, layer_scale=layer_scale, use_fused_mlp=True)
    params = plain.init(jax.random.key(0), x, False, False)["params"]
    p2 = fused.init(jax.random.key(0), x, False, False)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(p2)

    want = plain.apply({"params": params}, x, False, False)
    got = fused.apply({"params": params}, x, False, False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def loss(mod):
        return lambda p: jnp.sum(mod.apply({"params": p}, x, False, False) ** 2)

    g_want = jax.grad(loss(plain))(params)
    g_got = jax.grad(loss(fused))(params)
    flat_w = jax.tree_util.tree_leaves_with_path(g_want)
    flat_g = jax.tree_util.tree_leaves_with_path(g_got)
    for (pw, w), (pg, g) in zip(flat_w, flat_g):
        assert pw == pg
        scale = float(jnp.abs(w).max()) or 1.0
        np.testing.assert_allclose(
            g, w, rtol=5e-4, atol=5e-5 * scale,
            err_msg=jax.tree_util.keystr(pw),
        )


def test_block_fused_mlp_keeps_f32_residual_stream_under_bf16(rng):
    """Under dtype=bf16 the fused path must NOT truncate the residual
    stream: an f32 x stays f32 through the block and matches the plain
    block closely — only the branch compute is bf16."""
    from cerebra.models.vit import Block

    D, H, B, N = 64, 2, 2, 13
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    plain = Block(D, H, dtype=jnp.bfloat16)
    fused = Block(D, H, dtype=jnp.bfloat16, use_fused_mlp=True)
    params = plain.init(jax.random.key(0), x, False, False)["params"]
    want = plain.apply({"params": params}, x, False, False)
    got = fused.apply({"params": params}, x, False, False)
    assert got.dtype == want.dtype == jnp.float32
    scale = float(jnp.abs(want).max())
    assert float(jnp.abs(got - want).max()) < 0.02 * scale


def test_fused_mlp_scale_matches_outside_composition(rng):
    """The in-kernel per-row branch scale (stochastic depth) must equal
    x + s·(out − x) of the unscaled kernel, in value AND grads, including
    rows with s=0 and a padded tail tile."""
    M, D, F = 70, 64, 256
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    params = _params(rng, D, F)
    s = jnp.asarray(rng.choice([0.0, 1.25], size=(M,)), jnp.float32)

    base = fused_mlp_residual(x, *params, 32)
    want = x + s[:, None] * (base - x)
    got = fused_mlp_residual(x, *params, 32, None, s)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def loss_scaled(a):
        return jnp.sum(fused_mlp_residual(a[0], *a[1:], 32, None, s) ** 2)

    def loss_ref(a):
        base = fused_mlp_residual(a[0], *a[1:], 32)
        return jnp.sum((a[0] + s[:, None] * (base - a[0])) ** 2)

    from jax.flatten_util import ravel_pytree

    args = (x,) + params
    ga, _ = ravel_pytree(jax.grad(loss_scaled)(args))
    gb, _ = ravel_pytree(jax.grad(loss_ref)(args))
    rel = float(jnp.linalg.norm(ga - gb) / jnp.linalg.norm(gb))
    assert rel < 1e-5, rel
