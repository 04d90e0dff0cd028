"""Parity tests for the fused ViT attention half-block kernel
(cerebra/models/pallas_vit_attn.py) against the XLA formula used by
cerebra.models.vit.Attention — interpret mode on CPU (Mosaic-lowering
checks happen on hardware; see CLAUDE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerebra.models.pallas_vit_attn import fused_attn_residual


def _ref(x, g, b, wqkv, bqkv, wproj, bproj, num_heads):
    """The vit.Attention forward (reference dino/vision_transformer.py:68-92)
    plus the LN1 + residual of vit.Block, in f32."""
    B, N, D = x.shape
    H = num_heads
    dh = D // H
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    xc = x32 - mu
    xn = xc * jax.lax.rsqrt((xc * xc).mean(-1, keepdims=True) + 1e-6)
    y = xn * g + b
    qkv = (y @ wqkv + bqkv).reshape(B, N, 3, H, dh)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    attn = jax.nn.softmax((q * dh**-0.5) @ jnp.swapaxes(k, -2, -1), axis=-1)
    o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
    return (x32 + o @ wproj + bproj).astype(x.dtype)


def _params(rng, D):
    return (
        jnp.asarray(rng.normal(size=(D,)) * 0.1 + 1.0, jnp.float32),
        jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(3 * D,)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(D, D)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(D,)) * 0.05, jnp.float32),
    )


@pytest.mark.parametrize("N", [16, 13])  # exact pad multiple + masked tail
def test_fused_attn_forward_matches_xla(N, rng):
    B, D, H = 2, 32, 4
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    params = _params(rng, D)
    out = fused_attn_residual(x, *params, H, 16)
    np.testing.assert_allclose(out, _ref(x, *params, H), rtol=2e-5, atol=2e-5)


def test_fused_attn_grads_match_xla(rng):
    B, N, D, H = 2, 13, 32, 2  # N=13 → 3 masked pad tokens
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    params = _params(rng, D)

    def loss_k(*a):
        return jnp.sum(jnp.sin(fused_attn_residual(*a, H, 16)))

    def loss_r(*a):
        return jnp.sum(jnp.sin(_ref(*a, H)))

    gk = jax.grad(loss_k, argnums=tuple(range(7)))(x, *params)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(x, *params)
    for a, want in zip(gk, gr):
        scale = float(jnp.abs(want).max()) or 1.0
        np.testing.assert_allclose(a, want, rtol=5e-5, atol=5e-6 * scale)


@pytest.mark.slow  # second angle on pad masking (grads-match above already
# runs with masked pad tokens in the fast suite)
def test_fused_attn_padding_is_inert(rng):
    """The same sequences evaluated with no padding (pad=1 → Np=N) and with
    masked pad tokens (pad=16) must agree in value AND weight grads — the
    pad tokens are fully inert."""
    B, N, D, H = 2, 10, 16, 2
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    params = _params(rng, D)

    def loss(pad):
        return lambda *a: jnp.sum(fused_attn_residual(*a, H, pad) ** 2)

    out_exact = fused_attn_residual(x, *params, H, 1)
    out_pad = fused_attn_residual(x, *params, H, 16)
    np.testing.assert_allclose(out_pad, out_exact, rtol=1e-5, atol=1e-6)

    g_exact = jax.grad(loss(1), argnums=(3, 5))(x, *params)
    g_pad = jax.grad(loss(16), argnums=(3, 5))(x, *params)
    for a, want in zip(g_pad, g_exact):
        np.testing.assert_allclose(a, want, rtol=1e-5, atol=1e-6)


def test_fused_attn_bf16_close_to_f32_truth(rng):
    """bf16 stream: within bf16 resolution of the f32 reference (LN stats,
    softmax, and accumulations are f32 in-kernel)."""
    B, N, D, H = 2, 24, 64, 4
    x32 = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    params = _params(rng, D)
    want = _ref(x32, *params, H)
    got = fused_attn_residual(x32.astype(jnp.bfloat16), *params, H, 16)
    assert float(jnp.abs(got.astype(jnp.float32) - want).max()) < 0.05 * float(
        jnp.abs(want).max()
    )


@pytest.mark.slow  # two full Block inits + grads; kernel-level parity above
# stays in the fast suite (the 5-minute budget, CLAUDE.md)
@pytest.mark.parametrize("layer_scale", [False, True])
def test_block_fused_attn_matches_plain(layer_scale, rng):
    """Block(use_fused_attn=True) must keep the exact param tree and match
    the plain XLA block in value AND grads (incl. the folded ls1_gamma on
    the DINOv2 variant), and still serve attention maps via the naive path."""
    from cerebra.models.vit import Block

    D, H, B, N = 64, 2, 2, 13
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    plain = Block(D, H, layer_scale=layer_scale)
    fused = Block(D, H, layer_scale=layer_scale, use_fused_attn=True)
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

    # attention-map surface still works on the fused module (naive fallback)
    attn = fused.apply({"params": params}, x, False, True)
    assert attn.shape == (B, H, N, N)


def test_block_fused_attn_keeps_f32_residual_stream_under_bf16(rng):
    """Under dtype=bf16 the fused path must NOT truncate the residual
    stream: an f32 x stays f32 through the block (like the unfused
    x + Attention(dtype=bf16)(...) promotion) and matches the plain block
    closely — only the branch compute is bf16."""
    from cerebra.models.vit import Block

    D, H, B, N = 64, 2, 2, 13
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    plain = Block(D, H, dtype=jnp.bfloat16)
    fused = Block(D, H, dtype=jnp.bfloat16, use_fused_attn=True)
    params = plain.init(jax.random.key(0), x, False, False)["params"]
    want = plain.apply({"params": params}, x, False, False)
    got = fused.apply({"params": params}, x, False, False)
    assert got.dtype == want.dtype == jnp.float32
    scale = float(jnp.abs(want).max())
    assert float(jnp.abs(got - want).max()) < 0.02 * scale


def test_block_fused_min_seq_gates_by_token_count(rng):
    """fused_min_seq keeps short sequences on the plain XLA path and long
    ones on the fused kernels, with BOTH paths sharing one variable tree —
    values match the all-plain block at every length. (The dinoparts
    decomposition measured N=145 local views flat-to-worse fused; the gate
    is the recipe-level fix.)"""
    from cerebra.models.vit import Block

    D, H, B = 64, 2, 2
    plain = Block(D, H)
    gated = Block(
        D, H, use_fused_attn=True, use_fused_mlp=True, fused_min_seq=16
    )
    x_init = jnp.asarray(rng.normal(size=(B, 8, D)), jnp.float32)
    params = plain.init(jax.random.key(0), x_init, False, False)["params"]
    # short view (below the gate, pure XLA) — init'd from the SHORT shape,
    # long view (above the gate, fused kernels) applied on the same tree
    for N in (8, 24):
        x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
        want = plain.apply({"params": params}, x, False, False)
        got = gated.apply({"params": params}, x, False, False)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_attn_scale_matches_outside_composition(rng):
    """The in-kernel per-sequence branch scale (stochastic depth) must
    equal x + s·(out − x) of the unscaled kernel, in value AND grads,
    including sequences with s=0 (dropped path)."""
    B, N, D, H = 3, 13, 64, 2
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    params = _params(rng, D)
    s = jnp.asarray([0.0, 1.25, 1.25], jnp.float32)

    base = fused_attn_residual(x, *params, H, 16)
    want = x + s[:, None, None] * (base - x)
    got = fused_attn_residual(x, *params, H, 16, None, s)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def loss_scaled(a):
        return jnp.sum(fused_attn_residual(*a, H, 16, None, s) ** 2)

    def loss_ref(a):
        base = fused_attn_residual(*a, H, 16)
        return jnp.sum((a[0] + s[:, None, None] * (base - a[0])) ** 2)

    from jax.flatten_util import ravel_pytree

    args = (x,) + params
    ga, _ = ravel_pytree(jax.grad(loss_scaled)(args))
    gb, _ = ravel_pytree(jax.grad(loss_ref)(args))
    rel = float(jnp.linalg.norm(ga - gb) / jnp.linalg.norm(gb))
    assert rel < 1e-5, rel
