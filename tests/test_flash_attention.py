"""Fused (Pallas flash) attention path of the DINO ViT.

The reference ViT materializes the (B, H, N, N) attention matrix
(dino/vision_transformer.py:68-92); `cerebra.models.vit.Attention` can
instead run the TPU flash-attention kernel when the caller does not need the
attention map.  Real-chip parity was measured at integration time (BENCH_AUX
round 3: flash-bf16 grads are *closer* to the f32 ground truth than
naive-bf16); these tests pin the kernel-path numerics hermetically via
Pallas TPU interpret mode, plus the fallback gating.

NOTE: interpret mode does NOT check Mosaic lowering constraints (CLAUDE.md)
— shape-legality on hardware is covered by the on-chip pipeline benchmark.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from cerebra.models.vit import Attention, _flash_mha


def _naive(q, k, v, scale):
    attn = jax.nn.softmax((q * scale) @ jnp.swapaxes(k, -2, -1), axis=-1)
    return attn @ v


@pytest.mark.parametrize("n", [785, 256])  # padded (785→896) and aligned
def test_flash_mha_matches_naive(n):
    rng = np.random.default_rng(0)
    b, h, d = 1, 2, 64
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32) for _ in range(3)
    )
    scale = d**-0.5
    with pltpu.force_tpu_interpret_mode():
        out = _flash_mha(q, k, v, scale)
    ref = _naive(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
    assert out.shape == (b, h, n, d)


@pytest.mark.slow  # ~30 s of interpret-mode grid emulation
def test_flash_mha_grads_match_naive():
    """Custom-VJP backward (dq/dkv kernels) vs autodiff through the naive
    formula, including the segment-masked padding path (280→384)."""
    rng = np.random.default_rng(4)
    b, h, n, d = 1, 1, 280, 64
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32) for _ in range(3)
    )
    scale = d**-0.5

    def loss_flash(q, k, v):
        return jnp.sum(_flash_mha(q, k, v, scale) ** 2)

    def loss_naive(q, k, v):
        return jnp.sum(_naive(q, k, v, scale) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gn):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4
        )


def test_short_sequences_fall_back_to_naive():
    """Local crops (N < flash_min_seq) must keep the naive path — on CPU the
    fused kernel cannot run at all, so reaching it would raise."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 145, 64)), jnp.float32)
    attn_mod = Attention(dim=64, num_heads=2, use_flash=True)
    params = attn_mod.init(jax.random.key(0), x, train=False)
    out, attn = attn_mod.apply(params, x, train=False, need_weights=False)
    assert out.shape == x.shape
    assert attn is not None  # naive path produces the map


def test_need_weights_forces_naive_even_when_long():
    """`get_last_selfattention` needs the (B, H, N, N) map; the flash path
    must never swallow it."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 785, 64)), jnp.float32)
    attn_mod = Attention(dim=64, num_heads=2, use_flash=True)
    params = attn_mod.init(jax.random.key(0), x, train=False)
    out, attn = attn_mod.apply(params, x, train=False, need_weights=True)
    assert attn.shape == (1, 2, 785, 785)
    np.testing.assert_allclose(
        np.asarray(attn.sum(-1)), 1.0, atol=1e-5
    )


def test_flash_flag_is_inert_when_off():
    """use_flash=False must be byte-identical to the round-2 module (the
    default everywhere except the TPU main_dino path)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 785, 64)), jnp.float32)
    m0 = Attention(dim=64, num_heads=2, use_flash=False)
    m1 = Attention(dim=64, num_heads=2, use_flash=True, flash_min_seq=10**9)
    params = m0.init(jax.random.key(0), x, train=False)
    o0, a0 = m0.apply(params, x, train=False, need_weights=False)
    o1, a1 = m1.apply(params, x, train=False, need_weights=False)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
