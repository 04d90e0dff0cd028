"""Shape/behavior tests for the wider model zoo (SURVEY.md §2.4 inventory)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerebra.models.autoencoders import (
    EEGAutoencoderConv,
    EEGAutoencoderFC,
    RecurrentAutoencoder,
    feature_matching_loss,
)
from cerebra.models.barlow import BarlowTwins
from cerebra.models.conformer import Conformer
from cerebra.models.layers import ResidualBlock, SpatialBlock, TemporalBlock
from cerebra.models.mlp import CustomModel
from cerebra.models.resnet import ResnetFeatureRegressor, resnet50
from cerebra.models.vit import VisionTransformer, import_dino_vit_torch, vit_tiny


@pytest.mark.slow
def test_conformer_bciiv_shape():
    """The reference trains on (B, 1, 22, 1000) BCI-IV data with 2440-dim
    flattened tokens (utils/Conformer.py:197-205)."""
    m = Conformer(emb_size=40, depth=2, out_features=384)
    x = jnp.zeros((2, 1, 22, 1000))
    vars_ = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False)
    flat, out = m.apply(vars_, x, train=False)
    assert flat.shape == (2, 2440)  # 61 tokens × 40 dims — reference parity
    assert out.shape == (2, 384)


def test_autoencoder_fc():
    m = EEGAutoencoderFC(channels=8, time_freq=32, latent_dim=16, num_residual_blocks=1)
    x = jnp.zeros((3, 32, 8))
    vars_ = m.init(jax.random.key(0), x, train=False)
    enc, dec = m.apply(vars_, x, train=False)
    assert enc.shape == (3, 16) and dec.shape == (3, 8 * 32)
    assert float(feature_matching_loss(enc, jnp.zeros_like(enc))) >= 0


def test_autoencoder_conv_roundtrip_shape():
    m = EEGAutoencoderConv(in_channels=128, latent_dim=64)
    x = jnp.zeros((2, 128, 480))
    vars_ = m.init(jax.random.key(0), x)
    out = m.apply(vars_, x)
    assert out.shape == (2, 128, 480)


def test_recurrent_autoencoder():
    m = RecurrentAutoencoder(seq_len=20, n_features=8, embedding_dim=12)
    x = jnp.zeros((3, 20, 8))
    vars_ = m.init(jax.random.key(0), x)
    enc, dec = m.apply(vars_, x)
    assert enc.shape == (3, 12) and dec.shape == (3, 20, 8)


def test_custom_model():
    m = CustomModel(output_size=460 * 4, hidden=64)
    x = jnp.zeros((2, 384))
    vars_ = m.init(jax.random.key(0), x)
    assert m.apply(vars_, x).shape == (2, 1840)


@pytest.mark.slow
def test_resnet50_features_and_regressor():
    m = resnet50()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.key(0), x, train=False)
    feats = m.apply(vars_, x, train=False)
    assert feats.shape == (1, 2048)
    reg = ResnetFeatureRegressor(output_size=128)
    rv = reg.init(jax.random.key(0), x, train=False)
    assert reg.apply(rv, x, train=False).shape == (1, 128)


@pytest.mark.slow
def test_barlow_twins_towers():
    m = BarlowTwins(projector_sizes=(64, 64), eeg_in_channels=96)
    y1 = jnp.zeros((2, 64, 64, 3))
    y2 = jnp.zeros((2, 32, 32, 96))  # mel-spectrogram stack, NHWC
    vars_ = m.init(jax.random.key(0), y1, y2, train=False)
    z1, z2 = m.apply(vars_, y1, y2, train=False)
    assert z1.shape == (2, 64) and z2.shape == (2, 64)


def test_conv_blocks():
    x = jnp.zeros((2, 16, 40, 4))
    tb = TemporalBlock(out_channels=8, n_layers=2, kernel_size=(1, 5), strides=(1, 2),
                       dilation_list=[(1, 1), (1, 2)])
    v = tb.init(jax.random.key(0), x, train=False)
    out = tb.apply(v, x, train=False)
    assert out.shape[0] == 2 and out.shape[-1] == 16  # 2 layers × 8 channels concat
    sb = SpatialBlock(out_channels=8, num_spatial_layers=2, strides=(2, 1), input_height=16)
    v = sb.init(jax.random.key(0), x, train=False)
    assert sb.apply(v, x, train=False).shape[-1] == 16
    rb = ResidualBlock(out_channels=4)
    v = rb.init(jax.random.key(0), x, train=False)
    assert rb.apply(v, x, train=False).shape == x.shape


@pytest.mark.slow  # surface shapes at 32px; the fast suite pins the same
# behaviors against the reference's own class (test_reference_vit_oracle.py)
def test_vit_forward_and_attention():
    m = vit_tiny(patch_size=8, img_size=32)
    x = jnp.zeros((2, 32, 32, 3))
    vars_ = m.init(jax.random.key(0), x)
    cls = m.apply(vars_, x)
    assert cls.shape == (2, 192)
    attn = m.apply(vars_, x, return_attention_of_last_block=True)
    n_tokens = (32 // 8) ** 2 + 1
    assert attn.shape == (2, 3, n_tokens, n_tokens)
    inter = m.apply(vars_, x, n_intermediate=2)
    assert len(inter) == 2 and inter[-1].shape == (2, n_tokens, 192)


@pytest.mark.slow  # off-by-default memory lever; double ViT compile ~15 s
def test_vit_remat_matches_plain():
    """remat=True (jax.checkpoint per block, matmul-outputs-saveable policy)
    must be a pure memory/scheduling change: values AND grads match the
    plain path, and the attention-map surface still works."""
    x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 32, 32, 3)), jnp.float32)
    kw = dict(img_size=32, patch_size=8, embed_dim=192, depth=2, num_heads=3)
    plain = VisionTransformer(**kw)
    remat = VisionTransformer(**kw, remat=True)
    vars_ = plain.init(jax.random.key(0), x)

    out_p = plain.apply(vars_, x)
    out_r = remat.apply(vars_, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=1e-5, rtol=1e-5)

    def loss(m):
        def f(params):
            return jnp.sum(m.apply(params, x) ** 2)
        return f

    from jax.flatten_util import ravel_pytree

    g_p = jax.grad(loss(plain))(vars_)
    g_r = jax.grad(loss(remat))(vars_)
    flat_p, _ = ravel_pytree(g_p)
    flat_r, _ = ravel_pytree(g_r)
    rel = float(jnp.linalg.norm(flat_p - flat_r) / jnp.linalg.norm(flat_p))
    assert rel < 1e-5, rel

    attn = remat.apply(vars_, x, return_attention_of_last_block=True)
    assert attn.shape == (2, 3, 17, 17)


def test_vit_pos_embed_interpolation():
    m = vit_tiny(patch_size=8, img_size=32)
    vars_ = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    # off-grid input size: 48×48 → 6×6 grid vs trained 4×4
    out = m.apply(vars_, jnp.zeros((1, 48, 48, 3)))
    assert out.shape == (1, 192)


def test_vit_torch_import_matches():
    """Build a torch-layout state dict from random arrays, import, and check
    the flax forward consumes it (numerical check on patch embed path)."""
    torch = pytest.importorskip("torch")
    D, P, depth = 192, 8, 2
    m = VisionTransformer(img_size=32, patch_size=P, embed_dim=D, depth=depth, num_heads=3)
    rng = np.random.default_rng(0)
    sd = {
        "cls_token": rng.normal(size=(1, 1, D)).astype(np.float32),
        "pos_embed": rng.normal(size=(1, 17, D)).astype(np.float32),
        "patch_embed.proj.weight": rng.normal(size=(D, 3, P, P)).astype(np.float32) * 0.02,
        "patch_embed.proj.bias": np.zeros(D, dtype=np.float32),
        "norm.weight": np.ones(D, dtype=np.float32),
        "norm.bias": np.zeros(D, dtype=np.float32),
    }
    for i in range(depth):
        b = f"blocks.{i}."
        sd.update({
            b + "norm1.weight": np.ones(D, np.float32), b + "norm1.bias": np.zeros(D, np.float32),
            b + "norm2.weight": np.ones(D, np.float32), b + "norm2.bias": np.zeros(D, np.float32),
            b + "attn.qkv.weight": rng.normal(size=(3 * D, D)).astype(np.float32) * 0.02,
            b + "attn.qkv.bias": np.zeros(3 * D, np.float32),
            b + "attn.proj.weight": rng.normal(size=(D, D)).astype(np.float32) * 0.02,
            b + "attn.proj.bias": np.zeros(D, np.float32),
            b + "mlp.fc1.weight": rng.normal(size=(4 * D, D)).astype(np.float32) * 0.02,
            b + "mlp.fc1.bias": np.zeros(4 * D, np.float32),
            b + "mlp.fc2.weight": rng.normal(size=(D, 4 * D)).astype(np.float32) * 0.02,
            b + "mlp.fc2.bias": np.zeros(D, np.float32),
        })
    params = import_dino_vit_torch(sd, depth=depth)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    out = m.apply(params, x)
    assert out.shape == (1, D) and np.isfinite(np.asarray(out)).all()
