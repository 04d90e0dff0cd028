"""Native DINOv2 teacher (ViT-S/14 with LayerScale) + weight importer.

The real dinov2_vits14 weights are not fetchable in this zero-egress
environment, so the oracle is a minimal torch reimplementation of the DINOv2
block semantics (pre-LN MHA + LayerScale, exact-GELU MLP + LayerScale, conv
patch embed, cls+pos tokens, final LN, CLS output) with random weights laid
out in the torch.hub dinov2 state-dict naming — imported via
import_dinov2_vit_torch and compared numerically.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cerebra.models.vit import (
    VisionTransformer,
    import_dinov2_vit_torch,
    vit_small_dinov2,
)


def _random_dinov2_state_dict(rng, embed=32, depth=2, patch=14, grid=2):
    """Random weights in the dinov2_vits14 key layout (ls1/ls2 gammas,
    mask_token present-but-unused)."""
    sd = {}

    def t(*shape, scale=0.2):
        return torch.from_numpy(rng.normal(scale=scale, size=shape).astype(np.float32))

    sd["cls_token"] = t(1, 1, embed)
    sd["pos_embed"] = t(1, grid * grid + 1, embed)
    sd["mask_token"] = t(1, embed)
    sd["patch_embed.proj.weight"] = t(embed, 3, patch, patch)
    sd["patch_embed.proj.bias"] = t(embed)
    for i in range(depth):
        b = f"blocks.{i}."
        sd[b + "norm1.weight"] = 1.0 + t(embed, scale=0.05)
        sd[b + "norm1.bias"] = t(embed)
        sd[b + "attn.qkv.weight"] = t(3 * embed, embed)
        sd[b + "attn.qkv.bias"] = t(3 * embed)
        sd[b + "attn.proj.weight"] = t(embed, embed)
        sd[b + "attn.proj.bias"] = t(embed)
        sd[b + "ls1.gamma"] = t(embed, scale=0.5)
        sd[b + "norm2.weight"] = 1.0 + t(embed, scale=0.05)
        sd[b + "norm2.bias"] = t(embed)
        sd[b + "mlp.fc1.weight"] = t(4 * embed, embed)
        sd[b + "mlp.fc1.bias"] = t(4 * embed)
        sd[b + "mlp.fc2.weight"] = t(embed, 4 * embed)
        sd[b + "mlp.fc2.bias"] = t(embed)
        sd[b + "ls2.gamma"] = t(embed, scale=0.5)
    sd["norm.weight"] = 1.0 + t(embed, scale=0.05)
    sd["norm.bias"] = t(embed)
    return sd


def _torch_dinov2_forward(sd, x_nchw, embed, depth, heads, patch):
    """Reference forward of the DINOv2 architecture in plain torch."""
    import torch.nn.functional as F

    B = x_nchw.shape[0]
    x = F.conv2d(x_nchw, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
                 stride=patch)
    x = x.flatten(2).transpose(1, 2)  # (B, N, D)
    cls = sd["cls_token"].expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1) + sd["pos_embed"]
    for i in range(depth):
        b = f"blocks.{i}."
        h = F.layer_norm(x, (embed,), sd[b + "norm1.weight"], sd[b + "norm1.bias"])
        qkv = F.linear(h, sd[b + "attn.qkv.weight"], sd[b + "attn.qkv.bias"])
        N = h.shape[1]
        qkv = qkv.reshape(B, N, 3, heads, embed // heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (embed // heads) ** -0.5
        attn = attn.softmax(dim=-1)
        h = (attn @ v).transpose(1, 2).reshape(B, N, embed)
        h = F.linear(h, sd[b + "attn.proj.weight"], sd[b + "attn.proj.bias"])
        x = x + h * sd[b + "ls1.gamma"]
        h = F.layer_norm(x, (embed,), sd[b + "norm2.weight"], sd[b + "norm2.bias"])
        h = F.linear(h, sd[b + "mlp.fc1.weight"], sd[b + "mlp.fc1.bias"])
        h = F.gelu(h)  # exact erf GELU — torch default
        h = F.linear(h, sd[b + "mlp.fc2.weight"], sd[b + "mlp.fc2.bias"])
        x = x + h * sd[b + "ls2.gamma"]
    x = F.layer_norm(x, (embed,), sd["norm.weight"], sd["norm.bias"])
    return x[:, 0]


def test_dinov2_import_matches_torch_forward():
    embed, depth, heads, patch, grid = 32, 2, 4, 14, 2
    rng = np.random.default_rng(0)
    sd = _random_dinov2_state_dict(rng, embed, depth, patch, grid)
    img_size = patch * grid  # on-grid: no pos interpolation in either impl

    x = rng.normal(size=(3, img_size, img_size, 3)).astype(np.float32)
    with torch.no_grad():
        want = _torch_dinov2_forward(
            sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), embed, depth, heads, patch
        ).numpy()

    model = VisionTransformer(
        img_size=img_size, patch_size=patch, embed_dim=embed, depth=depth,
        num_heads=heads, layer_scale=True,
    )
    variables = import_dinov2_vit_torch(sd, depth=depth)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


def test_dinov2_import_strips_prefixes_and_interpolates():
    """teacher./backbone. prefixes are stripped, and an off-grid input size
    runs through pos-embed interpolation (518-trained → 224-style use)."""
    embed, depth, heads, patch, grid = 16, 1, 2, 14, 4
    rng = np.random.default_rng(1)
    sd = _random_dinov2_state_dict(rng, embed, depth, patch, grid)
    sd = {f"teacher.backbone.{k}": v for k, v in sd.items()}
    model = VisionTransformer(
        img_size=patch * grid, patch_size=patch, embed_dim=embed, depth=depth,
        num_heads=heads, layer_scale=True,
    )
    variables = import_dinov2_vit_torch(sd, depth=depth)
    out = model.apply(variables, jnp.zeros((1, patch * 2, patch * 2, 3)))  # off-grid
    assert out.shape == (1, embed)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_small_dinov2_geometry():
    """ViT-S/14 teacher parity surface: 384-d CLS feature, 37×37 pos grid
    (518/14), LayerScale params present (dinov2_vits14 layout)."""
    m = vit_small_dinov2()
    assert m.patch_size == 14 and m.embed_dim == 384 and m.layer_scale
    variables = m.init(jax.random.key(0), jnp.zeros((1, 56, 56, 3)))
    assert variables["params"]["pos_embed"].shape == (1, 37 * 37 + 1, 384)
    assert "ls1_gamma" in variables["params"]["block_0"]


@pytest.mark.slow
def test_extract_features_dinov2_jax_cli(tmp_path):
    """End-to-end: a dinov2-layout .pth checkpoint (ViT-S/14 dims, random) →
    extract_features --teacher dinov2_jax → features.npz aligned to the
    corpus, pure-JAX forward."""
    from PIL import Image

    from cerebra.cli.extract_features import main

    rng = np.random.default_rng(2)
    for c in range(2):
        d = tmp_path / "imgs" / f"class_{c}"
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(
                rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
            ).save(str(d / f"i{i}.png"))

    sd = _random_dinov2_state_dict(rng, embed=384, depth=12, patch=14, grid=37)
    ckpt = tmp_path / "dinov2_vits14.pth"
    torch.save(sd, str(ckpt))

    out = tmp_path / "features.npz"
    feats = main(
        ["--teacher", "dinov2_jax", "--teacher_weights", str(ckpt),
         "--images_root", str(tmp_path / "imgs"), "--out", str(out),
         "--image_size", "224"]
    )
    assert feats.shape == (4, 384)
    bank = np.load(out)
    assert bank["features"].shape == (4, 384)
    assert np.isfinite(bank["features"]).all()


def test_dino_image_transform_large_crop():
    """image_size > 256 (DINOv2's native 518) must not produce negative
    center-crop offsets — the resize short side grows to fit the crop."""
    from cerebra.models.dino_model import dino_image_transform

    img = (np.random.default_rng(0).uniform(0, 255, (333, 500, 3))).astype(np.uint8)
    out = dino_image_transform(img, image_size=518)
    assert out.shape == (518, 518, 3)
