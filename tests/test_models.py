"""Model tests: LSTM cell parity vs torch, reconstructed Model call-site
contract, DINOHead invariants, checkpoint export/import round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from cerebra.models import DINOHead, Model
from cerebra.models.lstm import (
    InlineLSTM,
    LSTMStack,
    export_torch_state_dict,
    import_torch_state_dict,
)
from cerebra.models.multicrop import multicrop_forward


def _torch_lstm_reference(x, flax_params, hidden, layers):
    """Run torch.nn.LSTM with weights copied from our flax params."""
    m = torch.nn.LSTM(
        input_size=x.shape[-1], hidden_size=hidden, num_layers=layers, batch_first=True
    )
    sd = {}
    p = flax_params["params"]["lstm"] if "lstm" in flax_params["params"] else flax_params["params"]
    for l in range(layers):
        sd[f"weight_ih_l{l}"] = torch.from_numpy(np.asarray(p[f"w_ih_l{l}"]).T.copy())
        sd[f"weight_hh_l{l}"] = torch.from_numpy(np.asarray(p[f"w_hh_l{l}"]).T.copy())
        sd[f"bias_ih_l{l}"] = torch.from_numpy(np.asarray(p[f"b_ih_l{l}"]).copy())
        sd[f"bias_hh_l{l}"] = torch.from_numpy(np.asarray(p[f"b_hh_l{l}"]).copy())
    m.load_state_dict(sd)
    with torch.no_grad():
        out, _ = m(torch.from_numpy(np.asarray(x)))
    return out.numpy()


def test_lstm_stack_matches_torch():
    B, T, C, H, L = 3, 17, 8, 12, 2
    x = np.random.default_rng(0).normal(size=(B, T, C)).astype(np.float32)
    mod = LSTMStack(hidden_size=H, num_layers=L)
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    want = _torch_lstm_reference(x, {"params": params["params"]}, H, L)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_model_call_site_contract():
    """The reconstructed Model must satisfy every reference call site
    (SURVEY.md §2.4): (B,T,C) in; include_top → (features, cls); no top →
    features; features_only → (B, lstm_size)."""
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 20, 96)).astype(np.float32))
    m = Model(input_size=96, lstm_size=96, lstm_layers=2, output_size=384, include_top=True)
    params = m.init(jax.random.key(0), x)
    feats, cls = m.apply(params, x)
    assert feats.shape == (4, 384) and cls.shape == (4, 40)
    assert np.all(np.asarray(feats) >= 0)  # ReLU features

    m2 = Model(input_size=96, lstm_size=128, lstm_layers=4, output_size=128, include_top=False)
    p2 = m2.init(jax.random.key(0), x)
    feats2 = m2.apply(p2, x)
    assert feats2.shape == (4, 128)
    hid = m2.apply(p2, x, features_only=True)
    assert hid.shape == (4, 128)


def test_inline_lstm_transpose_handling():
    x_ct = jnp.asarray(np.random.default_rng(2).normal(size=(2, 96, 460)).astype(np.float32))
    m = InlineLSTM(input_size=96, hidden_size=64, num_layers=2, output_size=384)
    params = m.init(jax.random.key(0), x_ct)
    feats, cls = m.apply(params, x_ct)
    assert feats.shape == (2, 384) and cls.shape == (2, 40)


def test_dino_head_unit_norm_prototypes():
    m = DINOHead(in_dim=128, out_dim=384)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(6, 128)).astype(np.float32))
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.shape == (6, 384)
    # weight-norm prototypes: each output column of the last layer has unit
    # norm, so logits are bounded by the (unit) input norm
    assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-4
    v = np.asarray(params["params"]["last_layer"]["v"])
    k = v / np.linalg.norm(v, axis=0, keepdims=True)
    np.testing.assert_allclose(np.linalg.norm(k, axis=0), 1.0, atol=1e-5)


def test_multicrop_forward_grouping():
    m = Model(input_size=8, lstm_size=16, lstm_layers=1, output_size=16, include_top=False)
    g = jnp.asarray(np.random.default_rng(4).normal(size=(2, 3, 30, 8)).astype(np.float32))
    l = jnp.asarray(np.random.default_rng(5).normal(size=(4, 3, 20, 8)).astype(np.float32))
    params = m.init(jax.random.key(0), g[0])
    head = DINOHead(in_dim=16, out_dim=32)
    hp = head.init(jax.random.key(1), jnp.zeros((1, 16)))

    backbone = lambda x: m.apply(params, x, features_only=True)
    out = multicrop_forward(backbone, lambda f: head.apply(hp, f), [g, l])
    assert out.shape == ((2 + 4) * 3, 32)
    # view order matches per-group concatenation
    solo = head.apply(hp, backbone(g[1]))
    np.testing.assert_allclose(np.asarray(out[3:6]), np.asarray(solo), rtol=2e-4, atol=2e-5)


def test_torch_export_import_roundtrip():
    x = jnp.asarray(np.random.default_rng(6).normal(size=(2, 10, 96)).astype(np.float32))
    m = Model(input_size=96, lstm_size=32, lstm_layers=2, output_size=64, include_top=True)
    params = m.init(jax.random.key(0), x)
    sd = export_torch_state_dict(params)
    assert "lstm.weight_ih_l0" in sd and sd["lstm.weight_ih_l0"].shape == (128, 96)
    assert "fc.weight" in sd and sd["fc.weight"].shape == (64, 32)
    # add a reference-style prefix, then import
    prefixed = {f"backbone.{k}": v for k, v in sd.items()}
    back = import_torch_state_dict(prefixed)
    out1 = m.apply(params, x)[0]
    out2 = m.apply(back, x)[0]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_lstm_bf16_path_close_to_f32():
    x = jnp.asarray(np.random.default_rng(7).normal(size=(4, 50, 96)).astype(np.float32))
    m32 = Model(input_size=96, lstm_size=96, lstm_layers=2, output_size=128, include_top=False)
    params = m32.init(jax.random.key(0), x)
    mbf = Model(
        input_size=96, lstm_size=96, lstm_layers=2, output_size=128, include_top=False,
        dtype=jnp.bfloat16,
    )
    a = np.asarray(m32.apply(params, x), dtype=np.float32)
    b = np.asarray(mbf.apply(params, x), dtype=np.float32)
    assert np.abs(a - b).max() < 0.15 * max(np.abs(a).max(), 1e-3)


def test_vit_patch_embed_floor_truncates_like_torch():
    """torch's Conv2d(kernel=P, stride=P) is unpadded: a 40x40 input at
    patch 16 gives a 2x2 grid (floor), not flax SAME-padding's 3x3."""
    from cerebra.models.vit import VisionTransformer

    m = VisionTransformer(img_size=32, patch_size=16, embed_dim=32, depth=1,
                          num_heads=2)
    v = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    out = m.apply(v, jnp.zeros((1, 40, 40, 3)), return_all_tokens=True)
    assert out.shape[1] == 1 + 2 * 2  # CLS + floor(40/16)^2


def test_vit_pos_embed_reinterpolates_nonsquare_grid():
    """A non-square grid with the SAME token count as the trained square
    grid must still re-interpolate (dino/vision_transformer.py:177 requires
    npatch == N AND w == h to short-circuit)."""
    from cerebra.models.vit import _interpolate_pos_embed

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(1, 1 + 4 * 4, 8)).astype(np.float32))
    same = _interpolate_pos_embed(pos, 4, 4)
    assert same is pos  # square same-count grid: untouched
    ns = _interpolate_pos_embed(pos, 2, 8)  # 16 tokens, non-square
    assert ns.shape == (1, 17, 8)
    assert not np.allclose(np.asarray(ns), np.asarray(pos))


def test_vit_dense_init_is_trunc_normal():
    """The reference applies trunc_normal_(std=.02) to every nn.Linear
    (dino/vision_transformer.py:165-167); flax's default lecun_normal would
    give std ~0.05 at D=384."""
    from cerebra.models.vit import vit_small

    m = vit_small(patch_size=16, img_size=32)
    p = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    qkv = np.asarray(p["block_0"]["attn"]["qkv"]["kernel"])
    # reference trunc_normal_ bounds are ABSOLUTE (dino/utils.py:548): at
    # std=.02 it is an effectively untruncated normal with std exactly 0.02
    assert abs(qkv.std() - 0.02) < 0.0005, qkv.std()


def test_batchnorm_momentum_is_torch_equivalent():
    """torch BatchNorm momentum=0.1 == flax momentum=0.9: after one batch
    the running mean moves 10% of the way to the batch mean (flax's 0.99
    default would move only 1%)."""
    from cerebra.models.layers import ConvLayer2D

    m = ConvLayer2D(out_channels=4, kernel=(3, 3))
    x = jnp.ones((2, 8, 8, 3)) * 5.0
    v = m.init(jax.random.key(0), x, train=True)
    _, updated = m.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.key(1)})
    bs = jax.tree.leaves(updated["batch_stats"])
    # running stats moved measurably after ONE step (momentum 0.9, not 0.99)
    moved = [b for b in bs if float(np.abs(np.asarray(b)).max()) > 1e-3]
    assert moved, "running stats barely moved - momentum still at flax default?"
