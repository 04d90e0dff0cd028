"""Torch-oracle forward parity for the flax ResNet-50 + torchvision importer.

torchvision is not installed in this environment (and pretrained weights are
not fetchable — zero egress), so the oracle is a functional torch forward of
the torchvision resnet graph (bottleneck v1.5: stride on the 3×3 conv,
downsample = 1×1 conv + BN, eval-mode running stats) over a RANDOM state dict
laid out in torchvision's exact key naming — the same discipline as
tests/test_dinov2_vit.py. This pins the import mapping AND the flax graph
(stride placement, torch-style symmetric conv padding, maxpool grid) that the
pretrained path of utils/ResnetFeatureRegressor.py:11-12 depends on.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cerebra.models.resnet import (
    ResNet,
    ResnetFeatureRegressor,
    import_torchvision_resnet50,
    init_feature_regressor,
)


def _t(rng, *shape, scale=0.2):
    return torch.from_numpy(rng.normal(scale=scale, size=shape).astype(np.float32))


def _bn_entries(sd, prefix, c, rng):
    sd[prefix + ".weight"] = 1.0 + _t(rng, c, scale=0.05)
    sd[prefix + ".bias"] = _t(rng, c, scale=0.05)
    sd[prefix + ".running_mean"] = _t(rng, c, scale=0.05)
    sd[prefix + ".running_var"] = 1.0 + 0.1 * torch.rand(c)
    sd[prefix + ".num_batches_tracked"] = torch.tensor(7)  # importer must skip


def random_torchvision_sd(rng, width=16, stage_sizes=(1, 2, 1, 1), num_classes=0):
    """Random weights in torchvision resnet50 state-dict naming."""
    sd = {}
    sd["conv1.weight"] = _t(rng, width, 3, 7, 7)
    _bn_entries(sd, "bn1", width, rng)
    inplanes = width
    for i, n_blocks in enumerate(stage_sizes):
        planes = width * 2**i
        for j in range(n_blocks):
            t = f"layer{i + 1}.{j}"
            sd[t + ".conv1.weight"] = _t(rng, planes, inplanes, 1, 1)
            _bn_entries(sd, t + ".bn1", planes, rng)
            sd[t + ".conv2.weight"] = _t(rng, planes, planes, 3, 3)
            _bn_entries(sd, t + ".bn2", planes, rng)
            sd[t + ".conv3.weight"] = _t(rng, planes * 4, planes, 1, 1)
            _bn_entries(sd, t + ".bn3", planes * 4, rng)
            if j == 0:  # stride 2 (or channel change in stage 0) → downsample
                sd[t + ".downsample.0.weight"] = _t(rng, planes * 4, inplanes, 1, 1)
                _bn_entries(sd, t + ".downsample.1", planes * 4, rng)
            inplanes = planes * 4
    if num_classes:
        sd["fc.weight"] = _t(rng, num_classes, inplanes)
        sd["fc.bias"] = _t(rng, num_classes)
    return sd


def torch_resnet_forward(sd, x, width=16, stage_sizes=(1, 2, 1, 1), num_classes=0):
    """Eval-mode functional forward of torchvision's resnet graph (NCHW)."""

    def bn(h, prefix):
        return F.batch_norm(
            h, sd[prefix + ".running_mean"], sd[prefix + ".running_var"],
            sd[prefix + ".weight"], sd[prefix + ".bias"], training=False,
        )

    y = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    y = F.relu(bn(y, "bn1"))
    y = F.max_pool2d(y, 3, stride=2, padding=1)
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            t = f"layer{i + 1}.{j}"
            stride = 2 if i > 0 and j == 0 else 1
            r = y
            h = F.relu(bn(F.conv2d(y, sd[t + ".conv1.weight"]), t + ".bn1"))
            h = F.relu(bn(F.conv2d(h, sd[t + ".conv2.weight"], stride=stride, padding=1), t + ".bn2"))
            h = bn(F.conv2d(h, sd[t + ".conv3.weight"]), t + ".bn3")
            if t + ".downsample.0.weight" in sd:
                r = bn(F.conv2d(y, sd[t + ".downsample.0.weight"], stride=stride), t + ".downsample.1")
            y = F.relu(h + r)
    y = y.mean(dim=(2, 3))
    if num_classes:
        y = F.linear(y, sd["fc.weight"], sd["fc.bias"])
    return y


def test_imported_forward_matches_torch():
    rng = np.random.default_rng(7)
    width, stages, ncls = 16, (1, 2, 1, 1), 8
    sd = random_torchvision_sd(rng, width, stages, num_classes=ncls)
    # odd spatial size exercises the stride-2 sampling grid (torch symmetric
    # padding vs SAME trailing padding disagree on even sizes — the fixed bug)
    x = rng.normal(scale=0.5, size=(2, 3, 33, 33)).astype(np.float32)

    want = torch_resnet_forward(sd, torch.from_numpy(x), width, stages, ncls).numpy()

    model = ResNet(stage_sizes=stages, num_classes=ncls, width=width)
    variables = import_torchvision_resnet50(sd, num_classes=ncls, stage_sizes=stages)
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    # 5e-4: XLA-CPU conv reductions are threaded (order varies run to run);
    # 2e-4 flaked once under suite load on the 4-stage stack
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


@pytest.mark.slow  # even-size edge of the parity already covered fast by
# test_imported_forward_matches_torch
def test_imported_forward_matches_torch_even_size_features():
    # even input size + feature (no-fc) path
    rng = np.random.default_rng(11)
    width, stages = 16, (1, 1, 1, 1)
    sd = random_torchvision_sd(rng, width, stages, num_classes=0)
    x = rng.normal(scale=0.5, size=(3, 3, 32, 32)).astype(np.float32)
    want = torch_resnet_forward(sd, torch.from_numpy(x), width, stages, 0).numpy()
    model = ResNet(stage_sizes=stages, num_classes=0, width=width)
    variables = import_torchvision_resnet50(sd, num_classes=0, stage_sizes=stages)
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    # 5e-4: XLA-CPU conv reductions are threaded (order varies run to run);
    # 2e-4 flaked once under suite load on the 4-stage stack
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_importer_matches_init_tree_full_resnet50():
    """Full-size resnet50 sd maps 1:1 onto the flax init tree (names+shapes)."""
    rng = np.random.default_rng(3)
    sd = random_torchvision_sd(rng, width=64, stage_sizes=(3, 4, 6, 3))
    variables = import_torchvision_resnet50(sd)
    model = ResNet()
    ref = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    )
    got_shapes = jax.tree.map(lambda a: tuple(a.shape), variables)
    want_shapes = jax.tree.map(lambda a: tuple(a.shape), dict(ref))
    assert got_shapes == want_shapes


@pytest.mark.slow  # full ResNet-50 init compile (~30 s on CPU)
def test_init_feature_regressor_grafts_pretrained(tmp_path):
    rng = np.random.default_rng(5)
    sd = random_torchvision_sd(rng, width=64, stage_sizes=(3, 4, 6, 3))
    path = tmp_path / "resnet50.pth"
    torch.save(sd, str(path))
    model, variables = init_feature_regressor(
        jax.random.key(0), output_size=16, pretrained_path=str(path), image_size=32
    )
    got = np.asarray(variables["params"]["ResNet_0"]["Conv_0"]["kernel"])
    want = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want)
    # fresh regression head, pretrained backbone stats present
    assert variables["params"]["fc"]["kernel"].shape == (2048, 16)
    assert "ResNet_0" in variables["batch_stats"]
    out = model.apply(variables, jnp.zeros((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 16)


@pytest.mark.slow  # off-by-default memory lever; double tiny-ResNet grad compile ~40 s
def test_resnet_remat_matches_plain():
    """remat=True (per-block jax.checkpoint in the Barlow towers) must be a
    pure memory/scheduling change: forward values, BN batch_stats updates,
    AND grads match the plain path, on the SAME variable tree (block names
    are pinned so remat/plain checkpoints interoperate)."""
    x = jnp.asarray(np.random.default_rng(11).normal(size=(2, 32, 32, 3)), jnp.float32)
    kw = dict(stage_sizes=(1, 1), width=16)
    plain = ResNet(**kw)
    remat = ResNet(**kw, remat=True)
    vars_ = plain.init(jax.random.key(0), x, train=False)
    assert set(vars_["params"]) == {
        "Conv_0", "BatchNorm_0", "BottleneckBlock_0", "BottleneckBlock_1"
    }

    out_p, st_p = plain.apply(vars_, x, train=True, mutable=["batch_stats"])
    out_r, st_r = remat.apply(vars_, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=1e-6, rtol=1e-6)
    from jax.flatten_util import ravel_pytree

    fp, _ = ravel_pytree(st_p)
    fr, _ = ravel_pytree(st_r)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fr), atol=1e-6, rtol=1e-6)

    def loss(m):
        def f(params):
            out, _ = m.apply(
                {**vars_, "params": params}, x, train=True, mutable=["batch_stats"]
            )
            return jnp.sum(out**2)

        return f

    gp, _ = ravel_pytree(jax.grad(loss(plain))(vars_["params"]))
    gr, _ = ravel_pytree(jax.grad(loss(remat))(vars_["params"]))
    rel = float(jnp.linalg.norm(gp - gr) / jnp.linalg.norm(gp))
    assert rel < 1e-6, rel
