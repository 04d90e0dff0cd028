"""Conformer forward oracle: the REFERENCE'S OWN torch Conformer
(utils/Conformer.py:68-219, imported read-only) with its weights copied into
our flax model must produce the same (flat_tokens, features) in eval mode.

This pins the two subtle parity points the architecture comparison found:
the √emb_size attention scaling (:115, not √head_dim) and the exact erf
GELU (:146-148). Input is (B, 1, 22, 349): with the reference's pool
(1,25)/(1,5) that yields exactly 61 tokens = the 2440-dim flatten its own
head hardcodes (its default (22, 1000) input crashes the head — SURVEY §7
class of bug; our module documents the geometry)."""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_conformer_cls():
    from tests._reference_stubs import stub_torchsummary, stub_torchvision

    stub_torchvision()
    stub_torchsummary()
    sys.path.insert(0, REFERENCE)
    try:
        from utils.Conformer import Conformer as RefConformer  # noqa: PLC0415
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference Conformer not importable: {e}")
    finally:
        sys.path.remove(REFERENCE)
    return RefConformer


def _t(x):
    return np.asarray(x.detach().numpy())


def test_conformer_forward_matches_reference(ref_conformer_cls):
    import jax
    import jax.numpy as jnp
    import torch

    from cerebra.models.conformer import Conformer

    torch.manual_seed(0)
    ref = ref_conformer_cls(emb_size=40, depth=6)
    ref.eval()

    B, C, T = 2, 22, 349  # 61 tokens → the head's 2440-dim flatten
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, 1, C, T)).astype(np.float32)

    with torch.no_grad():
        ref_flat, ref_out = ref(torch.from_numpy(x))

    model = Conformer(emb_size=40, depth=6, out_features=384,
                      pool_size=25, pool_stride=5)
    variables = jax.tree.map(
        np.copy, model.init(jax.random.key(0), jnp.asarray(x), train=False)
    )
    params = variables["params"]
    stats = variables["batch_stats"]

    sd = {k: _t(v) for k, v in ref.state_dict().items()}
    pe = params["PatchEmbedding_0"]
    # torch Conv2d weight (out, in, kh, kw) → flax (kh, kw, in, out)
    pe["Conv_0"]["kernel"] = sd["0.shallownet.0.weight"].transpose(2, 3, 1, 0)
    pe["Conv_0"]["bias"] = sd["0.shallownet.0.bias"]
    pe["Conv_1"]["kernel"] = sd["0.shallownet.1.weight"].transpose(2, 3, 1, 0)
    pe["Conv_1"]["bias"] = sd["0.shallownet.1.bias"]
    pe["BatchNorm_0"]["scale"] = sd["0.shallownet.2.weight"]
    pe["BatchNorm_0"]["bias"] = sd["0.shallownet.2.bias"]
    stats["PatchEmbedding_0"]["BatchNorm_0"]["mean"] = sd["0.shallownet.2.running_mean"]
    stats["PatchEmbedding_0"]["BatchNorm_0"]["var"] = sd["0.shallownet.2.running_var"]
    pe["Conv_2"]["kernel"] = sd["0.projection.0.weight"].transpose(2, 3, 1, 0)
    pe["Conv_2"]["bias"] = sd["0.projection.0.bias"]

    def lin(dst, key):
        dst["kernel"] = sd[key + ".weight"].T
        dst["bias"] = sd[key + ".bias"]

    for d in range(6):
        blk = params[f"TransformerEncoderBlock_{d}"]
        p = f"1.{d}"  # TransformerEncoder is module 1 of the nn.Sequential
        blk["LayerNorm_0"]["scale"] = sd[f"{p}.0.fn.0.weight"]
        blk["LayerNorm_0"]["bias"] = sd[f"{p}.0.fn.0.bias"]
        lin(blk["queries"], f"{p}.0.fn.1.queries")
        lin(blk["keys"], f"{p}.0.fn.1.keys")
        lin(blk["values"], f"{p}.0.fn.1.values")
        lin(blk["projection"], f"{p}.0.fn.1.projection")
        blk["LayerNorm_1"]["scale"] = sd[f"{p}.1.fn.0.weight"]
        blk["LayerNorm_1"]["bias"] = sd[f"{p}.1.fn.0.bias"]
        lin(blk["Dense_0"], f"{p}.1.fn.1.0")
        lin(blk["Dense_1"], f"{p}.1.fn.1.3")

    lin(params["Dense_0"], "2.fc.0")
    lin(params["Dense_1"], "2.fc.3")
    lin(params["Dense_2"], "2.fc.6")

    flat, out = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(flat), _t(ref_flat), atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(out), _t(ref_out), atol=2e-4, rtol=2e-3)
