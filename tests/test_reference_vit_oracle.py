"""ORACLE: the reference's own DINO ViT (dino/vision_transformer.py:134-254,
imported and executed) vs cerebra.models.vit.VisionTransformer through
import_dino_vit_torch — forward CLS features, last-block attention maps,
normalized intermediate layers, and the fused Pallas block paths.

Stronger than the hand-written functional-torch parity in
tests/test_dinov2_vit.py: the golden values come from the reference's own
class running its own code.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_vit_module():
    sys.path.insert(0, REFERENCE)
    try:
        from dino import vision_transformer as ref_vit
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference dino.vision_transformer not importable: {e}")
    finally:
        sys.path.remove(REFERENCE)
    return ref_vit


_KW = dict(patch_size=8, embed_dim=32, depth=2, num_heads=2, mlp_ratio=4)


@pytest.fixture(scope="module")
def ref_pair(ref_vit_module):
    """(reference torch model in eval mode, its state dict, torch input)."""
    from functools import partial

    torch.manual_seed(0)
    model = ref_vit_module.VisionTransformer(
        img_size=[16], qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6), **_KW,
    )
    # non-degenerate weights: the default init leaves pos_embed/cls at
    # trunc-normal 0.02 — scale some weights up so attention is not uniform
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.05 * torch.randn_like(p))
    model.eval()
    x = torch.randn(2, 3, 16, 16, generator=torch.Generator().manual_seed(1))
    return model, model.state_dict(), x


def _flax_model(**extra):
    from cerebra.models.vit import VisionTransformer

    return VisionTransformer(img_size=16, **_KW, **extra)


def _flax_inputs(sd, x):
    from cerebra.models.vit import import_dino_vit_torch

    variables = import_dino_vit_torch(
        {k: v.numpy() for k, v in sd.items()}, depth=_KW["depth"]
    )
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # NCHW → NHWC
    return variables, xj


def test_forward_matches_reference(ref_pair):
    model, sd, x = ref_pair
    with torch.no_grad():
        want = model(x).numpy()  # CLS feature (:211-214)
    variables, xj = _flax_inputs(sd, x)
    got = np.asarray(_flax_model().apply(variables, xj, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_last_selfattention_matches_reference(ref_pair):
    model, sd, x = ref_pair
    with torch.no_grad():
        want = model.get_last_selfattention(x).numpy()  # (B, H, N, N) (:216-223)
    variables, xj = _flax_inputs(sd, x)
    got = np.asarray(
        _flax_model().apply(
            variables, xj, train=False, return_attention_of_last_block=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_intermediate_layers_match_reference(ref_pair):
    model, sd, x = ref_pair
    with torch.no_grad():
        want = [t.numpy() for t in model.get_intermediate_layers(x, n=2)]  # (:225-233)
    variables, xj = _flax_inputs(sd, x)
    got = _flax_model().apply(variables, xj, train=False, n_intermediate=2)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-4, atol=1e-4)


@pytest.mark.slow  # extra interpret-mode kernel compiles; the XLA-path
# oracle above stays in the fast suite
def test_fused_block_forward_matches_reference(ref_pair):
    """The fused Pallas attention+MLP half-block paths against the
    reference's own torch forward — the kernels' strongest oracle."""
    model, sd, x = ref_pair
    with torch.no_grad():
        want = model(x).numpy()
    variables, xj = _flax_inputs(sd, x)
    got = np.asarray(
        _flax_model(use_fused_attn=True, use_fused_mlp=True).apply(
            variables, xj, train=False
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
