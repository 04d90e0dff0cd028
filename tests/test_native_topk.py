"""Parity: native C++ brute-force L2 top-k ↔ on-device JAX kernel ↔ numpy."""

import jax.numpy as jnp
import numpy as np
import pytest

from cerebra.eval.native_topk import available, topk_l2_native
from cerebra.eval.retrieval import l2_topk

pytestmark = pytest.mark.skipif(not available(), reason="no C++ toolchain")


def test_native_matches_numpy(rng):
    g = rng.normal(size=(64, 24)).astype(np.float32)
    q = rng.normal(size=(10, 24)).astype(np.float32)
    D, I = topk_l2_native(g, q, k=5)
    d2 = ((q[:, None, :] - g[None]) ** 2).sum(-1)
    want_idx = np.argsort(d2, axis=1)[:, :5]
    want_d = np.take_along_axis(d2, want_idx, axis=1)
    np.testing.assert_allclose(D, want_d, rtol=1e-4, atol=1e-4)
    got_d = np.take_along_axis(d2, I, axis=1)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-4)


def test_native_matches_device_kernel(rng):
    g = rng.normal(size=(40, 3, 8)).astype(np.float32)  # flattened like faiss
    q = rng.normal(size=(7, 3, 8)).astype(np.float32)
    Dn, In = topk_l2_native(g, q, k=4)
    Dj, Ij = l2_topk(jnp.asarray(g), jnp.asarray(q), 4)
    np.testing.assert_allclose(Dn, np.asarray(Dj), rtol=1e-3, atol=1e-3)
    # indices agree up to distance ties
    d2 = ((q.reshape(7, -1)[:, None] - g.reshape(40, -1)[None]) ** 2).sum(-1)
    np.testing.assert_allclose(
        np.take_along_axis(d2, In, 1), np.take_along_axis(d2, np.asarray(Ij), 1),
        rtol=1e-3, atol=1e-3,
    )


def test_native_multithreaded_consistent(rng):
    g = rng.normal(size=(128, 16)).astype(np.float32)
    q = rng.normal(size=(33, 16)).astype(np.float32)
    D1, I1 = topk_l2_native(g, q, k=6, n_threads=1)
    D4, I4 = topk_l2_native(g, q, k=6, n_threads=4)
    np.testing.assert_array_equal(I1, I4)
    np.testing.assert_allclose(D1, D4)


def test_k_larger_than_gallery(rng):
    g = rng.normal(size=(3, 4)).astype(np.float32)
    q = rng.normal(size=(2, 4)).astype(np.float32)
    D, I = topk_l2_native(g, q, k=10)
    assert D.shape == (2, 3)  # clamped to gallery size


def test_native_tiebreak_lower_index_wins():
    """faiss IndexFlatL2 / jax.lax.top_k convention: equal distances rank by
    LOWER gallery index (the heap comparator was inverted, returning [3,2]
    for an all-identical gallery)."""
    from cerebra.eval.native_topk import available, topk_l2_native

    if not available():
        pytest.skip("no C++ toolchain")
    g = np.ones((4, 3), np.float32)
    q = np.ones((2, 3), np.float32)
    _, idx = topk_l2_native(g, q, k=2)
    np.testing.assert_array_equal(idx, [[0, 1], [0, 1]])


def test_native_topk_input_guards():
    """Mismatched query dim raises (the C kernel would read out of bounds);
    empty gallery/query return sentinel-shaped results instead of crashing
    on reshape(0, -1)."""
    from cerebra.eval.native_topk import available, topk_l2_native

    if not available():
        pytest.skip("no C++ toolchain")
    with pytest.raises(ValueError, match="query dim"):
        topk_l2_native(np.zeros((4, 3), np.float32), np.zeros((2, 5), np.float32), 2)
    d, i = topk_l2_native(np.zeros((0, 3), np.float32), np.ones((2, 3), np.float32), 2)
    assert d.shape == (2, 2) and (i == -1).all()


def test_three_way_tie_parity_device_native_numpy():
    """On a gallery with duplicated rows (dead channels / repeated stimuli)
    the device kernel (lax.top_k, stable: lower index wins), the C++ kernel,
    and a numpy stable argsort must return the SAME indices — ties are where
    distance-only parity checks go blind."""
    from cerebra.eval.native_topk import available, topk_l2_native

    rng = np.random.default_rng(5)
    base = rng.normal(size=(3, 4)).astype(np.float32)
    g = np.concatenate([base, base, base])  # every row duplicated 3x
    q = base + rng.normal(scale=0.01, size=base.shape).astype(np.float32)
    k = 6

    _, idx_dev = l2_topk(jnp.asarray(g), jnp.asarray(q), k)
    d2 = ((q[:, None, :] - g[None, :, :]) ** 2).sum(-1).astype(np.float32)
    idx_np = np.argsort(d2, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.asarray(idx_dev), idx_np)
    if available():
        _, idx_nat = topk_l2_native(g, q, k)
        np.testing.assert_array_equal(idx_nat, idx_np)
