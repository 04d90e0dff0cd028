"""Exact L2 top-k retrieval as fused device matmuls.

faiss.IndexFlatL2 (utils/Utilities.py:45-55) does exact squared-L2 search.
On TPU the same computation is one GEMM plus a top-k:

    d(q, g) = ||q||² − 2 q·gᵀ + ||g||²

The (Nq, Ng) distance matrix rides the MXU; `lax.top_k` gives the neighbor
set. Parity: faiss returns SQUARED L2 distances — so do we.

A C++ reference implementation of the same brute-force search lives in
native/topk_l2.cpp for CPU parity testing (SURVEY.md §2.8).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def l2_topk(gallery: jax.Array, query: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact k-NN under squared L2 (faiss IndexFlatL2 semantics).

    gallery: (Ng, D); query: (Nq, D) → (distances (Nq, k), indices (Nq, k)),
    sorted ascending by distance. Features are flattened like the reference
    (utils/Utilities.py:32-35) by the caller.
    """
    gallery = gallery.reshape(gallery.shape[0], -1)
    query = query.reshape(query.shape[0], -1)
    g_sq = jnp.sum(gallery.astype(jnp.float32) ** 2, axis=-1)
    q_sq = jnp.sum(query.astype(jnp.float32) ** 2, axis=-1)
    cross = jnp.dot(query, gallery.T, preferred_element_type=jnp.float32)
    d2 = q_sq[:, None] - 2.0 * cross + g_sq[None, :]
    neg_d, idx = jax.lax.top_k(-d2, k)
    return jnp.maximum(-neg_d, 0.0), idx


def retrieval_recall_precision(
    gallery_features: jax.Array,
    query_features: jax.Array,
    gallery_labels: jax.Array,  # (Ng,) int
    query_labels: jax.Array,  # (Nq,) int
    k: int = 5,
    n_classes: int | None = None,
) -> Tuple[float, float, np.ndarray, np.ndarray]:
    """Fully-vectorized per-class Recall/Precision with the reference's
    scoring semantics (utils/Utilities.py:107-164):

    - per query: TP if ANY of the top-k gallery neighbors shares its class;
      classInstanceRetrieved = count of same-class neighbors in top-k;
    - per class c: Recall = 100·TP_c/N_c, Precision = 100·inst_c/(N_c·k),
      each **rounded to 2 decimals** (the reference rounds before averaging);
    - macro average over classes present in the query set.

    Returns (recall_total, precision_total, per_class_recall, per_class_prec)
    with per-class arrays indexed by class id (NaN for absent classes).
    """
    if n_classes is None:
        n_classes = int(max(int(jnp.max(gallery_labels)), int(jnp.max(query_labels)))) + 1
    _, idx = l2_topk(gallery_features, query_features, k)
    idx = np.asarray(idx)
    g_lab = np.asarray(gallery_labels)
    q_lab = np.asarray(query_labels)
    neigh = g_lab[idx]  # (Nq, k)
    same = neigh == q_lab[:, None]
    tp_q = same.any(axis=1)
    inst_q = same.sum(axis=1)

    recall = np.full(n_classes, np.nan)
    precision = np.full(n_classes, np.nan)
    for c in np.unique(q_lab):
        m = q_lab == c
        n_c = int(m.sum())
        recall[c] = round(tp_q[m].sum() * 100.0 / n_c, 2)
        precision[c] = round(inst_q[m].sum() * 100.0 / (n_c * k), 2)
    present = ~np.isnan(recall)
    return (
        float(np.mean(recall[present])),
        float(np.mean(precision[present])),
        recall,
        precision,
    )
