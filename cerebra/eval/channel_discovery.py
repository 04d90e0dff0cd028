"""Greedy channel discovery — vectorized over the channel axis.

The reference sweeps channels greedily (TestRetrieval_Perils_DiscoverChannels
.py:125-353 for 96-ch Perils; TestRetrieval_DiscoverChannels.py:189-425 for
128-ch Spampinato): each iteration tries every remaining channel, rebuilds a
faiss gallery over the fixed-set ∪ candidate time slices, and keeps the
channel with the best macro recall — ~C²/2 faiss index rebuilds, hours on CPU.

TPU-first key identity: squared L2 over concatenated per-channel features is
ADDITIVE across channels,

    d_{S∪{c}}(q, g) = Σ_{s∈S} d_s(q, g) + d_c(q, g),

so the per-channel distance tensors D[c] ∈ (Nq, Ng) are computed ONCE as one
einsum, and every greedy iteration is a broadcast add + batched top-k over
all candidates simultaneously — no feature rebuilds at all.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def per_channel_distances(gallery: jax.Array, query: jax.Array) -> jax.Array:
    """Per-channel squared-L2 distance tensors.

    gallery: (Ng, T, C); query: (Nq, T, C) → (C, Nq, Ng). One einsum for the
    cross terms (MXU), broadcast adds for the norms.
    """
    g = gallery.astype(jnp.float32)
    q = query.astype(jnp.float32)
    cross = jnp.einsum("qtc,gtc->cqg", q, g)  # (C, Nq, Ng)
    g_sq = jnp.sum(g * g, axis=1).T  # (C, Ng)
    q_sq = jnp.sum(q * q, axis=1).T  # (C, Nq)
    return q_sq[:, :, None] - 2.0 * cross + g_sq[:, None, :]


@functools.partial(jax.jit, static_argnames=("k", "n_classes"))
def recall_precision_for_distances(
    d: jax.Array,  # (..., Nq, Ng)
    gallery_labels: jax.Array,  # (Ng,)
    query_labels: jax.Array,  # (Nq,)
    k: int,
    n_classes: int,
):
    """Macro per-class (recall, precision) for a batch of distance matrices,
    with the reference's semantics (utils/Utilities.py:107-164): TP = any
    same-class neighbor in the top k; classIntanceRetrival accumulates the
    same-class count only on TP queries; per-class values rounded to 2
    decimals BEFORE macro-averaging. Returns ((...,), (...,))."""
    _, idx = jax.lax.top_k(-d, k)  # (..., Nq, k)
    neigh = gallery_labels[idx]
    same = neigh == query_labels[..., :, None]  # (..., Nq, k)
    tp = jnp.any(same, axis=-1).astype(jnp.float32)
    # same-class retrieval count, only credited when the query is a TP
    # (utils/Utilities.py:128-133)
    cir = jnp.sum(same, axis=-1).astype(jnp.float32) * tp
    onehot = jax.nn.one_hot(query_labels, n_classes, dtype=jnp.float32)  # (Nq, n_classes)
    counts = jnp.sum(onehot, axis=0)  # (n_classes,)
    tp_per_class = jnp.einsum("...q,qc->...c", tp, onehot)
    cir_per_class = jnp.einsum("...q,qc->...c", cir, onehot)
    present = counts > 0
    n_present = jnp.sum(present)
    recall_c = jnp.round(tp_per_class * 100.0 / jnp.maximum(counts, 1.0) * 100.0) / 100.0
    prec_c = jnp.round(cir_per_class * 100.0 / jnp.maximum(counts * k, 1.0) * 100.0) / 100.0
    recall = jnp.sum(jnp.where(present, recall_c, 0.0), axis=-1) / n_present
    precision = jnp.sum(jnp.where(present, prec_c, 0.0), axis=-1) / n_present
    return recall, precision


@functools.partial(jax.jit, static_argnames=("k", "n_classes"))
def recall_for_distances(
    d: jax.Array,  # (..., Nq, Ng)
    gallery_labels: jax.Array,  # (Ng,)
    query_labels: jax.Array,  # (Nq,)
    k: int,
    n_classes: int,
) -> jax.Array:
    """Macro per-class recall (reference rounding: per-class values rounded
    to 2 decimals before averaging, utils/Utilities.py:155-164) for a batch
    of distance matrices. Returns (...,) recalls."""
    recall, _ = recall_precision_for_distances(d, gallery_labels, query_labels, k, n_classes)
    return recall


@dataclasses.dataclass
class ChannelDiscoveryResult:
    selected: List[int]  # greedy-ordered channel indices
    recalls: List[float]  # best recall after adding each channel
    per_iteration: List[np.ndarray]  # candidate-recall vector per iteration


@dataclasses.dataclass
class WindowSweepResult:
    recalls: np.ndarray  # (C, n_windows)
    best_start: np.ndarray  # (C,) argmax window start per channel
    best_recall: np.ndarray  # (C,)
    precisions: Optional[np.ndarray] = None  # (C, n_windows)
    best_precision: Optional[np.ndarray] = None  # (C,) precision AT the best-recall window


def best_window_sweep(
    gallery: np.ndarray,  # (Ng, T, C)
    query: np.ndarray,  # (Nq, T, C)
    gallery_labels: np.ndarray,
    query_labels: np.ndarray,
    width: int = 1,
    top_k: int = 5,
    n_classes: Optional[int] = None,
    stride: int = 1,
) -> WindowSweepResult:
    """Per-channel best-time-window retrieval sweep — the computation behind
    the reference's logged per-channel "best ts" results
    (TestRetrieval_DiscoverChannels.py:141-187 and the commented
    `for iteration in range(0,480,1)` loop at :196-199, i.e. every
    BASELINE.md number).

    Vectorization: squared L2 over a window [s, s+w) decomposes as
    ‖q_w‖² − 2·q_w·g_wᵀ + ‖g_w‖², so per channel a `lax.scan` over window
    starts computes each window's (Nq, Ng) distances with ONE MXU GEMM —
    one device call per channel instead of T·C faiss index rebuilds, with
    peak memory (Nq, Ng) regardless of T. (The earlier per-timepoint
    (T, Nq, Ng) prefix-sum tensor was ~42 GB at full Spampinato scale —
    9572×2393×460 — and OOM'd device HBM.)
    """
    Ng, T, C = gallery.shape
    if not 1 <= width <= T:
        raise ValueError(f"window width {width} must be in [1, T={T}]")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    if n_classes is None:
        n_classes = int(max(gallery_labels.max(), query_labels.max())) + 1
    starts = np.arange(0, T - width + 1, stride)
    g_lab = jnp.asarray(gallery_labels)
    q_lab = jnp.asarray(query_labels)
    starts_d = jnp.asarray(starts)

    @functools.partial(jax.jit, static_argnames=())
    def sweep_channel(g_c, q_c):  # (Ng, T), (Nq, T)
        def one_window(_, s):
            qw = jax.lax.dynamic_slice_in_dim(q_c, s, width, axis=1)  # (Nq, w)
            gw = jax.lax.dynamic_slice_in_dim(g_c, s, width, axis=1)  # (Ng, w)
            d = (
                jnp.sum(qw * qw, axis=1)[:, None]
                - 2.0 * qw @ gw.T
                + jnp.sum(gw * gw, axis=1)[None, :]
            )
            return None, recall_precision_for_distances(d, g_lab, q_lab, top_k, n_classes)

        _, (r, p) = jax.lax.scan(one_window, None, starts_d)
        return r, p

    recalls = np.empty((C, len(starts)), dtype=np.float32)
    precisions = np.empty((C, len(starts)), dtype=np.float32)
    g_d = jnp.asarray(gallery, dtype=jnp.float32)
    q_d = jnp.asarray(query, dtype=jnp.float32)
    for c in range(C):
        r, p = sweep_channel(g_d[:, :, c], q_d[:, :, c])
        recalls[c] = np.asarray(r)
        precisions[c] = np.asarray(p)
    best_idx = recalls.argmax(axis=1)
    return WindowSweepResult(
        recalls=recalls,
        best_start=starts[best_idx],
        best_recall=recalls[np.arange(C), best_idx],
        precisions=precisions,
        best_precision=precisions[np.arange(C), best_idx],
    )


@functools.partial(jax.jit, static_argnames=("k", "n_classes"))
def _chunk_recall(D_chunk, accum, g_lab, q_lab, k, n_classes):
    return recall_for_distances(accum[None] + D_chunk, g_lab, q_lab, k, n_classes)


@functools.partial(jax.jit, static_argnames=("k", "n_classes"))
def _chunk_recall_raw(g_c, q_c, accum, g_lab, q_lab, k, n_classes):
    """Candidate recalls for a chunk of channels, distances computed ON THE
    FLY from the raw (chunk, N, T) channel slices. The chunk's (chunk, Nq,
    Ng) distance block exists only transiently inside this call — the full
    (C, Nq, Ng) tensor is never materialized (11.7 GB f32 at Spampinato
    scale 128×2393×9572; keeping it resident OOM'd the 15.75 GB v5e HBM in
    the round-5 hardware run even with chunked evaluation). The recompute
    is one MXU einsum, ~21 GFLOP per channel — noise next to the top-k."""
    g = g_c.astype(jnp.float32)  # (chunk, Ng, T)
    q = q_c.astype(jnp.float32)  # (chunk, Nq, T)
    cross = jnp.einsum("cqt,cgt->cqg", q, g)
    g_sq = jnp.sum(g * g, axis=2)  # (chunk, Ng)
    q_sq = jnp.sum(q * q, axis=2)  # (chunk, Nq)
    d = q_sq[:, :, None] - 2.0 * cross + g_sq[:, None, :]
    return recall_for_distances(accum[None] + d, g_lab, q_lab, k, n_classes)


@jax.jit
def _channel_distance(g_1, q_1):
    """(Nq, Ng) squared-L2 distances for ONE channel's (N, T) slices."""
    g = g_1.astype(jnp.float32)
    q = q_1.astype(jnp.float32)
    cross = q @ g.T
    return (
        jnp.sum(q * q, axis=1)[:, None] - 2.0 * cross + jnp.sum(g * g, axis=1)[None, :]
    )


def greedy_channel_discovery(
    gallery: np.ndarray,  # (Ng, T, C)
    query: np.ndarray,  # (Nq, T, C)
    gallery_labels: np.ndarray,
    query_labels: np.ndarray,
    top_k: int = 5,
    n_classes: Optional[int] = None,
    max_channels: Optional[int] = None,
    stop_on_no_improvement: bool = True,
    channel_chunk: Optional[int] = None,
) -> ChannelDiscoveryResult:
    """The full greedy sweep (TestRetrieval_Perils_DiscoverChannels.py:
    130-353) as max_channels device calls over precomputed distances.

    Stopping rule mirrors the reference (:331-351): keep the argmax channel
    each iteration; stop when the best candidate no longer improves on the
    best recall seen so far.

    `channel_chunk` bounds peak memory at full Spampinato scale
    (TestRetrieval_DiscoverChannels.py:189-425: 128 ch × ~9.6k gallery ×
    ~2.4k query → the per-channel distance tensor D is ~11.7 GB f32, most
    of a v5e's 15.75 GB HBM — the round-5 hardware run OOM'd with it
    resident): with a chunk set, D is NEVER materialized; each candidate
    chunk's (chunk, Nq, Ng) distance block is recomputed on the fly from
    the raw channel slices (one MXU einsum, ~21 GFLOP/channel) and exists
    only inside one device call. None (default) precomputes the full D
    once — cheapest when it fits. A chunk that does not divide C is fine:
    the final slice is zero-padded to the full chunk width so every call
    shares ONE jit signature (a ragged last chunk would otherwise cost a
    second 60-300 s remote compile on the tunneled TPU), and the padded
    rows' recalls are discarded.
    """
    C = gallery.shape[-1]
    if n_classes is None:
        n_classes = int(max(gallery_labels.max(), query_labels.max())) + 1
    if max_channels is None:
        max_channels = C
    chunk = channel_chunk or C
    g_lab = jnp.asarray(gallery_labels)
    q_lab = jnp.asarray(query_labels)
    if channel_chunk is None:
        D = per_channel_distances(jnp.asarray(gallery), jnp.asarray(query))  # (C, Nq, Ng)
        Nq, Ng = D.shape[1:]
        g_cm = q_cm = None
    else:
        D = None
        # channel-major raw slices stay resident instead of D: (C, N, T)
        g_cm = jnp.asarray(gallery, dtype=jnp.float32).transpose(2, 0, 1)
        q_cm = jnp.asarray(query, dtype=jnp.float32).transpose(2, 0, 1)
        Nq, Ng = q_cm.shape[1], g_cm.shape[1]

    selected: List[int] = []
    recalls: List[float] = []
    per_iteration: List[np.ndarray] = []
    accum = jnp.zeros((Nq, Ng), dtype=jnp.float32)
    best_so_far = -np.inf
    taken = np.zeros(C, dtype=bool)

    def pad_chunk(x):
        if x.shape[0] != chunk:  # pad ONLY the last slice
            x = jnp.pad(x, ((0, chunk - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))
        return x

    def eval_chunk(c0: int) -> np.ndarray:
        if D is not None:
            Dc = pad_chunk(D[c0 : c0 + chunk])
            return np.asarray(_chunk_recall(Dc, accum, g_lab, q_lab, top_k, n_classes))
        gc = pad_chunk(g_cm[c0 : c0 + chunk])
        qc = pad_chunk(q_cm[c0 : c0 + chunk])
        return np.asarray(_chunk_recall_raw(gc, qc, accum, g_lab, q_lab, top_k, n_classes))

    for _ in range(min(max_channels, C)):  # > C would re-select channel 0
        cand_recall = np.concatenate(
            [eval_chunk(c0) for c0 in range(0, C, chunk)]
        )[:C]
        cand_recall[taken] = -np.inf
        per_iteration.append(cand_recall.copy())
        best_c = int(np.argmax(cand_recall))
        best_r = float(cand_recall[best_c])
        if stop_on_no_improvement and best_r <= best_so_far:
            break
        best_so_far = best_r
        taken[best_c] = True
        selected.append(best_c)
        recalls.append(best_r)
        accum = accum + (
            D[best_c] if D is not None else _channel_distance(g_cm[best_c], q_cm[best_c])
        )

    return ChannelDiscoveryResult(selected=selected, recalls=recalls, per_iteration=per_iteration)
