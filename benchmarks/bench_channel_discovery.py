"""Benchmark: vectorized greedy channel discovery at Perils scale.

The reference sweep (TestRetrieval_Perils_DiscoverChannels.py:125-353)
rebuilds a faiss index per (iteration, candidate) — ~C²/2 index builds over
(T·|S|)-dim features; hours on CPU. Here the per-channel distance tensors
are one einsum and each greedy iteration is one batched top-k
(cerebra/eval/channel_discovery.py).

Prints one JSON line with the end-to-end sweep time at Perils shape.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main(n_gallery=1600, n_query=400, T=460, C=96, n_classes=40, top_k=5,
         iters=10, channel_chunk=None, stop_on_no_improvement=False):
    from cerebra.eval import greedy_channel_discovery

    rng = np.random.default_rng(0)
    g_lab = rng.integers(0, n_classes, size=n_gallery).astype(np.int32)
    q_lab = rng.integers(0, n_classes, size=n_query).astype(np.int32)
    sig = rng.normal(size=(n_classes, T, C)).astype(np.float32)
    gallery = (rng.normal(size=(n_gallery, T, C)) * 0.5).astype(np.float32) + sig[g_lab]
    query = (rng.normal(size=(n_query, T, C)) * 0.5).astype(np.float32) + sig[q_lab]

    # warmup: compile the distance einsum + batched top-k once
    greedy_channel_discovery(
        gallery[:64], query[:32], g_lab[:64], q_lab[:32], top_k=top_k,
        n_classes=n_classes, max_channels=1, stop_on_no_improvement=False,
        channel_chunk=channel_chunk,
    )
    greedy_channel_discovery(
        gallery, query, g_lab, q_lab, top_k=top_k, n_classes=n_classes,
        max_channels=1, stop_on_no_improvement=False, channel_chunk=channel_chunk,
    )
    t0 = time.perf_counter()
    result = greedy_channel_discovery(
        gallery, query, g_lab, q_lab, top_k=top_k, n_classes=n_classes,
        max_channels=iters, stop_on_no_improvement=stop_on_no_improvement,
        channel_chunk=channel_chunk,
    )
    dt = time.perf_counter() - t0
    # reference cost model: iters × C faiss builds+searches over growing dims
    print(
        json.dumps(
            {
                "metric": "channel_discovery_sweep_seconds",
                "value": round(dt, 3),
                "unit": "s",
                "detail": {
                    "iterations_run": len(result.per_iteration), "channels": C,
                    "gallery": n_gallery, "query": n_query,
                    "selected": result.selected[:5],
                    "n_selected": len(result.selected),
                },
            }
        )
    )
    return dt


if __name__ == "__main__":
    # `spampinato` = the FULL greedy sweep to convergence at the 128-channel
    # Spampinato scale (TestRetrieval_DiscoverChannels.py:189-425: 80/20 of
    # the ~12k-record corpus — the loop SURVEY §3.5 calls "hours on CPU").
    # D is ~11.7 GB f32 → candidate recalls evaluated in 16-channel chunks.
    if len(sys.argv) > 1 and sys.argv[1] == "spampinato":
        main(n_gallery=9572, n_query=2393, T=460, C=128, iters=128,
             channel_chunk=16, stop_on_no_improvement=True)
    else:
        main(iters=int(sys.argv[1]) if len(sys.argv) > 1 else 10)
