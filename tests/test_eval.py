"""Retrieval/eval parity: on-device L2 top-k vs numpy brute force (the faiss
IndexFlatL2 golden), reference scoring semantics, vectorized channel sweep vs
a naive greedy reimplementation."""

import numpy as np
import pytest
import jax.numpy as jnp

from cerebra.data import make_synthetic_corpus
from cerebra.eval import (
    build_class_scores,
    evaluate,
    greedy_channel_discovery,
    l2_topk,
    per_channel_distances,
    retrieval_recall_precision,
    save_score_artifacts,
)
from cerebra.eval.channel_discovery import recall_for_distances


def _features(rng, n, d):
    return rng.normal(size=(n, d)).astype(np.float32)


def test_l2_topk_matches_numpy_bruteforce(rng):
    g, q = _features(rng, 50, 16), _features(rng, 9, 16)
    D, I = l2_topk(jnp.asarray(g), jnp.asarray(q), 5)
    d2 = ((q[:, None, :] - g[None, :, :]) ** 2).sum(-1)
    want_idx = np.argsort(d2, axis=1)[:, :5]
    want_d = np.take_along_axis(d2, want_idx, axis=1)
    np.testing.assert_allclose(np.asarray(D), want_d, rtol=1e-4, atol=1e-4)
    # indices may tie-swap; compare through distances
    got_d = np.take_along_axis(d2, np.asarray(I), axis=1)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-4)


def test_l2_topk_flattens_like_reference(rng):
    g = rng.normal(size=(20, 4, 8)).astype(np.float32)
    q = rng.normal(size=(3, 4, 8)).astype(np.float32)
    D1, I1 = l2_topk(jnp.asarray(g), jnp.asarray(q), 3)
    D2, I2 = l2_topk(jnp.asarray(g.reshape(20, -1)), jnp.asarray(q.reshape(3, -1)), 3)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D2), atol=1e-5)


def test_reference_scoring_semantics():
    """Hand-built case checking TP / classIntanceRetrival / rounding
    (utils/Utilities.py:107-164)."""
    # gallery labels: [0,0,0,1,1,1]; queries: one of each class
    g = np.array([[0.0], [0.1], [0.2], [10.0], [10.1], [10.2]], dtype=np.float32)
    q = np.array([[0.05], [10.05], [5.0]], dtype=np.float32)
    g_ids = [0, 0, 0, 1, 1, 1]
    q_ids = [0, 1, 1]  # third query (midpoint) is class 1 but retrieves both
    from cerebra.data.schema import LabelCatalog

    cat = LabelCatalog.synthetic(["n0", "n1"])
    recall, precision, scores = evaluate(g, q, g_ids, q_ids, cat, top_k=3)
    c0 = scores["data"][cat.class_id_to_str[0]]
    c1 = scores["data"][cat.class_id_to_str[1]]
    assert c0["TP"] == 1 and c0["TotalClass"] == 1
    assert c0["classIntanceRetrival"] == 3 and c0["Precision"] == 100.0
    # q2 hits its class; q3 (midpoint, 5.0) retrieves the closer class-0
    # points (d²=23.04, 24.01 < 25) → miss
    assert c1["TotalClass"] == 2 and c1["TP"] == 1
    assert c1["Recall"] == 50.0
    assert recall == (100.0 + 50.0) / 2


def test_retrieval_recall_precision_matches_dict_path(rng):
    corpus = make_synthetic_corpus(seed=3, n_per_class=8, n_classes=5, n_channels=4,
                                   n_samples=32, class_signal_scale=2.0)
    feats = corpus.eeg.reshape(corpus.n, -1)
    split = corpus.n // 2
    g, q = feats[:split], feats[split:]
    g_ids, q_ids = corpus.labels[:split], corpus.labels[split:]
    r1, p1, rc, pc = retrieval_recall_precision(
        jnp.asarray(g), jnp.asarray(q), jnp.asarray(g_ids), jnp.asarray(q_ids), k=5
    )
    r2, p2, _ = evaluate(g, q, list(g_ids), list(q_ids), corpus.catalog, top_k=5)
    assert abs(r1 - r2) < 1e-9 and abs(p1 - p2) < 1e-9


def test_save_score_artifacts(tmp_path, rng):
    from cerebra.data.schema import LabelCatalog

    cat = LabelCatalog.synthetic(["n0", "n1"])
    g, q = _features(rng, 12, 6), _features(rng, 6, 6)
    g_ids = list(np.arange(12) % 2)
    q_ids = list(np.arange(6) % 2)
    r, p, scores = evaluate(g, q, g_ids, q_ids, cat, top_k=5)
    paths = save_score_artifacts(str(tmp_path), "synthetic", scores, r, p)
    import json, torch

    loaded = torch.load(paths[0], weights_only=False)
    assert set(loaded["data"].keys()) == {cat.class_id_to_str[0], cat.class_id_to_str[1]}
    with open(paths[1]) as f:
        js = json.load(f)
    assert js["data"][cat.class_id_to_str[0]]["TotalRetrival"] % 5 == 0
    assert paths[2].endswith("_.csv")


def test_per_channel_distances_additivity(rng):
    g = rng.normal(size=(10, 7, 3)).astype(np.float32)
    q = rng.normal(size=(4, 7, 3)).astype(np.float32)
    D = np.asarray(per_channel_distances(jnp.asarray(g), jnp.asarray(q)))
    # sum over channels == full-feature squared L2
    full = ((q.reshape(4, -1)[:, None, :] - g.reshape(10, -1)[None]) ** 2).sum(-1)
    np.testing.assert_allclose(D.sum(0), full, rtol=1e-4, atol=1e-4)
    # each channel tensor is that channel's own distance
    d0 = ((q[:, :, 0][:, None, :] - g[:, :, 0][None]) ** 2).sum(-1)
    np.testing.assert_allclose(D[0], d0, rtol=1e-4, atol=1e-4)


def _naive_greedy(gallery, query, g_lab, q_lab, k, n_classes):
    """Direct reimplementation of the reference loop (TestRetrieval_Perils_
    DiscoverChannels.py:130-353) with numpy brute-force search."""
    C = gallery.shape[-1]
    selected, best_so_far = [], -np.inf
    while len(selected) < C:
        best_c, best_r = None, -np.inf
        for c in range(C):
            if c in selected:
                continue
            chans = selected + [c]
            gf = gallery[:, :, chans].reshape(len(gallery), -1)
            qf = query[:, :, chans].reshape(len(query), -1)
            d2 = ((qf[:, None, :] - gf[None]) ** 2).sum(-1)
            idx = np.argsort(d2, axis=1)[:, :k]
            tp = (g_lab[idx] == q_lab[:, None]).any(1)
            recs = []
            for cl in range(n_classes):
                m = q_lab == cl
                if m.any():
                    recs.append(round(tp[m].sum() * 100 / m.sum(), 2))
            r = float(np.mean(recs))
            if r > best_r:
                best_c, best_r = c, r
        if best_r <= best_so_far:
            break
        best_so_far = best_r
        selected.append(best_c)
    return selected


def test_greedy_channel_discovery_matches_naive(rng):
    corpus = make_synthetic_corpus(seed=7, n_per_class=6, n_classes=4, n_channels=5,
                                   n_samples=24, class_signal_scale=1.5)
    half = corpus.n // 2
    g, q = corpus.eeg[:half], corpus.eeg[half:]
    gl, ql = corpus.labels[:half], corpus.labels[half:]
    res = greedy_channel_discovery(g, q, gl, ql, top_k=3, n_classes=4)
    want = _naive_greedy(g, q, gl, ql, 3, 4)
    assert res.selected == want
    assert len(res.recalls) == len(res.selected)
    assert all(b >= a for a, b in zip(res.recalls, res.recalls[1:]))  # greedy monotone


def test_recall_for_distances_rounding():
    # 3 queries of class 0 where 2 hit → recall 66.67 (not 66.66666)
    d = jnp.asarray(np.array([[[0.0, 1.0], [0.0, 1.0], [1.0, 0.0]]], dtype=np.float32))
    g_lab = jnp.asarray(np.array([0, 1]))
    q_lab = jnp.asarray(np.array([0, 0, 0]))
    r = float(recall_for_distances(d, g_lab, q_lab, 1, 2)[0])
    assert abs(r - 66.67) < 1e-3


def test_best_window_sweep_matches_naive(rng):
    from cerebra.eval.channel_discovery import best_window_sweep

    corpus = make_synthetic_corpus(seed=9, n_per_class=5, n_classes=3, n_channels=3,
                                   n_samples=12, class_signal_scale=1.5)
    half = corpus.n // 2
    g, q = corpus.eeg[:half], corpus.eeg[half:]
    gl, ql = corpus.labels[:half], corpus.labels[half:]
    width, k = 3, 2
    res = best_window_sweep(g, q, gl, ql, width=width, top_k=k, n_classes=3)
    assert res.recalls.shape == (3, 12 - width + 1)
    # naive: per (channel, window) brute-force retrieval
    for c in range(3):
        for s in range(12 - width + 1):
            gf = g[:, s:s + width, c]
            qf = q[:, s:s + width, c]
            d2 = ((qf[:, None, :] - gf[None]) ** 2).sum(-1)
            idx = np.argsort(d2, axis=1)[:, :k]
            tp = (gl[idx] == ql[:, None]).any(1)
            recs = [round(tp[ql == cl].sum() * 100 / (ql == cl).sum(), 2)
                    for cl in range(3) if (ql == cl).any()]
            want = float(np.mean(recs))
            assert abs(res.recalls[c, s] - want) < 0.02, (c, s)


def test_precision_for_distances_matches_evaluate(rng):
    """recall_precision_for_distances (the sweep's vectorized metric) agrees
    with the scores.evaluate protocol (the reference formula) on the same
    feature matrix."""
    import jax.numpy as jnp

    from cerebra.data.schema import LabelCatalog
    from cerebra.eval.channel_discovery import recall_precision_for_distances
    from cerebra.eval.scores import evaluate

    g = rng.normal(size=(40, 6)).astype(np.float32)
    q = rng.normal(size=(15, 6)).astype(np.float32)
    gl = np.repeat(np.arange(4), 10)
    ql = rng.integers(0, 4, size=15)
    cat = LabelCatalog(wnids=tuple("abcd"), class_names=tuple("abcd"),
                       imagenet_class_ids=tuple("abcd"))
    want_r, want_p, _ = evaluate(g, q, gl, ql, cat, top_k=5)
    d = (
        np.sum(q**2, 1)[:, None] - 2 * q @ g.T + np.sum(g**2, 1)[None]
    ).astype(np.float32)
    got_r, got_p = recall_precision_for_distances(
        jnp.asarray(d), jnp.asarray(gl), jnp.asarray(ql), 5, 4
    )
    assert float(got_r) == pytest.approx(want_r, abs=1e-4)
    assert float(got_p) == pytest.approx(want_p, abs=1e-4)


def test_best_window_log_format(tmp_path):
    """The sweep CLI emits the reference's logged-number line format
    (TestRetrieval_DiscoverChannels.py:141-154) with channel names."""
    import re

    from cerebra.cli.discover_channels import main

    main(["--synthetic", "--synthetic_classes", "3", "--synthetic_per_class", "5",
          "--synthetic_channels", "8", "--synthetic_samples", "64",
          "--time_low", "0", "--time_high", "64", "--best_window_sweep",
          "--log_dir", str(tmp_path)])
    lines = (tmp_path / "best_window_log.txt").read_text().strip().splitlines()
    assert len(lines) == 8
    pat = (r"MasterFixedChannels = \[\d+\] # \S+ #best ts \d+_\d+  with Scores: "
           r"\{'Recall': [\d.]+, 'Precision': [\d.]+\}")
    for line in lines:
        assert re.fullmatch(pat, line), line


def test_faiss_stub_pads_to_k_when_gallery_smaller():
    """faiss returns exactly k columns even when ntotal < k (FLT_MAX / −1
    sentinels); the stub must too, or fixed-width unpacking in reference
    oracle code breaks."""
    from cerebra.eval.faiss_stub import IndexFlatL2

    idx = IndexFlatL2(4)
    idx.add(np.ones((3, 4), dtype=np.float32))
    D, I = idx.search(np.zeros((2, 4), dtype=np.float32), 5)
    assert D.shape == (2, 5) and I.shape == (2, 5)
    assert (I[:, 3:] == -1).all()
    assert (D[:, 3:] > 1e37).all()
    assert np.allclose(D[:, :3], 4.0)


def test_greedy_discovery_never_duplicates_channels():
    """max_channels > C with stop_on_no_improvement=False must stop after C
    selections instead of re-selecting the argmax of an all −inf vector."""
    from cerebra.eval import greedy_channel_discovery

    rng = np.random.default_rng(5)
    g = rng.normal(size=(20, 8, 4)).astype(np.float32)
    q = rng.normal(size=(10, 8, 4)).astype(np.float32)
    gl = rng.integers(0, 2, 20).astype(np.int32)
    ql = rng.integers(0, 2, 10).astype(np.int32)
    res = greedy_channel_discovery(
        g, q, gl, ql, max_channels=10, stop_on_no_improvement=False
    )
    assert sorted(res.selected) == [0, 1, 2, 3]
    assert np.isfinite(res.recalls).all()


def test_best_window_sweep_rejects_bad_width():
    from cerebra.eval.channel_discovery import best_window_sweep

    g = np.zeros((4, 8, 2), dtype=np.float32)
    q = np.zeros((3, 8, 2), dtype=np.float32)
    labels = np.zeros(4, dtype=np.int32), np.zeros(3, dtype=np.int32)
    with pytest.raises(ValueError, match="width"):
        best_window_sweep(g, q, *labels, width=9, n_classes=1)
    with pytest.raises(ValueError, match="stride"):
        best_window_sweep(g, q, *labels, width=2, stride=0, n_classes=1)


def test_greedy_discovery_channel_chunk_equivalent():
    """channel_chunk only bounds memory (full-Spampinato-scale sweeps); the
    greedy trajectory must be identical to the all-channels evaluation."""
    from cerebra.eval import greedy_channel_discovery

    rng = np.random.default_rng(0)
    g = rng.normal(size=(40, 16, 8)).astype(np.float32)
    q = rng.normal(size=(20, 16, 8)).astype(np.float32)
    gl = rng.integers(0, 4, 40).astype(np.int32)
    ql = rng.integers(0, 4, 20).astype(np.int32)
    a = greedy_channel_discovery(g, q, gl, ql, max_channels=4, stop_on_no_improvement=False)

    from cerebra.eval import channel_discovery as cd

    cd._chunk_recall_raw._clear_cache()
    b = greedy_channel_discovery(
        g, q, gl, ql, max_channels=4, stop_on_no_improvement=False, channel_chunk=3
    )
    assert a.selected == b.selected
    assert a.recalls == b.recalls
    # ADVICE r4: the ragged last chunk (8 % 3 = 2) must be padded to the full
    # chunk width — ONE jit signature, not a second 60-300 s remote compile
    # (round 5: the chunked path streams raw channel slices through
    # _chunk_recall_raw; the full distance tensor is never materialized)
    assert cd._chunk_recall_raw._cache_size() == 1
