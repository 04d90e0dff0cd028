"""brain_map — channel × time clustering analysis (the reference's
BrainMapExperiment.ipynb: PCA + KMeans over per-channel time-bin features,
rendered as a channel-vs-time cluster heatmap)."""

from __future__ import annotations

import json
import os

import numpy as np

from cerebra.cli.common import load_corpus, reference_argparser
from cerebra.eval.metrics import PCA


def main(argv=None):
    parser = reference_argparser("Channel×time PCA/KMeans brain map")
    parser.add_argument("--n_time_bins", type=int, default=20)
    parser.add_argument("--n_clusters", type=int, default=5)
    parser.add_argument("--pca_dim", type=int, default=8)
    FLAGS, _ = parser.parse_known_args(argv)
    os.makedirs(FLAGS.log_dir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.cluster import KMeans

    corpus = load_corpus(FLAGS)
    N, T, C = corpus.eeg.shape
    n_bins = min(FLAGS.n_time_bins, T)  # no empty (NaN) bins
    bins = np.array_split(np.arange(T), n_bins)
    present = np.unique(corpus.labels)
    # feature per (channel, time-bin): class-conditional mean power profile
    feats = np.zeros((C, n_bins, len(present)), dtype=np.float32)
    for ci, cls in enumerate(present):
        block = corpus.eeg[corpus.labels == cls]  # (n, T, C)
        power = (block**2).mean(axis=0)  # (T, C)
        for bi, idx in enumerate(bins):
            feats[:, bi, ci] = power[idx].mean(axis=0)
    flat = feats.reshape(C * n_bins, -1)
    dim = min(FLAGS.pca_dim, flat.shape[1])
    reduced = PCA(dim=dim, whit=0.5).fit(flat).apply(flat) if dim < flat.shape[1] else flat
    labels = KMeans(n_clusters=FLAGS.n_clusters, n_init=5, random_state=FLAGS.seed).fit_predict(
        reduced
    )
    grid = labels.reshape(C, n_bins)

    fig = plt.figure(figsize=(12, 8))
    plt.imshow(grid, aspect="auto", cmap="tab10", interpolation="nearest")
    plt.xlabel("time bin")
    plt.ylabel("channel")
    plt.title("channel × time cluster map")
    plt.colorbar(label="cluster")
    out_png = os.path.join(FLAGS.log_dir, "brain_map.png")
    plt.savefig(out_png, bbox_inches="tight")
    plt.close(fig)
    with open(os.path.join(FLAGS.log_dir, "brain_map.json"), "w") as f:
        json.dump({"clusters": grid.tolist()}, f)
    print(f"wrote {out_png}")
    return grid


if __name__ == "__main__":
    main()
