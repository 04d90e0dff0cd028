"""GetTsneForRawEEG — per-subject raw-EEG 3-component t-SNE 3D scatter PNGs
(reference GetTsneForRawEEG.py:39-113). Host-side sklearn/matplotlib tool."""

from __future__ import annotations

import os

import numpy as np

from cerebra.cli.common import load_corpus, reference_argparser


def main(argv=None):
    parser = reference_argparser("Raw-EEG t-SNE visualization")
    parser.add_argument("--subjects", type=str, default="1,2,3,4,5,6")
    parser.add_argument("--perplexity", type=float, default=40.0)
    FLAGS, _ = parser.parse_known_args(argv)
    os.makedirs(FLAGS.log_dir, exist_ok=True)

    from sklearn.manifold import TSNE

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.patches as mpatches
    import matplotlib.pyplot as plt

    corpus = load_corpus(FLAGS)
    outputs = []
    for subject in (int(s) for s in FLAGS.subjects.split(",")):
        mask = (corpus.subjects == subject) if not FLAGS.synthetic else np.ones(corpus.n, bool)
        if not mask.any():
            continue
        feats = corpus.eeg[mask].reshape(mask.sum(), -1)
        labels = corpus.labels[mask]
        if len(feats) < 3:  # sklearn requires perplexity < n_samples
            print(f"subject {subject}: only {len(feats)} trials, skipping t-SNE")
            continue
        perplexity = min(FLAGS.perplexity, len(feats) - 1)
        xt = TSNE(
            n_components=3, perplexity=perplexity, init="pca", learning_rate=0.1,
            max_iter=1000,
        ).fit_transform(feats)

        cmap = plt.get_cmap("tab20c", corpus.catalog.n_classes)
        handles = [
            mpatches.Patch(color=cmap(c), label=f"Class {c}")
            for c in np.unique(labels)
        ]
        fig = plt.figure(figsize=(20, 15))
        ax = fig.add_subplot(111, projection="3d")
        ax.set_title(f"EEG Subject {subject} RAW EEG")
        ax.view_init(azim=50, elev=40)
        ax.text2D(0.8, 0.05, s=f"n_samples={len(xt)}", transform=ax.transAxes)
        ax.scatter(xt[:, 0], xt[:, 1], xt[:, 2], c=[cmap(l) for l in labels], s=10, alpha=0.8)
        ax.legend(handles=handles, loc="best", fontsize=13, fancybox=True, ncol=5)
        out = os.path.join(FLAGS.log_dir, f"SUB_{subject}_RAW_EEG_features_distribution.png")
        plt.savefig(out, bbox_inches="tight", pad_inches=0)
        plt.close(fig)
        outputs.append(out)
        if FLAGS.synthetic:
            break
    print("wrote:", outputs)
    return outputs


if __name__ == "__main__":
    main()
