"""TestRetrieval_Perils_SaveChannelWiseOutputs — dump a per-channel EEG trace
plot PNG per channel (reference TestRetrieval_Perils_SaveChannelWiseOutputs
.py:62-70; the rest of that file is a dead clone of the discovery sweep)."""

from __future__ import annotations

import os

from cerebra.cli.common import load_corpus, reference_argparser


def main(argv=None):
    parser = reference_argparser("Per-channel EEG trace dumps")
    parser.add_argument("--sample_index", type=int, default=0)
    parser.add_argument("--max_plots", type=int, default=0, help="0 = all channels")
    FLAGS, _ = parser.parse_known_args(argv)
    os.makedirs(FLAGS.log_dir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    corpus = load_corpus(FLAGS)
    eeg = corpus.eeg[FLAGS.sample_index]  # (T, C)
    n = corpus.n_channels if not FLAGS.max_plots else min(FLAGS.max_plots, corpus.n_channels)
    paths = []
    for ch in range(n):
        fig = plt.figure(figsize=(10, 3))
        plt.plot(eeg[:, ch])
        plt.title(f"channel {ch}")
        out = os.path.join(FLAGS.log_dir, f"ch_{ch}_the_perils.png")
        plt.savefig(out, bbox_inches="tight")
        plt.close(fig)
        paths.append(out)
    print(f"wrote {len(paths)} channel plots to {FLAGS.log_dir}")
    return paths


if __name__ == "__main__":
    main()
