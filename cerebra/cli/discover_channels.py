"""Greedy channel discovery (reference TestRetrieval_Perils_DiscoverChannels
.py / TestRetrieval_DiscoverChannels.py; call stack SURVEY.md §3.5).

The reference's constants-at-top script becomes a CLI; the ~C²/2 faiss
rebuilds become one per-channel distance einsum + C batched top-k calls
(cerebra.eval.channel_discovery). Split: seed-123 80/20 random_split
(TestRetrieval_Perils_DiscoverChannels.py:62-63); channel-wise-normalized
EEG like the reference's apply_channel_wise_norm loader.
"""

from __future__ import annotations

import json
import os
import time

import jax.numpy as jnp
import numpy as np

from cerebra.cli.common import load_corpus, reference_argparser
from cerebra.data import random_split_indices
from cerebra.data.channelmap import read_channel_list, read_channel_map
from cerebra.eval import greedy_channel_discovery
from cerebra.signal.norm import channel_wise_norm


def main(argv=None):
    parser = reference_argparser("Greedy channel discovery (TPU)")
    parser.add_argument("--max_channels", type=int, default=0, help="0 = all")
    parser.add_argument("--channel_map", type=str, default="", help="optional channelmap file")
    parser.add_argument("--best_window_sweep", action="store_true",
                        help="per-channel best-time-window sweep instead of the "
                             "greedy set search (TestRetrieval_DiscoverChannels "
                             "'best ts' mode)")
    parser.add_argument("--window_width", type=int, default=1)
    parser.add_argument("--channel_chunk", type=int, default=0,
                        help="evaluate candidate recalls in channel chunks to bound "
                             "memory (full Spampinato scale: D is ~11.7 GB; use 16). "
                             "0 = all channels in one call")
    FLAGS, _ = parser.parse_known_args(argv)
    print(FLAGS)
    os.makedirs(FLAGS.log_dir, exist_ok=True)

    corpus = load_corpus(FLAGS)
    eeg = np.asarray(channel_wise_norm(jnp.asarray(corpus.eeg)))

    train_idx, test_idx = random_split_indices(corpus.n, [0.8, 0.2], seed=123)

    if FLAGS.best_window_sweep:
        from cerebra.eval.channel_discovery import best_window_sweep

        t0 = time.perf_counter()
        res = best_window_sweep(
            eeg[train_idx], eeg[test_idx],
            corpus.labels[train_idx], corpus.labels[test_idx],
            width=FLAGS.window_width, top_k=FLAGS.topK,
            n_classes=corpus.catalog.n_classes,
        )
        dt = time.perf_counter() - t0
        names = _channel_names(FLAGS, corpus.n_channels)
        order = np.argsort(res.best_recall)[::-1]
        print(f"best-window sweep ({corpus.n_channels} ch × width {FLAGS.window_width}) in {dt:.2f}s")
        # the reference's logged-number format, one line per channel
        # (TestRetrieval_DiscoverChannels.py:141-154):
        #   MasterFixedChannels = [33] # AF3 #best ts 167_168  with Scores: {...}
        log_lines = []
        for ch in order:
            name = names[ch] if names else f"ch{ch}"
            s, e = int(res.best_start[ch]), int(res.best_start[ch]) + FLAGS.window_width
            line = (
                f"MasterFixedChannels = [{ch}] # {name} #best ts {s}_{e}  with Scores: "
                f"{{'Recall': {float(res.best_recall[ch])}, "
                f"'Precision': {float(res.best_precision[ch])}}}"
            )
            log_lines.append(line)
        for line in log_lines[:10]:
            print("  " + line)
        with open(os.path.join(FLAGS.log_dir, "best_window_log.txt"), "w") as f:
            f.write("\n".join(log_lines) + "\n")
        with open(os.path.join(FLAGS.log_dir, "best_window_sweep.json"), "w") as f:
            json.dump({"best_start": res.best_start.tolist(),
                       "best_recall": res.best_recall.tolist(),
                       "best_precision": res.best_precision.tolist(),
                       "channel_names": names,
                       "elapsed_s": dt}, f, indent=2)
        return res
    result = greedy_channel_discovery_entry(FLAGS, corpus, eeg, train_idx, test_idx)
    return result


def _channel_names(FLAGS, n_channels):
    if not FLAGS.channel_map:
        return None
    if FLAGS.channel_map.endswith("perils_channel_map.txt"):
        return read_channel_list(FLAGS.channel_map)
    cm = read_channel_map(FLAGS.channel_map)
    return [cm.get(i + 1, str(i + 1)) for i in range(n_channels)]  # map is 1-based


def greedy_channel_discovery_entry(FLAGS, corpus, eeg, train_idx, test_idx):
    t0 = time.perf_counter()
    result = greedy_channel_discovery(
        eeg[train_idx], eeg[test_idx],
        corpus.labels[train_idx], corpus.labels[test_idx],
        top_k=FLAGS.topK,
        n_classes=corpus.catalog.n_classes,
        max_channels=FLAGS.max_channels or None,
        channel_chunk=FLAGS.channel_chunk or None,
    )
    dt = time.perf_counter() - t0
    names = _channel_names(FLAGS, corpus.n_channels)
    print(f"greedy sweep over {corpus.n_channels} channels in {dt:.2f}s")
    for rank, (ch, rec) in enumerate(zip(result.selected, result.recalls)):
        label = names[ch] if names else f"ch{ch}"
        print(f"  +{label} (idx {ch}) → recall {rec:.2f}")

    out = {
        "selected_channels": result.selected,
        "recalls": result.recalls,
        "channel_names": [names[c] for c in result.selected] if names else None,
        "elapsed_s": dt,
    }
    with open(os.path.join(FLAGS.log_dir, "channel_discovery.json"), "w") as f:
        json.dump(out, f, indent=2)
    return result


if __name__ == "__main__":
    main()
