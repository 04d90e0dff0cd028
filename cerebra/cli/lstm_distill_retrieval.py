"""LSTMDistillRetreival — load a distilled LSTM checkpoint, replace the
corpus EEG with LSTM features, run retrieval (reference
LSTMDistillRetreival.py).

The reference takes `.dataset` of BOTH random_split halves, so gallery and
query are the identical full set — a train/test leak producing
self-retrieval numbers (SURVEY.md §7.7). Default here is the correct
disjoint split; `--compat_reference_leak` reproduces the reference behavior.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from cerebra.cli.common import load_corpus, reference_argparser, split_train_val
from cerebra.eval.scores import evaluate, save_score_artifacts
from cerebra.models import Model
from cerebra.models.lstm import import_torch_state_dict


def main(argv=None):
    parser = reference_argparser("Inline-LSTM retrieval evaluation (TPU)")
    parser.add_argument("--compat_reference_leak", action="store_true",
                        help="gallery == query == full set (reference bug §7.7)")
    FLAGS, _ = parser.parse_known_args(argv)
    print(FLAGS)
    os.makedirs(FLAGS.log_dir, exist_ok=True)

    corpus = load_corpus(FLAGS)
    if FLAGS.custom_model_weights and os.path.exists(FLAGS.custom_model_weights):
        import torch

        sd = torch.load(FLAGS.custom_model_weights, map_location="cpu", weights_only=False)
        params = import_torch_state_dict(sd)["params"]
        lstm_size = int(np.asarray(params["lstm"]["w_hh_l0"]).shape[0])
        layers = 1 + max(int(k.rsplit("_l", 1)[1]) for k in params["lstm"] if "w_hh" in k)
        out_dim = int(np.asarray(params["fc"]["kernel"]).shape[1])
        n_classes = int(np.asarray(params["head"]["kernel"]).shape[1]) if "head" in params else 40
        model = Model(input_size=corpus.n_channels, lstm_size=lstm_size, lstm_layers=layers,
                      output_size=out_dim, include_top="head" in params, n_classes=n_classes)
    else:
        model = Model(input_size=corpus.n_channels, lstm_size=corpus.n_channels,
                      lstm_layers=2, output_size=FLAGS.feature_dim, include_top=True)
        params = model.init(jax.random.key(FLAGS.seed), jnp.zeros((1, 8, corpus.n_channels)))["params"]
        print("WARNING: random-init model (no --custom_model_weights)")

    transform = jax.jit(lambda x: model.apply({"params": params}, x))

    def features(eeg):
        out = transform(jnp.asarray(eeg))
        return np.asarray(out[0] if isinstance(out, tuple) else out)

    if FLAGS.compat_reference_leak:
        gallery_idx = query_idx = np.arange(corpus.n)
    else:
        gallery_idx, query_idx = split_train_val(FLAGS, corpus)
    gallery = features(corpus.eeg[gallery_idx])
    query = features(corpus.eeg[query_idx])
    recall, precision, scores = evaluate(
        gallery, query, list(corpus.labels[gallery_idx]), list(corpus.labels[query_idx]),
        corpus.catalog, top_k=FLAGS.topK, metadata={"flags": vars(FLAGS)},
    )
    print(f"Overall Recall :{recall} Overall Precision: {precision}")
    ds_name = "synthetic" if FLAGS.synthetic else os.path.basename(FLAGS.eeg_dataset).split(".")[0]
    save_score_artifacts(FLAGS.log_dir, ds_name, scores, recall, precision)
    return recall, precision


if __name__ == "__main__":
    main()
