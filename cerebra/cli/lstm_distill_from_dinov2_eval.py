"""LstmDistillFromDinoV2Eval — load a trained LSTM (or DINO-LSTM teacher
checkpoint), transform the corpus into LSTM features, run retrieval, and
write the Scores artifacts (reference LstmDistillFromDinoV2Eval.py; call
stack SURVEY.md §3.3).

Checkpoint loading accepts both layouts: a flat Model state dict
(`lstm_dinov2_best_loss.pth`) and a DINO checkpoint's `teacher` entry with
`backbone.`-prefix stripping (LstmDistillFromDinoV2Eval.py:309-313).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cerebra.cli.common import (
    init_distributed,
    is_main_process,
    load_corpus,
    reference_argparser,
    split_train_val,
)
from cerebra.eval.scores import evaluate, save_score_artifacts
from cerebra.models import Model
from cerebra.models.lstm import import_torch_state_dict


def load_model_params(FLAGS, n_channels: int, feature_dim: int):
    """Build Model(C, lstm, layers, F) and load weights if given; model
    dimensions are inferred from the checkpoint's own shapes."""
    lstm_size, lstm_layers, include_top = n_channels, 2, True
    if FLAGS.custom_model_weights and os.path.exists(FLAGS.custom_model_weights):
        import torch

        ckpt = torch.load(FLAGS.custom_model_weights, map_location="cpu", weights_only=False)
        if isinstance(ckpt, dict) and "teacher" in ckpt:
            # DINO checkpoint: teacher backbone only, no top
            # (LstmDistillFromDinoV2Eval.py:308-316)
            sd = {k: v for k, v in ckpt["teacher"].items() if k.startswith("backbone.")}
            include_top = False
            params = import_torch_state_dict(sd)["params"]
        else:
            params = import_torch_state_dict(ckpt)["params"]
            include_top = "head" in params
        lstm_size = int(np.asarray(params["lstm"]["w_hh_l0"]).shape[0])
        lstm_layers = 1 + max(
            int(k.rsplit("_l", 1)[1]) for k in params["lstm"] if k.startswith("w_hh_l")
        )
        n_classes = 40
        if "fc" in params:
            feature_dim = int(np.asarray(params["fc"]["kernel"]).shape[1])
        if "head" in params:
            n_classes = int(np.asarray(params["head"]["kernel"]).shape[1])
        model = Model(
            input_size=n_channels, lstm_size=lstm_size, lstm_layers=lstm_layers,
            output_size=feature_dim, include_top=include_top, n_classes=n_classes,
        )
        return model, params
    model = Model(
        input_size=n_channels, lstm_size=lstm_size, lstm_layers=lstm_layers,
        output_size=feature_dim, include_top=include_top,
    )
    params = model.init(
        jax.random.key(FLAGS.seed), jnp.zeros((1, 8, n_channels))
    )["params"]
    print("WARNING: no --custom_model_weights; evaluating a random-init model")
    return model, params


def main(argv=None):
    parser = reference_argparser("LSTM→DINOv2 retrieval evaluation (TPU)")
    FLAGS, _ = parser.parse_known_args(argv)
    print(FLAGS)
    init_distributed()
    os.makedirs(FLAGS.log_dir, exist_ok=True)

    corpus = load_corpus(FLAGS)
    model, params = load_model_params(FLAGS, corpus.n_channels, FLAGS.feature_dim)

    t0 = time.perf_counter()
    # a DINO teacher backbone ships without fc/head (MultiCropWrapper strips
    # them, utils/utils.py:610) → use the raw last hidden state
    features_only = "fc" not in params
    transform = jax.jit(lambda x: model.apply({"params": params}, x, features_only=features_only))

    def corpus_features(eeg):
        out = transform(jnp.asarray(eeg))
        feats = out[0] if isinstance(out, tuple) else out
        return np.asarray(feats)

    train_idx, val_idx = split_train_val(FLAGS, corpus)
    gallery = corpus_features(corpus.eeg[train_idx])
    query = corpus_features(corpus.eeg[val_idx])

    recall, precision, scores = evaluate(
        gallery, query,
        list(corpus.labels[train_idx]), list(corpus.labels[val_idx]),
        corpus.catalog, top_k=FLAGS.topK,
        metadata={"flags": vars(FLAGS)},
    )
    dt = time.perf_counter() - t0
    print(f"Overall Recall :{recall} Overall Precision: {precision} (in {dt:.2f}s)")
    ds_name = "synthetic" if FLAGS.synthetic else os.path.basename(FLAGS.eeg_dataset).split(".")[0]
    if is_main_process():  # file artifacts stay rank-0 (CLAUDE.md rule)
        paths = save_score_artifacts(FLAGS.log_dir, ds_name, scores, recall, precision)
        print("artifacts:", paths)
    return recall, precision


if __name__ == "__main__":
    main()
