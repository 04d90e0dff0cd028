"""LSTMDistill — the inline-LSTM cosine-distillation recipe (reference
LSTMDistill.py): InlineLSTM-equivalent student, cosine loss against cached
teacher features, Adam lr 1e-4, per-epoch val, best checkpoint."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from cerebra.cli.common import (
    init_distributed,
    load_corpus,
    load_teacher_features,
    make_cli_mesh,
    reference_argparser,
    split_train_val,
)
from cerebra.train.recipes import FeatureDistillConfig, feature_distill_train


def main(argv=None):
    parser = reference_argparser("Inline-LSTM cosine distillation (TPU)")
    parser.set_defaults(learning_rate=1e-4)
    FLAGS, _ = parser.parse_known_args(argv)
    print(FLAGS)
    init_distributed()
    os.makedirs(FLAGS.log_dir, exist_ok=True)

    corpus = load_corpus(FLAGS)
    feats = load_teacher_features(FLAGS, corpus)
    train_idx, val_idx = split_train_val(FLAGS, corpus)

    cfg = FeatureDistillConfig(
        num_epochs=FLAGS.num_epochs,
        batch_size=FLAGS.batch_size,
        learning_rate=FLAGS.learning_rate,
        optimizer="adam",  # LSTMDistill.py:322
        lstm_size=corpus.n_channels,
        lstm_layers=4,  # inline LSTMModel (LSTMDistill.py:112-147)
        loss="cosine",
        validation_frequency=1,  # per-epoch val (:340-378)
        top_k=FLAGS.topK,
        seed=FLAGS.seed,
        dtype=jnp.bfloat16 if FLAGS.use_bf16 else None,
    )
    state, hist = feature_distill_train(
        corpus.eeg[train_idx], feats[train_idx], corpus.labels[train_idx],
        corpus.eeg[val_idx], feats[val_idx], corpus.labels[val_idx],
        config=cfg, mesh=make_cli_mesh(FLAGS, global_batch=FLAGS.batch_size), n_classes=corpus.catalog.n_classes,
    )
    best_params = hist["best_params"][0]
    from cerebra.cli.common import is_main_process

    if best_params is not None and is_main_process():
        import torch

        from cerebra.models.lstm import export_torch_state_dict

        sd = export_torch_state_dict({"params": best_params})
        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            os.path.join(FLAGS.log_dir, "lstm_best_loss.pth"),
        )
    return state, hist


if __name__ == "__main__":
    main()
