"""LstmDistillFromDinoV2TrainSpampinato — the Spampinato-loader KD variant
(reference LstmDistillFromDinoV2TrainSpampinato.py): 128-ch EEG, split file +
subject filtering, Model(128, 128, 4), Hinton KD loss on regressed features,
AdamW lr 1e-4, 200 epochs."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from cerebra.cli.common import (
    init_distributed,
    load_corpus,
    load_teacher_features,
    make_cli_mesh,
    parsed_hyperparams,
    reference_argparser,
    split_train_val,
)
from cerebra.train.recipes import FeatureDistillConfig, feature_distill_train


def main(argv=None):
    parser = reference_argparser("Spampinato LSTM→DINOv2 KD distillation (TPU)")
    parser.set_defaults(learning_rate=1e-4, num_epochs=200)
    FLAGS, _ = parser.parse_known_args(argv)
    print(FLAGS)
    init_distributed()
    os.makedirs(FLAGS.log_dir, exist_ok=True)

    hp = parsed_hyperparams(FLAGS)
    corpus = load_corpus(FLAGS)
    feats = load_teacher_features(FLAGS, corpus)
    train_idx, val_idx = split_train_val(FLAGS, corpus)

    cfg = FeatureDistillConfig(
        num_epochs=FLAGS.num_epochs,
        batch_size=FLAGS.batch_size,
        learning_rate=FLAGS.learning_rate,
        optimizer="adamw",  # :378
        lstm_size=corpus.n_channels,  # 128 on Spampinato rigs (:368)
        lstm_layers=4,
        loss="hinton_kd",
        alpha=float(hp.get("alpha", 0.5)),
        kd_temperature=float(hp.get("temperature", 2.0)),
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
            os.path.join(FLAGS.log_dir, "lstm_dinov2_best_loss.pth"),
        )
    return state, hist


if __name__ == "__main__":
    main()
