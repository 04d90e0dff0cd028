"""LstmDistillFromDinoV2Train — LSTM regresses Perils EEG onto DINOv2
features (reference LstmDistillFromDinoV2Train.py; call stack SURVEY.md §3.1).

Flow parity: corpus + teacher-feature bank → pre-train retrieval baseline of
the raw teacher features → 80/20 seed-43 split → Model(C, C, 2, F, top) +
FeatureDistributionLoss v1 + RMSprop(lr 1e-3) → val every 5 epochs with
retrieval + best-checkpoint save (`lstm_dinov2_best_loss.pth`).
"""

from __future__ import annotations

import json
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
from cerebra.eval.retrieval import retrieval_recall_precision
from cerebra.models.lstm import export_torch_state_dict
from cerebra.train.recipes import FeatureDistillConfig, feature_distill_train


def main(argv=None):
    parser = reference_argparser("LSTM→DINOv2 feature distillation (TPU)")
    parser.add_argument(
        "--profile_dir", type=str, default="",
        help="write a jax.profiler trace of the training loop here "
        "(TensorBoard/xprof timeline; replaces the reference's wall-clock "
        "MetricLogger timing, utils/utils.py:348-400)",
    )
    FLAGS, _ = parser.parse_known_args(argv)
    print(FLAGS)
    init_distributed()
    os.makedirs(FLAGS.log_dir, exist_ok=True)

    hp = parsed_hyperparams(FLAGS)
    corpus = load_corpus(FLAGS)
    feats = load_teacher_features(FLAGS, corpus)
    print(f"corpus: {corpus.n} trials, eeg {corpus.eeg.shape[1:]} → features {feats.shape[-1]}d")

    train_idx, val_idx = split_train_val(FLAGS, corpus)

    # pre-training baseline: retrieval on the raw teacher features
    # (LstmDistillFromDinoV2Train.py:318-320)
    r0, p0, _, _ = retrieval_recall_precision(
        jnp.asarray(feats[train_idx]), jnp.asarray(feats[val_idx]),
        jnp.asarray(corpus.labels[train_idx]), jnp.asarray(corpus.labels[val_idx]),
        k=FLAGS.topK,
    )
    print(f"Evaluating DINOv2: Recall {r0:.2f} Precision {p0:.2f}")

    cfg = FeatureDistillConfig(
        num_epochs=FLAGS.num_epochs,
        batch_size=FLAGS.batch_size,
        learning_rate=FLAGS.learning_rate,
        lstm_size=corpus.n_channels,
        lstm_layers=2,
        alpha=float(hp.get("alpha", 0.5)),
        top_k=FLAGS.topK,
        seed=FLAGS.seed,
        dtype=jnp.bfloat16 if FLAGS.use_bf16 else None,
    )
    from cerebra.train.resume import profile_trace

    with profile_trace(FLAGS.profile_dir, enabled=bool(FLAGS.profile_dir)):
        state, hist = feature_distill_train(
            corpus.eeg[train_idx], feats[train_idx], corpus.labels[train_idx],
            corpus.eeg[val_idx], feats[val_idx], corpus.labels[val_idx],
            config=cfg, mesh=make_cli_mesh(FLAGS, global_batch=FLAGS.batch_size),
            n_classes=corpus.catalog.n_classes,
        )

    from cerebra.cli.common import is_main_process

    best_params = hist["best_params"][0]
    if best_params is not None and is_main_process():
        import torch

        sd = export_torch_state_dict({"params": best_params})
        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            os.path.join(FLAGS.log_dir, "lstm_dinov2_best_loss.pth"),
        )
    if is_main_process():
        with open(os.path.join(FLAGS.log_dir, "log.txt"), "a") as f:
            for e, (loss, wps) in enumerate(zip(hist["train_loss"], hist["windows_per_s"])):
                f.write(json.dumps({"epoch": e, "train_loss": loss, "windows_per_s": wps}) + "\n")
    print("done; best val loss", hist["best"][0])
    return state, hist


if __name__ == "__main__":
    main()
