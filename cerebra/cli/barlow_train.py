"""EEG-BarlowNetworks/train.py — cross-modal Barlow Twins pretraining (TPU).

Parity: image tower + EEG mel-spectrogram tower → shared projector →
psum'd cross-correlation loss (λ=0.0051), LARS with split weight/bias lr,
warmup+cosine schedule, per-epoch checkpoint + stats.txt JSONL, final
backbone export (train.py:104-179). Multi-process NCCL spawn (train.py:71-78)
is replaced by the jax mesh; SLURM requeue handlers by orbax auto-resume
(cerebra.train.resume).

Without real stimulus images pass --synthetic: EEG is synthetic and the image
branch receives Gaussian-noise images (the reference's own control backend,
utils/GaussNoise.py).
"""

from __future__ import annotations

import json
import os

import numpy as np

from cerebra.cli.common import (
    init_distributed,
    load_corpus,
    make_cli_mesh,
    reference_argparser,
)
from cerebra.train.barlow_recipe import BarlowConfig, barlow_train


def main(argv=None):
    parser = reference_argparser("Cross-modal Barlow Twins (TPU)")
    parser.add_argument("--lambd", type=float, default=0.0051)
    parser.add_argument("--projector", type=str, default="8192-8192-8192")
    parser.add_argument("--learning_rate_weights", type=float, default=0.2)
    parser.add_argument("--learning_rate_biases", type=float, default=0.0048)
    parser.add_argument("--weight_decay", type=float, default=1e-6)
    parser.add_argument("--n_mels", type=int, default=224)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--epochs", type=int, default=10)
    from cerebra.utils.config import bool_flag

    parser.add_argument(
        "--remat", type=bool_flag, default=False,
        help="nested stage+block remat in both ResNet towers — memory lever "
        "that lifts the per-chip batch ceiling (B=512 OOMs without it)",
    )
    parser.add_argument(
        "--pretrained_backbone", type=str, default="",
        help="local torchvision resnet50 .pth to init both towers "
        "(extension; reference towers are random-init, net.py:15-19)",
    )
    FLAGS, _ = parser.parse_known_args(argv)
    print(FLAGS)
    init_distributed()
    os.makedirs(FLAGS.log_dir, exist_ok=True)

    corpus = load_corpus(FLAGS)
    # image branch: real stimulus images when available; Gaussian-noise
    # control images otherwise (GaussNoise-style null backend)
    rng = np.random.default_rng(FLAGS.seed)
    images = rng.normal(
        0.45, 0.22, size=(corpus.n, FLAGS.image_size, FLAGS.image_size, 3)
    ).astype(np.float32)

    cfg = BarlowConfig(
        epochs=FLAGS.epochs,
        batch_size=FLAGS.batch_size,
        learning_rate_weights=FLAGS.learning_rate_weights,
        learning_rate_biases=FLAGS.learning_rate_biases,
        weight_decay=FLAGS.weight_decay,
        lambd=FLAGS.lambd,
        projector=tuple(int(s) for s in FLAGS.projector.split("-")),
        n_mels=FLAGS.n_mels,
        image_size=FLAGS.image_size,
        seed=FLAGS.seed,
        pretrained_backbone=FLAGS.pretrained_backbone,
        remat=FLAGS.remat,
    )

    from cerebra.cli.common import is_main_process

    stats_path = os.path.join(FLAGS.log_dir, "stats.txt")

    def log_fn(msg):
        print(msg)
        if is_main_process():  # rank-0 JSONL (train.py:153-161)
            with open(stats_path, "a") as f:
                f.write(json.dumps({"msg": msg}) + "\n")

    variables, hist = barlow_train(
        images, corpus.eeg, config=cfg,
        mesh=make_cli_mesh(FLAGS, global_batch=FLAGS.batch_size), log_fn=log_fn
    )

    # orbax saves are COLLECTIVE (resume.py:46-53: a rank-0-only gate here
    # deadlocks at the barrier); orbax itself keeps the write rank-0
    # (train.py:162-165 reference semantics preserved)
    from cerebra.train.checkpoints import save_orbax

    save_orbax(os.path.join(FLAGS.log_dir, "checkpoint_orbax"), variables)
    return variables, hist


if __name__ == "__main__":
    main()
