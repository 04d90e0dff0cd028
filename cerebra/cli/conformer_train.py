"""Conformer ExP training on BCI-IV 2a (TPU) — the reference's self-contained
trainer inside utils/Conformer.py (:222-417 ExP, :420-470 main): per-subject
train/eval with S&R augmentation, per-epoch test accuracy, and the
results/log_subject{n}.txt + sub_result.txt artifacts.

`--synthetic` replaces the BCI-IV .mat files with the class-coded synthetic
backend; `--subjects` runs the reference's 9-subject sweep (main, :425-470).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from cerebra.cli.common import init_distributed, is_main_process, make_cli_mesh
from cerebra.train.conformer_recipe import (
    ExPConfig,
    conformer_exp_train,
    load_bciiv_mat,
    make_synthetic_bciiv,
)
from cerebra.utils.config import bool_flag


def build_parser():
    import argparse

    p = argparse.ArgumentParser("EEG Conformer ExP trainer (TPU)")
    p.add_argument("--root", type=str, default="/Data/strict_TE/",
                   help="directory with A0{n}T.mat / A0{n}E.mat (ExP.root)")
    p.add_argument("--subjects", type=int, nargs="+", default=[1])
    p.add_argument("--batch_size", type=int, default=72)
    p.add_argument("--n_epochs", type=int, default=2000)
    p.add_argument("--lr", type=float, default=0.0002)
    p.add_argument("--b1", type=float, default=0.5)
    p.add_argument("--b2", type=float, default=0.999)
    p.add_argument("--emb_size", type=int, default=40)
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--out_features", type=int, default=384)
    p.add_argument("--n_segments", type=int, default=8)
    p.add_argument("--eval_every", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_dir", type=str, default="./results/")
    p.add_argument("--use_bf16", type=bool_flag, default=True)
    p.add_argument("--devices", type=int, default=0)
    # synthetic backend
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_per_class", type=int, default=36)
    p.add_argument("--synthetic_channels", type=int, default=22)
    p.add_argument("--synthetic_samples", type=int, default=1000)
    return p


def main(argv=None):
    FLAGS, _ = build_parser().parse_known_args(argv)
    print(FLAGS)
    init_distributed()
    os.makedirs(FLAGS.log_dir, exist_ok=True)

    cfg = ExPConfig(
        batch_size=FLAGS.batch_size, n_epochs=FLAGS.n_epochs, lr=FLAGS.lr,
        b1=FLAGS.b1, b2=FLAGS.b2, emb_size=FLAGS.emb_size, depth=FLAGS.depth,
        out_features=FLAGS.out_features, n_segments=FLAGS.n_segments,
        eval_every=FLAGS.eval_every, seed=FLAGS.seed,
        dtype=jnp.bfloat16 if FLAGS.use_bf16 else None,
    )
    # per-step batch = real + augmented, like the reference's concat —
    # cfg.step_batch is the one shared formula for what the step shards
    mesh = make_cli_mesh(FLAGS, global_batch=cfg.step_batch)

    results = []
    for subject in FLAGS.subjects:
        if FLAGS.synthetic:
            data, labels = make_synthetic_bciiv(
                seed=FLAGS.seed + subject, n_per_class=FLAGS.synthetic_per_class,
                n_channels=FLAGS.synthetic_channels, n_samples=FLAGS.synthetic_samples,
            )
            n_train = int(len(data) * 0.75)
            train_data, train_labels = data[:n_train], labels[:n_train]
            test_data, test_labels = data[n_train:], labels[n_train:]
        else:
            train_data, train_labels, test_data, test_labels = load_bciiv_mat(
                FLAGS.root, subject
            )
        print(f"Subject {subject}: train {train_data.shape} test {test_data.shape}")
        variables, hist = conformer_exp_train(
            train_data, train_labels, test_data, test_labels, config=cfg, mesh=mesh,
            # file artifacts stay rank-0-only: N ranks opening the same path
            # with "w" would truncate and interleave each other's log
            log_write_path=(
                os.path.join(FLAGS.log_dir, f"log_subject{subject}.txt")
                if is_main_process() else None
            ),
        )
        results.append((subject, hist["best_acc"][0], hist["aver_acc"][0]))

        from cerebra.train.checkpoints import save_orbax

        save_orbax(
            os.path.join(FLAGS.log_dir, f"conformer_subject{subject}_orbax"),
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        )

    if is_main_process():
        with open(os.path.join(FLAGS.log_dir, "sub_result.txt"), "w") as f:
            for subject, best, aver in results:
                f.write(f"Subject {subject} : Seed is: {FLAGS.seed}\n")
                f.write(f"Subject {subject} : The best accuracy is: {best}\n")
                f.write(f"Subject {subject} : The average accuracy is: {aver}\n")
            f.write(f"**The average Best accuracy is: {np.mean([r[1] for r in results])}\n")
            f.write(f"The average Aver accuracy is: {np.mean([r[2] for r in results])}\n")
    return results


if __name__ == "__main__":
    main()
