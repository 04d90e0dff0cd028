"""Shared CLI plumbing: the reference flag set + corpus/feature loading."""

from __future__ import annotations

import argparse
import os
from typing import Tuple

import numpy as np

from cerebra.data import EEGCorpus, make_synthetic_corpus
from cerebra.utils.config import bool_flag, parse_hyperparams


def reference_argparser(description: str) -> argparse.ArgumentParser:
    """The ~25 shared flags of the reference entry points
    (LstmDistillFromDinoV2Train.py:150-226), plus TPU-build additions."""
    p = argparse.ArgumentParser(description)
    p.add_argument("--learning_rate", type=float, default=0.001)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--log_dir", type=str, default="./logs/cerebra/")
    p.add_argument("--gallery_subject", type=int, default=1, choices=range(7))
    p.add_argument("--query_subject", type=int, default=1, choices=range(7))
    p.add_argument(
        "--eeg_dataset", type=str,
        default="./data/eeg/theperils/spampinato-1-IMAGE_RAPID_RAW_with_mean_std.pth",
    )
    p.add_argument("--images_root", type=str, default="./data/images/imageNet_images")
    p.add_argument("--eeg_dataset_split", type=str, default="")
    p.add_argument("--mode", type=str, default="train")
    p.add_argument("--custom_model_weights", type=str, default="")
    p.add_argument("--search_gallery", type=str, default="train")
    p.add_argument("--query_gallery", type=str, default="test")
    p.add_argument("--topK", type=int, default=5)
    p.add_argument("--hyperprams", type=str, default="{}")
    p.add_argument("--seed", type=int, default=43)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--dist_url", type=str, default="env://")
    p.add_argument("--local_rank", type=int, default=0)
    p.add_argument("--time_low", type=int, default=20)
    p.add_argument("--time_high", type=int, default=480)
    # TPU-build additions
    p.add_argument("--synthetic", action="store_true",
                   help="run on the synthetic-EEG fake backend (no data files)")
    p.add_argument("--synthetic_classes", type=int, default=8)
    p.add_argument("--synthetic_per_class", type=int, default=12)
    p.add_argument("--synthetic_channels", type=int, default=96,
                   help="96 = Perils rig, 128 = Spampinato rig")
    p.add_argument("--synthetic_samples", type=int, default=512,
                   help="512 = Perils, 500 = Spampinato")
    p.add_argument("--features_cache", type=str, default="",
                   help="precomputed teacher features (.npy/.npz/.pth) aligned to the corpus")
    p.add_argument("--feature_dim", type=int, default=384)
    p.add_argument("--use_bf16", type=bool_flag, default=True)
    p.add_argument("--devices", type=int, default=0,
                   help="data-parallel device count: 0 = all local devices "
                        "(the DDP/DistributedSampler equivalent of "
                        "LstmDistillation.py:406,445), 1 = single device, "
                        "N = first N devices")
    return p


def make_cli_mesh(FLAGS, global_batch=None):
    """A 1-D "data" mesh over --devices local devices, or None for a single
    device. This is the CLI-facing DP world: the reference wraps every entry
    script in DDP + DistributedSampler (LstmDistillation.py:406,445,
    EEG-BarlowNetworks/train.py:71-99); here the same surface is a mesh whose
    data axis the recipes shard every batch over (jit inserts the grad psum).

    --devices 0 (default) = auto: all local devices, clamped to the largest
    count that divides `global_batch` when the recipe uses a global batch
    size (the reference asserts divisibility instead and crashes,
    EEG-BarlowNetworks/train.py:129). An explicit --devices N is honored
    exactly — an indivisible batch then errors like the reference.
    """
    import jax

    from cerebra.parallel.mesh import make_mesh

    n = int(getattr(FLAGS, "devices", 0) or 0)
    avail = jax.device_count()
    if n == 0:
        n = avail
        if global_batch:
            while n > 1 and global_batch % n != 0:
                n -= 1
    if n > avail:
        raise SystemExit(f"--devices {n} requested but only {avail} devices visible")
    if n <= 1:
        return None
    mesh = make_mesh(("data",), (n,), jax.devices()[:n])
    print(f"mesh: {n} devices on the data axis ({jax.devices()[0].platform})")
    return mesh


# Rank-0 gate for file artifacts (the reference's save_on_master /
# rank-0 print-gating, utils/utils.py:447-464): under multi-process
# launches every rank runs the same CLI, but only one may write
# checkpoints/logs or they race on the same paths. ONE implementation,
# shared with the infra layer.
from cerebra.utils.config import is_main_process  # noqa: F401,E402


def init_distributed() -> None:
    """Multi-host init (replaces init_distributed_mode, utils/utils.py:
    467-503): like the reference's env:// path, RANK/WORLD_SIZE name this
    process when set (jax.distributed itself only reads the coordinator
    address from the environment; SLURM/OMPI ranks are auto-detected by its
    cluster probes, matching the reference's SLURM_PROCID branch);
    single-process runs need nothing."""
    import jax

    # honor JAX_PLATFORMS even when a site plugin (e.g. a tunneled TPU
    # backend) registered itself and overrode the env var — the config call
    # wins as long as no backend has initialized yet
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kw = {}
        # env:// semantics require BOTH (like torch's init_method="env://",
        # utils/utils.py:468-473); with only one of the pair set, fall
        # through to jax's own cluster auto-detection rather than handing
        # jax.distributed.initialize a partial spec it will reject confusingly
        if os.environ.get("WORLD_SIZE") and os.environ.get("RANK"):
            kw["num_processes"] = int(os.environ["WORLD_SIZE"])
            kw["process_id"] = int(os.environ["RANK"])
        jax.distributed.initialize(**kw)


def load_corpus(FLAGS, subset=None, subject=None) -> EEGCorpus:
    """Corpus per flags: synthetic backend or a reference-format .pth
    (windowed to [time_low, time_high) like every entry script).

    subset/subject default to the gallery flags; Spampinato-style runs (a
    split file is given) honor --gallery_subject like the reference loaders
    (utils/EEGDataset.py:99-128); Perils runs ignore subject exactly like
    utils/PerilsEEGDataset.py:53-54.
    """
    if FLAGS.synthetic:
        corpus = make_synthetic_corpus(
            seed=FLAGS.seed,
            n_per_class=FLAGS.synthetic_per_class,
            n_classes=FLAGS.synthetic_classes,
            n_channels=getattr(FLAGS, "synthetic_channels", 96),
            n_samples=getattr(FLAGS, "synthetic_samples", 512),
            feature_dim=FLAGS.feature_dim,
            class_signal_scale=1.5,
        )
    else:
        labels_txt = os.path.join(FLAGS.images_root, "labels.txt")
        split_path = FLAGS.eeg_dataset_split or None
        if subject is None:
            subject = FLAGS.gallery_subject if split_path else 0
        corpus = EEGCorpus.from_pth(
            FLAGS.eeg_dataset,
            labels_txt=labels_txt if os.path.exists(labels_txt) else None,
            split_path=split_path,
            subset=subset if subset is not None else FLAGS.search_gallery,
            subject=subject,
        )
    return corpus.window(FLAGS.time_low, FLAGS.time_high)


def load_teacher_features(FLAGS, corpus: EEGCorpus) -> np.ndarray:
    """Teacher feature bank for the corpus: `--features_cache` file, the
    corpus's own bank (synthetic), or a clear error explaining the zero-
    egress replacement for the reference's torch.hub DINOv2 download
    (LstmDistillFromDinoV2Train.py:144-146)."""
    if FLAGS.features_cache:
        path = FLAGS.features_cache
        if path.endswith(".npy"):
            feats = np.load(path)
        elif path.endswith(".npz"):
            feats = np.load(path)["features"]
        else:
            import torch

            obj = torch.load(path, map_location="cpu", weights_only=False)
            feats = np.asarray(obj["features"] if isinstance(obj, dict) else obj)
        assert len(feats) == corpus.n, (len(feats), corpus.n)
        return feats.astype(np.float32)
    if corpus.image_features is not None:
        return corpus.image_features
    raise SystemExit(
        "No teacher features: pass --features_cache (precomputed DINOv2 features "
        "for the corpus; see cerebra.cli.extract_features) or --synthetic."
    )


def split_train_val(FLAGS, corpus: EEGCorpus) -> Tuple[np.ndarray, np.ndarray]:
    """The 80/20 seed-43 random_split of every DinoV2 recipe
    (LstmDistillFromDinoV2Train.py:289-290), bit-exact with torch."""
    from cerebra.data import random_split_indices

    train_idx, val_idx = random_split_indices(corpus.n, [0.8, 0.2], seed=FLAGS.seed)
    return train_idx, val_idx


def parsed_hyperparams(FLAGS) -> dict:
    return parse_hyperparams(FLAGS.hyperprams)
