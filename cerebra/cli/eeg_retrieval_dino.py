"""EEGRetreivalDino — retrieval with a DINO model under the four
gallery/query transformation modes (reference EEGRetreivalDino.py:130-277):

  eeg     — raw EEG windows, flattened;
  eeg2eeg — EEG → tiled EEG-image → (EEG-finetuned) DINO features, reshaped
            to (128, ·) and windowed [min_time, max_time) like
            transformEEGDataDino keep_features_flat=False
            (utils/PerilsEEGDataset.py:443-447);
  img     — stimulus image → base DINO features (needs images; falls back to
            EEG-image input when none are available);
  img2eeg — stimulus image → EEG-finetuned DINO features (same fallback).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from cerebra.cli.common import load_corpus, reference_argparser, split_train_val
from cerebra.eval.scores import evaluate, save_score_artifacts
from cerebra.models.dino_model import DinoArgs, DinoModel


def _dino_features(model: DinoModel, eeg: np.ndarray, key, min_time: int, max_time: int) -> np.ndarray:
    feats = np.asarray(model.features_from_eeg(key, jnp.asarray(eeg)))
    # keep_features_flat=False path: only meaningful when the reshaped width
    # covers the window (the reference's out_dim 65536 → (128, 512))
    if feats.shape[-1] % 128 == 0 and feats.shape[-1] // 128 > max_time:
        feats = feats.reshape(feats.shape[0], 128, -1)
        feats = feats[:, :, min_time : max_time]
    return feats.reshape(feats.shape[0], -1)


def main(argv=None):
    parser = reference_argparser("DINO retrieval over transformation modes (TPU)")
    parser.add_argument("--gallery_tranformation_type", type=str, default="eeg2eeg",
                        choices=["img", "img2eeg", "eeg", "eeg2eeg"])
    parser.add_argument("--query_tranformation_type", type=str, default="eeg2eeg",
                        choices=["img", "img2eeg", "eeg", "eeg2eeg"])
    parser.add_argument("--dino_base_model_weights", type=str, default="")
    parser.add_argument("--arch", type=str, default="vit_tiny")
    parser.add_argument("--patch_size", type=int, default=16)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--out_dim", type=int, default=65536)
    parser.add_argument("--min_time", type=int, default=20)
    parser.add_argument("--max_time", type=int, default=490)
    FLAGS, _ = parser.parse_known_args(argv)
    print(FLAGS)
    os.makedirs(FLAGS.log_dir, exist_ok=True)
    with open(os.path.join(FLAGS.log_dir, "commandline_args.txt"), "w") as f:
        f.write(str(vars(FLAGS)))  # EEGRetreivalDino.py:128-129

    corpus = load_corpus(FLAGS)
    # Spampinato protocol (EEGRetreivalDino.py:163-176): separate datasets —
    # gallery from (search_gallery, gallery_subject), query from
    # (query_gallery, query_subject). Without a split file, the Perils
    # protocol's seed-43 80/20 split of one corpus applies.
    query_corpus = None
    if not FLAGS.synthetic and FLAGS.eeg_dataset_split:
        query_corpus = load_corpus(
            FLAGS, subset=FLAGS.query_gallery, subject=FLAGS.query_subject
        )
    args = DinoArgs(arch=FLAGS.arch, patch_size=FLAGS.patch_size,
                    image_size=FLAGS.image_size, out_dim=FLAGS.out_dim)

    def build_model(mode):
        weights = (
            FLAGS.dino_base_model_weights if mode == "img" else FLAGS.custom_model_weights
        )
        if weights and os.path.exists(weights):
            return DinoModel.from_torch_checkpoint(weights, args)
        print(f"WARNING: no weights for mode {mode}; random-init DINO model")
        return DinoModel(args, seed=FLAGS.seed)

    key = jax.random.key(FLAGS.seed)

    def _image_features(model, sub_corpus, indices):
        """Stimulus image → DINO features (the reference's img/img2eeg modes
        run the model on the trial's JPEG, EEGRetreivalDino.py:130-277)."""
        from PIL import Image

        from cerebra.data.corpus import image_path

        feats, batch = [], []

        def flush():
            if batch:
                feats.append(np.asarray(model(jnp.asarray(np.stack(batch)))))
                batch.clear()

        for i in indices:
            p = image_path(sub_corpus, int(i), FLAGS.images_root)
            batch.append(model.dinov1_transform(np.asarray(Image.open(p).convert("RGB"))))
            if len(batch) == 64:
                flush()
        flush()
        out = np.concatenate(feats)
        return out.reshape(len(out), -1)

    def transform(mode, sub_corpus, indices, key):
        eeg = sub_corpus.eeg[indices]
        if mode == "eeg":
            return eeg.reshape(len(eeg), -1)
        model = build_model(mode)
        if mode in ("img", "img2eeg"):
            if FLAGS.images_root and os.path.isdir(FLAGS.images_root):
                return _image_features(model, sub_corpus, indices)
            print(
                f"WARNING: mode {mode} without a readable --images_root; "
                "falling back to EEG-image input"
            )
        return _dino_features(model, eeg, key, FLAGS.min_time, FLAGS.max_time)

    k1, k2 = jax.random.split(key)
    if query_corpus is not None:
        g_corpus, gallery_idx, g_labels = corpus, np.arange(corpus.n), corpus.labels
        q_corpus, query_idx, q_labels = (
            query_corpus, np.arange(query_corpus.n), query_corpus.labels,
        )
    else:
        gallery_idx, query_idx = split_train_val(FLAGS, corpus)
        g_corpus = q_corpus = corpus
        g_labels = corpus.labels[gallery_idx]
        q_labels = corpus.labels[query_idx]
    gallery = transform(FLAGS.gallery_tranformation_type, g_corpus, gallery_idx, k1)
    query = transform(FLAGS.query_tranformation_type, q_corpus, query_idx, k2)

    recall, precision, scores = evaluate(
        gallery, query, list(g_labels), list(q_labels),
        corpus.catalog, top_k=FLAGS.topK, metadata={"flags": vars(FLAGS)},
    )
    print(f"Overall Recall :{recall} Overall Precision: {precision}")
    ds_name = "synthetic" if FLAGS.synthetic else os.path.basename(FLAGS.eeg_dataset).split(".")[0]
    save_score_artifacts(FLAGS.log_dir, ds_name, scores, recall, precision)
    return recall, precision


if __name__ == "__main__":
    main()
