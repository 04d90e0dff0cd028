"""visualize_attention — per-head self-attention overlays of a DINO ViT
(reference dino/visualize_attention.py): CLS-token attention of the last
block, reshaped to the patch grid, upsampled, saved per head."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from cerebra.cli.common import load_corpus, reference_argparser
from cerebra.models.dino_model import DinoArgs, DinoModel
from cerebra.signal.windows import tile_eeg_to_image


def main(argv=None):
    parser = reference_argparser("DINO self-attention visualization")
    parser.add_argument("--arch", type=str, default="vit_tiny")
    parser.add_argument("--patch_size", type=int, default=16)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--image_path", type=str, default="",
                        help="image to visualize; default: first corpus EEG as image")
    parser.add_argument("--threshold", type=float, default=0.0,
                        help="keep top mass fraction (0 = raw maps)")
    parser.add_argument("--pretrained_weights", type=str, default="",
                        help="reference flag name (dino/visualize_attention.py:103); alias of --custom_model_weights")
    FLAGS, _ = parser.parse_known_args(argv)
    if FLAGS.pretrained_weights and not FLAGS.custom_model_weights:
        FLAGS.custom_model_weights = FLAGS.pretrained_weights
    os.makedirs(FLAGS.log_dir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    args = DinoArgs(arch=FLAGS.arch, patch_size=FLAGS.patch_size,
                    image_size=FLAGS.image_size, use_head=False)
    if FLAGS.custom_model_weights and os.path.exists(FLAGS.custom_model_weights):
        model = DinoModel.from_torch_checkpoint(FLAGS.custom_model_weights, args)
    else:
        model = DinoModel(args, seed=FLAGS.seed)
        print("WARNING: random-init ViT (no --custom_model_weights)")

    if FLAGS.image_path:
        from PIL import Image

        img = model.dinov1_transform(np.asarray(Image.open(FLAGS.image_path).convert("RGB")))
    else:
        corpus = load_corpus(FLAGS)
        img = np.asarray(
            jnp.transpose(
                tile_eeg_to_image(jax.random.key(0), jnp.asarray(corpus.eeg[0]).T,
                                  FLAGS.image_size),
                (1, 2, 0),
            )
        )

    attn = model.backbone.apply(
        {"params": model.params["backbone"]}, jnp.asarray(img)[None],
        return_attention_of_last_block=True,
    )  # (1, heads, N, N)
    attn = np.asarray(attn[0, :, 0, 1:])  # CLS → patch attention per head
    n_heads = attn.shape[0]
    grid = FLAGS.image_size // FLAGS.patch_size

    th_attn = None
    if FLAGS.threshold:
        # keep only the top `threshold` fraction of each head's attention
        # MASS (dino/visualize_attention.py:186-196): sort ascending,
        # cumulative-normalize, mask where cum > 1 - threshold, un-sort
        order = np.argsort(attn, axis=1)
        val = np.take_along_axis(attn, order, axis=1)
        cum = np.cumsum(val / val.sum(axis=1, keepdims=True), axis=1)
        masked_sorted = cum > (1 - FLAGS.threshold)
        th_attn = np.zeros_like(attn, dtype=bool)
        np.put_along_axis(th_attn, order, masked_sorted, axis=1)

    paths = []
    for h in range(n_heads):
        a = attn[h].reshape(grid, grid)
        a = np.asarray(jax.image.resize(jnp.asarray(a), (FLAGS.image_size,) * 2, "nearest"))
        fig = plt.figure(figsize=(5, 5))
        plt.imshow(a, cmap="inferno")
        plt.axis("off")
        out = os.path.join(FLAGS.log_dir, f"attn-head{h}.png")
        plt.savefig(out, bbox_inches="tight", pad_inches=0)
        plt.close(fig)
        paths.append(out)
        if th_attn is not None:
            m = th_attn[h].reshape(grid, grid).astype(np.float32)
            m = np.asarray(
                jax.image.resize(jnp.asarray(m), (FLAGS.image_size,) * 2, "nearest")
            )
            fig = plt.figure(figsize=(5, 5))
            plt.imshow(m, cmap="gray")
            plt.axis("off")
            out = os.path.join(
                FLAGS.log_dir, f"mask_th{FLAGS.threshold}_head{h}.png"
            )  # reference naming (dino/visualize_attention.py:213)
            plt.savefig(out, bbox_inches="tight", pad_inches=0)
            plt.close(fig)
            paths.append(out)
    print(f"wrote {len(paths)} attention maps to {FLAGS.log_dir}")
    return paths


if __name__ == "__main__":
    main()
