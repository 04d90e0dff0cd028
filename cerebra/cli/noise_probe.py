"""noise_probe — probe a DINO model with Gaussian-noise images fitted to an
image-folder prior (the reference's utils/optimizeSearch.ipynb experiment:
how do noise-image features compare to real-image features?).

Reports the feature-space distance between real images and matched noise
samples — the null-hypothesis control for image-feature retrieval.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from cerebra.cli.common import reference_argparser
from cerebra.data.gauss_noise import GaussNoiseGenerator
from cerebra.models.dino_model import DinoArgs, DinoModel


def main(argv=None):
    parser = reference_argparser("Gaussian-noise image probe of a DINO model")
    parser.add_argument("--arch", type=str, default="vit_tiny")
    parser.add_argument("--patch_size", type=int, default=16)
    parser.add_argument("--image_size", type=int, default=64)
    parser.add_argument("--n_noise", type=int, default=16)
    parser.add_argument("--pretrained_weights", type=str, default="",
                        help="reference flag name; alias of --custom_model_weights")
    FLAGS, _ = parser.parse_known_args(argv)
    if FLAGS.pretrained_weights and not FLAGS.custom_model_weights:
        FLAGS.custom_model_weights = FLAGS.pretrained_weights
    os.makedirs(FLAGS.log_dir, exist_ok=True)

    args = DinoArgs(arch=FLAGS.arch, patch_size=FLAGS.patch_size,
                    image_size=FLAGS.image_size, use_head=False)
    if FLAGS.custom_model_weights and os.path.exists(FLAGS.custom_model_weights):
        model = DinoModel.from_torch_checkpoint(FLAGS.custom_model_weights, args)
    else:
        model = DinoModel(args, seed=FLAGS.seed)
        print("WARNING: random-init DINO model (no --custom_model_weights)")

    rng = np.random.default_rng(FLAGS.seed)
    S = FLAGS.image_size
    if os.path.isdir(FLAGS.images_root):
        from cerebra.data.sources import image_folder_source

        src = image_folder_source(FLAGS.images_root)
        real = np.stack([
            np.asarray(model.dinov1_transform(src.load_image(i)))
            for i in rng.choice(src.n, size=min(FLAGS.n_noise, src.n), replace=False)
        ])
        prior_imgs = real
    else:
        print("no images_root; using synthetic real images")
        prior_imgs = rng.normal(0.45, 0.2, size=(FLAGS.n_noise, S, S, 3)).astype(np.float32)
        real = prior_imgs

    gen = GaussNoiseGenerator(rank=min(32, len(prior_imgs))).fit(prior_imgs)
    # noise must reach the model under the SAME preprocessing as the real
    # images (dinov1_transform ImageNet-normalizes) — feeding [0,1] noise
    # against normalized reals would make the cosine probe measure the
    # preprocessing mismatch instead of feature content
    from cerebra.signal.image_aug import IMAGENET_MEAN, IMAGENET_STD

    noise01 = np.stack([
        gen.sample(rng, shape=(S, S, 3)).astype(np.float32) / 255.0
        for _ in range(FLAGS.n_noise)
    ])
    if os.path.isdir(FLAGS.images_root):
        noise = (noise01 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    else:  # synthetic reals are un-normalized [0,1]-range draws
        noise = noise01

    f_real = np.asarray(model(jnp.asarray(real, dtype=jnp.float32)))
    f_noise = np.asarray(model(jnp.asarray(noise)))

    def _norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-9)

    cos_cross = float((_norm(f_real) @ _norm(f_noise).T).mean())
    cos_real = float((_norm(f_real) @ _norm(f_real).T).mean())
    out = {
        "mean_cos_real_vs_noise": cos_cross,
        "mean_cos_real_vs_real": cos_real,
        "feature_dim": int(f_real.shape[-1]),
    }
    print(json.dumps(out))
    with open(os.path.join(FLAGS.log_dir, "noise_probe.json"), "w") as f:
        json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
