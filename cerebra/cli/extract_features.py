"""extract_features — build a teacher-feature cache for a corpus.

TPU-correct replacement for the reference's per-run torch.hub DINOv2
download + in-place dataset mutation (LstmDistillFromDinoV2Train.py:144-146,
287): run a teacher ONCE over the stimulus images, save `features.npz`, and
point every trainer at it with --features_cache.

Teachers (zero-egress environment — all local):
  --teacher dino_ckpt   — our ViT with a local DINO .pth checkpoint
  --teacher dinov2_jax  — pure-JAX DINOv2 ViT-S/14 from a local torch state
                          dict (the dinov2_vits14 layout) — no torch in the
                          forward path (LstmDistillFromDinoV2Train.py:144-146
                          parity)
  --teacher transformers— a local HF DINOv2 (requires pre-downloaded weights)
  --teacher random_vit  — random-init ViT (smoke tests / ablation control)
"""

from __future__ import annotations



import numpy as np

from cerebra.cli.common import reference_argparser
from cerebra.data.sources import extract_features, image_folder_source, synthetic_image_source
from cerebra.models.dino_model import DinoArgs, DinoModel


def main(argv=None):
    parser = reference_argparser("Teacher feature-cache extraction")
    parser.add_argument("--teacher", type=str, default="random_vit",
                        choices=["dino_ckpt", "dinov2_jax", "transformers", "random_vit"])
    parser.add_argument("--teacher_weights", type=str, default="")
    parser.add_argument("--arch", type=str, default="vit_small")
    parser.add_argument("--patch_size", type=int, default=8)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--out", type=str, default="features.npz")
    FLAGS, _ = parser.parse_known_args(argv)
    print(FLAGS)

    if FLAGS.synthetic:
        source = synthetic_image_source(
            n_classes=FLAGS.synthetic_classes, per_class=FLAGS.synthetic_per_class,
            image_size=FLAGS.image_size, seed=FLAGS.seed,
        )
    else:
        source = image_folder_source(FLAGS.images_root)
    print(f"{source.n} images over {source.catalog.n_classes} classes")

    if FLAGS.teacher == "transformers":
        import torch
        from transformers import AutoImageProcessor, AutoModel

        processor = AutoImageProcessor.from_pretrained(FLAGS.teacher_weights)
        model = AutoModel.from_pretrained(FLAGS.teacher_weights).eval()

        def model_fn(batch):
            with torch.no_grad():
                inputs = processor(
                    images=[np.asarray(b) for b in np.asarray(batch)], return_tensors="pt"
                )
                out = model(**inputs)
            return out.last_hidden_state[:, 0].numpy()

        feats = extract_features(source, model_fn, image_size=FLAGS.image_size)
    elif FLAGS.teacher == "dinov2_jax":
        import jax

        from cerebra.models.vit import import_dinov2_vit_torch, vit_small_dinov2

        if FLAGS.teacher_weights.endswith((".npz", ".npy")):
            sd = dict(np.load(FLAGS.teacher_weights))
        else:
            import torch

            obj = torch.load(FLAGS.teacher_weights, map_location="cpu", weights_only=False)
            sd = obj.get("teacher", obj.get("model", obj)) if isinstance(obj, dict) else obj
            sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
        import jax.numpy as jnp

        from cerebra.models.dino_model import dino_image_transform

        model = vit_small_dinov2()
        variables = import_dinov2_vit_torch(sd)
        # params as a runtime argument — a closure would bake all ~22M
        # weights into the compiled HLO as constants
        probe = jax.jit(model.apply)
        feats = extract_features(
            source,
            lambda batch: np.asarray(probe(variables, jnp.asarray(batch))),
            preprocess=lambda img: dino_image_transform(img, FLAGS.image_size),
            image_size=FLAGS.image_size,
        )
    else:
        args = DinoArgs(arch=FLAGS.arch, patch_size=FLAGS.patch_size,
                        image_size=FLAGS.image_size, use_head=False)
        if FLAGS.teacher == "dino_ckpt":
            dino = DinoModel.from_torch_checkpoint(FLAGS.teacher_weights, args)
        else:
            dino = DinoModel(args, seed=FLAGS.seed)
        feats = extract_features(
            source, dino, preprocess=dino.dinov1_transform, image_size=FLAGS.image_size
        )

    np.savez(FLAGS.out, features=feats.astype(np.float32), labels=source.labels)
    print(f"wrote {FLAGS.out}: features {feats.shape}")
    return feats


if __name__ == "__main__":
    main()
