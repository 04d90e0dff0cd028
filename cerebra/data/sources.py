"""Image-dataset sources — the EEGBaseDataset family, TPU-style.

The reference wraps image-only datasets in the EEG 5-tuple protocol
(utils/EEGBaseDataset.py:19-141) with subclasses per dataset:
Caltech101 (folder scan + LabelEncoder + StratifiedShuffleSplit 80/20,
utils/Caltech101Dataset.py:56-74), ImageNetDataset, CIFAR10/100,
DomainnetDataset, Flowers102/OxfordPets (utils/TorchDatasets.py:20-120).

Here a source is a thin host-side index (paths + labels + catalog); pixels
stream through `extract_features` into a device feature bank ONCE (replacing
the per-epoch in-place transform mutations), after which training touches
only dense arrays. torchvision-backed datasets are gated — this environment
has zero egress, so they require a pre-downloaded root.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from cerebra.data.schema import LabelCatalog


@dataclasses.dataclass
class ImageSource:
    """Host-side image index with the reference's label-table protocol."""

    paths: List[str]  # or None when images come from an array
    labels: np.ndarray  # (N,) int32
    catalog: LabelCatalog
    images: Optional[np.ndarray] = None  # (N, H, W, 3) uint8 alternative

    @property
    def n(self) -> int:
        return len(self.labels)

    def __len__(self) -> int:
        return self.n

    def load_image(self, i: int) -> np.ndarray:
        """(H, W, 3) uint8."""
        if self.images is not None:
            return self.images[i]
        from PIL import Image

        return np.asarray(Image.open(self.paths[i]).convert("RGB"))

    def stratified_split(
        self, test_size: float = 0.2, seed: int = 43
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Seeded sklearn StratifiedShuffleSplit — EXACT reference semantics
        (utils/Caltech101Dataset.py:56-74): same indices in sklearn's own
        order at the same seed (the reference builds its subset lists from
        the unsorted train_index/test_index). Host-side split, so sklearn is
        fine here; a per-class proportional numpy split (sorted indices)
        stands in when sklearn is unavailable."""
        try:
            from sklearn.model_selection import StratifiedShuffleSplit
        except Exception:
            return self._proportional_split(test_size, seed)
        sss = StratifiedShuffleSplit(n_splits=1, test_size=test_size, random_state=seed)
        train_idx, test_idx = next(sss.split(np.zeros(self.n), self.labels))
        return train_idx.astype(np.int64), test_idx.astype(np.int64)

    def _proportional_split(
        self, test_size: float, seed: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """sklearn-free fallback: per-class proportional split (same protocol,
        different indices at the same seed — documented delta)."""
        rng = np.random.default_rng(seed)
        train_idx, test_idx = [], []
        for c in np.unique(self.labels):
            idx = np.nonzero(self.labels == c)[0]
            perm = rng.permutation(idx)
            n_test = max(int(round(len(idx) * test_size)), 1)
            test_idx.extend(perm[:n_test])
            train_idx.extend(perm[n_test:])
        return np.sort(train_idx).astype(np.int64), np.sort(test_idx).astype(np.int64)


def image_folder_source(
    root: str, extensions: Sequence[str] = (".jpg", ".jpeg", ".png"), n_classes: int = 0
) -> ImageSource:
    """Folder-per-class scan (Caltech101/ImageNet/Domainnet pattern)."""
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    if n_classes:
        classes = classes[:n_classes]
    paths, labels = [], []
    for ci, cname in enumerate(classes):
        cdir = os.path.join(root, cname)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith(tuple(extensions)):
                paths.append(os.path.join(cdir, fname))
                labels.append(ci)
    return ImageSource(
        paths=paths,
        labels=np.asarray(labels, dtype=np.int32),
        catalog=LabelCatalog(tuple(classes), tuple(classes), tuple(str(i) for i in range(len(classes)))),
    )


def torchvision_source(name: str, root: str, train: bool = True) -> ImageSource:
    """CIFAR10/CIFAR100/Flowers102/OxfordIIITPet from a pre-downloaded
    torchvision root (utils/CIFAR10Dataset.py:19, utils/TorchDatasets.py:
    20-120). Zero-egress: download=False; raises with guidance if absent."""
    from torchvision import datasets as tvd

    builders = {
        "cifar10": lambda: tvd.CIFAR10(root, train=train, download=False),
        "cifar100": lambda: tvd.CIFAR100(root, train=train, download=False),
        "flowers102": lambda: tvd.Flowers102(
            root, split="train" if train else "test", download=False
        ),
        "oxford_pets": lambda: tvd.OxfordIIITPet(
            root, split="trainval" if train else "test", download=False
        ),
    }
    if name not in builders:
        raise ValueError(f"unknown torchvision dataset: {name}")
    try:
        ds = builders[name]()
    except Exception as e:
        raise FileNotFoundError(
            f"{name} not found under {root}; this environment cannot download — "
            f"provide a pre-populated torchvision root"
        ) from e
    if hasattr(ds, "data") and hasattr(ds, "targets"):  # CIFAR
        images = np.asarray(ds.data, dtype=np.uint8)
        labels = np.asarray(ds.targets, dtype=np.int32)
        names = tuple(getattr(ds, "classes", [str(i) for i in range(labels.max() + 1)]))
        return ImageSource(
            paths=None, labels=labels, images=images,
            catalog=LabelCatalog(names, names, tuple(str(i) for i in range(len(names)))),
        )
    if hasattr(ds, "_labels"):  # Flowers102 / OxfordIIITPet store labels
        labels = np.asarray(ds._labels, dtype=np.int32)
    else:
        labels = np.asarray([ds[i][1] for i in range(len(ds))], dtype=np.int32)
    n_cls = int(labels.max()) + 1
    names = tuple(str(i) for i in range(n_cls))
    # Flowers102 stores file paths in `_image_files`; OxfordIIITPet in
    # `_images` — without the fallback pets would eagerly np.stack
    # heterogeneous (H, W) PIL images and crash.
    path_list = getattr(ds, "_image_files", None) or getattr(ds, "_images", None)
    paths = [str(p) for p in path_list] if path_list else None
    source = ImageSource(
        paths=paths, labels=labels,
        catalog=LabelCatalog(names, names, names),
    )
    if paths is None:
        source.images = np.stack([np.asarray(ds[i][0].convert("RGB")) for i in range(len(ds))])
    return source


def extract_features(
    source: ImageSource,
    model_fn: Callable,  # (B, H, W, 3) float NHWC -> (B, F)
    preprocess: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    batch_size: int = 64,
    image_size: int = 224,
) -> np.ndarray:
    """One batched teacher pass over the corpus → (N, F) feature bank.

    The pure replacement for the reference's `extract_features` dataset
    mutation + all_gather (utils/PerilsEEGDataset.py:168-226,
    utils/EEGBaseDataset.py:49-133): run once, store, reuse.
    """
    import jax.numpy as jnp
    from PIL import Image

    feats = []
    for start in range(0, source.n, batch_size):
        idx = range(start, min(start + batch_size, source.n))
        batch = []
        for i in idx:
            img = source.load_image(i)
            if preprocess is not None:
                img = preprocess(img)
            else:
                img = np.asarray(
                    Image.fromarray(img).resize((image_size, image_size))
                ).astype(np.float32) / 255.0
            batch.append(img)
        out = model_fn(jnp.asarray(np.stack(batch)))
        feats.append(np.asarray(out))
    return np.concatenate(feats, axis=0)


# Named constructors matching the reference's per-dataset classes
# (SURVEY.md §2.2): all folder-per-class scans share one implementation.
def caltech101_source(root: str, n_classes: int = 0) -> ImageSource:
    """utils/Caltech101Dataset.py:16-300 (101_ObjectCategories layout)."""
    return image_folder_source(root, n_classes=n_classes)


def imagenet_source(root: str, n_classes: int = 0) -> ImageSource:
    """utils/ImageNetDataset.py:16 (wnid folders, n_classes cap)."""
    return image_folder_source(root, n_classes=n_classes)


def domainnet_source(root: str, domain: str = "", n_classes: int = 0) -> ImageSource:
    """utils/DomainnetDataset.py:16 (domain subfolder of class folders)."""
    import os as _os

    return image_folder_source(_os.path.join(root, domain) if domain else root,
                               n_classes=n_classes)


def synthetic_image_source(
    n_classes: int = 8, per_class: int = 12, image_size: int = 224, seed: int = 0
) -> ImageSource:
    """In-memory synthetic image backend (zero-egress analog of the image
    folders): per-class Gaussian-noise images with a class-specific mean
    shift — the GaussNoise control-image idea (utils/GaussNoise.py:4-50)
    turned into a dataset so every image-consuming CLI runs --synthetic."""
    rng = np.random.default_rng(seed)
    n = n_classes * per_class
    labels = np.repeat(np.arange(n_classes), per_class).astype(np.int32)
    means = rng.uniform(64, 192, size=(n_classes, 1, 1, 3))
    imgs = rng.normal(means[labels], 32.0, size=(n, image_size, image_size, 3))
    names = tuple(f"synthclass{i}" for i in range(n_classes))
    return ImageSource(
        paths=None,
        labels=labels,
        catalog=LabelCatalog(names, names, tuple(str(i) for i in range(n_classes))),
        images=np.clip(imgs, 0, 255).astype(np.uint8),
    )
