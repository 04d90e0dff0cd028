"""Shared helpers for importing the read-only reference tree as a parity
oracle: a minimal torchvision stub (the environment has none; the reference
modules only construct transforms in ctors)."""

import sys
import types


def stub_torchvision():
    if "torchvision" in sys.modules:
        return

    class _Noop:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    transforms = types.ModuleType("torchvision.transforms")
    for name in (
        "Compose", "Lambda", "Resize", "ToTensor", "Normalize", "CenterCrop",
        "RandomResizedCrop", "RandomHorizontalFlip", "RandomApply",
        "ColorJitter", "RandomGrayscale",
    ):
        setattr(transforms, name, _Noop)
    transforms.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
    models = types.ModuleType("torchvision.models")
    models.__dict__["resnet50"] = lambda **k: None
    models.__dict__["vgg19"] = lambda **k: None
    datasets = types.ModuleType("torchvision.datasets")
    tv_utils = types.ModuleType("torchvision.utils")
    tv_utils.save_image = _Noop()
    tv_utils.make_grid = _Noop()
    tv = types.ModuleType("torchvision")
    tv.__path__ = []  # mark as package so `import torchvision.utils` resolves
    tv.transforms, tv.models, tv.datasets, tv.utils = transforms, models, datasets, tv_utils
    for mod_name, mod in (
        ("torchvision", tv), ("torchvision.transforms", transforms),
        ("torchvision.models", models), ("torchvision.datasets", datasets),
        ("torchvision.utils", tv_utils),
    ):
        sys.modules[mod_name] = mod


def stub_torchsummary():
    if "torchsummary" in sys.modules:
        return
    ts = types.ModuleType("torchsummary")
    ts.summary = lambda *a, **k: None
    sys.modules["torchsummary"] = ts
