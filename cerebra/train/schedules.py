"""Precomputed schedule arrays (host-side numpy, indexed by step on device).

The reference precomputes whole-run numpy schedules and indexes them per
iteration (utils/utils.py:187-198; dino/main_dino.py:257-270) — already the
TPU-friendly shape: we keep that, handing the device a constant array and a
traced index.
"""

from __future__ import annotations

import numpy as np


def cosine_scheduler(
    base_value: float,
    final_value: float,
    epochs: int,
    niter_per_ep: int,
    warmup_epochs: int = 0,
    start_warmup_value: float = 0.0,
) -> np.ndarray:
    """utils/utils.py:187-198: linear warmup → half-cosine decay; length is
    exactly epochs·niter_per_ep."""
    warmup_iters = warmup_epochs * niter_per_ep
    warmup = (
        np.linspace(start_warmup_value, base_value, warmup_iters)
        if warmup_epochs > 0
        else np.array([])
    )
    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    schedule = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / len(iters))
    )
    out = np.concatenate((warmup, schedule))
    assert len(out) == epochs * niter_per_ep
    return out


def barlow_learning_rate(
    epochs: int, niter_per_ep: int, batch_size: int, warmup_epochs: int = 10
) -> np.ndarray:
    """EEG-BarlowNetworks/barlow_utils.py:8-21: base_lr=batch/256, 10-epoch
    linear warmup, cosine to 0.001·base (returned un-scaled; multiply by the
    per-group learning_rate_weights/biases factors at use)."""
    max_steps = epochs * niter_per_ep
    warmup_steps = warmup_epochs * niter_per_ep
    base_lr = batch_size / 256.0
    steps = np.arange(max_steps)
    warm = base_lr * steps / max(warmup_steps, 1)
    s = steps - warmup_steps
    denom = max(max_steps - warmup_steps, 1)
    q = 0.5 * (1 + np.cos(np.pi * s / denom))
    end_lr = base_lr * 0.001
    cos = base_lr * q + end_lr * (1 - q)
    return np.where(steps < warmup_steps, warm, cos)
