"""CLI entry points mirroring the reference's public command surface
(SURVEY.md §2.7), with the same flag names, defaults, and artifact formats.

Run as modules, e.g.:
    python -m cerebra.cli.lstm_distill_from_dinov2_train --synthetic ...
    python -m cerebra.cli.lstm_distill_from_dinov2_eval  --synthetic ...
    python -m cerebra.cli.lstm_distillation --synthetic --epochs 3
    python -m cerebra.cli.discover_channels --synthetic

Additions over the reference: `--synthetic` (null-hypothesis fake-data
backend, utils/GenerateRandomEEGNoise.py made first-class) and
`--features_cache` (precomputed teacher features replacing the torch.hub
DINOv2 download at train time — this environment has zero egress, and the
cache is the TPU-correct design anyway: one batched teacher pass, stored).
"""
