"""Student stochastic depth in the main_dino recipe (dino/main_dino.py:105
default 0.1, applied to the student only, :183-190 — the teacher is built
without drop path)."""

import numpy as np
import pytest


def _train(drop_path_rate, epochs=2):
    from cerebra.train.dino_vit import DinoVitConfig, dino_vit_train

    rng = np.random.default_rng(0)
    eeg = rng.normal(size=(8, 48, 8)).astype(np.float32)
    cfg = DinoVitConfig(
        arch="vit_tiny", patch_size=16, out_dim=32, epochs=epochs,
        batch_size_per_device=4, global_size=32, local_size=16,
        local_crops_number=2, warmup_epochs=0, drop_path_rate=drop_path_rate,
    )
    return dino_vit_train(eeg, None, config=cfg, log_fn=lambda s: None)


@pytest.mark.slow  # two full recipe compiles (dpr on/off)
def test_student_drop_path_changes_training_and_stays_finite():
    _, hist0 = _train(0.0)
    _, hist1 = _train(0.9)  # heavy stochastic depth: must actually engage
    assert np.isfinite(hist0["loss"]).all()
    assert np.isfinite(hist1["loss"]).all()
    # the per-sample residual-branch mask must change the training
    # trajectory; identical losses would mean the mask never engaged
    assert not np.allclose(hist0["loss"], hist1["loss"])


def test_main_dino_cli_exposes_reference_drop_path_flag():
    import cerebra.cli.main_dino as cli

    # the reference flag and its default (dino/main_dino.py:105)
    import argparse
    import unittest.mock as mock

    seen = {}
    real_add = argparse.ArgumentParser.add_argument

    def spy(self, *a, **k):
        if a and a[0] == "--drop_path_rate":
            seen["default"] = k.get("default")
        return real_add(self, *a, **k)

    with mock.patch.object(argparse.ArgumentParser, "add_argument", spy):
        with pytest.raises(SystemExit):
            cli.main(["--help"])
    assert seen.get("default") == 0.1
