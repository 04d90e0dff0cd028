"""CLI-level data parallelism: the public commands build a mesh (--devices)
and produce the same losses as a single-device run — the check the
reference's DDP surface (LstmDistillation.py:406,445) never had.

Runs on the suite's 8 virtual CPU devices (conftest)."""

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("cli_dp")


def test_feature_distill_cli_dp_equivalence(workdir):
    """lstm_distill_from_dinov2_train with --devices 8 ≡ --devices 1.

    Corpus sized so every batch divides the mesh (4 classes × 10 = 40
    trials → 32 train = 2 full batches of 16): no ragged-tail trimming,
    so the meshed run sees bit-identical data.
    """
    from cerebra.cli.lstm_distill_from_dinov2_train import main as train_main

    assert jax.device_count() >= 8
    base = ["--synthetic", "--num_epochs", "3", "--synthetic_classes", "4",
            "--synthetic_per_class", "10", "--use_bf16", "false"]
    _, h1 = train_main(base + ["--devices", "1", "--log_dir", str(workdir / "d1")])
    _, h8 = train_main(base + ["--devices", "8", "--log_dir", str(workdir / "d8")])
    np.testing.assert_allclose(h1["train_loss"], h8["train_loss"], rtol=1e-5)


@pytest.mark.slow
def test_dino_selfdistill_cli_dp_equivalence(workdir):
    """lstm_distillation: global batch 16 = 16×1 dev = 2×8 devs — same
    crops (one PRNG key per step over the global batch), same loss."""
    from cerebra.cli.lstm_distillation import main as dino_main

    base = ["--synthetic", "--epochs", "2", "--out_dim", "32",
            "--synthetic_classes", "2", "--synthetic_per_class", "10",
            "--use_bf16", "false", "--saveckp_freq", "0",
            "--auto_resume", "false", "--warmup_epochs", "0"]
    _, h1 = dino_main(base + ["--devices", "1", "--batch_size_per_gpu", "16",
                              "--log_dir", str(workdir / "sd1")])
    _, h8 = dino_main(base + ["--devices", "8", "--batch_size_per_gpu", "2",
                              "--log_dir", str(workdir / "sd8")])
    np.testing.assert_allclose(h1["loss"], h8["loss"], rtol=1e-4)


@pytest.mark.slow
def test_barlow_cli_auto_mesh(workdir):
    """--devices 0 (auto) on a batch of 4 clamps the mesh to 4 devices
    (largest divisor) instead of crashing like the reference's assert."""
    from cerebra.cli.barlow_train import main

    variables, hist = main(
        ["--synthetic", "--synthetic_classes", "2", "--synthetic_per_class", "4",
         "--epochs", "1", "--batch_size", "4", "--projector", "16-16",
         "--n_mels", "16", "--image_size", "32", "--devices", "0",
         "--log_dir", str(workdir / "barlow_auto")]
    )
    assert np.isfinite(hist["loss"]).all()
