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


@pytest.mark.slow  # CLI-subprocess DP equivalence (2 full CLI runs);
# library-level DP equivalence stays fast in tests/test_parallel.py
def test_feature_distill_cli_dp_equivalence(workdir):
    """lstm_distill_from_dinov2_train with --devices 8 ≡ --devices 1.

    Full-batch (4 classes × 10 = 40 trials → 32 train = one batch of 32):
    each epoch's batch is the same sample SET under both layouts and the
    loss is a permutation-invariant batch mean, so the meshed epoch-scan
    must reproduce the single-device losses exactly.
    """
    from cerebra.cli.lstm_distill_from_dinov2_train import main as train_main

    assert jax.device_count() >= 8
    base = ["--synthetic", "--num_epochs", "3", "--synthetic_classes", "4",
            "--synthetic_per_class", "10", "--batch_size", "32",
            "--use_bf16", "false"]
    _, h1 = train_main(base + ["--devices", "1", "--log_dir", str(workdir / "d1")])
    _, h8 = train_main(base + ["--devices", "8", "--log_dir", str(workdir / "d8")])
    np.testing.assert_allclose(h1["train_loss"], h8["train_loss"], rtol=1e-5)


@pytest.mark.slow
def test_dino_selfdistill_cli_dp_meshed(workdir):
    """lstm_distillation on the 8-device mesh (global batch 2×8): the meshed
    epoch-scan trains to finite losses, deterministically. (Exact equality
    with --devices 1 is not expected: the crop PRNG pairs offsets with batch
    POSITIONS, and shard-local sampling orders the batch differently.)"""
    from cerebra.cli.lstm_distillation import main as dino_main

    base = ["--synthetic", "--epochs", "2", "--out_dim", "32",
            "--synthetic_classes", "2", "--synthetic_per_class", "10",
            "--use_bf16", "false", "--saveckp_freq", "0",
            "--auto_resume", "false", "--warmup_epochs", "0"]
    _, h8 = dino_main(base + ["--devices", "8", "--batch_size_per_gpu", "2",
                              "--log_dir", str(workdir / "sd8")])
    _, h8b = dino_main(base + ["--devices", "8", "--batch_size_per_gpu", "2",
                               "--log_dir", str(workdir / "sd8b")])
    assert np.isfinite(h8["loss"]).all()
    assert h8["loss"] == h8b["loss"]


@pytest.mark.slow
def test_dino_vit_meshed_epoch_scan_with_tp(workdir):
    """main_dino's recipe on a 4×2 (data×model) mesh: the meshed whole-epoch
    scan runs with the out_dim-sharded head (TP), losses finite, prototype
    weights still sharded afterwards."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from cerebra.parallel.mesh import make_mesh
    from cerebra.train.dino_vit import DinoVitConfig, dino_vit_train

    rng = np.random.default_rng(0)
    eeg = rng.normal(size=(16, 48, 8)).astype(np.float32)
    imgs = rng.random(size=(16, 32, 32, 3)).astype(np.float32)
    cfg = DinoVitConfig(
        arch="vit_tiny", patch_size=16, out_dim=32, epochs=2,
        batch_size_per_device=2, global_size=32, local_size=16,
        local_crops_number=2, warmup_epochs=0,
    )
    mesh = make_mesh(("data", "model"), (4, 2))
    state, hist = dino_vit_train(eeg, imgs, config=cfg, mesh=mesh,
                                 log_fn=lambda s: None)
    assert np.isfinite(hist["loss"]).all()
    v = state.student_params["head"]["last_layer"]["v"]
    assert v.sharding.spec == P(None, "model")
    assert int(state.step) == 2 * (16 // 8)


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
