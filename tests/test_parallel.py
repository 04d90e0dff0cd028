"""Distributed-path tests on the 8-virtual-device CPU mesh: DP training
equivalence, collectives, TP sharding (SURVEY.md §4 — multihost-emulated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerebra.data import make_synthetic_corpus
from cerebra.parallel import collectives
from cerebra.parallel.mesh import data_sharding, make_mesh, shard_batch
from cerebra.parallel.tp import shard_params_tp
from cerebra.train.recipes import FeatureDistillConfig, feature_distill_train


def test_mesh_and_batch_sharding():
    mesh = make_mesh(("data",))
    assert mesh.devices.size == 8
    batch = {"eeg": np.zeros((16, 10, 4), np.float32), "y": np.zeros((16,), np.int32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["eeg"].sharding.spec[0] == "data"
    # each device holds 16/8 = 2 rows
    shard = sharded["eeg"].addressable_shards[0]
    assert shard.data.shape == (2, 10, 4)


def test_collectives_under_pmap():
    devs = jax.devices()[:4]
    x = jnp.arange(4.0)

    out = jax.pmap(lambda v: collectives.psum(v, "data"), axis_name="data", devices=devs)(x)
    np.testing.assert_allclose(np.asarray(out), 6.0)
    out = jax.pmap(lambda v: collectives.pmean(v, "data"), axis_name="data", devices=devs)(x)
    np.testing.assert_allclose(np.asarray(out), 1.5)
    gathered = jax.pmap(
        lambda v: collectives.all_gather(v[None], "data"), axis_name="data", devices=devs
    )(x)
    assert gathered.shape == (4, 4)
    size = jax.pmap(lambda v: collectives.axis_size("data"), axis_name="data", devices=devs)(x)
    assert int(size[0]) == 4


def test_tp_param_sharding():
    mesh = make_mesh(("data", "model"), (4, 2))
    params = {
        "kernel": jnp.zeros((16, 64)),  # 64 % 2 == 0 → column-sharded
        "bias": jnp.zeros((64,)),  # 1-D → replicated
        "odd": jnp.zeros((16, 7)),  # 7 % 2 != 0 → replicated
    }
    sharded = shard_params_tp(params, mesh)
    assert sharded["kernel"].sharding.spec == jax.sharding.PartitionSpec(None, "model")
    assert sharded["bias"].sharding.spec == jax.sharding.PartitionSpec()
    assert sharded["odd"].sharding.spec == jax.sharding.PartitionSpec()


def test_dp_training_matches_single_device():
    """The DDP equivalence check the reference never had: training with the
    batch sharded over an 8-device data mesh must produce the same losses as
    single-device (identical math — jit inserts the grad psum)."""
    corpus = make_synthetic_corpus(
        seed=0, n_per_class=8, n_classes=4, n_channels=8, n_samples=32,
        feature_dim=16, class_signal_scale=2.0,
    )
    tr = np.arange(corpus.n) % 4 != 0
    va = ~tr
    cfg = FeatureDistillConfig(
        num_epochs=3, batch_size=8, validation_frequency=0,
        lstm_size=8, lstm_layers=1, warmup_teacher_temp_epochs=2,
        warmup_teacher_temp=1.0, teacher_temp=0.5,
    )
    args = (
        corpus.eeg[tr], corpus.image_features[tr], corpus.labels[tr],
        corpus.eeg[va], corpus.image_features[va], corpus.labels[va],
    )
    _, hist_single = feature_distill_train(*args, config=cfg, log_fn=lambda s: None)
    mesh = make_mesh(("data",))
    _, hist_dp = feature_distill_train(*args, config=cfg, mesh=mesh, log_fn=lambda s: None)
    np.testing.assert_allclose(
        hist_single["train_loss"], hist_dp["train_loss"], rtol=1e-4, atol=1e-5
    )
