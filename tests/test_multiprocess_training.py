"""Multi-PROCESS meshed training equivalence (the reference's real DDP
world: torch.multiprocessing.spawn + DistributedSampler,
EEG-BarlowNetworks/train.py:71-99, utils/utils.py:467-503).

Two real OS processes × 4 virtual CPU devices each form one global 8-device
data mesh; the flagship feature-distill recipe trains on it with corpora
built via jax.make_array_from_process_local_data (each process contributes
only its addressable shards — cerebra.parallel.dataflow). Because every
dataflow decision is deterministic in (seed, epoch) and independent of the
process layout, the per-epoch losses must equal a single-process 8-device
run bit-for-bit.

Marked slow: two cold python+jax starts plus a distributed rendezvous.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent(
    """
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.environ["CEREBRA_REPO"])
    from cerebra.cli.common import init_distributed

    init_distributed()
    assert jax.process_count() == 2 and len(jax.devices()) == 8

    import numpy as np
    from jax.sharding import Mesh
    from cerebra.data import make_synthetic_corpus
    from cerebra.train.recipes import FeatureDistillConfig, feature_distill_train

    corpus = make_synthetic_corpus(
        seed=0, n_per_class=8, n_classes=4, n_channels=8, n_samples=32,
        feature_dim=16, class_signal_scale=2.0,
    )
    cfg = FeatureDistillConfig(
        num_epochs=2, batch_size=16, validation_frequency=0,
        lstm_size=8, lstm_layers=1, warmup_teacher_temp_epochs=1,
        warmup_teacher_temp=1.0, teacher_temp=0.5,
    )
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    _, hist = feature_distill_train(
        corpus.eeg, corpus.image_features, corpus.labels,
        corpus.eeg[:4], corpus.image_features[:4], corpus.labels[:4],
        config=cfg, mesh=mesh, log_fn=lambda s: None,
    )
    print("LOSSES " + json.dumps(hist["train_loss"]))
    """
)


WORKER_2D = textwrap.dedent(
    """
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["CEREBRA_REPO"])
    from cerebra.cli.common import init_distributed

    init_distributed()
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from cerebra.train.recipes import DinoSelfDistillConfig, dino_selfdistill_train

    rng = np.random.default_rng(0)
    eeg = rng.normal(size=(16, 32, 4)).astype(np.float32)
    cfg = DinoSelfDistillConfig(
        epochs=1, batch_size_per_device=2, out_dim=16, embed_dim=8,
        lstm_layers=1, global_length=16, local_length=8, warmup_epochs=0,
    )
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))

    # checkpoint_cb runs the cli.lstm_distillation export path: the host
    # gather (host_replicated) is COLLECTIVE across both processes because
    # the prototype layer / moments / center are TP-sharded over "model",
    # which spans processes here; the .pth write stays rank-0
    # (ADVICE round 3, medium).
    from cerebra.train.checkpoints import export_dino_pth, host_replicated

    ckpt_dir = os.environ["CEREBRA_CKPT_DIR"]

    def checkpoint_cb(epoch, state):
        student, teacher, center, opt_state = host_replicated(
            (state.student_params, state.teacher_params, state.center,
             state.opt_state)
        )
        if jax.process_index() != 0:
            return
        export_dino_pth(
            os.path.join(ckpt_dir, "checkpoint.pth"),
            student, teacher, center, epoch, opt_state=opt_state,
        )

    # AutoResume.save is collective too (all ranks call orbax; ADVICE
    # round 3, high) — a rank gate here deadlocked the first epoch save.
    from cerebra.train.resume import AutoResume

    resume = AutoResume(os.path.join(ckpt_dir, "orbax"))
    state, hist = dino_selfdistill_train(eeg, config=cfg, mesh=mesh,
                                         log_fn=lambda s: None,
                                         checkpoint_cb=checkpoint_cb,
                                         resume=resume)
    v = state.student_params["head"]["last_layer"]["v"]
    assert v.sharding.spec == P(None, "model"), v.sharding
    assert np.isfinite(hist["loss"]).all()
    assert resume.latest_step() is not None
    if jax.process_index() == 0:
        assert os.path.exists(os.path.join(ckpt_dir, "checkpoint.pth"))
    print("LOSS2D " + json.dumps(hist["loss"]))
    """
)


@pytest.mark.slow
def test_two_process_2d_mesh_with_tp(tmp_path):
    """2 processes × 4 devices on a 4×2 data×model mesh: the general
    (make_array_from_callback) sharded-corpus path plus TP prototype
    sharding work across PROCESS boundaries; both ranks see one global
    loss stream."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker2d.py"
    script.write_text(WORKER_2D)
    env_base = {
        **os.environ,
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "WORLD_SIZE": "2",
        "CEREBRA_REPO": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CEREBRA_CKPT_DIR": str(tmp_path / "ckpt"),
    }
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script)],
            env={**env_base, "RANK": str(rank)},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    losses = {}
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        line = [l for l in out.splitlines() if l.startswith("LOSS2D ")]
        assert line, out
        losses[rank] = json.loads(line[0][len("LOSS2D "):])
    assert losses[0] == losses[1]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env_base = {
        **os.environ,
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "WORLD_SIZE": "2",
        "CEREBRA_REPO": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script)],
            env={**env_base, "RANK": str(rank)},
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    losses = {}
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        line = [l for l in out.splitlines() if l.startswith("LOSSES ")]
        assert line, out
        losses[rank] = json.loads(line[0][len("LOSSES "):])
    # both ranks observe the identical global loss stream
    assert losses[0] == losses[1]

    # single-process 8-virtual-device run (the suite's own devices) must
    # produce the same stream: the dataflow is layout-invariant
    from cerebra.data import make_synthetic_corpus
    from cerebra.parallel.mesh import make_mesh
    from cerebra.train.recipes import FeatureDistillConfig, feature_distill_train

    corpus = make_synthetic_corpus(
        seed=0, n_per_class=8, n_classes=4, n_channels=8, n_samples=32,
        feature_dim=16, class_signal_scale=2.0,
    )
    cfg = FeatureDistillConfig(
        num_epochs=2, batch_size=16, validation_frequency=0,
        lstm_size=8, lstm_layers=1, warmup_teacher_temp_epochs=1,
        warmup_teacher_temp=1.0, teacher_temp=0.5,
    )
    _, hist = feature_distill_train(
        corpus.eeg, corpus.image_features, corpus.labels,
        corpus.eeg[:4], corpus.image_features[:4], corpus.labels[:4],
        config=cfg, mesh=make_mesh(("data",)), log_fn=lambda s: None,
    )
    np.testing.assert_allclose(hist["train_loss"], losses[0], rtol=1e-6)


WORKER_CONFORMER = textwrap.dedent(
    """
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["CEREBRA_REPO"])
    from cerebra.cli.common import init_distributed

    init_distributed()
    import numpy as np
    from jax.sharding import Mesh
    from cerebra.train.conformer_recipe import (
        ExPConfig, conformer_exp_train, make_synthetic_bciiv,
    )

    data, labels = make_synthetic_bciiv(seed=0, n_per_class=8, n_channels=4,
                                        n_samples=256)
    n_train = int(len(data) * 0.75)
    cfg = ExPConfig(batch_size=8, n_epochs=2, emb_size=40, depth=1,
                    n_segments=4, eval_every=2)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    _, hist = conformer_exp_train(
        data[:n_train], labels[:n_train], data[n_train:], labels[n_train:],
        config=cfg, mesh=mesh,
        log_write_path=None,
    )
    print("CONF_LOSS " + json.dumps(hist["train_loss"]))
    """
)


@pytest.mark.slow
def test_two_process_conformer_mesh(tmp_path):
    """The conformer meshed path (replicated corpus + sharding-constrained
    step batch) across PROCESS boundaries: the corpus/key arrays are
    uncommitted host-built values identical on every rank, which jit may
    auto-globalize — this pins that it actually does."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker_conf.py"
    script.write_text(WORKER_CONFORMER)
    env_base = {
        **os.environ,
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "WORLD_SIZE": "2",
        "CEREBRA_REPO": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script)],
            env={**env_base, "RANK": str(rank)},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    losses = {}
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("CONF_LOSS ")]
        assert line, out[-3000:]
        losses[rank] = json.loads(line[0][len("CONF_LOSS "):])
    assert losses[0] == losses[1]
