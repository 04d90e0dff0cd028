"""Oracle: our DINO multi-crop loss + center EMA vs the REFERENCE's own
DINOLoss class (dino/main_dino.py:428-481), run single-process with a gloo
group so its dist.all_reduce is exercised the same way the reference runs it
on one machine (SURVEY.md §4 'multi-node without a cluster')."""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)


from tests._reference_stubs import stub_torchvision as _stub_torchvision


@pytest.fixture(scope="module")
def ref_dino_loss_cls():
    import torch.distributed as dist

    _stub_torchvision()
    sys.path.insert(0, os.path.join(REFERENCE, "dino"))
    sys.path.insert(0, REFERENCE)
    try:
        import main_dino  # noqa: PLC0415
    except Exception as e:
        pytest.skip(f"reference main_dino not importable: {e}")
    finally:
        sys.path.remove(os.path.join(REFERENCE, "dino"))
        sys.path.remove(REFERENCE)
    if not dist.is_initialized():
        os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
        os.environ.setdefault("MASTER_PORT", "29511")
        try:
            dist.init_process_group("gloo", rank=0, world_size=1)
        except Exception as e:
            pytest.skip(f"gloo group unavailable: {e}")
    return main_dino.DINOLoss


def test_dino_multicrop_loss_matches_reference(ref_dino_loss_cls):
    import torch

    import jax.numpy as jnp

    from cerebra.losses import dino_multicrop_loss

    out_dim, ncrops, B = 16, 6, 4
    n_teacher = 2
    warmup_t, t_temp, warmup_ep, nep = 0.04, 0.07, 3, 10
    rng = np.random.default_rng(0)
    student_np = rng.normal(size=(ncrops, B, out_dim)).astype(np.float32)
    teacher_np = rng.normal(size=(n_teacher, B, out_dim)).astype(np.float32)

    ref = ref_dino_loss_cls(
        out_dim, ncrops, warmup_t, t_temp, warmup_ep, nep,
        student_temp=0.1, center_momentum=0.9,
    )
    center0 = rng.normal(size=(1, out_dim)).astype(np.float32)
    ref.center = torch.from_numpy(center0.copy())

    from cerebra.losses import teacher_temp_schedule

    temps = teacher_temp_schedule(warmup_t, t_temp, warmup_ep, nep)
    center_prev = center0
    for epoch in (0, 2, 5):
        ref_loss = ref(
            torch.from_numpy(student_np.reshape(-1, out_dim)),
            torch.from_numpy(teacher_np.reshape(-1, out_dim)),
            epoch,
        ).item()  # mutates ref.center via its EMA + all_reduce
        ours_loss, new_center = dino_multicrop_loss(
            jnp.asarray(student_np), jnp.asarray(teacher_np),
            jnp.asarray(center_prev),
            teacher_temp=float(temps[epoch]), student_temp=0.1,
        )
        np.testing.assert_allclose(
            np.asarray(new_center), ref.center.numpy(), rtol=1e-5, atol=1e-6
        )
        assert abs(float(ours_loss) - ref_loss) < 1e-5, (epoch, float(ours_loss), ref_loss)
        center_prev = np.asarray(new_center)


@pytest.fixture(scope="module")
def ref_train_module():
    """Import the reference's LstmDistillFromDinoV2Train module (its
    `from models.lstm import Model` line targets a module MISSING from the
    repo — SURVEY §2.4 — so we stub it; main is __main__-guarded)."""
    from cerebra.eval import faiss_stub

    faiss_stub.install()  # utils.Utilities imports faiss at module level
    _stub_torchvision()
    if "models.lstm" not in sys.modules:
        pkg = types.ModuleType("models")
        mod = types.ModuleType("models.lstm")
        mod.Model = object
        pkg.lstm = mod
        sys.modules.setdefault("models", pkg)
        sys.modules["models.lstm"] = mod
    sys.path.insert(0, REFERENCE)
    try:
        import LstmDistillFromDinoV2Train as ref_mod  # noqa: PLC0415
    except Exception as e:
        pytest.skip(f"reference train module not importable: {e}")
    finally:
        sys.path.remove(REFERENCE)
    return ref_mod


def test_single_pair_dino_loss_matches_reference(ref_train_module):
    """The single-pair DINOLoss variant (LstmDistillFromDinoV2Train.py:45-105)
    vs cerebra.losses.dino_single_pair_loss: loss AND center EMA chained over
    epochs under a live gloo group."""
    import torch
    import torch.distributed as dist

    import jax.numpy as jnp

    from cerebra.losses import dino_single_pair_loss

    if not dist.is_initialized():
        os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
        os.environ.setdefault("MASTER_PORT", "29512")
        try:
            dist.init_process_group("gloo", rank=0, world_size=1)
        except Exception as e:
            pytest.skip(f"gloo group unavailable: {e}")

    out_dim, B = 12, 6
    ref_loss = ref_train_module.DINOLoss(
        out_dim, ncrops=2, warmup_teacher_temp=0.03, teacher_temp=0.06,
        warmup_teacher_temp_epochs=2, nepochs=5,
    )
    rng = np.random.default_rng(1)
    center = jnp.zeros((1, out_dim), jnp.float32)
    for epoch in range(5):
        s = rng.normal(size=(B, out_dim)).astype(np.float32)
        t = rng.normal(size=(B, out_dim)).astype(np.float32)
        want = float(ref_loss(torch.from_numpy(s), torch.from_numpy(t), epoch))
        temp = ref_loss.teacher_temp_schedule[epoch]
        got, center = dino_single_pair_loss(
            jnp.asarray(s), jnp.asarray(t), center, teacher_temp=float(temp)
        )
        np.testing.assert_allclose(float(got), want, rtol=1e-5, err_msg=f"epoch {epoch}")
        np.testing.assert_allclose(
            np.asarray(center), ref_loss.center.numpy(), rtol=1e-5, atol=1e-7,
            err_msg=f"center epoch {epoch}",
        )


def test_feature_distribution_loss_v1_matches_reference(ref_train_module):
    """FeatureDistributionLoss (LstmDistillFromDinoV2Train.py:107-146) vs
    our feature_distribution_loss_v1, incl. the CE-on-probabilities quirk
    and the HyperParams α/β it reads globally."""
    import torch

    import jax.numpy as jnp

    from cerebra.losses import feature_distribution_loss_v1

    hp = ref_train_module.HyperParams
    ref_loss = ref_train_module.FeatureDistributionLoss(
        nepochs=6, warmup_teacher_temp=1.5, teacher_temp=0.22,
        warmup_teacher_temp_epochs=4,
    )
    rng = np.random.default_rng(2)
    B, D, n_classes = 8, 10, 4
    for epoch in (0, 2, 5):
        s = rng.normal(size=(B, D)).astype(np.float32)
        t = rng.normal(size=(B, D)).astype(np.float32)
        labels = rng.integers(0, n_classes, size=B)
        logits = rng.normal(size=(B, n_classes)).astype(np.float32)
        want = float(ref_loss(
            torch.from_numpy(s), torch.from_numpy(t), epoch,
            torch.from_numpy(labels), pred_label=torch.from_numpy(logits),
        ))
        got = feature_distribution_loss_v1(
            jnp.asarray(s), jnp.asarray(t), jnp.asarray(labels), jnp.asarray(logits),
            temperature=float(ref_loss.teacher_temp_schedule[epoch]),
            alpha=float(hp.alpha), beta=float(hp.beta),
        )
        np.testing.assert_allclose(float(got), want, rtol=1e-5, err_msg=f"epoch {epoch}")


def _import_ref_entry(name):
    """Import a reference entry module with the standard stubs."""
    from cerebra.eval import faiss_stub

    faiss_stub.install()
    _stub_torchvision()
    if "models.lstm" not in sys.modules:
        pkg = types.ModuleType("models")
        mod = types.ModuleType("models.lstm")
        mod.Model = object
        pkg.lstm = mod
        sys.modules.setdefault("models", pkg)
        sys.modules["models.lstm"] = mod
    sys.path.insert(0, REFERENCE)
    try:
        import importlib

        return importlib.import_module(name)
    except Exception as e:
        pytest.skip(f"reference {name} not importable: {e}")
    finally:
        sys.path.remove(REFERENCE)


def test_remaining_losses_match_reference_classes():
    """Every remaining loss variant pinned to the reference's OWN classes:
    v2 (LstmDistillation.py:161-172), v3 (Eval.py:106-146 — its forward reads
    a main-local `device`, injected as cpu), Hinton KD (Spampinato:107-121),
    KL+smooth-L1 (Retreival:40-70), CosineSimilarityLoss + the negative-form
    functional variant (LSTMDistill.py:28-58)."""
    import types as _types

    import torch

    import jax.numpy as jnp

    from cerebra.losses import (
        cosine_similarity_loss,
        feature_distribution_loss_v2,
        feature_distribution_loss_v3,
        hinton_kd_loss,
        kl_kd_smooth_l1_loss,
    )

    rng = np.random.default_rng(23)
    B, D, n_classes = 6, 10, 4
    s = rng.normal(size=(B, D)).astype(np.float32)
    t = rng.normal(size=(B, D)).astype(np.float32)
    st, tt = torch.from_numpy(s), torch.from_numpy(t)
    sj, tj = jnp.asarray(s), jnp.asarray(t)

    # v2 — mean/std matching
    m = _import_ref_entry("LstmDistillation")
    want = float(m.FeatureDistributionLoss()(st, tt))
    np.testing.assert_allclose(float(feature_distribution_loss_v2(sj, tj)), want, rtol=1e-5)

    # v3 — soft-target KL · T² (needs the main-local `device` injected)
    m = _import_ref_entry("LstmDistillFromDinoV2Eval")
    m.device = torch.device("cpu")
    ref = m.FeatureDistributionLoss(nepochs=4, warmup_teacher_temp=1.5,
                                    teacher_temp=0.22, warmup_teacher_temp_epochs=2)
    for epoch in (0, 3):
        want = float(ref(st, tt, epoch))
        T = float(ref.teacher_temp_schedule[epoch])
        np.testing.assert_allclose(
            float(feature_distribution_loss_v3(sj, tj, T)), want, rtol=1e-5)

    # Hinton KD (Spampinato)
    m = _import_ref_entry("LstmDistillFromDinoV2TrainSpampinato")
    labels = rng.integers(0, D, size=B)  # CE over the raw D-wide outputs
    params = _types.SimpleNamespace(alpha=0.6, temperature=2.5)
    want = float(m.loss_fn_kd(st, torch.from_numpy(labels), tt, params))
    got = hinton_kd_loss(sj, jnp.asarray(labels), tj, temperature=2.5, alpha=0.6)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

    # KL + smooth-L1 (Retreival)
    m = _import_ref_entry("LSTMDistillRetreival")
    params = _types.SimpleNamespace(temperature=2.0, soft_target_loss_weight=0.3,
                                    ce_loss_weight=0.7, alpha=0.5)  # alpha read then unused (:48)
    want = float(m.loss_fn_kd(st, None, tt, params))
    got = kl_kd_smooth_l1_loss(sj, tj, temperature=2.0,
                               soft_target_loss_weight=0.3, ce_loss_weight=0.7)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

    # cosine — class form and negative functional form
    m = _import_ref_entry("LSTMDistill")
    want = float(m.CosineSimilarityLoss()(st, tt))
    np.testing.assert_allclose(float(cosine_similarity_loss(sj, tj)), want, rtol=1e-5)
    want = float(m.cosine_similarity_loss(st, tt))
    np.testing.assert_allclose(
        float(cosine_similarity_loss(sj, tj, negative_form=True)), want, rtol=1e-5)

    # CosineEmbeddingLoss — the criterion picked (then unused) at
    # LstmDistillFromDinoV2TrainSpampinato.py:385; pinned to torch's built-in
    # on mixed +1/−1 targets and a nonzero margin.
    from cerebra.losses import cosine_embedding_loss

    targets = rng.choice(np.array([-1, 1]), size=B)
    ttgt = torch.from_numpy(targets)
    for margin in (0.0, 0.25):
        want = float(torch.nn.CosineEmbeddingLoss(margin=margin)(st, tt, ttgt))
        got = cosine_embedding_loss(sj, tj, jnp.asarray(targets), margin=margin)
        np.testing.assert_allclose(float(got), want, rtol=1e-5)
