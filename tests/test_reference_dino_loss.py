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
