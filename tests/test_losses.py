"""Loss parity vs torch-computed golden values (formulas from SURVEY.md §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from cerebra.losses import (
    barlow_twins_loss,
    cosine_similarity_loss,
    dino_multicrop_loss,
    dino_single_pair_loss,
    feature_distribution_loss_v1,
    feature_distribution_loss_v2,
    feature_distribution_loss_v3,
    hinton_kd_loss,
    kl_kd_smooth_l1_loss,
    teacher_temp_schedule,
    update_center,
)


def _np(seed, *shape):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_teacher_temp_schedule():
    s = teacher_temp_schedule(0.04, 0.07, 10, 30)
    assert len(s) == 30
    assert abs(s[0] - 0.04) < 1e-9 and abs(s[9] - 0.07) < 1e-9 and abs(s[-1] - 0.07) < 1e-9
    # the documented negative warmup (README.md:19) is a valid schedule
    s2 = teacher_temp_schedule(-0.004, 0.04, 10, 20)
    assert s2[0] == -0.004


def test_dino_single_pair_matches_torch():
    s, t = _np(0, 8, 16), _np(1, 8, 16)
    center = _np(2, 1, 16)
    loss, new_center = dino_single_pair_loss(
        jnp.asarray(s), jnp.asarray(t), jnp.asarray(center), teacher_temp=0.07, student_temp=0.1
    )
    # torch golden (LstmDistillFromDinoV2Train.py:62-94)
    st = torch.from_numpy(s) / 0.1
    tt = F.softmax((torch.from_numpy(t) - torch.from_numpy(center)) / 0.07, dim=-1)
    want = torch.sum(-tt * F.log_softmax(st, dim=-1), dim=-1).mean().item()
    assert abs(float(loss) - want) < 1e-5
    # center EMA: 0.9·c + 0.1·mean
    want_center = center * 0.9 + t.sum(0, keepdims=True) / 8 * 0.1
    np.testing.assert_allclose(np.asarray(new_center), want_center, rtol=1e-5, atol=1e-6)


def test_dino_multicrop_canonical_pairing():
    n_crops, n_teacher, B, D = 4, 2, 3, 8
    s, t = _np(3, n_crops, B, D), _np(4, n_teacher, B, D)
    center = np.zeros((1, D), dtype=np.float32)
    loss, _ = dino_multicrop_loss(
        jnp.asarray(s), jnp.asarray(t), jnp.asarray(center), teacher_temp=0.05
    )
    # torch golden: canonical DINO pairing (dino/main_dino.py:455-468)
    st = torch.from_numpy(s) / 0.1
    tq = F.softmax(torch.from_numpy(t) / 0.05, dim=-1)
    total, n_terms = 0.0, 0
    for iq in range(n_teacher):
        for v in range(n_crops):
            if v == iq:
                continue
            total += torch.sum(-tq[iq] * F.log_softmax(st[v], dim=-1), dim=-1).mean().item()
            n_terms += 1
    assert abs(float(loss) - total / n_terms) < 1e-5


def test_dino_multicrop_compat_reference_pairing():
    """LstmDistillation.py:128-145: teacher chunked into ONE piece → student
    view 0 skipped, remaining views pair against the stacked teacher."""
    n_crops, B, D = 6, 2, 8
    s, t = _np(5, n_crops, B, D), _np(6, 2, B, D)
    center = _np(7, 1, D)
    loss, _ = dino_multicrop_loss(
        jnp.asarray(s), jnp.asarray(t), jnp.asarray(center),
        teacher_temp=0.04, compat_reference_pairing=True,
    )
    st = torch.from_numpy(s) / 0.1
    q = F.softmax((torch.from_numpy(t) - torch.from_numpy(center)) / 0.04, dim=-1)  # (2,B,D)
    total, n_terms = 0.0, 0
    for v in range(1, n_crops):
        total += torch.sum(-q * F.log_softmax(st[v].unsqueeze(0), dim=-1), dim=-1).mean().item()
        n_terms += 1
    assert abs(float(loss) - total / n_terms) < 1e-5


def test_update_center_under_pmean():
    """Center all_reduce semantics across a 4-device data mesh."""
    devs = jax.devices()[:4]
    t = _np(8, 4, 6, 16)  # (devices, B, D)
    center = np.zeros((1, 16), dtype=np.float32)

    def f(t_local):
        return update_center(jnp.asarray(center), t_local, axis_name="data")

    out = jax.pmap(f, axis_name="data", devices=devs)(jnp.asarray(t))
    want = center * 0.9 + t.reshape(-1, 16).mean(0, keepdims=True) * 0.1
    for d in range(4):
        np.testing.assert_allclose(np.asarray(out[d]), want, rtol=1e-5, atol=1e-6)


def test_feature_distribution_v1_matches_torch():
    s, t = _np(9, 8, 10), _np(10, 8, 10)
    labels = np.array([0, 1, 2, 3, 0, 1, 2, 3])
    pred = _np(11, 8, 5)
    T = 0.9
    got = float(
        feature_distribution_loss_v1(
            jnp.asarray(s), jnp.asarray(t), jnp.asarray(labels), jnp.asarray(pred),
            temperature=T, alpha=0.5, beta=0.5,
        )
    )
    tl = F.softmax(torch.from_numpy(t) / T, dim=-1)
    sl = F.softmax(torch.from_numpy(s) / T, dim=-1)
    want = (
        0.5 * F.cross_entropy(torch.from_numpy(pred), torch.from_numpy(labels))
        + 0.5 * F.cross_entropy(tl, sl)
    ).item()
    assert abs(got - want) < 1e-5


def test_feature_distribution_v2_matches_torch():
    s, t = _np(12, 8, 10), _np(13, 8, 10)
    got = float(feature_distribution_loss_v2(jnp.asarray(s), jnp.asarray(t)))
    ts, tt = torch.from_numpy(s), torch.from_numpy(t)
    mse = torch.nn.MSELoss()
    want = (
        0.4 * mse(ts.std(), tt.std()) + 0.4 * mse(ts.mean(), tt.mean()) + 0.2 * mse(ts, tt)
    ).item()
    assert abs(got - want) < 1e-5


def test_feature_distribution_v3_matches_torch():
    s, t = _np(14, 8, 10), _np(15, 8, 10)
    T = 2.0
    got = float(feature_distribution_loss_v3(jnp.asarray(s), jnp.asarray(t), T))
    soft_t = F.softmax(torch.from_numpy(t) / T, dim=-1)
    soft_p = F.log_softmax(torch.from_numpy(s) / T, dim=-1)
    want = (torch.sum(soft_t * (soft_t.log() - soft_p)) / 8 * (T**2)).item()
    assert abs(got - want) < 1e-4


def test_v3_finite_when_teacher_softmax_underflows():
    """torch's KLDiv treats 0·log 0 as 0; jnp 0·(−inf) is NaN — at DINO-scale
    temps an underflowed teacher softmax must not poison the loss. Pinned
    against torch on the same inputs (torch.log(0)=−inf but 0·−inf→xlogy 0
    in F.kl_div; the direct-formula reference uses softmax·log(softmax),
    which torch evaluates as 0·(−inf)=nan too — the reference only avoids it
    because its T warms up from 1.5; we clip like kd.py instead)."""
    t = np.zeros((4, 8), dtype=np.float32)
    t[:, 0] = 50.0  # (x − max)/T < −104 in f32 at T = 0.22 → exact-0 softmax
    s = _np(31, 4, 8)
    got = float(feature_distribution_loss_v3(jnp.asarray(s), jnp.asarray(t), 0.22))
    assert np.isfinite(got)
    # and the clip changes nothing when no class underflows
    t2, T2 = _np(32, 4, 8), 2.0
    got2 = float(feature_distribution_loss_v3(jnp.asarray(s), jnp.asarray(t2), T2))
    soft_t = F.softmax(torch.from_numpy(t2) / T2, dim=-1)
    soft_p = F.log_softmax(torch.from_numpy(s) / T2, dim=-1)
    want2 = (torch.sum(soft_t * (soft_t.log() - soft_p)) / 4 * (T2**2)).item()
    assert abs(got2 - want2) < 1e-4


def test_hinton_kd_matches_torch():
    s, t = _np(16, 8, 12), _np(17, 8, 12)
    labels = np.arange(8) % 12
    got = float(hinton_kd_loss(jnp.asarray(s), jnp.asarray(labels), jnp.asarray(t), 2.0, 0.5))
    want = (
        torch.nn.KLDivLoss()(
            F.log_softmax(torch.from_numpy(s) / 2.0, dim=1),
            F.softmax(torch.from_numpy(t) / 2.0, dim=1),
        )
        * (0.5 * 4.0)
        + F.cross_entropy(torch.from_numpy(s), torch.from_numpy(labels)) * 0.5
    ).item()
    assert abs(got - want) < 1e-5


def test_kl_kd_smooth_l1_matches_torch():
    s, t = _np(18, 8, 12), _np(19, 8, 12)
    got = float(kl_kd_smooth_l1_loss(jnp.asarray(s), jnp.asarray(t), 2.0, 0.3, 0.7))
    soft_t = F.softmax(torch.from_numpy(t) / 2.0, dim=-1)
    soft_p = F.log_softmax(torch.from_numpy(s) / 2.0, dim=-1)
    stl = torch.sum(soft_t * (soft_t.log() - soft_p)) / 8 * 4.0
    want = (0.3 * stl + 0.7 * F.smooth_l1_loss(torch.from_numpy(s), torch.from_numpy(t))).item()
    assert abs(got - want) < 1e-5


def test_cosine_loss_matches_torch():
    s, t = _np(20, 8, 12), _np(21, 8, 12)
    got = float(cosine_similarity_loss(jnp.asarray(s), jnp.asarray(t)))
    want = (1 - torch.nn.CosineSimilarity()(torch.from_numpy(s), torch.from_numpy(t)).mean()).item()
    assert abs(got - want) < 1e-5
    got_neg = float(cosine_similarity_loss(jnp.asarray(s), jnp.asarray(t), negative_form=True))
    assert abs(got_neg - (want - 1.0)) < 1e-5


def test_barlow_loss_matches_torch():
    z1, z2 = _np(22, 16, 8), _np(23, 16, 8)
    got = float(barlow_twins_loss(jnp.asarray(z1), jnp.asarray(z2), lambd=0.0051))
    bn = torch.nn.BatchNorm1d(8, affine=False)
    bn.train()
    c = bn(torch.from_numpy(z1)).T @ bn(torch.from_numpy(z2))
    c = c / 16
    on = torch.diagonal(c).add(-1).pow(2).sum()
    n = c.shape[0]
    off = c.flatten()[:-1].view(n - 1, n + 1)[:, 1:].pow(2).sum()
    want = (on + 0.0051 * off).item()
    assert abs(got - want) < 1e-3
