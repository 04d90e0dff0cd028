"""Parity oracles: run the REFERENCE's own infra functions (mounted read-only
at /root/reference) against ours — schedules, per-param clipping, LARS — so
behavioral claims are pinned to the actual reference code, not to our reading
of it."""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_utils():
    sys.path.insert(0, REFERENCE)
    try:
        from utils import utils as ref  # noqa: PLC0415
    except Exception as e:
        pytest.skip(f"reference utils not importable: {e}")
    finally:
        sys.path.remove(REFERENCE)
    return ref


def test_cosine_scheduler_matches_reference(ref_utils):
    from cerebra.train.schedules import cosine_scheduler

    for kwargs in (
        dict(base_value=0.5, final_value=1e-6, epochs=10, niter_per_ep=7, warmup_epochs=2),
        dict(base_value=0.996, final_value=1.0, epochs=5, niter_per_ep=13),
        dict(base_value=0.04, final_value=0.4, epochs=3, niter_per_ep=20),
    ):
        ours = cosine_scheduler(**kwargs)
        theirs = ref_utils.cosine_scheduler(**kwargs)
        np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_per_param_clip_matches_reference(ref_utils):
    """clip_gradients (utils/utils.py:132-141) vs our per_param_clip optax
    transform — same per-parameter norms after clipping."""
    import torch

    import jax.numpy as jnp

    from cerebra.train.optim import per_param_clip

    rng = np.random.default_rng(0)
    shapes = [(4, 6), (10,), (3, 3, 3)]
    grads_np = [rng.normal(scale=3.0, size=s).astype(np.float32) for s in shapes]

    # reference path: torch params with .grad, clip in place
    model = torch.nn.ParameterList(
        [torch.nn.Parameter(torch.zeros(s)) for s in shapes]
    )
    for p, g in zip(model, grads_np):
        p.grad = torch.from_numpy(g.copy())
    ref_utils.clip_gradients(model, clip=2.0)
    ref_clipped = [p.grad.numpy() for p in model]

    tx = per_param_clip(2.0)
    ours, _ = tx.update([jnp.asarray(g) for g in grads_np], tx.init(None))
    for a, b in zip(ours, ref_clipped):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-5, atol=1e-6)


def test_lars_matches_reference_single_step(ref_utils):
    """One LARS step, reference implementation (utils/utils.py:557-595,
    momentum 0.9, eta 0.001) vs optax.lars configured the same way."""
    import torch

    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(1)
    w_np = rng.normal(size=(8, 4)).astype(np.float32)
    g_np = rng.normal(size=(8, 4)).astype(np.float32)
    lr, wd = 0.1, 0.01

    p = torch.nn.Parameter(torch.from_numpy(w_np.copy()))
    opt = ref_utils.LARS([p], lr=lr, weight_decay=wd, momentum=0.9, eta=0.001)
    p.grad = torch.from_numpy(g_np.copy())
    opt.step()
    ref_w = p.detach().numpy()

    tx = optax.lars(
        learning_rate=lr, weight_decay=wd, momentum=0.9, trust_coefficient=0.001,
        nesterov=False,
    )
    params = {"w": jnp.asarray(w_np)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g_np)}, state, params)
    ours_w = np.asarray(optax.apply_updates(params, updates)["w"])
    np.testing.assert_allclose(ours_w, ref_w, rtol=1e-4, atol=1e-6)


def test_compute_ap_map_match_reference(ref_utils):
    """compute_ap/compute_map pinned to the reference's own implementations
    (utils/utils.py:712-816) on randomized retrieval problems incl. junk
    lists and empty-gnd queries."""
    from cerebra.eval.metrics import compute_ap, compute_map

    rng = np.random.default_rng(7)
    for trial in range(5):
        n_db, n_q = 30, 6
        ranks = np.stack([rng.permutation(n_db) for _ in range(n_q)], axis=1)
        gnd = []
        for qi in range(n_q):
            n_ok = rng.integers(0, 8)
            pool = rng.permutation(n_db)
            gnd.append({
                "ok": np.asarray(pool[:n_ok]),
                "junk": np.asarray(pool[n_ok : n_ok + rng.integers(0, 5)]),
            })
        kappas = [1, 5, 10]
        ours = compute_map(ranks, gnd, kappas)
        theirs = ref_utils.compute_map(ranks, [dict(g) for g in gnd], kappas)
        np.testing.assert_allclose(ours[0], theirs[0], rtol=1e-12, err_msg=f"trial {trial}")
        np.testing.assert_allclose(ours[1], theirs[1], rtol=1e-12)
        np.testing.assert_allclose(ours[2], theirs[2], rtol=1e-12)
        np.testing.assert_allclose(ours[3], theirs[3], rtol=1e-12)

    for nres in (1, 3, 7):
        ranks1 = np.sort(rng.choice(20, size=4, replace=False))
        np.testing.assert_allclose(
            compute_ap(ranks1, nres), ref_utils.compute_ap(ranks1, nres), rtol=1e-12
        )


def test_pca_whitening_matches_reference(ref_utils):
    """PCA + whitening pinned to the reference class (utils/utils.py:658-709):
    same covariance in, same whitened projection out (numpy path)."""
    from cerebra.eval.metrics import PCA

    rng = np.random.default_rng(11)
    feats = rng.normal(size=(40, 16)).astype(np.float64)
    cov = np.cov(feats, rowvar=False)
    x = rng.normal(size=(5, 16)).astype(np.float64)

    ref_pca = ref_utils.PCA(dim=8, whit=0.5)
    ref_pca.train_pca(cov.copy())
    want = ref_pca.apply(x.copy())

    ours = PCA(dim=8, whit=0.5)
    ours.train_pca(cov.copy())
    got = ours.apply(x.copy())
    # eigh eigenvector signs are arbitrary but deterministic for the same
    # LAPACK — both run the same numpy, so exact comparison holds
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_accuracy_matches_reference(ref_utils):
    """top-k accuracy pinned to utils/utils.py:506-513."""
    import torch

    from cerebra.eval.metrics import accuracy

    rng = np.random.default_rng(3)
    logits = rng.normal(size=(32, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=32)
    want = ref_utils.accuracy(
        torch.from_numpy(logits), torch.from_numpy(labels), topk=(1, 3, 5)
    )
    got = accuracy(logits, labels, topk=(1, 3, 5))
    for g, w in zip(got, want):
        np.testing.assert_allclose(float(g), float(w), rtol=1e-6)


def test_smoothed_value_matches_reference(ref_utils):
    """SmoothedValue windowed median/avg/global_avg/max pinned to
    utils/utils.py:224-283 on a shared random update stream."""
    from cerebra.utils.logging import SmoothedValue

    rng = np.random.default_rng(5)
    ref = ref_utils.SmoothedValue(window_size=7)
    ours = SmoothedValue(window_size=7)
    for _ in range(25):
        v = float(rng.normal())
        n = int(rng.integers(1, 4))
        ref.update(v, n=n)
        ours.update(v, n=n)
    np.testing.assert_allclose(ours.median, ref.median, rtol=1e-6)
    np.testing.assert_allclose(ours.avg, ref.avg, rtol=1e-6)
    np.testing.assert_allclose(ours.global_avg, ref.global_avg, rtol=1e-6)
    np.testing.assert_allclose(ours.max, ref.max, rtol=1e-6)
    np.testing.assert_allclose(ours.value, ref.value, rtol=1e-6)


def test_multi_scale_matches_reference(ref_utils):
    """multi_scale pinned to utils/utils.py:819-833 with a shared linear
    probe model — also pins jax.image.resize(bilinear, half-pixel) against
    torch F.interpolate(align_corners=False) at the 1/√2 and 1/2 scales."""
    import torch

    from cerebra.eval.metrics import multi_scale

    rng = np.random.default_rng(9)
    img = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)  # NCHW
    proj = rng.normal(size=(3, 5)).astype(np.float32)

    def torch_model(x):  # (B,C,H,W) -> (B,5): spatial mean then projection
        return x.mean(dim=(2, 3)) @ torch.from_numpy(proj)

    want = ref_utils.multi_scale(torch.from_numpy(img), torch_model).numpy()

    import jax.numpy as jnp

    def jax_model(x):  # NHWC
        return x.mean(axis=(1, 2)) @ jnp.asarray(proj)

    got = np.asarray(multi_scale(jnp.asarray(img.transpose(0, 2, 3, 1)), jax_model))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tile_eeg_to_image_matches_reference(monkeypatch):
    """resizeEEGToImageSize pinned to the reference's own method
    (utils/EEGDataset.py:248-303): same repeat/crop/3-channel algebra. The
    only randomness is the column-window start — we compute ours, then pin
    the reference's np.random.randint to the same value."""
    import types

    import jax
    import jax.numpy as jnp

    from cerebra.signal.windows import tile_eeg_to_image

    sys.path.insert(0, REFERENCE)
    try:
        from cerebra.eval import faiss_stub
        from tests._reference_stubs import stub_torchvision

        faiss_stub.install()  # the reference module imports faiss at top level
        stub_torchvision()
        from utils.EEGDataset import EEGDataset
    except Exception as e:
        pytest.skip(f"reference EEGDataset not importable: {e}")
    finally:
        sys.path.remove(REFERENCE)

    rng = np.random.default_rng(13)
    C, T, size = 5, 9, 16
    eeg = rng.normal(size=(C, T)).astype(np.float32)

    key = jax.random.key(4)
    ours = np.asarray(tile_eeg_to_image(key, jnp.asarray(eeg), size=size))

    # recover the start our key produced (same derivation as the function)
    reps_c = size // T + 1
    width = T * reps_c
    start = int(jax.random.randint(key, (), 0, max(width - size, 1)))
    monkeypatch.setattr(np.random, "randint", lambda lo, hi: start)

    self = types.SimpleNamespace(isDataTransformed=True)
    want = EEGDataset.resizeEEGToImageSize(self, input_data=eeg, imageShape=(size, size))
    np.testing.assert_allclose(ours, want, rtol=1e-6)


def test_conformer_interaug_matches_reference(monkeypatch):
    """S&R augmentation pinned to the reference's own ExP.interaug triple
    loop (utils/Conformer.py:254-281): our vectorized diagonal gather must
    reproduce it exactly when fed the same random draws. The reference draws
    an 8-vector per (trial, segment) and uses only element [rj] (its own
    quirk) — we script np.random.randint to emit vectors whose [rj] is our
    jax-sampled index, and np.random.permutation to our shuffle."""
    import types

    import jax
    import jax.numpy as jnp
    import torch

    from cerebra.train.conformer_recipe import make_interaug

    sys.path.insert(0, REFERENCE)
    try:
        from tests._reference_stubs import stub_torchvision

        stub_torchvision()
        if "torchsummary" not in sys.modules:  # reference imports it at top
            mod = types.ModuleType("torchsummary")
            mod.summary = lambda *a, **k: None
            sys.modules["torchsummary"] = mod
        from utils.Conformer import ExP
    except Exception as e:
        pytest.skip(f"reference Conformer not importable: {e}")
    finally:
        sys.path.remove(REFERENCE)

    rng = np.random.default_rng(17)
    n_per_class, n_classes, C, T = 6, 4, 22, 1000  # reference hardcodes 22x1000/8
    N = n_per_class * n_classes
    data = rng.normal(size=(N, 1, C, T)).astype(np.float64)
    labels0 = np.repeat(np.arange(n_classes), n_per_class)  # ours: 0-based, sorted
    batch_size = 16  # → 4 aug outputs per class

    ours_fn = make_interaug(data.astype(np.float32), labels0, n_classes,
                            batch_size // n_classes, n_segments=8)
    key = jax.random.key(21)
    ours_x, ours_y = ours_fn(key)

    # reproduce our index draws exactly as make_interaug does
    k_idx, k_shuf = jax.random.split(key)
    counts = np.full((n_classes,), n_per_class)
    idx = np.asarray(jax.random.randint(
        k_idx, (n_classes, batch_size // n_classes, 8), 0,
        jnp.asarray(counts)[:, None, None]))
    perm = np.asarray(jax.random.permutation(k_shuf, n_classes * (batch_size // n_classes)))

    draws = iter(
        np.asarray([idx[cls, ri, rj]] * 8)
        for cls in range(n_classes)
        for ri in range(batch_size // n_classes)
        for rj in range(8)
    )
    monkeypatch.setattr(np.random, "randint", lambda lo, hi, size: next(draws))
    monkeypatch.setattr(np.random, "permutation", lambda n: perm)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self: self, raising=False)

    self = types.SimpleNamespace(batch_size=batch_size)
    want_x, want_y = ExP.interaug(self, data, labels0 + 1)  # reference: 1-based labels
    np.testing.assert_allclose(np.asarray(ours_x), want_x.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours_y), want_y.numpy())


@pytest.fixture(scope="module")
def ref_perils():
    from tests._reference_stubs import stub_torchvision

    stub_torchvision()
    sys.path.insert(0, REFERENCE)
    try:
        from utils.PerilsEEGDataset import EEGDataset as RefPerils  # noqa: PLC0415
    except Exception as e:
        pytest.skip(f"reference PerilsEEGDataset not importable: {e}")
    finally:
        sys.path.remove(REFERENCE)
    return RefPerils


def test_three_view_stack_matches_reference_aliasing(ref_perils):
    """Execute the reference's data_augment_eeg block verbatim
    (utils/PerilsEEGDataset.py:575-587) with its own normlizeEEG
    (utils/PerilsEEGDataset.py:454-461): `channel_norm_eeg = eeg` is an
    ALIAS and normlizeEEG writes EEG[:, ch] in place, so the produced stack
    is (chnorm, chnorm, z2(chnorm)). Pins both (a) that 32 sequential
    with-replacement normlizeEEG calls equal our one-shot masked
    unique-set channel norm and (b) three_view_augment's aliased layout."""
    import torch

    import jax.numpy as jnp

    from cerebra.signal.norm import channel_wise_norm, z2_score_norm

    rng = np.random.default_rng(7)
    x = rng.normal(scale=2.0, size=(60, 8)).astype(np.float32)  # one (T, C) trial
    draws = rng.integers(0, 8, size=32)  # with replacement, like np.random.randint

    # --- reference path, lines re-enacted with the reference's own method
    eeg = torch.from_numpy(x.copy())
    channel_norm_eeg = eeg  # the alias (PerilsEEGDataset.py:576)
    for ch in draws:
        channel_norm_eeg = ref_perils.normlizeEEG(
            None, channel_norm_eeg, ch_index=int(ch)
        )
    z2Scoring = eeg
    fmean = z2Scoring.mean()
    fstd = z2Scoring.std()
    z2Scoring = (z2Scoring - fmean) / fstd
    ref_stack = torch.stack((eeg, channel_norm_eeg, z2Scoring)).numpy()

    # --- ours: masked unique-set channel norm, aliased (v, v, z2(v)) stack
    mask = np.zeros(8, dtype=bool)
    mask[np.unique(draws)] = True
    xj = jnp.asarray(x)
    v = jnp.where(jnp.asarray(mask)[None, :], channel_wise_norm(xj), xj)
    ours = jnp.stack([v, v, z2_score_norm(v)])
    np.testing.assert_allclose(np.asarray(ours), ref_stack, rtol=5e-4, atol=5e-4)
