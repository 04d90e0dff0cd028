"""Parity of the fused multi-layer Pallas LSTM stack against the lax.scan
reference (the same oracle pinning cerebra.models.pallas_lstm): forward
values and ALL gradients (x, w_ih, w_hh, b per layer) must match, since the
backward re-derives dW/db in-kernel instead of via XLA contractions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerebra.models.pallas_lstm_stack import lstm_stack_pallas


def scan_reference(x, layers):
    """Time-major multi-layer LSTM via lax.scan (torch gate order)."""
    h_seq = x
    H = layers[0][1].shape[0]
    for w_ih, w_hh, b in layers:
        x_proj = h_seq @ w_ih + b

        def step(carry, xp, w_hh=w_hh):
            h, c = carry
            gates = xp + h @ w_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        B = x.shape[1]
        init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
        (_, _), h_seq = jax.lax.scan(step, init, x_proj)
    return h_seq


def make_case(T=6, B=8, C=5, H=4, L=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(T, B, C)).astype(np.float32))
    layers = []
    for l in range(L):
        in_dim = C if l == 0 else H
        layers.append(
            (
                jnp.asarray(rng.normal(size=(in_dim, 4 * H)).astype(np.float32)) * 0.4,
                jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32)) * 0.4,
                jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32)) * 0.1,
            )
        )
    return x, tuple(layers)


@pytest.mark.parametrize("L", [1, 2, 3])
def test_forward_matches_scan(L):
    x, layers = make_case(L=L)
    got = lstm_stack_pallas(x, layers)
    want = scan_reference(x, layers)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("L", [1, 2, 3])
def test_grads_match_scan(L):
    x, layers = make_case(T=5, B=8, C=5, H=4, L=L, seed=1)
    # weight the output so every (t, b, h) position carries distinct signal
    rng = np.random.default_rng(7)
    w_out = jnp.asarray(rng.normal(size=(5, 8, 4)).astype(np.float32))

    def loss_pallas(x, layers):
        return jnp.sum(lstm_stack_pallas(x, layers) * w_out)

    def loss_scan(x, layers):
        return jnp.sum(scan_reference(x, layers) * w_out)

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1))(x, layers)
    g_scan = jax.grad(loss_scan, argnums=(0, 1))(x, layers)
    flat_p, _ = jax.tree.flatten(g_pallas)
    flat_s, _ = jax.tree.flatten(g_scan)
    assert len(flat_p) == len(flat_s) == 1 + 3 * L
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("L", [1, 2, 3])
def test_recompute_backward_grads_match_scan(L):
    """The recompute variant (stores h/c only, re-derives gates in the
    backward) must produce the same forward and the same x/w_ih/w_hh/b
    gradients as the scan reference."""
    from cerebra.models.pallas_lstm_stack import lstm_stack_pallas_rc

    x, layers = make_case(T=5, B=8, C=5, H=4, L=L, seed=3)
    rng = np.random.default_rng(9)
    w_out = jnp.asarray(rng.normal(size=(5, 8, 4)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(lstm_stack_pallas_rc(x, layers)),
        np.asarray(scan_reference(x, layers)), atol=1e-5, rtol=1e-5,
    )
    g_rc = jax.grad(lambda x, l: jnp.sum(lstm_stack_pallas_rc(x, l) * w_out),
                    argnums=(0, 1))(x, layers)
    g_scan = jax.grad(lambda x, l: jnp.sum(scan_reference(x, l) * w_out),
                      argnums=(0, 1))(x, layers)
    for a, b in zip(jax.tree.leaves(g_rc), jax.tree.leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)


def test_last_step_grad_only():
    """The recipes' real cotangent shape: upstream grad only on h[-1]."""
    x, layers = make_case(T=6, B=8, C=5, H=4, L=2, seed=3)

    def head(fn):
        def loss(x, layers):
            return jnp.sum(fn(x, layers)[-1] ** 2)
        return loss

    g_p = jax.grad(head(lstm_stack_pallas), argnums=(0, 1))(x, layers)
    g_s = jax.grad(head(scan_reference), argnums=(0, 1))(x, layers)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("L", [1, 2])
@pytest.mark.slow
def test_lane_padding_parity(L):
    """Padded-H kernel (H=5 → Hp=8) matches the unpadded scan exactly."""
    from cerebra.models.pallas_lstm_stack import lstm_stack

    x, layers = make_case(T=5, B=8, C=5, H=5, L=L, seed=11)
    got = lstm_stack(x, layers, pad_lanes=8)
    want = scan_reference(x, layers)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)

    def loss_p(x, layers):
        return jnp.sum(lstm_stack(x, layers, pad_lanes=8)[-1] ** 2)

    def loss_s(x, layers):
        return jnp.sum(scan_reference(x, layers)[-1] ** 2)

    g_p = jax.grad(loss_p, argnums=(0, 1))(x, layers)
    g_s = jax.grad(loss_s, argnums=(0, 1))(x, layers)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)


def test_lane_padding_forward_default():
    """Cheap default-set guard for the padded path (full fwd+grad parity is
    in the slow set): forward values through the lane-pad wrapper."""
    from cerebra.models.pallas_lstm_stack import lstm_stack

    x, layers = make_case(T=4, B=8, C=5, H=5, L=1, seed=12)
    got = lstm_stack(x, layers, pad_lanes=8)
    want = scan_reference(x, layers)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_pick_tile_partial_tiles_are_sublane_aligned():
    """A 400-row eval batch once picked tile=100 (divides B, not 8-aligned)
    and failed Mosaic lowering on hardware — partial tiles must be %8==0."""
    from cerebra.models import pallas_lstm_stack as mod

    for B in [400, 1600, 1024, 2000, 96]:
        tile = mod._pick_tile(B, 128, 4, 4)
        assert B % tile == 0
        assert tile == B or tile % 8 == 0, (B, tile)


def test_batch_padding_parity(monkeypatch):
    """When B has no 8-aligned divisor under the VMEM cap, lstm_stack pads
    the batch with zero rows and crops; values and grads match the scan."""
    from cerebra.models import pallas_lstm_stack as mod
    from cerebra.models.pallas_lstm_stack import lstm_stack

    x, layers = make_case(T=5, B=29, C=5, H=8, L=2, seed=3)
    # shrink the VMEM budget so cap ≈ 8 < 29; 29 (prime) has no aligned divisor
    per_row = 8 * 2 * 8 + 2 * (16 * 8 * 2 + 4 * 8) * 4
    monkeypatch.setattr(mod, "_VMEM_BUDGET", 8 * per_row)
    cap = mod._tile_cap(8, 2, 4)
    assert cap < 29
    assert mod._padded_batch(29, 8, 2, 4) > 29  # padding engages

    got = lstm_stack(x, layers, pad_lanes=1)
    want = scan_reference(x, layers)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)

    def loss_pallas(x, layers):
        return jnp.sum(lstm_stack(x, layers, pad_lanes=1)[-1] ** 2)

    def loss_scan(x, layers):
        return jnp.sum(scan_reference(x, layers)[-1] ** 2)

    gx, gl = jax.grad(loss_pallas, argnums=(0, 1))(x, layers)
    wx, wl = jax.grad(loss_scan, argnums=(0, 1))(x, layers)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), atol=1e-4, rtol=1e-4)
    for (a, b, c), (d, e, f) in zip(gl, wl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(d), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(b), np.asarray(e), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(c), np.asarray(f), atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_random_shape_sweep_matches_scan():
    """Randomized (T, B, C, H, L) sweep incl. odd/unaligned sizes: forward
    and weight-gradient parity with the scan reference — insurance against
    shape-specific indexing bugs in the fused kernel (its historical failure
    class; values in interpret mode, alignment guarded by _pick_tile tests)."""
    from cerebra.models.pallas_lstm_stack import lstm_stack

    rng = np.random.default_rng(42)
    for trial in range(6):
        T = int(rng.integers(2, 9))
        B = int(rng.integers(1, 20))
        C = int(rng.integers(1, 9))
        H = int(rng.integers(1, 11))
        L = int(rng.integers(1, 4))
        x, layers = make_case(T=T, B=B, C=C, H=H, L=L, seed=100 + trial)
        got = lstm_stack(x, layers, pad_lanes=8 if trial % 2 else 1)
        want = scan_reference(x, layers)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5,
            err_msg=f"fwd trial {trial}: T={T} B={B} C={C} H={H} L={L}",
        )

        gl = jax.grad(lambda ll: jnp.sum(lstm_stack(x, ll, pad_lanes=1)[-1] ** 2))(layers)
        wl = jax.grad(lambda ll: jnp.sum(scan_reference(x, ll)[-1] ** 2))(layers)
        for (a, b, c), (d, e, f) in zip(gl, wl):
            for g1, g2 in ((a, d), (b, e), (c, f)):
                np.testing.assert_allclose(
                    np.asarray(g1), np.asarray(g2), atol=2e-4, rtol=2e-4,
                    err_msg=f"grad trial {trial}: T={T} B={B} C={C} H={H} L={L}",
                )


@pytest.mark.parametrize("L", [1, 2])
def test_input_grad_false_matches_weight_grads(L):
    """The dx-skipping backward (input_grad=False — every training recipe:
    the EEG input is data, so its cotangent is dead) must produce weight/bias
    gradients identical to the full backward, return a ZERO x-cotangent, and
    an unchanged forward."""
    from cerebra.models.pallas_lstm_stack import lstm_stack_pallas_ndx

    x, layers = make_case(T=5, B=8, C=5, H=4, L=L, seed=7)

    def loss_full(x, layers):
        return jnp.sum(lstm_stack_pallas(x, layers) ** 2)

    def loss_ndx(x, layers):
        return jnp.sum(lstm_stack_pallas_ndx(x, layers) ** 2)

    np.testing.assert_array_equal(
        np.asarray(lstm_stack_pallas_ndx(x, layers)),
        np.asarray(lstm_stack_pallas(x, layers)),
    )
    (dx_f, dl_f) = jax.grad(loss_full, argnums=(0, 1))(x, layers)
    (dx_n, dl_n) = jax.grad(loss_ndx, argnums=(0, 1))(x, layers)
    np.testing.assert_array_equal(np.asarray(dx_n), 0.0)
    assert float(jnp.abs(dx_f).max()) > 0  # the full variant's dx is real
    for (a_ih, a_hh, a_b), (b_ih, b_hh, b_b) in zip(dl_f, dl_n):
        np.testing.assert_array_equal(np.asarray(a_ih), np.asarray(b_ih))
        np.testing.assert_array_equal(np.asarray(a_hh), np.asarray(b_hh))
        np.testing.assert_array_equal(np.asarray(a_b), np.asarray(b_b))


def test_stack_module_input_grad_wiring():
    """LSTMStack(input_grad=False) on the PALLAS path (forced, interpret
    mode) trains identically to input_grad=True — proves the flag reaches
    the kernel and changes nothing but the dead dx."""
    from cerebra.models.lstm import LSTMStack

    rng = np.random.default_rng(3)
    eeg = jnp.asarray(rng.normal(size=(4, 12, 6)).astype(np.float32))
    m_full = LSTMStack(hidden_size=8, num_layers=2, use_pallas=True)
    m_ndx = LSTMStack(hidden_size=8, num_layers=2, use_pallas=True, input_grad=False)
    params = m_full.init(jax.random.key(0), eeg)["params"]

    def loss(m, p):
        return jnp.sum(m.apply({"params": p}, eeg) ** 2)

    g_full = jax.grad(lambda p: loss(m_full, p))(params)
    g_ndx = jax.grad(lambda p: loss(m_ndx, p))(params)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_ndx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.parametrize("input_grad", [True, False])
def test_last_state_variant_matches_scan(input_grad):
    """lstm_stack_last (the h[-1]-only fwd kernel + (B,H)-cotangent
    backward) must match the scan reference's values and weight grads; with
    input_grad=True its dx must match too."""
    from cerebra.models.pallas_lstm_stack import lstm_stack_last

    x, layers = make_case(T=6, B=8, C=5, H=4, L=2, seed=9)

    def loss_last(x, layers):
        return jnp.sum(lstm_stack_last(x, layers, pad_lanes=1, input_grad=input_grad) ** 2)

    def loss_scan(x, layers):
        return jnp.sum(scan_reference(x, layers)[-1] ** 2)

    np.testing.assert_allclose(
        np.asarray(lstm_stack_last(x, layers, pad_lanes=1)),
        np.asarray(scan_reference(x, layers)[-1]),
        atol=1e-6, rtol=1e-6,
    )
    (dx_p, dl_p) = jax.grad(loss_last, argnums=(0, 1))(x, layers)
    (dx_s, dl_s) = jax.grad(loss_scan, argnums=(0, 1))(x, layers)
    if input_grad:
        np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_s), atol=2e-5, rtol=2e-4)
    else:
        np.testing.assert_array_equal(np.asarray(dx_p), 0.0)
    for a, b in zip(jax.tree.leaves(dl_p), jax.tree.leaves(dl_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)


def test_last_state_variant_lane_and_batch_padding():
    """Padded-H (5→8) + padded-B path of the last-state kernel."""
    from cerebra.models.pallas_lstm_stack import lstm_stack_last

    x, layers = make_case(T=5, B=12, C=5, H=5, L=2, seed=13)

    got = lstm_stack_last(x, layers, pad_lanes=8)
    want = scan_reference(x, layers)[-1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)

    def loss_last(layers):
        return jnp.sum(lstm_stack_last(x, layers, pad_lanes=8, input_grad=False) ** 2)

    def loss_scan(layers):
        return jnp.sum(scan_reference(x, layers)[-1] ** 2)

    for a, b in zip(
        jax.tree.leaves(jax.grad(loss_last)(layers)),
        jax.tree.leaves(jax.grad(loss_scan)(layers)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)


def test_lstmstack_last_state_only_module():
    """LSTMStack(last_state_only=True) equals the sequence module's h[-1]
    on both the scan path and the forced-pallas path."""
    from cerebra.models.lstm import LSTMStack

    rng = np.random.default_rng(21)
    eeg = jnp.asarray(rng.normal(size=(4, 10, 6)).astype(np.float32))
    seq = LSTMStack(hidden_size=8, num_layers=2)
    params = seq.init(jax.random.key(0), eeg)["params"]
    want = seq.apply({"params": params}, eeg)[:, -1, :]
    for pallas in (False, True):
        last = LSTMStack(hidden_size=8, num_layers=2, use_pallas=pallas,
                         last_state_only=True)
        got = last.apply({"params": params}, eeg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)
