"""Pallas fused-LSTM kernel parity vs the lax.scan reference (interpreter
mode on CPU), including the custom VJP and batch tiling."""

import jax
import jax.numpy as jnp
import numpy as np

from cerebra.models.lstm import LSTMStack
from cerebra.models.pallas_lstm import lstm_scan_pallas


def _ref_scan(x_proj, w_hh):
    T, B, four_h = x_proj.shape
    H = four_h // 4

    def step(carry, xpt):
        h, c = carry
        gates = (xpt + h @ w_hh).astype(jnp.float32)
        i, f, g, o = jnp.split(gates, 4, -1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = (jax.nn.sigmoid(o) * jnp.tanh(c)).astype(x_proj.dtype)
        return (h, c), h

    (_, _), hs = jax.lax.scan(
        step, (jnp.zeros((B, H), x_proj.dtype), jnp.zeros((B, H))), x_proj
    )
    return hs


def _data(T=10, B=8, H=8, seed=0):
    rng = np.random.default_rng(seed)
    xp = jnp.asarray(rng.normal(size=(T, B, 4 * H)).astype(np.float32)) * 0.5
    whh = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32)) * 0.3
    return xp, whh


def test_forward_parity():
    xp, whh = _data()
    got = lstm_scan_pallas(xp, whh)
    want = _ref_scan(xp, whh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_vjp_parity():
    xp, whh = _data(seed=1)

    def loss_p(xp, whh):
        return jnp.sum(jnp.sin(lstm_scan_pallas(xp, whh)))

    def loss_r(xp, whh):
        return jnp.sum(jnp.sin(_ref_scan(xp, whh)))

    gp = jax.grad(loss_p, argnums=(0, 1))(xp, whh)
    gr = jax.grad(loss_r, argnums=(0, 1))(xp, whh)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]), atol=1e-5)


def test_batch_tiling_consistent():
    xp, whh = _data(T=6, B=8, H=8, seed=2)
    full = lstm_scan_pallas(xp, whh, 8)
    tiled = lstm_scan_pallas(xp, whh, 4)
    np.testing.assert_allclose(np.asarray(full), np.asarray(tiled), atol=1e-6)

    def loss(xp, whh, tile):
        return jnp.sum(lstm_scan_pallas(xp, whh, tile) ** 2)

    g_full = jax.grad(loss, argnums=(0, 1))(xp, whh, 8)
    g_tiled = jax.grad(loss, argnums=(0, 1))(xp, whh, 4)
    np.testing.assert_allclose(np.asarray(g_full[0]), np.asarray(g_tiled[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_full[1]), np.asarray(g_tiled[1]), atol=1e-5)


def test_lstmstack_pallas_path_matches_scan_path():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 12, 6)).astype(np.float32))
    scan_mod = LSTMStack(hidden_size=8, num_layers=2, use_pallas=False)
    params = scan_mod.init(jax.random.key(0), x)
    pallas_mod = LSTMStack(hidden_size=8, num_layers=2, use_pallas=True)
    a = scan_mod.apply(params, x)
    b = pallas_mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fir_filter_paths(rng):
    from cerebra.signal.filters import (
        design_bandpass,
        filtfilt_fft,
        filtfilt_fir,
        filtfilt_matmul,
        zero_phase_matrix,
    )

    spec = design_bandpass(14.0, 71.0, fs=1000.0, order=4)
    x = jnp.asarray(rng.normal(size=(3, 4, 512)).astype(np.float32))
    fir = np.asarray(filtfilt_fir(spec, x, num_taps=257))
    W = zero_phase_matrix(spec, 512, num_taps=257, dtype=jnp.float32)
    mm = np.asarray(filtfilt_matmul(W, x))
    np.testing.assert_allclose(fir, mm, rtol=1e-4, atol=1e-5)
    fft = np.asarray(filtfilt_fft(spec, x))
    # interior beyond one half-kernel of the edges
    np.testing.assert_allclose(fir[..., 160:-160], fft[..., 160:-160], rtol=0.05, atol=0.05)


def test_bf16_backward_accuracy():
    """bf16-mode backward (mixed-precision derivative algebra) stays close to
    the f32 path — the production kernel's 1.43x-faster branch."""
    rng = np.random.default_rng(5)
    T, B, H = 24, 8, 8
    xp32 = jnp.asarray(rng.normal(size=(T, B, 4 * H)).astype(np.float32)) * 0.3
    whh32 = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32)) * 0.3

    def loss(xp, whh):
        return jnp.sum(jnp.sin(lstm_scan_pallas(xp, whh)).astype(jnp.float32))

    g32 = jax.grad(loss, argnums=(0, 1))(xp32, whh32)
    gbf = jax.grad(loss, argnums=(0, 1))(
        xp32.astype(jnp.bfloat16), whh32.astype(jnp.bfloat16)
    )
    for a, b in zip(gbf, g32):
        a = np.asarray(a, dtype=np.float32).ravel()
        b = np.asarray(b, dtype=np.float32).ravel()
        cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.99, cos
