"""Kernel lab: isolated timings of LSTM-recurrence variants on the real TPU.

Timing discipline (axon platform): block_until_ready is unreliable — every
measurement differences two loop counts, each ended with a float() host sync.
Run SOLO on the chip (concurrent runs depress numbers ~20%).

Usage: python benchmarks/kernel_lab.py [exp1 exp2 ...]
Experiments: baseline fwdonly vpu fused
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, T, H = 1024, 460, 96


def timeit(fn, *args, n_small=None, n_large=None):
    """Differenced timing: (time of N reps) − (time of n reps) cancels the
    tunnel's fixed sync cost. The rep gap must dwarf tunnel jitter (several
    ms) or sub-ms kernels come out negative — size it so the differenced
    window is ≥ ~100 ms of device time."""
    for _ in range(2):
        out = fn(*args)
    _sync(out)
    if n_small is None:
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args)
        _sync(out)
        probe = max((time.perf_counter() - t0) / 3, 1e-5)
        gap = max(int(0.1 / probe), 10)
        n_small, n_large = 3, 3 + gap
    t0 = time.perf_counter()
    for _ in range(n_small):
        out = fn(*args)
    _sync(out)
    d_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_large):
        out = fn(*args)
    _sync(out)
    d_large = time.perf_counter() - t0
    return (d_large - d_small) / (n_large - n_small)


def _sync(out):
    # fetch the LAST element of the LAST leaf: on the tunneled axon platform
    # a leading element can be served once its block is written, before the
    # computation finishes (block_until_ready is likewise unreliable) — for
    # time-major streams only the final row proves the whole run completed
    leaf = jax.tree.leaves(out)[-1]
    _ = float(leaf.reshape(-1)[-1])


def exp_baseline():
    """Current kernel: fwd-only vs fwd+bwd, f32 vs bf16 stream."""
    from cerebra.models.pallas_lstm import lstm_scan_pallas

    rng = np.random.default_rng(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        x_proj = jnp.asarray(rng.normal(size=(T, B, 4 * H)) * 0.1, dtype=dtype)
        w_hh = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.1, dtype=dtype)

        fwd = jax.jit(lambda xp, w: lstm_scan_pallas(xp, w))
        dt = timeit(fwd, x_proj, w_hh)
        print(f"[baseline] fwd-only {dtype.__name__}: {dt*1e3:.3f} ms "
              f"({dt/T*1e6:.2f} us/step) -> {B/dt:.0f} w/s", flush=True)

        loss = jax.jit(jax.grad(lambda xp, w: lstm_scan_pallas(xp, w).sum(), argnums=(0, 1)))
        dt = timeit(loss, x_proj, w_hh)
        print(f"[baseline] fwd+bwd {dtype.__name__}: {dt*1e3:.3f} ms "
              f"({dt/T*1e6:.2f} us/step) -> {B/dt:.0f} w/s", flush=True)


def exp_vpu():
    """VPU rate probe: one elementwise pass over (B, 4H) f32 vs bf16 inside
    a trivial pallas kernel with a T-step sequential grid (mimics the
    recurrence's access pattern without matmuls)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make(dtype, n_ops):
        def kernel(x_ref, o_ref):
            x = x_ref[0]
            acc = x
            for _ in range(n_ops):
                acc = acc * x + x
            o_ref[0] = acc

        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(T,),
                in_specs=[pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((T, B, 4 * H), dtype),
            )(x)

        return jax.jit(run)

    rng = np.random.default_rng(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(size=(T, B, 4 * H)) * 0.1, dtype=dtype)
        for n_ops in (4, 16):
            dt = timeit(make(dtype, n_ops), x)
            per_step = dt / T * 1e6
            print(f"[vpu] {dtype.__name__} n_ops={n_ops}: {dt*1e3:.3f} ms "
                  f"({per_step:.2f} us/step)", flush=True)

    # transcendental probe: tanh f32 vs sigmoid f32 on (B, 4H)
    def make_tr(dtype, fn_name):
        fn = {"tanh": jnp.tanh, "sigmoid": jax.nn.sigmoid, "exp": jnp.exp}[fn_name]

        def kernel(x_ref, o_ref):
            o_ref[0] = fn(x_ref[0])

        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(T,),
                in_specs=[pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((T, B, 4 * H), dtype),
            )(x)

        return jax.jit(run)

    for fn_name in ("tanh", "sigmoid", "exp"):
        x = jnp.asarray(rng.normal(size=(T, B, 4 * H)) * 0.1, dtype=jnp.float32)
        dt = timeit(make_tr(jnp.float32, fn_name), x)
        print(f"[vpu] {fn_name} f32 (B,4H): {dt*1e3:.3f} ms ({dt/T*1e6:.2f} us/step)",
              flush=True)


def exp_grid():
    """Grid-overhead probe: same total work, T vs T/2 grid steps (2 rows per
    step) — measures the fixed per-grid-step cost."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make(rows_per_step):
        n_steps = T // rows_per_step

        def kernel(x_ref, o_ref):
            x = x_ref[:]
            o_ref[:] = jnp.tanh(x)

        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(n_steps,),
                in_specs=[pl.BlockSpec((rows_per_step, B, 4 * H), lambda t: (t, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows_per_step, B, 4 * H), lambda t: (t, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32),
            )(x)

        return jax.jit(run)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, B, 4 * H)) * 0.1, dtype=jnp.float32)
    for rows in (1, 2, 4):
        if T % rows:
            continue
        dt = timeit(make(rows), x)
        print(f"[grid] rows/step={rows}: {dt*1e3:.3f} ms "
              f"({dt/(T//rows)*1e6:.2f} us/grid-step)", flush=True)


EXPS = {"baseline": exp_baseline, "vpu": exp_vpu, "grid": exp_grid}




def device_loop_time(fn, *args, n=64):
    """Time `fn(*args)` by running it n times INSIDE one jit via fori_loop —
    sub-ms ops cannot be timed per-dispatch through the tunnel (the
    dispatch floor is ~1.4 ms/call). The first input is perturbed by the
    loop index so LICM can't hoist the op, and the scalar carry depends on
    every iteration's output so nothing is dead-code-eliminated. All
    operands are jit ARGUMENTS (closures would bake them into the HLO
    upload — a 482 MB operand once blew the remote-compile body limit)."""

    @jax.jit
    def reps(*args):
        def body(i, acc):
            out = fn(args[0] + (i * 1e-12).astype(args[0].dtype), *args[1:])
            return acc + jax.tree.leaves(out)[-1].reshape(-1)[-1].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    dt = timeit(reps, *args)
    return dt / n


def exp_parts():
    """Non-LSTM components of the bench step: filter matmul f32 vs bf16,
    x_proj matmul + dW_ih einsum — timed with on-device repeat loops."""
    from cerebra.signal.filters import design_bandpass, zero_phase_matrix

    rng = np.random.default_rng(0)
    C, T_RAW = 96, 512
    spec = design_bandpass(14.0, 71.0, fs=1000.0, order=4)
    raw = jnp.asarray(rng.normal(size=(B, C, T_RAW)).astype(np.float32))
    raw_bf16 = raw.astype(jnp.bfloat16)
    for dtype in (jnp.float32, jnp.bfloat16):
        W = zero_phase_matrix(spec, T_RAW, num_taps=257, dtype=dtype)
        dt = device_loop_time(
            lambda x, W: jnp.dot(x.astype(W.dtype), W, preferred_element_type=jnp.float32),
            raw, W,
        )
        print(f"[parts] filter matmul {dtype.__name__}: {dt*1e3:.3f} ms", flush=True)
    # io-dtype variants: the LSTM consumes bf16, so the f32 output (201 MB)
    # and f32 raw input are pure bandwidth waste
    Wb = zero_phase_matrix(spec, T_RAW, num_taps=257, dtype=jnp.bfloat16)
    dt = device_loop_time(
        lambda x, W: jnp.dot(x.astype(W.dtype), W).astype(jnp.bfloat16), raw, Wb)
    print(f"[parts] filter f32 in / bf16 out: {dt*1e3:.3f} ms", flush=True)
    dt = device_loop_time(lambda x, W: jnp.dot(x, W).astype(jnp.bfloat16), raw_bf16, Wb)
    print(f"[parts] filter bf16 in / bf16 out: {dt*1e3:.3f} ms", flush=True)

    # x_proj + dW_ih (fwd + bwd matmuls of one layer)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32), dtype=jnp.bfloat16)
    w_ih = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32), dtype=jnp.bfloat16)

    dt = device_loop_time(
        lambda x, w_ih: jax.grad(lambda w: (x @ w).sum())(w_ih), x, w_ih
    )
    print(f"[parts] x_proj fwd+dW bf16 (1 layer): {dt*1e3:.3f} ms", flush=True)

    # dW_hh einsum over the whole stream
    h_prev = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32), dtype=jnp.bfloat16)
    dxs = jnp.asarray(rng.normal(size=(T, B, 4 * H)).astype(np.float32), dtype=jnp.bfloat16)

    dt = device_loop_time(lambda hp, dxs: jnp.einsum(
        "tbh,tbg->hg", hp, dxs, preferred_element_type=jnp.float32), h_prev, dxs)
    print(f"[parts] dW_hh einsum bf16 (1 layer): {dt*1e3:.3f} ms", flush=True)


def exp_bench2048():
    """Full bench step at B=2048 (amortization check)."""
    import importlib
    import os
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:  # cwd-independent `import bench`
        sys.path.insert(0, repo_root)
    import bench
    importlib.reload(bench)
    bench.B = 2048
    wps = bench.measure_jax()
    print(f"[bench2048] {wps:.0f} windows/s", flush=True)


EXPS["parts"] = exp_parts
EXPS["bench2048"] = exp_bench2048


def exp_bwdvar():
    """Backward micro-variants vs the shipped kernel: (a) slice-wise algebra
    without the full-width concat/casts, bf16 products feeding the MXU."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from cerebra.models.pallas_lstm import _pick_tile, lstm_scan_pallas

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    four_h = 4 * H
    prefac = jnp.asarray(rng.normal(size=(T, B, four_h)) * 0.1, dtype=dtype)
    qf = jnp.asarray(rng.normal(size=(T, B, 2 * H)) * 0.1, dtype=dtype)
    g_up = jnp.asarray(rng.normal(size=(T, B, H)) * 0.1, dtype=dtype)
    w_hh_t = jnp.asarray(rng.normal(size=(four_h, H)) * 0.1, dtype=dtype)

    def kern_a(prefac_ref, qf_ref, g_ref, w_hh_t_ref, dx_ref, dh_s, dc_s):
        t = pl.program_id(0)
        b = pl.program_id(1)
        Bt = prefac_ref.shape[1]
        off = b * Bt

        @pl.when(t == 0)
        def _():
            dh_s[pl.ds(off, Bt)] = jnp.zeros_like(dh_s[pl.ds(off, Bt)])
            dc_s[pl.ds(off, Bt)] = jnp.zeros_like(dc_s[pl.ds(off, Bt)])

        Hh = dh_s.shape[-1]
        dh = dh_s[pl.ds(off, Bt)] + g_ref[0].astype(jnp.float32)
        q = qf_ref[0, :, :Hh].astype(jnp.float32)
        f = qf_ref[0, :, Hh:]
        dc = dc_s[pl.ds(off, Bt)] + dh * q
        dc_bf = dc.astype(jnp.bfloat16)
        dh_bf = dh.astype(jnp.bfloat16)
        pf = prefac_ref[0]
        dgates = jnp.concatenate(
            [dc_bf * pf[:, :Hh], dc_bf * pf[:, Hh:2*Hh], dc_bf * pf[:, 2*Hh:3*Hh],
             dh_bf * pf[:, 3*Hh:]], axis=-1)
        dx_ref[0] = dgates
        dh_s[pl.ds(off, Bt)] = jnp.dot(dgates, w_hh_t_ref[:],
                                       preferred_element_type=jnp.float32)
        dc_s[pl.ds(off, Bt)] = dc * f.astype(jnp.float32)

    def run_variant(kern):
        Bt = _pick_tile(B, 1024, H, 2)
        nb = B // Bt
        rev3 = lambda t, b: (T - 1 - t, b, 0)

        @jax.jit
        def go(prefac, qf, g_up, w_hh_t):
            return pl.pallas_call(
                kern,
                grid=(T, nb),
                in_specs=[
                    pl.BlockSpec((1, Bt, four_h), rev3, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, Bt, 2 * H), rev3, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, Bt, H), rev3, memory_space=pltpu.VMEM),
                    pl.BlockSpec((four_h, H), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, Bt, four_h), rev3, memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((T, B, four_h), dtype),
                scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                                pltpu.VMEM((B, H), jnp.float32)],
            )(prefac, qf, g_up, w_hh_t)

        return go

    dt = timeit(run_variant(kern_a), prefac, qf, g_up, w_hh_t)
    print(f"[bwdvar] variant-a (bf16 products, no f32 widen): {dt*1e3:.3f} ms "
          f"({dt/T*1e6:.2f} us/step)", flush=True)

    # shipped bwd for comparison (isolated through grad of the public API)
    x_proj = jnp.asarray(rng.normal(size=(T, B, four_h)) * 0.1, dtype=dtype)
    w_hh = jnp.asarray(rng.normal(size=(H, four_h)) * 0.1, dtype=dtype)
    gradfn = jax.jit(jax.grad(lambda xp, w: lstm_scan_pallas(xp, w).sum(), argnums=(0, 1)))
    dt = timeit(gradfn, x_proj, w_hh)
    print(f"[bwdvar] shipped fwd+bwd: {dt*1e3:.3f} ms ({dt/T*1e6:.2f} us/step)",
          flush=True)


EXPS["bwdvar"] = exp_bwdvar




def exp_dwhh():
    """dW_hh contraction forms: einsum 3D vs 2D A.T@B vs dot_general."""
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(T, B, H)) * 0.1, dtype=jnp.bfloat16)
    dx = jnp.asarray(rng.normal(size=(T, B, 4 * H)) * 0.1, dtype=jnp.bfloat16)

    forms = {
        "einsum3d": jax.jit(lambda h, dx: jnp.einsum(
            "tbh,tbg->hg", h, dx, preferred_element_type=jnp.float32)),
        "2dT": jax.jit(lambda h, dx: jnp.dot(
            h.reshape(-1, H).T, dx.reshape(-1, 4 * H),
            preferred_element_type=jnp.float32)),
        "dg3d": jax.jit(lambda h, dx: jax.lax.dot_general(
            h, dx, dimension_numbers=(((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)),
        "2dswap": jax.jit(lambda h, dx: jnp.dot(
            dx.reshape(-1, 4 * H).T, h.reshape(-1, H),
            preferred_element_type=jnp.float32).T),
    }
    for name, fn in forms.items():
        dt = timeit(fn, h, dx)
        print(f"[dwhh] {name}: {dt*1e3:.3f} ms", flush=True)


def exp_kernel_now():
    """Re-time the shipped kernel after the bf16-product bwd + lean fwd."""
    from cerebra.models.pallas_lstm import lstm_scan_pallas

    rng = np.random.default_rng(0)
    x_proj = jnp.asarray(rng.normal(size=(T, B, 4 * H)) * 0.1, dtype=jnp.bfloat16)
    w_hh = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.1, dtype=jnp.bfloat16)
    fwd = jax.jit(lambda xp, w: lstm_scan_pallas(xp, w))
    dt = timeit(fwd, x_proj, w_hh, n_small=5, n_large=25)
    print(f"[kernel_now] fwd-infer bf16: {dt*1e3:.3f} ms ({dt/T*1e6:.2f} us/step)", flush=True)
    gradfn = jax.jit(jax.grad(lambda xp, w: lstm_scan_pallas(xp, w).sum(), argnums=(0, 1)))
    dt = timeit(gradfn, x_proj, w_hh)
    print(f"[kernel_now] fwd+bwd bf16 (incl dwhh): {dt*1e3:.3f} ms ({dt/T*1e6:.2f} us/step)", flush=True)

    # fwd_train alone (via vjp fwd rule)
    from cerebra.models import pallas_lstm as P
    ftrain = jax.jit(lambda xp, w: P._fwd_train_impl(xp, w, 1024))
    dt = timeit(ftrain, x_proj, w_hh)
    print(f"[kernel_now] fwd-train bf16: {dt*1e3:.3f} ms ({dt/T*1e6:.2f} us/step)", flush=True)


EXPS["dwhh"] = exp_dwhh
EXPS["kernel_now"] = exp_kernel_now




def exp_fwdtrain_var():
    """fwd_train variants: pipelining hints, no cost_estimate, merged 6H
    residual output."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from cerebra.models.pallas_lstm import _gate_slices, _pick_tile

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    four_h = 4 * H
    x_proj = jnp.asarray(rng.normal(size=(T, B, four_h)) * 0.1, dtype=dtype)
    w_hh = jnp.asarray(rng.normal(size=(H, four_h)) * 0.1, dtype=dtype)
    Bt = _pick_tile(B, 1024, H, 2)
    nb = B // Bt

    def body(x_proj_ref, w_hh_ref, h_all_ref, res_ref, h_s, c_s, merged):
        t = pl.program_id(0)
        b = pl.program_id(1)
        off = b * Bt

        @pl.when(t == 0)
        def _():
            h_s[pl.ds(off, Bt)] = jnp.zeros_like(h_s[pl.ds(off, Bt)])
            c_s[pl.ds(off, Bt)] = jnp.zeros_like(c_s[pl.ds(off, Bt)])

        h = h_s[pl.ds(off, Bt)]
        c_prev = c_s[pl.ds(off, Bt)]
        gates = (x_proj_ref[0] + jnp.dot(h.astype(w_hh_ref.dtype), w_hh_ref[:],
                                         preferred_element_type=jnp.float32)
                 ).astype(jnp.float32)
        i, f, g, o = _gate_slices(gates, H)
        ig = i * g
        c_new = f * c_prev + ig
        tanh_c = jnp.tanh(c_new)
        h_new = o * tanh_c
        h_s[pl.ds(off, Bt)] = h_new
        c_s[pl.ds(off, Bt)] = c_new
        h_all_ref[0] = h_new.astype(h_all_ref.dtype)
        pieces = [g * (i - i * i), c_prev * (f - f * f), i - g * ig,
                  tanh_c * (o - o * o), o - o * tanh_c * tanh_c, f]
        if merged:
            res_ref[0] = jnp.concatenate(pieces, axis=-1).astype(res_ref.dtype)
        else:
            res_ref[0] = jnp.concatenate(pieces[:4], axis=-1).astype(res_ref.dtype)

    def make(merged, cost, semantics):
        def kern6(x_ref, w_ref, h_ref, res_ref, h_s, c_s):
            body(x_ref, w_ref, h_ref, res_ref, h_s, c_s, True)

        def kern4(x_ref, w_ref, h_ref, p_ref, qf_ref, h_s, c_s):
            body(x_ref, w_ref, h_ref, p_ref, h_s, c_s, False)
            # qf separate (mirror of shipped): recompute cheap bits
            # (for timing only — not numerically used)
            qf_ref[0] = p_ref[0][:, : 2 * H]

        params = {}
        if semantics:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"))
        if cost:
            params["cost_estimate"] = pl.CostEstimate(
                flops=2 * T * B * H * four_h + 24 * T * B * four_h,
                bytes_accessed=(x_proj.size + T * B * 7 * H) * 2,
                transcendentals=5 * T * B * H)
        if merged:
            outs = [
                pl.BlockSpec((1, Bt, H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt, 6 * H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
            ]
            shapes = [jax.ShapeDtypeStruct((T, B, H), dtype),
                      jax.ShapeDtypeStruct((T, B, 6 * H), dtype)]
            kern = kern6
        else:
            outs = [
                pl.BlockSpec((1, Bt, H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt, four_h), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt, 2 * H), lambda t, b: (t, b, 0), memory_space=pltpu.VMEM),
            ]
            shapes = [jax.ShapeDtypeStruct((T, B, H), dtype),
                      jax.ShapeDtypeStruct((T, B, four_h), dtype),
                      jax.ShapeDtypeStruct((T, B, 2 * H), dtype)]
            kern = kern4

        @jax.jit
        def go(x_proj, w_hh):
            return pl.pallas_call(
                kern,
                grid=(T, nb),
                in_specs=[
                    pl.BlockSpec((1, Bt, four_h), lambda t, b: (t, b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((H, four_h), lambda t, b: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=outs,
                out_shape=shapes,
                scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                                pltpu.VMEM((B, H), jnp.float32)],
                **params,
            )(x_proj, w_hh)

        return go

    for name, cfg in {
        "merged6H+cost": (True, True, False),
        "merged6H-nocost": (True, False, False),
        "split+semantics": (False, True, True),
        "split-nocost": (False, False, False),
    }.items():
        merged, cost, sem = cfg
        try:
            dt = timeit(make(merged, cost, sem), x_proj, w_hh)
            print(f"[fwdtrain] {name}: {dt*1e3:.3f} ms ({dt/T*1e6:.2f} us/step)",
                  flush=True)
        except Exception as e:
            print(f"[fwdtrain] {name} FAILED: {str(e)[:180]}", flush=True)


EXPS["fwdtrain_var"] = exp_fwdtrain_var




def exp_stack():
    """Fused multi-layer stack kernel vs the per-layer path, at headline
    (2 layers H=96) and DINO-backbone (4 layers H=128) shapes."""
    from cerebra.models.pallas_lstm_stack import lstm_stack

    lstm_stack_pallas = lstm_stack
    rng = np.random.default_rng(0)
    for L, Hh, Tt, tag in ((2, 96, 460, "headline"), (4, 128, 300, "dino-g"), (4, 128, 200, "dino-l")):
        x = jnp.asarray(rng.normal(size=(Tt, B, H)) * 0.1, dtype=jnp.bfloat16)
        layers = []
        for l in range(L):
            in_dim = H if l == 0 else Hh
            layers.append((
                jnp.asarray(rng.normal(size=(in_dim, 4 * Hh)) * 0.1, dtype=jnp.bfloat16),
                jnp.asarray(rng.normal(size=(Hh, 4 * Hh)) * 0.1, dtype=jnp.bfloat16),
                jnp.asarray(rng.normal(size=(4 * Hh,)) * 0.1, dtype=jnp.bfloat16),
            ))
        layers = tuple(layers)

        infer = jax.jit(lambda xx, ll: lstm_stack_pallas(xx, ll))
        dt = timeit(infer, x, layers)
        print(f"[stack:{tag}] infer L={L} H={Hh} T={Tt}: {dt*1e3:.3f} ms "
              f"({dt/Tt*1e6:.2f} us/step) -> {B/dt:.0f} w/s", flush=True)

        grad = jax.jit(jax.grad(
            lambda xx, ll: (lstm_stack_pallas(xx, ll)[-1] ** 2).sum(), argnums=(1,)))
        dt = timeit(grad, x, layers)
        print(f"[stack:{tag}] fwd+bwd L={L} H={Hh} T={Tt}: {dt*1e3:.3f} ms "
              f"({dt/Tt*1e6:.2f} us/step) -> {B/dt:.0f} w/s", flush=True)


EXPS["stack"] = exp_stack




def exp_stackparts():
    """Fused stack: fwd-infer vs fwd-train vs full grad, headline shapes."""
    from cerebra.models import pallas_lstm_stack as S

    rng = np.random.default_rng(0)
    L, Hh, Tt = 2, 96, 460
    Hp = 128
    x = jnp.asarray(rng.normal(size=(Tt, B, H)) * 0.1, dtype=jnp.bfloat16)
    layers = []
    for l in range(L):
        in_dim = H if l == 0 else Hp
        layers.append((
            jnp.asarray(rng.normal(size=(in_dim, 4 * Hp)) * 0.1, dtype=jnp.bfloat16),
            jnp.asarray(rng.normal(size=(Hp, 4 * Hp)) * 0.1, dtype=jnp.bfloat16),
            jnp.asarray(rng.normal(size=(4 * Hp,)) * 0.1, dtype=jnp.bfloat16),
        ))
    layers = tuple(layers)

    ftrain = jax.jit(lambda xx, ll: S._fwd_train_impl(xx, ll))
    dt = timeit(ftrain, x, layers)
    print(f"[stackparts] fwd-train (padded H=128): {dt*1e3:.3f} ms ({dt/Tt*1e6:.2f} us/step)", flush=True)

    finfer = jax.jit(lambda xx, ll: S._fwd_infer_impl(xx, ll))
    dt = timeit(finfer, x, layers)
    print(f"[stackparts] fwd-infer (padded H=128): {dt*1e3:.3f} ms ({dt/Tt*1e6:.2f} us/step)", flush=True)

    grad = jax.jit(jax.grad(
        lambda xx, ll: (S.lstm_stack_pallas(xx, ll)[-1] ** 2).sum(), argnums=(1,)))
    dt = timeit(grad, x, layers)
    print(f"[stackparts] fwd-train+bwd: {dt*1e3:.3f} ms ({dt/Tt*1e6:.2f} us/step)", flush=True)


EXPS["stackparts"] = exp_stackparts




def exp_planes():
    """Variant B: true-width MXU (4H=384) + per-gate plane extraction.
    The shipped kernel lane-pads H 96->128, inflating every matmul and the
    prefac/qf streams by 33%. Here gates stay (Bt, 384) for the MXU; the
    cell slices them into per-gate planes ONCE (3 rotates), runs all VPU
    math on (Bt, 96) arrays (lane-padded vregs, no rotates), and stores
    residuals as SEPARATE per-gate streams. Backward mirrors it: per-gate
    plane loads, one concat (3 rotates) to rebuild dgates for the true-width
    matmuls. fwd-train + full grad timed against the shipped padded kernel."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, Hh, Tt = 2, 96, 460
    four_h = 4 * Hh
    Bt = 512
    nb = B // Bt
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(Tt, B, Hh)) * 0.1, dtype=dtype)
    layers = []
    for l in range(L):
        layers.append((
            jnp.asarray(rng.normal(size=(Hh, four_h)) * 0.1, dtype=dtype),
            jnp.asarray(rng.normal(size=(Hh, four_h)) * 0.1, dtype=dtype),
            jnp.asarray(rng.normal(size=(1, four_h)) * 0.1, dtype=dtype),
        ))

    def row(width):
        return pl.BlockSpec((1, Bt, width), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM)

    def rev(width):
        return pl.BlockSpec((1, Bt, width), lambda b, t: (Tt - 1 - t, b, 0), memory_space=pltpu.VMEM)

    def whole(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b, t: (0,) * nd, memory_space=pltpu.VMEM)

    def fwd_kernel(*refs):
        x_ref = refs[0]
        w = refs[1 : 1 + 3 * L]
        outs = refs[1 + 3 * L : 1 + 3 * L + 7 * L]
        h_s, c_s = refs[-2], refs[-1]
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_s[...] = jnp.zeros_like(h_s)
            c_s[...] = jnp.zeros_like(c_s)

        inp = x_ref[0]
        for l in range(L):
            w_ih, w_hh, bias = w[3 * l : 3 * l + 3]
            h = h_s[l]
            c_prev = c_s[l]
            gates = (
                jnp.dot(inp, w_ih[:], preferred_element_type=jnp.float32)
                + jnp.dot(h.astype(w_hh.dtype), w_hh[:], preferred_element_type=jnp.float32)
                + bias[:].astype(jnp.float32)
            )
            i = jax.nn.sigmoid(gates[:, :Hh])
            f = jax.nn.sigmoid(gates[:, Hh : 2 * Hh])
            g = jnp.tanh(gates[:, 2 * Hh : 3 * Hh])
            o = jax.nn.sigmoid(gates[:, 3 * Hh :])
            ig = i * g
            c_new = f * c_prev + ig
            tanh_c = jnp.tanh(c_new)
            h_new = o * tanh_c
            h_s[l] = h_new
            c_s[l] = c_new
            (h_ref, pi_ref, pf_ref, pg_ref, po_ref, q_ref, f_ref) = outs[7 * l : 7 * l + 7]
            inp = h_new.astype(dtype)
            h_ref[0] = inp
            pi_ref[0] = (g * (i - i * i)).astype(dtype)
            pf_ref[0] = (c_prev * (f - f * f)).astype(dtype)
            pg_ref[0] = (i - g * ig).astype(dtype)
            po_ref[0] = (tanh_c * (o - o * o)).astype(dtype)
            q_ref[0] = (o - o * tanh_c * tanh_c).astype(dtype)
            f_ref[0] = f.astype(dtype)

    def fwd_train(x, layers):
        in_specs = [row(Hh)]
        args = [x]
        for w_ih, w_hh, bias in layers:
            in_specs += [whole(w_ih.shape), whole(w_hh.shape), whole(bias.shape)]
            args += [w_ih, w_hh, bias]
        out_specs, shapes = [], []
        for _ in range(L):
            out_specs += [row(Hh)] * 7
            shapes += [jax.ShapeDtypeStruct((Tt, B, Hh), dtype)] * 7
        return pl.pallas_call(
            fwd_kernel,
            grid=(nb, Tt),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=shapes,
            scratch_shapes=[pltpu.VMEM((L, Bt, Hh), jnp.float32),
                            pltpu.VMEM((L, Bt, Hh), jnp.float32)],
        )(*args)

    jfwd = jax.jit(fwd_train)
    dt = timeit(jfwd, x, tuple(layers))
    print(f"[planes] fwd-train true-width: {dt*1e3:.3f} ms ({dt/Tt*1e6:.2f} us/step)", flush=True)

    # backward: per-gate plane loads, concat once for true-width matmuls
    def bwd_kernel(*refs):
        g_ref = refs[0]
        x_ref = refs[1]
        per_l = refs[2 : 2 + 9 * L]           # (h_prev, pi, pf, pg, po, q, f, w_hh_t, w_ih_t) x L
        h_cur = refs[2 + 9 * L : 1 + 10 * L]  # L-1 streams
        dx_ref = refs[1 + 10 * L]
        dw = refs[2 + 10 * L : 2 + 13 * L]
        dh_s, dc_s = refs[-2], refs[-1]
        b = pl.program_id(0)
        t = pl.program_id(1)
        first = jnp.logical_and(t == 0, b == 0)

        @pl.when(t == 0)
        def _():
            dh_s[...] = jnp.zeros_like(dh_s)
            dc_s[...] = jnp.zeros_like(dc_s)

        @pl.when(first)
        def _():
            for r in dw:
                r[...] = jnp.zeros_like(r)

        is_t0 = t == pl.num_programs(1) - 1
        g_up = g_ref[0].astype(jnp.float32)
        for l in reversed(range(L)):
            (h_prev_ref, pi_ref, pf_ref, pg_ref, po_ref, q_ref, f_ref,
             w_hh_t_ref, w_ih_t_ref) = per_l[9 * l : 9 * l + 9]
            dwih_ref, dwhh_ref, db_ref = dw[3 * l : 3 * l + 3]
            dh = dh_s[l] + g_up
            dc = dc_s[l] + dh * q_ref[0].astype(jnp.float32)
            dc_n = dc.astype(dtype)
            dh_n = dh.astype(dtype)
            dgates = jnp.concatenate(
                [dc_n * pi_ref[0], dc_n * pf_ref[0], dc_n * pg_ref[0], dh_n * po_ref[0]],
                axis=-1)
            dh_s[l] = jnp.dot(dgates, w_hh_t_ref[:], preferred_element_type=jnp.float32)
            dc_s[l] = dc * f_ref[0].astype(jnp.float32)
            h_prev = jnp.where(is_t0, jnp.zeros_like(pi_ref[0]), h_prev_ref[0])
            inp = x_ref[0] if l == 0 else h_cur[l - 1][0]
            dwih_ref[...] += jax.lax.dot_general(
                inp, dgates, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwhh_ref[...] += jax.lax.dot_general(
                h_prev, dgates, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db_ref[...] += jnp.sum(dgates.astype(jnp.float32), axis=0, keepdims=True)
            g_up = jnp.dot(dgates, w_ih_t_ref[:], preferred_element_type=jnp.float32)
        dx_ref[0] = g_up.astype(dtype)

    def bwd(g, x, layers, fwd_outs):
        prev_spec = pl.BlockSpec(
            (1, Bt, Hh), lambda b, t: (jnp.maximum(Tt - 2 - t, 0), b, 0),
            memory_space=pltpu.VMEM)
        in_specs = [rev(Hh), rev(Hh)]
        args = [g, x]
        for l in range(L):
            streams = fwd_outs[7 * l : 7 * l + 7]
            w_ih, w_hh, _ = layers[l]
            in_specs += [prev_spec] + [rev(Hh)] * 6 + [whole((four_h, Hh)), whole((four_h, Hh))]
            args += [streams[0]] + list(streams[1:]) + [jnp.swapaxes(w_hh, 0, 1), jnp.swapaxes(w_ih, 0, 1)]
        for l in range(L - 1):
            in_specs.append(rev(Hh))
            args.append(fwd_outs[7 * l])
        out_specs = [rev(Hh)]
        shapes = [jax.ShapeDtypeStruct((Tt, B, Hh), dtype)]
        for l in range(L):
            out_specs += [whole((Hh, four_h)), whole((Hh, four_h)), whole((1, four_h))]
            shapes += [jax.ShapeDtypeStruct((Hh, four_h), jnp.float32),
                       jax.ShapeDtypeStruct((Hh, four_h), jnp.float32),
                       jax.ShapeDtypeStruct((1, four_h), jnp.float32)]
        return pl.pallas_call(
            bwd_kernel,
            grid=(nb, Tt),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=shapes,
            scratch_shapes=[pltpu.VMEM((L, Bt, Hh), jnp.float32),
                            pltpu.VMEM((L, Bt, Hh), jnp.float32)],
        )(*args)

    def full(x, layers, g):
        outs = fwd_train(x, layers)
        return bwd(g, x, layers, outs)

    g = jnp.asarray(rng.normal(size=(Tt, B, Hh)) * 0.1, dtype=dtype)
    jfull = jax.jit(full)
    dt = timeit(jfull, x, tuple(layers), g)
    print(f"[planes] fwd-train+bwd true-width: {dt*1e3:.3f} ms ({dt/Tt*1e6:.2f} us/step)", flush=True)


EXPS["planes"] = exp_planes




def exp_bwdstack():
    """Backward-side variants of the fused stack at headline shapes:
    (a) shipped (Bt from _pick_tile; pallas_lstm_stack passes no
        cost_estimate, so there is no cost-estimate knob to vary),
    (c) Bt=1024 (one batch tile),
    (e) Bt=256,
    each timed through the full fwd+bwd grad (sync on dW)."""
    import functools
    from cerebra.models import pallas_lstm_stack as S

    rng = np.random.default_rng(0)
    L, Hp, Tt = 2, 128, 460
    x = jnp.asarray(rng.normal(size=(Tt, B, H)) * 0.1, dtype=jnp.bfloat16)
    layers = []
    for l in range(L):
        in_dim = H if l == 0 else Hp
        layers.append((
            jnp.asarray(rng.normal(size=(in_dim, 4 * Hp)) * 0.1, dtype=jnp.bfloat16),
            jnp.asarray(rng.normal(size=(Hp, 4 * Hp)) * 0.1, dtype=jnp.bfloat16),
            jnp.asarray(rng.normal(size=(4 * Hp,)) * 0.1, dtype=jnp.bfloat16),
        ))
    layers = tuple(layers)

    def run(tag):
        grad = jax.jit(jax.grad(
            lambda xx, ll: (S.lstm_stack_pallas(xx, ll)[-1] ** 2).sum(), argnums=(1,)))
        dt = timeit(grad, x, layers)
        print(f"[bwdstack] {tag}: {dt*1e3:.3f} ms ({dt/Tt*1e6:.2f} us/step)", flush=True)

    run("shipped")

    # dead-dx variant (input_grad=False — what the recipes now use)
    grad_ndx = jax.jit(jax.grad(
        lambda xx, ll: (S.lstm_stack_pallas_ndx(xx, ll)[-1] ** 2).sum(), argnums=(1,)))
    dt = timeit(grad_ndx, x, layers)
    print(f"[bwdstack] ndx (no dx stream): {dt*1e3:.3f} ms ({dt/Tt*1e6:.2f} us/step)", flush=True)

    # (c) force a single 1024-row batch tile
    orig_pick = S._pick_tile
    try:
        S._pick_tile = lambda B_, H_, L_, i_: B_
        run("Bt=1024")
    finally:
        S._pick_tile = orig_pick

    # (e) smaller tile 256
    def pick256(B_, H_, L_, i_):
        return min(B_, 256)
    try:
        S._pick_tile = pick256
        run("Bt=256")
    finally:
        S._pick_tile = orig_pick


EXPS["bwdstack"] = exp_bwdstack


def exp_rcstack(B=1024, H=96, L=2, Hp=128, Tt=460):
    """Recompute-backward variant (store h/c, re-derive gates — 5H of
    stream instead of 14H round trip) vs the shipped 7H-residual kernel,
    timed through the full fwd+bwd grad. Defaults = headline shapes;
    `rcstack 1024 96 4 128 300` = the DINO-LSTM backbone's L=4 depth,
    where the residual stream is 2x heavier and the tradeoff could flip."""
    from cerebra.models import pallas_lstm_stack as S

    rng = np.random.default_rng(0)
    L, Hp, Tt = int(L), int(Hp), int(Tt)
    x = jnp.asarray(rng.normal(size=(Tt, B, H)) * 0.1, dtype=jnp.bfloat16)
    layers = []
    for l in range(L):
        in_dim = H if l == 0 else Hp
        layers.append((
            jnp.asarray(rng.normal(size=(in_dim, 4 * Hp)) * 0.1, dtype=jnp.bfloat16),
            jnp.asarray(rng.normal(size=(Hp, 4 * Hp)) * 0.1, dtype=jnp.bfloat16),
            jnp.asarray(rng.normal(size=(4 * Hp,)) * 0.1, dtype=jnp.bfloat16),
        ))
    layers = tuple(layers)

    for tag, fn in (("shipped", S.lstm_stack_pallas), ("recompute", S.lstm_stack_pallas_rc)):
        grad = jax.jit(jax.grad(
            lambda xx, ll: (fn(xx, ll)[-1].astype(jnp.float32) ** 2).sum(), argnums=(1,)))
        dt = timeit(grad, x, layers)
        print(f"[rcstack] {tag}: {dt*1e3:.3f} ms ({dt/Tt*1e6:.2f} us/step)", flush=True)


EXPS["rcstack"] = exp_rcstack



def exp_dinoparts(batch=8, fused=0):
    """main_dino step decomposition at reference scale (vit_small/p8, 224
    globals + 4x96 locals, out_dim 65536, bf16, B=batch): where the measured
    ~94 ms/step (84.8 windows/s) actually goes. `fused=1` re-runs the same
    rows under the shipped round-5 fused Pallas half-blocks
    (`kernel_lab dinoparts 8 1`) to locate the remaining overhead. Each
    part returns a scalar
    reduction over ALL its outputs so the differenced timing's host sync
    proves completion (tunnel rule: sync must depend on every output)."""
    from cerebra.losses.dino import dino_multicrop_loss
    from cerebra.models.heads import DINOHead
    from cerebra.models.multicrop import multicrop_forward
    from cerebra.train.dino_vit import DinoVitConfig, build_vit, make_eeg_image_view_fn

    # fused=0 pins the unfused XLA baseline (use_fused_* default to auto —
    # ON on TPU since round 5 — and would otherwise shift these
    # decomposition rows vs earlier rounds)
    cfg = DinoVitConfig(
        dtype=jnp.bfloat16, use_fused_mlp=bool(fused), use_fused_attn=bool(fused)
    )
    backbone = build_vit(cfg)
    head = DINOHead(
        in_dim=384, out_dim=cfg.out_dim, use_bn=cfg.use_bn_in_head,
        norm_last_layer=cfg.norm_last_layer, dtype=cfg.dtype,
    )
    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    eeg = jnp.asarray(rng.normal(size=(batch, 460, 128)), jnp.float32)
    imgs = jnp.asarray(rng.random(size=(batch, 224, 224, 3)), jnp.float32)
    dummy = jnp.zeros((1, 224, 224, 3))
    bp = backbone.init(jax.random.key(1), dummy)["params"]
    hp = head.init(jax.random.key(2), jnp.zeros((1, 384)))["params"]
    view_fn = make_eeg_image_view_fn(2, 4, 224, 96, True)
    center = jnp.zeros((1, cfg.out_dim), jnp.float32)

    def scalar(tree):
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(tree))

    def views(key, eeg, imgs):
        g, l = view_fn(key, (eeg, imgs))
        return scalar(g) + scalar(l)

    def groups_of(key):
        return view_fn(key, (eeg, imgs))

    g0, l0 = groups_of(key)
    g0, l0 = jax.device_put(g0), jax.device_put(l0)

    def fwd(bp, hp, g, l):
        out = multicrop_forward(
            lambda x: backbone.apply({"params": bp}, x),
            lambda f: head.apply({"params": hp}, f),
            [g, l],
        )
        return out.reshape(6, batch, -1)

    def teacher_fwd(bp, hp, g):
        out = multicrop_forward(
            lambda x: backbone.apply({"params": bp}, x),
            lambda f: head.apply({"params": hp}, f),
            [g],
        )
        return scalar(out)

    t_out = jax.lax.stop_gradient(
        fwd(bp, hp, g0, l0)[:2]
    )

    # every large array (g0 ~19 MB, l0, t_out, center, feats) is a runtime
    # ARGUMENT of its jit — a closure would bake it into the compiled HLO
    # uploaded through the remote-compile tunnel (CLAUDE.md rule)
    def loss_only(bp, hp, g, l, t_out, center):
        s_out = fwd(bp, hp, g, l)
        loss, new_center = dino_multicrop_loss(
            s_out, t_out, center, teacher_temp=0.04, student_temp=0.1,
            center_momentum=0.9,
        )
        return loss + scalar(new_center)

    grad_full = jax.grad(loss_only, argnums=(0, 1))

    def bb_global_grad(bp, g):
        f = lambda p: jnp.sum(
            backbone.apply({"params": p}, g.reshape((2 * batch,) + g.shape[2:])).astype(jnp.float32) ** 2
        )
        return scalar(jax.grad(f)(bp))

    def bb_local_grad(bp, l):
        f = lambda p: jnp.sum(
            backbone.apply({"params": p}, l.reshape((4 * batch,) + l.shape[2:])).astype(jnp.float32) ** 2
        )
        return scalar(jax.grad(f)(bp))

    feats = jnp.asarray(rng.normal(size=(6 * batch, 384)), jnp.bfloat16)

    def head_grad(hp, feats):
        f = lambda p: jnp.sum(head.apply({"params": p}, feats).astype(jnp.float32) ** 2)
        return scalar(jax.grad(f)(hp))

    for tag, fn, args in (
        ("views (2 glob tile + 4 loc crop)", views, (key, eeg, imgs)),
        ("teacher fwd (2x224 + head)", teacher_fwd, (bp, hp, g0)),
        ("student fwd + loss (6 views)", loss_only, (bp, hp, g0, l0, t_out, center)),
        ("student fwd+bwd (full grad)", lambda *a: scalar(grad_full(*a)),
         (bp, hp, g0, l0, t_out, center)),
        ("backbone-only grad, 2x224", bb_global_grad, (bp, g0)),
        ("backbone-only grad, 4x96", bb_local_grad, (bp, l0)),
        ("head-only grad (48,384->65536)", head_grad, (hp, feats)),
    ):
        jfn = jax.jit(fn)
        dt = timeit(jfn, *args)
        print(f"[dinoparts] {tag}: {dt*1e3:.2f} ms", flush=True)


EXPS["dinoparts"] = exp_dinoparts



def exp_dinotail(batch=8):
    """The ~13 ms/step the dinoparts decomposition leaves unaccounted:
    per-param clip + AdamW + apply_updates + teacher EMA over the ViT-S
    student/teacher trees (~21 M params each, f32). Bandwidth floor is
    ~1.5 ms (clip 2 reads, adam 4R/3W, EMA 2R/1W at 819 GB/s) — anything
    beyond that is per-leaf op overhead."""
    import optax

    from cerebra.models.heads import DINOHead
    from cerebra.train.dino_vit import DinoVitConfig, build_vit
    from cerebra.train.ema import ema_update
    from cerebra.train.steps import make_scheduled_optimizer

    # pin the unfused XLA baseline: use_fused_mlp defaults to auto (ON on
    # TPU since round 5) and would otherwise shift these decomposition rows
    cfg = DinoVitConfig(dtype=jnp.bfloat16, use_fused_mlp=False, use_fused_attn=False)
    backbone = build_vit(cfg)
    head = DINOHead(
        in_dim=384, out_dim=cfg.out_dim, use_bn=cfg.use_bn_in_head,
        norm_last_layer=cfg.norm_last_layer, dtype=cfg.dtype,
    )
    dummy = jnp.zeros((1, 224, 224, 3))
    bp = backbone.init(jax.random.key(1), dummy)["params"]
    hp = head.init(jax.random.key(2), jnp.zeros((1, 384)))["params"]
    params = {"backbone": bp, "head": hp}
    teacher = jax.tree.map(jnp.copy, params)
    tx = make_scheduled_optimizer(
        "adamw", np.full(100, 1e-4, np.float32), np.full(100, 0.04, np.float32),
        params_mask_source=params, clip_grad=cfg.clip_grad,
    )
    opt_state = tx.init(params)
    grads = jax.tree.map(lambda p: p * 1e-3 + 1e-6, params)
    n_leaves = len(jax.tree.leaves(params))
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    print(f"[dinotail] tree: {n_leaves} leaves, {n_params/1e6:.1f} M params", flush=True)

    def scalar(tree):
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(tree))

    def tail(params, teacher, opt_state, grads):
        updates, new_opt = tx.update(grads, opt_state, params)
        new_p = optax.apply_updates(params, updates)
        new_t = ema_update(teacher, new_p, 0.996)
        return scalar(new_p) + scalar(new_t) + scalar(new_opt)

    dt = timeit(jax.jit(tail), params, teacher, opt_state, grads)
    print(f"[dinotail] clip+adamw+apply+ema: {dt*1e3:.2f} ms", flush=True)

    def ema_only(teacher, params):
        return scalar(ema_update(teacher, params, 0.996))

    dt = timeit(jax.jit(ema_only), teacher, params)
    print(f"[dinotail] ema only: {dt*1e3:.2f} ms", flush=True)

    def sync_cost(params):
        return scalar(params)

    dt = timeit(jax.jit(sync_cost), params)
    print(f"[dinotail] scalar-sum sync overhead: {dt*1e3:.2f} ms", flush=True)


EXPS["dinotail"] = exp_dinotail


def exp_vitroof(batch=16, n_tokens=785, dim=384, heads=6, mlp=1536):
    """Roofline attribution for the ViT block (the dinoparts follow-up:
    is the ~19-21%-of-peak position XLA's GLUE between ops — recoverable by
    a fused block megakernel — or the ops' own MXU/HBM positions?).

    Times every op of one vit_small block ISOLATED at the exact main_dino
    global shapes ((2 views × B=8) × 785 tokens × 384), fwd and fwd+bwd,
    with analytic FLOPs/bytes so each prints its achieved TF/s or GB/s.
    Then the glued block (XLA) for comparison: block_time − Σ parts = the
    fusion headroom a megakernel could recover at most.
    """
    rng = np.random.default_rng(0)
    BT = batch * n_tokens
    hd = dim // heads
    x = jnp.asarray(rng.normal(size=(batch, n_tokens, dim)), jnp.bfloat16)
    w_qkv = jnp.asarray(rng.normal(size=(dim, 3 * dim)) * 0.05, jnp.bfloat16)
    w_proj = jnp.asarray(rng.normal(size=(dim, dim)) * 0.05, jnp.bfloat16)
    w_fc1 = jnp.asarray(rng.normal(size=(dim, mlp)) * 0.05, jnp.bfloat16)
    w_fc2 = jnp.asarray(rng.normal(size=(mlp, dim)) * 0.05, jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(batch, heads, n_tokens, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(batch, heads, n_tokens, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(batch, heads, n_tokens, hd)), jnp.bfloat16)
    scores = jnp.asarray(rng.normal(size=(batch, heads, n_tokens, n_tokens)), jnp.bfloat16)
    h_mlp = jnp.asarray(rng.normal(size=(batch, n_tokens, mlp)), jnp.bfloat16)

    def s(t):
        return jnp.sum(t.astype(jnp.float32))

    def report(tag, fn, args, gflops=None, gbytes=None, grad_wrt=None):
        f = jax.jit(lambda *a: s(fn(*a)))
        dt = timeit(f, *args)
        line = f"[vitroof] {tag:34s} fwd {dt*1e3:7.3f} ms"
        if gflops:
            line += f"  {gflops/dt/1e3:6.1f} TF/s"
        if gbytes:
            line += f"  {gbytes/dt:6.0f} GB/s"
        if grad_wrt is not None:
            # value_and_grad: grad alone lets XLA DCE the primal matmul (dx
            # and dw need only the cotangent), so the '3x' label would cover
            # 2 matmuls of executed work; the value output forces all 3.
            # The sync scalar folds EVERY grad leaf in (axon can serve a
            # partial result before the rest completes).
            vg = jax.value_and_grad(lambda *a: s(fn(*a)), argnums=grad_wrt)

            def full(*a):
                val, grads = vg(*a)
                return val + sum(
                    jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(grads)
                )

            dtg = timeit(jax.jit(full), *args)
            line += f" | fwd+bwd {dtg*1e3:7.3f} ms"
            if gflops:
                line += f"  {3*gflops/dtg/1e3:6.1f} TF/s(3x)"
        print(line, flush=True)
        return dt

    GF = 1e-9
    # --- the six matmuls, isolated
    report("qkv  (BT,384)@(384,1152)", lambda x, w: x @ w, (x, w_qkv),
           gflops=2 * BT * dim * 3 * dim * GF, grad_wrt=(0, 1))
    report("QK^T (B*H,785,64)@(64,785)",
           lambda q, k: q @ jnp.swapaxes(k, -2, -1), (q, k),
           gflops=2 * batch * heads * n_tokens * n_tokens * hd * GF, grad_wrt=(0, 1))
    report("AV   (B*H,785,785)@(785,64)", lambda a, v: a @ v, (scores, v),
           gflops=2 * batch * heads * n_tokens * n_tokens * hd * GF, grad_wrt=(0, 1))
    report("proj (BT,384)@(384,384)", lambda x, w: x @ w, (x, w_proj),
           gflops=2 * BT * dim * dim * GF, grad_wrt=(0, 1))
    report("fc1  (BT,384)@(384,1536)", lambda x, w: x @ w, (x, w_fc1),
           gflops=2 * BT * dim * mlp * GF, grad_wrt=(0, 1))
    report("fc2  (BT,1536)@(1536,384)", lambda h, w: h @ w, (h_mlp, w_fc2),
           gflops=2 * BT * dim * mlp * GF, grad_wrt=(0, 1))
    # --- the elementwise/stream ops, isolated (report bandwidth)
    ln = lambda t: (t - jnp.mean(t, -1, keepdims=True)) * jax.lax.rsqrt(
        jnp.var(t, -1, keepdims=True) + 1e-6)
    report("LN   (BT,384)", ln, (x,), gbytes=2 * BT * dim * 2 / 1e9, grad_wrt=(0,))
    report("softmax (B,H,785,785)", lambda a: jax.nn.softmax(a, -1), (scores,),
           gbytes=2 * batch * heads * n_tokens * n_tokens * 2 / 1e9, grad_wrt=(0,))
    report("gelu (BT,1536)", lambda h: jax.nn.gelu(h, approximate=False), (h_mlp,),
           gbytes=2 * BT * mlp * 2 / 1e9, grad_wrt=(0,))

    # --- the glued block: XLA's position on the whole thing
    from cerebra.models.vit import Block

    blk_gf = (2 * BT * dim * 3 * dim + 2 * 2 * batch * heads * n_tokens**2 * hd
              + 2 * BT * dim * dim + 2 * 2 * BT * dim * mlp) * GF
    for tag, flash in (("Block (XLA glued)", False), ("Block (flash attn)", True)):
        block = Block(dim, heads, dtype=jnp.bfloat16, use_flash=flash)
        params = block.init(jax.random.key(0), x[:1], False, False)["params"]

        def bf(p, x):
            return block.apply({"params": p}, x, False, False)

        report(f"{tag} {blk_gf:.1f} GF", bf, (params, x), gflops=blk_gf, grad_wrt=(0, 1))


EXPS["vitroof"] = exp_vitroof


def exp_vitmlp(batch=16, n_tokens=785, dim=384, mlp=1536, tile=256):
    """Ship/reject measurement for the fused MLP half-block kernel
    (cerebra/models/pallas_vit_mlp.py) vs the XLA formula at main_dino
    global shapes. The kernel removes the LN/fc1/GELU/fc2 intermediate HBM
    streams (fwd) and the saved-activation streams (bwd, flash-style
    recompute); the XLA path is what vit.Block compiles to today."""
    from flax import linen as nn

    from cerebra.models.pallas_vit_mlp import fused_mlp_residual

    rng = np.random.default_rng(0)
    M = batch * n_tokens
    x = jnp.asarray(rng.normal(size=(M, dim)), jnp.bfloat16)
    params = (
        jnp.asarray(rng.normal(size=(dim,)) * 0.1 + 1.0, jnp.float32),
        jnp.asarray(rng.normal(size=(dim,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(dim, mlp)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(mlp,)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(mlp, dim)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(dim,)) * 0.05, jnp.float32),
    )

    def xla_ref(x, g, b, w1, b1, w2, b2):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        xc = x32 - mu
        xn = xc * jax.lax.rsqrt((xc * xc).mean(-1, keepdims=True) + 1e-6)
        y1 = (xn * g + b).astype(x.dtype)
        h = (y1 @ w1.astype(x.dtype)).astype(jnp.float32) + b1
        gh = nn.gelu(h, approximate=False).astype(x.dtype)
        return (x32 + (gh @ w2.astype(x.dtype)).astype(jnp.float32) + b2).astype(x.dtype)

    gf = 2 * 2 * M * dim * mlp / 1e9  # two matmuls fwd

    def s(t):
        return jnp.sum(t.astype(jnp.float32))

    for tag, fn in (("fused kernel", lambda *a: fused_mlp_residual(*a, tile)),
                    ("XLA", xla_ref)):
        f = jax.jit(lambda *a, _fn=fn: s(_fn(*a)))
        dt = timeit(f, x, *params)
        # sync on value + EVERY grad leaf: a single-leaf sync (e.g. the
        # final bias grad, a constant under sum-loss) can be served before
        # the heavy dW/dx matmuls finish on axon
        vg = jax.value_and_grad(lambda *a, _fn=fn: s(_fn(*a)), argnums=tuple(range(7)))
        gr = jax.jit(lambda *a: jax.tree.reduce(
            lambda acc, t: acc + jnp.sum(t.astype(jnp.float32)), vg(*a), 0.0))
        dtg = timeit(gr, x, *params)
        print(
            f"[vitmlp] {tag:12s} fwd {dt*1e3:7.3f} ms ({gf/dt/1e3:6.1f} TF/s) | "
            f"fwd+bwd {dtg*1e3:7.3f} ms ({3*gf/dtg/1e3:6.1f} TF/s at 3x)",
            flush=True,
        )


EXPS["vitmlp"] = exp_vitmlp


def exp_vitattn(batch=16, n_tokens=785, dim=384, heads=6, pad=16):
    """Ship/reject measurement for the fused attention half-block kernel
    (cerebra/models/pallas_vit_attn.py) vs the XLA formula at main_dino
    global shapes. The kernel keeps the (N, N) per-head probability
    matrices in VMEM and fuses LN1/QKV/proj/residual around them (vs XLA's
    LN + qkv dot + relayouts + softmax streams + proj dot). ``pad``
    sublane-pads 785 → 800; run with pad=128 if Mosaic rejects the %16
    block (785 → 896, +14% rows)."""
    rng = np.random.default_rng(0)
    dh = dim // heads
    x = jnp.asarray(rng.normal(size=(batch, n_tokens, dim)), jnp.bfloat16)
    params = (
        jnp.asarray(rng.normal(size=(dim,)) * 0.1 + 1.0, jnp.float32),
        jnp.asarray(rng.normal(size=(dim,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(dim, 3 * dim)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(3 * dim,)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(dim, dim)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(dim,)) * 0.05, jnp.float32),
    )

    def xla_ref(x, g, b, wqkv, bqkv, wproj, bproj):
        B, N, D = x.shape
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        xc = x32 - mu
        xn = xc * jax.lax.rsqrt((xc * xc).mean(-1, keepdims=True) + 1e-6)
        y = (xn * g + b).astype(x.dtype)
        qkv = (y @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)).reshape(
            B, N, 3, heads, dh
        )
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jax.nn.softmax((q * dh**-0.5) @ jnp.swapaxes(k, -2, -1), axis=-1)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
        return (x32 + (o @ wproj.astype(x.dtype)).astype(jnp.float32) + bproj).astype(
            x.dtype
        )

    from cerebra.models.pallas_vit_attn import fused_attn_residual

    BT = batch * n_tokens
    gf = (2 * BT * dim * 4 * dim + 2 * 2 * batch * heads * n_tokens**2 * dh) / 1e9

    def s(t):
        return jnp.sum(t.astype(jnp.float32))

    for tag, fn in (
        ("fused kernel", lambda *a: fused_attn_residual(*a, heads, pad)),
        ("XLA", xla_ref),
    ):
        f = jax.jit(lambda *a, _fn=fn: s(_fn(*a)))
        dt = timeit(f, x, *params)
        # sync on value + EVERY grad leaf: a single-leaf sync (e.g. the
        # final bias grad, a constant under sum-loss) can be served before
        # the heavy dW/dx matmuls finish on axon
        vg = jax.value_and_grad(lambda *a, _fn=fn: s(_fn(*a)), argnums=tuple(range(7)))
        gr = jax.jit(lambda *a: jax.tree.reduce(
            lambda acc, t: acc + jnp.sum(t.astype(jnp.float32)), vg(*a), 0.0))
        dtg = timeit(gr, x, *params)
        print(
            f"[vitattn] {tag:12s} fwd {dt*1e3:7.3f} ms ({gf/dt/1e3:6.1f} TF/s) | "
            f"fwd+bwd {dtg*1e3:7.3f} ms ({3*gf/dtg/1e3:6.1f} TF/s at 3x)",
            flush=True,
        )
    # local-crop shape: is the fused path safe to engage on N=145 too?
    if n_tokens == 785:
        exp_vitattn(batch=32, n_tokens=145, dim=dim, heads=heads, pad=pad)


EXPS["vitattn"] = exp_vitattn


def exp_barlowroof(batch=256):
    """Roofline attribution for barlow_train (the round-4 verdict's open
    question: is the recipe's 52 TF/s position XLA's ResNet-50/conv ceiling
    on this chip, or recoverable recipe overhead?).

    Three levels, all at the recipe's exact shapes (B=256 per tower, 224²,
    bf16), fwd and fwd+bwd:
      1. the dominant isolated convs (stem + one 3×3 and 1×1 per stage) —
         XLA's raw conv ceiling at these shapes;
      2. the whole ResNet-50 tower (train-mode BN, mutable batch_stats,
         exactly as the recipe applies it) — the tower's glued position;
      3. the projector matmuls — the MXU sanity bar.
    recipe-vs-tower gap = recipe overhead (spectrogram, 2nd tower glue,
    loss, optimizer); tower-vs-conv gap = XLA's inter-conv glue.

    FLOP convention: TF/s lines here use TRUE flops (2×MACs). The recipe's
    BENCH_AUX rows count MACs (ResNet-50 "4.1 GF" fwd), so its printed
    %-of-peak is HALF the true-flops position — stated in the ledger.
    """
    rng = np.random.default_rng(0)
    GF = 1e-9

    def s(t):
        return jnp.sum(t.astype(jnp.float32))

    def report(tag, fn, args, gflops, grad_wrt=None):
        f = jax.jit(lambda *a: s(fn(*a)))
        dt = timeit(f, *args)
        line = f"[barlowroof] {tag:34s} fwd {dt*1e3:8.3f} ms  {gflops/dt/1e3:6.1f} TF/s"
        if grad_wrt is not None:
            vg = jax.value_and_grad(lambda *a: s(fn(*a)), argnums=grad_wrt)

            def full(*a):
                val, grads = vg(*a)
                return val + sum(
                    jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(grads)
                )

            dtg = timeit(jax.jit(full), *args)
            line += f" | fwd+bwd {dtg*1e3:8.3f} ms  {3*gflops/dtg/1e3:6.1f} TF/s(3x)"
        print(line, flush=True)

    def conv(tag, h, w, cin, cout, k, stride=1):
        x = jnp.asarray(rng.normal(size=(batch, h, w, cin)) * 0.1, jnp.bfloat16)
        f = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.05, jnp.bfloat16)
        ho, wo = h // stride, w // stride
        gf = 2 * batch * ho * wo * cout * k * k * cin * GF

        def run(x, f):
            return jax.lax.conv_general_dilated(
                x, f, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        report(f"{tag} {k}x{k} s{stride} {cin}->{cout} @{h}", run, (x, f),
               gflops=gf, grad_wrt=(0, 1))

    # --- 1. isolated convs at the ResNet-50 stage shapes
    conv("stem ", 224, 224, 3, 64, 7, stride=2)
    conv("s1   ", 56, 56, 64, 64, 3)
    conv("s2   ", 28, 28, 128, 128, 3)
    conv("s3   ", 14, 14, 256, 256, 3)
    conv("s4   ", 7, 7, 512, 512, 3)
    conv("s3 1x1 expand", 14, 14, 256, 1024, 1)

    # --- 2. the whole tower, applied exactly as the recipe does
    from cerebra.models.resnet import resnet50

    model = resnet50(dtype=jnp.bfloat16, zero_init_residual=True)
    x = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)) * 0.5, jnp.bfloat16)
    variables = jax.jit(lambda k, xs: model.init(k, xs, train=True))(
        jax.random.key(0), x[:8]
    )
    params, bstats = variables["params"], variables["batch_stats"]
    # ResNet-50 @224, no fc: 4.09 GMACs -> 8.18 true GF fwd per image
    tower_gf = 8.18 * batch

    def tower(x, p, b):
        out, _ = model.apply(
            {"params": p, "batch_stats": b}, x, train=True, mutable=["batch_stats"]
        )
        return out

    report(f"ResNet-50 tower B={batch} (true GF)", tower, (x, params, bstats),
           gflops=tower_gf, grad_wrt=(0, 1))

    # --- 3. projector matmuls (MXU sanity bar)
    h1 = jnp.asarray(rng.normal(size=(batch, 2048)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(2048, 8192)) * 0.02, jnp.bfloat16)
    h2 = jnp.asarray(rng.normal(size=(batch, 8192)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(8192, 8192)) * 0.01, jnp.bfloat16)
    report("proj (B,2048)@(2048,8192)", lambda a, b: a @ b, (h1, w1),
           gflops=2 * batch * 2048 * 8192 * GF, grad_wrt=(0, 1))
    report("proj (B,8192)@(8192,8192)", lambda a, b: a @ b, (h2, w2),
           gflops=2 * batch * 8192 * 8192 * GF, grad_wrt=(0, 1))


EXPS["barlowroof"] = exp_barlowroof


if __name__ == "__main__":
    argv = sys.argv[1:] or ["baseline"]
    print(f"devices: {jax.devices()}", flush=True)

    def _numeric(tok: str) -> bool:
        try:
            float(tok)
            return True
        except ValueError:
            return False

    # `name n1 n2 ...` = ONE experiment with positional numeric args (e.g.
    # `rcstack 1024 96 4 128 300`, `vitattn 16 785 384 6 128`); otherwise
    # every token is an experiment name run at its default shapes
    if argv[0] in EXPS and len(argv) > 1 and all(_numeric(a) for a in argv[1:]):
        nums = [int(a) if float(a) == int(float(a)) else float(a) for a in argv[1:]]
        try:
            EXPS[argv[0]](*nums)
        except Exception as e:
            print(f"[{argv[0]}] FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
    else:
        for name in argv:
            try:
                EXPS[name]()
            except Exception as e:
                print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
