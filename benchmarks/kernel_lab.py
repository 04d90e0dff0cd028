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


def timeit(fn, *args, n_small=3, n_large=13):
    for _ in range(2):
        out = fn(*args)
    _sync(out)
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
    leaf = jax.tree.leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])


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

if __name__ == "__main__":
    names = sys.argv[1:] or ["baseline"]
    print(f"devices: {jax.devices()}", flush=True)
    for name in names:
        try:
            EXPS[name]()
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
