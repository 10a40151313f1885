"""Probe: Adam update cost at reference scale — optax vs hand-fused jnp vs
a single-pass Pallas kernel.

The measured train-step breakdown (docs/KERNEL.md) attributes ~2.3 ms to
Adam fusions; the payload bound (p,g,m,v reads + p,m,v writes over the
58.9K- and 262K-row x 64 tables) is ~0.7 ms on v5e HBM.  This probe decides
whether a custom kernel closes that gap before we build one.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

U, I, D = 58_867, 261_728, 64
B1, B2, EPS = 0.9, 0.999, 1e-8


def mk(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(
        shape, dtype=np.float32))


params = {"u": mk((U, D), 0), "i": mk((I, D), 1)}
grads = {"u": mk((U, D), 2) * 1e-3, "i": mk((I, D), 3) * 1e-3}
LR = 1e-3

# ---------------------------------------------------------------- optax
opt = optax.adam(LR)


@jax.jit
def step_optax(params, grads, opt_state):
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


# ------------------------------------------------------------ manual jnp
@jax.jit
def step_manual(params, grads, m, v, t):
    t = t + 1
    a = LR / (1 - B1 ** t)
    b = 1.0 / jnp.sqrt(1 - B2 ** t)

    def leaf(p, g, m_, v_):
        m2 = B1 * m_ + (1 - B1) * g
        v2 = B2 * v_ + (1 - B2) * g * g
        return p - a * m2 / (jnp.sqrt(v2) * b + EPS), m2, v2

    out = jax.tree.map(leaf, params, grads, m, v)
    new_p = {k: o[0] for k, o in out.items()}
    new_m = {k: o[1] for k, o in out.items()}
    new_v = {k: o[2] for k, o in out.items()}
    return new_p, new_m, new_v, t


# ---------------------------------------------------------------- pallas
def _adam_kernel(sc_ref, p_ref, g_ref, m_ref, v_ref, po_ref, mo_ref, vo_ref):
    a = sc_ref[0]
    b = sc_ref[1]
    g = g_ref[...]
    m2 = B1 * m_ref[...] + (1 - B1) * g
    v2 = B2 * v_ref[...] + (1 - B2) * g * g
    mo_ref[...] = m2
    vo_ref[...] = v2
    po_ref[...] = p_ref[...] - a * m2 / (jnp.sqrt(v2) * b + EPS)


def pallas_adam_leaf(p, g, m, v, scalars, block_rows=4096):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    N, D = p.shape
    R = min(block_rows, N)
    nblk = -(-N // R)
    spec = pl.BlockSpec((R, D), lambda i, sc: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _adam_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nblk,),
            in_specs=[spec] * 4, out_specs=[spec] * 3),
        out_shape=[jax.ShapeDtypeStruct(p.shape, jnp.float32)] * 3,
    )(scalars, p, g, m, v)
    return out


@jax.jit
def step_pallas(params, grads, m, v, t):
    t = t + 1
    a = LR / (1 - B1 ** t)
    b = 1.0 / jnp.sqrt(1 - B2 ** t)
    scalars = jnp.stack([a, b]).astype(jnp.float32)
    new_p, new_m, new_v = {}, {}, {}
    for k in params:
        new_p[k], new_m[k], new_v[k] = pallas_adam_leaf(
            params[k], grads[k], m[k], v[k], scalars)
    return new_p, new_m, new_v, t


def bench(fn, *args, iters=200):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def bench_chained(fn, state, iters=100):
    """Thread evolving state through each call — identical-input repeat
    calls appear deduped/cached by the remote runtime (impossibly-fast
    timings otherwise)."""
    state = fn(*state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(*state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / iters * 1e3


print("platform:", jax.devices()[0])
opt_state = opt.init(params)
print("optax     :",
      bench_chained(lambda p, s: step_optax(p, grads, s),
                    (params, opt_state)), "ms")

zeros = jax.tree.map(jnp.zeros_like, params)
t0 = jnp.zeros((), jnp.float32)
print("manual jnp:",
      bench_chained(lambda p, m, v, t: step_manual(p, grads, m, v, t),
                    (params, zeros, zeros, t0)), "ms")

try:
    p1, m1, v1, _ = step_pallas(params, grads, zeros, zeros, t0)
    p2, m2, v2, _ = step_manual(params, grads, zeros, zeros, t0)
    err = max(float(jnp.max(jnp.abs(p1[k] - p2[k]))) for k in p1)
    print("pallas max|dp| vs manual:", err)
    print("pallas    :",
          bench_chained(lambda p, m, v, t: step_pallas(p, grads, m, v, t),
                        (params, zeros, zeros, t0)), "ms")
except Exception as e:
    print("pallas FAILED:", repr(e)[:500])

# payload bound: reads p,g,m,v + writes p,m,v = 7 arrays
total = (U + I) * D * 4
print(f"payload bound ~{7 * total / 819e9 * 1e3:.2f} ms")
