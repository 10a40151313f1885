"""Microbenchmarks for the SpMM primitive costs on the real chip.

All measurement happens on-device inside a single ``lax.fori_loop`` dispatch
(the axon tunnel makes per-dispatch host timing unreliable).  Each iteration
shifts the gather indices so XLA cannot CSE iterations; the loop carry
accumulates the output so nothing is dead-code-eliminated.  The cost of the
carry add-pass is measured separately and subtracted.
"""
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

INNER = 20


def device_loop_time(make_body, carry0, iters=INNER, reps=2):
    """Time one jitted dispatch of `iters` chained body applications."""
    @jax.jit
    def run(carry):
        return lax.fori_loop(0, iters, make_body, carry)

    out = run(carry0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(carry0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    rng = np.random.default_rng(0)
    N = 262_144
    E = 360_207

    for D in (64, 128):
        x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, E), jnp.int32)
        dst = jnp.sort(jnp.asarray(rng.integers(0, N, E), jnp.int32))
        w = jnp.asarray(rng.random(E), jnp.float32)
        acc0 = jnp.zeros((E, D), jnp.float32)
        seg0 = jnp.zeros((N, D), jnp.float32)

        # carry add-pass baseline (read acc + read g + write acc)
        g = jnp.asarray(rng.standard_normal((E, D)), jnp.float32)
        t_add = device_loop_time(lambda i, a: a + g * (1.0 + 1e-30 * i), acc0)

        t_gather = device_loop_time(
            lambda i, a: a + x[(idx + i) % N], acc0) - t_add
        sys.stderr.write("."); print(f"D={D} gather rand  : {t_gather*1e3:7.3f} ms  "
              f"{t_gather/E*1e9:6.2f} ns/row  {E*D*4/t_gather/1e9:6.1f} GB/s")

        t_addN = device_loop_time(
            lambda i, a: a + g[:N] * (1.0 + 1e-30 * i), seg0)
        t_seg = device_loop_time(
            lambda i, a: a + jax.ops.segment_sum(
                x[(idx + i) % N] * w[:, None], dst, num_segments=N,
                indices_are_sorted=True), seg0) - t_addN
        print(f"D={D} gather+segsum: {t_seg*1e3:7.3f} ms")

    # pallas kernel on PREGATHERED messages (isolates one-hot matmul cost)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.spmm_pallas import (
        build_pallas_segment_plan, apply_pallas)
    D = 64
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    src = rng.integers(0, N, E).astype(np.int32)
    dst = np.sort(rng.integers(0, N, E)).astype(np.int32)
    w = rng.random(E).astype(np.float32)
    seg0 = jnp.zeros((N, D), jnp.float32)
    gN = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    t_addN = device_loop_time(lambda i, a: a + gN * (1.0 + 1e-30 * i), seg0)
    for R, T in ((512, 256), (128, 256), (128, 128)):
        plan = build_pallas_segment_plan(src, dst, w, N, num_src=N,
                                         block_rows=R, chunk_edges=T)
        G = plan.local_ids.shape[1] // T
        t = device_loop_time(
            lambda i, a, plan=plan: a + apply_pallas(
                plan, x * (1.0 + 1e-30 * i)), seg0) - t_addN
        print(f"pallas spmm R={R:5d} T={T:3d}: {t*1e3:7.3f} ms  G={G} "
              f"onehot={2*G*R*T*D/1e9:5.1f} GFLOP "
              f"-> {2*G*R*T*D/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
