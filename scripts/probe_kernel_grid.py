"""Probe 2: (T, W) grid per direction + padded-chain propagate.

Measures, at reference scale:
  * apply time for each direction over T in {128, 256} x W in {64,128,256,512}
    (W = R = 512 means the current full-block kernel)
  * a K=3 Gauss-Seidel chain that stays in padded block space (no per-apply
    truncation/astype) vs the current propagate
"""
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (  # noqa: E402
    synthetic_bipartite_graph)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.spmm_pallas import (  # noqa: E402
    build_pallas_segment_plan, apply_pallas)
from probe_window_kernel import build_window_plan, apply_window  # noqa: E402

INNER = 20


def device_loop_time(make_body, carry0, iters=INNER, reps=3):
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
    graph = synthetic_bipartite_graph(58_867, 261_728, 7.9, seed=0, power=1.0)
    src_u = np.asarray(graph.train_edges[0])
    dst_i = np.asarray(graph.train_edges[1])
    rng = np.random.default_rng(0)
    w = rng.random(len(src_u)).astype(np.float32)
    D = 64
    U, I = graph.num_users, graph.num_items

    dirs = {
        "items<-users": (src_u, dst_i, U, I),
        "users<-items": (dst_i, src_u, I, U),
    }
    best = {}
    for name, (src, dst, num_src, num_dst) in dirs.items():
        order = np.argsort(dst, kind="stable")
        src_s = src[order].astype(np.int32)
        dst_s, w_s = dst[order], w[order]
        x = jnp.asarray(rng.standard_normal((num_src, D)), jnp.float32)
        seg0 = jnp.zeros((num_dst, D), jnp.float32)
        gN = jnp.asarray(rng.standard_normal((num_dst, D)), jnp.float32)
        t_add = device_loop_time(lambda i, a: a + gN * (1.0 + 1e-30 * i), seg0)

        base = build_pallas_segment_plan(src_s, dst_s, w_s, num_dst,
                                         num_src=num_src)
        y_ref = np.asarray(apply_pallas(base, x))
        results = []
        for T in (128, 256, 512):
            plan = build_pallas_segment_plan(src_s, dst_s, w_s, num_dst,
                                             num_src=num_src, chunk_edges=T)
            t = device_loop_time(
                lambda i, a, p=plan: a + apply_pallas(
                    p, x * (1.0 + 1e-30 * i)), seg0) - t_add
            pad = plan.local_ids.shape[1] / len(src_s) - 1
            print(f"{name} base T={T:3d} W=512: {t*1e3:7.3f} ms  "
                  f"pad=+{pad*100:.0f}%")
            results.append((t, f"base T={T}"))
            for W in (64, 128, 256):
                try:
                    wplan = build_window_plan(src_s, dst_s, w_s, num_dst,
                                              T=T, W=W)
                    tw = device_loop_time(
                        lambda i, a, p=wplan: a + apply_window(
                            p, x * (1.0 + 1e-30 * i)), seg0) - t_add
                    yw = np.asarray(apply_window(wplan, x))
                    err = np.abs(yw - y_ref).max()
                    pad = wplan["E_pad"] / wplan["E"] - 1
                    print(f"{name} win  T={T:3d} W={W:3d}: {tw*1e3:7.3f} ms  "
                          f"pad=+{pad*100:.0f}%  maxerr={err:.1e}")
                    results.append((tw, f"win T={T} W={W}"))
                except Exception as ex:  # noqa: BLE001
                    print(f"{name} win T={T} W={W}: FAILED "
                          f"{type(ex).__name__}: {str(ex)[:120]}")
        results.sort()
        best[name] = results[0]
        print(f"{name} BEST: {results[0][1]} {results[0][0]*1e3:.3f} ms")

    # ---- padded-chain K=3 GS propagate vs current --------------------------
    order_i = np.argsort(dst_i, kind="stable")
    ifu = build_pallas_segment_plan(src_u[order_i].astype(np.int32),
                                    dst_i[order_i], w[order_i], I, num_src=U)
    order_u = np.argsort(src_u, kind="stable")
    ufi = build_pallas_segment_plan(dst_i[order_u].astype(np.int32),
                                    src_u[order_u], w[order_u], U, num_src=I)
    R = 512
    U_pad = ifu.num_blocks * 0 + (-(-U // R)) * R
    I_pad = (-(-I // R)) * R
    u0 = jnp.asarray(rng.standard_normal((U, D)), jnp.float32)
    i0 = jnp.asarray(rng.standard_normal((I, D)), jnp.float32)

    def prop_current(u, i):
        acc_u, acc_i = u, i
        for _ in range(3):
            i = apply_pallas(ifu, u)
            u = apply_pallas(ufi, i)
            acc_u = acc_u + u
            acc_i = acc_i + i
        return (acc_u / 4).sum() + (acc_i / 4).sum()

    t_cur = device_loop_time(
        lambda k, a: a + prop_current(u0 * (1.0 + 1e-30 * k), i0),
        jnp.zeros(()))
    print(f"propagate current (trunc/astype per apply): {t_cur*1e3:7.3f} ms")

    def apply_nopad_trunc(plan, x_pad):
        """Like apply_pallas but gathers from the padded table and returns
        the padded output (no truncation)."""
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.spmm_pallas import (
            _segment_kernel)
        R, T = plan.block_rows, plan.chunk_edges
        G = plan.local_ids.shape[1] // T
        msg = x_pad[plan.src_padded]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(G,),
            in_specs=[
                pl.BlockSpec((1, T), lambda g, blk, first: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T), lambda g, blk, first: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, D), lambda g, blk, first: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, D), lambda g, blk, first: (blk[g], 0),
                                   memory_space=pltpu.VMEM),
        )
        kernel = functools.partial(_segment_kernel, R=R, T=T)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((plan.num_blocks * R, D),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(plan.block_id, plan.first_chunk, plan.local_ids, plan.w_padded, msg)

    def prop_padded(u, i):
        u = jnp.pad(u, ((0, U_pad - U), (0, 0)))
        i = jnp.pad(i, ((0, I_pad - I), (0, 0)))
        acc_u, acc_i = u, i
        for _ in range(3):
            i = apply_nopad_trunc(ifu, u)
            u = apply_nopad_trunc(ufi, i)
            acc_u = acc_u + u
            acc_i = acc_i + i
        return (acc_u / 4).sum() + (acc_i / 4).sum()

    # correctness
    a = float(jax.jit(prop_current)(u0, i0))
    b = float(jax.jit(prop_padded)(u0, i0))
    print(f"chain sums: current={a:.4f} padded={b:.4f}")
    t_pad = device_loop_time(
        lambda k, a: a + prop_padded(u0 * (1.0 + 1e-30 * k), i0),
        jnp.zeros(()))
    print(f"propagate padded-chain                    : {t_pad*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
