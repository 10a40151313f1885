"""Probe: window-confined one-hot SpMM kernel variants on the real chip.

The current kernel builds a full (R, T) weighted one-hot per chunk; its MXU
cost is E_pad * R * D * 2 FLOPs.  Because edges are dst-sorted, the rows a
chunk touches form a CONTIGUOUS span — typically much narrower than R.  A
window variant builds only a (W, T) one-hot (W <= R) and accumulates at a
dynamic 8-aligned offset inside the block, cutting MXU FLOPs by R/W.

Variants measured at reference scale, both directions (items<-users dst=262K,
users<-items dst=59K):
  base      : current kernel (R=512, T=256)
  win{W}    : window kernel, W in {64,128,256}
  i16       : base kernel with int16 iota/lid compares
"""
import functools
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


# ---------------------------------------------------------------- window plan

def build_window_plan(src, dst, w, num_dst, R=512, T=256, W=256):
    """Chunks additionally confined to a W-row window (8-aligned start)."""
    E = len(src)
    dst = np.asarray(dst, np.int64)
    num_blocks = max(-(-num_dst // R), 1)
    blk_of_edge = dst // R
    lid_all = (dst - blk_of_edge * R).astype(np.int64)

    # greedy chunking per block: <=T edges AND row span inside an 8-aligned
    # W window, window start clamped to R-W
    chunks = []  # (block, estart, eend, win_start)
    edge_start = np.zeros(num_blocks + 1, np.int64)
    counts = np.bincount(blk_of_edge, minlength=num_blocks)
    np.cumsum(counts, out=edge_start[1:])
    for b in range(num_blocks):
        s, e = int(edge_start[b]), int(edge_start[b + 1])
        if s == e:
            chunks.append((b, s, s, 0))
            continue
        i = s
        lids = lid_all
        while i < e:
            ws = min((int(lids[i]) // 8) * 8, R - W)
            # furthest edge with lid < ws + W
            j = int(np.searchsorted(lids[s:e], ws + W, side="left")) + s
            j = min(j, i + T, e)
            chunks.append((b, i, j, ws))
            i = j

    G = len(chunks)
    E_pad = G * T
    src_p = np.zeros(E_pad, np.int32)
    w_p = np.zeros(E_pad, np.float32)
    lid_p = np.full(E_pad, W, np.int32)
    block_id = np.zeros(G, np.int32)
    wstart = np.zeros(G, np.int32)
    first = np.zeros(G, np.int32)
    prev_b = -1
    for g, (b, i, j, ws) in enumerate(chunks):
        n = j - i
        src_p[g * T:g * T + n] = src[i:j]
        w_p[g * T:g * T + n] = w[i:j]
        lid_p[g * T:g * T + n] = lid_all[i:j] - ws
        block_id[g] = b
        wstart[g] = ws
        if b != prev_b:
            first[g] = 1
            prev_b = b
    assert lid_p.max() <= W and lid_p.min() >= 0
    return dict(src=jnp.asarray(src_p), w=jnp.asarray(w_p.reshape(1, E_pad)),
                lid=jnp.asarray(lid_p.reshape(1, E_pad)),
                block=jnp.asarray(block_id), wstart=jnp.asarray(wstart),
                first=jnp.asarray(first), G=G, R=R, T=T, W=W,
                num_blocks=num_blocks, num_dst=num_dst, E=E, E_pad=E_pad)


def _window_kernel(block_ref, first_ref, wstart_ref, lid_ref, w_ref, msg_ref,
                   out_ref, *, R, T, W):
    from jax.experimental import pallas as pl
    step = pl.program_id(0)

    @pl.when(first_ref[step] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    lid = lid_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)
    onehot = jnp.where(rows == lid, w_ref[:], 0.0)
    upd = jnp.dot(onehot.astype(msg_ref.dtype), msg_ref[:],
                  preferred_element_type=jnp.float32)
    ws = pl.multiple_of(wstart_ref[step], 8)
    out_ref[pl.ds(ws, W), :] = out_ref[pl.ds(ws, W), :] + upd


def apply_window(plan, x):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    R, T, W, G = plan["R"], plan["T"], plan["W"], plan["G"]
    D = x.shape[-1]
    msg = x[plan["src"]]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, T), lambda g, blk, first, ws: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda g, blk, first, ws: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, D), lambda g, blk, first, ws: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, D), lambda g, blk, first, ws: (blk[g], 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_window_kernel, R=R, T=T, W=W)
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan["num_blocks"] * R, D),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * W * T * D,
            bytes_accessed=msg.size * 4 + plan["num_blocks"] * R * D * 4,
            transcendentals=0),
    )(plan["block"], plan["first"], plan["wstart"], plan["lid"],
      plan["w"], msg)
    return y[:plan["num_dst"]]


# ------------------------------------------------------------------- int16

def _i16_kernel(block_ref, first_ref, lid_ref, w_ref, msg_ref, out_ref, *,
                R, T):
    from jax.experimental import pallas as pl
    step = pl.program_id(0)

    @pl.when(first_ref[step] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    lid = lid_ref[:].astype(jnp.int16)
    rows = jax.lax.broadcasted_iota(jnp.int16, (R, T), 0)
    onehot = jnp.where(rows == lid, w_ref[:], 0.0)
    out_ref[:] += jnp.dot(onehot.astype(msg_ref.dtype), msg_ref[:],
                          preferred_element_type=jnp.float32)


def apply_i16(plan, x):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    R, T = plan.block_rows, plan.chunk_edges
    D = x.shape[-1]
    G = plan.local_ids.shape[1] // T
    msg = x[plan.src_padded]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
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
    kernel = functools.partial(_i16_kernel, R=R, T=T)
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_blocks * R, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(plan.block_id, plan.first_chunk, plan.local_ids, plan.w_padded, msg)
    return y[:plan.num_dst]


def main():
    graph = synthetic_bipartite_graph(58_867, 261_728, 7.9, seed=0, power=1.0)
    src_u, dst_i = np.asarray(graph.train_edges[0]), np.asarray(
        graph.train_edges[1])
    rng = np.random.default_rng(0)
    w = rng.random(len(src_u)).astype(np.float32)
    D = 64

    for name, (src, dst, num_src, num_dst) in {
        "items<-users": (src_u, dst_i, graph.num_users, graph.num_items),
        "users<-items": (dst_i, src_u, graph.num_items, graph.num_users),
    }.items():
        order = np.argsort(dst, kind="stable")
        src_s, dst_s, w_s = src[order].astype(np.int32), dst[order], w[order]
        x = jnp.asarray(rng.standard_normal((num_src, D)), jnp.float32)
        seg0 = jnp.zeros((num_dst, D), jnp.float32)
        gN = jnp.asarray(rng.standard_normal((num_dst, D)), jnp.float32)
        t_add = device_loop_time(lambda i, a: a + gN * (1.0 + 1e-30 * i), seg0)

        base_plan = build_pallas_segment_plan(src_s, dst_s, w_s, num_dst,
                                              num_src=num_src)
        y_ref = np.asarray(apply_pallas(base_plan, x))
        t = device_loop_time(
            lambda i, a: a + apply_pallas(base_plan, x * (1.0 + 1e-30 * i)),
            seg0) - t_add
        E_pad0 = base_plan.local_ids.shape[1]
        print(f"{name} base R=512      : {t*1e3:7.3f} ms  E_pad={E_pad0}")

        try:
            ti = device_loop_time(
                lambda i, a: a + apply_i16(base_plan, x * (1.0 + 1e-30 * i)),
                seg0) - t_add
            yi = np.asarray(apply_i16(base_plan, x))
            err = np.abs(yi - y_ref).max()
            print(f"{name} i16  R=512      : {ti*1e3:7.3f} ms  maxerr={err:.2e}")
        except Exception as ex:  # noqa: BLE001
            print(f"{name} i16: FAILED {type(ex).__name__}: {str(ex)[:200]}")

        for W in (64, 128, 256):
            try:
                plan = build_window_plan(src_s, dst_s, w_s, num_dst, W=W)
                tw = device_loop_time(
                    lambda i, a, p=plan: a + apply_window(
                        p, x * (1.0 + 1e-30 * i)), seg0) - t_add
                yw = np.asarray(apply_window(plan, x))
                err = np.abs(yw - y_ref).max()
                pad = plan["E_pad"] / plan["E"] - 1
                print(f"{name} win  W={W:3d}      : {tw*1e3:7.3f} ms  "
                      f"pad=+{pad*100:.0f}%  maxerr={err:.2e}")
            except Exception as ex:  # noqa: BLE001
                print(f"{name} win W={W}: FAILED {type(ex).__name__}: "
                      f"{str(ex)[:200]}")


if __name__ == "__main__":
    main()
