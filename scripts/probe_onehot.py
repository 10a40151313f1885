"""Probe: cheaper one-hot builds inside the Pallas segment kernel.

docs/KERNEL.md "left on the table": the kernel's VPU cost is the weighted
one-hot build — an (R, T) int32 iota+compare, an f32 select, and (in bf16
mode) an (R, T) f32->bf16 convert, per chunk.  Candidates measured here on
the full jitted train step at reference scale (same harness as
probe_dsplit.py, the shipped-path baseline):

  A  shipped kernel                 (f32 w select, astype to msg dtype)
  B  bf16-stored weights            (select emits msg dtype directly; kills
                                     the (R, T) convert pass)
  C  int16 iota/lid compare         (16-bit lanes pack 2x on the VPU)
  D  B + C

Variants patch the module's kernels / plan builder; outputs are checked
equal to A (bf16 tolerance) before timing.

Usage: python scripts/probe_onehot.py [--precision bf16] [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _patched_kernels(int16_ids: bool):
    """Return (_segment_kernel, _window_kernel) variants."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    idt = jnp.int16 if int16_ids else jnp.int32

    def seg(block_ref, first_ref, lid_ref, w_ref, msg_ref, out_ref, *,
            R: int, T: int):
        step = pl.program_id(0)

        @pl.when(first_ref[step] == 1)
        def _zero():
            out_ref[:] = jnp.zeros_like(out_ref)

        lid = lid_ref[:].astype(idt)
        rows = jax.lax.broadcasted_iota(idt, (R, T), 0)
        onehot = jnp.where(rows == lid, w_ref[:], 0.0)
        out_ref[:] += jnp.dot(onehot.astype(msg_ref.dtype), msg_ref[:],
                              preferred_element_type=jnp.float32)

    def win(block_ref, first_ref, wstart_ref, lid_ref, w_ref, msg_ref,
            out_ref, *, R: int, T: int, W: int):
        step = pl.program_id(0)

        @pl.when(first_ref[step] == 1)
        def _zero():
            out_ref[:] = jnp.zeros_like(out_ref)

        lid = lid_ref[:].astype(idt)
        rows = jax.lax.broadcasted_iota(idt, (W, T), 0)
        onehot = jnp.where(rows == lid, w_ref[:], 0.0)
        upd = jnp.dot(onehot.astype(msg_ref.dtype), msg_ref[:],
                      preferred_element_type=jnp.float32)
        ws = pl.multiple_of(wstart_ref[step], 8)
        out_ref[pl.ds(ws, W), :] = out_ref[pl.ds(ws, W), :] + upd

    return seg, win


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--scale", default="ref")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from bench import build_graph
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models import (
        losses)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models.lightgcn import (
        LightGCN, ego_tables, init_params)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops import (
        spmm_pallas as sp)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (
        RecConfig)

    graph = build_graph(args.scale)
    E = graph.train_edges.shape[1]
    D, K, B = 64, 3, 4096
    cred = np.random.default_rng(0).uniform(
        0.2, 1.0, graph.num_users).astype(np.float32)
    rng = np.random.default_rng(1)
    users = jnp.asarray(rng.integers(0, graph.num_users, B), jnp.int32)
    pos = jnp.asarray(rng.integers(0, graph.num_items, B), jnp.int32)
    neg = jnp.asarray(rng.integers(0, graph.num_items, B), jnp.int32)
    items = jnp.concatenate([pos, neg])

    orig_seg, orig_win = sp._segment_kernel, sp._window_kernel
    orig_builder = sp.build_pallas_segment_plan

    def make_builder(bf16_w: bool):
        @functools.wraps(orig_builder)
        def builder(*a, **kw):
            plan = orig_builder(*a, **kw)
            if bf16_w and plan.msg_dtype != "float32":
                import dataclasses
                plan = dataclasses.replace(
                    plan, w_padded=plan.w_padded.astype(jnp.bfloat16))
            return plan
        return builder

    VARIANTS = {
        "A shipped": (False, False),
        "B bf16-w": (True, False),
        "C int16-ids": (False, True),
        "D bf16-w+int16": (True, True),
    }

    results, ref_out = {}, None
    for label, (bf16_w, int16_ids) in VARIANTS.items():
        if args.precision == "fp32" and bf16_w:
            continue
        sp.build_pallas_segment_plan = make_builder(bf16_w)
        seg, win = (_patched_kernels(True) if int16_ids
                    else (orig_seg, orig_win))
        sp._segment_kernel, sp._window_kernel = seg, win

        cfg = RecConfig(name="probe", propagation="gauss_seidel",
                        weight_mode="cu_message", table_layout="split",
                        emb_dim=D, num_layers=K, batch_size=B,
                        spmm_backend="pallas",
                        spmm_precision=args.precision)
        model = LightGCN(cfg, graph, cred)
        params = init_params(jax.random.PRNGKey(0), cfg, graph.num_users,
                             graph.num_items)
        optimizer = optax.adam(cfg.lr)
        opt_state = optimizer.init(params)
        bundle = model.state

        # correctness gate vs variant A (a variant that fails to compile on
        # this Mosaic stack is reported and skipped, not fatal)
        try:
            ue, ie = jax.jit(lambda p: model.propagate(p, bundle))(params)
            out = np.concatenate([np.asarray(ue).ravel(),
                                  np.asarray(ie).ravel()])
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"[onehot {args.precision}] {label}: COMPILE FAIL — {msg}",
                  flush=True)
            continue
        if ref_out is None:
            ref_out = out
        else:
            err = np.max(np.abs(out - ref_out))
            assert err < 1e-5, (label, err)

        def loss_fn(params):
            u_rows, i_rows = model.propagate_rows(params, users, items,
                                                  bundle)
            pos_s = jnp.sum(u_rows * i_rows[:B], axis=-1)
            neg_s = jnp.sum(u_rows * i_rows[B:], axis=-1)
            l = losses.bpr_loss(pos_s, neg_s)
            eu, ei = ego_tables(params, graph.num_users)
            return l + cfg.reg * losses.ego_l2(eu[users], ei[pos], ei[neg])

        def step(params, opt_state, t):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss + 0.0 * t

        jstep = jax.jit(step, donate_argnums=(0, 1))
        p = jax.tree.map(jnp.copy, params)
        o = jax.tree.map(jnp.copy, opt_state)
        for t in range(3):
            p, o, loss = jstep(p, o, float(t))
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for t in range(args.iters):
            p, o, loss = jstep(p, o, float(t))
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.iters
        results[label] = dt
        print(f"[onehot {args.precision}] {label}: {dt*1e3:.3f} ms/step "
              f"loss={float(loss):.4f}", flush=True)

    sp._segment_kernel, sp._window_kernel = orig_seg, orig_win
    sp.build_pallas_segment_plan = orig_builder

    base = results["A shipped"]
    edges_per_step = E * K * 2 * 2
    for label, dt in results.items():
        print(f"[onehot] {label}: {dt/base:.3f}x of shipped, "
              f"{edges_per_step/dt/1e6:.1f}M edges/s")


if __name__ == "__main__":
    main()
