"""Probe: split one SpMM into S destination slices (independent
gather->kernel pairs) so XLA can overlap slice s+1's HBM gather with slice
s's MXU kernel.  The measured ~2.4 ms/SpMM is a serial chain
gather(1.3ms) -> kernel(0.8ms); overlap could hide the smaller of the two.
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (  # noqa: E402
    synthetic_bipartite_graph)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.operators import (  # noqa: E402
    build_edge_maps)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.spmm_pallas import (  # noqa: E402
    apply_pallas, build_pallas_segment_plan)


def chain_time(fn, state, iters=30, warmup=5):
    for _ in range(warmup):
        state = fn(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / iters


def sliced_plans(src, dst, w, num_dst, num_src, S, R=512, T=256):
    """Split dst-sorted edges into S slices on block-aligned dst cuts."""
    plans, row0 = [], 0
    blocks = -(-num_dst // R)
    for s in range(S):
        b_lo = blocks * s // S
        b_hi = blocks * (s + 1) // S
        lo, hi = b_lo * R, min(b_hi * R, num_dst)
        e_lo = np.searchsorted(dst, lo, side="left")
        e_hi = np.searchsorted(dst, hi, side="left")
        plans.append(build_pallas_segment_plan(
            src[e_lo:e_hi], dst[e_lo:e_hi] - lo, w[e_lo:e_hi],
            hi - lo, num_src=num_src, block_rows=R, chunk_edges=T,
            window="auto"))
        row0 = hi
    assert row0 == num_dst
    return plans


def main():
    graph = synthetic_bipartite_graph(58_867, 261_728, 7.9, seed=0, power=1.0)
    cred = np.random.default_rng(0).uniform(
        0.2, 1.0, graph.num_users).astype(np.float32)
    ifu_map, ufi_map = build_edge_maps(graph, "cu_message", cred)

    for name, em in (("i<-u (262K dst)", ifu_map), ("u<-i (59K dst)",
                                                    ufi_map)):
        order = np.argsort(em.dst, kind="stable")
        src = np.asarray(em.src[order], np.int32)
        dst = np.asarray(em.dst[order], np.int64)
        w = np.asarray(em.w[order], np.float32)

        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (em.num_src, 64)), jnp.float32)

        full = build_pallas_segment_plan(src, dst, w, em.num_dst,
                                         num_src=em.num_src, window="auto")

        @jax.jit
        def apply_full(x, plan=full):
            y = apply_pallas(plan, x)
            return x + 1e-12 * y[:x.shape[0]].sum(0, keepdims=True)

        t = chain_time(lambda xx: apply_full(xx), x)
        print(f"{name} S=1: {t*1e3:7.3f} ms  (E_pad={full.src_padded.shape[0]})")

        for S in (2, 3, 4, 6):
            plans = sliced_plans(src, dst, w, em.num_dst, em.num_src, S)

            def apply_sliced(x, plans=tuple(plans)):
                ys = [apply_pallas(p, x) for p in plans]
                y = jnp.concatenate(ys, axis=0)
                return x + 1e-12 * y[:x.shape[0]].sum(0, keepdims=True)

            aps = jax.jit(apply_sliced)
            t = chain_time(lambda xx: aps(xx), x)
            epad = sum(p.src_padded.shape[0] for p in plans)
            print(f"{name} S={S}: {t*1e3:7.3f} ms  (E_pad={epad})")


if __name__ == "__main__":
    main()
