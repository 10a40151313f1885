"""Probe: alias-table vs inverse-CDF searchsorted popularity draw.

VERDICT r2 item 6 asked for the bench note alongside the alias sampler:
the alias draw is two gathers + a compare (O(1)); the float32 inverse-CDF
it replaced is a log2(I)-deep searchsorted AND collapses numerically at
north-star catalogs (adjacent CDF entries collide below the float32 ULP
near 1.0 — tail items become unsamplable; tests/test_sampling.py proves
exactness at 1M items).  This probe measures the raw draw cost at the
reference catalog (262K items) and the north-star catalog (10M items).

Usage: python scripts/probe_alias.py [--iters 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--rounds", type=int, default=9)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.sampling import (
        PopMixSampler)

    shape = (args.batch, args.rounds)
    for I in (261_728, 10_000_000):
        rng = np.random.default_rng(0)
        # zipf-ish degrees like a real catalog
        deg = (rng.pareto(1.1, I) * 3).astype(np.int64)
        sampler = PopMixSampler.build(deg)
        pop = np.power(deg.astype(np.float64) + 1.0, 0.75)
        cdf32 = jnp.asarray(np.cumsum(pop / pop.sum()), jnp.float32)

        def draw_alias(key, t):
            k = jax.random.fold_in(key, t)
            return sampler.draw(k, shape).sum()

        def draw_cdf(key, t):
            k = jax.random.fold_in(key, t)
            ku, km, kc = jax.random.split(k, 3)
            use_pop = jax.random.uniform(km, shape) < sampler.mix_pop
            u = jax.random.uniform(kc, shape)
            pop_draw = jnp.searchsorted(cdf32, u).astype(jnp.int32)
            pop_draw = jnp.clip(pop_draw, 0, I - 1)
            uni = jax.random.randint(ku, shape, 0, I)
            return jnp.where(use_pop, pop_draw, uni).sum()

        for name, fn in (("alias", draw_alias), ("cdf32", draw_cdf)):
            jfn = jax.jit(fn)
            key = jax.random.PRNGKey(0)
            s = jfn(key, 0)
            jax.block_until_ready(s)
            t0 = time.perf_counter()
            acc = 0
            for t in range(args.iters):
                acc = acc + jfn(key, t)
            jax.block_until_ready(acc)
            dt = (time.perf_counter() - t0) / args.iters
            n_draws = args.batch * args.rounds
            print(f"[alias] I={I:>10,} {name}: {dt*1e6:8.1f} us/draw-batch "
                  f"({dt/n_draws*1e9:6.2f} ns/draw)", flush=True)


if __name__ == "__main__":
    main()
