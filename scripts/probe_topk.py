"""Probe: device-side cost split of full-catalog eval at the 10M scale.

Full eval dominates the scaled_10m protocol (~61 s/eval vs 2.6 s/train
epoch; host exclusion rows measure 0.3 s/full-eval, so the cost is
device-side).  Per 512-user batch over a 1M-item catalog this measures:

  B  scores matmul only                 (512,128)@(128,1M)
  C  + exclusion scatter                (rows set to -1e9)
  A  + lax.top_k(I -> 20)               (the shipped _full_batch shape)
  D  chunked top-k                      per-chunk top_k then merge — same
                                        top-K set (ties aside); XLA's
                                        full-width top_k is the suspect
  E  bf16 scores + chunked top-k        halves matmul+sort bandwidth

Usage: python scripts/probe_topk.py [--iters 8] [--chunks 32]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--chunks", type=int, default=32)
    ap.add_argument("--K", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    B, D, I, K, C = (args.batch, args.dim, args.items, args.K, args.chunks)
    rng = np.random.default_rng(0)
    ue = jnp.asarray(rng.normal(size=(B, D)) * 0.1, jnp.float32)
    ie = jnp.asarray(rng.normal(size=(I, D)) * 0.1, jnp.float32)
    excl = jnp.asarray(rng.integers(0, I, (B, 64)), jnp.int32)

    def scores_of(ue, ie, t):
        return (ue + 0.0 * t) @ ie.T

    def masked(ue, ie, excl, t):
        s = scores_of(ue, ie, t)
        pad = jnp.zeros((B, 1), s.dtype)
        ext = jnp.concatenate([s, pad], axis=1)
        rows = jnp.arange(B)[:, None]
        ext = ext.at[rows, excl].set(-1e9)
        return ext[:, :-1]

    def masked_drop(ue, ie, excl, t):
        s = scores_of(ue, ie, t)
        rows = jnp.arange(B)[:, None]
        # pad slots hold index I (out of range) -> dropped by the scatter
        return s.at[rows, excl].set(-1e9, mode="drop")

    def chunked_topk(s):
        v, i = lax.top_k(s.reshape(B, C, I // C), K)          # (B, C, K)
        base = (jnp.arange(C, dtype=jnp.int32) * (I // C))[None, :, None]
        gi = (i.astype(jnp.int32) + base).reshape(B, C * K)
        v2, j = lax.top_k(v.reshape(B, C * K), K)
        return v2, jnp.take_along_axis(gi, j, axis=1)

    variants = {
        "B matmul": lambda ue, ie, excl, t: scores_of(ue, ie, t).max(),
        "C +exclusion": lambda ue, ie, excl, t: masked(ue, ie, excl, t).max(),
        "A +top_k(full)": lambda ue, ie, excl, t: lax.top_k(
            masked(ue, ie, excl, t), K)[1].sum(),
        "D chunked top-k": lambda ue, ie, excl, t: chunked_topk(
            masked(ue, ie, excl, t))[1].sum(),
        "E bf16 + chunked": lambda ue, ie, excl, t: chunked_topk(
            masked(ue.astype(jnp.bfloat16), ie.astype(jnp.bfloat16),
                   excl, t).astype(jnp.float32))[1].sum(),
        # lax.approx_max_k is THE TPU-native top-k (PartialReduce op);
        # recall_target bounds the chance of missing a true top-K item
        "F approx_max_k .99": lambda ue, ie, excl, t: lax.approx_max_k(
            masked(ue, ie, excl, t), K, recall_target=0.99)[1].sum(),
        "G approx_max_k .95": lambda ue, ie, excl, t: lax.approx_max_k(
            masked(ue, ie, excl, t), K, recall_target=0.95)[1].sum(),
        "H top_k on bf16": lambda ue, ie, excl, t: lax.top_k(
            masked(ue, ie, excl, t).astype(jnp.bfloat16), K)[1].sum(),
        # drop-mode scatter: no pad-column concat+slice passes over (B, I)
        "I dropmask+approx": lambda ue, ie, excl, t: lax.approx_max_k(
            masked_drop(ue, ie, excl, t), K, recall_target=0.99)[1].sum(),
        "J bf16+drop+approx": lambda ue, ie, excl, t: lax.approx_max_k(
            masked_drop(ue.astype(jnp.bfloat16), ie.astype(jnp.bfloat16),
                        excl, t).astype(jnp.float32), K,
            recall_target=0.99)[1].sum(),
    }

    # correctness: chunked top-k set == full top_k set (random floats, no ties)
    a = np.asarray(lax.top_k(masked(ue, ie, excl, 0.0), K)[1])
    d = np.asarray(chunked_topk(masked(ue, ie, excl, 0.0))[1])
    same = np.mean([set(a[r]) == set(d[r]) for r in range(B)])
    print(f"[topk] chunked == full top-K set on {same*100:.1f}% of rows",
          flush=True)

    for name, fn in variants.items():
        jfn = jax.jit(fn)
        out = jfn(ue, ie, excl, 0.0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        acc = 0.0
        for t in range(args.iters):
            acc = acc + jfn(ue, ie, excl, float(t))
        jax.block_until_ready(acc)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"[topk] {name:18s}: {dt*1e3:7.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
