"""Distributed full-catalog top-k retrieval.

BASELINE.json north star: "dense scoring (dot-product recall@k over full
item catalog) is a data-parallel top-k kernel ... evaluation via sharded
matmul + distributed top-k".

Scheme: the item table is row-sharded over the ``model`` axis.  Inside
``shard_map`` each device scores the user batch against ITS item shard
(dense (B, D) x (D, I/P) matmul on the MXU), takes a local top-k, offsets
the local indices into global item ids, all-gathers the (B, P*k) candidate
sets over ICI, and reduces with a final top-k.  Communication is O(B*k*P)
instead of O(B*I).

Fast modes (VERDICT r4 item 4 — the scaled_10m preset's eval flags are
honored under a mesh, not dropped):

  * ``method="approx"`` — the LOCAL per-shard top-k uses
    ``lax.approx_max_k`` (TPU PartialReduce, recall_target 0.99/entry);
    the final (B, P*k) candidate merge stays EXACT.  Composes cleanly:
    each shard's scoring is exactly the single-chip approx path over its
    item slice.
  * ``score_dtype="bf16"`` — the per-shard score matmul + local ranking
    run in bfloat16 (halves shard score-matrix bandwidth, same win as the
    single-chip path); the final merge compares in fp32.

Both default off (exact fp32 = parity).  Non-finite local candidates
(pad rows, excluded items surfacing from an all-excluded approx bin) are
demoted to the out-of-range id ``num_items`` so they can never count as
hits or coverage downstream — mirroring eval/ranking.py's single-chip
sentinel rule.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import MODEL_AXIS


class ShardedTopK:
    """Row-sharded dot-product retrieval over a device mesh."""

    def __init__(self, mesh: Mesh, num_items: int):
        self.mesh = mesh
        self.num_items = num_items
        self.n_dev = mesh.shape[MODEL_AXIS]
        self.rows_per = -(-num_items // self.n_dev)
        self.padded_items = self.rows_per * self.n_dev
        # compiled fns keyed by (k, method, score_dtype, has_exclude) —
        # rebuilding the shard_map per batch would retrace every call
        self._fn_cache = {}

    def pad_items(self, item_emb: jax.Array) -> jax.Array:
        """Pad the item table to shardable row count (pad rows score -inf
        via a validity mask applied at query time)."""
        I = item_emb.shape[0]
        if I == self.padded_items:
            return item_emb
        return jnp.zeros((self.padded_items, item_emb.shape[1]),
                         item_emb.dtype).at[:I].set(item_emb)

    def _build(self, k: int, method: str, score_dtype: str,
               has_exclude: bool):
        mesh = self.mesh
        rows_per = self.rows_per
        num_items = self.num_items
        k_local = min(k, rows_per)

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P(MODEL_AXIS, None), P()),
            out_specs=(P(), P()),
            # outputs ARE replicated (tiled all_gather over the model axis);
            # the static varying-mesh-axes check can't infer that
            check_vma=False)
        def shard_fn(u, items_local, excl):
            dev = jax.lax.axis_index(MODEL_AXIS)
            if score_dtype == "bf16":
                # bf16 shard matmul + local ranking (single-chip
                # eval_score_dtype semantics per item shard); the final
                # merge below compares in fp32
                u = u.astype(jnp.bfloat16)
                items_local = items_local.astype(jnp.bfloat16)
            scores = u @ items_local.T                       # (B, rows_per)
            base = dev * rows_per
            gids = base + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1)
            valid = gids < num_items
            scores = jnp.where(valid, scores, -jnp.inf)
            if has_exclude:
                # mask BEFORE the local top-k: a hub user whose seen items
                # dominate one shard must not crowd out valid candidates.
                # out-of-shard ids map to rows_per -> mode="drop" discards
                # them (no pad-column concat+slice passes over the scores)
                B = scores.shape[0]
                loc = excl - base
                in_range = (loc >= 0) & (loc < rows_per)
                col = jnp.where(in_range, loc, rows_per)
                rows = jnp.arange(B)[:, None]
                scores = scores.at[rows, col].set(-jnp.inf, mode="drop")
            if method == "approx":
                # TPU PartialReduce local top-k (exact lowering on CPU)
                loc_v, loc_i = jax.lax.approx_max_k(scores, k_local,
                                                    recall_target=0.99)
            else:
                loc_v, loc_i = jax.lax.top_k(scores, k_local)
            loc_g = jnp.take_along_axis(gids, loc_i, axis=1)
            # demote pad/excluded survivors (-inf slots; an approx bin
            # whose every item is excluded can surface one) to the
            # out-of-range sentinel so they never count downstream
            loc_g = jnp.where(jnp.isfinite(loc_v.astype(jnp.float32)),
                              loc_g, num_items)
            # gather candidates from every shard
            all_v = jax.lax.all_gather(loc_v, MODEL_AXIS, axis=1, tiled=True)
            all_g = jax.lax.all_gather(loc_g, MODEL_AXIS, axis=1, tiled=True)
            return all_v, all_g

        def fn(u, items_padded, excl):
            all_v, all_g = shard_fn(u, items_padded, excl)   # (B, P*k_local)
            # exact fp32 final merge regardless of shard score dtype
            v, idx = jax.lax.top_k(all_v.astype(jnp.float32), min(k, all_v.shape[1]))
            ids = jnp.take_along_axis(all_g, idx, axis=1)
            return v, ids

        return jax.jit(fn)

    def topk(self, user_emb_batch: jax.Array, item_emb_padded: jax.Array,
             k: int, exclude: Optional[jax.Array] = None,
             method: str = "exact", score_dtype: str = "fp32"
             ) -> Tuple[jax.Array, jax.Array]:
        """(values (B,k), item ids (B,k)).

        ``exclude``: optional (B, Pmax) padded per-user item-id exclusion
        lists (pad with num_items) — e.g. train interactions for the
        full-catalog eval protocol (lightgcn.py:485-488).
        ``method``: "exact" | "approx" (local per-shard top-k op);
        ``score_dtype``: "fp32" | "bf16" (per-shard matmul + ranking).
        """
        assert method in ("exact", "approx"), method
        assert score_dtype in ("fp32", "bf16"), score_dtype
        has_exclude = exclude is not None
        if not has_exclude:
            exclude = jnp.zeros((user_emb_batch.shape[0], 1), jnp.int32)
        key = (int(k), method, score_dtype, has_exclude)
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = self._build(int(k), method, score_dtype, has_exclude)
            self._fn_cache[key] = fn
        return fn(user_emb_batch, item_emb_padded, exclude)
