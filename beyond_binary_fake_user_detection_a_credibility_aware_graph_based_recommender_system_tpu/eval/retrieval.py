"""Retrieval / serving API: top-k items for users from trained embeddings.

The production-facing counterpart of the full-catalog evaluator
(lightgcn.py:459-509): dense dot-product scoring with optional seen-item
exclusion, single-chip or distributed over a mesh (sharded matmul +
distributed top-k merge, parallel/sharded_topk.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.build import BipartiteGraph


def build_exclusion_rows(graph: BipartiteGraph, split: str = "train"
                         ) -> np.ndarray:
    """(U, Pmax) per-user seen-item lists padded with num_items.

    Vectorized scatter fill — no per-user Python loop (VERDICT r1 item 9)."""
    csr = graph.user_csr(split)
    deg = csr.degrees()
    pmax = max(int(deg.max()) if deg.size else 1, 1)
    if csr.indices.shape[0] == 0:
        return np.full((graph.num_users, pmax), graph.num_items, np.int32)
    offs = np.arange(pmax, dtype=np.int64)[None, :]
    valid = offs < deg[:, None]
    flat = np.minimum(csr.indptr[:-1, None] + offs, csr.indices.shape[0] - 1)
    return np.where(valid, csr.indices[flat],
                    graph.num_items).astype(np.int32)


def topk_for_users(user_emb: jax.Array, item_emb: jax.Array,
                   users: jax.Array, k: int,
                   exclude_rows: Optional[jax.Array] = None,
                   mesh=None, _sharded_cache={}) -> Tuple[jax.Array, jax.Array]:
    """(scores (B,k), item ids (B,k)).

    ``exclude_rows``: (U, Pmax) padded exclusion table (pad = num_items).
    With ``mesh``, scoring runs row-sharded over the model axis with a
    distributed top-k merge.
    """
    num_items = item_emb.shape[0]
    u = user_emb[users]
    excl = exclude_rows[users] if exclude_rows is not None else None

    if mesh is not None:
        from ..parallel.sharded_topk import ShardedTopK
        key = (id(mesh), num_items)
        st = _sharded_cache.get(key)
        if st is None:
            st = ShardedTopK(mesh, num_items)
            _sharded_cache[key] = st
        return st.topk(u, st.pad_items(item_emb), k, exclude=excl)

    scores = u @ item_emb.T                                   # (B, I)
    if excl is not None:
        pad = jnp.full((scores.shape[0], 1), -jnp.inf, scores.dtype)
        ext = jnp.concatenate([scores, pad], axis=1)
        rows = jnp.arange(scores.shape[0])[:, None]
        ext = ext.at[rows, excl].set(-jnp.inf)
        scores = ext[:, :-1]
    return jax.lax.top_k(scores, k)
