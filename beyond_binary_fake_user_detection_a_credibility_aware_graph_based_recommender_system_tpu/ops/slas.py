"""SLAS: similarity-aware neighbor sampling, on device.

Reference: ``slas_sample_items_for_user`` / ``slas_sample_users_for_item``
(/root/reference/main.py:758-807), per-user Python loops with
``rng.choice(replace=False, p=exp(kappa*sim))`` — SURVEY.md hot loop #4.

TPU-native form: for a whole batch at once, gather each node's padded
neighbor list from the CSR, compute similarity logits against the
precomputed profiles, and draw k neighbors WITHOUT replacement via Gumbel
top-k (ops/sampling.gumbel_topk) — the streaming equivalent of the
reference's weighted choice (exact for the Plackett-Luce sampling scheme).

Profile construction parity (main.py:709-737):
  * item_feat_norm = L2-normalized item features;
  * user profile mu_u = degree-mean of the user's items' normalized
    features, then L2-normalized;
  * p(item|u) ∝ exp(kappa * <item_feat_norm[i], mu_u>);
  * p(user|i) ∝ exp(kappa * <mu_u, item_feat_norm[i]>) with labeled users
    upweighted ×(1 + slas_upweight_labeled);
  * temporal views filter edges by normalized timestamp (NaN in neither).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import edges_to_csr
from ..graph.hetero import HeteroGraph
from ..models.cred_model import temporal_edge_mask
from ..utils.config import CredConfig
from .sampling import gumbel_topk


def _l2n(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + eps)


def _padded_rows(indptr: np.ndarray, indices: np.ndarray, edge_ids,
                 pad_deg: int, pad_value: int):
    """(N, pad_deg) neighbor table + matching edge-id table (host, once).

    Vectorized scatter fill — no per-row Python loop (the 10M-node configs
    make O(N) host loops a real cost, VERDICT r1 item 9).  Edge ids are
    int32 (E < 2^31 everywhere this framework runs; the (I, P) table at
    the 10M north star is GB-scale, so the eid width matters)."""
    N = indptr.shape[0] - 1
    assert indices.shape[0] < 2 ** 31
    if indices.shape[0] == 0:
        return (np.full((N, pad_deg), pad_value, np.int32),
                np.full((N, pad_deg), -1, np.int32))
    deg = np.diff(indptr)
    offs = np.arange(pad_deg, dtype=np.int64)[None, :]        # (1, P)
    valid = offs < np.minimum(deg, pad_deg)[:, None]          # (N, P)
    flat = np.minimum(indptr[:-1, None] + offs,
                      max(indices.shape[0] - 1, 0))
    out = np.where(valid, indices[flat], pad_value).astype(np.int32)
    if edge_ids is not None:
        eid = np.where(valid, edge_ids[flat], -1).astype(np.int32)
    else:
        eid = np.full((N, pad_deg), -1, np.int32)
    return out, eid


@dataclass(frozen=True)
class SlasSampler:
    item_feat_norm: jax.Array     # (I, Fi)
    user_mu: jax.Array            # (U, Fi)
    user_labeled: jax.Array       # (U,) bool
    u_items: jax.Array            # (U, Pu) padded item neighbors
    u_eids: jax.Array             # (U, Pu) edge id per slot (-1 pad)
    i_users: jax.Array            # (I, Pi) padded user neighbors
    i_eids: jax.Array             # (I, Pi)
    edge_view_early: jax.Array    # (E,) bool
    edge_view_late: jax.Array     # (E,) bool
    kappa: float
    upweight_labeled: float

    @classmethod
    def build(cls, hg: HeteroGraph, cfg: Optional[CredConfig] = None,
              pad_deg: Optional[int] = None) -> "SlasSampler":
        """``pad_deg`` (or ``cfg.slas_pad_deg``): candidate-pool width per
        node.  Default None = the graph's max degree — exact reference
        candidate sets (every neighbor is a candidate, main.py:758-807).
        At the 10M north star the zipf head item has ~1e5 neighbors, so a
        max-degree (I, P) table is memory-infeasible; a cap keeps the
        FIRST ``pad_deg`` CSR neighbors (item-id order) as the Gumbel
        top-k candidate pool — a documented scale deviation, opt-in via
        CredConfig.slas_pad_deg (runs/two_stage_10m measures it)."""
        cfg = cfg or CredConfig()
        if pad_deg is None:
            pad_deg = cfg.slas_pad_deg
        u = hg.edges[0].astype(np.int64)
        i = hg.edges[1].astype(np.int64)
        E = u.shape[0]

        item_feat_norm = _l2n(np.nan_to_num(hg.item_x, nan=0.0))
        mu = np.zeros((hg.num_users, item_feat_norm.shape[1]))
        np.add.at(mu, u, item_feat_norm[i])
        deg_u = np.bincount(u, minlength=hg.num_users).astype(np.float64)
        mu = _l2n(mu / np.maximum(deg_u, 1.0)[:, None])

        u_csr = edges_to_csr(u, i, hg.num_users, keep_edge_ids=True)
        i_csr = edges_to_csr(i, u, hg.num_items, keep_edge_ids=True)
        max_deg = int(max(u_csr.degrees().max(initial=1),
                          i_csr.degrees().max(initial=1)))
        P = int(pad_deg or max_deg)

        u_items, u_eids = _padded_rows(u_csr.indptr, u_csr.indices,
                                       u_csr.edge_ids, P, hg.num_items)
        i_users, i_eids = _padded_rows(i_csr.indptr, i_csr.indices,
                                       i_csr.edge_ids, P, hg.num_users)

        return cls(
            item_feat_norm=jnp.asarray(item_feat_norm, jnp.float32),
            user_mu=jnp.asarray(mu, jnp.float32),
            user_labeled=jnp.asarray(hg.user_y >= 0),
            u_items=jnp.asarray(u_items), u_eids=jnp.asarray(u_eids),
            i_users=jnp.asarray(i_users), i_eids=jnp.asarray(i_eids),
            edge_view_early=jnp.asarray(
                temporal_edge_mask(hg.edge_attr, "early", cfg.temp_split)),
            edge_view_late=jnp.asarray(
                temporal_edge_mask(hg.edge_attr, "late", cfg.temp_split)),
            kappa=float(cfg.slas_kappa),
            upweight_labeled=float(cfg.slas_upweight_labeled),
        )

    def _view_mask(self, eids: jax.Array, view: Optional[str]) -> jax.Array:
        valid = eids >= 0
        if view is None:
            return valid
        table = self.edge_view_early if view == "early" else self.edge_view_late
        return valid & table[jnp.clip(eids, 0)]

    def sample_items_for_users(self, key: jax.Array, users: jax.Array, k: int,
                               view: Optional[str] = None
                               ) -> Tuple[jax.Array, jax.Array]:
        """(B, k) item ids + validity mask; p ∝ exp(kappa*sim)
        (main.py:758-784)."""
        nbrs = self.u_items[users]                       # (B, P)
        mask = self._view_mask(self.u_eids[users], view)
        sim = jnp.einsum("bpf,bf->bp",
                         self.item_feat_norm[jnp.clip(nbrs, 0,
                                                      self.item_feat_norm.shape[0] - 1)],
                         self.user_mu[users])
        logits = self.kappa * sim
        slot, scores = gumbel_topk(key, logits, k, mask)
        items = jnp.take_along_axis(nbrs, slot, axis=1)
        return items, jnp.isfinite(scores)

    def sample_users_for_items(self, key: jax.Array, items: jax.Array, k: int
                               ) -> Tuple[jax.Array, jax.Array]:
        """(B, k) user ids + mask; labeled users upweighted
        (main.py:786-807)."""
        nbrs = self.i_users[items]                       # (B, P)
        mask = self._view_mask(self.i_eids[items], None)
        sim = jnp.einsum("bpf,bf->bp",
                         self.user_mu[jnp.clip(nbrs, 0,
                                               self.user_mu.shape[0] - 1)],
                         self.item_feat_norm[items])
        logits = self.kappa * sim
        up = jnp.where(self.user_labeled[jnp.clip(nbrs, 0,
                                                  self.user_mu.shape[0] - 1)],
                       jnp.log1p(self.upweight_labeled), 0.0)
        slot, scores = gumbel_topk(key, logits + up, k, mask)
        users = jnp.take_along_axis(nbrs, slot, axis=1)
        return users, jnp.isfinite(scores)


jax.tree_util.register_dataclass(
    SlasSampler,
    data_fields=["item_feat_norm", "user_mu", "user_labeled", "u_items",
                 "u_eids", "i_users", "i_eids", "edge_view_early",
                 "edge_view_late"],
    meta_fields=["kappa", "upweight_labeled"])
