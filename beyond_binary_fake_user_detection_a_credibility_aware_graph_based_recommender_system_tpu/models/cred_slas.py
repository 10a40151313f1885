"""SLAS-subgraph CredModel forward: fixed-shape sampled neighborhoods.

The reference trains CredModel on SLAS-sampled 2-hop subgraphs assembled in
per-user Python loops (/root/reference/main.py:809-883).  The TPU-native
equivalent keeps the SAME architecture and sampling distribution but builds
a fixed-shape sampled neighborhood per step (SURVEY.md §7 "SLAS sampling
without replacement ... on device"):

  * seeds (B,) -> Gumbel-top-k similarity-weighted item draws (B, Ki) with
    the temporal-view edge filter (ops/slas.py);
  * each drawn item slot -> Gumbel-top-k user draws (Ki*B, Ku) with the
    labeled-user upweight;
  * stage 1: each item slot aggregates its seed + sampled users with
    normalized EWA weights; stage 2: each seed aggregates its item slots.

Differences vs the reference's assembly (documented, deliberate): item
slots are NOT deduplicated across seeds (a popular item appears as several
slots — same expectation, fixed shapes), and the subgraph contains the
SAMPLED edges rather than every edge between sampled nodes (bounded
compute; the reference's extra edges only densify the same neighborhoods).

All shapes are static: (B, Ki) and (B*Ki, Ku); masked slots carry zero
weight through the normalized aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.hetero import HeteroGraph
from ..ops.slas import SlasSampler
from ..utils.config import CredConfig
from .cred_model import Params, ewa_raw_weights


@dataclass(frozen=True)
class SlasGraphData:
    """Device arrays for the sampled-subgraph forward (a pytree)."""
    user_x: jax.Array          # (U, Fu)
    item_x: jax.Array          # (I, Fi)
    edge_w_raw: jax.Array      # (E,) EWA raw weights per original edge
    sampler: SlasSampler


jax.tree_util.register_dataclass(
    SlasGraphData, data_fields=["user_x", "item_x", "edge_w_raw", "sampler"],
    meta_fields=[])


def build_slas_graph_data(hg: HeteroGraph, cfg: Optional[CredConfig] = None
                          ) -> SlasGraphData:
    cfg = cfg or CredConfig()
    return SlasGraphData(
        user_x=jnp.asarray(np.nan_to_num(hg.user_x, nan=0.0)),
        item_x=jnp.asarray(np.nan_to_num(hg.item_x, nan=0.0)),
        edge_w_raw=jnp.asarray(
            ewa_raw_weights(hg.edge_attr, cfg.beta, cfg.gamma)),
        sampler=SlasSampler.build(hg, cfg),
    )


def slas_forward(params: Params, data: SlasGraphData, seeds: jax.Array,
                 key: jax.Array, view: Optional[str], k_items: int,
                 k_users: int):
    """(cred (B,), h_u2 (B,H), h_i1 (B*Ki,H), aux) for the seed users,
    where aux = (w_seed_norm (B*Ki,), item_mask (B, Ki)) feeds the
    smoothness term.  Mirrors ``forward_subgraph`` (main.py:690-707) on the
    sampled fixed-shape neighborhood.
    """
    B = seeds.shape[0]
    s = data.sampler
    k1, k2 = jax.random.split(key)

    # ---- sample the 2-hop neighborhood -------------------------------
    items, item_mask = s.sample_items_for_users(k1, seeds, k_items, view)
    flat_items = items.reshape(-1)                          # (B*Ki,)
    nbr_users, user_mask = s.sample_users_for_items(
        k2, flat_items, k_users)                            # (B*Ki, Ku)
    # invalid item slots poison their user draws
    user_mask = user_mask & item_mask.reshape(-1, 1)

    # ---- projections --------------------------------------------------
    h_u0_seed = data.user_x[seeds] @ params["user_proj_w"] \
        + params["user_proj_b"]                             # (B, H)
    h_i0 = data.item_x[jnp.clip(flat_items, 0, data.item_x.shape[0] - 1)] \
        @ params["item_proj_w"] + params["item_proj_b"]     # (B*Ki, H)
    h_u0_nbr = data.user_x[jnp.clip(nbr_users, 0, data.user_x.shape[0] - 1)] \
        @ params["user_proj_w"] + params["user_proj_b"]     # (B*Ki, Ku, H)

    # ---- stage 1: item <- users (EWA-normalized) ----------------------
    # weights: each item slot receives from its Ku sampled users and from
    # its seed (the edge that selected it)
    w_seed = _edge_w(data, s, seeds, items)                 # (B, Ki)
    w_nbr = _edge_w_items(data, s, flat_items, nbr_users)   # (B*Ki, Ku)

    w_seed_f = (w_seed * item_mask).reshape(-1, 1)          # (B*Ki, 1)
    w_nbr_f = w_nbr * user_mask                             # (B*Ki, Ku)
    denom_i = w_seed_f.sum(-1, keepdims=True) + w_nbr_f.sum(-1, keepdims=True) + 1e-12
    msg_i = (w_seed_f * jnp.repeat(h_u0_seed, k_items, axis=0)
             + jnp.einsum("ek,ekh->eh", w_nbr_f, h_u0_nbr)) / denom_i
    h_i1 = jax.nn.relu(
        jnp.concatenate([h_i0, msg_i], axis=-1) @ params["item_upd_w"]
        + params["item_upd_b"])                             # (B*Ki, H)

    # ---- stage 2: seed user <- its item slots -------------------------
    w_ui = (w_seed * item_mask)                             # (B, Ki)
    denom_u = w_ui.sum(-1, keepdims=True) + 1e-12
    msg_u = jnp.einsum("bk,bkh->bh", w_ui,
                       h_i1.reshape(B, k_items, -1)) / denom_u
    h_u2 = jax.nn.relu(
        jnp.concatenate([h_u0_seed, msg_u], axis=-1) @ params["user_upd_w"]
        + params["user_upd_b"])                             # (B, H)

    cred = jax.nn.sigmoid(
        (h_u2 @ params["out_w"] + params["out_b"]).squeeze(-1))
    w_seed_norm = (w_seed_f / denom_i).squeeze(-1)          # (B*Ki,)
    return cred, h_u2, h_i1, (w_seed_norm, item_mask)


def _edge_w(data: SlasGraphData, s: SlasSampler, seeds: jax.Array,
            item_slots: jax.Array) -> jax.Array:
    """EWA raw weight of the (seed -> sampled item slot) edges.

    ``sample_items_for_users`` draws CSR slots of ``u_items``; recover each
    draw's edge id by matching the drawn item against the seed's neighbor
    row (first match — duplicate edges share attribute distribution)."""
    rows = s.u_items[seeds]                                  # (B, P)
    match = rows[:, None, :] == item_slots[:, :, None]       # (B, Ki, P)
    slot = jnp.argmax(match, axis=-1)                        # (B, Ki)
    eids = jnp.take_along_axis(s.u_eids[seeds], slot, axis=1)
    return data.edge_w_raw[jnp.clip(eids, 0)] * (eids >= 0)


def _edge_w_items(data: SlasGraphData, s: SlasSampler, items: jax.Array,
                  user_slots: jax.Array) -> jax.Array:
    rows = s.i_users[jnp.clip(items, 0, s.i_users.shape[0] - 1)]
    match = rows[:, None, :] == user_slots[:, :, None]
    slot = jnp.argmax(match, axis=-1)
    eids = jnp.take_along_axis(
        s.i_eids[jnp.clip(items, 0, s.i_users.shape[0] - 1)], slot, axis=1)
    return data.edge_w_raw[jnp.clip(eids, 0)] * (eids >= 0)
