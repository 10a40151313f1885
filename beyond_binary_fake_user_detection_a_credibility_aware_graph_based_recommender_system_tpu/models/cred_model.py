"""CredModel: edge-weighted GraphSAGE-style credibility scorer (Stage A).

Reference: ``CredModel`` and its training harness
(/root/reference/main.py:609-1025).  Architecture (thesis Eq 3.12-3.16):

  h_u0 = user_proj(x_u);  h_i0 = item_proj(x_i)
  w_e  = clamp(beta*clip01(verified) + gamma*rating_align, min=0)   (EWA)
  w~   = w / (sum over destination + 1e-12)          (per-dst normalization)
  h_i1 = relu(item_upd([h_i0 ; sum_e w~ h_u0[src]]))
  h_u2 = relu(user_upd([h_u0 ; sum_e w~ h_i1[item]]))
  cred = sigmoid(out(h_u2))

TPU-native redesign: the reference trains on SLAS-sampled 2-hop subgraphs
assembled in per-user Python loops (main.py:758-883 — SURVEY.md hot loop
#4).  Here the default trainer runs the two aggregation stages over the
FULL graph as weighted segment-sums (the graph fits on a chip at reference
scale; SURVEY.md §7 step 7), with the temporal "early"/"late" views
expressed as edge masks fused into the precomputed weight vectors — the
per-view normalized weights are parameter-independent, so they are
precomputed once and the whole forward is two SpMM applications per view.
SLAS weighted neighbor sampling survives as the on-device Gumbel-top-k
path for beyond-chip graphs (ops/slas.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.hetero import HeteroGraph
from ..graph.operators import EdgeMap
from ..ops.spmm import SpmmOperator
from ..utils.config import CredConfig

Params = Dict[str, jax.Array]


def _linear_init(key, fan_in: int, fan_out: int):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    W = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return W, b


def init_cred_params(key, user_in: int, item_in: int, hidden: int) -> Params:
    keys = jax.random.split(key, 5)
    p = {}
    p["user_proj_w"], p["user_proj_b"] = _linear_init(keys[0], user_in, hidden)
    p["item_proj_w"], p["item_proj_b"] = _linear_init(keys[1], item_in, hidden)
    p["item_upd_w"], p["item_upd_b"] = _linear_init(keys[2], 2 * hidden, hidden)
    p["user_upd_w"], p["user_upd_b"] = _linear_init(keys[3], 2 * hidden, hidden)
    p["out_w"], p["out_b"] = _linear_init(keys[4], hidden, 1)
    return p


def ewa_raw_weights(edge_attr: np.ndarray, beta: float = 1.0,
                    gamma: float = 1.0) -> np.ndarray:
    """Eq 3.12 (main.py:674-682): w = clamp(beta*clip01(verified) +
    gamma*rating_align, min=0)."""
    verified = np.clip(edge_attr[:, 0], 0.0, 1.0)
    align = edge_attr[:, 1]
    return np.maximum(beta * verified + gamma * align, 0.0).astype(np.float32)


def temporal_edge_mask(edge_attr: np.ndarray, view: Optional[str],
                       split: float = 0.5) -> np.ndarray:
    """NaN-safe temporal view mask (main.py:816-823): NaN timestamps are in
    NEITHER view, matching numpy NaN-compare semantics."""
    if view is None:
        return np.ones(edge_attr.shape[0], bool)
    tsn = edge_attr[:, 3]
    with np.errstate(invalid="ignore"):
        return (tsn < split) if view == "early" else (tsn >= split)


@dataclass
class CredView:
    """Precomputed operators for one temporal view: parameter-independent
    normalized EWA weights baked into two SpMM directions."""
    item_from_user: object            # aggregates h_u0 -> items
    user_from_item: object            # aggregates h_i1 -> users
    w_u2i_norm: jax.Array             # (E,) normalized weights (smoothness)
    src: jax.Array                    # (E,) user idx per edge
    dst: jax.Array                    # (E,) item idx per edge

    @property
    def state(self):
        """Pytree of the two operators' state pairs plus the edge arrays the
        smoothness term reads — thread through jit as an argument (closure
        capture inlines E-sized constants).  Mesh-sharded operators carry no
        exportable state (None), mirroring models/lightgcn.py."""
        return {"ifu": getattr(self.item_from_user, "state", None),
                "ufi": getattr(self.user_from_item, "state", None),
                "w_u2i_norm": self.w_u2i_norm,
                "src": self.src, "dst": self.dst}


def build_cred_view(hg: HeteroGraph, cfg: CredConfig, view: Optional[str],
                    backend: str = "auto",
                    operator_factory=None) -> CredView:
    """normalize_per_dst over the view's edges only (masked weights), both
    directions (main.py:680-688).  ``operator_factory(edge_map)`` swaps in
    mesh-sharded operators (parallel/sharded_spmm.ShardedSpmmOperator)."""
    E = hg.num_edges
    u = hg.edges[0].astype(np.int64)
    i = hg.edges[1].astype(np.int64)
    w = ewa_raw_weights(hg.edge_attr, cfg.beta, cfg.gamma)
    w = w * temporal_edge_mask(hg.edge_attr, view, cfg.temp_split)

    denom_i = np.zeros(hg.num_items, np.float64)
    np.add.at(denom_i, i, w)
    w_u2i = (w / (denom_i[i] + 1e-12)).astype(np.float32)

    denom_u = np.zeros(hg.num_users, np.float64)
    np.add.at(denom_u, u, w)
    w_i2u = (w / (denom_u[u] + 1e-12)).astype(np.float32)

    if operator_factory is None:
        def operator_factory(em):
            return SpmmOperator(em, backend=backend)

    return CredView(
        item_from_user=operator_factory(EdgeMap(
            src=u.astype(np.int32), dst=i.astype(np.int32), w=w_u2i,
            num_src=hg.num_users, num_dst=hg.num_items)),
        user_from_item=operator_factory(EdgeMap(
            src=i.astype(np.int32), dst=u.astype(np.int32), w=w_i2u,
            num_src=hg.num_items, num_dst=hg.num_users)),
        w_u2i_norm=jnp.asarray(w_u2i),
        src=jnp.asarray(u, jnp.int32),
        dst=jnp.asarray(i, jnp.int32),
    )


class CredModel:
    """Full-graph CredModel over precomputed temporal views."""

    def __init__(self, hg: HeteroGraph, cfg: Optional[CredConfig] = None,
                 backend: str = "auto", operator_factory=None):
        self.cfg = cfg or CredConfig()
        self.hg = hg
        # NaN features would poison the dense projections; the reference's
        # real dataset has none, so zero-fill is behavior-preserving there.
        self.user_x = jnp.asarray(np.nan_to_num(hg.user_x, nan=0.0))
        self.item_x = jnp.asarray(np.nan_to_num(hg.item_x, nan=0.0))
        self.views = {
            v: build_cred_view(hg, self.cfg, v, backend, operator_factory)
            for v in (None, "early", "late")
        }

    def init(self, key) -> Params:
        return init_cred_params(key, self.hg.user_x.shape[1],
                                self.hg.item_x.shape[1], self.cfg.hidden_dim)

    @property
    def state(self):
        """{view_name: view state} pytree for jit-argument threading."""
        return {("all" if v is None else v): self.views[v].state
                for v in self.views}

    @staticmethod
    def _apply(op, pair, x):
        """State-threaded apply for single-chip operators; direct call for
        mesh-sharded ones (state None) — same split as models/lightgcn.py."""
        if pair is not None:
            from ..ops.spmm import spmm_apply
            return spmm_apply(pair[0], pair[1], x)
        return op(x)

    def forward(self, params: Params, view: Optional[str],
                state=None) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """(cred (U,), h_u2 (U,H), h_i1 (I,H)) — mirrors
        ``forward_subgraph`` (main.py:690-707) on the full graph.  The
        view's normalized weights/edges are in ``self.views[view]``;
        ``state`` (from :attr:`state`) supplies the operator arrays through
        jit arguments."""
        v = self.views[view]
        vstate = (state or self.state)["all" if view is None else view]
        h_u0 = self.user_x @ params["user_proj_w"] + params["user_proj_b"]
        h_i0 = self.item_x @ params["item_proj_w"] + params["item_proj_b"]

        m_i = self._apply(v.item_from_user, vstate["ifu"], h_u0)
        h_i1 = jax.nn.relu(
            jnp.concatenate([h_i0, m_i], axis=-1) @ params["item_upd_w"]
            + params["item_upd_b"])

        m_u = self._apply(v.user_from_item, vstate["ufi"], h_i1)
        h_u2 = jax.nn.relu(
            jnp.concatenate([h_u0, m_u], axis=-1) @ params["user_upd_w"]
            + params["user_upd_b"])

        cred = jax.nn.sigmoid(
            (h_u2 @ params["out_w"] + params["out_b"]).squeeze(-1))
        return cred, h_u2, h_i1
