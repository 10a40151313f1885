"""LightGCN model family (Stage B).

Covers all reference variants with one parameterized module
(SURVEY.md C20–C22):

  * vanilla joint-adjacency LightGCN          /root/reference/lightgcn.py:306-349
  * CredLightGCN, synchronous (Jacobi) bipartite updates, Eq 3.22–3.26
                                              /root/reference/lightgcn_cu.py:405-463
  * cred-in-message Gauss-Seidel bipartite updates
                                /root/reference/version_1/lightgcn_cu_message.py:391-452

Parity-critical semantics preserved exactly:
  * "bipartite_sync": e_i^{k+1} = A_iu e_u^k and e_u^{k+1} = A_ui e_i^k —
    the user update consumes the *previous* item layer
    (lightgcn_cu.py:429-439 uses ``is_[-1]``).
  * "gauss_seidel": e_i^{k+1} = A_iu e_u^k then e_u^{k+1} = A_ui e_i^{k+1} —
    the user update consumes the *fresh* item layer (2-hop per round;
    lightgcn_cu_message.py:421-423).
  * final embeddings are the mean over layers 0..K (inclusive of layer 0).
  * Xavier-uniform init matches torch's fan convention on an (N, D) table:
    limit = sqrt(6 / (N + D)).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.build import BipartiteGraph
from ..graph.operators import EdgeMap, build_edge_maps
from ..ops.spmm import SpmmOperator
from ..utils.config import RecConfig

Params = Dict[str, jax.Array]


def xavier_uniform(key: jax.Array, shape: Tuple[int, int],
                   dtype=jnp.float32) -> jax.Array:
    """torch.nn.init.xavier_uniform_ on a 2-D (fan_out, fan_in) tensor."""
    fan_out, fan_in = shape
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def init_params(key: jax.Array, cfg: RecConfig, num_users: int,
                num_items: int) -> Params:
    """"joint" = one (U+I, D) table (lightgcn.py:315);
    "split" = separate user/item tables (lightgcn_cu.py:415-418)."""
    if cfg.table_layout == "joint":
        return {"emb": xavier_uniform(key, (num_users + num_items, cfg.emb_dim))}
    ku, ki = jax.random.split(key)
    return {"user_emb": xavier_uniform(ku, (num_users, cfg.emb_dim)),
            "item_emb": xavier_uniform(ki, (num_items, cfg.emb_dim))}


def ego_tables(params: Params, num_users: int) -> Tuple[jax.Array, jax.Array]:
    """Layer-0 (ego) user/item tables regardless of layout — the L2
    regularizer acts on these (lightgcn.py:341-348)."""
    if "emb" in params:
        return params["emb"][:num_users], params["emb"][num_users:]
    return params["user_emb"], params["item_emb"]


class LightGCN:
    """Propagation + scoring for one Stage-B configuration.

    Construction precompiles the edge-weight recipe into SpmmOperator(s);
    ``propagate(params)`` returns the layer-averaged (user_emb, item_emb).
    """

    def __init__(self, cfg: RecConfig, graph: BipartiteGraph,
                 cred: Optional[np.ndarray] = None,
                 backend: Optional[str] = None,
                 operator_factory=None):
        """``operator_factory(edge_map) -> callable`` lets the same model run
        on single-chip SpmmOperators (default) or mesh-sharded ones
        (parallel/sharded_spmm.ShardedSpmmOperator via functools.partial)."""
        cfg.validate()
        self.cfg = cfg
        self.num_users = graph.num_users
        self.num_items = graph.num_items
        backend = backend if backend is not None else cfg.spmm_backend
        if operator_factory is None:
            def operator_factory(em):
                return SpmmOperator(em, backend=backend,
                                    precision=cfg.spmm_precision)

        maps = build_edge_maps(graph, cfg.weight_mode, cred)
        if cfg.propagation == "symmetric":
            assert isinstance(maps, EdgeMap)
            self.joint_op = operator_factory(maps)
            self.item_from_user = self.user_from_item = None
        else:
            item_from_user_map, user_from_item_map = maps
            self.item_from_user = operator_factory(item_from_user_map)
            self.user_from_item = operator_factory(user_from_item_map)
            self.joint_op = None

    # -- propagation ------------------------------------------------------

    @property
    def state(self):
        """Operator-state pytree to thread through jit as an ARGUMENT
        (closure-captured edge arrays inline into the compiled program as
        constants and grow the HLO with graph size).  Entries are None for
        operator types without exportable state (e.g. mesh-sharded ops)."""
        def st(op):
            return getattr(op, "state", None)
        if self.cfg.propagation == "symmetric":
            return {"joint": st(self.joint_op)}
        return {"ifu": st(self.item_from_user), "ufi": st(self.user_from_item)}

    def _apply(self, op, state_pair, x):
        if state_pair is not None:
            from ..ops.spmm import spmm_apply
            return spmm_apply(state_pair[0], state_pair[1], x)
        return op(x)

    def _padded_apply_fn(self, op, state_pair):
        """Padded-space apply for one operator: state-threaded for
        single-chip pallas operators (ops/spmm.py:spmm_apply_padded),
        closure-captured for mesh-sharded ones (whose state is None)."""
        if state_pair is not None:
            from ..ops.spmm import spmm_apply_padded
            return lambda x: spmm_apply_padded(state_pair[0], state_pair[1], x)
        return op.apply_padded

    def _padded_chain(self):
        """Mesh-sharded operators expose padded span layouts
        (parallel/sharded_spmm.py); when the chain's layouts line up, the
        whole K-layer propagation can stay in padded row-sharded form and
        convert dense<->padded once per call instead of once per operator."""
        if self.cfg.propagation == "symmetric":
            op = self.joint_op
            if getattr(op, "padded_chain", False) and \
                    op.src_layout.equals(op.dst_layout):
                return op
            return None
        a, b = self.item_from_user, self.user_from_item
        if (getattr(a, "padded_chain", False)
                and getattr(b, "padded_chain", False)
                and a.dst_layout.equals(b.src_layout)
                and b.dst_layout.equals(a.src_layout)):
            return (a, b)
        return None

    def propagate(self, params: Params,
                  state=None) -> Tuple[jax.Array, jax.Array]:
        K = self.cfg.num_layers
        mode = self.cfg.propagation
        if state is None:
            state = self.state
        # bf16 fast mode: cast ego tables ONCE so the whole chain (gathers,
        # kernel messages, layer-mean) runs at half the HBM bytes; the
        # kernel still accumulates per-destination sums in fp32.  Combined
        # tables are returned as fp32 for scoring/loss.
        prop_dtype = (jnp.bfloat16 if getattr(self.cfg, "spmm_precision",
                                              "fp32") == "bf16"
                      else jnp.float32)
        chain = self._padded_chain()
        if mode == "symmetric":
            x = params["emb"] if "emb" in params else jnp.concatenate(
                [params["user_emb"], params["item_emb"]], axis=0)
            x = x.astype(prop_dtype)
            if chain is not None:
                op = chain
                x = op.src_layout.to_padded(x)
                apply_j = self._padded_apply_fn(op, state["joint"])
                acc = x.astype(jnp.float32)
                for _ in range(K):
                    x = apply_j(x)
                    acc = acc + x.astype(jnp.float32)
                final = op.src_layout.from_padded(acc / (K + 1))
            else:
                acc = x.astype(jnp.float32)
                for _ in range(K):
                    x = self._apply(self.joint_op, state["joint"], x)
                    acc = acc + x.astype(jnp.float32)
                final = acc / (K + 1)
            final = final.astype(jnp.float32)
            return final[:self.num_users], final[self.num_users:]

        u, i = ego_tables(params, self.num_users)
        u = u.astype(prop_dtype)
        i = i.astype(prop_dtype)
        if chain is not None:
            ifu, ufi = chain
            u = ifu.src_layout.to_padded(u)
            i = ufi.src_layout.to_padded(i)
            apply_ifu = self._padded_apply_fn(ifu, state["ifu"])
            apply_ufi = self._padded_apply_fn(ufi, state["ufi"])
        else:
            apply_ifu = lambda x: self._apply(self.item_from_user,
                                              state["ifu"], x)
            apply_ufi = lambda x: self._apply(self.user_from_item,
                                              state["ufi"], x)
        acc_u, acc_i = u.astype(jnp.float32), i.astype(jnp.float32)
        for _ in range(K):
            if mode == "bipartite_sync":
                # Jacobi: both updates read layer k (lightgcn_cu.py:429-439)
                new_i = apply_ifu(u)
                new_u = apply_ufi(i)
                u, i = new_u, new_i
            else:  # gauss_seidel (lightgcn_cu_message.py:421-423)
                i = apply_ifu(u)
                u = apply_ufi(i)
            acc_u = acc_u + u.astype(jnp.float32)
            acc_i = acc_i + i.astype(jnp.float32)
        acc_u = acc_u / (K + 1)
        acc_i = acc_i / (K + 1)
        if chain is not None:
            ifu, ufi = chain
            acc_u = ifu.src_layout.from_padded(acc_u)
            acc_i = ufi.src_layout.from_padded(acc_i)
        return acc_u, acc_i

    def propagate_rows(self, params: Params, user_rows: jax.Array,
                       item_rows: jax.Array,
                       state=None) -> Tuple[jax.Array, jax.Array]:
        """Layer-mean embeddings for SELECTED rows only.

        Row-gather commutes with the per-layer accumulation bit-exactly
        (``(Σ_k x_k)[r] == Σ_k x_k[r]`` elementwise, same fp order), so the
        per-batch training loss can skip materializing the combined
        full-size tables — at reference scale the full-table layer
        accumulation + its backward cost ~2 ms of a ~30 ms train step.
        ``propagate`` (full tables) remains the evaluation path.

        Padded-chain tables are indexed through the layout's row->slot map
        (``_slot``), so GLOBAL row ids are correct for both the single-chip
        tail-padding ``PadLayout`` (slot == row) and the mesh
        ``SpanLayout`` (slot = device*rows_max + offset) — indexing the
        padded table with raw rows under a SpanLayout would silently read
        the wrong users.
        """
        K = self.cfg.num_layers
        mode = self.cfg.propagation
        if state is None:
            state = self.state
        prop_dtype = (jnp.bfloat16 if getattr(self.cfg, "spmm_precision",
                                              "fp32") == "bf16"
                      else jnp.float32)
        chain = self._padded_chain()

        def _slot(layout, rows):
            """Global row ids -> padded-table slots for this layout."""
            fwd = getattr(layout, "fwd", None)  # SpanLayout row->slot map
            return rows if fwd is None else fwd[rows]

        if mode == "symmetric":
            x = params["emb"] if "emb" in params else jnp.concatenate(
                [params["user_emb"], params["item_emb"]], axis=0)
            x = x.astype(prop_dtype)
            iid = item_rows + self.num_users
            if chain is not None:
                x = chain.src_layout.to_padded(x)
                apply_j = self._padded_apply_fn(chain, state["joint"])
                user_rows = _slot(chain.src_layout, user_rows)
                iid = _slot(chain.src_layout, iid)
            else:
                apply_j = lambda t: self._apply(self.joint_op,
                                                state["joint"], t)
            au = x[user_rows].astype(jnp.float32)
            ai = x[iid].astype(jnp.float32)
            for _ in range(K):
                x = apply_j(x)
                au = au + x[user_rows].astype(jnp.float32)
                ai = ai + x[iid].astype(jnp.float32)
            return au / (K + 1), ai / (K + 1)

        u, i = ego_tables(params, self.num_users)
        u = u.astype(prop_dtype)
        i = i.astype(prop_dtype)
        if chain is not None:
            ifu, ufi = chain
            u = ifu.src_layout.to_padded(u)
            i = ufi.src_layout.to_padded(i)
            apply_ifu = self._padded_apply_fn(ifu, state["ifu"])
            apply_ufi = self._padded_apply_fn(ufi, state["ufi"])
            user_rows = _slot(ifu.src_layout, user_rows)
            item_rows = _slot(ufi.src_layout, item_rows)
        else:
            apply_ifu = lambda x: self._apply(self.item_from_user,
                                              state["ifu"], x)
            apply_ufi = lambda x: self._apply(self.user_from_item,
                                              state["ufi"], x)
        au = u[user_rows].astype(jnp.float32)
        ai = i[item_rows].astype(jnp.float32)
        for _ in range(K):
            if mode == "bipartite_sync":
                new_i = apply_ifu(u)
                new_u = apply_ufi(i)
                u, i = new_u, new_i
            else:  # gauss_seidel
                i = apply_ifu(u)
                u = apply_ufi(i)
            au = au + u[user_rows].astype(jnp.float32)
            ai = ai + i[item_rows].astype(jnp.float32)
        return au / (K + 1), ai / (K + 1)

    # -- scoring ----------------------------------------------------------

    @staticmethod
    def score(user_emb: jax.Array, item_emb: jax.Array,
              users: jax.Array, items: jax.Array) -> jax.Array:
        """Eq 3.26: dot-product (lightgcn_cu.py:450-454)."""
        return jnp.sum(user_emb[users] * item_emb[items], axis=-1)

    @staticmethod
    def score_all_items(user_emb: jax.Array, item_emb: jax.Array,
                        users: jax.Array) -> jax.Array:
        """(B, I) dense scores for full-catalog evaluation
        (lightgcn.py:483)."""
        return user_emb[users] @ item_emb.T
