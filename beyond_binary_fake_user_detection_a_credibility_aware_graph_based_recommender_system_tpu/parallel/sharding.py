"""Sharded training step construction (pjit / GSPMD).

Sharding layout (SURVEY.md C34 build target):
  * embedding tables (the model IS two embedding tables): row-sharded over
    the ``model`` mesh axis;
  * optimizer state: follows the params (same row sharding);
  * BPR batches (user/pos/neg id vectors): sharded over ``data``;
  * edge arrays inside the SpmmOperators: replicated (per-destination-block
    edge sharding over ICI is the scaled-graph path, ops/spmm_pallas.py).

GSPMD inserts the collectives: gathers from the row-sharded tables become
all-gathers over ICI; the data-parallel gradient reduction becomes a psum.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import optax
from jax.sharding import Mesh

from ..models import losses
from ..models.lightgcn import LightGCN, ego_tables
from .mesh import batch_sharded, replicated, row_sharded


def param_shardings(mesh: Mesh, params: Dict[str, jax.Array]):
    """Row-shard every (N, D) table over the model axis."""
    return {k: row_sharded(mesh) for k in params}


def opt_state_shardings(mesh: Mesh, opt_state, p_shard):
    """Adam moments mirror the parameter sharding; scalars replicate."""
    def _map(tree):
        return jax.tree.map(
            lambda x: row_sharded(mesh) if getattr(x, "ndim", 0) >= 2
            else replicated(mesh), tree)

    return _map(opt_state)


def make_sharded_train_step(model: LightGCN, optimizer,
                            mesh: Mesh) -> Callable:
    """jit a full BPR train step with explicit input/output shardings.

    Batch ids arrive pre-sampled (sampling stays outside so the step is a
    pure function of (params, opt_state, batch)); propagation runs on the
    row-sharded tables, scores/losses on the data-sharded batch.
    """
    cfg = model.cfg

    def loss_fn(params, users, pos, neg):
        user_emb, item_emb = model.propagate(params)
        user_emb = jax.lax.with_sharding_constraint(
            user_emb, row_sharded(mesh))
        item_emb = jax.lax.with_sharding_constraint(
            item_emb, row_sharded(mesh))
        pos_s = LightGCN.score(user_emb, item_emb, users, pos)
        neg_s = LightGCN.score(user_emb, item_emb, users, neg)
        loss = losses.bpr_loss(pos_s, neg_s)
        ego_u, ego_i = ego_tables(params, model.num_users)
        loss = loss + cfg.reg * losses.ego_l2(ego_u[users], ego_i[pos],
                                              ego_i[neg])
        return loss

    def step(params, opt_state, users, pos, neg):
        loss, grads = jax.value_and_grad(loss_fn)(params, users, pos, neg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_state(params, opt_state):
        p_shard = param_shardings(mesh, params)
        o_shard = opt_state_shardings(mesh, opt_state, p_shard)
        params = jax.device_put(params, p_shard)
        opt_state = jax.device_put(opt_state, o_shard)
        return params, opt_state, p_shard, o_shard

    def jit_step(p_shard, o_shard):
        b = batch_sharded(mesh)
        return jax.jit(
            step,
            in_shardings=(p_shard, o_shard, b, b, b),
            out_shardings=(p_shard, o_shard, replicated(mesh)),
            donate_argnums=(0, 1),
        )

    return step, shard_state, jit_step
