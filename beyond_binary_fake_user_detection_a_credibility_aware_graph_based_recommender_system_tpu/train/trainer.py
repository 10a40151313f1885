"""Stage-B trainer: pjit-able BPR training over any LightGCN variant.

Replaces the reference's per-script train loops
(/root/reference/lightgcn.py:515-632, lightgcn_cu.py:552-687,
Version-2/lighgcn_cu_pop.py:817-934) with a single trainer:

  * one compiled ``lax.scan`` per epoch over fixed-size user batches —
    positive/negative sampling, full-graph propagation, BPR(+fair)+L2 loss,
    and the Adam update all run on device (the reference crosses the
    host/device boundary twice per batch, SURVEY.md §3.2);
  * the final ragged batch is padded and masked, reproducing the
    reference's variable-length batch means exactly;
  * "per_batch" propagation schedule recomputes the K-layer propagation
    inside every step (reference-faithful: lightgcn.py:584 calls
    ``get_user_item_emb()`` per batch); "per_epoch" caches it across an
    epoch for throughput;
  * model selection on val Recall@max(Ks) with best-checkpoint keep
    (lightgcn.py:605-616), final test on the best params.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.cred_io import load_credibility_vector
from ..eval.ranking import EvalContext, evaluate_full, evaluate_sampled
from ..graph.build import BipartiteGraph
from ..models import losses
from ..models.lightgcn import LightGCN, ego_tables, init_params
from ..ops.sampling import (PopMixSampler, sample_negatives_popmix,
                            sample_negatives_uniform, sample_positives)
from ..utils.config import RecConfig
from .checkpoint import TrainCheckpointer, save_params_npz


def format_metrics_block(title: str, res: Dict[int, Dict[str, float]]) -> str:
    """Reference-format metric block for parity diffing against the captured
    ``.out`` logs (lightgcn.py:608-611; extended-metric fields in the same
    K= line per Version-2/lighgcn_cu_pop.py:888-933)."""
    lines = [f"{title} metrics:"]
    for K in sorted(res):
        r = res[K]
        ext = ""
        if "item_coverage" in r:
            ext = (f"COV={r['item_coverage']:.4f} "
                   f"LogPop={r['avg_log_popularity']:.4f} "
                   f"SI={r['avg_self_information']:.4f} ")
            # cred-group fields exist only when extended eval ran with a
            # cred vector (evaluate_full(cred=None) omits them)
            if "cred_utility" in r:
                ext += (f"CredU={r['cred_utility']:.4f} "
                        f"HighR={r['high_cred_recall']:.4f} "
                        f"LowR={r['low_cred_recall']:.4f} ")
        lines.append(
            f"  K={K}: P={r['precision']:.4f} R={r['recall']:.4f} "
            f"NDCG={r['ndcg']:.4f} {ext}({r['mode']})")
    return "\n".join(lines)


@dataclass
class TrainLogEntry:
    epoch: int
    loss: float
    val: Optional[Dict[int, Dict[str, float]]] = None
    seconds: float = 0.0


@dataclass
class FitResult:
    best_params: Dict[str, jax.Array]
    best_val_recall: float
    test_metrics: Dict[int, Dict[str, float]]
    history: list = field(default_factory=list)


class RecTrainer:
    def __init__(self, cfg: RecConfig, graph: BipartiteGraph,
                 cred: Optional[np.ndarray] = None, verbose: bool = True,
                 operator_factory=None, mesh=None):
        """``mesh``: a (data, model) ``jax.sharding.Mesh``.  When given, the
        FULL training path runs sharded end to end: propagation through
        edge-sharded operators (parallel/sharded_spmm.py, padded-chain),
        embedding tables + Adam state row-sharded over ``model``, BPR
        batches sharded over ``data``, and full-catalog eval through the
        distributed top-k (SURVEY.md C34 build target)."""
        cfg.validate()
        self.cfg = cfg
        self.graph = graph
        self.verbose = verbose
        self.mesh = mesh
        if mesh is not None and operator_factory is None:
            import functools
            from ..parallel.sharded_spmm import ShardedSpmmOperator
            operator_factory = functools.partial(
                ShardedSpmmOperator, mesh=mesh, mode=cfg.sharded_spmm_mode)

        if cred is None and cfg.cred_csv_path:
            cred = load_credibility_vector(cfg.cred_csv_path, graph.num_users,
                                           graph.user2idx)
        self.cred = cred if cred is not None else np.ones(
            graph.num_users, np.float32)

        self.model = LightGCN(cfg, graph, self.cred,
                              operator_factory=operator_factory)
        self.ctx = EvalContext.build(graph, membership=cfg.membership)

        deg_i = graph.train_item_degrees()
        self.pop_norm = jnp.asarray(
            deg_i / max(float(deg_i.max()), 1.0), jnp.float32)

        self.train_users = np.nonzero(graph.user_csr("train").degrees() > 0)[0]
        if self.train_users.size == 0:
            raise RuntimeError("No train users with interactions.")
        self.train_users_dev = jnp.asarray(self.train_users, jnp.int32)

        self.popmix = None
        if cfg.negative_sampler == "popmix":
            self.popmix = PopMixSampler.build(
                deg_i, mix_pop=cfg.neg_mix_pop, gamma=cfg.neg_pop_gamma)

        self.optimizer = optax.adam(cfg.lr)
        self._epoch_fn = None
        # jit once (re-wrapping per call would retrace every epoch); the
        # operator state flows as an argument so edge arrays never inline
        # into the compiled program as constants
        self._propagate_fn = jax.jit(
            lambda params, mstate: self.model.propagate(self._trim(params),
                                                        mstate))

    # ------------------------------------------------------------------
    def _pad_params(self, params):
        """Pad each (N, D) table with zero rows to ceil(N/P)*P so it row-
        shards evenly over the model axis — replication at non-divisible
        sizes (e.g. the reference's 58,867 users on a 4-way axis) would
        silently forfeit the memory sharding exists for.  ``_trim`` slices
        back to exact rows inside jit; the slice VJP zero-pads, so pad rows
        get exactly-zero grads and their Adam moments never move."""
        from ..parallel.mesh import MODEL_AXIS
        n_model = int(self.mesh.shape[MODEL_AXIS])
        self._row_pad = {}
        out = {}
        for k, v in params.items():
            rows = v.shape[0]
            padded = -(-rows // n_model) * n_model
            if padded != rows:
                self._row_pad[k] = rows
                v = jnp.concatenate(
                    [v, jnp.zeros((padded - rows,) + v.shape[1:], v.dtype)])
            out[k] = v
        return out

    def _trim(self, params):
        """Exact-row view of (possibly padded) mesh-path tables."""
        pad = getattr(self, "_row_pad", None)
        if not pad:
            return params
        return {k: (v[:pad[k]] if k in pad else v) for k, v in params.items()}

    def init_state(self, seed: Optional[int] = None):
        seed = self.cfg.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        key, kinit = jax.random.split(key)
        params = init_params(kinit, self.cfg, self.graph.num_users,
                             self.graph.num_items)
        if self.mesh is not None:
            from ..parallel.mesh import replicated, row_sharded
            params = self._pad_params(params)
            rep = replicated(self.mesh)
            rs = row_sharded(self.mesh)

            def sharding_for(x):
                return rs if getattr(x, "ndim", 0) >= 2 else rep

            params = jax.device_put(
                params, {k: sharding_for(v) for k, v in params.items()})
            opt_state = self.optimizer.init(params)
            opt_state = jax.tree.map(
                lambda x: jax.device_put(x, sharding_for(x)), opt_state)
        else:
            opt_state = self.optimizer.init(params)
        return params, opt_state, key

    # ------------------------------------------------------------------
    def train_state_bundle(self):
        """Device data the jitted epoch touches, passed as an argument."""
        return {"model": self.model.state, "train_csr": self.ctx.train_csr,
                "popmix": self.popmix, "pop_norm": self.pop_norm}

    def _sample_epoch(self, key, users_flat, bundle):
        """Epoch-hoisted sampling: ONE vectorized positive + negative draw
        for every batch of the epoch.

        Distribution-identical to per-batch draws (each user's samples are
        iid either way; only the PRNG stream order changes), but on TPU it
        collapses ~nb serialized latency-bound sampling ops per epoch into
        one large-batch call in the fast-gather regime — the per-op flat
        cost (~1.2 ms/serialized gather on v5e, docs/KERNEL.md) made
        per-batch sampling a fixed ~4 ms/step tax at reference scale."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel.mesh import DATA_AXIS
            users_flat = jax.lax.with_sharding_constraint(
                users_flat, NamedSharding(self.mesh, PartitionSpec(DATA_AXIS)))
        kp, kn = jax.random.split(key)
        pos = sample_positives(kp, bundle["train_csr"], users_flat)
        if bundle["popmix"] is not None:
            neg = sample_negatives_popmix(kn, bundle["train_csr"], users_flat,
                                          bundle["popmix"],
                                          rounds=self.cfg.neg_rounds)
        else:
            neg = sample_negatives_uniform(kn, bundle["train_csr"], users_flat,
                                           self.graph.num_items,
                                           rounds=self.cfg.neg_rounds)
        return pos, neg

    def _loss_fn(self, params, users, pos, neg, mask, bundle,
                 cached_rest: Optional[Tuple[jax.Array, jax.Array]] = None):
        params = self._trim(params)
        if cached_rest is None and self.mesh is None:
            # batch-row combine: gather each layer's batch rows and average
            # B-row vectors instead of materializing the combined tables —
            # bit-identical scores (gather commutes with the layer mean),
            # skips ~2 ms/step of full-table accumulation at reference
            # scale.  The mesh path keeps table combine (row gathers from
            # sharded tables would add per-layer collectives).
            B = users.shape[0]
            items = jnp.concatenate([pos, neg])
            u_rows, i_rows = self.model.propagate_rows(params, users, items,
                                                       bundle["model"])
            pos_s = jnp.sum(u_rows * i_rows[:B], axis=-1)
            neg_s = jnp.sum(u_rows * i_rows[B:], axis=-1)
            return self._loss_tail(params, users, pos, neg, mask, bundle,
                                   pos_s, neg_s)
        if cached_rest is None:
            user_emb, item_emb = self.model.propagate(params, bundle["model"])
        else:
            # "per_epoch" fast mode: the neighbor-propagation contribution is
            # cached (stale within the epoch, constant under grad) but the
            # layer-0 ego term comes from the CURRENT params so BPR gradients
            # flow — caching the whole propagated table would silently reduce
            # the loss to pure L2 shrinkage (zero ranking gradient).
            rest_u, rest_i = cached_rest
            ego_u, ego_i = ego_tables(params, self.graph.num_users)
            scale = 1.0 / (self.cfg.num_layers + 1)
            user_emb = rest_u + scale * ego_u
            item_emb = rest_i + scale * ego_i
        pos_s = LightGCN.score(user_emb, item_emb, users, pos)
        neg_s = LightGCN.score(user_emb, item_emb, users, neg)
        return self._loss_tail(params, users, pos, neg, mask, bundle,
                               pos_s, neg_s)

    def _loss_tail(self, params, users, pos, neg, mask, bundle, pos_s, neg_s):
        loss = losses.bpr_loss(pos_s, neg_s, mask)

        ego_u, ego_i = ego_tables(params, self.graph.num_users)
        reg = losses.ego_l2(ego_u[users], ego_i[pos], ego_i[neg], mask)
        loss = loss + self.cfg.reg * reg

        if self.cfg.lambda_fair != 0.0:
            fair = losses.fairness_loss(bundle["pop_norm"][pos], pos_s, mask)
            loss = loss + self.cfg.lambda_fair * fair
        return loss

    # ------------------------------------------------------------------
    def _build_epoch_fn(self):
        cfg = self.cfg
        B = cfg.batch_size
        n = self.train_users.size
        nb = -(-n // B)
        n_pad = nb * B

        def epoch_fn(params, opt_state, key, train_users_dev, bundle):
            kperm, ksamp, key = jax.random.split(key, 3)
            perm = jax.random.permutation(kperm, train_users_dev)
            pad = jnp.zeros((n_pad - n,), jnp.int32)
            users_flat = jnp.concatenate([perm, pad])
            pos_flat, neg_flat = self._sample_epoch(ksamp, users_flat, bundle)
            users_all = users_flat.reshape(nb, B)
            pos_all = pos_flat.reshape(nb, B)
            neg_all = neg_flat.reshape(nb, B)
            mask_all = (jnp.arange(n_pad) < n).reshape(nb, B)
            if self.mesh is not None:
                # keep each scanned batch row data-sharded
                from jax.sharding import NamedSharding, PartitionSpec
                from ..parallel.mesh import DATA_AXIS
                sh = NamedSharding(self.mesh,
                                   PartitionSpec(None, DATA_AXIS))
                users_all, pos_all, neg_all, mask_all = (
                    jax.lax.with_sharding_constraint(x, sh)
                    for x in (users_all, pos_all, neg_all, mask_all))

            cached = None
            if cfg.propagation_schedule == "per_epoch":
                tparams = self._trim(params)
                user_emb, item_emb = self.model.propagate(tparams,
                                                          bundle["model"])
                ego_u, ego_i = ego_tables(tparams, self.graph.num_users)
                scale = 1.0 / (cfg.num_layers + 1)
                cached = (jax.lax.stop_gradient(user_emb - scale * ego_u),
                          jax.lax.stop_gradient(item_emb - scale * ego_i))

            def step(carry, batch):
                params, opt_state = carry
                users, mask, pos, neg = batch
                loss, grads = jax.value_and_grad(self._loss_fn)(
                    params, users, pos, neg, mask, bundle, cached)
                updates, opt_state = self.optimizer.update(grads, opt_state,
                                                           params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), batch_losses = jax.lax.scan(
                step, (params, opt_state),
                (users_all, mask_all, pos_all, neg_all))
            return params, opt_state, key, jnp.mean(batch_losses)

        return jax.jit(epoch_fn, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def evaluate(self, params, split: str, key: Optional[jax.Array] = None,
                 extended: Optional[bool] = None):
        cfg = self.cfg
        extended = cfg.extended_metrics if extended is None else extended
        user_emb, item_emb = self._propagate_fn(params, self.model.state)
        if cfg.eval_mode == "full":
            return evaluate_full(user_emb, item_emb, self.ctx, split,
                                 Ks=cfg.Ks, batch=cfg.eval_batch,
                                 extended=extended, cred=self.cred,
                                 cred_group_pct=cfg.cred_group_pct,
                                 mesh=self.mesh, topk=cfg.eval_topk,
                                 score_dtype=cfg.eval_score_dtype)
        if key is None:
            # dedicated eval stream, reference's seed+999 (lightgcn.py:406)
            key = jax.random.PRNGKey(cfg.seed + 999)
        return evaluate_sampled(key, user_emb, item_emb, self.ctx, split,
                                Ks=cfg.Ks, n_negatives=cfg.sampled_negatives,
                                extended=extended, cred=self.cred,
                                cred_group_pct=cfg.cred_group_pct)

    # ------------------------------------------------------------------
    def fit(self, epochs: Optional[int] = None, seed: Optional[int] = None,
            checkpointer: Optional[TrainCheckpointer] = None,
            resume: bool = False) -> FitResult:
        cfg = self.cfg
        epochs = cfg.epochs if epochs is None else epochs
        params, opt_state, key = self.init_state(seed)
        start_epoch = 1
        best_val = -1.0
        best_params = jax.tree.map(jnp.copy, params)

        if checkpointer is not None and resume:
            state = checkpointer.restore(template={
                "params": params, "opt_state": opt_state, "key": key,
                "epoch": 0, "best_val": 0.0, "best_params": best_params})
            if state is not None:
                params = state["params"]
                opt_state = state["opt_state"]
                key = state["key"]
                start_epoch = int(state["epoch"]) + 1
                best_val = float(state["best_val"])
                best_params = state["best_params"]
                self._log(f"[CKPT] resumed at epoch {start_epoch}")

        if self._epoch_fn is None:
            self._epoch_fn = self._build_epoch_fn()

        # SURVEY §5: the structured JSONL stream and the human lines share
        # the product path — `train-rec --out D` leaves D/metrics.jsonl
        metric_log = None
        if cfg.out_dir:
            from ..eval.report import MetricLogger
            metric_log = MetricLogger(f"{cfg.out_dir}/metrics.jsonl",
                                      echo=False)

        selK = max(cfg.Ks)
        history = []
        for epoch in range(start_epoch, epochs + 1):
            t0 = time.perf_counter()
            params, opt_state, key, loss = self._epoch_fn(
                params, opt_state, key, self.train_users_dev,
                self.train_state_bundle())
            loss = float(loss)
            dt = time.perf_counter() - t0
            self._log(f"Epoch {epoch:02d} | loss={loss:.6f}")

            entry = TrainLogEntry(epoch=epoch, loss=loss, seconds=dt)
            if epoch % cfg.eval_every == 0:
                val_res = self.evaluate(params, "val")
                entry.val = val_res
                self._log(format_metrics_block("VAL", val_res))
                val_score = val_res[selK]["recall"]
                if val_score > best_val:
                    best_val = val_score
                    best_params = jax.tree.map(jnp.copy, params)
                    self._log(f"  saved best (val Recall@{selK}={best_val:.4f})")
                    if cfg.out_dir and cfg.save_best:
                        save_params_npz(f"{cfg.out_dir}/best_model.npz",
                                        self._trim(best_params))
            if metric_log is not None:
                rec = {"event": "epoch", "epoch": epoch, "loss": loss,
                       "seconds": dt}
                if entry.val is not None:
                    rec["val"] = {str(K): v for K, v in entry.val.items()}
                    rec["best_val"] = best_val
                metric_log.log(rec)
            history.append(entry)

            if checkpointer is not None:
                checkpointer.save(epoch, {
                    "params": params, "opt_state": opt_state, "key": key,
                    "epoch": epoch, "best_val": best_val,
                    "best_params": best_params})

        if checkpointer is not None:
            checkpointer.wait()
        test_res = self.evaluate(best_params, "test")
        self._log("\nTEST " + format_metrics_block("TEST", test_res)[5:])
        if metric_log is not None:
            metric_log.log({"event": "test", "best_val": best_val,
                            "test": {str(K): v for K, v in test_res.items()}})
            metric_log.close()
        # external contract: exact-row tables (mesh padding is internal)
        return FitResult(best_params=self._trim(best_params),
                         best_val_recall=best_val,
                         test_metrics=test_res, history=history)

    def _log(self, msg: str):
        if self.verbose:
            print(msg)
