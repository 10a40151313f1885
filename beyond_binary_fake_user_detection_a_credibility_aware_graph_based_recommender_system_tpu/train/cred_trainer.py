"""Stage-A trainer: credibility model training + score export.

Reference harness: ``train_and_export_credibility``
(/root/reference/main.py:609-1025).  Loss (Eq 3.18-3.21, main.py:894-963):

  L = BCE(labeled seed users, early view)
    + 0.1 * smoothness(early-view edges, normalized EWA weights)
    + 0.1 * InfoNCE(h_u2_early[seed], h_u2_late[seed], tau=0.2)

Training population: 80% shuffled split of the labeled users
(main.py:886-893), batches of 2048, Adam 1e-3, 100 epochs.

TPU-native differences (documented, deliberate):
  * full-graph forward per step instead of SLAS-sampled 2-hop subgraphs —
    the propagation is two weighted segment-sums over ~E edges, trivially
    chip-resident at reference scale (SURVEY.md §7 step 7); SLAS sampling
    remains available in ops/slas.py for beyond-chip graphs;
  * smoothness runs over ALL early-view edges each step (the reference's
    subgraph restriction was an artifact of sampling, not the loss);
  * one jitted step; epoch loop is a `lax.scan` over seed-user batches.

Export parity (main.py:965-1025): full-graph inference with no temporal
view, min-max normalization (constant -> zeros), ``credibility_scores.npy``
+ ``user_id,user_idx,credibility`` CSV + params checkpoint.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.cred_io import save_credibility_csv
from ..graph.hetero import HeteroGraph
from ..models import losses
from ..models.cred_model import CredModel, Params
from ..utils.config import CredConfig
from .checkpoint import save_params_npz


@dataclass
class CredFitResult:
    params: Params
    cred_raw: np.ndarray          # (U,) raw sigmoid scores
    cred_minmax: np.ndarray       # (U,) min-max normalized
    history: list = field(default_factory=list)


class CredTrainer:
    def __init__(self, hg: HeteroGraph, cfg: Optional[CredConfig] = None,
                 backend: str = "auto", verbose: bool = True,
                 operator_factory=None, mesh=None):
        """``mesh``: a (data, model) ``jax.sharding.Mesh`` — Stage-A forward
        then runs through edge-sharded operators (C14's sharded-inference
        target), same wiring as the Stage-B ``RecTrainer``."""
        self.cfg = cfg or CredConfig()
        self.hg = hg
        self.verbose = verbose
        self.mesh = mesh
        if mesh is not None and operator_factory is None:
            from ..parallel.sharded_spmm import ShardedSpmmOperator
            operator_factory = functools.partial(ShardedSpmmOperator,
                                                 mesh=mesh)
        # slas mode never touches the full-graph temporal-view operators —
        # skipping them saves 3 views x 2 E-sized operators (~1 GB device
        # + ~20 s construction at the 10M north star).  Kept under a mesh
        # (sharded full-graph inference stays available there).
        self.model = None
        if self.cfg.trainer_mode != "slas" or mesh is not None:
            self.model = CredModel(hg, self.cfg, backend=backend,
                                   operator_factory=operator_factory)
        self.slas_data = None
        if self.cfg.trainer_mode == "slas":
            from ..models.cred_slas import build_slas_graph_data
            self.slas_data = build_slas_graph_data(hg, self.cfg)
        self.optimizer = optax.adam(self.cfg.lr)

        labeled = np.nonzero(hg.user_y >= 0)[0]
        if labeled.size == 0:
            raise RuntimeError(
                "No labeled users found (y>=0). Check Ru labeling output.")
        rng = np.random.default_rng(self.cfg.seed)
        rng.shuffle(labeled)
        split = int(0.8 * labeled.size)
        self.train_users = np.sort(labeled[:split])
        # The reference computes this 20% split and never evaluates it
        # (main.py:886-893); here the holdout is monitored per epoch
        # (BCE + AUC) so overfitting is visible.
        self.holdout_users = np.sort(labeled[split:])
        self._log(f"[CRED] labeled users={labeled.size:,} | "
                  f"train={self.train_users.size:,} | "
                  f"holdout={self.holdout_users.size:,}")

        self.user_y = jnp.asarray(hg.user_y)
        self._epoch_fn = None
        self._slas_batch_fn = None

    def _log(self, msg):
        if self.verbose:
            print(msg)

    def _init_params(self, key) -> Params:
        if self.model is not None:
            return self.model.init(key)
        from ..models.cred_model import init_cred_params
        return init_cred_params(key, self.hg.user_x.shape[1],
                                self.hg.item_x.shape[1],
                                self.cfg.hidden_dim)

    @property
    def _model_state(self):
        return self.model.state if self.model is not None else None

    # ------------------------------------------------------------------
    def _loss(self, params: Params, seed_users: jax.Array, mask: jax.Array,
              key: Optional[jax.Array] = None, mstate=None, slas_data=None,
              user_y=None):
        # slas_data/user_y are threaded as explicit jit arguments rather
        # than read off ``self``: closure-captured device arrays are
        # embedded in the HLO as constants, and at the 10M north star the
        # (U,P)/(I,P) SLAS tables are ~1.5 GB — large enough to overflow
        # the compile request (observed: HTTP 413 from remote_compile).
        cfg = self.cfg
        if user_y is None:
            user_y = self.user_y
        if cfg.trainer_mode == "slas":
            return self._loss_slas(params, seed_users, mask, key,
                                   self.slas_data if slas_data is None
                                   else slas_data, user_y)
        pred1, h_u2_1, h_i1_1 = self.model.forward(params, "early", mstate)
        v1 = (mstate or self.model.state)["early"]
        _, h_u2_2, _ = self.model.forward(params, "late", mstate)

        y = user_y[seed_users]
        keep = (y >= 0) & mask
        loss_sup = losses.masked_bce(pred1[seed_users],
                                     y.astype(jnp.float32), keep)

        loss_smooth = losses.smoothness_loss(
            h_u2_1, h_i1_1, v1["src"], v1["dst"], v1["w_u2i_norm"],
            min_w=0.0)

        loss_cont = losses.info_nce(h_u2_1[seed_users], h_u2_2[seed_users],
                                    tau=cfg.tau_temp, mask=mask)

        return (loss_sup + cfg.lambda_smooth * loss_smooth
                + cfg.lambda_cont * loss_cont)

    def _loss_slas(self, params: Params, seeds: jax.Array, mask: jax.Array,
                   key: jax.Array, data, user_y):
        """Sampled-neighborhood loss: same three terms over the SLAS
        fixed-shape subgraph (reference main.py:913-958 semantics with the
        sampling moved on-device; see models/cred_slas.py)."""
        from ..models.cred_slas import slas_forward
        cfg = self.cfg
        k1, k2 = jax.random.split(key)
        pred1, h_u2_1, h_i1_1, (w_norm, item_mask) = slas_forward(
            params, data, seeds, k1, "early",
            cfg.k_item_neigh, cfg.k_user_neigh)
        _, h_u2_2, _, _ = slas_forward(
            params, data, seeds, k2, "late",
            cfg.k_item_neigh, cfg.k_user_neigh)

        y = user_y[seeds]
        keep = (y >= 0) & mask
        loss_sup = losses.masked_bce(pred1, y.astype(jnp.float32), keep)

        # smoothness over the (seed -> item slot) edges with normalized EWA
        # weights (main.py:894-907 restricted to the sampled subgraph)
        B, Ki = item_mask.shape
        h_u_rep = jnp.repeat(h_u2_1, Ki, axis=0)
        sq = jnp.sum((h_u_rep - h_i1_1) ** 2, axis=-1)
        w = w_norm * item_mask.reshape(-1) * jnp.repeat(mask, Ki)
        valid = (w > 0).astype(sq.dtype)
        denom = jnp.maximum(jnp.sum(valid), 1.0)
        loss_smooth = jnp.sum(w * sq) / denom

        loss_cont = losses.info_nce(h_u2_1, h_u2_2, tau=cfg.tau_temp,
                                    mask=mask)
        return (loss_sup + cfg.lambda_smooth * loss_smooth
                + cfg.lambda_cont * loss_cont)

    def _build_epoch_fn(self):
        cfg = self.cfg
        B = min(cfg.batch_size, self.train_users.size)
        n = self.train_users.size
        nb = -(-n // B)
        n_pad = nb * B
        train_users_dev = jnp.asarray(self.train_users, jnp.int32)

        def epoch_fn(params, opt_state, key, mstate, slas_data, user_y):
            kperm, key = jax.random.split(key)
            perm = jax.random.permutation(kperm, train_users_dev)
            pad = jnp.zeros((n_pad - n,), jnp.int32)
            users_all = jnp.concatenate([perm, pad]).reshape(nb, B)
            mask_all = (jnp.arange(n_pad) < n).reshape(nb, B)

            def step(carry, batch):
                params, opt_state, skey = carry
                users, mask = batch
                skey, ks = jax.random.split(skey)
                loss, grads = jax.value_and_grad(self._loss)(
                    params, users, mask, ks, mstate, slas_data, user_y)
                updates, opt_state = self.optimizer.update(grads, opt_state,
                                                           params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, skey), loss

            (params, opt_state, key), batch_losses = jax.lax.scan(
                step, (params, opt_state, key), (users_all, mask_all))
            return params, opt_state, key, jnp.mean(batch_losses)

        return jax.jit(epoch_fn, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def holdout_metrics(self, params: Params) -> Dict[str, float]:
        """BCE + AUC on the 20% labeled holdout (early view, like the
        supervised term) — the monitoring the reference's unused split
        never got."""
        if self.holdout_users.size == 0:
            return {"bce": float("nan"), "auc": float("nan")}
        if self.cfg.trainer_mode == "slas":
            # batched: one (B*Ki, Ku, H) neighborhood tensor per chunk —
            # an all-at-once holdout forward is GB-scale at the 10M north
            # star (200K labeled users -> 40K holdout seeds)
            scores = self._slas_scores_batched(
                params, self.holdout_users,
                jax.random.PRNGKey(self.cfg.seed + 77), view="early")
        else:
            pred, _, _ = jax.jit(self.model.forward, static_argnums=(1,))(
                params, "early", self.model.state)
            scores = np.asarray(pred)[self.holdout_users]
        y = np.asarray(self.hg.user_y)[self.holdout_users].astype(np.float64)
        s = np.clip(scores.astype(np.float64), 1e-7, 1 - 1e-7)
        bce = float(-np.mean(y * np.log(s) + (1 - y) * np.log(1 - s)))
        n_pos, n_neg = int(y.sum()), int((1 - y).sum())
        if n_pos == 0 or n_neg == 0:
            return {"bce": bce, "auc": float("nan")}
        # Mann-Whitney U with midranks for ties
        _, inv, cnt = np.unique(s, return_inverse=True, return_counts=True)
        csum = np.concatenate([[0], np.cumsum(cnt)])
        ranks = (csum[inv] + csum[inv + 1] + 1) / 2.0
        auc = (ranks[y > 0.5].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
        return {"bce": bce, "auc": float(auc)}

    def fit(self, epochs: Optional[int] = None, checkpointer=None,
            resume: bool = False) -> CredFitResult:
        """``checkpointer``: a train.checkpoint.TrainCheckpointer — async
        Orbax full-state (params+opt+epoch+key), resume with ``resume=True``
        (same contract as RecTrainer.fit)."""
        cfg = self.cfg
        epochs = cfg.epochs if epochs is None else epochs
        key = jax.random.PRNGKey(cfg.seed)
        key, kinit = jax.random.split(key)
        params = self._init_params(kinit)
        opt_state = self.optimizer.init(params)
        start_epoch = 1

        if checkpointer is not None and resume:
            state = checkpointer.restore(template={
                "params": params, "opt_state": opt_state, "key": key,
                "epoch": 0})
            if state is not None:
                params = state["params"]
                opt_state = state["opt_state"]
                key = state["key"]
                start_epoch = int(state["epoch"]) + 1
                self._log(f"[CRED] resumed at epoch {start_epoch}")

        if self._epoch_fn is None:
            self._epoch_fn = self._build_epoch_fn()

        history = []
        for ep in range(start_epoch, epochs + 1):
            t0 = time.perf_counter()
            params, opt_state, key, loss = self._epoch_fn(
                params, opt_state, key, self._model_state, self.slas_data,
                self.user_y)
            loss = float(loss)
            hm = self.holdout_metrics(params)
            history.append({"epoch": ep, "loss": loss,
                            "holdout_bce": hm["bce"],
                            "holdout_auc": hm["auc"],
                            "seconds": time.perf_counter() - t0})
            self._log(f"[CRED] Epoch {ep:02d} | loss={loss:.4f} | "
                      f"holdout BCE={hm['bce']:.4f} AUC={hm['auc']:.4f}")
            if checkpointer is not None:
                checkpointer.save(ep, {"params": params,
                                       "opt_state": opt_state,
                                       "key": key, "epoch": ep})
        if checkpointer is not None:
            checkpointer.wait()

        cred_raw = np.asarray(self.infer(params))
        cmin, cmax = float(cred_raw.min()), float(cred_raw.max())
        if (cmax - cmin) < 1e-12:
            cred_minmax = np.zeros_like(cred_raw, np.float32)
        else:
            cred_minmax = ((cred_raw - cmin) / (cmax - cmin)).astype(np.float32)
        self._log(f"[CRED] Raw cred: min={cmin:.6g}, max={cmax:.6g}")
        p10, p50, p90, p99 = np.percentile(cred_minmax, [10, 50, 90, 99])
        self._log(f"[CRED] Percentiles: p10={p10:.4f}, p50={p50:.4f}, "
                  f"p90={p90:.4f}, p99={p99:.4f}")
        return CredFitResult(params=params, cred_raw=cred_raw,
                             cred_minmax=cred_minmax, history=history)

    def _slas_scores_batched(self, params: Params, users: np.ndarray,
                             key: jax.Array, view: Optional[str] = None
                             ) -> np.ndarray:
        """Scores for ``users`` via fixed-size sampled-neighborhood
        batches (one compiled shape; bounded (B*Ki, Ku, H) peak)."""
        from ..models.cred_slas import slas_forward
        cfg = self.cfg
        B = min(cfg.batch_size, max(users.size, 1))

        if self._slas_batch_fn is None:
            # data as an argument, not a closure constant — see _loss.
            @functools.partial(jax.jit, static_argnames=("view",))
            def batch_fn(params, data, seeds, key, view=None):
                cred, _, _, _ = slas_forward(params, data, seeds,
                                             key, view, cfg.k_item_neigh,
                                             cfg.k_user_neigh)
                return cred
            self._slas_batch_fn = batch_fn

        out = np.zeros(users.size, np.float32)
        for s in range(0, users.size, B):
            seeds = users[s:s + B].astype(np.int64)
            n = seeds.size
            pad = np.zeros(B - n, np.int64)
            key, kb = jax.random.split(key)
            cred = self._slas_batch_fn(
                params, self.slas_data,
                jnp.asarray(np.concatenate([seeds, pad]), jnp.int32),
                kb, view=view)
            out[s:s + n] = np.asarray(cred)[:n]
        return out

    def infer(self, params: Params) -> jax.Array:
        """Inference with no temporal view (main.py:965-984).  slas mode
        scores users batch-wise on sampled neighborhoods (reference
        main.py:965-984 also infers on subgraphs)."""
        if self.cfg.trainer_mode != "slas":
            cred, _, _ = jax.jit(self.model.forward, static_argnums=(1,))(
                params, None, self.model.state)
            return cred
        U = self.hg.num_users
        return jnp.asarray(self._slas_scores_batched(
            params, np.arange(U, dtype=np.int64),
            jax.random.PRNGKey(self.cfg.seed + 1234), view=None))

    # ------------------------------------------------------------------
    def export(self, result: CredFitResult, out_dir) -> Dict[str, str]:
        """npy + CSV + params, the Stage-A/B contract (main.py:986-1025)."""
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        npy = out / "credibility_scores_minmax.npy"
        csv = out / "credibility_scores_minmax_with_user_id.csv"
        ckpt = out / "cred_model.npz"
        np.save(npy, result.cred_minmax)
        save_credibility_csv(csv, result.cred_minmax, self.hg.user_ids)
        save_params_npz(ckpt, result.params)
        self._log(f"[CRED] Saved: {npy}\n[CRED] Saved: {csv}\n"
                  f"[CRED] Saved: {ckpt}")
        return {"npy": str(npy), "csv": str(csv), "ckpt": str(ckpt)}
