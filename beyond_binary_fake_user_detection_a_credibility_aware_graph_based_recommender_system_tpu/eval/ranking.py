"""Ranking evaluators (sampled and full-catalog), batched on device.

The reference evaluates one user at a time in Python with a GPU->CPU sync
per user (/root/reference/lightgcn.py:397-509) — SURVEY.md §3.5 hot loop #3.
Here evaluation runs in fixed-size user batches: candidate rejection
sampling, scoring, ranking, and metric reduction all happen on device; the
host only accumulates scalar sums (and the coverage set for the extended
metrics).

Protocol parity:
  * eval users = users with >=1 interaction in the eval split
    (lightgcn.py:408).
  * sampled mode: 1 random positive from the user's eval row + 99 uniform
    negatives rejected against the user's full eval ground-truth set AND
    train items (lightgcn.py:415-430); a dedicated eval PRNG stream mirrors
    the reference's ``seed+999`` generator (lightgcn.py:406).
  * full mode: all-item scores with the user's train items masked to -1e9
    (lightgcn.py:477-490), top-K ranking.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.build import BipartiteGraph
from ..ops.sampling import (DeviceCSR, row_contains, sample_candidate_set,
                            sample_positives)
from .metrics import (cred_groups, item_popularity, novelty_stats,
                      sampled_rank_metrics, topk_metrics)


@dataclass
class EvalContext:
    """Device-resident evaluation state for one graph.

    Full-catalog masking builds (B, Pb) exclusion rows PER BATCH from the
    host CSR (``train_exclusion_rows``) — a global (U, Pmax) table reaches
    hundreds of MB under power-law degree skew.  The device popularity
    vector (extended metrics) is built lazily; the default sampled
    protocol never needs it."""
    graph: BipartiteGraph
    train_csr: DeviceCSR
    val_csr: DeviceCSR
    test_csr: DeviceCSR
    item_pop: np.ndarray              # (I,) int64 train popularity
    total_train: int
    eval_users: Dict[str, np.ndarray] = field(default_factory=dict)
    _item_pop_dev: Optional[jax.Array] = field(default=None, repr=False)

    @classmethod
    def build(cls, graph: BipartiteGraph,
              membership: str = "hash") -> "EvalContext":
        I = graph.num_items
        tr = graph.user_csr("train")
        va = graph.user_csr("val")
        te = graph.user_csr("test")
        pop, total = item_popularity(graph.train_edges, I)
        ctx = cls(
            graph=graph,
            train_csr=DeviceCSR.from_host(tr, I, membership=membership),
            val_csr=DeviceCSR.from_host(va, I, membership=membership),
            test_csr=DeviceCSR.from_host(te, I, membership=membership),
            item_pop=pop,
            total_train=total,
        )
        ctx.eval_users = {
            "val": np.nonzero(va.degrees() > 0)[0].astype(np.int64),
            "test": np.nonzero(te.degrees() > 0)[0].astype(np.int64),
        }
        return ctx

    def train_exclusion_rows(self, users: np.ndarray) -> np.ndarray:
        """(B, Pb) per-batch train-item exclusion rows — O(B*Pb) peak
        memory instead of the former global (U, Pmax) table (~460 MB at
        reference scale, untenable at the 10M north star)."""
        from .retrieval import exclusion_rows_for_users
        return exclusion_rows_for_users(self.graph, users, "train")

    @property
    def item_pop_dev(self) -> jax.Array:
        if self._item_pop_dev is None:
            self._item_pop_dev = jnp.asarray(self.item_pop)
        return self._item_pop_dev

    def split_csr(self, split: str) -> DeviceCSR:
        return {"train": self.train_csr, "val": self.val_csr,
                "test": self.test_csr}[split]


def _batched(users: np.ndarray, batch: int):
    """Yield (padded_batch_device, padded_batch_host, num_valid)."""
    for s in range(0, users.size, batch):
        chunk = users[s:s + batch]
        n = chunk.size
        if n < batch:
            chunk = np.concatenate([chunk, np.zeros(batch - n, np.int64)])
        yield jnp.asarray(chunk, jnp.int32), chunk, n


def rejection_rounds(max_degree: int, num_items: int) -> int:
    """Redraw rounds so residual collision probability is negligible.

    Per-candidate collision prob p <= max_degree/num_items; after r rounds
    the residual is p^(r+1).  Rounds are the dominant eval cost (each is a
    full binary-search membership sweep over (B, n_neg) candidates), so pick
    the smallest r with p^(r+1) < 1e-9 — 3 at reference scale (p~3e-5), more
    on small dense catalogs where the reference's loop-until-clean semantics
    would otherwise be violated."""
    p = min(max(max_degree, 1) / max(num_items, 2), 0.9)
    r = int(np.ceil(-9.0 / np.log10(p))) - 1
    return int(np.clip(r, 2, 30))


@functools.partial(jax.jit, static_argnames=("num_items", "n_neg", "rounds",
                                              "Ks", "extended", "total_train"))
def _sampled_batch(key, user_emb, item_emb, users, eval_csr: DeviceCSR,
                   train_csr: DeviceCSR, item_pop, num_items: int, n_neg: int,
                   rounds: int, Ks: tuple, extended: bool, total_train: int):
    """One eval batch, metrics INCLUDED — everything per-batch must live in
    one jitted function: eager jnp ops each pay a separate (remote) compile
    and dispatch, which dominated evaluation cost."""
    kpos, kneg = jax.random.split(key)
    pos = sample_positives(kpos, eval_csr, users)
    negs = sample_candidate_set(kneg, (eval_csr, train_csr), users,
                                num_items, n_neg, rounds=rounds)
    cand = jnp.concatenate([pos[:, None], negs], axis=1)        # (B, 1+n)
    scores = jnp.einsum("bd,bkd->bk", user_emb[users], item_emb[cand])
    rank = jnp.sum(scores[:, 1:] > scores[:, :1], axis=1)
    order = jnp.argsort(-scores, axis=1, stable=True)
    ranked = jnp.take_along_axis(cand, order, axis=1)
    per_user = sampled_rank_metrics(rank, Ks)
    logpop = selfinfo = None
    if extended:
        logpop, selfinfo = {}, {}
        for K in Ks:
            logpop[K], selfinfo[K] = novelty_stats(
                ranked[:, :K], item_pop, total_train, num_items)
    return per_user, ranked, logpop, selfinfo


@functools.partial(jax.jit, static_argnames=("Ks", "extended", "total_train",
                                              "num_items"))
def _full_metrics_from_topk(topk_items, users, test_csr: DeviceCSR, item_pop,
                            Ks: tuple, extended: bool, total_train: int,
                            num_items: int):
    hits = row_contains(test_csr, users, topk_items)
    gt_len = test_csr.indptr[users + 1] - test_csr.indptr[users]
    per_user = topk_metrics(hits, gt_len, Ks)
    logpop = selfinfo = None
    if extended:
        logpop, selfinfo = {}, {}
        for K in Ks:
            logpop[K], selfinfo[K] = novelty_stats(
                topk_items[:, :K], item_pop, total_train, num_items)
    return per_user, topk_items, logpop, selfinfo


@functools.partial(jax.jit, static_argnames=("Ks", "extended", "total_train",
                                              "num_items", "topk",
                                              "score_dtype"))
def _full_batch(user_emb, item_emb, users, excl_rows,
                test_csr: DeviceCSR, item_pop, Ks: tuple, extended: bool,
                total_train: int, num_items: int, topk: str = "exact",
                score_dtype: str = "fp32"):
    """``excl_rows``: (B, Pb) per-batch train-item rows (pad = num_items) —
    retraced per power-of-two Pb, never materializing the (U, Pmax) table.

    ``topk="approx"`` ranks with ``lax.approx_max_k`` (the TPU-native
    PartialReduce top-k, recall_target 0.99 per top-K entry) — the exact
    (B, I) sort is ~70% of full-eval batch time at the 10M north star
    (106.6 -> 39.2 ms/batch measured, scripts/probe_topk.py); on CPU the
    op lowers to the exact path.  "exact" (``lax.top_k``) is the parity
    default."""
    if score_dtype == "bf16":
        # bf16 score matmul + ranking: halves score-matrix bandwidth
        # (32.8 -> 26.6 ms/approx-batch at the 10M catalog); rank order
        # shifts only among scores within ~3 bf16 ulp of each other
        user_emb = user_emb.astype(jnp.bfloat16)
        item_emb = item_emb.astype(jnp.bfloat16)
    scores = user_emb[users] @ item_emb.T                       # (B, I)
    rows = jnp.arange(scores.shape[0])[:, None]
    # pad slots hold index num_items (out of range) -> mode="drop" discards
    # them, saving the pad-column concat+slice passes over the (B, I)
    # score matrix (39.9 -> 32.8 ms/batch at the 10M catalog)
    scores = scores.at[rows, excl_rows].set(-1e9, mode="drop")
    if topk == "approx":
        vals, topk_items = jax.lax.approx_max_k(scores, max(Ks),
                                                recall_target=0.99)
        # approx_max_k reduces per bin, so a bin whose every item is an
        # excluded train item can surface a -1e9 slot for a hub user;
        # demote such slots to the out-of-range sentinel ``num_items`` so
        # they never count as hits or coverage (the accumulator filters
        # ids >= num_items; row_contains returns False out of range).
        topk_items = jnp.where(vals > jnp.float32(-5e8), topk_items,
                               num_items).astype(jnp.int32)
    else:
        _, topk_items = jax.lax.top_k(scores, max(Ks))
    return _full_metrics_from_topk(topk_items, users, test_csr, item_pop,
                                   Ks, extended, total_train, num_items)


class _Accumulator:
    """Metric accumulation over user batches.

    Batch results stay ON DEVICE during the loop; everything transfers in a
    single ``jax.device_get`` at finalize time — per-batch host syncs over a
    remote device link dominate evaluation latency otherwise (measured ~8s
    per epoch at reference scale before this change)."""

    def __init__(self, Ks: Sequence[int], extended: bool,
                 num_items: Optional[int] = None):
        self.Ks = list(Ks)
        self.extended = extended
        self.num_items = num_items   # coverage filters sentinel ids >= this
        self.sums = {K: {} for K in self.Ks}
        self.rec_items = {K: set() for K in self.Ks} if extended else None
        self.per_user_recall = {K: [] for K in self.Ks}
        self.n_users = 0
        self._pending = []

    def add(self, per_user: Dict[int, Dict[str, jax.Array]], n_valid: int,
            ranked_items=None, logpop=None, selfinfo=None):
        self._pending.append((per_user, n_valid, ranked_items, logpop,
                              selfinfo))

    def _finalize(self):
        pending = jax.device_get(self._pending)
        self._pending = []
        for per_user, n_valid, ranked_items, logpop, selfinfo in pending:
            self.n_users += n_valid
            for K in self.Ks:
                for name, arr in per_user[K].items():
                    a = np.asarray(arr)[:n_valid]
                    self.sums[K][name] = self.sums[K].get(name, 0.0) + float(a.sum())
                self.per_user_recall[K].append(
                    np.asarray(per_user[K]["recall"])[:n_valid])
                if self.extended and ranked_items is not None:
                    ids = np.unique(ranked_items[:n_valid, :K])
                    if self.num_items is not None:
                        ids = ids[ids < self.num_items]
                    self.rec_items[K].update(ids.tolist())
                    self.sums[K]["logpop"] = self.sums[K].get(
                        "logpop", 0.0) + float(logpop[K][:n_valid].sum())
                    self.sums[K]["selfinfo"] = self.sums[K].get(
                        "selfinfo", 0.0) + float(selfinfo[K][:n_valid].sum())

    def results(self, mode: str, num_items: int, users: np.ndarray,
                cred: Optional[np.ndarray], cred_group_pct: float,
                n_negatives: Optional[int]) -> Dict[int, Dict[str, float]]:
        self._finalize()
        n = max(self.n_users, 1)
        out = {}
        high = low = None
        if self.extended and cred is not None:
            high, low = cred_groups(users, cred, cred_group_pct)
        for K in self.Ks:
            r = {name: s / n for name, s in self.sums[K].items()
                 if name not in ("logpop", "selfinfo")}
            r["users_eval"] = self.n_users
            r["mode"] = mode
            if n_negatives is not None:
                r["negatives"] = n_negatives
            if self.extended:
                recall_u = np.concatenate(self.per_user_recall[K]) \
                    if self.per_user_recall[K] else np.zeros(0)
                r["item_coverage"] = len(self.rec_items[K]) / max(num_items, 1)
                r["avg_log_popularity"] = self.sums[K].get("logpop", 0.0) / n
                r["avg_self_information"] = self.sums[K].get("selfinfo", 0.0) / n
                if cred is not None:
                    r["cred_utility"] = float(np.mean(cred[users])) if users.size else 0.0
                    pos_of = {int(u): k for k, u in enumerate(users)}
                    hi_idx = [pos_of[int(u)] for u in high]
                    lo_idx = [pos_of[int(u)] for u in low]
                    r["high_cred_recall"] = float(recall_u[hi_idx].mean()) if hi_idx else 0.0
                    r["low_cred_recall"] = float(recall_u[lo_idx].mean()) if lo_idx else 0.0
                    r["high_users"] = len(hi_idx)
                    r["low_users"] = len(lo_idx)
            out[K] = r
        return out


def evaluate_sampled(key: jax.Array, user_emb: jax.Array, item_emb: jax.Array,
                     ctx: EvalContext, split: str, Ks: Sequence[int] = (10, 20),
                     n_negatives: int = 99, batch: int = 4096,
                     extended: bool = False,
                     cred: Optional[np.ndarray] = None,
                     cred_group_pct: float = 0.20) -> Dict[int, Dict[str, float]]:
    users = ctx.eval_users[split] if split in ctx.eval_users else \
        np.nonzero(ctx.graph.user_csr(split).degrees() > 0)[0]
    if users.size == 0:
        raise RuntimeError(f"No users with {split} interactions.")
    eval_csr = ctx.split_csr(split)
    acc = _Accumulator(Ks, extended, num_items=ctx.graph.num_items)
    max_deg = int(max(ctx.graph.user_csr("train").degrees().max(initial=1),
                      ctx.graph.user_csr(split).degrees().max(initial=1)))
    rounds = rejection_rounds(max_deg, ctx.graph.num_items)
    for bu, _, n_valid in _batched(users, batch):
        key, kb = jax.random.split(key)
        per_user, ranked, logpop, selfinfo = _sampled_batch(
            kb, user_emb, item_emb, bu, eval_csr, ctx.train_csr,
            ctx.item_pop_dev, ctx.graph.num_items, n_negatives, rounds,
            tuple(Ks), extended, ctx.total_train)
        acc.add(per_user, n_valid, ranked if extended else None, logpop,
                selfinfo)
    return acc.results("sampled(1pos+neg)", ctx.graph.num_items, users, cred,
                       cred_group_pct, n_negatives)


def evaluate_full(user_emb: jax.Array, item_emb: jax.Array, ctx: EvalContext,
                  split: str, Ks: Sequence[int] = (10, 20), batch: int = 512,
                  extended: bool = False, cred: Optional[np.ndarray] = None,
                  cred_group_pct: float = 0.20, mesh=None,
                  topk: str = "exact",
                  score_dtype: str = "fp32") -> Dict[int, Dict[str, float]]:
    """Full-catalog masked ranking (lightgcn.py:459-509).

    With ``mesh``, the score matmul + masked top-k run column-sharded over
    the model axis with a distributed merge (parallel/sharded_topk.py) —
    the SURVEY §3.5 hot-loop-3 north star.  ``topk``/``score_dtype`` are
    honored on BOTH branches: single-chip via the fused metric kernel's
    approx/bf16 paths, mesh via the per-shard approx local top-k + bf16
    shard matmul with an exact final merge (VERDICT r4 item 4)."""
    users = ctx.eval_users[split] if split in ctx.eval_users else \
        np.nonzero(ctx.graph.user_csr(split).degrees() > 0)[0]
    if users.size == 0:
        raise RuntimeError(f"No users with {split} interactions.")
    # clamp large configured batches (RecConfig.eval_batch) on small
    # graphs: padding 100 eval users to 4096 would pay a (4096, I) score
    # matrix for nothing
    batch = min(batch, 1 << max(int(users.size - 1).bit_length(), 0))
    if topk == "approx" and batch > 1024 and ctx.graph.num_items > 100_000:
        # approx_top_k's candidate buffer is scoped-VMEM-bound; past the
        # limit the bf16 path silently shrinks its reduction (measured
        # recall collapse at (4096, 1M) — RecConfig.eval_batch docstring)
        import warnings
        warnings.warn(
            f"eval_topk='approx' with batch={batch} at "
            f"{ctx.graph.num_items:,} items risks silent approx_top_k "
            "recall degradation (scoped-VMEM limit); use batch<=1024 or "
            "eval_topk='exact'", stacklevel=2)
    eval_csr = ctx.split_csr(split)
    acc = _Accumulator(Ks, extended, num_items=ctx.graph.num_items)
    for bu, bu_host, n_valid in _batched(users, batch):
        excl = jnp.asarray(ctx.train_exclusion_rows(bu_host))
        if mesh is not None:
            from .retrieval import topk_for_users
            _, topk_items = topk_for_users(
                user_emb, item_emb, bu, max(Ks),
                exclude_batch_rows=excl, mesh=mesh,
                topk_method=topk, score_dtype=score_dtype)
            per_user, topk_items, logpop, selfinfo = _full_metrics_from_topk(
                topk_items, bu, eval_csr, ctx.item_pop_dev, tuple(Ks),
                extended, ctx.total_train, ctx.graph.num_items)
        else:
            per_user, topk_items, logpop, selfinfo = _full_batch(
                user_emb, item_emb, bu, excl, eval_csr,
                ctx.item_pop_dev, tuple(Ks), extended, ctx.total_train,
                ctx.graph.num_items, topk=topk, score_dtype=score_dtype)
        acc.add(per_user, n_valid, topk_items if extended else None, logpop,
                selfinfo)
    return acc.results("full", ctx.graph.num_items, users, cred,
                       cred_group_pct, None)
