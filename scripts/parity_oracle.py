"""Reference-faithful CPU oracle for quality-parity runs (VERDICT item 1).

A fresh, compact torch-CPU implementation of the reference's TRAINING-LOOP
SEMANTICS — per-user Python rejection sampling, full-graph propagation every
batch, sampled (1 pos + 99 neg) evaluation, best-on-val-Recall@K selection —
for three configurations:

  * vanilla    — symmetric D^-1/2 A D^-1/2 joint adjacency, single (U+I)
                 embedding table                 (/root/reference/lightgcn.py:306-349,515-632)
  * cu_message — Gauss-Seidel bipartite propagation, cred on item<-user
                 direction, max(deg,1) guard     (version_1/lightgcn_cu_message.py:347-452)
  * pop_neg    — cu_message + Method-E popularity-mix negative sampler,
                 pop^0.75 mix 0.7, <=50 tries    (version_1/lightgcn_cu_pop_method-e.py:336-359,625-638)
  * cred_eq322 — synchronous (Jacobi) bipartite propagation with the
                 user update consuming PREVIOUS-layer items (is_[-1]),
                 1e-12 degree guard, cred on the item<-user direction,
                 optional fairness loss lambda_fair*mean(pop[pos]*score)
                                                 (/root/reference/lightgcn_cu.py:368-463,639-648)
  * degree_aware — cu_message mats with Method-A popularity damping
                 alpha_i = 1/log1p(max(deg_i,1)) multiplied into BOTH
                 directions                      (version_1/lightgcn_cu_pop_Degree-Aware Message.py:349-403)
  * pop_extended — pop_neg + the Version-2 extended sampled evaluation:
                 item coverage, avg log-popularity, avg self-information
                 (Laplace smoothing), cred utility, high/low-cred group
                 recall (top/bottom 20% of evaluated users)
                                                 (/root/reference/Version-2/lighgcn_cu_pop.py:382-423,536-660)

This is the head-to-head baseline the TPU framework's training dynamics are
compared against on a SHARED graph + splits (scripts/parity_run.py); it is
NOT part of the framework package and intentionally mirrors the reference's
algorithm, not its code.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EMB_DIM = 64
NUM_LAYERS = 3
LR = 1e-3
REG = 1e-4
BATCH = 4096
KS = (10, 20)
N_NEG_EVAL = 99


def edges_to_user_csr(edges_2xE, num_users):
    """Per-user sorted item lists (lightgcn.py:259-277 semantics)."""
    u, i = edges_2xE[0].astype(np.int64), edges_2xE[1].astype(np.int64)
    order = np.argsort(u, kind="mergesort")
    u, i = u[order], i[order]
    counts = np.bincount(u, minlength=num_users)
    indptr = np.zeros(num_users + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    indices = i.copy()
    for k in range(num_users):
        s, e = indptr[k], indptr[k + 1]
        if e > s:
            indices[s:e] = np.sort(indices[s:e])
    return indptr, indices


def user_has_item(indptr, indices, user, item):
    s, e = indptr[user], indptr[user + 1]
    if s == e:
        return False
    j = np.searchsorted(indices[s:e], item)
    return j < (e - s) and indices[s + j] == item


def build_vanilla_adj(train_edges, num_users, num_items):
    """Symmetric normalized joint adjacency (lightgcn.py:352-372)."""
    u = train_edges[0].astype(np.int64)
    i = train_edges[1].astype(np.int64) + num_users
    rows = np.concatenate([u, i])
    cols = np.concatenate([i, u])
    n = num_users + num_items
    deg = np.bincount(rows, minlength=n).astype(np.float64)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0)
    vals = dinv[rows] * dinv[cols]
    idx = torch.tensor(np.vstack([rows, cols]), dtype=torch.long)
    return torch.sparse_coo_tensor(
        idx, torch.tensor(vals, dtype=torch.float32), size=(n, n)).coalesce()


def build_cu_mats(train_edges, num_users, num_items, cred_u):
    """M_ui [U,I] standard / M_iu [I,U] cred-weighted, max(deg,1) guard
    (version_1/lightgcn_cu_message.py:347-385)."""
    u = train_edges[0].astype(np.int64)
    i = train_edges[1].astype(np.int64)
    deg_u = np.bincount(u, minlength=num_users).astype(np.float64)
    deg_i = np.bincount(i, minlength=num_items).astype(np.float64)
    w = (1.0 / np.sqrt(np.maximum(deg_u, 1.0)))[u] * \
        (1.0 / np.sqrt(np.maximum(deg_i, 1.0)))[i]
    M_ui = torch.sparse_coo_tensor(
        torch.tensor(np.vstack([u, i]), dtype=torch.long),
        torch.tensor(w, dtype=torch.float32),
        size=(num_users, num_items)).coalesce()
    M_iu = torch.sparse_coo_tensor(
        torch.tensor(np.vstack([i, u]), dtype=torch.long),
        torch.tensor(cred_u[u] * w, dtype=torch.float32),
        size=(num_items, num_users)).coalesce()
    return M_ui, M_iu


def build_eq322_mats(train_edges, num_users, num_items, cred_u):
    """Eq 3.23/3.24 operators with the 1e-12 denominator guard
    (/root/reference/lightgcn_cu.py:368-399).  Note the guard differs from
    cu_message's max(deg,1) clamp: zero-degree endpoints blow UP here."""
    u = train_edges[0].astype(np.int64)
    i = train_edges[1].astype(np.int64)
    deg_u = np.bincount(u, minlength=num_users).astype(np.float32)
    deg_i = np.bincount(i, minlength=num_items).astype(np.float32)
    denom = np.sqrt(np.maximum(deg_u[u] * deg_i[i], 1e-12)).astype(np.float32)
    w_ui = (cred_u[u] / denom).astype(np.float32)   # item <- user (cred)
    w_iu = (1.0 / denom).astype(np.float32)          # user <- item
    M_ui = torch.sparse_coo_tensor(
        torch.tensor(np.vstack([i, u]), dtype=torch.long),
        torch.tensor(w_ui), size=(num_items, num_users)).coalesce()
    M_iu = torch.sparse_coo_tensor(
        torch.tensor(np.vstack([u, i]), dtype=torch.long),
        torch.tensor(w_iu), size=(num_users, num_items)).coalesce()
    return M_ui, M_iu, deg_i


def build_da_mats(train_edges, num_users, num_items, cred_u):
    """cu_message mats with Method-A damping alpha_i=1/log1p(max(deg_i,1))
    on BOTH directions (version_1/...Degree-Aware Message.py:349-403)."""
    u = train_edges[0].astype(np.int64)
    i = train_edges[1].astype(np.int64)
    deg_u = np.bincount(u, minlength=num_users).astype(np.float32)
    deg_i = np.bincount(i, minlength=num_items).astype(np.float32)
    w_base = (1.0 / np.sqrt(np.maximum(deg_u, 1.0)))[u] * \
             (1.0 / np.sqrt(np.maximum(deg_i, 1.0)))[i]
    alpha_i = (1.0 / np.log1p(np.maximum(deg_i, 1.0))).astype(np.float32)
    w_pop = (w_base * alpha_i[i]).astype(np.float32)
    M_ui = torch.sparse_coo_tensor(
        torch.tensor(np.vstack([u, i]), dtype=torch.long),
        torch.tensor(w_pop), size=(num_users, num_items)).coalesce()
    M_iu = torch.sparse_coo_tensor(
        torch.tensor(np.vstack([i, u]), dtype=torch.long),
        torch.tensor((cred_u[u].astype(np.float32) * w_pop)),
        size=(num_items, num_users)).coalesce()
    return M_ui, M_iu


class CredEq322Model(torch.nn.Module):
    """Synchronous-bipartite CredLightGCN (lightgcn_cu.py:405-448): the
    user update reads is_[-1] — the previous layer's ITEM embeddings —
    while the item update reads the current user embeddings (Jacobi)."""

    def __init__(self, num_users, num_items, M_ui, M_iu):
        super().__init__()
        self.M_ui, self.M_iu = M_ui, M_iu   # [I,U], [U,I]
        self.user_emb = torch.nn.Embedding(num_users, EMB_DIM)
        self.item_emb = torch.nn.Embedding(num_items, EMB_DIM)
        torch.nn.init.xavier_uniform_(self.user_emb.weight)
        torch.nn.init.xavier_uniform_(self.item_emb.weight)

    def tables(self):
        e_u, e_i = self.user_emb.weight, self.item_emb.weight
        us, is_ = [e_u], [e_i]
        for _ in range(NUM_LAYERS):
            e_i = torch.sparse.mm(self.M_ui, e_u)       # item <- user^k
            e_u = torch.sparse.mm(self.M_iu, is_[-1])   # user <- item^k (OLD)
            us.append(e_u)
            is_.append(e_i)
        return (torch.stack(us).mean(0), torch.stack(is_).mean(0))

    def ego(self, users, pos, neg):
        return (self.user_emb.weight[users], self.item_emb.weight[pos],
                self.item_emb.weight[neg])


class VanillaModel(torch.nn.Module):
    def __init__(self, num_users, num_items, adj):
        super().__init__()
        self.U, self.I = num_users, num_items
        self.adj = adj
        self.emb = torch.nn.Embedding(num_users + num_items, EMB_DIM)
        torch.nn.init.xavier_uniform_(self.emb.weight)

    def tables(self):
        x = self.emb.weight
        acc = x
        for _ in range(NUM_LAYERS):
            x = torch.sparse.mm(self.adj, x)
            acc = acc + x
        f = acc / (NUM_LAYERS + 1)
        return f[:self.U], f[self.U:]

    def ego(self, users, pos, neg):
        w = self.emb.weight
        return w[users], w[self.U + pos], w[self.U + neg]


class CuMessageModel(torch.nn.Module):
    def __init__(self, num_users, num_items, M_ui, M_iu):
        super().__init__()
        self.M_ui, self.M_iu = M_ui, M_iu
        self.user_emb = torch.nn.Embedding(num_users, EMB_DIM)
        self.item_emb = torch.nn.Embedding(num_items, EMB_DIM)
        torch.nn.init.xavier_uniform_(self.user_emb.weight)
        torch.nn.init.xavier_uniform_(self.item_emb.weight)

    def tables(self):
        u, i = self.user_emb.weight, self.item_emb.weight
        acc_u, acc_i = u, i
        for _ in range(NUM_LAYERS):
            i = torch.sparse.mm(self.M_iu, u)   # item <- user first
            u = torch.sparse.mm(self.M_ui, i)   # then user <- NEW item
            acc_u = acc_u + u
            acc_i = acc_i + i
        return acc_u / (NUM_LAYERS + 1), acc_i / (NUM_LAYERS + 1)

    def ego(self, users, pos, neg):
        return (self.user_emb.weight[users], self.item_emb.weight[pos],
                self.item_emb.weight[neg])


def bpr_loss(model, users, pos, neg, user_emb, item_emb):
    s_pos = (user_emb[users] * item_emb[pos]).sum(1)
    s_neg = (user_emb[users] * item_emb[neg]).sum(1)
    loss = -torch.log(torch.sigmoid(s_pos - s_neg) + 1e-12).mean()
    eu, ep, en = model.ego(users, pos, neg)
    reg = (eu.norm(2, dim=1).pow(2) + ep.norm(2, dim=1).pow(2)
           + en.norm(2, dim=1).pow(2)).mean()
    return loss + REG * reg


def metrics_at_k(ranked, pos, K):
    hits = [1 if int(x) == pos else 0 for x in ranked[:K]]
    h = sum(hits)
    dcg = sum(1.0 / math.log2(r + 2) for r, hh in enumerate(hits) if hh)
    return h / K, float(h), dcg  # idcg for 1 relevant = 1


def make_cred_groups(users, cred, pct=0.20):
    """Top/bottom pct of EVALUATED users by cred, k=max(round(n*pct),1),
    stable argsort ascending (Version-2/lighgcn_cu_pop.py:407-423)."""
    c = cred[users]
    k = max(int(round(users.size * pct)), 1)
    order = np.argsort(c)
    return users[order[-k:]].astype(np.int64), users[order[:k]].astype(np.int64)


def novelty_stats(topk, pop, total_train, num_items):
    """AvgLogPop + AvgSelfInformation with Laplace smoothing
    (Version-2/lighgcn_cu_pop.py:390-404)."""
    pops = pop[np.asarray(topk, dtype=np.int64)]
    lp = float(np.log(pops + 1.0).mean())
    p = (pops + 1.0) / (total_train + num_items)
    si = float((-np.log2(p)).mean())
    return lp, si


def evaluate_sampled(model, train_csr, eval_csr, num_items, seed,
                     extended=False, item_pop=None, total_train=0,
                     cred=None, cred_group_pct=0.20):
    """1 pos + 99 rejected negatives per eval user (lightgcn.py:397-456);
    with extended=True also the Version-2 beyond-accuracy metrics
    (Version-2/lighgcn_cu_pop.py:536-660)."""
    indptr_tr, indices_tr = train_csr
    indptr_ev, indices_ev = eval_csr
    with torch.no_grad():
        user_emb, item_emb = model.tables()
    rng = np.random.default_rng(seed + 999)
    users = np.where(np.diff(indptr_ev) > 0)[0]
    sums = {K: [0.0, 0.0, 0.0] for K in KS}
    ext = {K: {"logpop": 0.0, "selfinfo": 0.0,
               "high_r": 0.0, "low_r": 0.0, "high_n": 0, "low_n": 0}
           for K in KS}
    rec_items = {K: set() for K in KS}
    cred_sum = 0.0
    if extended:
        high_u, low_u = make_cred_groups(users.astype(np.int64), cred,
                                         cred_group_pct)
        high_set, low_set = set(map(int, high_u)), set(map(int, low_u))
    for u in users:
        s, e = indptr_ev[u], indptr_ev[u + 1]
        gt = indices_ev[s:e]
        gt_set = set(map(int, gt))
        pos = int(gt[rng.integers(0, len(gt))])
        negs = []
        while len(negs) < N_NEG_EVAL:
            j = int(rng.integers(0, num_items))
            if j in gt_set or user_has_item(indptr_tr, indices_tr, int(u), j):
                continue
            negs.append(j)
        cand = np.array([pos] + negs, dtype=np.int64)
        scores = (user_emb[int(u)].unsqueeze(0)
                  * item_emb[cand]).sum(1).numpy()
        ranked = cand[np.argsort(-scores)]
        if extended:
            cred_sum += float(cred[int(u)])
        for K in KS:
            p, r, n = metrics_at_k(ranked, pos, K)
            sums[K][0] += p
            sums[K][1] += r
            sums[K][2] += n
            if extended:
                topk = ranked[:K]
                rec_items[K].update(map(int, topk))
                lp, si = novelty_stats(topk, item_pop, total_train, num_items)
                ext[K]["logpop"] += lp
                ext[K]["selfinfo"] += si
                if int(u) in high_set:
                    ext[K]["high_r"] += r
                    ext[K]["high_n"] += 1
                if int(u) in low_set:
                    ext[K]["low_r"] += r
                    ext[K]["low_n"] += 1
    n_u = len(users)
    out = {K: {"precision": sums[K][0] / n_u, "recall": sums[K][1] / n_u,
               "ndcg": sums[K][2] / n_u} for K in KS}
    if extended:
        for K in KS:
            out[K].update({
                "item_coverage": len(rec_items[K]) / max(num_items, 1),
                "avg_log_popularity": ext[K]["logpop"] / n_u,
                "avg_self_information": ext[K]["selfinfo"] / n_u,
                "cred_utility": cred_sum / n_u,
                "high_cred_recall": ext[K]["high_r"] / max(ext[K]["high_n"], 1),
                "low_cred_recall": ext[K]["low_r"] / max(ext[K]["low_n"], 1),
            })
    return out


def evaluate_full(model, train_csr, eval_csr, num_items):
    """Full-catalog protocol (lightgcn.py:459-509): per eval user, rank ALL
    items with the user's train items masked to -1e9; P/R/NDCG@K against
    the user's full eval ground truth.  Deterministic (no eval RNG), so the
    batched torch ranking below is semantics-identical to the reference's
    per-user loop."""
    indptr_tr, indices_tr = train_csr
    indptr_ev, indices_ev = eval_csr
    users = np.where(np.diff(indptr_ev) > 0)[0]
    if len(users) == 0:
        raise RuntimeError("No users with eval interactions.")
    Kmax = max(KS)
    sums = {K: [0.0, 0.0, 0.0] for K in KS}
    with torch.no_grad():
        user_emb, item_emb = model.tables()
        for s in range(0, len(users), 512):
            bu = users[s:s + 512]
            scores = user_emb[torch.tensor(bu, dtype=torch.long)] @ item_emb.T
            for bi, u in enumerate(bu):
                ts, te = indptr_tr[u], indptr_tr[u + 1]
                if te > ts:
                    scores[bi, torch.tensor(indices_tr[ts:te],
                                            dtype=torch.long)] = -1e9
            top = torch.topk(scores, Kmax, dim=1).indices.numpy()
            for bi, u in enumerate(bu):
                gt = set(map(int, indices_ev[indptr_ev[u]:indptr_ev[u + 1]]))
                hits = [1 if int(j) in gt else 0 for j in top[bi]]
                for K in KS:
                    hc = sum(hits[:K])
                    dcg = sum(1.0 / math.log2(r + 2)
                              for r, hh in enumerate(hits[:K]) if hh)
                    idcg = sum(1.0 / math.log2(r + 2)
                               for r in range(min(len(gt), K)))
                    sums[K][0] += hc / K
                    sums[K][1] += hc / max(len(gt), 1)
                    sums[K][2] += dcg / idcg if idcg > 0 else 0.0
    n_u = len(users)
    return {K: {"precision": sums[K][0] / n_u, "recall": sums[K][1] / n_u,
                "ndcg": sums[K][2] / n_u} for K in KS}


def sample_neg_uniform(indptr, indices, user, num_items, rng):
    while True:
        j = int(rng.integers(0, num_items))
        if not user_has_item(indptr, indices, user, j):
            return j


def sample_neg_popmix(indptr, indices, user, num_items, rng, pop_prob,
                      mix_pop=0.7, max_tries=50):
    for _ in range(max_tries):
        if rng.random() < mix_pop:
            j = int(rng.choice(num_items, p=pop_prob))
        else:
            j = int(rng.integers(0, num_items))
        if not user_has_item(indptr, indices, user, j):
            return j
    return sample_neg_uniform(indptr, indices, user, num_items, rng)


def run(config, graph_npz, seed, epochs, eval_every, log,
        cred_path=None, lambda_fair=0.0, eval_mode="sampled"):
    z = np.load(graph_npz)
    train_edges, val_edges, test_edges = (z["train_edges"], z["val_edges"],
                                          z["test_edges"])
    num_users, num_items = int(z["num_users"]), int(z["num_items"])

    torch.manual_seed(seed)
    np.random.seed(seed)
    rng = np.random.default_rng(seed)

    train_csr = edges_to_user_csr(train_edges, num_users)
    val_csr = edges_to_user_csr(val_edges, num_users)
    test_csr = edges_to_user_csr(test_edges, num_users)

    # Cred vector: all-ones matches 4 of the 6 reference runs (the CSV was
    # missing at runtime); cred_eq322 runs take a real-like low-variance
    # vector via --cred (lightgcn_cu_fair.out used real scores, p50=0.065).
    if cred_path:
        cred = np.load(cred_path).astype(np.float64)
        assert cred.shape == (num_users,)
    else:
        cred = np.ones(num_users, np.float64)

    pop_norm = None
    if config == "vanilla":
        model = VanillaModel(num_users, num_items,
                             build_vanilla_adj(train_edges, num_users,
                                               num_items))
    elif config == "cred_eq322":
        M_ui, M_iu, deg_i = build_eq322_mats(train_edges, num_users,
                                             num_items, cred)
        model = CredEq322Model(num_users, num_items, M_ui, M_iu)
        # Eq 3.27 pop(i) from TRAIN degrees (lightgcn_cu.py:583-584)
        pop_norm = torch.tensor(
            (deg_i / max(float(deg_i.max()), 1.0)).astype(np.float32))
    elif config == "degree_aware":
        M_ui, M_iu = build_da_mats(train_edges, num_users, num_items, cred)
        model = CuMessageModel(num_users, num_items, M_ui, M_iu)
    else:  # cu_message / pop_neg / pop_extended
        M_ui, M_iu = build_cu_mats(train_edges, num_users, num_items, cred)
        model = CuMessageModel(num_users, num_items, M_ui, M_iu)

    deg_train = np.bincount(train_edges[1].astype(np.int64),
                            minlength=num_items).astype(np.float64)
    pop_prob = None
    if config in ("pop_neg", "pop_extended"):
        pop = np.power(deg_train + 1.0, 0.75)
        pop_prob = pop / (pop.sum() + 1e-12)
    extended = config == "pop_extended"
    item_pop = deg_train.astype(np.int64)
    total_train = int(item_pop.sum())
    eval_kw = dict(extended=extended, item_pop=item_pop,
                   total_train=total_train, cred=cred) if extended else {}

    opt = torch.optim.Adam(model.parameters(), lr=LR)
    indptr, indices = train_csr
    train_users = np.where(np.diff(indptr) > 0)[0]

    best_val, best_state = -1.0, None
    for epoch in range(1, epochs + 1):
        rng.shuffle(train_users)
        total, steps = 0.0, 0
        for s in range(0, len(train_users), BATCH):
            bu = train_users[s:s + BATCH]
            pos, neg = [], []
            for u in bu:
                s0, e0 = indptr[u], indptr[u + 1]
                pos.append(int(indices[rng.integers(s0, e0)]))
                if pop_prob is not None:
                    neg.append(sample_neg_popmix(indptr, indices, int(u),
                                                 num_items, rng, pop_prob))
                else:
                    neg.append(sample_neg_uniform(indptr, indices, int(u),
                                                  num_items, rng))
            ut = torch.tensor(bu, dtype=torch.long)
            pt = torch.tensor(pos, dtype=torch.long)
            nt = torch.tensor(neg, dtype=torch.long)
            user_emb, item_emb = model.tables()
            loss = bpr_loss(model, ut, pt, nt, user_emb, item_emb)
            if lambda_fair != 0.0 and pop_norm is not None:
                # Eq 3.27/3.28 minibatch fairness over observed positives
                # (lightgcn_cu.py:639-648)
                pos_scores = (user_emb[ut] * item_emb[pt]).sum(1)
                loss = loss + lambda_fair * (pop_norm[pt] * pos_scores).mean()
            opt.zero_grad()
            loss.backward()
            opt.step()
            total += float(loss.item())
            steps += 1
        if epoch % eval_every == 0:
            if eval_mode == "full":
                val = evaluate_full(model, train_csr, val_csr, num_items)
            else:
                val = evaluate_sampled(model, train_csr, val_csr, num_items,
                                       seed, **eval_kw)
            score = val[max(KS)]["recall"]
            log(f"[oracle {config} s{seed}] ep{epoch} loss={total/max(steps,1):.5f} "
                f"valR@{max(KS)}={score:.4f}")
            if score > best_val:
                best_val = score
                best_state = {k: v.clone() for k, v in
                              model.state_dict().items()}
    if best_state is not None:
        model.load_state_dict(best_state)
    if eval_mode == "full":
        test = evaluate_full(model, train_csr, test_csr, num_items)
    else:
        test = evaluate_sampled(model, train_csr, test_csr, num_items, seed,
                                **eval_kw)
    return {"config": config, "seed": seed, "best_val": best_val,
            "test": test, "lambda_fair": lambda_fair,
            "eval_mode": eval_mode, "cred": cred_path or "ones"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", required=True)
    ap.add_argument("--config", required=True,
                    choices=["vanilla", "cu_message", "pop_neg",
                             "cred_eq322", "cred_eq322_fair",
                             "degree_aware", "pop_extended"])
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--eval-every", type=int, default=2)
    ap.add_argument("--cred", default=None,
                    help="npy cred vector path (default all-ones)")
    ap.add_argument("--lambda-fair", type=float, default=0.0)
    ap.add_argument("--eval-mode", default="sampled",
                    choices=["sampled", "full"],
                    help="full = full-catalog masked ranking "
                         "(lightgcn.py:459-509), used for the fast-mode "
                         "parity column")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    def log(m):
        print(m, file=sys.stderr, flush=True)

    t0 = time.time()
    config, lam = args.config, args.lambda_fair
    if config == "cred_eq322_fair":   # alias: eq322 with fairness enabled
        config, lam = "cred_eq322", (lam or 1e-2)
    res = run(config, args.graph, args.seed, args.epochs,
              args.eval_every, log, cred_path=args.cred,
              lambda_fair=lam, eval_mode=args.eval_mode)
    res["config"] = args.config
    res["seconds"] = time.time() - t0
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
