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


def evaluate_sampled(model, train_csr, eval_csr, num_items, seed):
    """1 pos + 99 rejected negatives per eval user (lightgcn.py:397-456)."""
    indptr_tr, indices_tr = train_csr
    indptr_ev, indices_ev = eval_csr
    with torch.no_grad():
        user_emb, item_emb = model.tables()
    rng = np.random.default_rng(seed + 999)
    users = np.where(np.diff(indptr_ev) > 0)[0]
    sums = {K: [0.0, 0.0, 0.0] for K in KS}
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
        for K in KS:
            p, r, n = metrics_at_k(ranked, pos, K)
            sums[K][0] += p
            sums[K][1] += r
            sums[K][2] += n
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


def run(config, graph_npz, seed, epochs, eval_every, log):
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

    if config == "vanilla":
        model = VanillaModel(num_users, num_items,
                             build_vanilla_adj(train_edges, num_users,
                                               num_items))
    else:
        cred = np.ones(num_users, np.float64)  # all-ones per reference runs
        M_ui, M_iu = build_cu_mats(train_edges, num_users, num_items, cred)
        model = CuMessageModel(num_users, num_items, M_ui, M_iu)

    pop_prob = None
    if config == "pop_neg":
        deg = np.bincount(train_edges[1].astype(np.int64),
                          minlength=num_items).astype(np.float64)
        pop = np.power(deg + 1.0, 0.75)
        pop_prob = pop / (pop.sum() + 1e-12)

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
            opt.zero_grad()
            loss.backward()
            opt.step()
            total += float(loss.item())
            steps += 1
        if epoch % eval_every == 0:
            val = evaluate_sampled(model, train_csr, val_csr, num_items, seed)
            score = val[max(KS)]["recall"]
            log(f"[oracle {config} s{seed}] ep{epoch} loss={total/max(steps,1):.5f} "
                f"valR@{max(KS)}={score:.4f}")
            if score > best_val:
                best_val = score
                best_state = {k: v.clone() for k, v in
                              model.state_dict().items()}
    if best_state is not None:
        model.load_state_dict(best_state)
    test = evaluate_sampled(model, train_csr, test_csr, num_items, seed)
    return {"config": config, "seed": seed, "best_val": best_val,
            "test": test}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", required=True)
    ap.add_argument("--config", required=True,
                    choices=["vanilla", "cu_message", "pop_neg"])
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--eval-every", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    def log(m):
        print(m, file=sys.stderr, flush=True)

    t0 = time.time()
    res = run(args.config, args.graph, args.seed, args.epochs,
              args.eval_every, log)
    res["seconds"] = time.time() - t0
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
