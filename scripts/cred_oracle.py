"""Stage-A oracle: reference-semantics CredModel training on torch CPU.

A fresh, compact implementation of the reference's Stage-A TRAINING
HARNESS (/root/reference/main.py:609-1025) — per-user Python SLAS
sampling (p ∝ exp(κ·sim), labeled users upweighted), Python-assembled
2-hop subgraphs with temporal filtering, GraphSAGE-style two-stage EWA
aggregation, and the 3-part loss BCE + 0.1·smoothness + 0.1·InfoNCE —
used to quantify the framework's deliberate full-graph redesign
(models/cred_model.py docstring).  NOT part of the package; mirrors the
reference's algorithm, not its code.

Input: a heterograph .npz (user_x, user_y, item_x, edges, edge_attr) —
the same artifact the framework trainer consumes.
Output: min-max-normalized credibility scores .npy + percentile prints.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np
import torch
import torch.nn.functional as F

# reference constants (main.py:625-658,93-97)
BETA, GAMMA = 1.0, 1.0
SLAS_KAPPA = 3.0
SLAS_UPWEIGHT_LABELED = 1.0
K_NEIGH = 15
LAMBDA_SMOOTH = LAMBDA_CONT = 0.1
TAU_TEMP = 0.2
TEMP_SPLIT = 0.5
TS_COL = 3          # timestamp_norm column of the 5 edge attrs


class CredModel(torch.nn.Module):
    """main.py:660-707 — two-stage EWA aggregation + sigmoid head."""

    def __init__(self, user_in, item_in, hidden):
        super().__init__()
        self.user_proj = torch.nn.Linear(user_in, hidden)
        self.item_proj = torch.nn.Linear(item_in, hidden)
        self.item_upd = torch.nn.Linear(2 * hidden, hidden)
        self.user_upd = torch.nn.Linear(2 * hidden, hidden)
        self.out = torch.nn.Linear(hidden, 1)

    @staticmethod
    def _scatter(src, index, n):
        out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
        out.index_add_(0, index, src)
        return out

    def ewa_norm(self, ea, dst, n_dst):
        w = (BETA * ea[:, 0].clamp(0, 1) + GAMMA * ea[:, 1]).clamp(min=0.0)
        denom = self._scatter(w, dst, n_dst) + 1e-12
        return w / denom[dst]

    def forward_subgraph(self, x_u, x_i, e_u2i, ea_u2i):
        h_u0 = self.user_proj(x_u)
        h_i0 = self.item_proj(x_i)
        src, dst = e_u2i[0], e_u2i[1]
        w1t = self.ewa_norm(ea_u2i, dst, h_i0.size(0))
        m_i1 = self._scatter(w1t.unsqueeze(-1) * h_u0[src], dst, h_i0.size(0))
        h_i1 = F.relu(self.item_upd(torch.cat([h_i0, m_i1], -1)))
        # reverse direction uses the same edges/attrs (main.py:863-866)
        w2t = self.ewa_norm(ea_u2i, src, h_u0.size(0))
        m_u2 = self._scatter(w2t.unsqueeze(-1) * h_i1[dst], src, h_u0.size(0))
        h_u2 = F.relu(self.user_upd(torch.cat([h_u0, m_u2], -1)))
        cred = torch.sigmoid(self.out(h_u2)).squeeze(-1)
        return cred, h_u2, h_i1, w1t


def build_csr(src, dst, n_src):
    order = np.argsort(src, kind="mergesort")
    counts = np.bincount(src[order], minlength=n_src)
    ptr = np.zeros(n_src + 1, np.int64)
    np.cumsum(counts, out=ptr[1:])
    return ptr, dst[order].astype(np.int64), order.astype(np.int64)


def run(hg_npz, hidden, epochs, batch_size, lr, seed, log):
    z = np.load(hg_npz, allow_pickle=True)
    user_x = torch.tensor(np.nan_to_num(z["user_x"], nan=0.0),
                          dtype=torch.float32)
    user_y = torch.tensor(z["user_y"], dtype=torch.long)
    item_x = torch.tensor(np.nan_to_num(z["item_x"], nan=0.0),
                          dtype=torch.float32)
    edges = z["edges"].astype(np.int64)
    ea = torch.tensor(z["edge_attr"], dtype=torch.float32)
    U, I = user_x.size(0), item_x.size(0)

    # SLAS similarity profiles (main.py:727-737)
    def l2n(x):
        return x / (x.norm(dim=-1, keepdim=True) + 1e-12)
    item_feat_norm = l2n(item_x.clone())
    user_sum = torch.zeros((U, item_x.size(1)))
    user_sum.index_add_(0, torch.from_numpy(edges[0]),
                        item_feat_norm[torch.from_numpy(edges[1])])
    deg = torch.zeros(U).index_add_(
        0, torch.from_numpy(edges[0]), torch.ones(edges.shape[1]))
    user_mu = l2n(user_sum / deg.unsqueeze(-1).clamp(min=1.0))

    u_ptr, u_items, u_eids = build_csr(edges[0], edges[1], U)
    i_ptr, i_users, _ = build_csr(edges[1], edges[0], I)
    ts = ea[:, TS_COL].numpy()
    y_np = user_y.numpy()

    rng = np.random.default_rng(seed)
    torch.manual_seed(seed)

    def view_mask(eids, view):
        t = ts[eids]
        with np.errstate(invalid="ignore"):
            return (t < TEMP_SPLIT) if view == "early" else (t >= TEMP_SPLIT)

    def sample_items(u, view):
        s, e = u_ptr[u], u_ptr[u + 1]
        items, eids = u_items[s:e], u_eids[s:e]
        if view is not None:
            m = view_mask(eids, view)
            items = items[m]
        if items.size <= K_NEIGH:
            return items.copy()
        sim = (item_feat_norm[torch.from_numpy(items)]
               @ user_mu[u]).numpy()
        w = np.exp(SLAS_KAPPA * sim)
        w = w / (w.sum() + 1e-12)
        return items[rng.choice(items.size, K_NEIGH, replace=False, p=w)]

    def sample_users(i):
        s, e = i_ptr[i], i_ptr[i + 1]
        users = i_users[s:e]
        if users.size <= K_NEIGH:
            return users.copy()
        sim = (user_mu[torch.from_numpy(users)]
               @ item_feat_norm[i]).numpy()
        w = np.exp(SLAS_KAPPA * sim)
        w[y_np[users] >= 0] *= (1.0 + SLAS_UPWEIGHT_LABELED)
        w = w / (w.sum() + 1e-12)
        return users[rng.choice(users.size, K_NEIGH, replace=False, p=w)]

    def build_subgraph(seed_users, view):
        """main.py:809-883 — 2-hop SLAS subgraph, Python-assembled."""
        its = [sample_items(int(u), view) for u in seed_users]
        sampled_items = np.unique(np.concatenate(its)) if its else \
            np.empty(0, np.int64)
        extra = [sample_users(int(i)) for i in sampled_items]
        extra_users = np.unique(np.concatenate(extra)) if extra else \
            np.empty(0, np.int64)
        seed_set = set(seed_users.tolist())
        extra_only = np.array([u for u in extra_users.tolist()
                               if u not in seed_set], np.int64)
        users_g = np.concatenate([seed_users, extra_only])
        u_lid = {int(g): k for k, g in enumerate(users_g.tolist())}
        i_lid = {int(g): k for k, g in enumerate(sampled_items.tolist())}
        item_set = set(sampled_items.tolist())
        src_l, dst_l, eid_l = [], [], []
        for ug in users_g:
            ug = int(ug)
            s, e = u_ptr[ug], u_ptr[ug + 1]
            items, eids = u_items[s:e], u_eids[s:e]
            if view is not None:
                m = view_mask(eids, view)
                items, eids = items[m], eids[m]
            for it, eid in zip(items.tolist(), eids.tolist()):
                if it in item_set:
                    src_l.append(u_lid[ug])
                    dst_l.append(i_lid[it])
                    eid_l.append(eid)
        e_u2i = (torch.tensor([src_l, dst_l], dtype=torch.long)
                 if eid_l else torch.zeros((2, 0), dtype=torch.long))
        ea_sub = (ea[torch.tensor(eid_l, dtype=torch.long)]
                  if eid_l else torch.zeros((0, ea.size(1))))
        return {"bs": seed_users.size,
                "x_u": user_x[torch.from_numpy(users_g)],
                "y_u": user_y[torch.from_numpy(users_g)],
                "x_i": item_x[torch.from_numpy(sampled_items)],
                "e_u2i": e_u2i, "ea_u2i": ea_sub,
                "users_g": users_g}

    labeled = np.nonzero(y_np >= 0)[0]
    rng.shuffle(labeled)
    train_users = labeled[:int(0.8 * labeled.size)]
    log(f"[cred-oracle] U={U} I={I} E={edges.shape[1]} labeled={labeled.size} "
        f"train={train_users.size}")

    model = CredModel(user_x.size(1), item_x.size(1), hidden)
    opt = torch.optim.Adam(model.parameters(), lr=lr)

    def info_nce(z1, z2):
        z1, z2 = l2n(z1), l2n(z2)
        logits = (z1 @ z2.t()) / TAU_TEMP
        return F.cross_entropy(logits, torch.arange(z1.size(0)))

    for ep in range(1, epochs + 1):
        rng.shuffle(train_users)
        total, steps = 0.0, 0
        for s in range(0, train_users.size, batch_size):
            seed_b = train_users[s:s + batch_size].astype(np.int64)
            g1 = build_subgraph(seed_b, "early")
            g2 = build_subgraph(seed_b, "late")
            opt.zero_grad()
            pred1, h_u2_1, h_i1_1, w1t = model.forward_subgraph(
                g1["x_u"], g1["x_i"], g1["e_u2i"], g1["ea_u2i"])
            _, h_u2_2, _, _ = model.forward_subgraph(
                g2["x_u"], g2["x_i"], g2["e_u2i"], g2["ea_u2i"])
            bs = g1["bs"]
            y = g1["y_u"][:bs]
            keep = y >= 0
            loss_sup = (F.binary_cross_entropy(pred1[:bs][keep],
                                               y[keep].float())
                        if keep.any() else torch.tensor(0.0))
            if g1["e_u2i"].size(1):
                src, dst = g1["e_u2i"][0], g1["e_u2i"][1]
                diff = h_u2_1[src] - h_i1_1[dst]
                loss_sm = (w1t * diff.pow(2).sum(-1)).mean()
            else:
                loss_sm = torch.tensor(0.0)
            loss = (loss_sup + LAMBDA_SMOOTH * loss_sm
                    + LAMBDA_CONT * info_nce(h_u2_1[:bs], h_u2_2[:bs]))
            loss.backward()
            opt.step()
            total += float(loss.detach())
            steps += 1
        log(f"[cred-oracle] Epoch {ep:02d} | loss={total/max(steps,1):.4f}")

    # full inference, view=None, batched (main.py:965-984)
    model.eval()
    cred = np.empty(U, np.float32)
    with torch.no_grad():
        for s in range(0, U, batch_size):
            seed_b = np.arange(s, min(s + batch_size, U), dtype=np.int64)
            g = build_subgraph(seed_b, None)
            pred, _, _, _ = model.forward_subgraph(
                g["x_u"], g["x_i"], g["e_u2i"], g["ea_u2i"])
            cred[seed_b] = pred[:g["bs"]].numpy()
    cmin, cmax = float(cred.min()), float(cred.max())
    mm = (np.zeros_like(cred) if cmax - cmin < 1e-12
          else (cred - cmin) / (cmax - cmin)).astype(np.float32)
    p = np.percentile(mm, [10, 50, 90, 99])
    log(f"[cred-oracle] Percentiles: p10={p[0]:.4f} p50={p[1]:.4f} "
        f"p90={p[2]:.4f} p99={p[3]:.4f}")
    return mm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hg", required=True, help="heterograph .npz")
    ap.add_argument("--out", required=True, help="output cred .npy")
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    def log(m):
        print(m, file=sys.stderr, flush=True)

    t0 = time.time()
    mm = run(args.hg, args.hidden, args.epochs, args.batch_size, args.lr,
             args.seed, log)
    np.save(args.out, mm)
    print(json.dumps({"out": args.out, "seconds": time.time() - t0,
                      "p50": float(np.percentile(mm, 50))}))


if __name__ == "__main__":
    main()
