"""Stage-A labeling and behavioral feature engineering — vectorized.

Replaces the reference's dict-accumulator streaming passes with numpy
segment operations over the columnar :class:`InteractionTable`:

  * weak labels (Ru)                  /root/reference/main.py:153-196
  * 6-feature set "v0"                /root/reference/main.py:247-373
  * 8-feature set "v1" (adds RNR+ETG, corpus-level LD, log-length RD,
    normalized burst)                 /root/reference/version_1/main_v2_.py:291-524

Exact-semantics notes (parity traps preserved):
  * ratings are binned with Python/banker's rounding then clipped to [1,5]
    (``int(round(r))``, main.py:282-283 — np.round matches);
  * v0 lexical diversity is the mean per-review type-token ratio divided by
    the user's TOTAL review count (reviews with zero tokens still count in
    the denominator, main.py:362);
  * v0 AAD uses the *binned* rating against the binned item mean while v1
    ARD uses the raw float rating (main.py:332-339 vs main_v2_.py:433-437);
  * v1 ETG converts timestamps to days with the ms/seconds heuristic
    (main_v2_.py:176-186), floors gaps, caps at 365 days, and returns 0 for
    users with < 3 timestamps;
  * burst buckets are 1-day epochs of the raw ms timestamp (main.py:68).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..utils.config import CredConfig
from .ingest import InteractionTable

V0_FEATURE_KEYS = [
    "Ru", "rating_entropy", "extremity_ratio", "average_rating_deviation",
    "review_burst_count", "lexical_diversity", "review_length_discrepancy",
]
V1_FEATURE_KEYS = V0_FEATURE_KEYS + ["RNR", "ETG"]

LABEL_TO_INT = {"fake": 0, "genuine": 1, "unlabeled": -1}


@dataclass
class UserLabels:
    total_reviews: np.ndarray     # (U,) int64
    helpful_reviews: np.ndarray   # (U,) int64
    Ru: np.ndarray                # (U,) float32
    label: np.ndarray             # (U,) int64 in {0 fake, 1 genuine, -1 unlabeled}

    def label_names(self) -> List[str]:
        inv = {v: k for k, v in LABEL_TO_INT.items()}
        return [inv[int(v)] for v in self.label]


def build_user_labels(table: InteractionTable,
                      cfg: Optional[CredConfig] = None) -> UserLabels:
    """Ru = #(helpful_vote > threshold) / #reviews; genuine >= 0.7,
    fake <= 0.3 (main.py:153-196, rule constants main.py:63-65)."""
    cfg = cfg or CredConfig()
    U = table.num_users
    lt = table.extra.get("label_total")
    lh = table.extra.get("label_helpful")
    if lt is not None and cfg.helpful_vote_threshold == 5:
        # all-records counters from ingest: the reference's step1 counts
        # every record with a user_id, even when item/rating are missing
        # (main.py:163-176)
        total = np.array([lt.get(u, 0) for u in table.user_ids], np.int64)
        helpful = np.array([lh.get(u, 0) for u in table.user_ids], np.int64)
    else:
        uidx = table.uidx.astype(np.int64)
        total = np.bincount(uidx, minlength=U)
        hv = np.nan_to_num(table.helpful_vote, nan=0.0)
        helpful = np.bincount(uidx, weights=(hv > cfg.helpful_vote_threshold),
                              minlength=U).astype(np.int64)
    Ru = np.where(total > 0, helpful / np.maximum(total, 1), 0.0)
    label = np.full(U, LABEL_TO_INT["unlabeled"], np.int64)
    label[Ru >= cfg.ru_genuine_th] = LABEL_TO_INT["genuine"]
    label[Ru <= cfg.ru_fake_th] = LABEL_TO_INT["fake"]
    return UserLabels(total_reviews=total, helpful_reviews=helpful,
                      Ru=Ru.astype(np.float32), label=label)


def _binned_ratings(rating: np.ndarray) -> np.ndarray:
    ri = np.round(rating.astype(np.float64)).astype(np.int64)  # banker's
    return np.clip(ri, 1, 5)


def _entropy_rows(counts: np.ndarray) -> np.ndarray:
    """Natural-log entropy per row of a (U, k) count matrix (main.py:135-144)."""
    n = counts.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = counts / np.maximum(n, 1)
        h = np.where(p > 0, -p * np.log(p), 0.0)
    return np.where(n[:, 0] > 0, h.sum(axis=1), 0.0)


def _burst_events(uidx: np.ndarray, ts: np.ndarray, tau_ms: int,
                  num_users: int) -> np.ndarray:
    """Per-user sum over buckets of (count-1 for count>1) == (#ts records -
    #distinct buckets) (main.py:344-369)."""
    valid = ts >= 0
    u = uidx[valid].astype(np.int64)
    bucket = ts[valid] // tau_ms
    n_ts = np.bincount(u, minlength=num_users)
    pairs = np.unique(np.stack([u, bucket], axis=1), axis=0)
    n_distinct = np.bincount(pairs[:, 0], minlength=num_users)
    return (n_ts - n_distinct).astype(np.float64)


def _etg_per_user(uidx: np.ndarray, ts: np.ndarray, num_users: int,
                  cap_days: int) -> np.ndarray:
    """Entropy of floored inter-review gaps in days (main_v2_.py:493-508)."""
    valid = ts >= 0
    u = uidx[valid].astype(np.int64)
    t = ts[valid].astype(np.float64)
    # ms/seconds heuristic (main_v2_.py:176-186)
    days = np.where(t >= 1e12, t / 1000.0, t) / 86400.0
    order = np.lexsort((days, u))
    u_s, d_s = u[order], days[order]
    etg = np.zeros(num_users, np.float64)
    counts = np.bincount(u_s, minlength=num_users)
    starts = np.zeros(num_users + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    for uu in np.nonzero(counts >= 3)[0]:
        d = d_s[starts[uu]:starts[uu + 1]]
        gaps = np.diff(d)
        gaps = gaps[gaps >= 0]
        if gaps.size == 0:
            continue
        g = np.clip(np.floor(gaps).astype(np.int64), 0, cap_days)
        _, cnt = np.unique(g, return_counts=True)
        p = cnt / cnt.sum()
        etg[uu] = float(-(p * np.log(p)).sum())
    return etg


@dataclass
class UserFeatures:
    keys: List[str]
    values: np.ndarray            # (U, len(keys)) float32 — includes Ru col 0
    labels: UserLabels


def compute_user_features(table: InteractionTable, cfg: Optional[CredConfig] = None,
                          labels: Optional[UserLabels] = None) -> UserFeatures:
    cfg = cfg or CredConfig()
    labels = labels or build_user_labels(table, cfg)
    U = table.num_users
    uidx = table.uidx.astype(np.int64)
    iidx = table.iidx.astype(np.int64)
    n = np.maximum(np.bincount(uidx, minlength=U), 0)
    n_safe = np.maximum(n, 1)
    ri = _binned_ratings(table.rating)
    v1 = cfg.feature_set == "v1"

    # rating entropy over the 5 bins
    bins = np.zeros((U, 5), np.int64)
    np.add.at(bins, (uidx, ri - 1), 1)
    H = _entropy_rows(bins)

    # extremity ratio
    extreme = np.bincount(uidx, weights=((ri == 1) | (ri == 5)), minlength=U)
    ER = extreme / n_safe

    # item means: v0 uses binned ratings, v1 raw floats (main.py:309 vs
    # main_v2_.py:382-383)
    I = table.num_items
    r_for_item = ri.astype(np.float64) if not v1 else table.rating.astype(np.float64)
    item_cnt = np.bincount(iidx, minlength=I)
    item_sum = np.bincount(iidx, weights=r_for_item, minlength=I)
    item_mean = item_sum / np.maximum(item_cnt, 1)

    # AAD / ARD
    r_for_dev = ri.astype(np.float64) if not v1 else table.rating.astype(np.float64)
    dev = np.abs(r_for_dev - item_mean[iidx])
    AAD = np.bincount(uidx, weights=dev, minlength=U) / n_safe

    # burst
    burst = _burst_events(uidx, table.timestamp, cfg.tau_ms, U)
    BC = burst / n_safe if v1 else burst

    # lexical diversity
    L = table.tok_count.astype(np.float64)
    if v1:
        tot_tokens = np.bincount(uidx, weights=L, minlength=U)
        uniq = table.extra.get("user_unique_tokens")
        if uniq is None:
            raise ValueError(
                "v1 lexical diversity needs corpus-level unique token counts; "
                "ingest with collect_token_hashes=True "
                "(main_v2_.py:483-485 semantics)")
        LD = np.where(tot_tokens > 0, uniq / np.maximum(tot_tokens, 1), 0.0)
    else:
        with np.errstate(invalid="ignore"):
            ttr = np.where(L > 0, table.uniq_tok_count / np.maximum(L, 1), 0.0)
        LD = np.bincount(uidx, weights=ttr, minlength=U) / n_safe

    # length discrepancy
    if v1:
        Llog = np.log1p(L)
        g = Llog.mean() if Llog.size else 0.0
        RD = np.bincount(uidx, weights=np.abs(Llog - g), minlength=U) / n_safe
    else:
        g = L.mean() if L.size else 0.0
        RD = np.bincount(uidx, weights=np.abs(L - g), minlength=U) / n_safe

    cols = [labels.Ru.astype(np.float64), H, ER, AAD, BC, LD, RD]
    keys = list(V0_FEATURE_KEYS)
    if v1:
        RNR = np.bincount(uidx, weights=(ri <= 2), minlength=U) / n_safe
        ETG = _etg_per_user(uidx, table.timestamp, U, cfg.etg_max_gap_days)
        cols += [RNR, ETG]
        keys = list(V1_FEATURE_KEYS)

    values = np.stack(cols, axis=1).astype(np.float32)
    return UserFeatures(keys=keys, values=values, labels=labels)


def save_labels_csv(path, table: InteractionTable, labels: UserLabels):
    """Reference user_labels.csv layout (main.py:181-194):
    user_id,total_reviews,helpful_reviews,Ru,label."""
    import csv
    names = labels.label_names()
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["user_id", "total_reviews", "helpful_reviews", "Ru",
                    "label"])
        for u in range(table.num_users):
            w.writerow([table.user_ids[u], int(labels.total_reviews[u]),
                        int(labels.helpful_reviews[u]),
                        float(labels.Ru[u]), names[u]])


def save_features_csv(path, table: InteractionTable, feats: UserFeatures):
    """Reference user_features.csv layout (main.py:375-398)."""
    import csv
    rows = features_to_csv_rows(table, feats)
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()) if rows else
                           ["user_id", "Ru", "label"])
        w.writeheader()
        for r in rows:
            w.writerow(r)


def features_to_csv_rows(table: InteractionTable,
                         feats: UserFeatures) -> List[dict]:
    """Rows in the reference user_features.csv layout (main.py:375-398)."""
    names = feats.labels.label_names()
    out = []
    for u in range(table.num_users):
        row = {"user_id": table.user_ids[u], "Ru": float(feats.labels.Ru[u]),
               "label": names[u]}
        for k, key in enumerate(feats.keys):
            if key == "Ru":
                continue
            row[key] = float(feats.values[u, k])
        out.append(row)
    return out
