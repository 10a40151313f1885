"""Vectorized on-device samplers.

The reference samples positives/negatives in per-user Python rejection loops
with numpy RNG (/root/reference/lightgcn.py:289-300, pop-mix variant
Version-2/lighgcn_cu_pop.py:349-376) — SURVEY.md §3.5 hot loop #2.  Here
sampling runs on device, whole batch at once:

  * membership tests are a fixed-depth vectorized binary search over the
    per-user *sorted* CSR rows (the host CSR builder guarantees sortedness);
  * rejection loops become a bounded number of batched redraw rounds —
    distribution-equivalent to the reference's sequential rejection, not
    bit-equivalent (SURVEY.md §7 "hard parts");
  * the popularity mixture draws from pop^gamma via an O(1) Walker/Vose
    ALIAS TABLE built in float64 on host (BASELINE's "vectorized on-device
    alias sampling") instead of ``rng.choice(p=...)`` — a float32
    inverse-CDF collapses at north-star catalogs (at 10M items the
    per-item probabilities ~1e-7 fall below the float32 ULP near 1.0, so
    adjacent CDF entries collide and tail items become unsamplable; the
    alias table's per-bucket accept values live in [0,1] where float32
    has full resolution);
  * SLAS-style weighted sampling without replacement uses Gumbel top-k.

All functions are jit-safe (static shapes, no data-dependent Python control
flow) and thread explicit PRNG keys.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import CSR


@dataclass(frozen=True)
class DeviceCSR:
    """Device-resident CSR with sorted rows (see graph/csr.py).

    ``hashmem`` (default): a bucketized hash table
    (ops/membership.HashMembership) giving EXACT membership in one wide
    row-gather per candidate — the binary-search path needs ~12 dependent
    element-gather rounds, the TPU's worst memory pattern.  Both paths
    return identical booleans, so the sampler outputs are bit-equal;
    ``membership="bsearch"`` keeps the table-free fallback.
    """
    indptr: jax.Array          # (N+1,) int32
    indices: jax.Array         # (nnz,) int32, sorted within each row
    hashmem: object            # Optional[HashMembership]
    num_rows: int
    num_cols: int
    search_iters: int          # static binary-search depth >= ceil(log2(max_deg))

    @classmethod
    def from_host(cls, csr: CSR, num_cols: int,
                  membership: str = "hash") -> "DeviceCSR":
        max_deg = int(csr.degrees().max()) if csr.nnz else 1
        iters = max(1, int(np.ceil(np.log2(max(max_deg, 2)))) + 1)
        hashmem = None
        if membership == "hash":
            from .membership import HashMembership
            deg = np.diff(csr.indptr)
            rows = np.repeat(np.arange(csr.num_rows, dtype=np.int64), deg)
            hashmem = HashMembership.build(rows, csr.indices)
        return cls(
            indptr=jnp.asarray(csr.indptr, dtype=jnp.int32),
            indices=jnp.asarray(csr.indices, dtype=jnp.int32)
            if csr.nnz else jnp.zeros((1,), jnp.int32),
            hashmem=hashmem,
            num_rows=csr.num_rows,
            num_cols=num_cols,
            search_iters=iters,
        )

jax.tree_util.register_dataclass(
    DeviceCSR, data_fields=["indptr", "indices", "hashmem"],
    meta_fields=["num_rows", "num_cols", "search_iters"])


def row_contains(csr: DeviceCSR, rows: jax.Array, cands: jax.Array) -> jax.Array:
    """Vectorized ``user_has_item`` (lightgcn.py:280-287).

    rows: (B,) int; cands: (B, ...) int -> bool of cands.shape.
    One hash-slab gather per candidate when the CSR carries a hash table,
    else a lower-bound binary search within each row's sorted slice.
    """
    shape = cands.shape
    if csr.hashmem is not None:
        cands2 = cands.reshape(shape[0], -1)
        return csr.hashmem.contains(rows[:, None], cands2).reshape(shape)
    cands2 = cands.reshape(shape[0], -1)
    lo0 = csr.indptr[rows][:, None].astype(jnp.int32)
    hi0 = csr.indptr[rows + 1][:, None].astype(jnp.int32)
    lo = jnp.broadcast_to(lo0, cands2.shape)
    hi = jnp.broadcast_to(hi0, cands2.shape)
    nmax = csr.indices.shape[0] - 1

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) >> 1
        v = csr.indices[jnp.clip(mid, 0, nmax)]
        go_right = v < cands2
        return (jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid))

    lo, hi = jax.lax.fori_loop(0, csr.search_iters, body, (lo, hi))
    found = (lo < jnp.broadcast_to(hi0, cands2.shape)) & (
        csr.indices[jnp.clip(lo, 0, nmax)] == cands2)
    return found.reshape(shape)


def sample_positives(key: jax.Array, csr: DeviceCSR, rows: jax.Array) -> jax.Array:
    """Uniform positive per row (lightgcn.py:289-293).  Rows with zero degree
    return the (meaningless) first slot — callers mask them out, matching the
    reference's ``if p is None: continue``."""
    lo = csr.indptr[rows]
    deg = csr.indptr[rows + 1] - lo
    off = jax.random.randint(key, rows.shape, 0, jnp.maximum(deg, 1))
    return csr.indices[jnp.clip(lo + off, 0, csr.indices.shape[0] - 1)]


def _redraw_uniform(key, shape, num_items):
    return jax.random.randint(key, shape, 0, num_items)


def _first_good(cand: jax.Array, good: jax.Array) -> jax.Array:
    """Select, per leading slot, the first candidate whose ``good`` flag is
    set; falls back to the LAST candidate when none is (it is the unchecked
    final redraw, mirroring the reference's bounded rejection loop)."""
    pad = jnp.ones(good.shape[:-1] + (1,), bool)
    pick = jnp.argmax(jnp.concatenate([good, pad], axis=-1), axis=-1)
    pick = jnp.minimum(pick, cand.shape[-1] - 1)
    return jnp.take_along_axis(cand, pick[..., None], axis=-1)[..., 0]


def sample_negatives_uniform(key: jax.Array, csr: DeviceCSR, rows: jax.Array,
                             num_items: int, rounds: int = 8) -> jax.Array:
    """Batched-rejection uniform negatives (lightgcn.py:296-300).

    ``rounds`` bounded redraw rounds; residual collision probability after r
    rounds is (deg/I)^r — negligible for recommendation graphs.  All rounds
    draw up-front and share ONE fused membership test (distribution-identical
    to sequential check-and-redraw — the selected item is the first
    non-member among iid draws — but ~3x faster: one 12-level binary search
    over a (B, rounds) batch instead of ``rounds`` dependent searches).
    """
    cand = _redraw_uniform(key, rows.shape + (rounds + 1,), num_items)
    good = ~row_contains(csr, rows, cand[..., :rounds])
    return _first_good(cand, good)


def build_alias_table(prob: np.ndarray):
    """Exact Walker/Vose alias table in float64.

    Returns ``(accept, alias)``: draw bucket j uniformly, keep j with
    probability ``accept[j]`` else emit ``alias[j]`` — O(1) per draw (two
    gathers) vs the inverse-CDF's log2(I)-deep searchsorted.

    Construction is the exact Vose pairing, vectorized: each round pairs
    every remaining deficit bucket ("small", scaled < 1) with one surplus
    bucket ("large"); a large that dips below 1 rejoins the smalls.  The
    pathological endgame — a handful of heavy buckets absorbing millions
    of smalls one round each — switches to a chunked absorb: each
    remaining large takes a contiguous run of smalls found by
    searchsorted over the cumulative deficits (identical arithmetic to
    running the rounds out, without the per-round Python cost).
    """
    prob = np.asarray(prob, np.float64)
    n = prob.shape[0]
    scaled = prob * (n / prob.sum())
    accept = np.ones(n, np.float64)
    alias = np.arange(n, dtype=np.int64)

    small = np.nonzero(scaled < 1.0)[0]
    large = np.nonzero(scaled >= 1.0)[0]
    while small.size and large.size:
        if large.size <= 8 < small.size:
            # chunked endgame: absorb runs of smalls per large
            deficits = 1.0 - scaled[small]
            pos = 0
            li = 0
            while li < large.size and pos < small.size:
                j = large[li]
                cum = np.cumsum(deficits[pos:])
                k = int(np.searchsorted(cum, scaled[j] - 1.0, side="left"))
                k = min(k, cum.shape[0] - 1)
                run = small[pos:pos + k + 1]
                accept[run] = scaled[run]
                alias[run] = j
                scaled[j] -= cum[k]
                if scaled[j] < 1.0 and li + 1 < large.size:
                    # j became a small: hand its deficit to the next large
                    small = np.append(small, j)
                    deficits = np.append(deficits, 1.0 - scaled[j])
                pos += k + 1
                li += 1
            # float residue: any leftovers keep accept=1 (self-alias)
            break
        k = min(small.size, large.size)
        s, l = small[:k], large[:k]
        accept[s] = scaled[s]
        alias[s] = l
        scaled[l] -= 1.0 - scaled[s]
        still_large = scaled[l] >= 1.0
        small = np.concatenate([small[k:], l[~still_large]])
        large = np.concatenate([large[k:], l[still_large]])
    return accept, alias


@dataclass(frozen=True)
class PopMixSampler:
    """Method E popularity-mixture negative sampler
    (Version-2/lighgcn_cu_pop.py:349-376; dist built :805-814).

    With probability ``mix_pop`` draw from p(i) ∝ (deg_i+1)^gamma via an
    alias table (built exactly in float64, see :func:`build_alias_table`),
    else uniform; reject interacted items with bounded redraws and a final
    uniform fallback round (mirroring the reference's 50-try fallback).
    """
    accept: jax.Array         # (I,) float32 alias accept thresholds
    alias: jax.Array          # (I,) int32 alias targets
    mix_pop: float
    num_items: int

    @classmethod
    def build(cls, item_train_degrees: np.ndarray, mix_pop: float = 0.7,
              gamma: float = 0.75) -> "PopMixSampler":
        pop = np.power(np.asarray(item_train_degrees, np.float64) + 1.0, gamma)
        accept, alias = build_alias_table(pop)
        return cls(accept=jnp.asarray(accept, jnp.float32),
                   alias=jnp.asarray(alias, jnp.int32),
                   mix_pop=float(mix_pop),
                   num_items=int(item_train_degrees.shape[0]))

    def draw(self, key: jax.Array, shape) -> jax.Array:
        ku, km, kb, ka = jax.random.split(key, 4)
        use_pop = jax.random.uniform(km, shape) < self.mix_pop
        bucket = jax.random.randint(kb, shape, 0, self.num_items)
        keep = jax.random.uniform(ka, shape) < self.accept[bucket]
        pop_draw = jnp.where(keep, bucket, self.alias[bucket])
        uni_draw = _redraw_uniform(ku, shape, self.num_items)
        return jnp.where(use_pop, pop_draw, uni_draw)

jax.tree_util.register_dataclass(
    PopMixSampler, data_fields=["accept", "alias"],
    meta_fields=["mix_pop", "num_items"])


def sample_negatives_popmix(key: jax.Array, csr: DeviceCSR, rows: jax.Array,
                            sampler: PopMixSampler, rounds: int = 8) -> jax.Array:
    """Pop-mix negatives with bounded redraws and a final uniform fallback
    for residual collisions (reference Version-2/lighgcn_cu_pop.py:372-376).
    Like :func:`sample_negatives_uniform`, all mixture draws happen up-front
    under one fused membership test (same distribution as check-and-redraw:
    first non-member among iid mixture draws, else the unchecked uniform
    fallback)."""
    kp, kf = jax.random.split(key)
    cand = sampler.draw(kp, rows.shape + (rounds + 1,))
    good = ~row_contains(csr, rows, cand)
    chosen = _first_good(cand, good)
    fallback = _redraw_uniform(kf, rows.shape, sampler.num_items)
    return jnp.where(good.any(axis=-1), chosen, fallback)


def sample_candidate_set(key: jax.Array, reject_csrs, rows: jax.Array,
                         num_items: int, k: int, rounds: int = 8) -> jax.Array:
    """(B, k) uniform candidates rejecting membership in ANY of the given
    CSRs — the sampled-evaluation negative draw (lightgcn.py:422-430 rejects
    both the user's full test ground-truth set and their train items)."""
    cand = _redraw_uniform(key, (rows.shape[0], k, rounds + 1), num_items)
    bad = jnp.zeros((rows.shape[0], k * (rounds + 1)), bool)
    for csr in reject_csrs:
        bad = bad | row_contains(csr, rows,
                                 cand.reshape(rows.shape[0], -1))
    good = ~bad.reshape(cand.shape)[..., :rounds]
    return _first_good(cand, good)


def gumbel_topk(key: jax.Array, logits: jax.Array, k: int,
                mask: jax.Array | None = None):
    """Weighted sampling WITHOUT replacement via Gumbel top-k.

    Exactly k indices with inclusion probabilities following the softmax of
    ``logits`` — the on-device equivalent of the reference's
    ``rng.choice(..., replace=False, p=w)`` SLAS draw (main.py:758-807).
    Masked slots are excluded.  Returns (indices, gumbel_scores).
    """
    g = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape) + 1e-20) + 1e-20)
    scored = logits + g
    if mask is not None:
        scored = jnp.where(mask, scored, -jnp.inf)
    if k > scored.shape[-1]:
        # candidate pool narrower than k (e.g. a capped slas_pad_deg below
        # k_item_neigh): take the whole pool, pad to k with invalid slots
        # (-inf scores — callers mask on isfinite)
        vals, idx = jax.lax.top_k(scored, scored.shape[-1])
        pad = k - scored.shape[-1]
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        return idx, vals
    vals, idx = jax.lax.top_k(scored, k)
    return idx, vals
