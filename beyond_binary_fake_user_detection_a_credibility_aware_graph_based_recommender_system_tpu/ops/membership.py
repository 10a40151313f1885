"""Exact set-membership for (row, col) pairs via a bucketized hash table.

The samplers' rejection tests (`ops/sampling.py:row_contains`, replacing
the reference's per-user ``user_has_item`` dict lookups,
/root/reference/lightgcn.py:280-287) originally ran a fixed-depth binary
search over the per-row sorted CSR slice: ~12 *dependent* element-gather
rounds.  On TPU, dependent narrow gathers are the worst-case memory
pattern (~100x slower per element than row gathers, docs/KERNEL.md), so
the search dominated sampling cost.

This table makes membership ONE wide row-gather per candidate:

  * every present pair is packed into a bucket of ``SLOTS`` slots chosen
    by a 32-bit mix of (row, col) — buckets are rows of a
    ``(nbuckets, 2*SLOTS)`` int32 array with the row keys in lanes
    [0:SLOTS) and col keys in [SLOTS:2*SLOTS) (one 128-byte slab);
  * lookup gathers the bucket row and tests
    ``any((slab_rows == row) & (slab_cols == col))`` on the VPU;
  * the host builder doubles ``nbuckets`` until no bucket overflows, so
    lookups are EXACT (no false positives/negatives, no probe chains) and
    the rejection distribution is bit-identical to the binary-search path.

All arithmetic is uint32 (TPU-native; no x64 requirement).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

SLOTS = 16          # bucket width: 16 (row,col) pairs = one 128-byte slab
_EMPTY = np.int32(-1)

_M1 = np.uint32(0x9E3779B9)
_M2 = np.uint32(0x85EBCA6B)
_M3 = np.uint32(0xC2B2AE35)


def _mix_np(rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """32-bit avalanche mix of a (row, col) pair — numpy (host) version."""
    with np.errstate(over="ignore"):
        h = rows.astype(np.uint32) * _M1 ^ cols.astype(np.uint32) * _M2
        h ^= h >> np.uint32(16)
        h *= _M3
        h ^= h >> np.uint32(13)
    return h


def _mix_jnp(rows: jax.Array, cols: jax.Array) -> jax.Array:
    """Same mix on device (uint32 wrap-around semantics match numpy)."""
    h = (rows.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
         ^ cols.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0xC2B2AE35)
    return h ^ (h >> 13)


@dataclass(frozen=True)
class HashMembership:
    """Device-resident exact-membership table for a fixed pair set."""
    buckets: jax.Array        # (nbuckets, 2*SLOTS) int32; -1 = empty
    nbuckets: int             # power of two

    @classmethod
    def build(cls, rows: np.ndarray, cols: np.ndarray,
              target_load: float = 0.35) -> "HashMembership":
        """Host build: bucket ``nbuckets`` doubles until the fullest bucket
        fits ``SLOTS`` pairs (expected O(1) doublings at load 0.35).

        Pairs are DEDUPLICATED first — membership is a set question, and
        duplicate (row, col) interaction records (which real review data
        contains) would otherwise pin one bucket above SLOTS forever.
        Memory: ~128 bytes/bucket at load <= ``target_load``, i.e.
        roughly 23-46 bytes per unique pair (vs 4 for the CSR indices it
        shadows) — ~268 MB at the 10M-edge scale, a deliberate
        memory-for-latency trade (see module docstring); use
        ``membership="bsearch"`` where HBM is tighter."""
        pairs = np.stack([np.asarray(rows, np.int64),
                          np.asarray(cols, np.int64)], axis=1)
        if pairs.shape[0]:
            pairs = np.unique(pairs, axis=0)
        rows, cols = pairs[:, 0], pairs[:, 1]
        E = rows.shape[0]
        nb = 1
        while nb * SLOTS * target_load < max(E, 1):
            nb *= 2
        h = _mix_np(rows, cols)
        while True:
            b = (h & np.uint32(nb - 1)).astype(np.int64)
            counts = np.bincount(b, minlength=nb)
            if E == 0 or counts.max() <= SLOTS:
                break
            if nb > 64 * max(E, 1):
                raise RuntimeError(
                    f"hash table failed to settle at nb={nb} for E={E}")
            nb *= 2
        table = np.full((nb, 2 * SLOTS), _EMPTY, np.int32)
        if E:
            order = np.argsort(b, kind="stable")
            slot = np.arange(E) - np.cumsum(
                np.concatenate([[0], counts[:-1]]))[b[order]]
            table[b[order], slot] = rows[order].astype(np.int32)
            table[b[order], SLOTS + slot] = cols[order].astype(np.int32)
        return cls(buckets=jnp.asarray(table), nbuckets=nb)

    # Max candidates per slab gather: the (N, 2*SLOTS) int32 transient is
    # ~128 B/candidate, so one chunk tops out at ~512 MB; larger batches
    # (epoch-hoisted sampling at huge user counts: N = n_pad*(rounds+1))
    # stream through lax.map chunks instead of materializing a multi-GB
    # gather.  Static shapes => the split is decided at trace time.
    _CHUNK = 1 << 22

    def contains(self, rows: jax.Array, cols: jax.Array) -> jax.Array:
        """Elementwise membership; ``rows`` and ``cols`` broadcast against
        each other (numpy rules)."""
        shape = jnp.broadcast_shapes(rows.shape, cols.shape)
        rows = jnp.broadcast_to(rows, shape)
        cols = jnp.broadcast_to(cols, shape)
        r = rows.reshape(-1).astype(jnp.int32)
        c = cols.reshape(-1).astype(jnp.int32)

        def probe(rc):
            r, c = rc
            b = (_mix_jnp(r, c)
                 & jnp.uint32(self.nbuckets - 1)).astype(jnp.int32)
            slab = self.buckets[b]               # (n, 2*SLOTS) one gather
            hit = (slab[:, :SLOTS] == r[:, None]) & (
                slab[:, SLOTS:] == c[:, None])
            return jnp.any(hit, axis=-1)

        n = r.shape[0]
        if n <= self._CHUNK:
            return probe((r, c)).reshape(shape)
        k = -(-n // self._CHUNK)
        pad = k * self._CHUNK - n
        rp = jnp.pad(r, (0, pad)).reshape(k, self._CHUNK)
        cp = jnp.pad(c, (0, pad)).reshape(k, self._CHUNK)
        out = jax.lax.map(probe, (rp, cp)).reshape(-1)[:n]
        return out.reshape(shape)


jax.tree_util.register_dataclass(
    HashMembership, data_fields=["buckets"], meta_fields=["nbuckets"])
