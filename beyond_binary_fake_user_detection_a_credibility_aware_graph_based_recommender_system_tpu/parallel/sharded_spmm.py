"""Edge-sharded SpMM over a device mesh (the sequence-parallel analog).

SURVEY.md §5: the reference has no sequences — the analog of sequence
parallelism here is sharding the propagation itself.  Scheme (scaling-book
style, chosen for small embedding dims where activations are cheap to
replicate relative to edge traffic):

  * destination rows are partitioned into contiguous, equal-size ranges,
    one per device on the ``model`` axis;
  * each device owns the edge shard landing in its range (padded to a
    common length so SPMD shapes match), stored as stacked per-device
    arrays sharded on the leading axis;
  * inside ``shard_map``: all-gather the row-sharded source embeddings
    over ICI, run the LOCAL weighted segment-sum, emit the local
    destination rows — the output stays row-sharded;
  * backward = the transpose operator with source/destination swapped,
    wired through a custom VJP (never XLA's gather-VJP scatter).

Power-law caveat: ranges are equal in *rows*, so edge counts can skew
across devices; the per-shard padding absorbs it at some waste.  Edge-count
balanced ranges (uneven row spans + re-slicing) are the follow-up
optimization.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.operators import EdgeMap
from .mesh import MODEL_AXIS


@dataclass(frozen=True)
class _ShardedDir:
    """Stacked per-device edge arrays for one direction."""
    src: jax.Array        # (Pdev, E_max) int32, dst-sorted within shard
    dst_local: jax.Array  # (Pdev, E_max) int32 local dst row (pad -> rows_per)
    w: jax.Array          # (Pdev, E_max) float32 (pad -> 0)
    rows_per: int         # dst rows per device (padded)
    num_src: int
    num_dst: int


def _build_dir(edge_map: EdgeMap, n_dev: int) -> _ShardedDir:
    rows_per = -(-edge_map.num_dst // n_dev)
    owner = edge_map.dst // rows_per
    order = np.lexsort((edge_map.dst, owner))
    src = edge_map.src[order]
    dst = edge_map.dst[order]
    w = edge_map.w[order]
    own = owner[order]

    counts = np.bincount(own, minlength=n_dev)
    e_max = max(int(counts.max()), 1)
    src_p = np.zeros((n_dev, e_max), np.int32)
    dst_p = np.full((n_dev, e_max), rows_per, np.int32)  # pad -> scratch row
    w_p = np.zeros((n_dev, e_max), np.float32)
    starts = np.zeros(n_dev + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    for d in range(n_dev):
        s, e = starts[d], starts[d + 1]
        k = e - s
        src_p[d, :k] = src[s:e]
        dst_p[d, :k] = dst[s:e] - d * rows_per
        w_p[d, :k] = w[s:e]

    return _ShardedDir(src=jnp.asarray(src_p), dst_local=jnp.asarray(dst_p),
                       w=jnp.asarray(w_p), rows_per=rows_per,
                       num_src=edge_map.num_src, num_dst=edge_map.num_dst)


def _local_apply(src, dst_local, w, x_full, rows_per):
    """One device's weighted segment-sum into its local row range (+1
    scratch row swallowing the padding)."""
    msg = x_full[src] * w[:, None].astype(x_full.dtype)
    y = jax.ops.segment_sum(msg, dst_local, num_segments=rows_per + 1)
    return y[:rows_per]


class ShardedSpmmOperator:
    """y = A @ x with x row-sharded over ``model`` and y row-sharded over
    ``model``; collectives: one all-gather of x per application."""

    def __init__(self, edge_map: EdgeMap, mesh: Mesh):
        self.mesh = mesh
        n_dev = mesh.shape[MODEL_AXIS]
        self.num_src = edge_map.num_src
        self.num_dst = edge_map.num_dst
        self._fwd = _build_dir(edge_map, n_dev)
        self._bwd = _build_dir(
            EdgeMap(src=edge_map.dst, dst=edge_map.src, w=edge_map.w,
                    num_src=edge_map.num_dst, num_dst=edge_map.num_src),
            n_dev)

        data_spec = P(MODEL_AXIS)          # stacked per-device arrays
        x_spec = P(MODEL_AXIS, None)       # row-sharded tables

        def _shard_dir(d: _ShardedDir) -> _ShardedDir:
            sh = NamedSharding(mesh, data_spec)
            return _ShardedDir(
                src=jax.device_put(d.src, sh),
                dst_local=jax.device_put(d.dst_local, sh),
                w=jax.device_put(d.w, sh),
                rows_per=d.rows_per, num_src=d.num_src, num_dst=d.num_dst)

        self._fwd = _shard_dir(self._fwd)
        self._bwd = _shard_dir(self._bwd)

        def _make_apply(d: _ShardedDir):
            @functools.partial(
                jax.shard_map, mesh=mesh,
                in_specs=(data_spec, data_spec, data_spec, x_spec),
                out_specs=x_spec)
            def f(src, dst_local, w, x):
                x_full = jax.lax.all_gather(x, MODEL_AXIS, axis=0, tiled=True)
                return _local_apply(src[0], dst_local[0], w[0], x_full,
                                    d.rows_per)

            def apply(x):
                # uniform row shards: pad the source table to n_dev-divisible
                n_pad_src = -(-d.num_src // n_dev) * n_dev
                if x.shape[0] != n_pad_src:
                    xp = jnp.zeros((n_pad_src, x.shape[1]), x.dtype
                                   ).at[:x.shape[0]].set(x)
                else:
                    xp = x
                y = f(d.src, d.dst_local, d.w, xp)
                return y[:d.num_dst]

            return apply

        fwd_apply = _make_apply(self._fwd)
        bwd_apply = _make_apply(self._bwd)

        @jax.custom_vjp
        def _matvec(x):
            return fwd_apply(x)

        _matvec.defvjp(lambda x: (fwd_apply(x), None),
                       lambda _, g: (bwd_apply(g),))
        self.apply = _matvec

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.apply(x)
