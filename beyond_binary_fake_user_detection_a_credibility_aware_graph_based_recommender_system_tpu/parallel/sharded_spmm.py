"""Edge-sharded SpMM over a device mesh (the sequence-parallel analog).

SURVEY.md §5: the reference has no sequences — the analog of sequence
parallelism here is sharding the propagation itself.  Scheme (scaling-book
style):

  * **Edge-count-balanced spans** (SURVEY.md §7 "load-balance edge blocks by
    edge count, not node count"): each node space (users / items / joint) is
    partitioned into P contiguous row spans whose edge counts are balanced
    at row granularity, then embedded in a *padded span layout* — a
    (P * rows_max, D) array, evenly shardable over ``model``, where device
    d's shard holds its span followed by zero padding.  Imbalance is
    bounded by the max single-row degree instead of the span row count.
  * Each device owns the edges landing in its destination span (padded to a
    common e_max; with balanced spans the edge padding waste is bounded and
    tested <20% on zipf graphs).
  * **Source exchange**, two modes inside ``shard_map``:
      - "allgather": all-gather the row-sharded padded source table over
        ICI (right at small tables: simple ring collective at full
        bandwidth);
      - "halo": all-to-all of only the *needed* rows — each owner gathers
        the precomputed per-receiver row lists from its local shard and
        ships them with one ``lax.all_to_all``; edges then index the
        receive buffer directly.  Volume is sum(unique rows needed) instead
        of P copies of the table — the win grows with table size and mesh
        (printed at build time).
  * Local weighted segment-sum lands in the device's padded span; the
    output stays row-sharded.  Backward = the transpose operator (source /
    destination and their layouts swapped) via custom VJP — never XLA's
    gather-VJP scatter.

Layouts are derived deterministically from edge degrees, so the two
directions of a bipartite model produce *equal* layouts per node space and
K-layer chains can stay in padded form end-to-end
(models/lightgcn.py propagate's padded chain).
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


# ---------------------------------------------------------------------------
# Padded span layout of a node space
# ---------------------------------------------------------------------------

def balanced_spans(weights: np.ndarray, n_dev: int) -> np.ndarray:
    """(P+1,) span boundaries with ~equal total weight per span.

    A small uniform weight floor spreads zero-degree rows instead of piling
    them into the last span.
    """
    n = weights.shape[0]
    w = weights.astype(np.float64) + max(weights.sum() / max(n, 1), 1.0) * 0.05
    cum = np.concatenate([[0.0], np.cumsum(w)])
    targets = cum[-1] * np.arange(1, n_dev) / n_dev
    cuts = np.searchsorted(cum, targets, side="left")
    bounds = np.concatenate([[0], cuts, [n]]).astype(np.int64)
    return np.maximum.accumulate(bounds)   # enforce monotone under ties


class SpanLayout:
    """Padded span layout: N rows -> (P * rows_max) slots, evenly shardable."""

    def __init__(self, boundaries: np.ndarray, mesh: Mesh):
        self.mesh = mesh
        self.P = int(mesh.shape[MODEL_AXIS])
        assert boundaries.shape[0] == self.P + 1
        self.boundaries = boundaries.astype(np.int64)
        self.num_rows = int(boundaries[-1])
        spans = np.diff(self.boundaries)
        self.rows_max = max(int(spans.max()), 1)
        self.padded_rows = self.P * self.rows_max

        rows = np.arange(self.num_rows, dtype=np.int64)
        dev = np.searchsorted(self.boundaries, rows, side="right") - 1
        fwd = dev * self.rows_max + (rows - self.boundaries[dev])
        inv = np.zeros(self.padded_rows, np.int64)
        mask = np.zeros(self.padded_rows, bool)
        inv[fwd] = rows
        mask[fwd] = True

        self._fwd_np = fwd.astype(np.int32)
        row_shard = NamedSharding(mesh, P(MODEL_AXIS, None))
        self.fwd = jax.device_put(fwd.astype(np.int32))
        self.inv = jax.device_put(inv.astype(np.int32))
        self.mask = jax.device_put(
            mask.astype(np.float32)[:, None], row_shard)
        self._row_shard = row_shard

    def equals(self, other: "SpanLayout") -> bool:
        return (other is self or
                np.array_equal(self.boundaries, other.boundaries))

    def slot_of(self, rows: np.ndarray) -> np.ndarray:
        """Host-side global row -> padded slot."""
        return self._fwd_np[rows]

    # Conversions are a dual pair of gathers; their VJPs are each other's
    # gather (never an XLA scatter).
    def to_padded(self, x: jax.Array) -> jax.Array:
        return _to_padded(self, x)

    def from_padded(self, p: jax.Array) -> jax.Array:
        return _from_padded(self, p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _to_padded(layout: SpanLayout, x: jax.Array) -> jax.Array:
    p = x[layout.inv] * layout.mask.astype(x.dtype)
    return jax.lax.with_sharding_constraint(p, layout._row_shard)


def _to_padded_fwd(layout, x):
    return _to_padded(layout, x), None


def _to_padded_bwd(layout, _, g):
    return (g[layout.fwd],)


_to_padded.defvjp(_to_padded_fwd, _to_padded_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _from_padded(layout: SpanLayout, p: jax.Array) -> jax.Array:
    return p[layout.fwd]


def _from_padded_fwd(layout, p):
    return _from_padded(layout, p), None


def _from_padded_bwd(layout, _, g):
    gp = g[layout.inv] * layout.mask.astype(g.dtype)
    return (jax.lax.with_sharding_constraint(gp, layout._row_shard),)


_from_padded.defvjp(_from_padded_fwd, _from_padded_bwd)


# ---------------------------------------------------------------------------
# One direction's device-stacked plan
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _DirPlan:
    src_ref: jax.Array     # (P, e_max) int32 — padded-slot (allgather) or
    #                        recv-buffer (halo) index per edge; pad -> 0
    dst_local: jax.Array   # (P, e_max) int32 local dst slot (pad -> rows_max)
    w: jax.Array           # (P, e_max) float32 (pad -> 0)
    send_idx: jax.Array | None   # (P, P, H_max) int32 local slots to ship
    e_max: int
    h_max: int
    pad_fraction: float
    edge_counts: tuple     # per-device real (unpadded) edge counts


def _plan_dir(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
              src_layout: SpanLayout, dst_layout: SpanLayout,
              mesh: Mesh, mode: str) -> _DirPlan:
    n_dev = dst_layout.P
    E = src.shape[0]
    src_slot = src_layout.slot_of(src)
    dst_slot = dst_layout.slot_of(dst)
    owner = dst_slot // dst_layout.rows_max
    order = np.lexsort((dst_slot, owner))
    src_slot, dst_slot, w, owner = (src_slot[order], dst_slot[order],
                                    w[order], owner[order])

    counts = np.bincount(owner, minlength=n_dev)
    e_max = max(int(counts.max()), 1)
    pad_fraction = float(n_dev * e_max - E) / max(n_dev * e_max, 1)
    starts = np.zeros(n_dev + 1, np.int64)
    np.cumsum(counts, out=starts[1:])

    src_ref = np.zeros((n_dev, e_max), np.int32)
    dst_loc = np.full((n_dev, e_max), dst_layout.rows_max, np.int32)
    w_p = np.zeros((n_dev, e_max), np.float32)
    for d in range(n_dev):
        s, e = starts[d], starts[d + 1]
        k = e - s
        dst_loc[d, :k] = dst_slot[s:e] - d * dst_layout.rows_max
        w_p[d, :k] = w[s:e]

    send_idx = None
    h_max = 1
    if mode == "allgather":
        for d in range(n_dev):
            s, e = starts[d], starts[d + 1]
            src_ref[d, :e - s] = src_slot[s:e]
    else:
        # phase 1: per (owner o, receiver d) unique local row lists + ranks
        uniq_lists = {}
        ranks = [None] * n_dev           # per receiver: (owner, rank) arrays
        for d in range(n_dev):
            s, e = starts[d], starts[d + 1]
            ss = src_slot[s:e]
            so = ss // src_layout.rows_max
            sl = ss - so * src_layout.rows_max
            rank = np.zeros(e - s, np.int64)
            for o in range(n_dev):
                sel = so == o
                uniq, inverse = np.unique(sl[sel], return_inverse=True)
                uniq_lists[(o, d)] = uniq
                rank[sel] = inverse
                h_max = max(h_max, int(uniq.size))
            ranks[d] = (so, rank)
        # phase 2: recv-buffer index = owner * h_max + rank
        for d in range(n_dev):
            s, e = starts[d], starts[d + 1]
            so, rank = ranks[d]
            src_ref[d, :e - s] = (so * h_max + rank).astype(np.int32)
        send_idx = np.zeros((n_dev, n_dev, h_max), np.int32)
        for (o, d), u in uniq_lists.items():
            if u.size:
                send_idx[o, d, :u.size] = u

    shard0 = NamedSharding(mesh, P(MODEL_AXIS))
    put = lambda a: jax.device_put(jnp.asarray(a), shard0)
    return _DirPlan(
        src_ref=put(src_ref), dst_local=put(dst_loc), w=put(w_p),
        send_idx=put(send_idx) if send_idx is not None else None,
        e_max=e_max, h_max=h_max, pad_fraction=pad_fraction,
        edge_counts=tuple(int(c) for c in counts))


# ---------------------------------------------------------------------------
# The operator
# ---------------------------------------------------------------------------

class ShardedSpmmOperator:
    """y = A @ x over the mesh with edge-balanced spans.

    ``apply(x)`` is dense-to-dense (layout conversions inside);
    ``apply_padded`` chains in padded layout (models/lightgcn.py uses it to
    convert once per propagate instead of once per operator).
    """

    padded_chain = True

    def __init__(self, edge_map: EdgeMap, mesh: Mesh, mode: str = "auto",
                 src_layout: SpanLayout | None = None,
                 dst_layout: SpanLayout | None = None,
                 verbose: bool = False):
        """``mode``: "halo" (all-to-all of needed rows), "allgather", or
        "auto" — pick per DIRECTION by comparing the halo's P*P*h_max
        row-slot volume against the all-gather's (P-1)*padded_rows (zipf
        head nodes are needed by every span, so the halo can exceed a
        plain all-gather on that direction while winning 2-3x on the
        other; see runs/sharding_report.json for the 10M-edge numbers)."""
        assert mode in ("halo", "allgather", "auto"), mode
        self.mesh = mesh
        self.mode = mode
        self.num_src = edge_map.num_src
        self.num_dst = edge_map.num_dst
        n_dev = mesh.shape[MODEL_AXIS]

        if src_layout is None:
            src_layout = SpanLayout(balanced_spans(
                np.bincount(edge_map.src, minlength=edge_map.num_src),
                n_dev), mesh)
        if dst_layout is None:
            dst_layout = SpanLayout(balanced_spans(
                np.bincount(edge_map.dst, minlength=edge_map.num_dst),
                n_dev), mesh)
        self.src_layout = src_layout
        self.dst_layout = dst_layout

        def plan_one(src, dst, w, sl, dl):
            """Returns (plan, mode, halo_h_max_considered).  In auto mode
            the halo plan is always built for the volume comparison; its
            true h_max is kept even when allgather wins, because the
            discarded plan's h_max is the number scaling analyses need
            (the final allgather plan reports a placeholder h_max=1)."""
            if mode != "auto":
                p = _plan_dir(src, dst, w, sl, dl, mesh, mode)
                return p, mode, (p.h_max if mode == "halo" else None)
            p = _plan_dir(src, dst, w, sl, dl, mesh, "halo")
            if n_dev * n_dev * p.h_max <= (n_dev - 1) * sl.padded_rows:
                return p, "halo", p.h_max
            return _plan_dir(src, dst, w, sl, dl, mesh, "allgather"), \
                "allgather", p.h_max

        self._fwd, self._fwd_mode, fwd_halo_h_max = plan_one(
            edge_map.src, edge_map.dst, edge_map.w, src_layout, dst_layout)
        self._bwd, self._bwd_mode, bwd_halo_h_max = plan_one(
            edge_map.dst, edge_map.src, edge_map.w, dst_layout, src_layout)
        self.pad_fraction = self._fwd.pad_fraction

        def volume(plan, m, sl):
            return (n_dev * n_dev * plan.h_max if m == "halo"
                    else (n_dev - 1) * sl.padded_rows)

        self.collective_rows = volume(self._fwd, self._fwd_mode, src_layout)
        self._volume_note = (
            f"fwd={self._fwd_mode} {self.collective_rows} row-slots, "
            f"bwd={self._bwd_mode} "
            f"{volume(self._bwd, self._bwd_mode, dst_layout)} row-slots")
        if verbose:
            print(f"[sharded-spmm] mode={mode} e_max={self._fwd.e_max} "
                  f"pad={self.pad_fraction:.1%} {self._volume_note}")

        n_real = int(sum(self._fwd.edge_counts))
        self.stats = {
            "mode": mode, "fwd_mode": self._fwd_mode,
            "bwd_mode": self._bwd_mode, "n_devices": int(n_dev),
            "num_src": self.num_src, "num_dst": self.num_dst,
            "num_edges": n_real,
            "src_padded_rows": src_layout.padded_rows,
            "dst_padded_rows": dst_layout.padded_rows,
            "fwd": {"edge_counts": list(self._fwd.edge_counts),
                    "e_max": self._fwd.e_max,
                    "pad_fraction": self._fwd.pad_fraction,
                    "h_max": self._fwd.h_max,
                    # true halo h_max even when auto picked allgather
                    # (the built allgather plan carries a placeholder 1)
                    "halo_h_max_considered": fwd_halo_h_max},
            "bwd": {"edge_counts": list(self._bwd.edge_counts),
                    "e_max": self._bwd.e_max,
                    "pad_fraction": self._bwd.pad_fraction,
                    "h_max": self._bwd.h_max,
                    "halo_h_max_considered": bwd_halo_h_max},
            # per-application collective volume in row-slots of width D.
            # halo_rows uses the TRUE halo h_max: when auto picked
            # allgather the built plan's h_max is a placeholder 1, so fall
            # back to the considered value (ADVICE r4 — the same trap the
            # scaling projection hit).
            "halo_rows": int(n_dev * n_dev * (
                fwd_halo_h_max if fwd_halo_h_max is not None
                else self._fwd.h_max)),
            "allgather_rows": int((n_dev - 1) * src_layout.padded_rows),
        }

        fwd_apply = self._make_apply(self._fwd, src_layout, dst_layout,
                                     self._fwd_mode)
        bwd_apply = self._make_apply(self._bwd, dst_layout, src_layout,
                                     self._bwd_mode)

        @jax.custom_vjp
        def _matvec_padded(xp):
            return fwd_apply(xp)

        _matvec_padded.defvjp(lambda xp: (fwd_apply(xp), None),
                              lambda _, g: (bwd_apply(g),))
        self.apply_padded = _matvec_padded

    def _make_apply(self, plan: _DirPlan, src_layout: SpanLayout,
                    dst_layout: SpanLayout, mode: str):
        mesh = self.mesh
        rows_max_dst = dst_layout.rows_max
        stacked = P(MODEL_AXIS)
        table = P(MODEL_AXIS, None)

        if mode == "allgather":
            @functools.partial(jax.shard_map, mesh=mesh,
                               in_specs=(stacked, stacked, stacked, table),
                               out_specs=table)
            def f(src_ref, dst_local, w, xp):
                x_full = jax.lax.all_gather(xp, MODEL_AXIS, axis=0,
                                            tiled=True)
                msg = x_full[src_ref[0]] * w[0][:, None].astype(x_full.dtype)
                y = jax.ops.segment_sum(msg, dst_local[0],
                                        num_segments=rows_max_dst + 1)
                return y[:rows_max_dst]

            return lambda xp: f(plan.src_ref, plan.dst_local, plan.w, xp)

        h_max = plan.h_max

        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(stacked, stacked, stacked, stacked,
                                     table),
                           out_specs=table)
        def f(send_idx, src_ref, dst_local, w, xp):
            # ship only the rows each receiver needs: gather my shard's
            # per-receiver row lists, one all-to-all over ICI
            buf = xp[send_idx[0]]                      # (P, H_max, D)
            recv = jax.lax.all_to_all(buf, MODEL_AXIS, split_axis=0,
                                      concat_axis=0, tiled=False)
            flat = recv.reshape(-1, xp.shape[-1])      # (P*H_max, D)
            msg = flat[src_ref[0]] * w[0][:, None].astype(flat.dtype)
            y = jax.ops.segment_sum(msg, dst_local[0],
                                    num_segments=rows_max_dst + 1)
            return y[:rows_max_dst]

        return lambda xp: f(plan.send_idx, plan.src_ref, plan.dst_local,
                            plan.w, xp)

    def apply(self, x: jax.Array) -> jax.Array:
        xp = self.src_layout.to_padded(x)
        yp = self.apply_padded(xp)
        return self.dst_layout.from_padded(yp)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.apply(x)
