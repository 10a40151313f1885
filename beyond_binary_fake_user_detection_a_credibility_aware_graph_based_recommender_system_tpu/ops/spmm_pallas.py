"""Pallas TPU segment-sum SpMM kernel: scatter-as-matmul over the MXU.

This is the north-star kernel (SURVEY.md C35, §7 step 2) replacing
``torch.sparse.mm``.  TPUs have no efficient hardware scatter; XLA lowers
scatter-add to serialized updates.  Instead we reformulate the irregular
per-destination reduction as a sequence of small dense matmuls:

  1. Host planning (once per graph): edges are sorted by destination;
     destination rows are partitioned into fixed blocks of ``R`` rows, and
     each block's contiguous edge run is padded to a multiple of ``T``
     edges (every block owns at least one chunk so its accumulator gets
     zero-initialized).  Work is balanced by *edge count*, not node count —
     a power-law hub row simply owns more chunks (SURVEY.md §7 "hard
     parts").  Blocks cover RAW row ranges: the output is a plain slice, no
     decompression pass (a compressed-row variant spent ~2ms/call
     re-gathering 262K rows back to the full destination space).
  2. Device: raw source rows ``msg[e] = x[src[e]]`` come from an XLA
     gather (in-kernel gather alternatives measured worse on this stack:
     tpu.dynamic_gather crashes the Mosaic remote compiler, and a scalar
     row-copy loop runs at ~184 ns/row vs XLA's ~3-7 ns/row).  The kernel
     walks edge chunks on a 1-D sequential grid; for each chunk it builds a
     WEIGHTED one-hot ``(R, T)`` matrix (w folded into the scatter matrix —
     a separate ``w * msg`` pass cost 7.6 ms/step in HBM traffic) from the
     edges' local row ids and accumulates ``onehot @ msg_chunk`` into the
     block's ``(R, D)`` VMEM accumulator on the MXU.  ``msg_dtype=bfloat16``
     halves gather + message HBM bytes (measured 2.6x faster gathers) and
     runs the MXU pass at bf16 rate with fp32 accumulation — an opt-in fast
     mode; fp32 is the parity default.  Scalar-prefetched per-chunk
     metadata (block id, first-chunk flag) drives the output block index
     map, so consecutive chunks of one block revisit the same VMEM buffer
     with no HBM round-trip.

Two round-2 refinements (both measured on a real v5e, docs/KERNEL.md):

  * **Window plans** (``window=W``): because edges are dst-sorted, the rows
    one chunk touches form a contiguous span.  When the destination's mean
    degree is high (e.g. the users<-items direction: 6 edges/row), a
    T-edge chunk spans only ~T/deg rows, so the one-hot shrinks from
    (R, T) to (W, T), W<<R, and accumulates at a dynamic 8-aligned offset
    inside the block — cutting MXU+VPU work by R/W at near-zero extra
    padding.  On low-degree destinations (items<-users: 1.4 edges/row) the
    window constraint forces chunk splits whose padding costs more gather
    traffic than the FLOPs saved, so planning auto-rejects the window when
    its padded edge count exceeds the plain plan's (the kernel is
    gather-traffic bound, not MXU bound).
  * **Padded chain** (:func:`apply_pallas_padded`): the kernel's natural
    output is the (num_blocks*R, D) block space.  K-layer propagation can
    stay in that padded space end to end — gathers index the padded table
    directly (source ids are unchanged; padding lives at the tail) — and
    truncate ONCE at the end instead of paying a slice copy per layer.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_BLOCK_ROWS = 512     # R: destination rows per output block (v5e sweep)
DEFAULT_CHUNK_EDGES = 256    # T: edges per grid step (v5e sweep: T=256/R=512 best at reference scale)


@dataclass(frozen=True)
class PallasSegmentPlan:
    """Device-resident plan for one sparse operator direction."""
    src_padded: jax.Array      # (E_pad,) int32 source ids (pad -> 0)
    w_padded: jax.Array        # (1, E_pad) float32 weights (pad -> 0)
    local_ids: jax.Array       # (1, E_pad) int32 row id within block/window
    block_id: jax.Array        # (G,) int32 output block per chunk
    first_chunk: jax.Array     # (G,) int32 1 if first chunk of its block
    win_start: Optional[jax.Array]  # (G,) int32 8-aligned window offset, or None
    num_dst: int
    num_src: int
    num_blocks: int
    block_rows: int
    chunk_edges: int
    window: int                # 0 = full-block kernel; else W (window rows)
    interpret: bool
    msg_dtype: str = "float32"


jax.tree_util.register_dataclass(
    PallasSegmentPlan,
    data_fields=["src_padded", "w_padded", "local_ids", "block_id",
                 "first_chunk", "win_start"],
    meta_fields=["num_dst", "num_src", "num_blocks", "block_rows",
                 "chunk_edges", "window", "interpret", "msg_dtype"])


def _empty_plan(num_dst, num_src, R, T, interpret, msg_dtype):
    """Degenerate zero-edge plan: every block still gets its zeroing chunk."""
    num_blocks = max(-(-num_dst // R), 1)
    G0 = num_blocks
    return PallasSegmentPlan(
        src_padded=jnp.zeros((G0 * T,), jnp.int32),
        w_padded=jnp.zeros((1, G0 * T), jnp.float32),
        local_ids=jnp.full((1, G0 * T), R, jnp.int32),
        block_id=jnp.arange(G0, dtype=jnp.int32),
        first_chunk=jnp.ones((G0,), jnp.int32),
        win_start=None,
        num_dst=num_dst, num_src=num_src, num_blocks=num_blocks,
        block_rows=R, chunk_edges=T, window=0, interpret=interpret,
        msg_dtype=msg_dtype)


def _build_plain(src, dst, w, num_dst, num_blocks, R, T):
    """Vectorized plain plan: per-block edge runs padded to multiples of T."""
    E = src.shape[0]
    blk_of_edge = dst // R
    edges_per_block = np.bincount(blk_of_edge, minlength=num_blocks)
    chunks_per_block = np.maximum(-(-edges_per_block // T), 1)
    padded_per_block = chunks_per_block * T

    pad_start = np.zeros(num_blocks + 1, np.int64)
    np.cumsum(padded_per_block, out=pad_start[1:])
    edge_start = np.zeros(num_blocks + 1, np.int64)
    np.cumsum(edges_per_block, out=edge_start[1:])

    E_pad = int(pad_start[-1])
    G = E_pad // T

    pos = pad_start[blk_of_edge] + (np.arange(E) - edge_start[blk_of_edge])

    src_padded = np.zeros(E_pad, np.int32)
    w_padded = np.zeros(E_pad, np.float32)
    lid_flat = np.full(E_pad, R, np.int32)
    src_padded[pos] = src
    w_padded[pos] = w
    lid_flat[pos] = (dst - blk_of_edge * R).astype(np.int32)

    block_id = np.repeat(np.arange(num_blocks, dtype=np.int32),
                         chunks_per_block)
    first_chunk = np.zeros(G, np.int32)
    chunk_start = np.zeros(num_blocks, np.int64)
    np.cumsum(chunks_per_block[:-1], out=chunk_start[1:])
    first_chunk[chunk_start] = 1
    return src_padded, w_padded, lid_flat, block_id, first_chunk, None


def _build_window(src, dst, w, num_dst, num_blocks, R, T, W):
    """Greedy window chunking: each chunk holds <=T edges whose local row
    ids fit an 8-aligned W-row window (window start clamped to R-W).

    Vectorized greedy: the chunk boundaries of EVERY still-open block are
    computed together, one round per chunk depth (rounds = max chunks per
    block, ~tens even on power-law hubs), instead of a Python loop over
    blocks — the loop form cost ~18 s per 7.5M-edge operator direction at
    the 10M north star, dominating operator construction.  Bit-identical
    to the sequential greedy (tested against a loop oracle)."""
    blk_of_edge = dst // R
    lid_all = (dst - blk_of_edge * R).astype(np.int64)
    counts = np.bincount(blk_of_edge, minlength=num_blocks)
    edge_start = np.zeros(num_blocks + 1, np.int64)
    np.cumsum(counts, out=edge_start[1:])
    # globally nondecreasing key: searchsorted respects block boundaries
    # because ws + W <= R keeps each probe inside its own block's span
    key_all = blk_of_edge.astype(np.int64) * R + lid_all

    cb, ci, cj, cws, crd = [], [], [], [], []
    b_ids = np.arange(num_blocks, dtype=np.int64)
    i_cur = edge_start[:-1].copy()
    end = edge_start[1:]
    open_m = i_cur < end
    rnd = 0
    while open_m.any():
        bo = b_ids[open_m]
        io = i_cur[open_m]
        ws = np.minimum((lid_all[io] // 8) * 8, R - W)
        j = np.searchsorted(key_all, bo * R + ws + W, side="left")
        j = np.minimum(np.minimum(j, io + T), end[open_m])
        cb.append(bo)
        ci.append(io)
        cj.append(j)
        cws.append(ws)
        crd.append(np.full(bo.shape[0], rnd, np.int64))
        i_cur[open_m] = j
        open_m = i_cur < end
        rnd += 1
    empty = b_ids[counts == 0]
    if empty.size:  # empty blocks still get their zeroing chunk
        z = edge_start[empty]
        cb.append(empty)
        ci.append(z)
        cj.append(z)
        cws.append(np.zeros(empty.size, np.int64))
        crd.append(np.zeros(empty.size, np.int64))
    cb = np.concatenate(cb)
    ci = np.concatenate(ci)
    cj = np.concatenate(cj)
    cws = np.concatenate(cws)
    crd = np.concatenate(crd)
    order = np.lexsort((crd, cb))  # block-major; chunk order within block
    cb, ci, cj, cws = cb[order], ci[order], cj[order], cws[order]

    G = cb.shape[0]
    E_pad = G * T
    n = cj - ci
    src_p = np.zeros(E_pad, np.int32)
    w_p = np.zeros(E_pad, np.float32)
    lid_p = np.full(E_pad, W, np.int32)
    # scatter every chunk's edge run at once: edge r of chunk g lands at
    # g*T + r and reads global edge ci[g] + r
    run_start = np.zeros(G, np.int64)
    np.cumsum(n[:-1], out=run_start[1:])
    off = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(run_start, n)
    eidx = np.repeat(ci, n) + off
    pos = np.repeat(np.arange(G, dtype=np.int64) * T, n) + off
    src_p[pos] = src[eidx]
    w_p[pos] = w[eidx]
    lid_p[pos] = lid_all[eidx] - np.repeat(cws, n)

    first = np.zeros(G, np.int32)
    first[0] = 1
    first[1:][cb[1:] != cb[:-1]] = 1
    return (src_p, w_p, lid_p, cb.astype(np.int32), first,
            cws.astype(np.int32))


def _plain_padded_edges(dst, num_blocks, R, T) -> int:
    """Padded edge count of the plain plan — O(E) bincount, no assembly."""
    epb = np.bincount(dst // R, minlength=num_blocks)
    return int(np.maximum(-(-epb // T), 1).sum()) * T


def _window_chunk_count(dst, num_blocks, R, T, W) -> int:
    """Chunk count of the greedy window plan (same rounds as
    :func:`_build_window`, counting only — no array assembly)."""
    blk_of_edge = dst // R
    lid_all = (dst - blk_of_edge * R).astype(np.int64)
    counts = np.bincount(blk_of_edge, minlength=num_blocks)
    edge_start = np.zeros(num_blocks + 1, np.int64)
    np.cumsum(counts, out=edge_start[1:])
    key_all = blk_of_edge.astype(np.int64) * R + lid_all

    G = int((counts == 0).sum())        # zeroing chunks of empty blocks
    i_cur = edge_start[:-1].copy()
    end = edge_start[1:]
    b_ids = np.arange(num_blocks, dtype=np.int64)
    open_m = i_cur < end
    while open_m.any():
        io = i_cur[open_m]
        ws = np.minimum((lid_all[io] // 8) * 8, R - W)
        j = np.searchsorted(key_all, b_ids[open_m] * R + ws + W, side="left")
        j = np.minimum(np.minimum(j, io + T), end[open_m])
        G += int(open_m.sum())
        i_cur[open_m] = j
        open_m = i_cur < end
    return G


def auto_window(dst: np.ndarray, num_dst: int, E: int,
                block_rows: int = DEFAULT_BLOCK_ROWS,
                chunk_edges: int = DEFAULT_CHUNK_EDGES) -> int:
    """The "auto" window decision from padded-edge COUNTS only (no plan
    assembly — at the 10M north star assembling a rejected candidate cost
    more than every accepted plan combined).  ``dst`` must be sorted.

    W must cover a chunk's typical row span (T / mean dst degree) plus
    alignment slack, and is kept only while its padded edge count stays
    within 2% of the plain plan's (per-chunk fixed costs dominate — the
    forced-window probe measured 1.06-1.24x slowdowns past that slack,
    docs/KERNEL.md round 3b)."""
    R, T = int(block_rows), int(chunk_edges)
    if E == 0:
        return 0
    num_blocks = max(-(-num_dst // R), 1)
    mean_deg = E / max(num_dst, 1)
    need = T / max(mean_deg, 1e-9) + 16
    W = next((c for c in (64, 128, 256) if c >= need and c < R), 0)
    if not W:
        return 0
    dst = np.asarray(dst, np.int64)
    win_padded = _window_chunk_count(dst, num_blocks, R, T, W) * T
    if win_padded <= 1.02 * _plain_padded_edges(dst, num_blocks, R, T):
        return W
    return 0


def build_pallas_segment_plan(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                              num_dst: int, block_rows: int = DEFAULT_BLOCK_ROWS,
                              chunk_edges: int = DEFAULT_CHUNK_EDGES,
                              num_src: int | None = None,
                              interpret: bool = False,
                              msg_dtype: str = "float32",
                              window: int | str = "auto") -> PallasSegmentPlan:
    """Host-side planning. ``src``/``dst``/``w`` must already be dst-sorted.

    ``window``: 0 disables the window kernel; an int W forces it (must be
    0 < W < block_rows, both divisible by 8); "auto" decides via
    :func:`auto_window` (count-based — only the chosen variant is ever
    assembled)."""
    R, T = int(block_rows), int(chunk_edges)
    E = int(src.shape[0])
    num_src = int(num_src if num_src is not None else (src.max() + 1 if E else 1))
    num_blocks = max(-(-num_dst // R), 1)
    if E == 0:
        return _empty_plan(num_dst, num_src, R, T, interpret, msg_dtype)

    src = np.asarray(src, np.int32)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(w, np.float32)
    assert np.all(np.diff(dst) >= 0), "edges must be sorted by dst"

    if window == "auto":
        win = auto_window(dst, num_dst, E, R, T)
    elif window:
        win = int(window)
        # a forced window must satisfy the kernel's alignment contract
        # up-front: win_start is promised multiple-of-8 (pl.multiple_of
        # below) and clamped to R - W, so W >= R or misaligned W/R would
        # miscompile to wrong results on TPU rather than raise.
        if not (0 < win < R and win % 8 == 0 and R % 8 == 0):
            raise ValueError(
                f"window={win} invalid: need 0 < W < block_rows={R} and "
                f"both divisible by 8 (win_start alignment promise)")
    else:
        win = 0

    if win:
        chosen = _build_window(src, dst, w, num_dst, num_blocks, R, T, win)
    else:
        chosen = _build_plain(src, dst, w, num_dst, num_blocks, R, T)

    src_p, w_p, lid_p, block_id, first, wstart = chosen
    E_pad = src_p.shape[0]
    return PallasSegmentPlan(
        src_padded=jnp.asarray(src_p),
        w_padded=jnp.asarray(w_p.reshape(1, E_pad)),
        local_ids=jnp.asarray(lid_p.reshape(1, E_pad)),
        block_id=jnp.asarray(block_id),
        first_chunk=jnp.asarray(first),
        win_start=None if wstart is None else jnp.asarray(wstart),
        num_dst=num_dst, num_src=num_src, num_blocks=int(num_blocks),
        block_rows=R, chunk_edges=T, window=win, interpret=interpret,
        msg_dtype=msg_dtype)


def build_sliced_segment_plans(src: np.ndarray, dst: np.ndarray,
                               w: np.ndarray, num_dst: int,
                               block_rows: int = DEFAULT_BLOCK_ROWS,
                               chunk_edges: int = DEFAULT_CHUNK_EDGES,
                               num_src: int | None = None,
                               interpret: bool = False,
                               msg_dtype: str = "float32",
                               window: int | str = "auto",
                               slices: int | str = "auto"):
    """Split one operator into S destination slices on BLOCK-ALIGNED dst
    cuts and plan each independently.

    Each slice is its own (XLA row gather -> pallas kernel) pair, so the
    compiler overlaps slice s+1's HBM gather with slice s's MXU kernel —
    measured 2.2x on the 262K-dst direction at reference scale (the
    unsliced op is a serial gather(1.3ms) -> kernel chain;
    scripts/probe_spmm_slices.py).  Because cuts are block-aligned, the
    concatenation of the slices' block spaces IS the unsliced plan's block
    space: layouts, padded-chain protocol, and per-row fp32 accumulation
    order are all bit-identical.

    Returns a tuple of PallasSegmentPlan (length 1 when slicing is moot).
    """
    R = int(block_rows)
    E = int(src.shape[0])
    blocks = max(-(-num_dst // R), 1)
    S = min(4, blocks) if slices == "auto" else int(slices)
    S = max(min(S, blocks), 1)
    if S == 1 or E == 0:
        return (build_pallas_segment_plan(
            src, dst, w, num_dst, block_rows=R, chunk_edges=chunk_edges,
            num_src=num_src, interpret=interpret, msg_dtype=msg_dtype,
            window=window),)

    order_ok = np.all(np.diff(dst) >= 0)
    assert order_ok, "edges must be sorted by dst"
    dst = np.asarray(dst, np.int64)
    # The window decision is made ONCE on the full operator and FORCED on
    # every slice: per-block chunk cuts depend only on that block's edges
    # and the (R, T, W) parameters, so same-window slices reproduce the
    # unsliced plan's cuts — and therefore its per-row fp32 accumulation
    # order — exactly.  (Per-slice "auto" could pick divergent windows on
    # slices whose local mean degree crosses a threshold.)  The decision
    # is count-based (auto_window) — no full-operator plan is assembled.
    if window == "auto":
        forced_window = auto_window(dst, num_dst, E, R, chunk_edges)
    else:
        forced_window = int(window)             # 0 = plain kernel
    plans = []
    for s in range(S):
        lo = (blocks * s // S) * R
        hi = min((blocks * (s + 1) // S) * R, num_dst)
        if s == S - 1:
            hi = num_dst
        e_lo = np.searchsorted(dst, lo, side="left")
        e_hi = np.searchsorted(dst, hi, side="left")
        plans.append(build_pallas_segment_plan(
            src[e_lo:e_hi], dst[e_lo:e_hi] - lo, w[e_lo:e_hi], hi - lo,
            block_rows=R, chunk_edges=chunk_edges, num_src=num_src,
            interpret=interpret, msg_dtype=msg_dtype,
            window=forced_window))
    return tuple(plans)


def _segment_kernel(block_ref, first_ref, lid_ref, w_ref, msg_ref, out_ref, *,
                    R: int, T: int):
    from jax.experimental import pallas as pl

    step = pl.program_id(0)

    @pl.when(first_ref[step] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    lid = lid_ref[:]                                           # (1, T)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, T), 0)
    # Weighted one-hot: folding w into the scatter matrix applies the
    # per-edge weight inside the MXU pass.  Doing `w * msg` outside the
    # kernel cost two extra full HBM passes over the E_pad x D message
    # array (profiled at ~7.6 ms/step at reference scale).
    onehot = jnp.where(rows == lid, w_ref[:], 0.0)             # (R, T)
    out_ref[:] += jnp.dot(onehot.astype(msg_ref.dtype), msg_ref[:],
                          preferred_element_type=jnp.float32)


def _window_kernel(block_ref, first_ref, wstart_ref, lid_ref, w_ref, msg_ref,
                   out_ref, *, R: int, T: int, W: int):
    from jax.experimental import pallas as pl

    step = pl.program_id(0)

    @pl.when(first_ref[step] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    lid = lid_ref[:]                                           # (1, T)
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)
    onehot = jnp.where(rows == lid, w_ref[:], 0.0)             # (W, T)
    upd = jnp.dot(onehot.astype(msg_ref.dtype), msg_ref[:],
                  preferred_element_type=jnp.float32)
    ws = pl.multiple_of(wstart_ref[step], 8)
    out_ref[pl.ds(ws, W), :] = out_ref[pl.ds(ws, W), :] + upd


def _apply_padded_blocks(plan: PallasSegmentPlan, x: jax.Array) -> jax.Array:
    """Run the kernel; returns the raw (num_blocks*R, D) fp32 block space."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, T, W = plan.block_rows, plan.chunk_edges, plan.window
    D = x.shape[-1]
    G = plan.local_ids.shape[1] // T

    # Raw gather only — the per-edge weight is applied inside the kernel
    # (folded into the one-hot matrix), saving two HBM passes over msg.
    # bf16 mode casts the TABLE first so the gather itself moves half the
    # bytes (gather time scales with bytes on v5e, measured 2.6x).
    msg_dtype = jnp.dtype(plan.msg_dtype)
    msg = x.astype(msg_dtype)[plan.src_padded]

    if W:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, T), lambda g, blk, first, ws: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T), lambda g, blk, first, ws: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, D), lambda g, blk, first, ws: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, D),
                                   lambda g, blk, first, ws: (blk[g], 0),
                                   memory_space=pltpu.VMEM),
        )
        kernel = functools.partial(_window_kernel, R=R, T=T, W=W)
        scalars = (plan.block_id, plan.first_chunk, plan.win_start)
        flops = 2 * G * W * T * D
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, T), lambda g, blk, first: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T), lambda g, blk, first: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, D), lambda g, blk, first: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, D), lambda g, blk, first: (blk[g], 0),
                                   memory_space=pltpu.VMEM),
        )
        kernel = functools.partial(_segment_kernel, R=R, T=T)
        scalars = (plan.block_id, plan.first_chunk)
        flops = 2 * G * R * T * D

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_blocks * R, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=msg.size * msg_dtype.itemsize
            + plan.num_blocks * R * D * 4,
            transcendentals=0),
        interpret=plan.interpret,
    )(*scalars, plan.local_ids, plan.w_padded, msg)


def apply_pallas(plan, x: jax.Array) -> jax.Array:
    """y[d] = sum_{e: dst[e]=d} w[e] * x[src[e]] via the chunked kernel.

    ``plan`` is a PallasSegmentPlan or a tuple of them (dst-sliced pipeline
    form, :func:`build_sliced_segment_plans`); slice results concatenate to
    the bit-identical unsliced rows (block-aligned cuts)."""
    if isinstance(plan, tuple):
        if len(plan) == 1:
            plan = plan[0]
        else:
            parts = [_apply_padded_blocks(p, x)[:p.num_dst] for p in plan]
            return jnp.concatenate(parts, axis=0).astype(x.dtype)
    y_comp = _apply_padded_blocks(plan, x)
    return y_comp[:plan.num_dst].astype(x.dtype)


def apply_pallas_padded(plan, x_pad: jax.Array) -> jax.Array:
    """Padded-chain form: ``x_pad`` is a source table padded to the block
    grid (rows >= num_src; source ids are unchanged because padding lives at
    the tail); the result stays in the (num_blocks*R, D) block space with
    zero pad rows, cast back to ``x_pad.dtype``.  Skips the per-apply
    truncation copy of :func:`apply_pallas` — truncate once per chain with
    ``y[:num_dst]``.  For a sliced plan tuple the concatenated slice block
    spaces ARE the unsliced block space (cuts are block-aligned; interior
    slices carry no padding, the global tail pad stays at the tail)."""
    if isinstance(plan, tuple):
        if len(plan) == 1:
            plan = plan[0]
        else:
            parts = [_apply_padded_blocks(p, x_pad) for p in plan]
            return jnp.concatenate(parts, axis=0).astype(x_pad.dtype)
    return _apply_padded_blocks(plan, x_pad).astype(x_pad.dtype)
