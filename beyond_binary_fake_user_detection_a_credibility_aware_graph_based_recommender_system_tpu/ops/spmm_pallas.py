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
     row-copy loop runs at ~184 ns/row vs XLA's ~4-7 ns/row).  The kernel
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

Cost per edge is R*D*2 one-hot MACs — at R=256, D<=128 this is far below
the MXU roofline, leaving the kernel HBM-bandwidth-bound as SpMM should be.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

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
    local_ids: jax.Array       # (1, E_pad) int32 row id within block (pad -> R)
    block_id: jax.Array        # (G,) int32 output block per chunk
    first_chunk: jax.Array     # (G,) int32 1 if first chunk of its block
    num_dst: int
    num_src: int
    num_blocks: int
    block_rows: int
    chunk_edges: int
    interpret: bool
    msg_dtype: str = "float32"


jax.tree_util.register_dataclass(
    PallasSegmentPlan,
    data_fields=["src_padded", "w_padded", "local_ids", "block_id",
                 "first_chunk"],
    meta_fields=["num_dst", "num_src", "num_blocks", "block_rows",
                 "chunk_edges", "interpret", "msg_dtype"])


def build_pallas_segment_plan(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                              num_dst: int, block_rows: int = DEFAULT_BLOCK_ROWS,
                              chunk_edges: int = DEFAULT_CHUNK_EDGES,
                              num_src: int | None = None,
                              interpret: bool = False,
                              msg_dtype: str = "float32") -> PallasSegmentPlan:
    """Host-side planning. ``src``/``dst``/``w`` must already be dst-sorted."""
    R, T = int(block_rows), int(chunk_edges)
    E = int(src.shape[0])
    num_src = int(num_src if num_src is not None else (src.max() + 1 if E else 1))

    num_blocks = max(-(-num_dst // R), 1)
    if E == 0:
        # degenerate: every block still needs its zeroing chunk
        G0 = num_blocks
        return PallasSegmentPlan(
            src_padded=jnp.zeros((G0 * T,), jnp.int32),
            w_padded=jnp.zeros((1, G0 * T), jnp.float32),
            local_ids=jnp.full((1, G0 * T), R, jnp.int32),
            block_id=jnp.arange(G0, dtype=jnp.int32),
            first_chunk=jnp.ones((G0,), jnp.int32),
            num_dst=num_dst, num_src=num_src, num_blocks=num_blocks,
            block_rows=R, chunk_edges=T, interpret=interpret,
            msg_dtype=msg_dtype)

    dst = np.asarray(dst, np.int64)
    assert np.all(np.diff(dst) >= 0), "edges must be sorted by dst"

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

    return PallasSegmentPlan(
        src_padded=jnp.asarray(src_padded),
        w_padded=jnp.asarray(w_padded.reshape(1, E_pad)),
        local_ids=jnp.asarray(lid_flat.reshape(1, G * T)),
        block_id=jnp.asarray(block_id),
        first_chunk=jnp.asarray(first_chunk),
        num_dst=num_dst, num_src=num_src, num_blocks=int(num_blocks),
        block_rows=R, chunk_edges=T, interpret=interpret,
        msg_dtype=msg_dtype)


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


def apply_pallas(plan: PallasSegmentPlan, x: jax.Array) -> jax.Array:
    """y[d] = sum_{e: dst[e]=d} w[e] * x[src[e]] via the chunked kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, T = plan.block_rows, plan.chunk_edges
    D = x.shape[-1]
    G = plan.local_ids.shape[1] // T

    # Raw gather only — the per-edge weight is applied inside the kernel
    # (folded into the one-hot matrix), saving two HBM passes over msg.
    # bf16 mode casts the TABLE first so the gather itself moves half the
    # bytes (gather time scales with bytes on v5e, measured 2.6x).
    msg_dtype = jnp.dtype(plan.msg_dtype)
    msg = x.astype(msg_dtype)[plan.src_padded]

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
    flops = 2 * G * R * T * D
    y_comp = pl.pallas_call(
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
    )(plan.block_id, plan.first_chunk, plan.local_ids, plan.w_padded, msg)

    return y_comp[:plan.num_dst].astype(x.dtype)
