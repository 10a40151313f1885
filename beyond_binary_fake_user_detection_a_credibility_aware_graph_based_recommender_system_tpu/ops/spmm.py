"""Weighted sparse matrix–dense matrix products (the propagation kernel).

This replaces every ``torch.sparse.mm`` call in the reference
(/root/reference/lightgcn.py:323, lightgcn_cu.py:431,434,
version_1/lightgcn_cu_message.py:421,423) — the dominant FLOP cost of
Stage-B training, re-run for every batch (SURVEY.md §3.5 hot loop #1).

Design (TPU-first):

  * Edges are pre-sorted by destination on the host, once per graph.  The
    per-edge weight vector (credibility, symmetric norm, degree damping —
    SURVEY.md C16–C19) is fused into the product, so every propagation
    variant is "the same kernel, different weights".
  * Forward: ``y[d] = sum_{e: dst[e]=d} w[e] * x[src[e]]``.
  * Two backends:
      - "xla":    gather + ``jax.ops.segment_sum`` (sorted-indices hint).
                  Portable; the CPU-test and correctness oracle path.
      - "pallas": destination-blocked scatter-as-matmul segment-sum kernel
                  (ops/spmm_pallas.py) that turns the irregular reduction
                  into dense (rows × edges) one-hot matmuls on the MXU.
  * The backward pass never relies on XLA's gather-VJP (which would emit a
    scatter): each operator carries its transpose plan and a custom VJP
    routes ``dx = A^T @ g`` through the same kernel.

Weights are constants of the operator (none of the reference models
differentiate through edge weights), which keeps the VJP a single clean
transpose product.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.operators import EdgeMap


@dataclass(frozen=True)
class _SortedEdges:
    """Device-resident dst-sorted edge arrays for one direction."""
    src: jax.Array            # (E,) int32, in dst-sorted order
    dst: jax.Array            # (E,) int32, nondecreasing
    w: jax.Array              # (E,) float32, in dst-sorted order
    num_src: int
    num_dst: int


jax.tree_util.register_dataclass(
    _SortedEdges, data_fields=["src", "dst", "w"],
    meta_fields=["num_src", "num_dst"])


@dataclass(frozen=True)
class SpmmState:
    """One direction of a sparse operator as a PYTREE.

    Operator data must flow through ``jit`` as an *argument*, not a Python
    closure: closure-captured arrays serialize into the compiled program as
    literal constants, which bloats the HLO unboundedly with graph size
    (a 10M-edge plan overflowed the remote-compile transport).
    """
    backend: str                       # meta: "xla" | "pallas"
    edges: Optional[_SortedEdges]      # xla backend
    plan: Optional[object]             # pallas backend (PallasSegmentPlan)


jax.tree_util.register_dataclass(
    SpmmState, data_fields=["edges", "plan"], meta_fields=["backend"])


def _dispatch(state: SpmmState, x: jax.Array) -> jax.Array:
    if state.backend == "pallas":
        from .spmm_pallas import apply_pallas
        return apply_pallas(state.plan, x)
    return _apply_xla(state.edges, x)


def _zeros_ct(tree):
    """Cotangent of an operator-state pytree: symbolic float0 for integer
    leaves, broadcast zeros (free under XLA) for float leaves."""
    def z(v):
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating):
            return jnp.zeros_like(v)
        return np.zeros(np.shape(v), jax.dtypes.float0)
    return jax.tree.map(z, tree)


@jax.custom_vjp
def spmm_apply(fwd_state: SpmmState, bwd_state: SpmmState,
               x: jax.Array) -> jax.Array:
    """y = A @ x; differentiable in x with dx = A^T @ g via the pre-planned
    transpose direction (never XLA's gather-VJP scatter)."""
    return _dispatch(fwd_state, x)


def _spmm_fwd(fwd_state, bwd_state, x):
    return _dispatch(fwd_state, x), (fwd_state, bwd_state)


def _spmm_bwd(res, g):
    fwd_state, bwd_state = res
    dx = _dispatch(bwd_state, g)
    return (_zeros_ct(fwd_state), _zeros_ct(bwd_state), dx)


spmm_apply.defvjp(_spmm_fwd, _spmm_bwd)


@jax.custom_vjp
def spmm_apply_padded(fwd_state: SpmmState, bwd_state: SpmmState,
                      x_pad: jax.Array) -> jax.Array:
    """Padded-chain form (pallas backend): ``x_pad`` lives in the source
    side's block-padded space and the result in the destination side's —
    no per-apply truncation copy.  The VJP applies the transpose plan in
    padded space (pad-row cotangents are never sourced: the bwd plan's ids
    are < num_dst, and pad rows of the fwd output are identically zero)."""
    from .spmm_pallas import apply_pallas_padded
    return apply_pallas_padded(fwd_state.plan, x_pad)


def _spmm_padded_fwd(fwd_state, bwd_state, x_pad):
    return spmm_apply_padded(fwd_state, bwd_state, x_pad), (fwd_state,
                                                            bwd_state)


def _spmm_padded_bwd(res, g):
    from .spmm_pallas import apply_pallas_padded
    fwd_state, bwd_state = res
    dx = apply_pallas_padded(bwd_state.plan, g)
    return (_zeros_ct(fwd_state), _zeros_ct(bwd_state), dx)


spmm_apply_padded.defvjp(_spmm_padded_fwd, _spmm_padded_bwd)


@dataclass(frozen=True)
class PadLayout:
    """Tail-padding layout of one node space to the kernel's block grid.

    The single-chip analogue of parallel/sharded_spmm.SpanLayout — models
    key on ``equals``/``to_padded``/``from_padded`` to keep a whole K-layer
    chain in padded space (models/lightgcn.py:_padded_chain)."""
    rows: int
    padded_rows: int

    def equals(self, other) -> bool:
        return (isinstance(other, PadLayout) and self.rows == other.rows
                and self.padded_rows == other.padded_rows)

    def to_padded(self, x: jax.Array) -> jax.Array:
        return jnp.pad(x, ((0, self.padded_rows - self.rows), (0, 0)))

    def from_padded(self, p: jax.Array) -> jax.Array:
        return p[:self.rows]


def _sort_edges(edge_map: EdgeMap) -> _SortedEdges:
    order = np.argsort(edge_map.dst, kind="stable")
    return _SortedEdges(
        src=jnp.asarray(edge_map.src[order], dtype=jnp.int32),
        dst=jnp.asarray(edge_map.dst[order], dtype=jnp.int32),
        w=jnp.asarray(edge_map.w[order], dtype=jnp.float32),
        num_src=edge_map.num_src,
        num_dst=edge_map.num_dst,
    )


def _apply_xla(edges: _SortedEdges, x: jax.Array) -> jax.Array:
    msg = x[edges.src] * edges.w[:, None].astype(x.dtype)
    return jax.ops.segment_sum(
        msg, edges.dst, num_segments=edges.num_dst, indices_are_sorted=True)


def resolve_backend(backend: str) -> str:
    """"auto" -> pallas on TPU, xla elsewhere."""
    if backend != "auto":
        return backend
    try:
        return "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    except Exception:
        return "xla"


class SpmmOperator:
    """A fixed sparse operator ``y = A @ x`` with a fused per-edge weight.

    ``apply`` is differentiable in ``x``; its VJP is the transpose operator
    applied to the cotangent (both directions pre-planned on the host).
    """

    def __init__(self, edge_map: EdgeMap, backend: str = "xla",
                 block_rows: int = 512, chunk_edges: int = 256,
                 precision: str = "fp32", slices: int | str = "auto"):
        # precision: "fp32" (parity default) or "bf16" — bf16 messages halve
        # gather/message HBM bytes and run the MXU pass at bf16 rate with
        # fp32 accumulation (pallas backend only; xla ignores it).
        # slices: dst-slice pipelining degree ("auto" = 4): independent
        # gather->kernel pairs the compiler overlaps (2.2x measured on the
        # 262K-dst direction; scripts/probe_spmm_slices.py).
        self.backend = resolve_backend(backend)
        self.precision = precision
        self.num_src = edge_map.num_src
        self.num_dst = edge_map.num_dst
        self.num_edges = edge_map.num_edges
        self._fwd = _sort_edges(edge_map)
        self._bwd = _sort_edges(
            EdgeMap(src=edge_map.dst, dst=edge_map.src, w=edge_map.w,
                    num_src=edge_map.num_dst, num_dst=edge_map.num_src))

        if self.backend == "pallas":
            from .spmm_pallas import build_sliced_segment_plans
            interpret = jax.devices()[0].platform != "tpu"
            msg_dtype = {"fp32": "float32", "bf16": "bfloat16"}[precision]
            fwd_plan = build_sliced_segment_plans(
                np.asarray(self._fwd.src), np.asarray(self._fwd.dst),
                np.asarray(self._fwd.w), self.num_dst, num_src=self.num_src,
                block_rows=block_rows, chunk_edges=chunk_edges,
                interpret=interpret, msg_dtype=msg_dtype, window="auto",
                slices=slices)
            bwd_plan = build_sliced_segment_plans(
                np.asarray(self._bwd.src), np.asarray(self._bwd.dst),
                np.asarray(self._bwd.w), self.num_src, num_src=self.num_dst,
                block_rows=block_rows, chunk_edges=chunk_edges,
                interpret=interpret, msg_dtype=msg_dtype, window="auto",
                slices=slices)
            self.fwd_state = SpmmState("pallas", None, fwd_plan)
            self.bwd_state = SpmmState("pallas", None, bwd_plan)
            # padded-chain layouts (tail padding to the block grid); the
            # model keeps a whole K-layer chain in this space when the
            # operators' layouts line up (models/lightgcn.py:_padded_chain)
            self.src_layout = PadLayout(
                self.num_src,
                sum(p.num_blocks for p in bwd_plan) * block_rows)
            self.dst_layout = PadLayout(
                self.num_dst,
                sum(p.num_blocks for p in fwd_plan) * block_rows)
        else:
            self.fwd_state = SpmmState("xla", self._fwd, None)
            self.bwd_state = SpmmState("xla", self._bwd, None)
            self.src_layout = self.dst_layout = None

    @property
    def padded_chain(self) -> bool:
        """True when this operator supports the padded-chain protocol
        (state-threaded: call :func:`spmm_apply_padded` on ``state``)."""
        return self.backend == "pallas"

    @property
    def state(self):
        """(fwd, bwd) state pair — pass through jit as an argument and call
        :func:`spmm_apply` on it (closure capture bloats the HLO)."""
        return (self.fwd_state, self.bwd_state)

    def apply_padded(self, x_pad: jax.Array) -> jax.Array:
        return spmm_apply_padded(self.fwd_state, self.bwd_state, x_pad)

    def apply(self, x: jax.Array) -> jax.Array:
        return spmm_apply(self.fwd_state, self.bwd_state, x)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.apply(x)

    def transpose_apply(self, y: jax.Array) -> jax.Array:
        """y -> A^T @ y (the pre-planned backward direction)."""
        return spmm_apply(self.bwd_state, self.fwd_state, y)
