"""Loss functions for both stages.

Stage B (SURVEY.md C20/C26):
  * BPR        -log(sigmoid(pos - neg) + 1e-12), mean       lightgcn.py:333-340
  * ego L2     mean over batch of ||e^0_u||^2+||e^0_p||^2+||e^0_n||^2
                                                            lightgcn.py:341-348
  * fairness   Eq 3.27 minibatch form: mean(pop_norm[pos] * y_hat_pos)
                                                            lightgcn_cu.py:639-641

Stage A (SURVEY.md C13):
  * masked BCE on labeled users                             main.py:945-951
  * smoothness sum_e w_e ||h_u - h_i||^2 (mean over edges)  main.py:894-907
  * temporal-contrastive InfoNCE, tau=0.2                   main.py:653-658

All losses support a validity mask so fixed-shape padded batches reproduce
the reference's variable-length final batch exactly (masked mean).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def bpr_loss(pos_scores: jax.Array, neg_scores: jax.Array,
             mask: Optional[jax.Array] = None) -> jax.Array:
    return _masked_mean(
        -jnp.log(jax.nn.sigmoid(pos_scores - neg_scores) + 1e-12), mask)


def ego_l2(ego_u: jax.Array, ego_p: jax.Array, ego_n: jax.Array,
           mask: Optional[jax.Array] = None) -> jax.Array:
    """Mean over batch of summed squared ego-embedding norms
    (lightgcn.py:341-348 — layer-0 embeddings only, NOT propagated ones)."""
    reg = (jnp.sum(ego_u ** 2, -1) + jnp.sum(ego_p ** 2, -1)
           + jnp.sum(ego_n ** 2, -1))
    return _masked_mean(reg, mask)


def fairness_loss(pop_norm_pos: jax.Array, pos_scores: jax.Array,
                  mask: Optional[jax.Array] = None) -> jax.Array:
    """Eq 3.27 over observed positives (lightgcn_cu.py:639-641);
    pop_norm = deg_i / max(deg) (lightgcn_cu.py:583-584)."""
    return _masked_mean(pop_norm_pos * pos_scores, mask)


# ---------------------------------------------------------------------------
# Stage A
# ---------------------------------------------------------------------------

def masked_bce(pred: jax.Array, labels: jax.Array,
               label_mask: jax.Array) -> jax.Array:
    """BCE over labeled users only; 0 if none labeled (main.py:945-951).
    ``pred`` are probabilities in (0,1) (post-sigmoid, as in the reference)."""
    p = jnp.clip(pred, 1e-7, 1.0 - 1e-7)
    per = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    m = label_mask.astype(pred.dtype)
    denom = jnp.sum(m)
    return jnp.where(denom > 0, jnp.sum(per * m) / jnp.maximum(denom, 1.0), 0.0)


def smoothness_loss(h_src: jax.Array, h_dst: jax.Array, src: jax.Array,
                    dst: jax.Array, w: jax.Array,
                    min_w: float = 0.0) -> jax.Array:
    """mean_e w_e ||h_src[src_e] - h_dst[dst_e]||^2 over edges with w>min_w
    (main.py:894-907)."""
    diff = h_src[src] - h_dst[dst]
    sq = jnp.sum(diff * diff, axis=-1)
    keep = (w > min_w).astype(sq.dtype)
    denom = jnp.sum(keep)
    return jnp.where(denom > 0,
                     jnp.sum(w * sq * keep) / jnp.maximum(denom, 1.0), 0.0)


def _l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def info_nce(z1: jax.Array, z2: jax.Array, tau: float = 0.2,
             mask: Optional[jax.Array] = None) -> jax.Array:
    """Temporal-contrastive InfoNCE between two views (main.py:653-658):
    cross-entropy of the cosine-similarity logits against the diagonal.

    ``mask`` marks valid rows of a fixed-shape padded batch: masked slots
    are excluded both as anchors and as negatives, reproducing the
    reference's exact ragged-batch semantics (duplicate pad rows would
    otherwise split the diagonal's softmax mass and act as false
    negatives)."""
    z1 = _l2_normalize(z1)
    z2 = _l2_normalize(z2)
    logits = (z1 @ z2.T) / tau
    if mask is not None:
        logits = jnp.where(mask[None, :], logits, -jnp.inf)
    labels = jnp.arange(z1.shape[0])
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -_masked_mean(logp[labels, labels], mask)
