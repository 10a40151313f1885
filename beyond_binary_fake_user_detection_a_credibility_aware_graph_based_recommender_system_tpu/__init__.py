"""TPU-native credibility-aware graph recommender framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
research codebase `ishika28/Beyond-Binary-Fake-User-Detection-A-Credibility-
Aware-Graph-based-Recommender-System` (see /root/repo/SURVEY.md):

Stage A — credibility scoring: behavioral feature engineering over a raw
review stream, a bipartite user-item heterograph with edge attributes, and an
edge-weighted GraphSAGE-style GNN ("CredModel") trained with
BCE + smoothness + temporal-contrastive losses, exporting a per-user
credibility score in [0, 1].

Stage B — credibility-aware LightGCN family: sparse normalized-adjacency
propagation with per-edge credibility weights, degree-aware damping,
popularity-aware negative sampling, a popularity-fairness regularizer, and a
beyond-accuracy evaluation suite.

The compute path is TPU-first: propagation is a fused weighted segment-sum
(scatter-as-matmul Pallas kernel over destination-sorted edge chunks),
negative sampling and ranking evaluation run vectorized on device, and
embedding tables shard row-wise over a `jax.sharding.Mesh` for multi-chip
training.

Because the distribution name is long, import it under a short alias::

    import beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu as bb
"""

__version__ = "0.1.0"

# Short, stable subpackage surface.
from . import data, graph, ops, models, train, eval, parallel, utils, configs  # noqa: F401


def __getattr__(name):
    """Lazy top-level conveniences (keep bare import light; jax-heavy
    modules load on first use)."""
    _lazy = {
        "RecConfig": ("utils.config", "RecConfig"),
        "CredConfig": ("utils.config", "CredConfig"),
        "IngestConfig": ("utils.config", "IngestConfig"),
        "ingest_jsonl": ("data.ingest", "ingest_jsonl"),
        "build_bipartite_graph": ("graph.build", "build_bipartite_graph"),
        "build_heterograph": ("graph.hetero", "build_heterograph"),
        "compute_user_features": ("data.features", "compute_user_features"),
        "LightGCN": ("models.lightgcn", "LightGCN"),
        "CredModel": ("models.cred_model", "CredModel"),
        "RecTrainer": ("train.trainer", "RecTrainer"),
        "CredTrainer": ("train.cred_trainer", "CredTrainer"),
        "get_preset": ("configs.presets", "get_preset"),
        "topk_for_users": ("eval.retrieval", "topk_for_users"),
    }
    if name in _lazy:
        import importlib
        mod, attr = _lazy[name]
        return getattr(importlib.import_module(f"{__name__}.{mod}"), attr)
    raise AttributeError(name)
