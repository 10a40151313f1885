"""Test harness config.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding code
paths compile and execute without TPU hardware (SURVEY.md §4 build
implication). Must run before the first ``import jax`` anywhere.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Some TPU platform plugins (axon) ignore the JAX_PLATFORMS env var; the
# config API wins as long as it runs before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def bb():
    import beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu as _bb
    return _bb


@pytest.fixture(scope="session")
def small_graph():
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        synthetic_bipartite_graph)
    return synthetic_bipartite_graph(num_users=120, num_items=90,
                                     edges_per_user=12.0, seed=7, power=0.8)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
