"""Device mesh construction.

The reference is strictly single-process / single-GPU (no torch.distributed
anywhere — SURVEY.md C34); parallelism here is built TPU-native from the
start: a (data, model) `jax.sharding.Mesh`, embedding tables row-sharded
over ``model``, BPR batches sharded over ``data``, with GSPMD inserting the
all-gather / reduce-scatter collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def factor_mesh(n_devices: int) -> Tuple[int, int]:
    """Split n devices into (data, model) — as square as possible with the
    model axis taking the larger factor (embedding tables dominate memory)."""
    best = (1, n_devices)
    for d in range(1, int(np.sqrt(n_devices)) + 1):
        if n_devices % d == 0:
            best = (d, n_devices // d)
    return best


def make_mesh(n_devices: Optional[int] = None,
              shape: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = factor_mesh(len(devices))
    assert shape[0] * shape[1] == len(devices), (shape, len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Row-shard a (N, D) table over the model axis."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard a leading batch dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))
