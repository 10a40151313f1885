"""Multi-host initialization helpers.

The reference has no distributed backend at all (SURVEY.md C34: no
NCCL/MPI/Gloo anywhere); the TPU-native equivalent is
``jax.distributed.initialize`` + GSPMD/pjit collectives — ICI for
intra-slice all-gathers/reduce-scatters, DCN across hosts.  No custom
transport layer exists or is needed: every collective in this framework is
expressed through ``jax.sharding`` / ``shard_map`` and lowered by XLA.

Typical multi-host launch (one process per host, same binary):

    from ..parallel import distributed, mesh
    distributed.initialize()               # reads TPU env on each host
    m = mesh.make_mesh()                   # global mesh over all devices
    ... build trainer with operator_factory=ShardedSpmmOperator(mesh=m) ...

Single-process (tests, one chip) is a no-op.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process; no-op (False)
    in single-process settings.

    With no arguments, relies on the TPU environment (the standard
    ``jax.distributed.initialize()`` auto-detection).  Explicit arguments
    support CPU/GPU multi-process testing.
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return True
    multi = (coordinator_address is not None
             or os.environ.get("JAX_COORDINATOR_ADDRESS")
             or os.environ.get("TPU_WORKER_HOSTNAMES", "localhost")
             not in ("", "localhost"))
    if not multi:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return True


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
