"""Checkpointing.

The reference saves only a best-on-val ``state_dict`` with no optimizer
state and no mid-epoch resume (/root/reference/lightgcn.py:613-625;
SURVEY.md §5).  Here full training state (params, optimizer state, epoch,
PRNG key, best-val score) round-trips through Orbax, with a plain ``.npz``
path for parameter-only export.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_params_npz(path, params: Dict[str, Any]) -> None:
    flat = {k: np.asarray(v) for k, v in params.items()}
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_params_npz(path) -> Dict[str, Any]:
    z = np.load(path)
    import jax.numpy as jnp
    return {k: jnp.asarray(z[k]) for k in z.files}


class TrainCheckpointer:
    """Orbax-backed full-state checkpointing with resume."""

    def __init__(self, directory):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        import orbax.checkpoint as ocp
        self._ckptr = ocp.PyTreeCheckpointer()

    def save(self, step: int, state: Dict[str, Any]) -> None:
        import orbax.checkpoint as ocp
        path = self.directory / f"step_{step}"
        self._ckptr.save(path, state, force=True)
        with open(self.directory / "latest.json", "w") as f:
            json.dump({"step": step}, f)

    def latest_step(self) -> Optional[int]:
        p = self.directory / "latest.json"
        if not p.exists():
            return None
        with open(p) as f:
            return int(json.load(f)["step"])

    def restore(self, step: Optional[int] = None, template=None):
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        path = self.directory / f"step_{step}"
        restored = self._ckptr.restore(path, item=template)
        return restored
