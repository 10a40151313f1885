"""Checkpointing.

The reference saves only a best-on-val ``state_dict`` with no optimizer
state and no mid-epoch resume (/root/reference/lightgcn.py:613-625;
SURVEY.md §5).  Here full training state (params, optimizer state, epoch,
PRNG key, best-val score) round-trips through an Orbax CheckpointManager
with ASYNC saves, keep-last-N retention, and an every-M-epochs cadence —
a 400-epoch run leaves at most N checkpoint dirs instead of 400.  A plain
``.npz`` path covers parameter-only export.
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
    """Orbax CheckpointManager wrapper: async saves, keep-last-``keep``,
    save every ``every`` epochs (the latest step is always retained)."""

    def __init__(self, directory, keep: int = 3, every: int = 1,
                 async_save: bool = True):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        import orbax.checkpoint as ocp
        self._ocp = ocp
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max(int(keep), 1),
            save_interval_steps=max(int(every), 1),
            enable_async_checkpointing=bool(async_save),
        )
        self._mngr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Dict[str, Any]) -> bool:
        """Queue an async save; returns False when the cadence skips it."""
        return bool(self._mngr.save(
            step, args=self._ocp.args.PyTreeSave(state)))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, step: Optional[int] = None, template=None):
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mngr.restore(
                step, args=self._ocp.args.PyTreeRestore(template))
        return self._mngr.restore(step)

    def wait(self) -> None:
        """Block until queued async saves (and retention GC) finish."""
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()
