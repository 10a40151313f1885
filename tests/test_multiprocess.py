"""Real multi-process distributed training test (2 processes x 4 devices).

The single-process 8-device virtual mesh (conftest) exercises the sharding
MATH; this test exercises the distributed RUNTIME: two OS processes join a
jax.distributed CPU cluster (Gloo collectives — the DCN analogue of a
multi-host TPU pod) and run the GSPMD train step and the edge-sharded
shard_map SpMM over a mesh that spans both processes, so every all-gather
/ psum / all-to-all genuinely crosses a process boundary.

The workers (tests/mp_worker.py) assert loss finiteness and SpMM
correctness vs a dense oracle internally; this test checks both exit
cleanly and report IDENTICAL losses (single-controller semantics)."""

import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_train_and_spmm():
    port = _free_port()
    # inherit the interpreter's environment minus the TPU seat claim
    import os
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "mp_worker.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(REPO))
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        m = re.search(r"\[mp OK\] pid=\d+ loss=([-\d.]+) spmm_err", out)
        assert m, f"missing OK marker:\n{out[-3000:]}"
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1], losses
