"""Real multi-process distributed training test (2 processes x 4 devices).

The single-process 8-device virtual mesh (conftest) exercises the sharding
MATH; this test exercises the distributed RUNTIME: two OS processes join a
jax.distributed CPU cluster (Gloo collectives — the DCN analogue of a
multi-host TPU pod) and run the GSPMD train step and the edge-sharded
shard_map SpMM over a mesh that spans both processes, so every all-gather
/ psum / all-to-all genuinely crosses a process boundary.

The workers (tests/mp_worker.py) assert loss finiteness and SpMM
correctness vs a dense oracle internally, then run a short
``RecTrainer.fit`` (2 scanned epochs, per_epoch cached propagation,
popmix sampling, full-catalog eval through the distributed top-k with the
approx/bf16 fast flags) over the same cross-process mesh (VERDICT r4
item 5).  This test checks both exit cleanly and report IDENTICAL losses,
per-epoch fit losses, and test metrics (single-controller semantics)."""

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
    reports = []
    for out in outs:
        m = re.search(r"\[mp OK\] pid=\d+ (loss=[-\d.]+) spmm_err=\S+ "
                      r"(fit_losses=[-\d.,]+ testR20=[-\d.]+ "
                      r"testN20=[-\d.]+)", out)
        assert m, f"missing OK marker:\n{out[-3000:]}"
        reports.append((m.group(1), m.group(2)))
    # bit-identical step loss, per-epoch fit losses, and test metrics on
    # both controllers
    assert reports[0] == reports[1], reports
