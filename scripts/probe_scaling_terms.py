"""Measure the single-chip step terms the scaling projection consumes.

Runs on the REAL TPU at the scaled_10m benchmark scale (planted 10M-edge
graph) and writes runs/scaling_terms.json:

  propagate_s     — one jitted K-layer bf16 propagate (the per_epoch cache)
  epoch_s         — one full jitted training epoch (propagate + 62 scanned
                    cached-BPR steps + sampling)
  scan_steps_s    — epoch_s - propagate_s
  eval_epoch_s    — one full-catalog VAL eval under the preset's fast flags
  fixed_s         — host-side dispatch overhead estimate (epoch call minus
                    device time; folded into epoch_s here, kept at 0)

Usage:  python scripts/probe_scaling_terms.py     (TPU, one at a time)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def timed(fn, n=3):
    # block on the warm call: dispatch is async, so without this the warm
    # execution's tail leaks into the timed window and inflates every term
    # by up to 1/n (measured: 0.58 s vs the true 0.40 s propagate — the
    # round-4/5 scaling terms carried exactly this bias, runs/SUMMARY.md
    # round-5 correction)
    jax.block_until_ready(fn())           # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.configs.presets import (
        get_preset)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        synthetic_bipartite_graph_planted)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import (
        RecTrainer)

    ap = argparse.ArgumentParser()
    ap.add_argument("--spmm-precision", default="preset",
                    choices=["preset", "fp32", "bf16"],
                    help="override the preset's message precision for a "
                         "same-day A/B of the terms (round-5 precision "
                         "decision)")
    ap.add_argument("--out", default="runs/scaling_terms.json")
    args = ap.parse_args()

    print("device:", jax.devices()[0], file=sys.stderr)
    graph = synthetic_bipartite_graph_planted(
        500_000, 1_000_000, 20.0, seed=0, power=1.0,
        coarse_clusters=16, fine_per_coarse=16, mix=(0.55, 0.25, 0.20))
    print(f"graph: {graph.summary()}", file=sys.stderr)
    overrides = {} if args.spmm_precision == "preset" else {
        "spmm_precision": args.spmm_precision}
    cfg = get_preset("scaled_10m", epochs=2, seed=0, **overrides)
    tr = RecTrainer(cfg, graph, verbose=False)
    params, opt_state, key = tr.init_state()
    bundle = tr.train_state_bundle()
    epoch_fn = tr._build_epoch_fn()

    t_prop = timed(lambda: tr._propagate_fn(params, tr.model.state))
    print(f"propagate_s={t_prop:.4f}", file=sys.stderr)

    # chain state across iterations (relay microbench caveat, skills/verify)
    state = [params, opt_state, key]

    def one_epoch():
        p, o, k, loss = epoch_fn(state[0], state[1], state[2],
                                 tr.train_users_dev, bundle)
        state[0], state[1], state[2] = p, o, k
        return loss
    t_epoch = timed(one_epoch, n=3)
    print(f"epoch_s={t_epoch:.4f}", file=sys.stderr)

    t0 = time.perf_counter()
    tr.evaluate(state[0], "val")
    t_eval = time.perf_counter() - t0          # includes compile
    t0 = time.perf_counter()
    tr.evaluate(state[0], "val")
    t_eval = time.perf_counter() - t0          # warm
    print(f"eval_epoch_s={t_eval:.4f}", file=sys.stderr)

    out = {"propagate_s": t_prop, "epoch_s": t_epoch,
           "scan_steps_s": max(t_epoch - t_prop, 0.0),
           "eval_epoch_s": t_eval, "fixed_s": 0.0,
           "device": str(jax.devices()[0]),
           # label from the ACTUAL config, not a hard-coded string
           # (VERDICT r4 item 1)
           "config": f"scaled_10m(planted 10M, {cfg.spmm_precision} "
                     f"messages, {cfg.propagation_schedule})"}
    Path("runs").mkdir(exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
