"""Summarize the fp32-vs-bf16 quality comparison runs
(runs/precision_compare/, produced by scripts/reference_regression.py with
``spmm_precision=...`` overrides) into a markdown table for
docs/PRECISION.md.
"""
import glob
import json
import sys

import numpy as np


def load(path):
    epochs, test = [], None
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "test" in rec:
                test = rec
            else:
                epochs.append(rec)
    return epochs, test


def val_recall_curve(epochs, K="20"):
    return np.array([e["val"][K]["recall"] for e in epochs if e.get("val")])


def main():
    rows = []
    for path in sorted(glob.glob("runs/precision_compare/*.jsonl")):
        name = path.split("/")[-1].replace(".jsonl", "")
        epochs, test = load(path)
        if test is None:
            print(f"skipping incomplete {name}", file=sys.stderr)
            continue
        curve = val_recall_curve(epochs)
        t20 = test["test"]["20"]
        rows.append({
            "run": name,
            "epochs": len(epochs),
            "best_val_R20": test["best_val_recall"],
            "mean_last50_val_R20": float(curve[-50:].mean()),
            "test_R20": t20["recall"],
            "test_NDCG20": t20["ndcg"],
            "wall_s": test["wall_seconds"],
        })
    hdr = ["run", "epochs", "best_val_R20", "mean_last50_val_R20",
           "test_R20", "test_NDCG20", "wall_s"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in rows:
        print("| " + " | ".join(
            f"{r[h]:.5f}" if isinstance(r[h], float) and h != "wall_s"
            else (f"{r[h]:.0f}" if h == "wall_s" else str(r[h]))
            for h in hdr) + " |")


if __name__ == "__main__":
    main()
