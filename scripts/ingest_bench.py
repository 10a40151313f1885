"""North-star ingest measurement (VERDICT r4 task 9).

Times the L0 ingest paths on a ~10M-line synthetic Amazon-class JSONL (the
scaled_10m data scale) and records whether parse time is material next to
the end-to-end two-stage wall — parallelizing the C++ reader is only
worth it if this measurement says so.

  python scripts/ingest_bench.py [--lines 10000000] [--keep]

Writes runs/ingest_bench.json.  CPU-only; run while the TPU is free of
other Python processes or with PALLAS_AXON_POOL_IPS unset.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=10_000_000)
    ap.add_argument("--users", type=int, default=500_000)
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--path", default="/tmp/ingest_bench_reviews.jsonl")
    ap.add_argument("--python-lines", type=int, default=1_000_000,
                    help="python-backend sample size (7x slower; measured "
                         "on a prefix, reported per-line)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from scripts.two_stage_demo import make_synthetic_reviews
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data.ingest import (
        ingest_jsonl)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (
        IngestConfig)

    path = Path(args.path)
    if not path.exists():
        make_synthetic_reviews(path, args.lines, args.users, args.items)
    size_gb = path.stat().st_size / 1e9
    print(f"jsonl: {args.lines:,} lines, {size_gb:.2f} GB", file=sys.stderr)

    out = {"lines": args.lines, "bytes": path.stat().st_size}

    t0 = time.perf_counter()
    table = ingest_jsonl(path, IngestConfig(jsonl_path=str(path),
                                            backend="native"))
    t_native = time.perf_counter() - t0
    out["native_s"] = t_native
    out["native_mlines_per_s"] = args.lines / t_native / 1e6
    out["rows_kept"] = int(table.uidx.shape[0])
    print(f"native: {t_native:.1f}s "
          f"({out['native_mlines_per_s']:.2f} M lines/s)", file=sys.stderr)

    # python backend on a prefix (linear in lines)
    prefix = Path(str(path) + ".prefix")
    with open(path, "rb") as f, open(prefix, "wb") as g:
        for k, ln in enumerate(f):
            if k >= args.python_lines:
                break
            g.write(ln)
    t0 = time.perf_counter()
    ingest_jsonl(prefix, IngestConfig(jsonl_path=str(prefix),
                                      backend="python"))
    t_py = time.perf_counter() - t0
    out["python_prefix_lines"] = args.python_lines
    out["python_prefix_s"] = t_py
    out["python_projected_s"] = t_py * args.lines / args.python_lines
    out["native_speedup"] = out["python_projected_s"] / t_native
    print(f"python: {t_py:.1f}s on {args.python_lines:,} lines -> "
          f"projected {out['python_projected_s']:.0f}s at {args.lines:,} "
          f"({out['native_speedup']:.1f}x native win)", file=sys.stderr)

    prefix.unlink(missing_ok=True)
    if not args.keep:
        path.unlink(missing_ok=True)
    Path("runs").mkdir(exist_ok=True)
    Path("runs/ingest_bench.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
