"""Regenerate BENCH/BASELINE.md from the durable evidence ledgers.

bench.py --scaling writes the report only at the END of all rounds, so a
ladder stopped at a deadline leaves BASELINE.md stale even though every
completed rep is in BENCH/scaling_progress.jsonl. This tool rebuilds the
full report measurement-free:

    python tools/render_baseline.py --docs 16000000 [--pairs 1:4]

Sources (all optional except the progress ledger):
- BENCH/scaling_progress.jsonl  -> headline local[N] table + pair rows
- BENCH/scaling_history.jsonl   -> history section (also: latest recorded
                                   bandwidth probe, unless --probe-bw)
- BENCH/cluster_scaling.jsonl   -> tier-2 executor-scaling section
- BENCH/isolated_retimes.jsonl  -> adjudication re-time section
- BENCH/run_d.json              -> compute-bound control (tools/run_d_probe.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from tools.scaling_report import load_reps  # noqa: E402


def latest_bandwidth(history_path: str) -> dict:
    """Most recent history row that recorded a hardware bandwidth probe
    (keys arrive as strings after a JSON round-trip — normalize)."""
    bw: dict = {}
    if not os.path.exists(history_path):
        return bw
    with open(history_path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("bandwidth_gb_s"):
                bw = {int(k): v for k, v in rec["bandwidth_gb_s"].items()}
    return bw


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--pairs", default="1:4")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--probe-bw", action="store_true",
                    help="run a fresh STREAM-style probe (~25s) instead of "
                    "reusing the latest recorded one")
    args = ap.parse_args()
    pairs = [
        (int(a), int(b)) for a, b in
        (p.split(":") for p in args.pairs.split(",") if p)
    ]
    bench_dir = os.path.join(REPO, "BENCH")
    reps = load_reps(
        os.path.join(bench_dir, "scaling_progress.jsonl"), args.docs)
    if not reps:
        raise SystemExit(f"no reps at docs={args.docs} in the progress ledger")
    results = {
        c: {"reps": rs, "best": min(rs, key=lambda r: r["wall_s"])}
        for c, rs in reps.items()
    }
    bw = (
        bench.hw_bandwidth_probe() if args.probe_bw
        else latest_bandwidth(os.path.join(bench_dir, "scaling_history.jsonl"))
    )
    run_d = os.path.join(bench_dir, "run_d.json")
    if os.path.exists(run_d):
        with open(run_d) as f:
            comp = json.load(f)
        comp = {
            k: {int(n): v for n, v in comp.get(k, {}).items()}
            for k in ("raw_tasks_per_sec", "engine_tasks_per_sec")
        }
    else:
        comp = {"raw_tasks_per_sec": {}, "engine_tasks_per_sec": {}}
    bench.write_baseline_report(
        bench_dir, args.docs, results, bw, comp,
        rounds=args.rounds, pairs=pairs,
    )
    print(json.dumps({
        "written": os.path.join(bench_dir, "BASELINE.md"),
        "efficiency": {
            f"{n}->{n4}": bench._eff(results, n, n4)
            for n, n4 in pairs if n in results and n4 in results
        },
    }))


if __name__ == "__main__":
    main()
