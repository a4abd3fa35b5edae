"""Run D standalone: the compute-bound positive control, persisted.

bench.py --scaling runs this probe in-process and loses the result if
the ladder is stopped before its final report (how the Run D table in
BENCH/BASELINE.md stayed empty for two rounds). This runs ONLY the probe
and writes BENCH/run_d.json, which tools/render_baseline.py folds into
the report.

    python tools/run_d_probe.py [--levels 1,4]

~2-4 min: raw spin processes + one Spark subprocess per level.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,4")
    args = ap.parse_args()
    levels = tuple(int(x) for x in args.levels.split(","))
    comp = bench.compute_scaling_probe(levels)
    comp["levels"] = list(levels)
    comp["spin_iters"] = bench.SPIN_ITERS
    comp["window"] = time.strftime("%Y-%m-%d %H:%M", time.gmtime())
    out = os.path.join(REPO, "BENCH", "run_d.json")
    with open(out, "w") as f:
        json.dump(comp, f, indent=1)
    print(json.dumps(comp))


if __name__ == "__main__":
    main()
