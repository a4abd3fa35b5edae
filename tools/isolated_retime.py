"""Isolated per-query re-timing: fresh JVM, one query, N steady reps.

The shared-JVM bench (bench.py main_default) times ~50 queries in one
session, so a query's wall carries whatever heap/codegen-cache state the
previous 30 queries left behind, plus this host's documented ~1.4×
inter-window throughput drift. When a query's bench number swings
round-over-round with NO code change (VERDICT r5: mention_spans_dist
3.8→8.5s, multimodal_features 1.8→7.8s, cosine_topk 2.6→8.0s), this tool
answers "plan regression or harness noise?": each named query gets its
own subprocess (fresh JVM, fresh python-worker pool), one untimed
full-size warm-up run, then N timed steady reps.

Usage:
    python tools/isolated_retime.py mention_spans_dist cosine_topk \
        [--reps 3] [--sf /root/testdata/sf0.1] [--cpus 32]
Appends one JSON line per query to BENCH/isolated_retimes.jsonl and
prints a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["TBNER_REPO"])
from bench import _spark  # same session conf + tmpfs local dirs as bench
from thesaurus_based_ner_spark.plans import queries_ext, queries_r3, queries_r4  # noqa: F401
from thesaurus_based_ner_spark.plans.queries import QUERIES

name = os.environ["TBNER_QUERY"]
sf = os.environ["TBNER_SF"]
reps = int(os.environ["TBNER_REPS"])
spark = _spark(int(os.environ["TBNER_CPUS"]))
fn = QUERIES[name]
fn(spark, sf).count()  # untimed warm-up (JIT/codegen/worker pool)
walls = []
for _ in range(reps):
    t0 = time.time()
    fn(spark, sf).count()
    walls.append(round(time.time() - t0, 3))
print("RETIME " + json.dumps({"query": name, "walls": walls}), flush=True)
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    ledger = os.path.join(REPO, "BENCH", "isolated_retimes.jsonl")
    os.makedirs(os.path.dirname(ledger), exist_ok=True)
    out = {}
    for name in args.queries:
        env = dict(
            os.environ, TBNER_REPO=REPO, TBNER_QUERY=name,
            TBNER_SF=args.sf, TBNER_REPS=str(args.reps),
            TBNER_CPUS=str(args.cpus),
        )
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD], capture_output=True,
            text=True, env=env, timeout=1800, cwd=REPO,
        )
        rec = None
        for line in (proc.stdout or "").splitlines():
            if line.startswith("RETIME "):
                rec = json.loads(line[len("RETIME "):])
        if rec is None:
            sys.stderr.write(
                f"{name}: FAILED (rc={proc.returncode}); stderr tail:\n"
                + "\n".join((proc.stderr or "").splitlines()[-10:]) + "\n")
            continue
        rec.update({
            "window": time.strftime("%Y-%m-%d %H:%M", time.gmtime()),
            "sf": args.sf, "cpus": args.cpus,
            "best": min(rec["walls"]),
        })
        with open(ledger, "a") as f:
            f.write(json.dumps(rec) + "\n")
        out[name] = rec
        print(f"{name}: best {rec['best']}s, walls {rec['walls']}")
    print(json.dumps({k: v["best"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
