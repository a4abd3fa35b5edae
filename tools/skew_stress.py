"""Hot-key skew stress-run: unsalted vs salted star-edge canonicalize.

The north rule names hot-key salting as a required scale technique
(SURVEY.md §4), and `canonicalize.surface_star_edges(n_salt>1)` ships the
two-pass salted star — oracle-green (`canonical_components_star`) but,
until round 8, never DEMONSTRATED on a skewed corpus. This tool is that
demonstration (VERDICT r7 Next #7):

- Builds a deterministic skewed anchor table of N rows where one head
  surface ("usa", the web's "USA" problem) holds ~1% of all mentions —
  at N=16M that is 160k entities routed through ONE window partition —
  over a uniform tail (~20 entities/surface). No external data; the
  generator is pure Spark column functions (xxhash64), same rows every
  run.
- Runs the star-edge stage unsalted (n_salt=1) and salted (n_salt=64),
  each in its OWN subprocess (fresh JVM, one untimed full-size warm-up
  rep, then a timed steady rep — the bench protocol), strictly
  serialized.
- Pulls per-task duration quantiles for every stage of the timed rep
  from the Spark UI REST API (`/stages/{id}/{attempt}/taskSummary`) and
  reports, per variant, the stage wall plus the max-task / median-task
  duration ratio of the straggler stage. AQE cannot fix this case:
  skewed-shuffle splitting applies to joins, while a window REQUIRES all
  rows of a key in one task — salting is the only bound.

A window cannot show a straggler if the hot key is smaller than the
median partition, so the default shuffle_partitions here is 256
(median task ≈ N/256 ≈ 62k rows at 16M; head task ≈ 160k + its share),
and the child pins that count by disabling AQE partition coalescing
(see the extra_conf comment — at toy scale coalescing merges the hot
key into a normal-sized partition; at 100 TB it could not).

Two regimes, both worth a ledger pair:
- head_pct=1 (default): the hot task shows in the MAX/MEDIAN TASK
  ratio but not the wall — on 32 local cores a 1% key (hot_fraction <
  1/cores) hides inside the task waves. This is the metric the north
  rule's straggler bound is about: on a 1000-core cluster the same 1%
  key is 10× the per-core share and DOES bound the wall.
- head_pct ≥ ~12 (hot_fraction × cores ≈ 4): reproduces that
  wall-bounding regime at local core counts — unsalted wall degrades
  toward the hot task's wall; salted recovers it.

Usage:
    python tools/skew_stress.py [--rows 16000000] [--head-pct 1.0]
        [--salt 64] [--partitions 256] [--cpus 32]
Appends one JSON line per variant to BENCH/skew_stress.jsonl and prints
a summary. Evidence runs must be serialized: refuses to start while
other Spark JVMs are live (bench._concurrent_spark_procs).
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
import json, os, sys, time, urllib.request
sys.path.insert(0, os.environ["TBNER_REPO"])

rows = int(os.environ["SKEW_ROWS"])
head_pct = float(os.environ["SKEW_HEAD_PCT"])
n_salt = int(os.environ["SKEW_SALT"])
parts = int(os.environ["SKEW_PARTS"])
cpus = int(os.environ["SKEW_CPUS"])

from pyspark.sql import functions as F
from thesaurus_based_ner_spark.session import get_spark
from thesaurus_based_ner_spark.operators.canonicalize import surface_star_edges

spark = get_spark(
    app_name=f"skew_stress_salt{n_salt}",
    cpus=cpus,
    shuffle_partitions=parts,
    extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": "4049",
        # Pin the partition count. At toy scale every shuffle partition is
        # far below AQE's 64MB coalesce target, so AQE merges ~256
        # partitions down to ~32 and the hot key disappears inside a
        # normal-sized partition (measured: max/median 1.27 with
        # coalescing on). At 100 TB partitions already sit AT the target
        # and a hot key bigger than it still lands in ONE window task —
        # coalescing cannot save it there. Disabling coalescing here
        # reproduces the at-scale task geometry; it is a measurement
        # choice for this stress tool, not a library default.
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")

# Deterministic skewed anchor table: id%round(100/head_pct)==0 -> the head
# surface; tail surfaces hold ~20 entities each. Materialized to parquet
# UNTIMED (input is a stored table in any real deployment).
head_mod = max(2, round(100.0 / head_pct))
n_tail_surfaces = max(1, rows // 20)
anchor = (
    spark.range(rows)
    .select(
        F.format_string("e%09d", F.col("id")).alias("entity"),
        F.when(F.col("id") % head_mod == 0, F.lit("usa"))
        .otherwise(
            F.format_string(
                "surface_%08d",
                F.pmod(F.xxhash64(F.col("id")), F.lit(n_tail_surfaces)),
            )
        )
        .alias("surface"),
    )
)
path = os.path.join(
    os.environ["SKEW_TMP"], f"skew_anchor_{rows}_h{head_pct}"
)
if not os.path.exists(path):
    anchor.write.mode("overwrite").parquet(path)
anchor = spark.read.parquet(path)

def one_rep() -> tuple[float, int]:
    t0 = time.time()
    n = surface_star_edges(anchor, n_salt=n_salt).count()
    return time.time() - t0, n

one_rep()  # untimed full-size warm-up (JIT/codegen/python-pool)
ui = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId
def _stage_ids():
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        return {(s["stageId"], s["attemptId"]): s for s in json.load(r)}

before = _stage_ids()
wall, n_edges = one_rep()
stages = []
for (sid, att), s in _stage_ids().items():
    if (sid, att) in before:
        continue
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages/{sid}/{att}/taskSummary"
            "?quantiles=0.5,1.0"
        ) as r:
            q = json.load(r)
    except Exception:
        continue
    med, mx = q["duration"]
    srm = q.get("shuffleReadMetrics") or {}
    recs = srm.get("readRecords") or srm.get("recordsRead") or [0, 0]
    rec = {
        "stage_id": sid,
        "tasks": s.get("numCompleteTasks"),
        "dur_median_s": round(med / 1000.0, 3),
        "dur_max_s": round(mx / 1000.0, 3),
        "ratio": round(mx / med, 2) if med > 0 else None,
        "rows_median": int(recs[0]),
        "rows_max": int(recs[-1]),
        "rows_ratio": (
            round(recs[-1] / recs[0], 2) if recs[0] > 0 else None
        ),
        "name": s.get("name", "")[:60],
    }
    stages.append(rec)
# The skew witness is the WINDOW stage: a shuffle stage at the pinned
# partition count whose max-task shuffle-read ROW COUNT dwarfs its
# median — rows are deterministic, while sub-second task DURATIONS on a
# shared host carry scheduling/GC noise (a 0.1s-median stage showed a
# one-off 38x duration outlier with a 1.0 rows ratio). Excludes the
# scan stage (few, big, unskewed tasks).
window_stages = [
    st for st in stages
    if (st["tasks"] or 0) >= max(64, parts // 4) and st["rows_median"] > 0
]
straggler = (
    max(window_stages, key=lambda st: st["rows_ratio"] or 0)
    if window_stages
    else (max(stages, key=lambda st: st["dur_max_s"]) if stages else None)
)
print("RESULT " + json.dumps({
    "variant": "salted" if n_salt > 1 else "unsalted",
    "n_salt": n_salt,
    "rows": rows,
    "head_pct": head_pct,
    "partitions": parts,
    "cpus": cpus,
    "edges": n_edges,
    "wall_s": round(wall, 3),
    "straggler_stage": straggler,
    "stages": sorted(stages, key=lambda st: -st["dur_max_s"])[:4],
}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--head-pct", type=float, default=1.0)
    ap.add_argument("--salt", type=int, default=64)
    ap.add_argument("--partitions", type=int, default=256)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import bench

    load = bench._concurrent_spark_procs()
    if load:
        print(f"refusing to run: live Spark processes {load}", file=sys.stderr)
        sys.exit(2)

    tmp = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/dev/shm/tbner_bench")
    os.makedirs(tmp, exist_ok=True)
    ledger = os.path.join(REPO, "BENCH", "skew_stress.jsonl")
    results = []
    for n_salt in (1, args.salt):  # unsalted first: worst case sets the bar
        env = dict(
            os.environ,
            TBNER_REPO=REPO,
            SKEW_ROWS=str(args.rows),
            SKEW_HEAD_PCT=str(args.head_pct),
            SKEW_SALT=str(n_salt),
            SKEW_PARTS=str(args.partitions),
            SKEW_CPUS=str(args.cpus),
            SKEW_TMP=tmp,
        )
        p = subprocess.run(
            [sys.executable, "-c", _CHILD], env=env, cwd=REPO,
            capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
        if p.returncode != 0 or not line:
            print(p.stdout[-2000:], file=sys.stderr)
            print(p.stderr[-2000:], file=sys.stderr)
            sys.exit(1)
        rec = json.loads(line[-1][len("RESULT "):])
        rec["window"] = time.strftime("%Y-%m-%d %H:%M", time.gmtime())
        rec["ts"] = round(time.time(), 1)
        results.append(rec)
        with open(ledger, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))

    if len(results) == 2 and all(r.get("straggler_stage") for r in results):
        un, sa = results
        # both variants emit exactly S-1 edges per surface group (within:
        # S-b, across: b-1), so the counts must match EXACTLY
        assert un["edges"] == sa["edges"], \
            "salted star must connect exactly the same surface groups"
        print(json.dumps({
            "summary": "unsalted vs salted star-edge on skewed input",
            "unsalted": {"wall_s": un["wall_s"],
                         "rows_max_over_median":
                             un["straggler_stage"].get("rows_ratio"),
                         "max_over_median": un["straggler_stage"]["ratio"],
                         "max_task_s": un["straggler_stage"]["dur_max_s"]},
            "salted": {"n_salt": sa["n_salt"], "wall_s": sa["wall_s"],
                       "rows_max_over_median":
                           sa["straggler_stage"].get("rows_ratio"),
                       "max_over_median": sa["straggler_stage"]["ratio"],
                       "max_task_s": sa["straggler_stage"]["dur_max_s"]},
        }))


if __name__ == "__main__":
    main()
