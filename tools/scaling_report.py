"""Render scaling evidence from the progress ledger — measurement-free.

bench.py --scaling only writes its summary/history/BASELINE.md at the
END of all rounds, so a ladder cut short by a round deadline leaves its
completed reps stranded in BENCH/scaling_progress.jsonl (this cost
round 6 its 16M efficiency number). This tool recomputes best-per-level
throughput and pair efficiencies from the ledger alone:

    python tools/scaling_report.py --docs 16000000 [--pairs 1:4]
        [--append-history] [--note "..."]

With --append-history it adds the window to BENCH/scaling_history.jsonl
(the durable add-don't-replace record that bench.py renders into
BENCH/BASELINE.md's History section).
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_reps(path: str, docs: int) -> dict[int, list[dict]]:
    reps: dict[int, list[dict]] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("docs") != docs:
                continue
            reps.setdefault(rec["cpus"], []).extend(rec.get("reps", []))
    return reps


def summarize(reps: dict[int, list[dict]], pairs: list[tuple[int, int]]) -> dict:
    best = {
        c: min(rs, key=lambda r: r["wall_s"]) for c, rs in reps.items() if rs
    }
    eff = {}
    for n, n4 in pairs:
        if n in best and n4 in best:
            eff[f"{n}->{n4}"] = round(
                best[n4]["triples_per_sec"] / best[n]["triples_per_sec"]
                / (n4 / n), 3,
            )
    return {
        "efficiency": eff,
        "best_walls": {c: best[c]["wall_s"] for c in sorted(best)},
        "best_tps": {c: best[c]["triples_per_sec"] for c in sorted(best)},
        "all_walls": {
            c: [r["wall_s"] for r in rs] for c, rs in sorted(reps.items())
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--pairs", default="1:4")
    ap.add_argument("--ledger", default=os.path.join(
        REPO, "BENCH", "scaling_progress.jsonl"))
    ap.add_argument("--append-history", action="store_true")
    ap.add_argument("--note", default="rendered from ledger (tools/scaling_report.py)")
    args = ap.parse_args()
    pairs = [
        (int(a), int(b)) for a, b in
        (p.split(":") for p in args.pairs.split(",") if p)
    ]
    reps = load_reps(args.ledger, args.docs)
    out = summarize(reps, pairs)
    out["docs"] = args.docs
    if args.append_history and out["efficiency"]:
        with open(
            os.path.join(REPO, "BENCH", "scaling_history.jsonl"), "a"
        ) as f:
            f.write(json.dumps({
                "window": time.strftime("%Y-%m-%d %H:%M", time.gmtime()),
                "ts": round(time.time(), 1),
                "harness": "local",
                "docs": args.docs,
                "rounds": max(
                    (len(v) for v in out["all_walls"].values()), default=0
                ),
                "efficiency": out["efficiency"],
                "best_walls": out["best_walls"],
                "note": args.note,
            }) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
