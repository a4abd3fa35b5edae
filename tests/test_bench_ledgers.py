"""Pure (no-Spark) checks on the bench evidence ledgers.

VERDICT r5: scaling history was overwritten every run and the driver's
stdout capture truncated the per-query dict. These pin the durable-record
mechanisms: the history ledger renders every window, and main_default
persists its full result object to BENCH/last_bench.json.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_history_ledger_renders_every_window(tmp_path):
    """Renderer contract, pinned against a synthetic fixture ledger
    (ADVICE r6: asserting literal values from the live evidence file
    coupled the unit test to data — regenerating the ledger broke the
    test without any code change)."""
    path = tmp_path / "history.jsonl"
    path.write_text(
        json.dumps({
            "window": "w1", "harness": "local", "docs": 1000,
            "efficiency": {"1->4": 0.7}, "best_walls": {"1": 9.0, "4": 3.2},
        }) + "\n"
        + "not json\n"  # renderer must skip malformed lines
        + json.dumps({
            "window": "w2", "harness": "cluster", "docs": 2000,
            "efficiency": {"2->8": 0.81}, "best_walls": {},
        }) + "\n"
    )
    rows = bench._history_rows(str(path)).splitlines()
    assert len(rows) == 2
    # every row is a well-formed 5-column markdown row
    assert all(r.startswith("| ") and r.count("|") == 6 for r in rows)
    text = "\n".join(rows)
    assert "w1" in text and "1->4: 0.7" in text and "cluster" in text


def test_history_ledger_real_file_renders():
    """Loose sanity on the live ledger: every record renders, no literal
    value pins."""
    path = os.path.join(REPO, "BENCH", "scaling_history.jsonl")
    with open(path) as f:
        n_records = sum(1 for line in f if line.strip())
    rows = bench._history_rows().splitlines()
    assert len(rows) == n_records >= 1
    assert all(r.startswith("| ") and r.count("|") == 6 for r in rows)


def test_history_ledger_lines_are_json_with_efficiency():
    path = os.path.join(REPO, "BENCH", "scaling_history.jsonl")
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            assert rec["harness"] in ("local", "cluster")
            assert isinstance(rec["docs"], int)
            assert rec["efficiency"], rec  # at least one measured pair
            for v in rec["efficiency"].values():
                assert 0.0 < v <= 1.5, rec  # sane efficiency range


def test_main_default_writes_last_bench_json(monkeypatch, tmp_path):
    """main_default must persist its full result to BENCH/last_bench.json
    (driver stdout capture truncates; the file is the durable record)."""
    fake_bench_dir = tmp_path / "BENCH"

    monkeypatch.setattr(bench, "_spark", lambda cpus: None)
    monkeypatch.setattr(
        bench, "run_headline", lambda spark: ({"q1": 1.0}, {"q1": 2.0})
    )
    monkeypatch.setattr(
        bench,
        "run_pipeline_bench",
        lambda spark, docs, warmup=False: {"wall_s": 3.0},
    )
    real_join = os.path.join

    def fake_join(*parts):
        if parts[-1] == "BENCH" and parts[0] == os.path.dirname(
            os.path.abspath(bench.__file__)
        ):
            return str(fake_bench_dir)
        return real_join(*parts)

    monkeypatch.setattr(bench.os.path, "join", fake_join)
    bench.main_default()
    saved = json.loads((fake_bench_dir / "last_bench.json").read_text())
    assert saved["queries"] == {"q1": 1.0}
    assert saved["value"] == 4.0
    # contention visibility (r6: a live 16M --scaling ladder silently
    # contaminated the driver bench) — the record must carry the field
    assert isinstance(saved["concurrent_spark_load"], list)


def test_concurrent_spark_procs_excludes_self_and_shells():
    procs = bench._concurrent_spark_procs()
    assert isinstance(procs, list)
    assert all(isinstance(p, str) for p in procs)
    assert not any(p.startswith(("/bin/bash", "/bin/sh")) for p in procs)


def test_scaling_report_summarize_matches_bench_math(tmp_path):
    """tools/scaling_report.py must reproduce main_scaling's efficiency
    formula ((tp@4N / tp@N) / 4, best rep per level) from ledger rows."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import scaling_report

    ledger = tmp_path / "progress.jsonl"
    rows = [
        {"docs": 100, "cpus": 1, "round": 0,
         "reps": [{"wall_s": 10.0, "triples_per_sec": 100.0}]},
        {"docs": 100, "cpus": 1, "round": 1,
         "reps": [{"wall_s": 12.0, "triples_per_sec": 90.0}]},
        {"docs": 100, "cpus": 4, "round": 0,
         "reps": [{"wall_s": 3.0, "triples_per_sec": 320.0}]},
        {"docs": 999, "cpus": 4, "round": 0,  # other docs: excluded
         "reps": [{"wall_s": 1.0, "triples_per_sec": 9999.0}]},
    ]
    ledger.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    reps = scaling_report.load_reps(str(ledger), 100)
    out = scaling_report.summarize(reps, [(1, 4)])
    assert out["efficiency"] == {"1->4": 0.8}  # (320/100)/4
    assert out["best_walls"] == {1: 10.0, 4: 3.0}
    assert out["all_walls"][1] == [10.0, 12.0]


def _rep(wall, tps, triples=1000):
    return {"wall_s": wall, "triples_per_sec": tps, "triples": triples,
            "docs": 100, "docs_per_sec": 1.0, "stage_walls": {}}


def test_write_baseline_report_composes_all_ledger_sections(tmp_path):
    """The report writer must fold EVERY sibling evidence ledger into the
    rewritten BASELINE.md (r5/r6 failure: a wholesale rewrite by one
    harness dropped the other harnesses' sections)."""
    bench_dir = tmp_path / "BENCH"
    bench_dir.mkdir()
    (bench_dir / "scaling_history.jsonl").write_text(json.dumps({
        "window": "w1", "harness": "local", "docs": 100,
        "efficiency": {"1->4": 0.7}, "best_walls": {"1": 9.0},
    }) + "\n")
    (bench_dir / "cluster_scaling.jsonl").write_text(
        json.dumps({"docs": 100, "level": 1, "round": 0,
                    "rep": _rep(10.0, 100.0)}) + "\n"
        + json.dumps({"docs": 100, "level": 4, "round": 0,
                      "rep": _rep(3.0, 340.0)}) + "\n"
    )
    (bench_dir / "isolated_retimes.jsonl").write_text(json.dumps({
        "query": "qx", "walls": [2.0, 1.5], "best": 1.5,
        "cpus": 32, "window": "w2",
    }) + "\n")
    results = {1: {"reps": [_rep(10.0, 100.0)], "best": _rep(10.0, 100.0)},
               4: {"reps": [_rep(3.0, 320.0)], "best": _rep(3.0, 320.0)}}
    bench.write_baseline_report(
        str(bench_dir), 100, results, bw={8: 100.0, 32: 120.0},
        comp={"raw_tasks_per_sec": {1: 10.0, 4: 38.0},
              "engine_tasks_per_sec": {1: 9.0, 4: 35.0}},
        rounds=1, pairs=[(1, 4)],
    )
    text = (bench_dir / "BASELINE.md").read_text()
    # headline local table + pair efficiency
    assert "| local[1] → local[4] | 0.8 |" in text
    # tier-2 cluster section with its own pair efficiency (340/100/4)
    assert "standalone-cluster harness" in text
    assert "Pair efficiency (1 → 4 executors): **0.85**" in text
    # history + retime sections
    assert "w1" in text and "1->4: 0.7" in text
    assert "Isolated re-times" in text and "| qx | 1.5 " in text
    # Run D rows populated (engine/raw per level + pair row)
    assert "| 1 | 10.0 | 9.0 | 0.9 |" in text
    assert "| 1 → 4 | 0.95 | 0.972 |" in text


def test_write_baseline_report_absent_ledgers_render_clean(tmp_path):
    """Local-only checkouts (no cluster/retime ledgers) must render with
    those sections absent, not crash or emit empty tables."""
    bench_dir = tmp_path / "BENCH"
    bench_dir.mkdir()
    results = {1: {"reps": [_rep(10.0, 100.0)], "best": _rep(10.0, 100.0)},
               4: {"reps": [_rep(3.0, 320.0)], "best": _rep(3.0, 320.0)}}
    bench.write_baseline_report(
        str(bench_dir), 100, results, bw={}, comp={
            "raw_tasks_per_sec": {}, "engine_tasks_per_sec": {}},
        rounds=1, pairs=[(1, 4)],
    )
    text = (bench_dir / "BASELINE.md").read_text()
    assert "standalone-cluster harness" not in text
    assert "Isolated re-times" not in text
    assert "| local[1] → local[4] | 0.8 |" in text


def test_render_baseline_latest_bandwidth_normalizes_keys(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import render_baseline

    hist = tmp_path / "history.jsonl"
    hist.write_text(
        json.dumps({"efficiency": {"1->4": 0.7},
                    "bandwidth_gb_s": {"8": 100.0, "32": 120.0}}) + "\n"
        + json.dumps({"efficiency": {"1->4": 0.7}}) + "\n"  # no probe: keep prior
    )
    bw = render_baseline.latest_bandwidth(str(hist))
    assert bw == {8: 100.0, 32: 120.0}


def test_main_scaling_levels_filter_resumes_other_legs(tmp_path, monkeypatch):
    """SPARK_GRAFT_SCALING_LEVELS must restrict which legs LAUNCH while the
    efficiency/report math still sees every level from the resume ledger —
    the single-leg adjudication path (re-run one suspect rep without
    paying for its partner's 35-minute leg)."""
    bench_dir = tmp_path / "BENCH"
    bench_dir.mkdir()
    ledger = tmp_path / "progress.jsonl"
    rep1 = _rep(10.0, 100.0)
    rep4 = _rep(3.0, 330.0)
    ledger.write_text(
        json.dumps({"docs": 100, "cpus": 1, "round": 0, "reps": [rep1]}) + "\n"
        + json.dumps({"docs": 100, "cpus": 4, "round": 0, "reps": [rep4]}) + "\n"
    )
    monkeypatch.setenv("SPARK_GRAFT_SCALING_DOCS", "100")
    monkeypatch.setenv("SPARK_GRAFT_SCALING_LEVELS", "4")
    monkeypatch.setenv("SPARK_GRAFT_SCALING_PROGRESS", str(ledger))
    monkeypatch.setenv("SPARK_GRAFT_SKIP_COMPUTE_PROBE", "1")
    monkeypatch.setattr(bench, "SCALING_PAIRS", [(1, 4)])
    monkeypatch.setattr(bench, "SCALING_REPS", 1)
    monkeypatch.setattr(bench, "hw_bandwidth_probe", lambda *a, **k: {})
    launched = []
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: launched.append(a) or (_ for _ in ()).throw(
            AssertionError("no leg should launch: all (round, level) reps "
                           "are in the ledger")),
    )
    real_join = os.path.join
    monkeypatch.setattr(
        bench.os.path, "join",
        lambda *p: str(bench_dir) if p[-1] == "BENCH" else real_join(*p),
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main_scaling()
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["efficiency"] == {"1->4": 0.825}
    assert not launched
    # report written to the fake BENCH dir, history appended there
    assert (bench_dir / "BASELINE.md").exists()
    assert (bench_dir / "scaling_history.jsonl").exists()


def test_pair_rows_include_hardware_bound_when_probed(tmp_path):
    """When the bandwidth probe covers a pair, the report must show the
    hardware copy-bw efficiency next to the engine's and their ratio —
    the shared-memory-host context the raw number is meaningless without."""
    bench_dir = tmp_path / "BENCH"
    bench_dir.mkdir()
    (bench_dir / "cluster_scaling.jsonl").write_text(
        json.dumps({"docs": 100, "level": 1, "round": 0,
                    "rep": _rep(10.0, 100.0)}) + "\n"
        + json.dumps({"docs": 100, "level": 4, "round": 0,
                      "rep": _rep(3.5, 280.0)}) + "\n"
    )
    results = {1: {"reps": [_rep(10.0, 100.0)], "best": _rep(10.0, 100.0)},
               4: {"reps": [_rep(3.0, 320.0)], "best": _rep(3.0, 320.0)}}
    bench.write_baseline_report(
        str(bench_dir), 100, results,
        bw={1: 40.0, 4: 112.0},  # hw eff (112/40)/4 = 0.7
        comp={"raw_tasks_per_sec": {}, "engine_tasks_per_sec": {}},
        rounds=1, pairs=[(1, 4)],
    )
    text = (bench_dir / "BASELINE.md").read_text()
    assert "| local[1] → local[4] | 0.8 | 0.7 | 1.14 |" in text
    # cluster section gets the same context ((280/100)/4 = 0.7 engine)
    assert "copy-bandwidth scaling over the same pair is 0.7" in text
    assert "reaches 1.0× the hardware bound" in text


def test_compact_record_fits_driver_tail_and_is_steady():
    """VERDICT r7 Wrong #4: the driver keeps only the last 2000 chars of
    stdout, so the captured BENCH_r{N}.json showed first-run (warm-up)
    walls. main_default now prints a compact STEADY-walls record LAST;
    it must fit the tail window whole and lead with the heaviest query."""
    queries = {f"query_with_a_long_name_{i:03d}": float(i) for i in range(120)}
    out = {
        "metric": "headline_queries_plus_kg_pipeline", "value": 1.0,
        "unit": "sec", "queries": queries, "queries_first_run": {},
        "sf": "0.1", "cpus": 32,
        "pipeline": {"docs": 100000, "triples": 5, "wall_s": 9.0,
                     "triples_per_sec": 1.0, "docs_per_sec": 1.0,
                     "stage_walls": {}},
        "concurrent_spark_load": [],
    }
    compact = bench._compact_record(out)
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= 1900  # driver tail is 2000 chars
    assert compact["walls"] == "steady"
    kept = list(compact["queries"])
    # heaviest-first: the single most expensive query is always visible
    assert kept[0] == "query_with_a_long_name_119"
    assert compact["queries_omitted"] == len(queries) - len(kept)
    assert compact["full_record"] == "BENCH/last_bench.json"
    # when everything fits, nothing is dropped
    small = dict(out, queries={"q1": 1.0, "q2": 2.0})
    c2 = bench._compact_record(small)
    assert c2["queries"] == {"q2": 2.0, "q1": 1.0}
    assert c2["queries_omitted"] == 0


def test_concurrent_spark_procs_shell_filter_by_basename():
    """ADVICE r7: a shell at /usr/bin/bash (or zsh) whose cmdline mentions
    a marker must not be counted as concurrent Spark load."""
    import subprocess
    import time as _time

    # a long-lived /usr/bin/bash whose CMDLINE carries a marker string
    p = subprocess.Popen(
        ["/usr/bin/bash", "-c", "sleep 20 # cluster_scaling marker"],
    )
    try:
        _time.sleep(0.2)
        procs = bench._concurrent_spark_procs()
        assert not any("cluster_scaling marker" in c for c in procs)
    finally:
        p.kill()
        p.wait()
