"""True multi-executor scaling evidence: N vs 4N EXECUTORS on a Spark
standalone cluster, shipped via spark-submit --py-files.

The local[N] scaling benchmark (bench.py --scaling) varies task-slot
parallelism inside ONE JVM. The north rule's regime is executor COUNT on
a cluster, so this harness runs the same full KG pipeline against a real
standalone master with 1 vs 4 single-core worker JVMs on this host:
separate executor processes, real netty shuffle + Arrow python workers
per executor, the driver a separate client process — everything a
multi-executor deployment exercises except a physical network.

Protocol mirrors bench.py --scaling: per (round, level) a fresh cluster
of `level` workers is started, ONE spark-submit app runs an untimed
full-size warm-up rep then a timed steady-state rep, and the cluster is
torn down. Rounds interleave levels so host-noise bursts land on
adjacent levels of the same round. Best rep per level; efficiency =
(tp@4N / tp@N) / 4.

Usage:
    python tools/cluster_scaling.py [--docs 4000000] [--rounds 2]
Appends one JSON line per rep to BENCH/cluster_scaling.jsonl (resumable)
and prints a summary JSON; merge into BENCH/BASELINE.md by hand.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_PORT = int(os.environ.get("SPARK_GRAFT_MASTER_PORT", "7077"))
MASTER_URL = f"spark://127.0.0.1:{MASTER_PORT}"

# Exactly the session conf get_spark() documents as "safe as --conf
# flags" — on a cluster the builder is bypassed and THESE are the submit
# flags a production deployment ships with (session.py:36-63).
SUBMIT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    "spark.sql.shuffle.partitions": "64",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # don't start scheduling until every worker has registered — a late
    # 4th executor would otherwise skew the level-4 warm-up
    "spark.scheduler.minRegisteredResourcesRatio": "1.0",
    "spark.scheduler.maxRegisteredResourcesWaitingTime": "60s",
    # Spark 4.1.2 RemoveRedundantAliases bug on iterative self-joins —
    # same exclusion get_spark() applies (session.py:57-62)
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.RemoveRedundantAliases",
    # dying python workers dump their own stack into the executor error
    # (r6's worker-crash log was unrecoverable without this)
    "spark.python.worker.faulthandler.enabled": "true",
    # self-heal wedged Arrow reads after silent worker death (session.py
    # ships the same defaults; spark.task.maxFailures=4 is the cluster
    # default already)
    "spark.python.worker.idleTimeoutSeconds": "600",
    "spark.python.worker.killOnIdleTimeout": "true",
    # shuffle/spill on tmpfs, matching bench._spark: this sandbox's disk
    # has bursty fsync latency that would land in EXECUTOR shuffle writes
    # and swamp the scaling signal (a real cluster shuffles over
    # NVMe+network). Applies to every executor and the driver.
    "spark.local.dir": "/dev/shm/spark-local",
}

PAYLOAD = r"""
import json, os, sys, tempfile, time

sys.path.insert(0, os.environ["TBNER_REPO"])
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()  # master/conf from spark-submit
spark.sparkContext.setLogLevel("WARN")

import bench  # reuse the exact pipeline-bench body (warm-up + timing rules)

docs = int(os.environ["TBNER_DOCS"])
reps = [bench.run_pipeline_bench(spark, docs, warmup=True)]
print("CLUSTER_REP " + json.dumps(reps[0]), flush=True)
spark.stop()
"""


def _spark_daemon(cls: str, args: list[str], env: dict) -> subprocess.Popen:
    return subprocess.Popen(
        [os.path.join(SPARK_HOME, "bin", "spark-class"), cls, *args],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env=env, start_new_session=True,
    )


def _wait_port(port: int, timeout: float = 60.0) -> None:
    import socket

    t0 = time.time()
    while time.time() - t0 < timeout:
        with socket.socket() as s:
            s.settimeout(1)
            try:
                s.connect(("127.0.0.1", port))
                return
            except OSError:
                time.sleep(0.5)
    raise RuntimeError(f"port {port} never opened")


def run_level(level: int, docs: int, timeout: int) -> dict | None:
    """Start master + `level` 1-core workers, submit the bench app, tear
    everything down. Returns the rep dict or None on failure."""
    env = dict(
        os.environ,
        SPARK_NO_DAEMONIZE="",  # spark-class runs in foreground anyway
        SPARK_LOCAL_IP="127.0.0.1",
        SPARK_MASTER_HOST="127.0.0.1",
    )
    procs: list[subprocess.Popen] = []
    payload_path = os.path.join("/tmp", "tbner_cluster_payload.py")
    with open(payload_path, "w") as f:
        f.write(PAYLOAD)
    try:
        procs.append(_spark_daemon(
            "org.apache.spark.deploy.master.Master",
            ["--host", "127.0.0.1", "--port", str(MASTER_PORT),
             "--webui-port", "0"], env,
        ))
        _wait_port(MASTER_PORT)
        for i in range(level):
            procs.append(_spark_daemon(
                "org.apache.spark.deploy.worker.Worker",
                [MASTER_URL, "--cores", "1", "--memory", "10g",
                 "--webui-port", "0",
                 "--work-dir", f"/tmp/tbner_worker_{i}"], env,
            ))
        conf_flags: list[str] = []
        for k, v in SUBMIT_CONF.items():
            conf_flags += ["--conf", f"{k}={v}"]
        submit_env = dict(
            env, TBNER_REPO=REPO, TBNER_DOCS=str(docs),
            # executor python workers inherit this
            SPARK_GRAFT_BENCH_TMP="/dev/shm",
        )
        # the submit runs in its own session so a timeout can kill the
        # WHOLE app process group (spark-submit execs a driver JVM whose
        # children would otherwise outlive a plain child kill)
        submit = subprocess.Popen(
            [
                os.path.join(SPARK_HOME, "bin", "spark-submit"),
                "--master", MASTER_URL,
                "--deploy-mode", "client",
                "--driver-memory", "16g",
                "--executor-memory", "8g",
                "--conf", "spark.executor.cores=1",
                "--conf", f"spark.cores.max={level}",
                *conf_flags,
                "--py-files", os.path.join("/tmp", "tbner.zip"),
                payload_path,
            ],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=submit_env, cwd=REPO, start_new_session=True,
        )
        procs.append(submit)
        try:
            stdout, stderr = submit.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            # a hung rep must not crash the harness (bench.py main_scaling
            # learned this in r4) — kill the whole app process group HERE
            # and reap it, so the driver JVM and its children are gone
            # before the next level's cluster starts (ADVICE r6)
            sys.stderr.write(
                f"cluster level={level}: timed out after {timeout}s\n")
            try:
                os.killpg(os.getpgid(submit.pid), signal.SIGKILL)
            except OSError:
                pass
            try:
                submit.wait(timeout=30)
            except subprocess.TimeoutExpired:
                pass
            return None
        for line in (stdout or "").splitlines():
            if line.startswith("CLUSTER_REP "):
                return json.loads(line[len("CLUSTER_REP "):])
        sys.stderr.write(
            f"cluster level={level}: no rep (rc={submit.returncode}); "
            "stderr tail:\n" + "\n".join(
                (stderr or "").splitlines()[-15:]) + "\n")
        return None
    finally:
        for p in procs:
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGTERM)
            except OSError:
                pass
        # reap: un-wait()ed killed children stay zombies with unflushed
        # pipes for the rest of the run (ADVICE r6)
        for p in procs:
            try:
                p.wait(timeout=15)
            except (subprocess.TimeoutExpired, OSError):
                try:
                    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
                    p.wait(timeout=5)
                except (subprocess.TimeoutExpired, OSError):
                    pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4000000)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--levels", default="1,4")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    # ship the package the production way (fresh archive: zip -r would
    # only UPDATE an existing /tmp/tbner.zip, keeping deleted members)
    if os.path.exists("/tmp/tbner.zip"):
        os.unlink("/tmp/tbner.zip")
    subprocess.run(
        ["zip", "-qr", "/tmp/tbner.zip", "thesaurus_based_ner_spark",
         "bench.py"],
        cwd=REPO, check=True,
    )
    ledger = os.path.join(REPO, "BENCH", "cluster_scaling.jsonl")
    os.makedirs(os.path.dirname(ledger), exist_ok=True)
    done: set[tuple[int, int]] = set()
    reps: dict[int, list[dict]] = {lv: [] for lv in levels}
    if os.path.exists(ledger):
        with open(ledger) as f:
            for line in f:
                rec = json.loads(line)
                if rec["docs"] != args.docs or rec["level"] not in levels:
                    continue
                if rec["round"] >= args.rounds:
                    continue
                done.add((rec["round"], rec["level"]))
                reps[rec["level"]].append(rec["rep"])
    # warm-up + timed rep both run at full size inside one app; the
    # timeout scales with input and level (1-core is ~4N slower).
    # Summary + history emission sits in a finally so an interrupted
    # invocation (deadline hit mid-round) still reports whatever pairs
    # its ledger holds — partial evidence beats none.
    try:
        for rnd in range(args.rounds):
            for lv in levels:
                if (rnd, lv) in done:
                    continue
                timeout = max(3600, (args.docs // 400) // lv)
                rep = run_level(lv, args.docs, timeout)
                if rep is None:
                    continue
                reps[lv].append(rep)
                with open(ledger, "a") as f:
                    f.write(json.dumps({
                        "docs": args.docs, "level": lv, "round": rnd,
                        "rep": rep,
                    }) + "\n")
    finally:
        _report(args, levels, reps)


def _report(args, levels, reps) -> None:
    best = {
        lv: min(rs, key=lambda r: r["wall_s"]) for lv, rs in reps.items() if rs
    }
    out = {
        "docs": args.docs,
        "levels": {lv: {
            "best_wall_s": best[lv]["wall_s"],
            "triples_per_sec": best[lv]["triples_per_sec"],
            "all_walls": [r["wall_s"] for r in reps[lv]],
        } for lv in best},
    }
    if len(best) == 2:
        lo, hi = sorted(best)
        out["efficiency"] = round(
            best[hi]["triples_per_sec"] / best[lo]["triples_per_sec"]
            / (hi / lo), 3,
        )
        # shared cross-round ledger (bench.py renders it into the
        # BASELINE.md History section — add, don't replace)
        with open(
            os.path.join(REPO, "BENCH", "scaling_history.jsonl"), "a"
        ) as f:
            f.write(json.dumps({
                "window": time.strftime("%Y-%m-%d %H:%M", time.gmtime()),
                "ts": round(time.time(), 1),
                "harness": "cluster",
                "docs": args.docs,
                "rounds": args.rounds,
                "efficiency": {f"{lo}->{hi}": out["efficiency"]},
                "best_walls": {
                    lv: best[lv]["wall_s"] for lv in best
                },
            }) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
