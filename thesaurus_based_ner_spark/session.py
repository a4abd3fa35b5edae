"""SparkSession factory tuned for this engine.

Local mode is a proxy for a multi-executor cluster: every config here is
chosen to also be correct at 1000 executors (AQE, skew-join handling,
Arrow batching). ``cpus`` is parameterized so the scaling benchmark can run
the same job at N and 4N parallelism (BASELINE.md protocol).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 64


def get_spark(
    app_name: str = "thesaurus_based_ner_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cpus=None → local[*]. On a real cluster this builder is bypassed by
    spark-submit; everything it sets is also safe as --conf flags.
    """
    if cpus is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        cpus = int(cpus_env) if cpus_env else 0
    # local[N,4]: allow 4 task attempts like a real cluster
    # (spark.task.maxFailures default). Local mode's default of 1 turns a
    # single sandbox-killed python worker into a whole-job failure; on a
    # 1000-executor cluster task retry is the normal recovery path and the
    # engine's operators are deterministic under re-execution.
    master = f"local[{cpus},4]" if cpus and cpus > 0 else "local[*,4]"
    if shuffle_partitions is None:
        shuffle_partitions = max(DEFAULT_SHUFFLE_PARTITIONS, (cpus or 32) * 2)
    # See the two-tier timeout policy comment below; "0" disables the kill.
    idle_s = os.environ.get("SPARK_GRAFT_WORKER_IDLE_S", "1800")
    kill_on_idle = idle_s != "0"
    if not kill_on_idle:
        idle_s = "1800"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime coalescing, skew-join splitting, dynamic join strategy.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE re-plan below .cache() boundaries (default false pins the
        # pre-AQE partitioning — 200 tiny window tasks on small data)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas UDF / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Deterministic timestamps vs DuckDB oracles.
        .config("spark.sql.session.timeZone", "UTC")
        # Local mode: driver is the only JVM.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Self-healing python workers: this sandbox sporadically kills
        # python worker processes with no OOM record (observed rounds
        # 4/6/7; round-7 jstack: task thread wedged forever in
        # ArrowStreamReader.loadNextBatch after 3 of 4 workers vanished
        # and the stdout-writer thread died). With an idle-kill the JVM
        # terminates the unresponsive worker, the read fails with real
        # diagnostics, and the task retries — the same recovery a cluster
        # relies on for executor loss.
        #
        # TWO-TIER TIMEOUT POLICY (SCALE.md "Round-7 resilience";
        # tests/test_session_contracts.py pins both values):
        # - LIBRARY default (here): 1800s — the job profile of an
        #   arbitrary caller is unknown, so the margin is ~100x the
        #   engine's worst observed per-batch worker stall. A legitimately
        #   long single batch (e.g. a heavily skewed applyInPandas
        #   partition at large inputs) that idles the worker socket for
        #   >30 min is the caller's cue to SALT the key or set
        #   SPARK_GRAFT_WORKER_IDLE_S (0 disables the kill entirely,
        #   leaving faulthandler + task retry as the recovery path).
        # - BENCH/scaling sessions: bench.bench_idle_timeout_s(docs) —
        #   600s floor scaled with input size, capped at this 1800s —
        #   because the bench job profile is known (heaviest batch is
        #   seconds at 100k docs) and a wedged scaling rep should
        #   self-heal in minutes, not at the 3.7h subprocess cap.
        .config("spark.python.worker.idleTimeoutSeconds", idle_s)
        .config(
            "spark.python.worker.killOnIdleTimeout",
            "true" if kill_on_idle else "false",
        )
        # ContextCleaner only reclaims dropped localCheckpoint / broadcast
        # blocks when a driver GC collects their weak refs, and its
        # fallback periodic GC defaults to 30 MIN — so a long multi-query
        # session (the bench runs ~80 queries, many of which checkpoint
        # multi-GB intermediates at sf1.0) accumulates dead storage blocks
        # for half an hour, and later queries run under escalating heap
        # pressure (r8 verdict: vector-family walls 2-3x their fresh-JVM
        # times in-session). A 2-minute periodic GC bounds that
        # accumulation; on a cluster the same trigger frees executor
        # blocks, so the setting is scale-neutral (guide §5).
        .config("spark.cleaner.periodicGC.interval", "2min")
        # Spark 4.1.2: RemoveRedundantAliases emits invalid plans (and
        # checkpoint/cache canonicalization NoSuchElementExceptions) on
        # iterative self-join graphs over checkpointed frames; excluding it
        # costs only a few surviving no-op projections.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.RemoveRedundantAliases",
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
