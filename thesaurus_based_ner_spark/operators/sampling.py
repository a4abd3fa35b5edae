"""Sampling / shuffling operators (SURVEY.md §2.9 P1-P6).

Reference: O-span undersampling (data_translator.py:64-88), label-balanced
undersampling (:205-284), seeded shuffle + take-N (gold_dataset.py:301-306),
90/10 split (:400-415), random sharding (utils.py:554-563). All seeded and
reproducible; Spark-side they are sampleBy / randomSplit / rand(seed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def undersample_label(
    df: DataFrame, label_col: str, target_label: str, ratio: float, seed: int
) -> DataFrame:
    """Keep all rows except target_label, which is sampled at `ratio`
    (P1: O-span undersampling)."""
    fractions = {target_label: ratio}
    kept_target = df.sampleBy(label_col, fractions, seed)
    others = df.filter(F.col(label_col) != target_label)
    return others.unionByName(kept_target.filter(F.col(label_col) == target_label))


def balance_labels(df: DataFrame, label_col: str, seed: int) -> DataFrame:
    """Downsample every label to the minority-label count in expectation
    (P2: label balancing via per-label fractions from an A7 min agg)."""
    counts = {r[0]: r[1] for r in df.groupBy(label_col).count().collect()}
    if not counts:  # empty input: nothing to balance
        return df
    m = min(counts.values())
    fractions = {k: min(1.0, m / v) for k, v in counts.items()}
    return df.sampleBy(label_col, fractions, seed)


def seeded_take(df: DataFrame, n: int, seed: int, order_cols: list[str]) -> DataFrame:
    """Deterministic pseudo-random take-N (P3): stable hash order, not
    rand() (rand is partition-dependent; xxhash64 of key cols is not)."""
    return (
        df.withColumn("__r", F.xxhash64(*order_cols, F.lit(seed)))
        # tie-break on the key columns: identical order_cols values hash
        # identically, and a limit boundary inside a tie group would
        # otherwise pick an arbitrary member per partitioning
        .orderBy("__r", *order_cols)
        .limit(n)
        .drop("__r")
    )


def seeded_split(
    df: DataFrame, weights: list[float], seed: int, key_cols: list[str]
) -> list[DataFrame]:
    """Deterministic train/validation split (P4) by key hash — unlike
    randomSplit, assignment is a pure function of the row key, so it is
    stable under repartitioning and resumable reruns."""
    total = sum(weights)
    bounds = []
    acc = 0.0
    for w in weights:
        acc += w / total
        bounds.append(acc)
    bucket = (F.pmod(F.xxhash64(*key_cols, F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0)
    out = []
    lo = 0.0
    for hi in bounds:
        out.append(df.filter((bucket >= lo) & (bucket < hi)))
        lo = hi
    return out


def shard(df: DataFrame, k: int, seed: int, key_cols: list[str]) -> DataFrame:
    """Assign a deterministic shard id 0..k-1 (P6)."""
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(*key_cols, F.lit(seed)), F.lit(k)).cast("int")
    )


def few_shot_sample(
    spans: DataFrame, id_cols: list[str], sample_num: int
) -> DataFrame:
    """P5: greedy few-shot sentence selection (reference
    few_sample_from_dataset, dataset/few_shot_sample.py:6-40): repeatedly
    take the sentence with the most entity spans whose per-label counts
    still fit within the remaining per-label budget (sample_num each),
    ties broken by sentence key order (the reference's stable argsort).

    spans: (ids..., label) one row per gold entity. The per-sentence count
    matrix is aggregated distributedly, but the greedy walk itself runs on
    the driver — few-shot selection is inherently sequential and the input
    is a gold corpus (dim-sized by definition; guarded by a row cap).
    Returns the selected sentence keys.
    """
    per_snt = (
        spans.groupBy(*id_cols)
        .pivot("label")
        .count()
        .fillna(0)
    )
    # Guard BEFORE collecting: count() is one tiny extra job on the
    # dim-sized aggregate, while collect()-then-check would OOM the driver
    # on an unexpectedly large input before the cap could fire.
    n_sentences = per_snt.count()
    if n_sentences > 200_000:
        raise ValueError(
            "few_shot_sample collects per-sentence label counts; "
            f"{n_sentences} sentences is beyond gold-corpus scale"
        )
    rows = per_snt.collect()
    labels = [c for c in per_snt.columns if c not in id_cols]
    remaining = {l: sample_num for l in labels}
    # stable order: total spans desc, then sentence key asc
    cand = sorted(
        rows,
        key=lambda r: (-sum(r[l] for l in labels), tuple(r[c] for c in id_cols)),
    )
    picked = []
    chosen = [True] * len(cand)
    progress = True
    while progress and any(v > 0 for v in remaining.values()):
        progress = False
        for i, r in enumerate(cand):
            if not chosen[i]:
                continue
            counts = {l: r[l] for l in labels}
            if sum(counts.values()) == 0:
                chosen[i] = False
                continue
            if all(counts[l] <= remaining[l] for l in labels):
                picked.append(tuple(r[c] for c in id_cols))
                chosen[i] = False
                for l in labels:
                    remaining[l] -= counts[l]
                progress = True
                break
    spark = spans.sparkSession
    if not picked:
        return spans.select(*id_cols).limit(0)
    from thesaurus_based_ner_spark.sources.webtext import lit as _sql_lit

    body = ", ".join(
        "(" + ", ".join(_sql_lit(v) for v in key) + ")" for key in picked
    )
    return spark.sql(
        f"SELECT * FROM VALUES {body} AS t({', '.join(id_cols)})"
    )
