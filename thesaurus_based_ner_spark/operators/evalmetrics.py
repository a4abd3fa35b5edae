"""Span-level evaluation metrics (SURVEY.md §2 A8/J6/U8).

Reference: NERTestor metric battery (/root/reference/src/ner_model/
evaluator.py): strict seqeval PRF (:597-626), lenient overlap PRF
(:656-712), per-label breakdown. Implemented as joins + aggregations over
exploded span tables — pure SQL, no Python.

Span tables: (doc-id cols..., m_start, m_end, label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def strict_prf(pred: DataFrame, gold: DataFrame, id_cols: list[str]) -> DataFrame:
    """Exact (span ∧ label) match P/R/F1, one row overall.

    ONE action: full-outer join on the span key, then a single aggregate —
    the pred/gold plans are each scanned once (the earlier 3-action form
    recomputed uncached inputs per count).
    """
    keys = id_cols + ["m_start", "m_end", "label"]
    p = pred.groupBy(keys).agg(F.count("*").alias("__np"))
    g = gold.groupBy(keys).agg(F.count("*").alias("__ng"))
    joined = p.join(g, keys, "full")
    agg = joined.agg(
        F.sum(F.coalesce("__np", F.lit(0))).alias("n_pred"),
        F.sum(F.coalesce("__ng", F.lit(0))).alias("n_gold"),
        F.sum(
            F.when(
                F.col("__np").isNotNull() & F.col("__ng").isNotNull(),
                F.least("__np", "__ng"),
            ).otherwise(0)
        ).alias("tp"),
    )
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(0.0)
    rec = F.when(F.col("n_gold") > 0, F.col("tp") / F.col("n_gold")).otherwise(0.0)
    f1 = F.when(
        (prec + rec) > 0, F.lit(2) * prec * rec / (prec + rec)
    ).otherwise(0.0)
    return agg.select(
        F.coalesce("n_pred", F.lit(0)).cast("bigint").alias("n_pred"),
        F.coalesce("n_gold", F.lit(0)).cast("bigint").alias("n_gold"),
        F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def strict_prf_by_label(
    pred: DataFrame, gold: DataFrame, id_cols: list[str]
) -> DataFrame:
    """Per-label strict P/R/F1 (reference per-label breakdown)."""
    keys = id_cols + ["m_start", "m_end", "label"]
    tp = (
        pred.join(gold, keys, "left_semi")
        .groupBy("label")
        .agg(F.count("*").alias("tp"))
    )
    np_ = pred.groupBy("label").agg(F.count("*").alias("n_pred"))
    ng = gold.groupBy("label").agg(F.count("*").alias("n_gold"))
    out = (
        np_.join(ng, "label", "full")
        .join(tp, "label", "left")
        .fillna(0, ["tp", "n_pred", "n_gold"])
    )
    p = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(0.0)
    r = F.when(F.col("n_gold") > 0, F.col("tp") / F.col("n_gold")).otherwise(0.0)
    f1 = F.when((p + r) > 0, 2 * p * r / (p + r)).otherwise(0.0)
    return out.select(
        "label",
        "n_pred",
        "n_gold",
        "tp",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def lenient_prf(pred: DataFrame, gold: DataFrame, id_cols: list[str]) -> DataFrame:
    """Overlap-match PRF (evaluator.py:656-712): a predicted span counts as
    correct if it overlaps any gold span with the same label."""
    p = pred.alias("p")
    g = gold.alias("g")
    on = [F.col(f"p.{c}") == F.col(f"g.{c}") for c in id_cols]
    overlap = (
        (F.col("p.m_start") < F.col("g.m_end"))
        & (F.col("g.m_start") < F.col("p.m_end"))
        & (F.col("p.label") == F.col("g.label"))
    )
    cond = overlap
    for c in on:
        cond = cond & c
    # ONE action: full-outer join (equi keys: id_cols + label, plus the
    # range condition) then distinct counts of each side's span key —
    # each input plan is evaluated once.
    pkey = F.struct(
        *[F.col(f"p.{c}") for c in id_cols],
        F.col("p.m_start"), F.col("p.m_end"), F.col("p.label"),
    )
    gkey = F.struct(
        *[F.col(f"g.{c}") for c in id_cols],
        F.col("g.m_start"), F.col("g.m_end"), F.col("g.label"),
    )
    both = F.col("p.m_start").isNotNull() & F.col("g.m_start").isNotNull()
    agg = p.join(g, cond, "full").agg(
        F.countDistinct(pkey).alias("n_pred"),
        F.countDistinct(gkey).alias("n_gold"),
        F.countDistinct(F.when(both, pkey)).alias("pred_overlapped"),
        F.countDistinct(F.when(both, gkey)).alias("gold_overlapped"),
    )
    prec = F.when(
        F.col("n_pred") > 0, F.col("pred_overlapped") / F.col("n_pred")
    ).otherwise(0.0)
    rec = F.when(
        F.col("n_gold") > 0, F.col("gold_overlapped") / F.col("n_gold")
    ).otherwise(0.0)
    f1 = F.when((prec + rec) > 0, F.lit(2) * prec * rec / (prec + rec)).otherwise(0.0)
    return agg.select(
        F.col("n_pred").cast("bigint").alias("n_pred"),
        F.col("n_gold").cast("bigint").alias("n_gold"),
        F.col("pred_overlapped").cast("bigint").alias("pred_overlapped"),
        F.col("gold_overlapped").cast("bigint").alias("gold_overlapped"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
