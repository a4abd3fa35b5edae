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
    """Exact (span ∧ label) match P/R/F1, one row overall."""
    keys = id_cols + ["m_start", "m_end", "label"]
    tp = pred.join(gold, keys, "left_semi").count()
    n_pred = pred.count()
    n_gold = gold.count()
    p = tp / n_pred if n_pred else 0.0
    r = tp / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    spark = pred.sparkSession
    return spark.createDataFrame(
        [(n_pred, n_gold, tp, round(p, 6), round(r, 6), round(f1, 6))],
        "n_pred bigint, n_gold bigint, tp bigint, precision double, recall double, f1 double",
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
    pred_hit = p.join(g, cond, "left_semi").count()
    gold_hit = g.join(p, cond, "left_semi").count()
    n_pred = pred.count()
    n_gold = gold.count()
    prec = pred_hit / n_pred if n_pred else 0.0
    rec = gold_hit / n_gold if n_gold else 0.0
    f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
    spark = pred.sparkSession
    return spark.createDataFrame(
        [(n_pred, n_gold, pred_hit, gold_hit, round(prec, 6), round(rec, 6), round(f1, 6))],
        "n_pred bigint, n_gold bigint, pred_overlapped bigint, gold_overlapped bigint, "
        "precision double, recall double, f1 double",
    )
