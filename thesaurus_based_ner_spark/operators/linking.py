"""Entity linking (SURVEY.md §2 J9/A2/W2/A3/W4).

Reference shape (/root/reference/src/kb_loader/db_pedia.py):
- anchor_text(entity, surface) counts       → A2 groupBy counts (:175-181)
- top-20 candidate entities per surface     → W2 window top-k (:200-224),
  done as ONE window pass instead of the reference's per-label point queries
- weighted category scores per surface      → A3 (:265-278)
- argmax with tie-skip                      → W4 (term2cat.py:135-163)

Skew: head surfaces ("USA") concentrate anchor counts; the candidate table
is tiny after top-k so the mention join is a broadcast — the skew never
reaches a shuffle. When the candidate table exceeds broadcast size at true
web scale, salt the mention side on hot surfaces (see
plans/queries.salted_segment_revenue for the pattern) + AQE skew join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def candidate_table(anchor: DataFrame, top_k: int = 20) -> DataFrame:
    """(surface, entity, anchor_count, rank) — top-k entities per surface."""
    counts = anchor.groupBy("surface", "entity").agg(
        F.count("*").alias("anchor_count")
    )
    w = Window.partitionBy("surface").orderBy(
        F.col("anchor_count").desc(), F.col("entity").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


def link_mentions(mentions: DataFrame, candidates: DataFrame) -> DataFrame:
    """Attach the argmax-scored candidate entity per mention (tie-skip).

    Surfaces are compared lowercased. Tie-skip mirrors W4: if two candidates
    share the max anchor_count the mention stays unlinked (entity NULL) —
    reference term2cat.py:135-163 skips ambiguous weighted ties.
    """
    # lowercasing can merge two casings of one surface: counts for the
    # SAME entity must be summed (else one entity reached via 'USA' and
    # 'usa' looks like a 2-way tie with itself and the mention is
    # wrongly left unlinked), and rival entities rank on combined counts
    cand = (
        candidates.select(
            F.lower("surface").alias("__surf"), "entity", "anchor_count"
        )
        .groupBy("__surf", "entity")
        .agg(F.sum("anchor_count").alias("anchor_count"))
    )
    # per surface: best entity, count of candidates at the max score
    w = Window.partitionBy("__surf")
    best = (
        cand.withColumn("__max", F.max("anchor_count").over(w))
        .filter(F.col("anchor_count") == F.col("__max"))
        .groupBy("__surf")
        .agg(
            F.min("entity").alias("__ent"),
            F.count("*").alias("__n_ties"),
            F.max("anchor_count").alias("link_score"),
        )
        .select(
            "__surf",
            F.when(F.col("__n_ties") == 1, F.col("__ent")).alias("entity"),
            F.when(F.col("__n_ties") == 1, F.col("link_score")).alias("link_score"),
        )
    )
    return mentions.join(
        F.broadcast(best), F.lower(mentions["surface"]) == best["__surf"], "left"
    ).drop("__surf")
