"""Round-4 query registry extension (VERDICT r3 'Next' #7/#8):

- span_markup_diff: the ASCII bracket-markup rendering of the over/under
  span diff (reference src/error_analysis/compare.py:105-120 renders each
  diff span in a tokens[max(0,s-5):e+6] context window) — closes the last
  error-analysis presentation gap.
- genia_descendant_cats: GENIA-style UMLS descendant-closure term lookup
  (reference src/dataset/term2cat/genia.py:46-94: BFS over MRREL CHD
  edges from a root CUI, then MRCONSO terms of the reachable set with a
  source-vocabulary exclusion) — closes the last KB-loader family.

Fixture convention matches queries_r3: everything derives
deterministically from the testdata parquet tables; oracles are DuckDB
SQL over the same tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thesaurus_based_ner_spark.plans.queries import T, q


def _register_span_markup():
    from thesaurus_based_ner_spark.operators.evalmetrics import (
        dataset_span_diff,
        span_markup,
    )
    from thesaurus_based_ner_spark.plans.queries_ext import (
        _doc_tokens,
        _dual_cte,
        _span_diff_frames,
    )

    # same diff CTEs as dataset_span_diff, then join tokens back and build
    # the exact bracket string: lctx [direction:label span ] rctx with a
    # ±5/+6-token context window (compare.py:107-108 stt=max(0,s-5),
    # ed=e+6)
    oracle = _dual_cte() + """
    , shared AS (
      SELECT DISTINCT g.doc_id FROM gold g JOIN pred p USING (doc_id)
    ),
    over_s AS (
      SELECT p.doc_id, p.m_start, p.m_end, p.label, 'over' AS direction
      FROM pred p JOIN shared USING (doc_id)
      WHERE NOT EXISTS (
        SELECT 1 FROM gold g WHERE g.doc_id = p.doc_id
          AND g.m_start = p.m_start AND g.m_end = p.m_end
          AND g.label = p.label)
    ),
    under_s AS (
      SELECT g.doc_id, g.m_start, g.m_end, g.label, 'under' AS direction
      FROM gold g JOIN shared USING (doc_id)
      WHERE NOT EXISTS (
        SELECT 1 FROM pred p WHERE p.doc_id = g.doc_id
          AND p.m_start = g.m_start AND p.m_end = g.m_end
          AND p.label = g.label)
    ),
    diff AS (SELECT * FROM over_s UNION ALL SELECT * FROM under_s)
    SELECT d.doc_id, d.m_start, d.m_end, d.label, d.direction,
           CONCAT_WS(' ',
             NULLIF(array_to_string(
               list_slice(toks, GREATEST(0, d.m_start - 5) + 1, d.m_start),
               ' '), ''),
             '[' || d.direction || ':' || d.label,
             array_to_string(
               list_slice(toks, d.m_start + 1, d.m_end), ' '),
             ']',
             NULLIF(array_to_string(
               list_slice(toks, d.m_end + 1,
                          LEAST(len(toks), d.m_end + 6)),
               ' '), '')
           ) AS markup
    FROM diff d JOIN docs USING (doc_id)
    """

    @q("span_markup_diff", oracle=oracle)
    def span_markup_diff(spark, sf_dir):
        """Bracket-markup rendering of every over/under diff span in its
        sentence context — reuses the single-pass checkpointed run frame,
        adds one doc-keyed join to the token frame, and builds the string
        with pure codegen array/string expressions (no UDF)."""
        gold, pred = _span_diff_frames(spark, sf_dir)
        diff = dataset_span_diff(gold, pred, ["doc_id"])
        return span_markup(diff, _doc_tokens(spark, sf_dir), ["doc_id"])


_register_span_markup()


# ---------------------------------------------------------------------------
# GENIA-style descendant-closure term2cat (genia.py:46-94)
# ---------------------------------------------------------------------------
#
# Fixture CUI forest over part: CHD edge C(k DIV 7) → C(k) whenever
# k DIV 7 ≥ 1 (partkeys are contiguous from 1, so the parent always
# exists). Root C1 reaches k ∈ {7..13}, {49..97}, {343..685}, ... — depth
# grows with sf, so the BFS is exercised for ≥3 rounds at sf0.01+.
# MRCONSO-shape: (cui=C<partkey>, term=p_name, sab=p_brand); the
# reference's source-vocabulary exclusion list (sab NOT IN (...),
# genia.py:76-82) maps to excluding one brand. Output = DISTINCT terms of
# the reachable set (cuis2terms dedupes across CUIs, genia.py:85-94).

@q(
    "genia_descendant_cats",
    oracle="""
    WITH RECURSIVE des(k) AS (
      SELECT 1
      UNION
      SELECT p.p_partkey FROM part p JOIN des d ON p.p_partkey // 7 = d.k
      WHERE p.p_partkey // 7 >= 1
    )
    SELECT DISTINCT p.p_name AS term
    FROM part p JOIN des d ON p.p_partkey = d.k
    WHERE p.p_brand <> 'Brand#11'
    """,
)
def genia_descendant_cats(spark, sf_dir):
    """Descendant-closure term lookup: BFS over synthesized CHD edges from
    root C1 (descendants_bfs — frontier joins, no all-pairs closure), then
    the MRCONSO term join with the source-vocab exclusion filter."""
    from thesaurus_based_ner_spark.operators.graph import descendants_bfs

    p = T(spark, sf_dir, "part")
    edges = (
        p.select(
            F.concat(F.lit("C"), F.expr("p_partkey DIV 7")).alias("cui1"),
            F.concat(F.lit("C"), "p_partkey").alias("cui2"),
        )
        .filter(F.expr("p_partkey DIV 7") >= 1)
    )
    roots = spark.sql("SELECT 'C1' AS node")
    reach = descendants_bfs(edges, roots, "cui1", "cui2")
    conso = p.select(
        F.concat(F.lit("C"), "p_partkey").alias("cui"),
        F.col("p_name").alias("term"),
        F.col("p_brand").alias("sab"),
    )
    return (
        conso.join(reach, conso["cui"] == reach["node"], "left_semi")
        .filter(F.col("sab") != "Brand#11")
        .select("term")
        .distinct()
    )
