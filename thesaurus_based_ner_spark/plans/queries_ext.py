"""Round-2 query registry extension: gold-corpus ingestion, offset
translation, negative-category derivation, the evaluator battery,
multi-label datasets and hierarchy selection — each as a (spark, sf_dir) →
DataFrame callable with a DuckDB oracle, registered into the same
QUERIES/ORACLES maps as plans.queries.

Fixture conventions: the documents table is lowercase word-soup, so
deterministic span rules are token-LENGTH runs (runs of tokens with
length ≥ K), not capitalization; hierarchy fixtures are the ontology dim
(sources/webtext.ONTOLOGY_EDGES) embedded as VALUES on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from thesaurus_based_ner_spark.operators import (
    chunking,
    evalmetrics,
    gold,
    graph,
    pseudo,
    sampling,
)
from thesaurus_based_ner_spark.operators import thesaurus as th_ops
from thesaurus_based_ner_spark.operators.mentions import tokenize_df
from thesaurus_based_ner_spark.plans.queries import _SQL_TOKEN_RE, T, q, spread
from thesaurus_based_ner_spark.sources.webtext import ONTOLOGY_EDGES

# ---------------------------------------------------------------------------
# shared helpers: token-length run spans over the documents table
# ---------------------------------------------------------------------------


def _doc_tokens(spark, sf_dir) -> DataFrame:
    docs = spread(T(spark, sf_dir, "documents").select("doc_id", "text"))
    return tokenize_df(docs, "text").select("doc_id", "tokens")


def _run_spans(toks: DataFrame, mask) -> DataFrame:
    """Maximal runs of tokens where mask(tok) holds:
    (doc_id, m_start, m_end) — same island SQL shape as the oracles."""
    pos = toks.select(
        "doc_id", F.posexplode("tokens").alias("pos", "tok")
    ).withColumn("ok", mask)
    w = Window.partitionBy("doc_id").orderBy("pos")
    grp = F.sum(
        F.when(
            ~F.coalesce(F.lag("ok").over(w), F.lit(False)) | ~F.col("ok"), 1
        ).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        pos.withColumn("grp", grp)
        .filter("ok")
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("bigint").alias("m_start"),
            (F.max("pos") + 1).cast("bigint").alias("m_end"),
        )
        .drop("grp")
    )


def _run_sql(mask_sql: str) -> str:
    """DuckDB CTE producing runs(doc_id, m_start, m_end) for a token mask."""
    return f"""
    docs AS (
      SELECT doc_id, regexp_extract_all(text, '{_SQL_TOKEN_RE}') AS toks
      FROM documents
    ),
    pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS p FROM docs),
    marked AS (SELECT doc_id, p, toks[p] AS tok, {mask_sql} AS ok FROM pos),
    lagged AS (
      SELECT *, COALESCE(LAG(ok) OVER (PARTITION BY doc_id ORDER BY p), false)
             AS prev_ok FROM marked
    ),
    grouped AS (
      SELECT *, SUM(CASE WHEN (NOT prev_ok) OR (NOT ok) THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS grp
      FROM lagged
    ),
    runs AS (
      SELECT doc_id, CAST(MIN(p) - 1 AS BIGINT) AS m_start,
             CAST(MAX(p) AS BIGINT) AS m_end
      FROM grouped WHERE ok GROUP BY doc_id, grp
    )
    """


# lazy masks: Column construction needs an active session in classic mode
def _GOLD_MASK_SPARK():
    return F.length("tok") >= 5


_GOLD_MASK_SQL = "len(toks[p]) >= 5"


def _PRED_MASK_SPARK():
    return F.length("tok") >= 6


_PRED_MASK_SQL = "len(toks[p]) >= 6"


def _NC_MASK_SPARK():
    return F.col("tok").rlike("[aeiou]$")


_NC_MASK_SQL = "regexp_matches(toks[p], '[aeiou]$')"

_RUN_LABEL_SQL = "CASE WHEN m_end - m_start >= 2 THEN 'MULTI' ELSE 'SINGLE' END"


def _labeled_runs(toks: DataFrame, mask) -> DataFrame:
    runs = _run_spans(toks, mask)
    return runs.withColumn(
        "label",
        F.when(F.col("m_end") - F.col("m_start") >= 2, "MULTI").otherwise(
            "SINGLE"
        ),
    )


def _gold_spans(spark, sf_dir) -> DataFrame:
    return _labeled_runs(_doc_tokens(spark, sf_dir), _GOLD_MASK_SPARK())


def _pred_spans(spark, sf_dir) -> DataFrame:
    return _labeled_runs(_doc_tokens(spark, sf_dir), _PRED_MASK_SPARK())


_GOLD_CTE = "WITH " + _run_sql(_GOLD_MASK_SQL) + f""",
    gold AS (SELECT doc_id, m_start, m_end, {_RUN_LABEL_SQL} AS label FROM runs)
"""

# gold + pred in one statement needs distinct CTE names
def _dual_cte() -> str:
    g = _run_sql(_GOLD_MASK_SQL)
    p = (
        _run_sql(_PRED_MASK_SQL)
        .replace("docs AS", "docs2 AS")
        .replace("pos AS", "pos2 AS")
        .replace("marked AS", "marked2 AS")
        .replace("lagged AS", "lagged2 AS")
        .replace("grouped AS", "grouped2 AS")
        .replace("runs AS", "runs2 AS")
        .replace("FROM docs", "FROM docs2")
        .replace("FROM pos", "FROM pos2")
        .replace("FROM marked", "FROM marked2")
        .replace("FROM lagged", "FROM lagged2")
        .replace("FROM grouped", "FROM grouped2")
    )
    return f"""WITH {g},
    gold AS (SELECT doc_id, m_start, m_end, {_RUN_LABEL_SQL} AS label FROM runs),
    {p},
    pred AS (SELECT doc_id, m_start, m_end, {_RUN_LABEL_SQL} AS label FROM runs2)
    """


# ---------------------------------------------------------------------------
# S8: CoNLL2003 round trip — construct format-faithful blocks from the
# documents table, run the real parser + BIO decode
# ---------------------------------------------------------------------------

@q(
    "gold_conll_spans",
    oracle=_GOLD_CTE + "SELECT doc_id, m_start, m_end, 'TERM' AS label FROM gold",
)
def gold_conll_spans(spark, sf_dir):
    toks = _doc_tokens(spark, sf_dir)
    pos = toks.select(
        "doc_id", F.posexplode("tokens").alias("pos", "tok")
    ).withColumn("ok", _GOLD_MASK_SPARK())
    w = Window.partitionBy("doc_id").orderBy("pos")
    tag = (
        F.when(~F.col("ok"), F.lit("O"))
        .when(
            F.coalesce(F.lag("ok").over(w), F.lit(False)), F.lit("I-TERM")
        )
        .otherwise(F.lit("B-TERM"))
    )
    lines = pos.withColumn(
        "line", F.concat_ws(" ", "tok", F.lit("NNP"), F.lit("I-NP"), tag)
    )
    blocks = lines.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("block")
    )
    parsed = gold.parse_conll_blocks(
        blocks, block_col="block", id_col="doc_id", drop_docstart=False
    )
    return gold.bio_decode_spans(parsed, ["doc_id"]).select(
        "doc_id", "m_start", "m_end", "label"
    )


# ---------------------------------------------------------------------------
# S7 + X9: PubTator round trip — build pmid|t|…/pmid|a|… blocks with char
# spans over tokens 3..5, parse, re-tokenize, translate char → token
# ---------------------------------------------------------------------------

@q(
    "gold_pubtator_spans",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, regexp_extract_all(text, '{_SQL_TOKEN_RE}') AS toks
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(3 AS BIGINT) AS m_start,
           CAST(5 AS BIGINT) AS m_end, 'DOC' AS label,
           array_to_string(toks[4:5], ' ') AS surface
    FROM docs WHERE len(toks) >= 5
    """,
)
def gold_pubtator_spans(spark, sf_dir):
    toks = _doc_tokens(spark, sf_dir).filter(F.size("tokens") >= 5)
    title = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))
    abstract = F.array_join("tokens", " ")
    c_start = (
        F.length(F.array_join(F.slice("tokens", 1, 3), " ")) + 1
    ).cast("bigint")
    name = F.array_join(F.slice("tokens", 4, 2), " ")
    c_end = c_start + F.length(name)
    shift = F.length(title) + 1
    block = F.concat_ws(
        "\n",
        F.concat(F.col("doc_id").cast("string"), F.lit("|t|"), title),
        F.concat(F.col("doc_id").cast("string"), F.lit("|a|"), abstract),
        F.concat_ws(
            "\t",
            F.col("doc_id").cast("string"),
            (c_start + shift).cast("string"),
            (c_end + shift).cast("string"),
            name,
            F.lit("DOC"),
            F.lit("C00"),
        ),
    )
    blocks = toks.select(block.alias("block"))
    parsed = gold.parse_pubtator_blocks(blocks)
    abst = parsed.filter(
        (F.col("section") == "abstract") & (F.size("spans") > 0)
    )
    char_spans = abst.select(
        "pmid", F.explode("spans").alias("s")
    ).select(
        "pmid",
        F.col("s.c_start").alias("c_start"),
        F.col("s.c_end").alias("c_end"),
        F.col("s.label").alias("label"),
        F.col("s.name").alias("surface"),
    )
    tokenized = tokenize_df(
        abst.select("pmid", F.col("text")), "text"
    ).select("pmid", "tokens")
    out = gold.translate_char_spans(char_spans, tokenized, ["pmid"])
    return out.select(
        F.col("pmid").cast("bigint").alias("doc_id"),
        "m_start",
        "m_end",
        "label",
        "surface",
    )


# ---------------------------------------------------------------------------
# SO1: negative-category derivation over the ontology dim
# ---------------------------------------------------------------------------

_EDGES_SQL = ", ".join(f"('{c}', '{p}')" for c, p in ONTOLOGY_EDGES)


def _edges_df(spark: SparkSession) -> DataFrame:
    from thesaurus_based_ner_spark.sources.webtext import synth_ontology_edges

    return synth_ontology_edges(spark)


@q(
    "negative_cats",
    oracle=f"""
    WITH RECURSIVE edges(child, parent) AS (VALUES {_EDGES_SQL}),
    focus(cat) AS (VALUES ('City'), ('Country')),
    asc_all(cat) AS (
      SELECT cat FROM focus
      UNION
      SELECT e.parent FROM asc_all a JOIN edges e ON e.child = a.cat
    ),
    ascendants AS (SELECT cat FROM asc_all WHERE cat NOT IN (SELECT cat FROM focus)),
    cands AS (
      SELECT DISTINCT e.child AS cat FROM edges e
      WHERE e.parent IN (SELECT cat FROM ascendants)
    )
    SELECT cat FROM cands
    WHERE cat NOT IN (SELECT cat FROM ascendants)
      AND cat NOT IN (SELECT cat FROM focus)
    """,
)
def negative_cats(spark, sf_dir):
    return th_ops.umls_negative_cats(_edges_df(spark), ["City", "Country"])


@q(
    "negative_cats_toplevel",
    oracle=f"""
    WITH RECURSIVE edges(child, parent) AS (VALUES {_EDGES_SQL}),
    pos(cat) AS (VALUES ('City'), ('Organization')),
    closure(node, ancestor) AS (
      SELECT child, parent FROM edges
      UNION
      SELECT c.node, e.parent FROM closure c JOIN edges e ON e.child = c.ancestor
    ),
    closure_self AS (
      SELECT node, ancestor FROM closure
      UNION
      SELECT n, n FROM (SELECT child AS n FROM edges UNION SELECT parent FROM edges)
    ),
    has_pos AS (
      SELECT DISTINCT ancestor AS n FROM closure_self
      WHERE node IN (SELECT cat FROM pos)
    ),
    nodes AS (SELECT child AS n FROM edges UNION SELECT parent FROM edges),
    negative AS (SELECT n FROM nodes WHERE n NOT IN (SELECT n FROM has_pos)),
    blocked AS (
      SELECT DISTINCT c.node AS n FROM closure c
      WHERE c.ancestor IN (SELECT n FROM negative)
         OR c.ancestor IN (SELECT cat FROM pos)
    )
    SELECT DISTINCT n AS cat FROM negative WHERE n NOT IN (SELECT n FROM blocked)
    """,
)
def negative_cats_toplevel(spark, sf_dir):
    return th_ops.negative_cats_from_positive(
        _edges_df(spark), ["City", "Organization"]
    )


# ---------------------------------------------------------------------------
# G2: transitive reduction — ontology edges + redundant shortcuts
# ---------------------------------------------------------------------------

_SHORTCUTS = [("City", "Entity"), ("Chemical", "Entity"), ("BioProcess", "Entity")]
_EDGES_PLUS_SQL = ", ".join(
    f"('{c}', '{p}')" for c, p in ONTOLOGY_EDGES + _SHORTCUTS
)


@q(
    "transitive_reduction",
    oracle=f"""
    WITH RECURSIVE edges(child, parent) AS (VALUES {_EDGES_PLUS_SQL}),
    e AS (SELECT DISTINCT child, parent FROM edges),
    closure(node, ancestor) AS (
      SELECT child, parent FROM e
      UNION
      SELECT c.node, x.parent FROM closure c JOIN e x ON x.child = c.ancestor
    ),
    redundant AS (
      SELECT DISTINCT e1.child, c.ancestor AS parent
      FROM e e1 JOIN closure c ON c.node = e1.parent
    )
    SELECT e.child, e.parent FROM e
    LEFT JOIN redundant r ON e.child = r.child AND e.parent = r.parent
    WHERE r.child IS NULL
    """,
)
def transitive_reduction(spark, sf_dir):
    rows = ", ".join(f"('{c}', '{p}')" for c, p in ONTOLOGY_EDGES + _SHORTCUTS)
    edges = spark.sql(f"SELECT * FROM VALUES {rows} AS t(child, parent)")
    return graph.transitive_reduction(edges)
