"""Gold-corpus ingestion + offset translation (SURVEY.md §2 S7/S8/X9/J8).

Reference parity:
- CoNLL2003 block parser      ← /root/reference/src/dataset/gold_dataset.py:446-480
  (file → blank-line blocks → "token pos chunk tag" lines, first
  -DOCSTART- block dropped)
- PubTator parser             ← gold_dataset.py:184-224
  ("pmid|t|title" / "pmid|a|abstract" header lines + TSV span lines;
  abstract spans shift by len(title)+1)
- char↔token offset translate ← matcher_model.py:32-58
  (token start/end char offsets over " ".join(tokens); spans whose end
  aligns to a token end are kept, start snapped LEFT to the nearest token
  start — the "right shift" tolerance; everything else dropped)
- tokenize_with_spans         ← gold_dataset.py:87-181 (tokens SPLIT at
  unaligned span boundaries; pandas-UDF path, gold corpora are dim-sized)
- CoNLL2003 category mapper   ← utils.py (dataset/utils.py:21-43)

File reads use spark.read.text with lineSep='\\n\\n' — one row per block,
fully distributed (a 10^12-line gold corpus would scan in parallel); all
block/line parsing is JVM-side SQL. BIO decode mirrors seqeval
get_entities (start at B-, or at I- whose predecessor has a different
label), expressed as the usual island-detection window so a DuckDB oracle
can run the identical SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


# --- CoNLL2003 (S8) ---------------------------------------------------------

def read_conll_file(spark: SparkSession, path: str) -> DataFrame:
    """One row per sentence block: (block_id, block).

    block_id is unique (partition-encoded), NOT sequential — a global
    row_number would serialize the scan through one window partition.
    """
    blocks = spark.read.option("lineSep", "\n\n").text(path)
    return blocks.select(
        F.monotonically_increasing_id().alias("block_id"),
        F.col("value").alias("block"),
    )


def parse_conll_blocks(
    blocks: DataFrame,
    block_col: str = "block",
    id_col: str = "block_id",
    drop_docstart: bool = True,
) -> DataFrame:
    """blocks → (id, tokens array, tags array).

    Reference splits each block on newlines and each line on single
    spaces, token = field 1, tag = field 4 (gold_dataset.py:457-467); the
    leading -DOCSTART- block is dropped.
    """
    # Keep only lines with ≥4 whitespace-separated fields: under Spark 4's
    # default ANSI mode getItem(3) on a shorter line (the common
    # '-DOCSTART- O' variant, truncated lines) throws INVALID_ARRAY_INDEX
    # and aborts the whole scan. Dropping short lines keeps tokens/tags
    # aligned and mirrors the tolerant pubtator parse.
    lines = F.filter(
        F.split(F.col(block_col), "\n"),
        lambda l: F.size(F.split(F.trim(l), r"\s+")) >= 4,
    )
    parsed = blocks.select(
        F.col(id_col),
        F.transform(
            lines, lambda l: F.split(F.trim(l), r"\s+").getItem(0)
        ).alias("tokens"),
        # tag = field 4 per the reference, NOT the last field: a trailing
        # space would make element_at(.., -1) return '' and fabricate an
        # empty-label span downstream
        F.transform(
            lines, lambda l: F.split(F.trim(l), r"\s+").getItem(3)
        ).alias("tags"),
    ).filter(F.size("tokens") > 0)
    if drop_docstart:
        # F.get is NULL (not an error) on empty arrays; NULL != literal
        # drops the row, which is the right outcome for an all-short block
        parsed = parsed.filter(F.get("tokens", 0) != "-DOCSTART-")
    return parsed


def bio_decode_spans(
    tagged: DataFrame, id_cols: list[str], tags_col: str = "tags"
) -> DataFrame:
    """BIO tag arrays → span table (ids..., m_start, m_end, label).

    seqeval get_entities semantics: a span starts at B-X, or at I-X whose
    predecessor carries a different label (or none). Window island
    detection — identical SQL runs on DuckDB for the oracle.
    """
    pos = tagged.select(
        *id_cols, F.posexplode(tags_col).alias("pos", "tag")
    ).withColumn("lab", F.expr("substring(tag, 3)"))
    w = Window.partitionBy(*id_cols).orderBy("pos")
    prev_tag = F.lag("tag").over(w)
    prev_lab = F.lag("lab").over(w)
    starts = F.when(F.col("tag") == "O", F.lit(False)).otherwise(
        F.col("tag").startswith("B-")
        | F.coalesce(prev_tag, F.lit("O")).eqNullSafe(F.lit("O"))
        | (F.coalesce(prev_lab, F.lit("")) != F.col("lab"))
    )
    grp = F.sum(F.when(starts, 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    ent = pos.withColumn("__grp", grp).filter(F.col("tag") != "O")
    return ent.groupBy(*id_cols, "__grp").agg(
        F.min("pos").cast("bigint").alias("m_start"),
        (F.max("pos") + 1).cast("bigint").alias("m_end"),
        F.min("lab").alias("label"),
    ).drop("__grp")


# --- PubTator (S7) ----------------------------------------------------------

def read_pubtator_file(spark: SparkSession, path: str) -> DataFrame:
    """One row per document block: (block)."""
    return spark.read.option("lineSep", "\n\n").text(path).select(
        F.col("value").alias("block")
    )


def parse_pubtator_blocks(blocks: DataFrame, block_col: str = "block") -> DataFrame:
    """blocks → (pmid, section, text, spans array<struct>).

    Reference translate_pubtator_into_conll (gold_dataset.py:184-224):
    line 1 = "pmid|t|title", line 2 = "pmid|a|abstract", remaining lines =
    "pmid\\tstart\\tend\\tname\\tlabel\\tcui". Spans with end ≤ len(title)
    belong to the title; abstract spans shift by -(len(title)+1). Output is
    exploded to one row per (pmid, section) with its char-offset spans.
    """
    lines = F.split(F.col(block_col), "\n")
    # reference slices title[11:] for its fixed 8-char pmids; generalize to
    # pmid_len + len('|t|') so any pmid width parses (titles may contain '|')
    pmid = F.expr("split_part(element_at(__lines, 1), '|', 1)")
    title = F.expr(
        "substring(element_at(__lines, 1),"
        " length(split_part(element_at(__lines, 1), '|', 1)) + 4)"
    )
    # try_element_at: a title-only block (no abstract line — real corpora
    # have them) must parse, not abort the scan under ANSI out-of-bounds
    abstract = F.expr(
        "coalesce(substring(try_element_at(__lines, 2),"
        " length(split_part(try_element_at(__lines, 2), '|', 1)) + 4), '')"
    )
    span_lines = F.expr("slice(__lines, 3, greatest(size(__lines) - 2, 0))")
    # ≥5 tab fields required (pmid, start, end, name, label): under ANSI
    # mode getItem on a shorter/malformed line would abort the scan
    spans = F.transform(
        F.filter(span_lines, lambda l: F.size(F.split(l, "\t")) >= 5),
        lambda l: F.struct(
            F.split(l, "\t").getItem(1).cast("bigint").alias("c_start"),
            F.split(l, "\t").getItem(2).cast("bigint").alias("c_end"),
            F.split(l, "\t").getItem(3).alias("name"),
            F.split(l, "\t").getItem(4).alias("label"),
        ),
    )
    base = blocks.select(
        F.col(block_col).alias("__b"), lines.alias("__lines")
    ).select(
        pmid.alias("pmid"),
        title.alias("__title"),
        abstract.alias("__abstract"),
        spans.alias("__spans"),
    )
    tlen = F.length("__title")
    title_row = base.select(
        "pmid",
        F.lit("title").alias("section"),
        F.col("__title").alias("text"),
        F.filter("__spans", lambda s: s["c_end"] <= tlen).alias("spans"),
    )
    abst_row = base.select(
        "pmid",
        F.lit("abstract").alias("section"),
        F.col("__abstract").alias("text"),
        F.transform(
            F.filter("__spans", lambda s: s["c_end"] > tlen),
            lambda s: F.struct(
                (s["c_start"] - tlen - 1).alias("c_start"),
                (s["c_end"] - tlen - 1).alias("c_end"),
                s["name"].alias("name"),
                s["label"].alias("label"),
            ),
        ).alias("spans"),
    )
    return title_row.unionByName(abst_row)


# --- char ↔ token offset translation (X9) ------------------------------------

def token_char_offsets(
    tokenized: DataFrame, id_cols: list[str], tokens_col: str = "tokens"
) -> DataFrame:
    """(ids..., pos, tok, c_start, c_end) over snt = ' '.join(tokens).

    Reference matcher_model.py:38-46: token i starts at Σ_{j<i}(len+1) and
    ends at start+len. Window prefix sum — one shuffle on the sentence key.
    """
    toks = tokenized.select(*id_cols, F.posexplode(tokens_col).alias("pos", "tok"))
    w = Window.partitionBy(*id_cols).orderBy("pos")
    c_start = F.coalesce(
        F.sum(F.length("tok") + 1).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return toks.select(
        *id_cols,
        "pos",
        "tok",
        c_start.cast("bigint").alias("c_start"),
        (c_start + F.length("tok")).cast("bigint").alias("c_end"),
    )


def translate_char_spans(
    char_spans: DataFrame,
    tokenized: DataFrame,
    id_cols: list[str],
    tokens_col: str = "tokens",
) -> DataFrame:
    """Char-offset spans → token-offset spans (matcher_model.py:32-58).

    A span survives iff its char END aligns to a token end; its token start
    is the token whose char start is the LARGEST one ≤ the span's char
    start (exact alignment and the reference's right-shift fallback are the
    same rule, since an aligned start is its own max). Joins are
    key-partitioned on the sentence id; the start lookup is a per-sentence
    range join resolved with a groupBy-max (no cross join).
    """
    offs = token_char_offsets(tokenized, id_cols, tokens_col)
    # duplicate gold annotations (e.g. PubTator lines differing only by a
    # CUI this parser drops) must survive translation: number identical
    # rows so the final groupBy can't collapse them (identical rows are
    # interchangeable, so the arbitrary-within-ties numbering is
    # deterministic in effect)
    w_dup = Window.partitionBy(*char_spans.columns).orderBy(F.lit(1))
    char_spans = char_spans.withColumn("__dup", F.row_number().over(w_dup))
    ends = offs.select(
        *id_cols,
        F.col("c_end").alias("__ce"),
        (F.col("pos") + 1).cast("bigint").alias("m_end"),
    )
    span_cols = [c for c in char_spans.columns if c not in ("c_start", "c_end")]
    with_end = char_spans.join(
        ends,
        [char_spans[c] == ends[c] for c in id_cols]
        + [char_spans["c_end"] == ends["__ce"]],
    ).select(
        *[char_spans[c] for c in span_cols],
        char_spans["c_start"],
        char_spans["c_end"],
        ends["m_end"],
    )
    starts = offs.select(
        *[F.col(c).alias(f"__i_{c}") for c in id_cols],
        F.col("c_start").alias("__cs"),
        F.col("pos").cast("bigint").alias("__ts"),
    )
    cond = [with_end[c] == starts[f"__i_{c}"] for c in id_cols] + [
        starts["__cs"] <= with_end["c_start"]
    ]
    snapped = (
        with_end.join(starts, cond)
        .groupBy(*[with_end[c] for c in span_cols], "c_start", "c_end", "m_end")
        .agg(F.max_by("__ts", "__cs").alias("m_start"))
    )
    return snapped.select(
        *span_cols, F.col("m_start").cast("bigint"), "m_end"
    ).drop("__dup")


def tokenize_with_spans_pdf(
    docs: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    spans_col: str = "spans",
    tokenizer=None,
):
    """Raw-text tokenization that SPLITS tokens at unaligned span
    boundaries (gold_dataset.py:87-181), as an Arrow-batched mapInPandas.

    Gold corpora are dim-sized; the imperative split logic is the
    legitimately Python-shaped kernel here (the reference's is spaCy-based;
    ours uses the pinned rule tokenizer for determinism). Output: one row
    per doc with final tokens plus token-offset spans.
    """
    from thesaurus_based_ner_spark.functions.text import tokenize as _tok

    tokenizer = tokenizer or _tok
    import re as _re

    from thesaurus_based_ner_spark.functions.text import TOKEN_RE as _TRE

    tok_re = _re.compile(_TRE)
    dtypes = {f.name: f.dataType.simpleString() for f in docs.schema}
    id_schema = ", ".join(f"{c} {dtypes[c]}" for c in id_cols)
    out_schema = (
        id_schema
        + ", tokens array<string>, m_starts array<bigint>, m_ends array<bigint>,"
        " labels array<string>"
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                text = row[text_col]
                # Arrow hands the array<struct> cell over as a numpy
                # ndarray; `or []` would bool() it and raise for 2+ spans
                cell = row[spans_col]
                if cell is None or len(cell) == 0:
                    cell = []
                spans = sorted(
                    (int(s["c_start"]), int(s["c_end"]), s["label"])
                    for s in cell
                )
                # raw-text token boundaries from the pinned tokenizer
                bounds = []  # (c_start, c_end)
                for m in tok_re.finditer(text):
                    bounds.append([m.start(), m.end()])
                # split tokens at every unaligned span boundary (reference
                # split_token_by_spans): a boundary strictly inside a token
                # splits it in two.
                cuts = set()
                for s, e, _l in spans:
                    cuts.add(s)
                    cuts.add(e)
                new_bounds = []
                for b0, b1 in bounds:
                    inner = sorted(c for c in cuts if b0 < c < b1)
                    edges = [b0] + inner + [b1]
                    for a, b in zip(edges, edges[1:]):
                        new_bounds.append((a, b))
                tokens = [text[a:b] for a, b in new_bounds]
                start2tok = {a: i for i, (a, b) in enumerate(new_bounds)}
                end2tok = {b: i + 1 for i, (a, b) in enumerate(new_bounds)}
                ms, me, ls = [], [], []
                for s, e, l in spans:
                    if s in start2tok and e in end2tok:
                        ms.append(start2tok[s])
                        me.append(end2tok[e])
                        ls.append(l)
                out_rows.append(
                    tuple(row[c] for c in id_cols) + (tokens, ms, me, ls)
                )
            yield pd.DataFrame(
                out_rows,
                columns=list(id_cols) + ["tokens", "m_starts", "m_ends", "labels"],
            )

    return docs.select(*id_cols, text_col, spans_col).mapInPandas(
        run, schema=out_schema
    )


# --- CoNLL2003 category mapper (J8) ------------------------------------------

# reference dataset/utils.py:21-43 (DBpedia ontology classes per CoNLL cat)
CONLL2003_CATEGORY_MAPPER: dict[str, list[str]] = {
    "PER": [
        "<http://dbpedia.org/ontology/Person>",
        "<http://dbpedia.org/ontology/Name>",
    ],
    "ORG": ["<http://dbpedia.org/ontology/Organisation>"],
    "LOC": ["<http://dbpedia.org/ontology/Place>"],
    "MISC": [
        "<http://dbpedia.org/ontology/Work>",
        "<http://dbpedia.org/ontology/Event>",
        "<http://dbpedia.org/ontology/MeanOfTransportation>",
        "<http://dbpedia.org/ontology/Device>",
        "<http://dbpedia.org/ontology/Award>",
        "<http://dbpedia.org/ontology/Disease>",
        "<http://dbpedia.org/ontology/EthnicGroup>",
    ],
}


def conll_category_map_df(spark: SparkSession) -> DataFrame:
    """(dbpedia_class, conll_cat) dim table for the mapper join."""
    rows = []
    for cat, classes in sorted(CONLL2003_CATEGORY_MAPPER.items()):
        for cls in classes:
            c = cls.replace("'", "''")
            rows.append(f"('{c}', '{cat}')")
    return spark.sql(
        "SELECT * FROM VALUES " + ", ".join(rows) + " AS t(dbpedia_class, conll_cat)"
    )


def map_conll_categories(
    labeled: DataFrame, spark: SparkSession, label_col: str = "label"
) -> DataFrame:
    """Map DBpedia-class labels onto CoNLL2003 categories (broadcast join);
    classes outside the mapper keep their own label (reference
    typer_to_bio.py:6-15 falls through unmapped cats unchanged)."""
    m = conll_category_map_df(spark)
    return (
        labeled.join(
            F.broadcast(m), labeled[label_col] == m["dbpedia_class"], "left"
        )
        .withColumn(label_col, F.coalesce("conll_cat", F.col(label_col)))
        .drop("dbpedia_class", "conll_cat")
    )


# --- original-dataset assembly helpers (orig_dataset.py) --------------------

def remove_space_tokens_df(
    tagged: DataFrame, tokens_col: str = "tokens", tags_col: str = "ner_tags"
) -> DataFrame:
    """Drop literal-space tokens and their tags IN PARALLEL (reference
    remove_space_token, src/dataset/orig_dataset.py:86-101 — the JNLPBA
    corpus carries stray ' ' tokens that would desync BIO offsets).
    Pure array built-ins: one zip, one filter, two projections."""
    z = F.filter(
        F.arrays_zip(tokens_col, tags_col), lambda s: s[tokens_col] != " "
    )
    return (
        tagged.withColumn("__z", z)
        .withColumn(tokens_col, F.transform("__z", lambda s: s[tokens_col]))
        .withColumn(tags_col, F.transform("__z", lambda s: s[tags_col]))
        .drop("__z")
    )


def split_doc_sentences_df(
    docs: DataFrame,
    id_cols: list[str],
    bos_col: str = "bos_ids",
    tokens_col: str = "tokens",
    tags_col: str = "ner_tags",
) -> DataFrame:
    """Document rows → sentence rows sliced at begin-of-sentence offsets
    (reference snt_tokenize_ner_datasets, orig_dataset.py:255-289: for
    each (s, e) in zip(bos, bos[1:] + [len(tokens)]) emit the token/tag
    slices with a per-document snt_id). posexplode over the bounds array —
    map-side, no shuffle."""
    n = F.size(tokens_col)
    ends = F.concat(
        F.slice(
            F.col(bos_col), 2, F.greatest(F.size(bos_col) - 1, F.lit(0))
        ),
        F.array(n),
    )
    bounds = F.arrays_zip(F.col(bos_col).alias("s"), ends.alias("e"))
    exploded = docs.select(
        *id_cols, tokens_col, tags_col,
        F.posexplode(bounds).alias("snt_id", "__b"),
    )
    s = F.col("__b.s")
    ln = (F.col("__b.e") - s).cast("int")
    return exploded.select(
        *id_cols,
        F.col("snt_id").cast("bigint").alias("snt_id"),
        F.slice(F.col(tokens_col), (s + 1).cast("int"), ln).alias(tokens_col),
        F.slice(F.col(tags_col), (s + 1).cast("int"), ln).alias(tags_col),
    )
