"""Gold-corpus ingestion: CoNLL2003 + PubTator parsers, offset translation.

Fixtures are synthetic but format-faithful (reference formats:
gold_dataset.py:446-480 CoNLL, :184-224 PubTator).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thesaurus_based_ner_spark.operators import gold
from thesaurus_based_ner_spark.operators.evalmetrics import strict_prf

CONLL_TEXT = """-DOCSTART- -X- -X- O

EU NNP B-NP B-ORG
rejects VBZ B-VP O
German JJ B-NP B-MISC
call NN I-NP O

Peter NNP B-NP B-PER
Blackburn NNP I-NP I-PER
visits VBZ B-VP O
BRUSSELS NNP B-NP B-LOC"""


def test_conll_parse_and_decode(spark, tmp_path):
    p = tmp_path / "train.txt"
    p.write_text(CONLL_TEXT)
    parsed = gold.parse_conll_blocks(gold.read_conll_file(spark, str(p)))
    rows = {tuple(r["tokens"]): list(r["tags"]) for r in parsed.collect()}
    assert rows == {
        ("EU", "rejects", "German", "call"): ["B-ORG", "O", "B-MISC", "O"],
        ("Peter", "Blackburn", "visits", "BRUSSELS"): [
            "B-PER", "I-PER", "O", "B-LOC",
        ],
    }
    spans = gold.bio_decode_spans(parsed, ["block_id"])
    got = {
        (tuple(r["tokens"]), s["m_start"], s["m_end"], s["label"])
        for r in parsed.join(
            spans.groupBy("block_id").agg(
                F.collect_list(F.struct("m_start", "m_end", "label")).alias("s")
            ),
            "block_id",
        ).select("tokens", F.explode("s").alias("s")).select("tokens", "s").collect()
        for s in [r["s"]]
    }
    assert got == {
        (("EU", "rejects", "German", "call"), 0, 1, "ORG"),
        (("EU", "rejects", "German", "call"), 2, 3, "MISC"),
        (("Peter", "Blackburn", "visits", "BRUSSELS"), 0, 2, "PER"),
        (("Peter", "Blackburn", "visits", "BRUSSELS"), 3, 4, "LOC"),
    }


def test_bio_decode_seqeval_semantics(spark):
    # I- after O starts a new span; I- after different label starts new.
    df = spark.sql(
        "SELECT 1 AS id, array('O','I-A','I-A','I-B','O','B-C','I-C') AS tags"
    )
    spans = gold.bio_decode_spans(df, ["id"])
    got = {(r["m_start"], r["m_end"], r["label"]) for r in spans.collect()}
    assert got == {(1, 3, "A"), (3, 4, "B"), (5, 7, "C")}


PUBTATOR_TEXT = (
    "123|t|Tumor cells\n"
    "123|a|We study tumor cells here.\n"
    "123\t0\t11\tTumor cells\tDisease\tC01\n"
    "123\t21\t26\tcells\tCellType\tC02\n"
    "\n"
    "456|t|Short\n"
    "456|a|Nothing at all.\n"
)


def test_pubtator_parse(spark, tmp_path):
    p = tmp_path / "corpus.pubtator"
    p.write_text(PUBTATOR_TEXT)
    parsed = gold.parse_pubtator_blocks(gold.read_pubtator_file(spark, str(p)))
    rows = {(r["pmid"], r["section"]): r for r in parsed.collect()}
    assert rows[("123", "title")]["text"] == "Tumor cells"
    assert [
        (s["c_start"], s["c_end"], s["label"])
        for s in rows[("123", "title")]["spans"]
    ] == [(0, 11, "Disease")]
    # abstract span shifted by len(title)+1 = 12: (21,26) → (9,14)
    assert [
        (s["c_start"], s["c_end"], s["label"])
        for s in rows[("123", "abstract")]["spans"]
    ] == [(9, 14, "CellType")]
    assert rows[("123", "abstract")]["text"] == "We study tumor cells here."
    assert rows[("456", "abstract")]["spans"] == []


def test_translate_char_spans(spark):
    # tokens: We(0,2) study(3,8) tumor(9,14) cells(15,20)
    toks = spark.sql(
        "SELECT 1 AS id, array('We','study','tumor','cells') AS tokens"
    )
    spans = spark.sql(
        """SELECT * FROM VALUES
           (1, CAST(9 AS BIGINT), CAST(20 AS BIGINT), 'exact'),
           (1, CAST(11 AS BIGINT), CAST(20 AS BIGINT), 'rightshift'),
           (1, CAST(9 AS BIGINT), CAST(18 AS BIGINT), 'dropped')
           AS t(id, c_start, c_end, tag)"""
    )
    out = {
        (r["tag"], r["m_start"], r["m_end"])
        for r in gold.translate_char_spans(spans, toks, ["id"]).collect()
    }
    # exact alignment and right-shift both keep (2,4); unaligned END drops
    assert out == {("exact", 2, 4), ("rightshift", 2, 4)}


def test_tokenize_with_spans_splits_tokens(spark):
    docs = spark.sql(
        """SELECT '1' AS pmid, 'ABCdef ghi' AS text,
           array(struct(CAST(3 AS BIGINT) AS c_start, CAST(6 AS BIGINT) AS c_end,
                        'x' AS name, 'X' AS label)) AS spans"""
    )
    row = gold.tokenize_with_spans_pdf(docs, ["pmid"]).collect()[0]
    assert list(row["tokens"]) == ["ABC", "def", "ghi"]
    assert (list(row["m_starts"]), list(row["m_ends"]), list(row["labels"])) == (
        [1], [2], ["X"]
    )


def test_conll_category_mapper(spark):
    df = spark.sql(
        "SELECT * FROM VALUES ('<http://dbpedia.org/ontology/Person>'), "
        "('<http://dbpedia.org/ontology/Place>'), ('SomethingElse') AS t(label)"
    )
    out = sorted(
        r["label"] for r in gold.map_conll_categories(df, spark).collect()
    )
    assert out == ["LOC", "PER", "SomethingElse"]


def test_strict_prf_on_gold_conll(spark, tmp_path):
    """End-to-end: parse gold CoNLL, decode spans, evaluate a prediction."""
    p = tmp_path / "train.txt"
    p.write_text(CONLL_TEXT)
    parsed = gold.parse_conll_blocks(gold.read_conll_file(spark, str(p)))
    gold_spans = gold.bio_decode_spans(parsed, ["block_id"])
    # prediction = gold minus one span, plus one wrong span
    pred = gold_spans.filter(F.col("label") != "LOC").unionByName(
        gold_spans.filter(F.col("label") == "MISC").withColumn(
            "label", F.lit("PER")
        )
    )
    row = strict_prf(pred, gold_spans, ["block_id"]).collect()[0]
    assert row["n_gold"] == 4 and row["n_pred"] == 4 and row["tp"] == 3
    assert abs(row["precision"] - 0.75) < 1e-9
    assert abs(row["recall"] - 0.75) < 1e-9


def test_tokenize_with_spans_two_spans_per_doc(spark):
    # regression: the Arrow cell is a numpy array; 2+ spans must not hit
    # ndarray truthiness
    docs = spark.sql(
        """SELECT '1' AS pmid, 'abc def ghi' AS text, array(
             struct(CAST(0 AS BIGINT) AS c_start, CAST(3 AS BIGINT) AS c_end,
                    'a' AS name, 'A' AS label),
             struct(CAST(8 AS BIGINT) AS c_start, CAST(11 AS BIGINT) AS c_end,
                    'g' AS name, 'G' AS label)) AS spans"""
    )
    row = gold.tokenize_with_spans_pdf(docs, ["pmid"]).collect()[0]
    assert list(row["labels"]) == ["A", "G"]


def test_pubtator_title_only_block(spark, tmp_path):
    p = str(tmp_path / "t.pubtator")
    with open(p, "w") as f:
        f.write("789|t|Only title here\n\n")
    out = gold.parse_pubtator_blocks(gold.read_pubtator_file(spark, p)).collect()
    secs = {(r["pmid"], r["section"]): r["text"] for r in out}
    assert secs[("789", "title")] == "Only title here"
    # no abstract line -> empty abstract row or none, but NO crash
    assert secs.get(("789", "abstract"), "") == ""


def test_conll_trailing_space_keeps_field4_tag(spark, tmp_path):
    p = str(tmp_path / "c.conll")
    with open(p, "w") as f:
        f.write("EU NNP B-NP B-ORG \nrejects VBZ B-VP O\n\n")
    row = gold.parse_conll_blocks(gold.read_conll_file(spark, p)).collect()[0]
    assert list(row["tags"]) == ["B-ORG", "O"]


def test_translate_preserves_duplicate_gold_spans(spark):
    toks = spark.sql(
        "SELECT 1 AS id, array('We','study','tumor','cells') AS tokens"
    )
    spans = spark.sql(
        """SELECT * FROM VALUES
           (1, CAST(9 AS BIGINT), CAST(20 AS BIGINT), 'Disease'),
           (1, CAST(9 AS BIGINT), CAST(20 AS BIGINT), 'Disease')
           AS t(id, c_start, c_end, tag)"""
    )
    out = gold.translate_char_spans(spans, toks, ["id"]).collect()
    assert len(out) == 2  # two identical annotations stay two rows
