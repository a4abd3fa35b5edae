"""Pseudo-labeled NER dataset assembly (SURVEY.md §3.2 entry point B).

Reference: load_pseudo_dataset (/root/reference/src/dataset/pseudo_dataset/
pseudo_dataset.py:87-112) — per-sentence BIO tags from dict matches, keep
only sentences with ≥1 mention (F2, :96-100), label vocabulary by frequency
(A5, :102-104); join_pseudo_and_gold_dataset (:144-161) unions pseudo train
with gold validation/test (J7/SO4 — labels stay strings here, so no
vocabulary re-encoding is needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from thesaurus_based_ner_spark.operators.mentions import bio_tags_df
from thesaurus_based_ner_spark.operators.sampling import seeded_split


def pseudo_ner_dataset(
    sentences: DataFrame, mentions: DataFrame, id_cols: list[str]
) -> DataFrame:
    """(ids..., tokens, ner_tags) for sentences with ≥1 positive mention."""
    tagged = bio_tags_df(sentences, mentions, id_cols)
    has_mention = F.exists("ner_tags", lambda t: t != "O")
    return tagged.filter(has_mention).select(*id_cols, "tokens", "ner_tags")


def label_vocab(mentions: DataFrame) -> DataFrame:
    """(label, n) ordered by frequency desc then label — the dynamic label
    vocabulary (pseudo_dataset.py:102-104); 'O' handling stays implicit
    because labels are strings end-to-end."""
    return (
        mentions.filter(~F.col("label").startswith("nc-"))
        .groupBy("label")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "label")
    )


def join_pseudo_and_gold(
    pseudo: DataFrame,
    gold_validation: DataFrame,
    gold_test: DataFrame,
) -> DataFrame:
    """DatasetDict analog: one table with a split column
    {train=pseudo, validation/test=gold} (pseudo_dataset.py:144-161)."""
    cols = ["tokens", "ner_tags"]
    return (
        pseudo.select(*cols).withColumn("split", F.lit("train"))
        .unionByName(gold_validation.select(*cols).withColumn("split", F.lit("validation")))
        .unionByName(gold_test.select(*cols).withColumn("split", F.lit("test")))
    )


def train_validation_split(
    pseudo: DataFrame, key_cols: list[str], seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Deterministic 90/10 split (data_translator.py:400-415 semantics,
    made partition-stable via key hashing)."""
    train, val = seeded_split(pseudo, [0.9, 0.1], seed, key_cols)
    return train, val
