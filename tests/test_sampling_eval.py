"""Sampling determinism (P1-P6) + eval-metric operators."""

from thesaurus_based_ner_spark.operators import sampling
from thesaurus_based_ner_spark.operators.evalmetrics import (
    lenient_prf,
    strict_prf,
    strict_prf_by_label,
)


def _docs(spark):
    return spark.createDataFrame(
        [(i, ["O", "ENT"][i % 3 == 0]) for i in range(300)], "id long, label string"
    )


def test_seeded_split_deterministic_and_disjoint(spark):
    df = _docs(spark)
    a1, b1 = sampling.seeded_split(df, [0.9, 0.1], seed=7, key_cols=["id"])
    a2, b2 = sampling.seeded_split(df, [0.9, 0.1], seed=7, key_cols=["id"])
    ids = lambda d: {r.id for r in d.collect()}  # noqa: E731
    assert ids(a1) == ids(a2) and ids(b1) == ids(b2)
    assert ids(a1) & ids(b1) == set()
    assert len(ids(a1)) + len(ids(b1)) == 300
    assert 10 <= len(ids(b1)) <= 60  # ~10%
    # stable under repartitioning
    a3, _ = sampling.seeded_split(df.repartition(13), [0.9, 0.1], 7, ["id"])
    assert ids(a3) == ids(a1)


def test_seeded_take_deterministic(spark):
    df = _docs(spark)
    t1 = [r.id for r in sampling.seeded_take(df, 20, 5, ["id"]).collect()]
    t2 = [r.id for r in sampling.seeded_take(df.repartition(3), 20, 5, ["id"]).collect()]
    assert t1 == t2 and len(t1) == 20


def test_shard_covers_all(spark):
    df = sampling.shard(_docs(spark), 8, 1, ["id"])
    shards = {r.shard for r in df.select("shard").distinct().collect()}
    assert shards <= set(range(8)) and len(shards) >= 6


def test_undersample_and_balance(spark):
    df = _docs(spark)
    under = sampling.undersample_label(df, "label", "O", 0.2, seed=3)
    n_o = under.filter("label = 'O'").count()
    assert 10 <= n_o <= 90  # ~20% of 200
    assert under.filter("label = 'ENT'").count() == df.filter("label = 'ENT'").count()
    bal = sampling.balance_labels(df, "label", seed=3)
    counts = {r.label: r["count"] for r in bal.groupBy("label").count().collect()}
    assert abs(counts["O"] - counts["ENT"]) < 60


def _spans(spark, rows):
    return spark.createDataFrame(rows, "doc long, m_start long, m_end long, label string")


def test_strict_and_lenient_prf(spark):
    gold = _spans(spark, [(1, 0, 2, "A"), (1, 5, 7, "B"), (2, 0, 1, "A")])
    pred = _spans(spark, [(1, 0, 2, "A"), (1, 6, 8, "B"), (2, 3, 4, "A")])
    s = strict_prf(pred, gold, ["doc"]).collect()[0]
    assert s.tp == 1 and s.precision == round(1 / 3, 6) and s.recall == round(1 / 3, 6)
    l = lenient_prf(pred, gold, ["doc"]).collect()[0]
    # lenient: (1,6,8,B) overlaps (1,5,7,B) → 2 of 3 pred hit, 2 of 3 gold hit
    assert l.pred_overlapped == 2 and l.gold_overlapped == 2
    by = {r.label: r for r in strict_prf_by_label(pred, gold, ["doc"]).collect()}
    assert by["A"].tp == 1 and by["B"].tp == 0
