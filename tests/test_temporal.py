"""asof_join: inclusive bounds, both directions, no-match nulls."""

from pyspark.sql import functions as F

from thesaurus_based_ner_spark.operators.temporal import asof_join


def _df(spark, rows, cols):
    body = ", ".join(
        "(" + ", ".join(repr(v) if isinstance(v, str) else str(v) for v in r) + ")"
        for r in rows
    )
    return spark.sql(f"SELECT * FROM VALUES {body} AS t({cols})")


def test_asof_backward_inclusive_and_no_match(spark):
    left = _df(spark, [("a", 10, 1), ("a", 5, 2), ("b", 7, 3)], "k, ts, lid")
    right = _df(spark, [("a", 10, 100), ("a", 4, 101), ("c", 1, 102)], "k, ts, rid")
    out = {
        (r.k, r.lid): r.rid
        for r in asof_join(left, right, ["k"], "ts", "ts").collect()
    }
    # equal ts matches (inclusive); earlier right wins for ts=5; b has none
    assert out == {("a", 1): 100, ("a", 2): 101, ("b", 3): None}


def test_asof_forward(spark):
    left = _df(spark, [("a", 10, 1), ("a", 5, 2)], "k, ts, lid")
    right = _df(spark, [("a", 10, 100), ("a", 7, 101)], "k, ts, rid")
    out = {
        (r.k, r.lid): r.rid
        for r in asof_join(
            left, right, ["k"], "ts", "ts", direction="forward"
        ).collect()
    }
    # ts=10 matches equal (inclusive); ts=5 matches next-at-7
    assert out == {("a", 1): 100, ("a", 2): 101}


def test_asof_keeps_left_payload_and_row_count(spark):
    left = _df(spark, [("a", 3, 1), ("a", 8, 2), ("a", 9, 9)], "k, ts, lid")
    right = _df(spark, [("a", 5, 100)], "k, ts, rid")
    res = asof_join(left, right, ["k"], "ts", "ts")
    assert res.count() == left.count()
    rows = {(r.lid, r.ts): r.rid for r in res.collect()}
    assert rows == {(1, 3): None, (2, 8): 100, (9, 9): 100}


def test_asof_null_payload_field_not_backfilled(spark):
    # a matched right row with a legitimately NULL field must NOT have
    # that field back-filled from an older right row (torn-row bug)
    left = _df(spark, [("k", 10, 1)], "k, ts, lid")
    right = spark.sql(
        "SELECT * FROM VALUES ('k', 1, 1, 2), ('k', 5, CAST(NULL AS INT), 9) "
        "AS t(k, ts, a, b)"
    )
    r = asof_join(left, right, ["k"], "ts", "ts").collect()[0]
    assert r.a is None and r.b == 9, (r.a, r.b)
