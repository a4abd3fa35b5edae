"""Connected components: large-star/small-star vs min-label propagation.

The two implementations share one contract: (node, component=min id).
twostar must agree with label propagation on every shape, including the
long chain that makes O(diameter) propagation pathological.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thesaurus_based_ner_spark.operators.graph import (
    connected_components,
    connected_components_twostar,
)


def _edges(spark, pairs):
    body = ", ".join(f"({a}, {b})" for a, b in pairs)
    return spark.sql(f"SELECT * FROM VALUES {body} AS t(a, b)")


def _result(df):
    return {(r["node"], r["component"]) for r in df.collect()}


def test_twostar_matches_propagation_on_mixed_graph(spark):
    # two stars, one triangle, one isolated edge
    pairs = [
        (10, 11), (10, 12), (10, 13),          # star at 10
        (20, 21), (21, 22), (22, 20),          # triangle
        (30, 31),                              # edge
        (40, 10),                              # connect 40 into star
    ]
    e = _edges(spark, pairs)
    assert _result(connected_components_twostar(e)) == _result(
        connected_components(e)
    )


def test_twostar_long_chain_converges_logarithmically(spark):
    # chain 0-1-2-...-63: diameter 63; label propagation needs ~63 rounds,
    # two-star needs O(log n). Assert correctness (all nodes → component 0).
    n = 64
    e = _edges(spark, [(i, i + 1) for i in range(n - 1)])
    out = _result(connected_components_twostar(e.withColumn("a", F.col("a"))))
    assert out == {(i, 0) for i in range(n)}


def test_twostar_handles_duplicate_and_reversed_edges(spark):
    e = _edges(spark, [(1, 2), (2, 1), (1, 2), (3, 2), (5, 4)])
    out = _result(connected_components_twostar(e))
    assert out == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)}
