"""Unit semantics for the alternate KB-loader family (kb_loaders.py):
the subtle bits the registered oracle queries can't pin — subtraction
ORDER in the twitter dictionary, the T000 special case, and the one-hop
(non-fixpoint) redirect expansion of wikipedia_article_terms."""

from pyspark.sql import functions as F

from thesaurus_based_ner_spark.operators.kb_loaders import (
    dictionary_set_algebra,
    tui_prefix_descendants,
    wikipedia_article_terms,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_subtraction_order_matters(spark):
    # reference twitter.py:170-180: later pairs see earlier results.
    # b -= a removes x from b; then c -= b must NOT remove x (x already
    # gone from b). With the reverse order, c would lose x.
    cat_terms = _df(
        spark,
        [("a", "x"), ("b", "x"), ("b", "y"), ("c", "x"), ("c", "z")],
        "cat string, term string",
    )
    out = dictionary_set_algebra(cat_terms, [("b", "a"), ("c", "b")])
    got = {(r["term"], r["cat"]) for r in out.collect()}
    # after b-=a: b={y}; after c-=b: c={x,z}; dedup: x in a and c → drop
    assert got == {("y", "b"), ("z", "c")}

    out2 = dictionary_set_algebra(cat_terms, [("c", "b"), ("b", "a")])
    got2 = {(r["term"], r["cat"]) for r in out2.collect()}
    # reverse order: c-=b first drops x from c; then b-=a drops x from b;
    # x survives only in a
    assert got2 == {("x", "a"), ("y", "b"), ("z", "c")}


def test_cross_category_duplicates_dropped_entirely(spark):
    # twitter.py:188-196: a term under >=2 cats is removed from ALL
    cat_terms = _df(
        spark,
        [("a", "x"), ("b", "x"), ("a", "y")],
        "cat string, term string",
    )
    out = dictionary_set_algebra(cat_terms, [])
    assert {(r["term"], r["cat"]) for r in out.collect()} == {("y", "a")}


def test_t000_selects_entities_and_events(spark):
    # terms.py:49-53: T000 = STNs starting 'A' (entities) or 'B' (events)
    srdef = _df(
        spark,
        [("T1", "A1.2"), ("T2", "B2"), ("T3", "C9"), ("T4", "A1")],
        "tui string, stn string",
    )
    got = {r["tui"] for r in tui_prefix_descendants(srdef, "T000").collect()}
    assert got == {"T1", "T2", "T4"}
    # ordinary root: prefix subtree includes the root itself
    got = {r["tui"] for r in tui_prefix_descendants(srdef, "T4").collect()}
    assert got == {"T1", "T4"}


def test_wikipedia_article_terms_one_hop_redirects(spark):
    # terms.py:154-170: redirect expansion is ONE hop (sources of matched
    # articles), not a chain fixpoint — r2 -> r1 -> art must NOT pull r2's
    # names in via transitivity
    instance_type = _df(spark, [("art", "Person")], "ent string, cls string")
    redirects = _df(
        spark, [("r1", "art"), ("r2", "r1")], "src string, dst string"
    )
    names = _df(
        spark,
        [("art", "Art"), ("r1", "ArtRedirect"), ("r2", "TwoHop")],
        "ent string, name string",
    )
    cats = spark.createDataFrame([("Person",)], "cls string")
    got = {
        r["name"]
        for r in wikipedia_article_terms(
            instance_type, redirects, names, cats
        ).collect()
    }
    assert got == {"Art", "ArtRedirect"}
