"""Thesaurus construction (SURVEY §3.1): scans, closure expansion,
intersect semantics, anchor weighting, inflection, argmax finalize."""

import pytest
from pyspark.sql import functions as F

from thesaurus_based_ner_spark.operators import thesaurus as th
from thesaurus_based_ner_spark.operators.graph import ancestor_closure


@pytest.fixture(scope="module")
def closure(spark):
    edges = spark.createDataFrame(
        [("T1", "T0"), ("T2", "T0"), ("T3", "T1")], "child string, parent string"
    )
    return ancestor_closure(edges, include_self=True)


def test_read_pipe_and_ttl(spark, tmp_path):
    rrf = tmp_path / "conso.rrf"
    rrf.write_text("C1|ENG|SRC|aspirin|\nC2|ENG|SRC|ibuprofen|\n")
    df = th.read_pipe_table(spark, str(rrf), ["cui", "lang", "src", "term", "x"])
    assert {r.term for r in df.collect()} == {"aspirin", "ibuprofen"}

    ttl = tmp_path / "labels.ttl"
    ttl.write_text(
        '<http://db.org/resource/A> <http://www.w3.org/2000/01/rdf-schema#label> "Alpha" .\n'
        "<http://db.org/resource/A> <http://db.org/ontology/other> <http://x> .\n"
        '<http://db.org/resource/B> <http://www.w3.org/2000/01/rdf-schema#label> "Beta" .\n'
    )
    lab = th.read_ttl_predicate(
        spark, str(ttl), "http://www.w3.org/2000/01/rdf-schema#label"
    )
    assert {(r.subj, r.obj) for r in lab.collect()} == {
        ("http://db.org/resource/A", "Alpha"),
        ("http://db.org/resource/B", "Beta"),
    }


def test_term2cats_intersection_semantics(spark, closure):
    # term "x" maps to C1 (types T3) and C2 (types T2); with ancestor
    # closure T3→{T3,T1,T0}, T2→{T2,T0} → intersection {T0}
    conso = spark.createDataFrame(
        [("C1", "ENG", "S", "x"), ("C2", "ENG", "S", "x"), ("C3", "ENG", "S", "y")],
        "cui string, lang string, src string, term string",
    )
    sty = spark.createDataFrame(
        [("C1", "T3"), ("C2", "T2"), ("C3", "T1")], "cui string, tui string"
    )
    out = {
        r.term: (list(r.cats), list(r.weights))
        for r in th.term2cats_from_concepts(conso, sty, closure).collect()
    }
    assert out["x"] == (["T0"], [1.0])
    assert out["y"] == (["T0", "T1"], [1.0, 1.0])


def test_anchor_weighting_and_topk(spark):
    anchor = spark.createDataFrame(
        [("e1", "usa")] * 5 + [("e2", "usa")] * 3 + [("e3", "rare")],
        "entity string, surface string",
    )
    e2c = spark.createDataFrame(
        [("e1", "Country"), ("e2", "Team"), ("e3", "Thing")],
        "entity string, cat string",
    )
    out = {r.term: (list(r.cats), list(r.weights))
           for r in th.anchor_term2cats(anchor, e2c).collect()}
    assert out["usa"] == (["Country", "Team"], [5.0, 3.0])
    assert out["rare"] == (["Thing"], [1.0])


def test_inflection_rules():
    assert th.pluralize("acid") == "acids"
    assert th.pluralize("study") == "studies"
    assert th.pluralize("box") == "boxes"
    assert th.singularize("acids") == "acid"
    assert th.singularize("studies") == "study"
    assert th.inflect_term("amino acid") == ["amino acids"]
    assert "box" in th.inflect_term("boxes")


def test_inflect_terms_skips_collisions(spark):
    t2c = spark.createDataFrame(
        [("acid", ["Chem"], [1.0]), ("acids", ["Other"], [1.0])],
        "term string, cats array<string>, weights array<double>",
    )
    out = {r.term: list(r.cats) for r in th.inflect_terms(t2c).collect()}
    # "acid"→"acids" collides with existing term → original kept
    assert out["acids"] == ["Other"]
    assert out["acid"] == ["Chem"]


def test_term2cat_argmax_tie_skip_and_nc(spark):
    t2cs = spark.createDataFrame(
        [
            ("usa", ["Country", "Team"], [5.0, 3.0]),
            ("tie", ["Country", "Team"], [2.0, 2.0]),
            ("bad", ["Junk"], [9.0]),
        ],
        "term string, cats array<string>, weights array<double>",
    )
    out = {
        r.term: r.cat
        for r in th.term2cat_from_term2cats(
            t2cs, positive_cats=["Country", "Team"], negative_cats=["Junk"]
        ).collect()
    }
    assert out == {"usa": "Country", "bad": "nc-Junk"}  # tie skipped


def test_anomaly_suffix_removal(spark):
    t2c = spark.createDataFrame(
        [
            ("migration", "Process"),
            ("cell migration", "BioProcess"),   # suffix, different cat → drop
            ("amino acid", "Chemical"),
            ("acid", "Chemical"),               # same cat → keep both
        ],
        "term string, cat string",
    )
    kept = {r.term for r in th.remove_anomaly_suffix_terms(t2c).collect()}
    assert kept == {"migration", "amino acid", "acid"}


def test_disambiguation_bfs(spark):
    from thesaurus_based_ner_spark.operators.thesaurus import expand_disambiguation

    t2e = spark.createDataFrame(
        [("mercury", "Mercury_(disamb)"), ("gold", "Gold")],
        "term string, entity string",
    )
    disamb = spark.createDataFrame(
        [
            ("Mercury_(disamb)", "Mercury_(planet)"),
            ("Mercury_(disamb)", "Mercury_(element)"),
            ("Mercury_(disamb)", "Mercury_(more)"),
            ("Mercury_(more)", "Mercury_(god)"),  # chained disamb page
        ],
        "src string, dst string",
    )
    out = {(r.term, r.entity) for r in expand_disambiguation(t2e, disamb).collect()}
    assert out == {
        ("mercury", "Mercury_(planet)"),
        ("mercury", "Mercury_(element)"),
        ("mercury", "Mercury_(god)"),
        ("gold", "Gold"),
    }


def test_redirect_merged_entity_cats(spark):
    from thesaurus_based_ner_spark.operators.thesaurus import (
        merge_redirected_entity_cats,
    )

    e2c = spark.createDataFrame(
        [("US", "Country"), ("USA", "Nation"), ("NY", "City")],
        "entity string, cat string",
    )
    redirects = spark.createDataFrame(
        [("US", "USA"), ("America", "US")], "src string, dst string"
    )
    out = {(r.entity, r.cat) for r in merge_redirected_entity_cats(e2c, redirects).collect()}
    # US's cats move to chain root USA; NY untouched
    assert out == {("USA", "Country"), ("USA", "Nation"), ("NY", "City")}
