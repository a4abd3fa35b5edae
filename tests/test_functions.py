"""Unit tests for the pure semantic functions (no Spark)."""

from hypothesis import given, settings, strategies as st

from thesaurus_based_ner_spark.functions.matcher import (
    bio_to_spans,
    build_matcher,
    match_sentence,
    merge_adjacent,
    resolve_overlaps,
    spans_to_bio,
    split_case_sensitivity,
)
from thesaurus_based_ner_spark.functions.text import (
    extract_text,
    render_html,
    sentencize,
    tokenize,
)


def test_tokenize_words_and_punct():
    assert tokenize("Hello, world!") == ["Hello", ",", "world", "!"]
    assert tokenize("amino acid") == ["amino", "acid"]
    assert tokenize("") == []


def test_sentencize():
    assert sentencize("A b. C d! E?  F") == ["A b.", "C d!", "E?", "F"]
    assert sentencize("no terminator") == ["no terminator"]


def test_html_roundtrip_byte_identity():
    for t in ["plain", "with & ampersand", "multi.  space", "uni çödé 日本語"]:
        assert extract_text(render_html(t, title="x")) == t


def test_case_split_reference_semantics():
    # string_match.py:122-140: abbreviations + lowercase collisions are cs
    cs, ci = split_case_sensitivity(["WHO", "who was", "Cell", "cell", "France"])
    assert "WHO" in cs                      # upper == itself
    assert {"Cell", "cell"} <= cs           # lowercase collision
    assert {"who was", "France"} == ci


def test_resolve_overlaps_max_end_min_start():
    # component {(0,2),(1,5),(4,6)} chained by overlap → keep (4,6)
    assert resolve_overlaps([(0, 2, "a"), (1, 5, "b"), (4, 6, "c")]) == [(4, 6, "c")]
    # tie on end → min start wins
    assert resolve_overlaps([(1, 4, "a"), (2, 4, "b")]) == [(1, 4, "a")]
    # disjoint spans all survive
    assert resolve_overlaps([(0, 1, "a"), (2, 3, "b")]) == [(0, 1, "a"), (2, 3, "b")]


def test_merge_adjacent_label_of_max_end():
    assert merge_adjacent([(0, 2, "a"), (2, 4, "b")]) == [(0, 4, "b")]
    assert merge_adjacent([(0, 2, "a"), (3, 4, "b")]) == [(0, 2, "a"), (3, 4, "b")]
    # chain of three merges transitively
    assert merge_adjacent([(0, 1, "a"), (1, 2, "b"), (2, 5, "c")]) == [(0, 5, "c")]


def test_trie_longest_match_and_boundaries():
    t2l = {
        "acid": "Chemical",
        "amino acid": "Chemical2",
        "cell": "CellType",
        "cell migration": "BioProcess",
        "WHO": "Org",
    }
    trie = build_matcher(t2l, tokenize)
    toks = tokenize("The amino acid drives cell migration says WHO today")
    out = match_sentence(trie, toks)
    assert (1, 3, "Chemical2") in out       # longest match beats "acid"
    assert (4, 6, "BioProcess") in out      # beats "cell"
    assert (7, 8, "Org") in out
    # "who" lowercase must not match the abbreviation
    assert match_sentence(trie, tokenize("who goes there")) == []
    # case-insensitive term matches any case
    assert match_sentence(trie, tokenize("AMINO ACID rain")) == [(0, 2, "Chemical2")]


def test_bio_roundtrip():
    spans = [(1, 3, "X"), (4, 5, "Y")]
    tags = spans_to_bio(6, spans)
    assert tags == ["O", "B-X", "I-X", "O", "B-Y", "O"]
    assert bio_to_spans(tags) == spans


def test_bio_drops_negative_categories():
    assert spans_to_bio(3, [(0, 2, "nc-Thing")]) == ["O", "O", "O"]


@st.composite
def span_sets(draw):
    n = draw(st.integers(1, 8))
    spans = []
    for _ in range(n):
        s = draw(st.integers(0, 15))
        e = draw(st.integers(s + 1, 16))
        spans.append((s, e, draw(st.sampled_from("abc"))))
    return list({(s, e): (s, e, l) for s, e, l in spans}.values())


@given(span_sets())
@settings(max_examples=200, deadline=None)
def test_resolve_overlaps_properties(spans):
    out = resolve_overlaps(spans)
    # output is non-overlapping and each output span was an input span
    out_sorted = sorted(out)
    for a, b in zip(out_sorted, out_sorted[1:]):
        assert a[1] <= b[0]
    assert set(out) <= set(spans)
    # reference brute-force oracle: UnionFind over pairwise overlap
    import itertools

    parent = {i: i for i in range(len(spans))}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for i, j in itertools.combinations(range(len(spans)), 2):
        (s1, e1, _), (s2, e2, _) = spans[i], spans[j]
        if set(range(s1, e1)) & set(range(s2, e2)):
            parent[find(i)] = find(j)
    groups = {}
    for i in range(len(spans)):
        groups.setdefault(find(i), []).append(spans[i])
    expected = []
    for g in groups.values():
        max_end = max(m[1] for m in g)
        min_start = min(m[0] for m in g if m[1] == max_end)
        expected.append(next(m for m in g if m[0] == min_start and m[1] == max_end))
    assert sorted(out) == sorted(expected)
