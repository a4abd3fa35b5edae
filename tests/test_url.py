"""canonical_url / registrable_domain: crawl dedup-key semantics."""

from pyspark.sql import functions as F

from thesaurus_based_ner_spark.functions.url import (
    canonical_url,
    registrable_domain,
)


def _canon(spark, urls):
    body = ", ".join(f"('{u}')" for u in urls)
    df = spark.sql(f"SELECT * FROM VALUES {body} AS t(url)")
    return [
        r.c for r in df.select(canonical_url("url").alias("c")).collect()
    ]


def test_canonical_url_folds_fetch_noise(spark):
    variants = [
        "http://www.Example.com/a/b/?utm_source=x&id=2",
        "https://example.com:443/a/b?id=2&fbclid=zzz",
        "http://example.com/a/b?id=2#section-3",
        "HTTP://EXAMPLE.com/a/b/?id=2",
    ]
    got = set(_canon(spark, variants))
    assert got == {"example.com/a/b?id=2"}


def test_canonical_url_distinguishes_real_differences(spark):
    urls = [
        "http://example.com/a?id=1",
        "http://example.com/a?id=2",
        "http://example.com/b?id=1",
        "http://other.com/a?id=1",
    ]
    assert len(set(_canon(spark, urls))) == 4


def test_canonical_url_sorts_query_and_handles_root(spark):
    assert _canon(spark, ["http://x.com/?b=2&a=1"]) == ["x.com/?a=1&b=2"]
    assert _canon(spark, ["http://x.com"]) == ["x.com/"]
    assert _canon(spark, ["http://x.com/?utm_source=t"]) == ["x.com/"]


def test_canonical_url_tracking_prefix_and_flag_params(spark):
    # prefix guard: 'refresh' must NOT be stripped because 'ref' is a
    # tracking param; bare flag params ('&ref' with no value) must go
    assert _canon(spark, ["http://x.com/p?refresh=1&ref"]) == [
        "x.com/p?refresh=1"
    ]
    # all-tracking query collapses to the bare path
    assert _canon(spark, ["http://x.com/p?ref&gclid=1"]) == ["x.com/p"]


def test_tracking_alternation_is_regex_literal():
    """ADVICE r5: the alternation must escape each param so a future name
    containing a metacharacter matches literally, not as regex syntax."""
    import re

    from thesaurus_based_ner_spark.functions import url as u

    rx = (
        "(?:^|&)(?:"
        + "|".join(re.escape(p) for p in u.TRACKING_PARAMS + ["utm.x"])
        + ")(?:=[^&]*)?(?=&|$)"
    )
    # 'utm.x' escaped: the literal dot must not match 'utmax'
    assert re.sub(rx, "", "utmax=1&utm.x=2") == "utmax=1"
    # the shipped constant builds with re.escape (same construction)
    assert u._TRACKING_RE == (
        "(?:^|&)(?:"
        + "|".join(re.escape(p) for p in u.TRACKING_PARAMS)
        + ")(?:=[^&]*)?(?=&|$)"
    )


def test_registrable_domain(spark):
    rows = [
        ("http://a.b.news.example.com/x", "example.com"),
        ("http://www.example.com/", "example.com"),
        ("http://shop.foo.co.uk/y", "foo.co.uk"),
        ("http://localhost/z", "localhost"),
    ]
    body = ", ".join(f"('{u}', '{d}')" for u, d in rows)
    df = spark.sql(f"SELECT * FROM VALUES {body} AS t(url, want)")
    got = df.select(registrable_domain("url").alias("d"), "want").collect()
    for r in got:
        assert r.d == r.want, (r.d, r.want)
