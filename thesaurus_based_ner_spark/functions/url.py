"""URL canonicalization — the crawl-side dedup key for web pages.

Two fetches of one page routinely differ in fragment, tracking params,
query order, default port, host case, or a trailing slash; deduping on
raw url misses all of these. canonical_url() folds them away with pure
JVM expressions (parse_url + regexp / array built-ins — codegen, no
Python), so it can key an exact-dedup groupBy at crawl scale the same
way md5(text) keys content dedup (operators/dedup.exact_duplicates).

No counterpart in the reference (it ingests pre-fetched text from
SQLite, /root/reference/src/kb_loader/raw_corpus.py); this is the
Spark-native crawl-ingestion extension.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# query params that never change page identity (tracking/session noise)
TRACKING_PARAMS = [
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "ref", "sessionid", "phpsessid",
]


def _host(url: Column) -> Column:
    # lowercase host, strip leading www. (parse_url HOST already excludes
    # the port and the fragment never reaches any component)
    h = F.lower(F.parse_url(url, F.lit("HOST")))
    return F.regexp_replace(h, r"^www\.", "")


def _path(url: Column) -> Column:
    # empty path → "/", trailing slash stripped (root kept)
    p = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/"))
    p = F.when(p == "", F.lit("/")).otherwise(p)
    return F.when(
        (F.length(p) > 1) & p.endswith("/"),
        p.substr(F.lit(1), F.length(p) - 1),
    ).otherwise(p)


def canonical_url(url_col: str) -> Column:
    """Scheme-less canonical form: host + path + sorted, tracking-free
    query string."""
    url = F.col(url_col)
    q = F.parse_url(url, F.lit("QUERY"))
    pairs = F.filter(
        F.split(F.coalesce(q, F.lit("")), "&"),
        lambda kv: (F.length(kv) > 0)
        & ~F.split(kv, "=").getItem(0).isin(TRACKING_PARAMS),
    )
    sorted_q = F.array_join(F.array_sort(pairs), "&")
    base = F.concat(_host(url), _path(url))
    canon = F.when(sorted_q == "", base).otherwise(
        F.concat(base, F.lit("?"), sorted_q)
    )
    # scheme-less/unparseable urls have NULL host → NULL canonical form;
    # as a groupBy dedup key every such url would collapse into ONE NULL
    # group and be deduped to a single survivor. Fall back to the raw url
    # so unparseable urls never share a key.
    return F.coalesce(canon, url)


# compact multi-part public suffixes worth special-casing without a full
# PSL (the long tail needs the real Public Suffix List — note, not shipped)
_TWO_LEVEL_TLDS = ["co.uk", "co.jp", "com.au", "com.br", "co.in", "org.uk"]


def registrable_domain(url_col: str) -> Column:
    """eTLD+1 approximation: last two host labels, or last three when the
    final two form a known multi-part suffix (co.uk …). Crawl-politeness
    grouping / per-site stats key. For exact semantics swap in the full
    Public Suffix List as a broadcast map."""
    h = _host(F.col(url_col))
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return F.when(n <= 2, h).otherwise(
        F.when(last2.isin(_TWO_LEVEL_TLDS), last3).otherwise(last2)
    )
