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

import re

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


# strip tracking pairs in ONE regexp pass: '(^|&)name(=value)?' up to the
# next '&'/end. The lookahead keeps bare flag params ('&ref&') covered and
# prevents prefix hits ('refresh=1' does not match 'ref'). A regexp_replace
# stays inside whole-stage codegen; the previous formulation — an F.filter
# lambda running split(kv,'=') + isin per element — is an interpreted HOF.
_TRACKING_RE = (
    "(?:^|&)(?:"
    + "|".join(re.escape(p) for p in TRACKING_PARAMS)
    + ")(?:=[^&]*)?(?=&|$)"
)


def canonical_url(url_col: str) -> Column:
    """Scheme-less canonical form: host + path + sorted, tracking-free
    query string.

    One parse_url call (HOST — it also supplies NULL-host validity
    detection); path and query come from plain regexps on the raw string.
    The parse_url(PATH)/parse_url(QUERY) formulation this replaces
    measured ~20% slower on the 600k-url dedup bench query — parse_url
    re-tokenizes the whole url per component, a regexp_extract does one
    anchored scan.
    """
    url = F.col(url_col)
    # authority stripped through its end ([^/?#]*) so userinfo/port never
    # leak into the path; path runs to the first '?' or '#'
    core = F.regexp_replace(url, r"^[a-zA-Z][\w+.-]*://[^/?#]*", "")
    p0 = F.regexp_extract(core, r"^([^?#]*)", 1)
    path = F.when(p0 == "", F.lit("/")).otherwise(
        # strip a trailing slash only when something precedes it — bare
        # '/' survives
        F.regexp_replace(p0, r"(.)/$", "$1")
    )
    # query = text after the FIRST '?' that precedes any '#' — drop the
    # fragment first so '#f?x' is never mistaken for a query
    q = F.regexp_extract(F.regexp_replace(url, r"#.*", ""), r"\?(.*)", 1)
    stripped = F.regexp_replace(q, _TRACKING_RE, "")
    # leading '&' remains when the first pair was tracking noise; empty
    # elements (from '&&' or an all-tracking query) drop via array_remove —
    # no lambda anywhere in the expression tree
    pairs = F.array_remove(F.split(stripped, "&"), "")
    sorted_q = F.array_join(F.array_sort(pairs), "&")
    base = F.concat(_host(url), path)
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
