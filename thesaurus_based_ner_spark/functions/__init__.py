"""Pure, deterministic text functions — the single source of semantics.

Everything here is plain Python with no Spark dependency so the same code
can serve as (a) the inside of vectorized pandas UDFs, (b) the pure-Python
oracle in parity tests, and (c) documentation of the invariants.
"""

from thesaurus_based_ner_spark.functions.text import (  # noqa: F401
    TOKEN_RE,
    SENT_SPLIT_RE,
    extract_text,
    render_html,
    sentencize,
    tokenize,
)
from thesaurus_based_ner_spark.functions.matcher import (  # noqa: F401
    TokenTrie,
    build_matcher,
    split_case_sensitivity,
    resolve_overlaps,
    merge_adjacent,
    spans_to_bio,
    bio_to_spans,
)
