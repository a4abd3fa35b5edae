"""Deterministic text extraction / sentence split / tokenization.

The reference pipeline extracts text from PubMed XML
(``/root/reference/src/dataset/raw_corpus.py:19-33``) and tokenizes with
scispaCy (``raw_corpus.py:70-83``). Our input is Common-Crawl-style web
pages ``(url, warc_ts, html, text, lang)`` and the per-row invariant is
**byte-identical extracted text per url** (BASELINE.json input_hint), so we
pin pure, versioned, rule-based functions instead of a model: any spaCy-like
model path stays behind a flag (mirrors the reference's chunker split,
``src/ner_model/chunker/spacy_model.py:93-118`` vs the enumerated chunker).

All regexes here are portable across Python `re`, Java regex (Spark) and
RE2 (DuckDB) — no lookbehind is used in any pattern shared with DuckDB
oracles; SENT_SPLIT_RE (lookbehind) is shared only between Python and Spark.
"""

from __future__ import annotations

import html as _html
import re

# A token is a run of word characters or a single non-word non-space char
# (punctuation becomes its own token). Portable Python/Java/RE2.
TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"

# Sentence boundary: terminal punctuation followed by whitespace.
# Lookbehind keeps the terminator attached to the left sentence.
# (Python `re` + Java regex only — not used in DuckDB oracles.)
SENT_SPLIT_RE = r"(?<=[.!?])\s+"

_token_pat = re.compile(TOKEN_RE)
_sent_pat = re.compile(SENT_SPLIT_RE)

# --- HTML rendering/extraction ------------------------------------------------
# The synthetic webtext generator renders `text` into a fixed HTML template;
# extract_text() inverts it. The invariant extract_text(render_html(t)) == t
# holds for any `t` without angle brackets (guaranteed by the generator) —
# this is the byte-identity check the north rule demands, and the template
# mimics the reference's "one XPath field per document" extraction shape
# (raw_corpus.py:19-33: AbstractText extraction from PubMed XML).

_BODY_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def render_html(text: str, title: str = "") -> bytes:
    """Deterministic HTML wrapping used by the synthetic corpus."""
    body = _html.escape(text, quote=False)
    t = _html.escape(title, quote=False)
    return (
        f"<html><head><title>{t}</title></head><body><p>{body}</p></body></html>"
    ).encode("utf-8")


def extract_text(html_bytes: bytes) -> str:
    """Extract the document text from HTML, byte-identically.

    Primary path: the <p>…</p> payload of the canonical template.
    Fallback (foreign HTML): strip all tags, unescape entities, collapse
    nothing (whitespace is preserved verbatim to keep byte identity).
    """
    raw = html_bytes.decode("utf-8", errors="replace")
    m = _BODY_RE.search(raw)
    payload = m.group(1) if m is not None else _TAG_RE.sub("", raw)
    return _html.unescape(payload)


def sentencize(text: str) -> list[str]:
    """Split text into sentences on terminal punctuation + whitespace."""
    if not text:
        return []
    return [s for s in _sent_pat.split(text) if s]


def tokenize(sentence: str) -> list[str]:
    """Tokenize: word runs + single punctuation chars. Deterministic."""
    return _token_pat.findall(sentence)
