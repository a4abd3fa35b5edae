"""thesaurus_based_ner_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of ``fracivilization/thesaurus-based-ner``
(thesaurus-based distant-supervision NER → typed mentions → entity linking →
canonicalization → (subj, pred, obj) triples) as idiomatic Spark:
DataFrame/SQL plans optimized by Catalyst + AQE, broadcast thesauri, and
Arrow-vectorized pandas UDFs only where built-ins cannot express the
semantics.

Layout:
  functions/  pure, deterministic text functions (tokenize, sentencize,
              HTML extraction, BIO, trie matcher) — the single source of
              truth for semantics, shared by Spark plans, oracles and tests
  sources/    synthetic webtext + thesaurus fixtures, TTL/UMLS-style scans,
              checkpoint catalog (parquet locally, Iceberg in prod)
  operators/  the operator inventory from SURVEY.md §2 (mentions, closures,
              thesaurus build, linking, canonicalization, dedup, simsearch,
              text stats, eval metrics)
  plans/      end-to-end pipeline with checkpoints, lineage and resume
  streaming/  incremental ingestion (Structured Streaming, AvailableNow)
"""

__version__ = "0.1.0"
