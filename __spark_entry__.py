"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: thesaurus mention extraction over the documents
                 table (the KG pipeline's core operator) at sf0.001.
queries()      — one callable per implemented operator from SURVEY.md §2,
                 delegating to thesaurus_based_ner_spark.plans.queries.
oracle_sql()   — DuckDB-executable ANSI SQL equivalents for every query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from thesaurus_based_ner_spark.plans import queries as _q  # noqa: E402
from thesaurus_based_ner_spark.plans import queries_ext as _qx  # noqa: E402,F401
# queries_ext registers into the same QUERIES/ORACLES dicts on import


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["mention_label_counts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
