"""Pure (no-Spark) pins on the driver-window rotation contract.

The correctness driver verifies the FIRST 50 entries of queries() /
oracle_sql(); __spark_entry__._PRIORITY decides that window. ADVICE r6:
a typo'd name silently fell out of the window under the old
'if k in d' filter — these tests (plus the assert in _ordered) make a
stale name fail loud.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402


def test_priority_is_50_unique_registered_names():
    assert len(entry._PRIORITY) == 50
    assert len(set(entry._PRIORITY)) == 50
    q = entry.queries()
    o = entry.oracle_sql()
    missing_q = set(entry._PRIORITY) - set(q)
    assert not missing_q, missing_q
    # every window query is DuckDB-oracled (the driver's hard gate)
    missing_o = set(entry._PRIORITY) - set(o)
    assert not missing_o, missing_o


def test_window_is_exactly_priority_in_order():
    q = entry.queries()
    assert list(q.keys())[:50] == entry._PRIORITY
    # ordering consistent between queries() and oracle_sql()
    assert list(entry.oracle_sql().keys())[:50] == entry._PRIORITY


def test_stale_priority_name_fails_loud():
    with pytest.raises(AssertionError):
        entry._ordered({"only_key": 1})
