"""The driver's CORRECTNESS gate records only the FIRST 50 entries of
``__spark_entry__.queries()`` in insertion order.  Pin that window to the
round-5 priority list so a module-dict edit can never silently rotate a
never-driver-checked query out of the gate (the round-3 verdict's #1
finding was exactly that: 49 queries starved of driver rows by insertion
order)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

DRIVER_WINDOW = 50


def test_first_window_is_exactly_the_priority_list():
    names = list(entry.queries().keys())
    assert names[:DRIVER_WINDOW] == entry._R5_PRIORITY[:DRIVER_WINDOW]
    assert len(entry._R5_PRIORITY) == DRIVER_WINDOW


def test_every_window_query_has_an_oracle():
    oracles = entry.oracle_sql()
    missing = [n for n in list(entry.queries())[:DRIVER_WINDOW] if n not in oracles]
    assert not missing, f"window queries without oracles: {missing}"


def test_priority_names_all_resolve():
    qs = entry.queries()
    unresolved = [n for n in entry._R5_PRIORITY if n not in qs]
    assert not unresolved, f"priority names not in queries(): {unresolved}"
