"""Repo-wide physical-plan audit over the FULL driver query surface.

Every `__spark_entry__.queries()` entry is built at sf0.001 and its
formatted physical plan asserted free of the two scale-killers the
100-TB design forbids everywhere:

- ``CartesianProduct`` — an unkeyed all-pairs join anywhere in the
  surface would be quadratic at cluster scale (intentional tiny-side
  cross joins compile to BroadcastNestedLoopJoin and are allowed);
- ``BatchEvalPython`` — a row-at-a-time Python UDF in any plan (the
  only sanctioned Python paths are Arrow-batched: ArrowEvalPython,
  MapInPandas, FlatMapGroupsInPandas[WithState]).

Per-query plan *shape* (pushdown, broadcast choice, semi/anti) is pinned
by the per-module tests; this audit is the global regression net so a
new query can never quietly reintroduce either anti-pattern.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

# Queries whose *construction* is execution, not planning: they run the
# pipeline (or a Structured Streaming replay) to produce their result and
# return a post-materialization frame whose plan no longer reflects the
# interesting operators. Their shuffle discipline is pinned where the work
# happens (test_incremental.py, test_streaming.py, test_events.py), and
# their values by the hash-green oracle rows.
_CONSTRUCTION_IS_EXECUTION = {
    "er_incremental_clusters",
    "er_unlink_clusters",
    "er_cdc_clusters",
    "evt_stream_windowed",
    "evt_stream_sessionize",
    "evt_stream_stream_join",
    "evt_stream_dedup",
}


def _queries():
    import __spark_entry__ as entry

    return [
        (name, fn)
        for name, fn in sorted(entry.queries().items())
        if name not in _CONSTRUCTION_IS_EXECUTION
    ]


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize("name,fn", _queries(), ids=[n for n, _ in _queries()])
def test_plan_has_no_cartesian_and_no_row_python(spark, name, fn):
    plan = _formatted_plan(fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, f"{name}: unkeyed all-pairs join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


def test_no_topandas_in_library_source():
    """No ``queries()`` code path may materialize a corpus on the driver:
    ``toPandas`` is banned from the library source outright (the one
    historical use — er_cdc_clusters' change-stream scaffolding — now
    builds its batches with Spark filters + write.parquet)."""
    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "blink_spark",
    )
    hits = []
    for fname in sorted(os.listdir(pkg)):
        if not fname.endswith(".py"):
            continue
        with open(os.path.join(pkg, fname), encoding="utf-8") as f:
            for lineno, line in enumerate(f, 1):
                if "toPandas" in line:
                    hits.append(f"{fname}:{lineno}: {line.strip()}")
    assert not hits, "driver-side corpus materialization:\n" + "\n".join(hits)
