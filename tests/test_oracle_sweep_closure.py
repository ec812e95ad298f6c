"""The sweep tool's --iterative-closure mode must be exactly equivalent to
the recursive-CTE connected-components oracle it replaces — property-tested
on random graphs (pure DuckDB, no Spark session)."""

from __future__ import annotations

import os
import sys

import duckdb
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from blink_spark.clustering import sql_connected_components  # noqa: E402
from oracle_sweep import materialize_closure  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=39),
            st.integers(min_value=0, max_value=39),
        ),
        max_size=80,
    ),
)
def test_iterative_closure_matches_recursive_cte(n_nodes, edges):
    edges = [(a % n_nodes, b % n_nodes) for a, b in edges]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE nodes AS SELECT 'n' || lpad(CAST(x AS VARCHAR), 3, '0')"
        " AS file_id FROM range(?) t(x)",
        [n_nodes],
    )
    con.execute("CREATE TABLE edges (left_id VARCHAR, right_id VARCHAR)")
    for a, b in edges:
        con.execute(
            "INSERT INTO edges VALUES ('n' || lpad(CAST(? AS VARCHAR), 3, '0'),"
            " 'n' || lpad(CAST(? AS VARCHAR), 3, '0'))",
            [a, b],
        )
    want = sorted(
        con.execute(sql_connected_components("edges", "nodes")).fetchall()
    )
    materialize_closure(
        con,
        "SELECT left_id, right_id FROM edges",
        "SELECT file_id FROM nodes",
    )
    got = sorted(
        con.execute("SELECT file_id, cluster_id FROM _closure").fetchall()
    )
    assert got == want
