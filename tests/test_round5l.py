"""Round-5 continuation-5: the nine TPC-H completion gates (q2 q7 q8 q9
q11 q15 q16 q20 q21) cross-checked against their DuckDB oracles at
sf0.001, plus semantic spot-checks of the adapted predicates."""

from __future__ import annotations

import duckdb
import pytest

from llama_spark.entry_queries import ORACLE, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
NEW_TPCH = (
    "tpch_q2", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q11",
    "tpch_q15", "tpch_q16", "tpch_q20", "tpch_q21",
)


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("key", NEW_TPCH)
def test_tpch_completion_matches_oracle_sf0001(spark, key):
    got = sorted(tuple(r) for r in QUERIES[key](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE[key]).fetchall())
    assert got, f"{key} returned no rows at sf0.001"
    assert got == want


def test_tpch_q21_sole_late_supplier_semantics(spark):
    """Every reported supplier line must be on a finished order with at
    least one OTHER supplier, none of whom also shipped late."""
    rows = QUERIES["tpch_q21"](spark, SF).collect()
    con = _duck()
    # recompute the waited set row-by-row in plain SQL and compare totals
    total = con.execute(
        """
        SELECT COUNT(*) FROM lineitem l1
        JOIN orders o ON l1.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        """
    ).fetchone()[0]
    assert sum(r["numwait"] for r in rows) == total


def test_tpch_q15_max_revenue_equality(spark):
    """The returned supplier(s) carry exactly the quarter's max revenue —
    the decimal-exact equality the gate relies on."""
    rows = QUERIES["tpch_q15"](spark, SF).collect()
    assert len({round(r["total_revenue"], 4) for r in rows}) == 1
