"""Every oracle SQL must parse AND execute in DuckDB against empty
tables with the production schemas — a seconds-fast guard that catches
SQL syntax/typing regressions without spinning Spark, and pins the
empty-corpus behavior of every registered oracle (the live registry
count — no divide-by-zero, no bad casts on zero rows)."""

from __future__ import annotations

import duckdb
import pytest

SCHEMAS = {
    "region": "r_regionkey BIGINT, r_name VARCHAR",
    "nation": "n_nationkey INT, n_name VARCHAR, n_regionkey INT",
    "customer": "c_custkey BIGINT, c_name VARCHAR, c_nationkey INT, "
                "c_acctbal DOUBLE, c_mktsegment VARCHAR",
    "supplier": "s_suppkey BIGINT, s_name VARCHAR, s_nationkey INT, s_acctbal DOUBLE",
    "part": "p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR, p_type VARCHAR, "
            "p_size INT, p_retailprice DOUBLE",
    "orders": "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR, "
              "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority VARCHAR",
    "lineitem": "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
                "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
                "l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR, "
                "l_linestatus VARCHAR, l_shipdate TIMESTAMP",
    "events": "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, "
              "value DOUBLE, props VARCHAR",
    "documents": "doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, "
                 "n_chars BIGINT",
    "embeddings": "vec_id BIGINT, embedding FLOAT[], label INT",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t, schema in SCHEMAS.items():
        c.sql(f"CREATE TABLE {t} ({schema})")
    return c


def test_every_oracle_executes_on_empty_tables(con):
    import __spark_entry__ as em

    failures = []
    for name, sql in em.oracle_sql().items():
        try:
            con.sql(sql).df()
        except Exception as e:  # noqa: BLE001 — full census wanted
            failures.append(f"{name}: {str(e).splitlines()[0][:120]}")
    assert not failures, failures
