"""The Engine's SQL surface: Spark-SQL forms of headline queries must equal
their DataFrame-API forms (same Catalyst plans underneath)."""

from __future__ import annotations

import pytest

from espkinesis_spark import queries
from espkinesis_spark.engine import Engine

SQL_FORMS = {
    "dq21": """SELECT l_returnflag, l_linestatus,
        ROUND(SUM(l_quantity), 2) AS sum_qty,
        ROUND(SUM(l_extendedprice), 2) AS sum_base,
        ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
        ROUND(AVG(l_discount), 4) AS avg_disc,
        COUNT(*) AS n
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""",
    "dq22": """SELECT n.n_name,
        ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name""",
    "dq12": """SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_v
        FROM events GROUP BY event_type""",
    "dq17": """SELECT CASE WHEN value BETWEEN 1000 AND 2000 THEN 'valid'
                    WHEN value = -1 THEN 'skip' ELSE 'invalid' END AS cls,
        COUNT(*) AS n FROM events GROUP BY 1""",
    "dq25": """SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
}


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    e = Engine(spark)
    e.register_tables(sf_dir)
    return e


@pytest.mark.parametrize("name", sorted(SQL_FORMS))
def test_sql_form_equals_dataframe_form(engine, spark, sf_dir, name):
    via_sql = {tuple(r) for r in engine.sql(SQL_FORMS[name]).collect()}
    via_df = {tuple(r) for r in queries.registry()[name](spark, sf_dir).collect()}
    assert via_sql == via_df
    if name != "dq25":  # dq25 is legitimately empty at sf0.001 (all customers order)
        assert len(via_df) > 0
