"""Magnitude regression gate (the r8-ADVICE lesson made permanent).

The parity suite compares the Spark query against a DuckDB oracle that
REPLAYS THE SAME expression — so a wrong descale (ex_disjunctive_revenue
once reported revenue 100× small because a Q17 integral-divide template
was copied into a query whose cents were already final) passes every
value-hash. This gate breaks the mirror: each money/ratio output is
re-derived with an INDEPENDENT plain-float SQL formulation and compared
within a loose-but-unit-tight tolerance (0.1% — generous for per-line
rounding differences, fatal for any 10×/100× unit error).
"""

from __future__ import annotations

import duckdb
import pytest

from espkinesis_spark import queries

# name -> (spark result extractor, independent plain-float DuckDB SQL)
CASES = {
    "ex_disjunctive_revenue": (
        lambda rows: rows[0]["revenue"],
        """SELECT SUM(l_extendedprice * (1 - l_discount))
           FROM lineitem JOIN part ON p_partkey = l_partkey
           WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
                  AND l_quantity BETWEEN 1 AND 11)
              OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
                  AND l_quantity BETWEEN 10 AND 20)
              OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
                  AND l_quantity BETWEEN 20 AND 30)""",
    ),
    "ex_small_qty_revenue": (
        lambda rows: rows[0]["avg_yearly"],
        """SELECT SUM(l_extendedprice) / 7.0 FROM (
             SELECT l.l_extendedprice, l.l_quantity,
                    AVG(l.l_quantity) OVER (PARTITION BY l.l_partkey) AS aq
             FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
             WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3'))
           WHERE l_quantity < 0.2 * aq""",
    ),
    "ex_forecast_revenue": (
        lambda rows: rows[0]["revenue"],
        """SELECT SUM(l_extendedprice * l_discount) FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
             AND l_discount BETWEEN 0.0499999 AND 0.0700001
             AND l_quantity < 24""",
    ),
    "ex_volume_shipping": (
        lambda rows: sum(r["revenue"] for r in rows),
        """SELECT SUM(l.l_extendedprice * (1 - l.l_discount))
           FROM lineitem l
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
           JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
           WHERE n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
             AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
             AND n1.n_name <> n2.n_name
             AND l.l_shipdate >= TIMESTAMP '1996-01-01'
             AND l.l_shipdate <  TIMESTAMP '1998-01-01'""",
    ),
    "ex_pricing_summary": (
        lambda rows: sum(r["sum_disc_price"] for r in rows),
        """SELECT SUM(l_extendedprice * (1 - l_discount)) FROM lineitem
           WHERE l_shipdate <= TIMESTAMP '1998-09-01'""",
    ),
    "ex_product_profit": (
        lambda rows: sum(r["profit"] for r in rows),
        """SELECT SUM(l.l_extendedprice * (1 - l.l_discount)
                      - l.l_quantity * p.p_retailprice * 0.6)
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
           WHERE p.p_name LIKE '%blue%'""",
    ),
}


@pytest.fixture(scope="module")
def duck_raw(sf_dir):
    con = duckdb.connect()
    for t in ["lineitem", "part", "orders", "customer", "supplier", "nation"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(CASES))
def test_money_magnitude_matches_independent_float(spark, sf_dir, duck_raw, name):
    extract, sql = CASES[name]
    rows = queries.registry()[name](spark, sf_dir).collect()
    got = extract(rows)
    want = duck_raw.execute(sql).fetchone()[0]
    assert want is not None and want != 0
    assert abs(got - want) <= abs(want) * 1e-3, (
        f"{name}: spark={got} vs independent float={want} "
        f"(ratio {got / want:.4g} — unit/descale error?)"
    )


def test_market_share_is_a_fraction(spark, sf_dir):
    rows = queries.registry()["ex_market_share"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["mkt_share"] <= 1.0


def test_embed_gram_trace_invariant(spark, sf_dir, duck_raw):
    """Physical invariant independent of the mirrored fixed-point math:
    for (near-)unit vectors, trace(cov) = avg||x||^2 - ||mean||^2 ≈ 1.
    A wrong EG_QUANT descale (the disjunctive-bug class) would shift
    this by powers of 10."""
    rows = queries.registry()["ex_embed_gram"](spark, sf_dir).collect()
    tr = sum(r["cov"] for r in rows if r["dim_i"] == r["dim_j"])
    con = duckdb.connect()
    avg_norm2, = con.execute(
        f"SELECT avg(list_dot_product(embedding, embedding))"
        f" FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()
    assert abs(tr - avg_norm2) < 0.05, (tr, avg_norm2)
