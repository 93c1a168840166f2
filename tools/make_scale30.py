"""Regenerate the 30x scale-ladder replica dataset at /tmp/espk_scale30.

The ladder (NOTES.md) measures wall-time ratios of the heaviest registry
entries at 30x the sf0.1 data to verify linear-or-sublinear scaling.
/tmp is routinely cleared between sessions, so the recipe lives here.

Replica discipline (keeps measured work honest at 30x):
- keys are SHIFTED per replica (ids stay unique; joins/groupBys grow
  linearly instead of colliding 30 copies onto one key),
- document texts get per-(doc, replica) filler whose length is
  PROPORTIONAL to the document (~2/3 extra words), drawn as a
  pseudo-random WALK over a BOUNDED 65k-word vocabulary: the word
  3-gram shingle sets are then unique per (doc, replica) so
  cross-replica Jaccard drops below the dedup threshold and near-dup
  candidate pairs stay LINEAR in replicas (a short constant suffix
  leaves the 30 copies mutual near-dups — replicas²/2 candidate pairs,
  quadratic), while the corpus VOCABULARY stays bounded like natural
  text (per-doc-unique filler words would grow the vocab linearly with
  the corpus, which Heaps' law says never happens — and which silently
  turns every vocab-sized-state claim into corpus-sized state),
- lineitem prices are perturbed per replica (quantile/stat distributions
  widen instead of degenerating to 30 identical multisets),
- event timestamps are KEPT (calendar-sized aggregations must stay
  calendar-sized — that is their scale claim).

Usage: python tools/make_scale30.py [SRC_SF_DIR] [OUT_DIR] [REPLICAS]
"""

from __future__ import annotations

import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/espk_scale30"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    import os

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    copies = {
        "lineitem": f"""
            SELECT l_orderkey + r.i * 10000000 AS l_orderkey,
                   l_partkey + r.i * 1000000 AS l_partkey,
                   l_suppkey + r.i * 100000 AS l_suppkey,
                   l_linenumber, l_quantity,
                   round(l_extendedprice * (1.0 + (r.i % 7) * 0.0013), 2)
                       AS l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{src}/lineitem.parquet', range({reps}) r(i)""",
        "orders": f"""
            SELECT o_orderkey + r.i * 10000000 AS o_orderkey,
                   o_custkey + r.i * 1000000 AS o_custkey,
                   o_orderstatus,
                   round(o_totalprice * (1.0 + (r.i % 7) * 0.0013), 2)
                       AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM '{src}/orders.parquet', range({reps}) r(i)""",
        "documents": f"""
            SELECT doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM (
              -- src_doc_id keeps the filler hash unambiguous: referencing
              -- `doc_id` here would hit DuckDB lateral alias resolution
              -- against the shifted `doc_id` alias in the same SELECT
              -- list (deterministic either way, but version-fragile)
              SELECT src_doc_id + r.i * 1000000 AS doc_id,
                     text || ' ' || array_to_string(list_transform(
                         range(greatest(n_chars // 8, 2)),
                         j -> substr(md5(CAST(
                             (src_doc_id * 131 + r.i * 7919
                              + j * (src_doc_id % 97 + 2))
                             % 65536 AS VARCHAR)), 1, 6)
                     ), ' ') AS text,
                     lang, source
              FROM (SELECT doc_id AS src_doc_id, text, lang, source, n_chars
                    FROM '{src}/documents.parquet'), range({reps}) r(i)
            )""",
        "embeddings": f"""
            SELECT vec_id + r.i * 1000000 AS vec_id, embedding, label
            FROM '{src}/embeddings.parquet', range({reps}) r(i)""",
        "events": f"""
            SELECT event_id + r.i * 10000000 AS event_id, ts,
                   user_id + r.i * 100000 AS user_id,
                   event_type, value, props
            FROM '{src}/events.parquet', range({reps}) r(i)""",
        # dims replicated with the SAME key shifts the fact tables use
        # (supplier↔l_suppkey 1e5, part↔l_partkey 1e6, customer↔o_custkey
        # 1e6) so the relational ladder entries keep their real join
        # selectivity at 30x; nation keys are NOT shifted — the nation
        # dim is genuinely constant-sized at any SF
        "supplier": f"""
            SELECT s_suppkey + r.i * 100000 AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM '{src}/supplier.parquet', range({reps}) r(i)""",
        "customer": f"""
            SELECT c_custkey + r.i * 1000000 AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM '{src}/customer.parquet', range({reps}) r(i)""",
        "part": f"""
            SELECT p_partkey + r.i * 1000000 AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM '{src}/part.parquet', range({reps}) r(i)""",
        "nation": f"SELECT * FROM '{src}/nation.parquet'",
        "region": f"SELECT * FROM '{src}/region.parquet'",
    }
    for table, sql in copies.items():
        con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")
    make_mm(con, src, f"{out}_mm", reps)


def make_mm(con, src: str, out: str, reps: int) -> None:
    """Perceptual-ladder documents variant (<out>_mm/documents.parquet).

    The image/audio/video fingerprints sample the document PREFIX, so the
    main recipe's suffix filler leaves every replica a TRUE prefix
    near-dup of its source — a ladder on it measures output size (true
    pairs are quadratic in replicas by construction), not throughput.
    This variant prepends a DISTINCT-LENGTH prefix per replica (length
    == replica index): no two replicas of a doc sample the same original
    positions, so true near-dup pairs stay linear. Equal-LENGTH distinct
    prefixes are NOT enough — all i>=1 replicas would stay mutually
    aligned and pair up quadratically (measured: 1.2M pairs vs 4.2k)."""
    import os

    os.makedirs(out, exist_ok=True)
    # prefix material must cover the longest replica index (repeat count
    # scales with reps — a fixed repeat(.., 2) saturates at 64 chars and
    # re-aligns replicas i >= 64, review catch), and n_chars is computed
    # from the PREFIXED text via a subquery (length(text) in the same
    # SELECT list binds to the base column under DuckDB lateral-alias
    # rules — the same ambiguity fixed in the main documents recipe)
    rep_n = reps // 32 + 2
    con.execute(
        f"""
        COPY (
          SELECT doc_id, text, lang, source,
                 CAST(length(text) AS BIGINT) AS n_chars
          FROM (
            -- src_doc_id aliases the base column in a subquery so the
            -- md5 seed can never bind to the shifted doc_id alias under
            -- DuckDB lateral-alias rules (same fix as the main recipe)
            SELECT src_doc_id + r.i * 1000000 AS doc_id,
                   CASE WHEN r.i = 0 THEN text
                        ELSE substr(repeat(md5(CAST(r.i * 7919
                                                    + src_doc_id % 97
                                                    AS VARCHAR)), {rep_n}),
                                    1, CAST(r.i AS INT)) || text END AS text,
                   lang, source
            FROM (SELECT doc_id AS src_doc_id, text, lang, source
                  FROM '{src}/documents.parquet'), range({reps}) r(i)
          )
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)"""
    )
    n = con.execute(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    print(f"mm documents: {n} rows -> {out}")


if __name__ == "__main__":
    main()
