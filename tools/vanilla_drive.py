"""Drive the registry through a PLAIN SparkSession with full value-level
oracle comparison — the mirror of the driver's own environment, which
does NOT use our tuned get_spark() (the t2 gate builds a vanilla
``SparkSession.builder.master("local[*]")`` session).

tests/test_vanilla_session.py covers the conf-sensitivity edges; this
tool runs the WHOLE registry (or just the first-50 correctness window)
against DuckDB with the same compare the parity suite uses, on a session
we did not build. ensure_session_confs at the load_table edge is what
makes this hold.

Usage: python tools/vanilla_drive.py [SF_DIR] [window|all]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    scope = sys.argv[2] if len(sys.argv) > 2 else "window"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("vanilla-drive")
        .getOrCreate()
    )
    from espkinesis_spark import oracles, queries
    from tests.oracle_util import compare, duck_connection

    reg = queries.registry()
    names = list(reg)[:50] if scope == "window" else list(reg)
    con = duck_connection(sf_dir)
    t0 = time.time()
    failed = []
    for i, name in enumerate(names, 1):
        try:
            sdf = reg[name](spark, sf_dir)
            if name in oracles.ORACLES:
                compare(sdf, con.execute(oracles.ORACLES[name]).df())
            else:
                assert sdf.count() >= 0
        except Exception as exc:
            failed.append(name)
            print(f"FAIL {name}: {exc}")
    print(
        f"{len(names) - len(failed)}/{len(names)} green in "
        f"{time.time() - t0:.0f}s ({scope}, {sf_dir})"
    )
    if failed:
        raise SystemExit(f"failures: {failed}")


if __name__ == "__main__":
    main()
