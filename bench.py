"""Benchmark: run the declared query inventory at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line.

Each query executes to a noop sink (full plan runs, no driver collect).
"""

from __future__ import annotations

import json
import os
import time

from espkinesis_spark import queries
from espkinesis_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="espkinesis_bench")

    registry = queries.registry()
    # warm up the JVM / parquet footers once
    registry["dq13"](spark, sf_dir).collect()
    # ... and the Python worker pool (first pandas/Arrow query otherwise pays
    # the ~2s daemon spawn inside its measured time)
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    # ... and the command-stream replay fixture (one-time materialization is
    # fixture prep, not the command plane under measurement)
    from espkinesis_spark.streaming.jobs import _command_lines_dir

    cmd_dir = _command_lines_dir(spark, sf_dir)
    # ... and the streaming machinery (FileStreamSource, state store, memory
    # sink) so the alphabetically-first st_* query isn't charged session setup
    warm = (
        spark.readStream.schema("cmd_id long, ts timestamp, raw string")
        .parquet(cmd_dir)
        .groupBy()
        .count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("__bench_warm")
        .trigger(availableNow=True)
        .start()
    )
    warm.awaitTermination()

    timings: dict[str, float] = {}
    for name in sorted(registry):
        start = time.perf_counter()
        df = registry[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - start, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "declared_query_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
