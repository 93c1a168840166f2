"""Benchmark: run the declared query inventory at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line.

Each query executes to a noop sink (full plan runs, no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

from espkinesis_spark import queries
from espkinesis_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="espkinesis_bench")

    registry = queries.registry()
    # Warm-ups are best-effort: a broken warm-up should degrade timings, not
    # kill the bench (the JSON line must always be emitted).
    try:
        # warm up the JVM / parquet footers once
        registry["dq13"](spark, sf_dir).collect()
        # ... and the Python worker pool (first pandas/Arrow query otherwise
        # pays the ~2s daemon spawn inside its measured time)
        spark.range(64).repartition(32).mapInPandas(
            lambda it: it, schema="id long"
        ).write.mode("overwrite").format("noop").save()
        # ... and the command-stream replay fixture (one-time materialization
        # is fixture prep, not the command plane under measurement)
        from espkinesis_spark.streaming.jobs import _command_lines_dir

        cmd_dir = _command_lines_dir(spark, sf_dir)
        # ... and the streaming machinery (FileStreamSource, state store,
        # memory sink) so the alphabetically-first st_* query isn't charged
        # session setup
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
    except Exception as exc:  # noqa: BLE001
        # stderr — stdout must carry exactly the one JSON line
        print(f"warm-up failed (continuing unwarmed): {exc}", file=sys.stderr)

    # Per-query error isolation: one broken query must not destroy the whole
    # bench artifact (round 4's bench died mid-loop on a single
    # AnalysisException and produced no numbers at all). Failures are
    # recorded in "errors" and the JSON line is ALWAYS printed.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(registry):
        start = time.perf_counter()
        try:
            df = registry[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
        except Exception as exc:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            continue
        timings[name] = round(time.perf_counter() - start, 4)

    # Same-artifact noise control (VERDICT r5 #4): the box this bench runs
    # on sometimes carries co-located load that inflates the headline total
    # ~30-40%. Rerun the 10 heaviest queries immediately and record both
    # numbers — a large first/rerun gap marks the FIRST pass as hot, not a
    # code regression.
    rerun: dict[str, float] = {}
    for name in sorted(timings, key=timings.get, reverse=True)[:10]:
        start = time.perf_counter()
        try:
            registry[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as exc:  # noqa: BLE001
            print(f"rerun of {name} failed: {exc}", file=sys.stderr)
            continue
        rerun[name] = round(time.perf_counter() - start, 4)
    print(json.dumps(build_output(timings, errors, rerun, sf)))


def build_output(
    timings: dict[str, float],
    errors: dict[str, str],
    rerun: dict[str, float],
    sf: str,
) -> dict:
    """Assemble the one-line JSON artifact. Truncation-proofing (VERDICT
    r6 #4): BENCH_r06 survived only as the TAIL of the line, losing the
    head-positioned totals. Every headline scalar goes FIRST (before the
    big per-query map) and the same scalars are mirrored again AFTER it
    under tail_* keys — whichever end of the line survives a capture
    truncation, the summary is recoverable."""
    total = round(sum(timings.values()), 4)
    out = {
        "metric": "declared_query_total_wall",
        "value": total,
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "rerun_top10_first_pass_sec": round(
            sum(timings[n] for n in rerun), 4
        ),
        "rerun_top10_sec": round(sum(rerun.values()), 4),
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "queries": timings,
        "rerun_top10": rerun,
    }
    if errors:
        out["errors"] = errors
    out["tail_total_sec"] = total
    out["tail_n_queries"] = len(timings)
    out["tail_n_errors"] = len(errors)
    return out


if __name__ == "__main__":
    main()
