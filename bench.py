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

    # Noise control (VERDICT r11 #2): two same-code r11 runs differed 9%
    # overall with individual >1s entries drifting >1.5x — single-pass
    # per-entry times can no longer distinguish a regression from VM
    # noise. Re-run the TOP_N heaviest entries so each has RERUN_K
    # samples, and report per-entry MEDIANS plus a measured noise
    # estimate. Rounds are interleaved (entry1..entryN, then again) so a
    # co-located load spike smears across entries instead of poisoning
    # one entry's whole sample set.
    samples: dict[str, list[float]] = {}
    top = sorted(timings, key=timings.get, reverse=True)[:TOP_N]
    for name in top:
        samples[name] = [timings[name]]
    for _ in range(RERUN_K - 1):
        for name in top:
            start = time.perf_counter()
            try:
                registry[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
            except Exception as exc:  # noqa: BLE001
                print(f"rerun of {name} failed: {exc}", file=sys.stderr)
                continue
            samples[name].append(round(time.perf_counter() - start, 4))
    print(json.dumps(build_output(timings, errors, samples, sf)))


TOP_N = 20  # heaviest entries re-sampled for medians
RERUN_K = 3  # samples per re-sampled entry (incl. the first pass)


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


def build_output(
    timings: dict[str, float],
    errors: dict[str, str],
    samples: dict[str, list[float]],
    sf: str,
) -> dict:
    """Assemble the one-line JSON artifact.

    Truncation-proofing (VERDICT r6 #4): BENCH_r06 survived only as the
    TAIL of the line, losing the head-positioned totals. Every headline
    scalar goes FIRST (before the big per-query map) and the same
    scalars are mirrored again AFTER it under tail_* keys — whichever
    end of the line survives a capture truncation, the summary is
    recoverable.

    Median-based figures (VERDICT r11 #2): the headline "value" is the
    MEDIAN-BLENDED total — per-entry median wall time for the re-sampled
    heavy entries, first-pass time for the light rest. "queries" maps
    every entry to its headline figure (median where sampled), so
    BENCH_rN vs BENCH_rN-1 per-entry diffs compare medians, not single
    draws. "noise_rel_spread_{median,max}" record the observed
    (max-min)/median across each sampled entry's draws — the round's
    measured noise band; a per-entry diff inside that band is noise,
    not regression. "first_pass_total_sec" keeps the old single-pass
    semantics for cross-round continuity with r11 and earlier."""
    medians = {n: round(_median(s), 4) for n, s in samples.items() if s}
    headline = {**timings, **medians}
    total = round(sum(headline.values()), 4)
    first_pass_total = round(sum(timings.values()), 4)
    spreads = [
        (max(s) - min(s)) / _median(s)
        for s in samples.values()
        if len(s) >= 2 and _median(s) > 0
    ]
    out = {
        "metric": "declared_query_total_wall",
        "value": total,
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "first_pass_total_sec": first_pass_total,
        "median_samples_k": RERUN_K,
        "median_entries_n": len(medians),
        "noise_rel_spread_median": round(_median(spreads), 4) if spreads else None,
        "noise_rel_spread_max": round(max(spreads), 4) if spreads else None,
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "queries": headline,
        "first_pass": timings,
        "samples": samples,
    }
    if errors:
        out["errors"] = errors
    out["tail_total_sec"] = total
    out["tail_n_queries"] = len(timings)
    out["tail_n_errors"] = len(errors)
    return out


if __name__ == "__main__":
    main()
