"""Randomized differential fuzz of the STREAMING surface (VERDICT r12 #3).

The fourteen relational fuzzer families randomize the QUERY and hold the
execution model fixed; this suite holds the query simple and randomizes
the one dimension they are structurally blind to — MICRO-BATCH
BOUNDARIES. Each example draws a seeded random partition of a fixture
into k batches of random (possibly wildly skewed, possibly empty) sizes,
replays it under availableNow, and asserts the streamed result equals
the one-shot batch computation over the same rows. Batch-boundary and
state-carryover bugs — partial aggregates dropped between triggers,
dedup state not consulted across batches, a sink leg that double-writes
a replayed batch — are exactly the class a fixed 3-chunk replay
(tests/test_streaming.py's multibatch tests) can miss when the bug needs
a specific boundary placement.

Three families, one per streaming execution mode the engine uses:
 1. complete-mode grouped aggregation (streaming-agg state accumulates
    partials across triggers) — random filter + group key + exact
    aggregates over events;
 2. append-mode stateless transform drained to a parquet store (the
    extraction-drain shape) — random projection + filter over documents,
    exact count pins no-duplication, set compare pins no-loss;
 3. append-mode streaming dedup (dropDuplicates state consulted ACROSS
    batches) — the input is the documents table unioned with a seeded
    sample of itself, so true duplicates straddle random batch
    boundaries; the survivor SET must equal batch-distinct, and the
    result count must equal the distinct key count (state, not
    per-batch dedup).

Determinism discipline: aggregates are order-exact (count, integer sum,
min/max selection on doubles) — streaming's incremental fold then equals
the batch fold regardless of boundary placement; no float accumulation,
no countDistinct (unsupported in streaming aggs).

Boundary randomization: rows hash to [0, 1000) via a SEEDED xxhash64
salt, and k-1 random cutpoints carve that range into k batches — so
batch sizes are random, skewed, and occasionally EMPTY (an empty batch
is a corner: the chunk writes no file and the trigger count drops, which
the streamed-equals-batch contract must survive).
"""

from __future__ import annotations

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from espkinesis_spark.tables import load_table

_uniq = itertools.count()

_FUZZ_SETTINGS = dict(
    max_examples=8,  # each example runs a chunk write + a streaming replay
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def stream_fuzz_ctx(spark, sf_dir, tmp_path_factory):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    # one scan each; every example re-uses the checkpointed rows
    return ev.localCheckpoint(eager=True), docs.localCheckpoint(eager=True), tmp_path_factory


def _random_boundary_source(spark, tmp_path_factory, df, key_col, spec):
    """Write ``df`` into k seeded-random-sized chunks and return a
    streaming source replaying one chunk file per micro-batch."""
    salt, cuts = spec["salt"], sorted(set(spec["cuts"]))
    h = F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(1000))
    chunk = F.lit(0)
    for c in cuts:
        chunk = chunk + (h >= F.lit(c)).cast("int")
    chunk_dir = tmp_path_factory.mktemp(f"sfuzz{next(_uniq)}")
    # one task per chunk value -> one file per non-empty chunk, so the
    # replay's batch boundaries ARE the drawn cutpoints
    (
        df.withColumn("__c", chunk)
        .repartition("__c")
        .write.partitionBy("__c")
        .mode("overwrite")
        .parquet(str(chunk_dir / "data"))
    )
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunk_dir / "data"))
        .select(df.columns)
    )


def _run_available_now(stream_df, mode, spark, sink=None):
    """Drive a stream to completion; return the result DataFrame."""
    name = f"sfuzz_q{next(_uniq)}"
    w = stream_df.writeStream.outputMode(mode).trigger(availableNow=True)
    if sink is None:
        q = w.format("memory").queryName(name).start()
        q.awaitTermination()
        return spark.table(name)
    q = (
        w.format("parquet")
        .option("path", str(sink / "data"))
        .option("checkpointLocation", str(sink / "ckpt"))
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(stream_df.schema).parquet(str(sink / "data"))


_BOUNDS = {
    "salt": st.integers(min_value=0, max_value=2**31),
    "cuts": st.lists(
        st.integers(min_value=0, max_value=1000), min_size=1, max_size=5
    ),
}

_AGG_SPEC = st.fixed_dictionaries(
    {
        **_BOUNDS,
        "group": st.sampled_from(["event_type", "user_mod", "both"]),
        "mod": st.integers(min_value=2, max_value=9),
        "u_op": st.sampled_from(["<", ">=", "none"]),
        "u_lit": st.integers(min_value=0, max_value=200),
    }
)


@given(spec=_AGG_SPEC)
@settings(**_FUZZ_SETTINGS)
def test_complete_mode_agg_invariant_to_batch_boundaries(spark, stream_fuzz_ctx, spec):
    ev, _, tmp = stream_fuzz_ctx

    def transform(df):
        if spec["u_op"] != "none":
            df = df.filter(F.expr(f"user_id {spec['u_op']} {spec['u_lit']}"))
        keys = {
            "event_type": [F.col("event_type").alias("k1")],
            "user_mod": [F.pmod("user_id", F.lit(spec["mod"])).alias("k1")],
            "both": [
                F.col("event_type").alias("k1"),
                F.pmod("user_id", F.lit(spec["mod"])).alias("k2"),
            ],
        }[spec["group"]]
        return df.groupBy(*keys).agg(
            F.count("*").cast("long").alias("n"),
            F.sum("user_id").cast("long").alias("su"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    src = _random_boundary_source(spark, tmp, ev, "event_id", spec)
    got = {tuple(r) for r in _run_available_now(transform(src), "complete", spark).collect()}
    want = {tuple(r) for r in transform(ev).collect()}
    assert got == want


_PROJ_SPEC = st.fixed_dictionaries(
    {
        **_BOUNDS,
        "c_op": st.sampled_from(["<", ">=", "none"]),
        "c_lit": st.integers(min_value=0, max_value=4000),
        "proj": st.sampled_from(["len", "head", "id_only"]),
    }
)


@given(spec=_PROJ_SPEC)
@settings(**_FUZZ_SETTINGS)
def test_append_mode_drain_invariant_to_batch_boundaries(
    spark, stream_fuzz_ctx, spec, tmp_path_factory
):
    _, docs, tmp = stream_fuzz_ctx

    def transform(df):
        if spec["c_op"] != "none":
            df = df.filter(F.expr(f"n_chars {spec['c_op']} {spec['c_lit']}"))
        return {
            "len": df.select("doc_id", F.length("text").cast("long").alias("v")),
            "head": df.select("doc_id", F.substring("text", 1, 16).alias("v")),
            "id_only": df.select("doc_id"),
        }[spec["proj"]]

    src = _random_boundary_source(spark, tmp, docs, "doc_id", spec)
    sink = tmp_path_factory.mktemp(f"sfuzz_sink{next(_uniq)}")
    drained = _run_available_now(transform(src), "append", spark, sink=sink)
    want_df = transform(docs)
    # exact count pins no-duplication (a replayed batch written twice
    # would survive a set compare); the set compare pins no-loss
    assert drained.count() == want_df.count()
    assert {tuple(r) for r in drained.collect()} == {
        tuple(r) for r in want_df.collect()
    }


_DEDUP_SPEC = st.fixed_dictionaries(
    {
        **_BOUNDS,
        "dup_mod": st.integers(min_value=2, max_value=5),
    }
)


@given(spec=_DEDUP_SPEC)
@settings(**_FUZZ_SETTINGS)
def test_streaming_dedup_state_spans_random_batch_boundaries(
    spark, stream_fuzz_ctx, spec
):
    _, docs, tmp = stream_fuzz_ctx
    # duplicate a seeded subset of keys, then RE-KEY the union rows so the
    # two copies of one doc_id hash to different chunks — true duplicates
    # straddle the random batch boundaries and only cross-batch dedup
    # STATE can drop the late copy
    dupes = docs.filter(F.pmod(F.xxhash64("doc_id", F.lit(spec["salt"])), F.lit(spec["dup_mod"])) == 0)
    union = docs.select("doc_id", "n_chars").unionAll(dupes.select("doc_id", "n_chars"))
    union = union.withColumn("row_key", F.monotonically_increasing_id()).localCheckpoint(
        eager=True
    )
    src = _random_boundary_source(spark, tmp, union, "row_key", spec)
    deduped = src.select("doc_id", "n_chars").dropDuplicates(["doc_id"])
    got = _run_available_now(deduped, "append", spark)
    # count == distinct keys proves the SECOND copy was dropped even when
    # it arrived in a later micro-batch (state, not per-batch dedup)
    assert got.count() == docs.count()
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in docs.select("doc_id", "n_chars").collect()
    }
