"""Driver-checkable streaming queries.

Each job replays a file source with ``trigger(availableNow=True)`` into a
memory sink and returns the drained result as a batch DataFrame. The three
jobs are the streaming forms of batch queries with DuckDB oracles, so the
driver's correctness gate checks streaming semantics too:

  * latest_per_user_stream  == DQ-07 (last-value-per-key, A2/A3)
  * window_counts_stream    == hourly tumbling counts (A4/T3 analog)
  * override_asof_stream    == DQ-09 (stateful as-of, A5) via
    applyInPandasWithState
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from espkinesis_spark.session import ensure_session_confs
from espkinesis_spark.streaming import state as st
from espkinesis_spark.tables import SCHEMAS, table_path

def _events_raw_schema(ts_dtype: str) -> T.StructType:
    """Stream-reader schema matching the on-disk ``ts`` encoding.

    FileStreamSource needs an explicit schema, so unlike the batch edge
    (tables._normalize_timestamps, which adapts to the footer) we must
    probe the encoding first and declare the matching raw type: nanos →
    long, µs-NTZ → timestamp_ntz, µs/ms-UTC → timestamp.
    """
    raw = {
        "bigint": T.LongType(),
        "timestamp_ntz": T.TimestampNTZType(),
    }.get(ts_dtype, T.TimestampType())
    return T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", raw)
            for f in SCHEMAS["events"].fields
        ]
    )


def _normalize_ts(df: DataFrame, ts_dtype: str) -> DataFrame:
    if ts_dtype == "bigint":  # nanos-as-long; testdata is µs-aligned
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_dtype == "timestamp_ntz":  # pure reinterpretation under UTC zone
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _ensure_symlink(src_file: str, link: str) -> None:
    # lexists (not exists) so a dangling link to regenerated testdata is
    # detected and replaced; EEXIST tolerated for concurrent sessions racing
    # the check-then-act.
    if os.path.lexists(link):
        if os.path.realpath(link) == os.path.realpath(src_file):
            return
        os.unlink(link)
    try:
        os.symlink(src_file, link)
    except FileExistsError:
        pass


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FileStreamSource requires a *directory*; expose the single parquet
    # file through a symlink dir (testdata itself is read-only).
    ensure_session_confs(spark)
    src_file = os.path.abspath(table_path(sf_dir, "events"))
    stream_dir = os.path.join(
        tempfile.gettempdir(), "espk_stream", src_file.strip("/").replace("/", "_")
    )
    os.makedirs(stream_dir, exist_ok=True)
    _ensure_symlink(src_file, os.path.join(stream_dir, "events.parquet"))
    # probe the on-disk ts encoding via a footer-only batch read, then
    # declare the matching stream schema and normalize at the edge
    ts_dtype = dict(spark.read.parquet(src_file).dtypes)["ts"]
    raw = spark.readStream.schema(_events_raw_schema(ts_dtype)).parquet(stream_dir)
    return _normalize_ts(raw, ts_dtype)


# Executed micro-batch physical plans, keyed by query name — recorded at
# every drain site so tools/plan_sweep.py's streaming leg can apply the
# same red-flag greps the batch entries get (a streaming DataFrame's plan
# only materializes once a query runs, so the sweep can't explain() the
# unstarted frame).
LAST_STREAM_PLANS: dict[str, str] = {}


def _record_stream_plan(query) -> None:
    """Capture the LAST executed micro-batch's physical plan (best-effort:
    plan capture must never fail the job itself)."""
    try:
        LAST_STREAM_PLANS[query.name] = query._jsq.explainInternal(False)
    except Exception:  # noqa: BLE001 — diagnostics only
        pass


def _fresh_store_error(exc: Exception) -> bool:
    """True iff a parquet read failure means "store not started yet".

    Only those shapes let the resume schema guard proceed without a
    stored schema; any other failure (corrupt footer, FS error) must
    propagate — skipping the guard on it would re-open the silent
    NULL-backfill hole the guard exists to close. Match on the
    structured error condition (stable across message-format changes),
    by its ROOT segment so a dotted sub-condition refinement (e.g.
    PATH_NOT_FOUND.SOMETHING in a future engine) still reads as fresh;
    substring match only as the fallback when the exception carries no
    condition. Fail-closed default.
    """
    # _LEGACY_ERROR_TEMP_1134 is "Unable to infer schema for <format> at
    # <paths>": a file-sink store whose _spark_metadata exists but lists
    # ZERO committed files (a prior leg that ran on an empty source)
    # raises through this legacy slot, not UNABLE_TO_INFER_SCHEMA —
    # found by the family-6 resume fuzzer's seam-at-zero draw. Nothing
    # is committed in that store, so there is nothing to schema-check.
    fresh = {
        "UNABLE_TO_INFER_SCHEMA",
        "PATH_NOT_FOUND",
        "_LEGACY_ERROR_TEMP_1134",
    }
    getter = getattr(exc, "getCondition", None) or getattr(
        exc, "getErrorClass", None
    )
    cond = getter() if getter is not None else None
    if cond is not None and cond.split(".")[0] in fresh:
        return True
    # Legacy slots get REASSIGNED proper condition names across Spark
    # releases (ADVICE r15): keying only on _LEGACY_ERROR_TEMP_1134
    # would fail closed on a future engine's legitimately-empty store.
    # The message shape "Unable to infer schema" is the stable signal
    # across that rename — but only when the condition is ABSENT or is
    # itself an unrecognized legacy slot. An exception carrying a
    # proper non-fresh condition stays non-fresh even if its message
    # (or an attached JVM cause chain) quotes the phrase: a rename of
    # the empty-store error lands on UNABLE_TO_INFER_SCHEMA, which the
    # condition set already accepts, so the widening is not needed
    # there and would re-open the guard on corrupt-store failures
    # (r16 review catch).
    if cond is None:
        return "Unable to infer schema" in str(exc) or any(
            c in str(exc) for c in fresh
        )
    if cond.startswith("_LEGACY_ERROR_TEMP"):
        return "Unable to infer schema" in str(exc)
    return False


def _drain_to_parquet(
    df: DataFrame, name: str, *, base: str | None = None, resume: bool = False
) -> DataFrame:
    """Append-mode drain for CORPUS-SIZED extraction stores (token /
    span-hash tables): a parquet file sink, read back as a batch frame.

    The memory sink collects every row to the driver single-threaded —
    fine for sketch/fingerprint-sized stores, but a corpus-sized store
    through it reads as the op's cost at scale (st_bm25's first ladder:
    48x wall at ~50x tokens, almost all drain). The file sink writes
    executor-side in parallel and IS the production shape — a streaming
    extraction job lands its narrow tables in a durable store, and the
    analysis reads that store (measured: st_bm25 48x -> ~8x).

    Two modes (VERDICT r11 #3):
      * fresh (default): rmtree the store+checkpoint first — hermetic,
        every call re-extracts. Right for the replay fixtures, WRONG for
        a production restart: at 100 TB a driver restart must not
        re-extract the corpus.
      * resume (``resume=True`` + a caller-stable ``base``): keep the
        checkpoint and sink. Spark's file sink is end-to-end
        exactly-once here — the checkpoint's offset log skips
        already-committed source batches on restart, a batch that was
        interrupted mid-write is REPLAYED and re-committed, and the
        sink's _spark_metadata manifest lists only committed files, so
        the read-back (which honors the manifest) never sees the
        orphaned partials. Pinned by the kill-mid-replay test in
        tests/test_streaming.py.

    Resume REFUSES a changed extraction schema (VERDICT r12 #5): a
    production restart often ships a code change, and if the projection
    gained or retyped a column the file sink would happily append
    new-schema files next to old-schema ones — the schema-pinned
    read-back then backfills NULLs into the new column for every
    already-extracted row, silently corrupting downstream analysis at
    exactly the scale where re-checking is unaffordable. So resume
    compares the store's committed schema (manifest-honoring read) with
    the incoming frame's and raises with both schemas named; the
    operator chooses explicitly — restore the old projection, or start
    a fresh base and re-extract/backfill.
    """
    import shutil

    if resume and base is None:
        # an applicationId-scoped default changes on every driver restart,
        # so a resume against it would never find the checkpoint and would
        # silently re-extract the corpus — the exact failure the mode
        # exists to prevent. Refuse loudly instead.
        raise ValueError("resume=True requires a caller-stable base path")
    spark = df.sparkSession
    if resume:
        existing = os.path.join(base, "data")
        # Checkpoint-consistency guard (found by the family-6 witness):
        # a store with COMMITTED batches but no checkpoint offsets is a
        # wrong-volume restore. Resuming it would renumber batches from
        # 0 and the file sink's _spark_metadata batch-id log would SKIP
        # them as already committed — benign if nothing changed, but
        # SILENT DATA LOSS the moment the restarted run packs new files
        # into a skipped batch id. Nothing duplicates through a kept
        # manifest (the sink skip closes that channel), so loss is the
        # only — and invisible — failure mode. Refuse loudly instead.
        sink_log = os.path.join(existing, "_spark_metadata")
        offsets = os.path.join(base, "ckpt", "offsets")

        def _entries(d: str) -> bool:
            return os.path.isdir(d) and any(
                not e.startswith(".") for e in os.listdir(d)
            )

        if _entries(sink_log) and not _entries(offsets):
            raise ValueError(
                f"resume refused: store '{existing}' has committed "
                f"batches but checkpoint '{offsets}' is missing or empty "
                f"— a restarted query would renumber batches and the "
                f"sink would skip or silently drop them; restore the "
                f"checkpoint that matches this store, or start a fresh "
                f"base (checkpoint and store live or die together)"
            )
        # ... and the MIRROR direction (review catch): a checkpoint whose
        # COMMITS log records completed batches next to a store with no
        # sink log means the store was lost — resuming would skip every
        # already-committed source batch and the rebuilt store would
        # permanently lack those rows while reading back cleanly. The
        # commits log (written AFTER the sink commit), not the offsets
        # log, is the signal: offsets-without-commits is just a crash
        # mid-first-batch, which is a legitimate replay-on-resume state.
        commits = os.path.join(base, "ckpt", "commits")
        if _entries(commits) and not _entries(sink_log):
            raise ValueError(
                f"resume refused: checkpoint '{commits}' records committed "
                f"batches but store '{existing}' has no sink metadata — "
                f"the store was lost or replaced, and resuming would skip "
                f"every committed source batch, permanently dropping its "
                f"rows; restore the store that matches this checkpoint, "
                f"or start a fresh base (checkpoint and store live or die "
                f"together)"
            )
        stored = None
        if os.path.isdir(existing):
            from pyspark.errors import AnalysisException

            try:
                stored = spark.read.parquet(existing).schema
            except AnalysisException as exc:
                if not _fresh_store_error(exc):
                    raise
        if stored is not None:
            want = {(f.name, f.dataType.simpleString()) for f in stored.fields}
            have = {(f.name, f.dataType.simpleString()) for f in df.schema.fields}
            if want != have:
                raise ValueError(
                    f"resume refused: extraction schema changed — store "
                    f"'{existing}' holds {sorted(want)} but the incoming "
                    f"stream projects {sorted(have)}; restore the old "
                    f"projection or start a fresh base (old rows would "
                    f"otherwise silently read NULL in added columns)"
                )
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    if base is None:
        # scope by application id: the memory sink was implicitly
        # per-session, a bare /tmp path is not — two concurrent sessions
        # (driver gate + a local run) would race on rmtree/write otherwise
        app_id = spark.sparkContext.applicationId
        base = os.path.join(tempfile.gettempdir(), "espk_drain", app_id, name)
    if not resume:
        shutil.rmtree(base, ignore_errors=True)
    out_dir, ckpt = os.path.join(base, "data"), os.path.join(base, "ckpt")
    query = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    _record_stream_plan(query)
    # a zero-row stream leaves no sink directory — materialize it so the
    # schema-pinned read returns an empty frame instead of failing
    os.makedirs(out_dir, exist_ok=True)
    return spark.read.schema(df.schema).parquet(out_dir)


# Target state rows per state-store partition. Each stateful-operator
# partition costs a fixed per-micro-batch overhead (task + store open /
# commit / snapshot), so the partition count should track the STATE
# cardinality, not the session's compute parallelism: at a 250k-key
# target a partition's store stays ~tens of MB while tiny replay
# fixtures derive 1-2 partitions instead of paying 8-32 stores per
# batch. Upper-bounded at 4x the cluster's default parallelism so a
# 100 TB key space still spreads over every core with skew headroom
# (state partitions are pinned at first checkpoint — oversizing beats
# resizing). r17 measurement note: at sf0.1 the choice measured FLAT
# across 1/2/4/8 partitions (the per-store overhead is no longer the
# floor after the r13 32->8 cut), so the derivation is a scale-story
# parameterization, not a local win.
STATE_ROWS_PER_PARTITION = 250_000


def _state_partitions(spark: SparkSession, source_rows: int | None) -> str:
    """Derived state-store partition count for one streaming query:
    ESPK_STREAM_STATE_PARTITIONS overrides; otherwise ceil(source_rows /
    STATE_ROWS_PER_PARTITION) — source rows upper-bound the state keys —
    clamped to [1, 4 x defaultParallelism]. An unknown source size falls
    back to the cluster's default parallelism (the cluster-true choice;
    every in-repo job passes its source's footer row count)."""
    env = os.environ.get("ESPK_STREAM_STATE_PARTITIONS")
    if env:
        return env
    hi = 4 * spark.sparkContext.defaultParallelism
    if source_rows is None:
        return str(spark.sparkContext.defaultParallelism)
    return str(max(1, min(-(-source_rows // STATE_ROWS_PER_PARTITION), hi)))


def _drain_complete_to_parquet(
    df: DataFrame, name: str, source_rows: int | None = None
) -> DataFrame:
    """Executor-parallel drain for COMPLETE-mode results whose size tracks
    the corpus (st_session_window's ~one-session-per-active-user result):
    the file sink rejects complete output, so foreachBatch overwrites a
    parquet snapshot of the full state each trigger — workers write in
    parallel, the driver holds nothing, and the last trigger's snapshot
    IS the declared result. Opt-in via ESPK_RESULT_SINK=parquet, routed
    for EVERY complete-mode leg from ``_drain_to_memory`` (one policy
    point): the default memory route stays the harness shape — the
    harness collects the whole result anyway, so the memory sink is
    merely the collect moved earlier — while a production job flips the
    env var and lands every complete-mode result durably without a
    driver-memory copy. Same availableNow replay + plan capture as the
    other drains."""
    import shutil

    spark = df.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    app_id = spark.sparkContext.applicationId
    base = os.path.join(tempfile.gettempdir(), "espk_drain", app_id, name)
    shutil.rmtree(base, ignore_errors=True)
    out_dir, ckpt = os.path.join(base, "data"), os.path.join(base, "ckpt")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", _state_partitions(spark, source_rows)
    )
    try:
        query = (
            df.writeStream.outputMode("complete")
            .foreachBatch(
                lambda batch_df, _id: batch_df.write.mode("overwrite").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        _record_stream_plan(query)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    os.makedirs(out_dir, exist_ok=True)
    return spark.read.schema(df.schema).parquet(out_dir)


def _drain_to_memory(
    df: DataFrame, name: str, mode: str, source_rows: int | None = None
) -> DataFrame:
    # ESPK_RESULT_SINK=parquet: production jobs opt every COMPLETE-mode
    # result leg into the executor-parallel snapshot drain (durable, no
    # driver copy) — one policy point for all of them. The memory sink
    # stays the default: it IS the declared result the harness collects.
    if mode == "complete" and os.environ.get("ESPK_RESULT_SINK") == "parquet":
        return _drain_complete_to_parquet(df, name, source_rows)
    spark = df.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    # Stateful operators pay a fixed per-partition state-store cost each
    # micro-batch, so the partition count must track key cardinality, not
    # the session default (measured 3x on the replay jobs: 32 -> 8
    # partitions in r13; r17 derives it from the source's footer row
    # count via _state_partitions — scale-adaptive, env-overridable).
    # shuffle.partitions is captured at query start, so the temporary
    # override pins only this query's state layout.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", _state_partitions(spark, source_rows)
    )
    try:
        query = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        _record_stream_plan(query)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


# Crossover for the routed per-row drain below: under these SOURCE
# bounds the driver memory sink is acceptable (fixture scale); above
# either, a per-source-row store is large enough that single-threaded
# driver collection dominates (the r8 st_bm25 lesson: 48x wall, almost
# all drain). TWO bounds because the store's driver footprint scales
# with source ROW COUNT, not bytes — a corpus of millions of tiny docs
# stays under any byte bound yet pushes millions of rows through the
# memory sink (r11 ADVICE). Both overridable for tests / cluster sizing.
MEMORY_DRAIN_MAX_SOURCE_BYTES = 256 << 20
MEMORY_DRAIN_MAX_SOURCE_ROWS = 1_000_000


def _drain_rowstore(
    df: DataFrame, name: str, sf_dir: str, table: str = "documents"
) -> DataFrame:
    """Routed drain for per-SOURCE-ROW intermediate stores (one narrow
    fingerprint row per document) that downstream analysis consumes.

    Three store classes, three drains (the shared policy):
      * summary-sized (sketches, complete-mode aggregates, top-k): the
        memory sink via ``_drain_to_memory`` — bounded by design.
      * per-source-row narrow stores (perceptual fingerprints): THIS
        router. One row per document is fine through the driver memory
        sink at fixture scale but still corpus-proportional, so above a
        source-size bound the store crosses to the executor-parallel
        parquet drain (the same size-routed style as
        dedup.apply_drop_set's broadcast-vs-shuffled anti-join).
      * corpus-sized stores (token/span/shingle tables, per-EVENT rows —
        several rows per document or fact-table-sized): always
        ``_drain_to_parquet`` per the r8 discipline; never routed here.

    The route is decided from the source table's parquet FOOTERS before
    the stream runs: row count (num_rows — the store is one row per
    source row, so this is the store's actual driver footprint) with an
    on-disk byte bound as a belt-and-braces second trigger. Both
    overridable (ESPK_MEMORY_DRAIN_MAX_ROWS / _BYTES) so tests pin all
    routes."""
    byte_bound = int(
        os.environ.get("ESPK_MEMORY_DRAIN_MAX_BYTES", MEMORY_DRAIN_MAX_SOURCE_BYTES)
    )
    row_bound = int(
        os.environ.get("ESPK_MEMORY_DRAIN_MAX_ROWS", MEMORY_DRAIN_MAX_SOURCE_ROWS)
    )
    files = _source_files(table_path(sf_dir, table))  # ONE directory walk
    rows = _rows_of(files)
    if _bytes_of(files) > byte_bound or rows > row_bound:
        return _drain_to_parquet(df, name)
    return _drain_to_memory(df, name, "append", source_rows=rows or None)


def _source_files(path: str) -> list[str]:
    """Data files of a file OR directory-style parquet table. A missing
    path yields [] — the router then takes the memory route and the
    stream's own source reader raises the clearer error (r11 ADVICE:
    don't fail the job on the router's stat call). Metadata subtrees
    (_spark_metadata/, _delta_log/, .hidden/) are pruned at the
    DIRECTORY level: their files ('0', '9.compact') don't start with
    '_'/'.' themselves, and a file-sink store's ever-growing compact
    manifests would otherwise skew the byte route."""
    if os.path.isdir(path):
        out: list[str] = []
        for root, dirs, names in os.walk(path):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            out.extend(
                os.path.join(root, f) for f in names if not f.startswith(("_", "."))
            )
        return out
    return [path] if os.path.exists(path) else []


def _bytes_of(files: list[str]) -> int:
    return sum(os.path.getsize(f) for f in files)


def _rows_of(files: list[str]) -> int:
    """Exact row count from parquet footers — metadata-only, no scan and
    no held file handles (pq.read_metadata opens, reads the footer, and
    closes). An unreadable footer counts 0 (memory route); the stream's
    own reader then surfaces the real error."""
    import pyarrow.parquet as pq

    total = 0
    for f in files:
        try:
            total += pq.read_metadata(f).num_rows
        except Exception:  # noqa: BLE001 — router must not kill the job
            continue
    return total


def _table_rows(sf_dir: str, table: str) -> int | None:
    """Footer row count of a job's source table, for the state-partition
    derivation (None when the table is missing — the stream's own reader
    raises the clearer error; the derivation then falls back to the
    cluster default). One footer read per drain call — metadata-only."""
    files = _source_files(table_path(sf_dir, table))
    return _rows_of(files) if files else None


def _source_bytes(path: str) -> int:
    """On-disk bytes of a parquet source (os.path.getsize on a directory
    returns the ~4 KB inode size, which would silently pin the router to
    the memory sink forever — sum the files underneath instead)."""
    return _bytes_of(_source_files(path))


def _source_rows(path: str) -> int:
    """Exact row count of a parquet source, via ``_rows_of``."""
    return _rows_of(_source_files(path))


def latest_per_user_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming A2/A3: last event per user via max_by aggregation
    (complete mode). Ties on ts break by event_id, matching DQ-07."""
    src = _events_stream(spark, sf_dir)
    agg = src.groupBy("user_id").agg(
        F.expr("max_by(struct(event_type, value), struct(ts, event_id))").alias("m")
    )
    out = agg.select("user_id", F.col("m.event_type").alias("event_type"), F.col("m.value").alias("value"))
    return _drain_to_memory(out, "st_latest_user_sink", "complete", source_rows=_table_rows(sf_dir, "events"))


def window_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming A4/T3: tumbling 1h snapshot counts per event type."""
    src = _events_stream(spark, sf_dir)
    agg = src.groupBy(F.window("ts", "1 hour").alias("win"), "event_type").agg(
        F.count("*").alias("n")
    )
    out = agg.select(F.col("win.start").alias("w"), "event_type", "n")
    return _drain_to_memory(out, "st_window_counts_sink", "complete", source_rows=_table_rows(sf_dir, "events"))


def override_asof_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming A5: per-key as-of state via applyInPandasWithState."""
    src = _events_stream(spark, sf_dir)
    out = st.asof_override(src)
    return _drain_to_memory(out, "st_override_asof_sink", "append", source_rows=_table_rows(sf_dir, "events"))


def session_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time session windows (30-min gap) per user — the streaming
    generalization of the override-session construct (A5): a session closes
    when the key goes quiet for the gap. ``session_window`` merges while
    ``next_ts < prev_ts + gap`` (window end exclusive), so the batch oracle
    breaks sessions on ``diff >= gap``."""
    src = _events_stream(spark, sf_dir)
    agg = src.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id").agg(
        F.count("*").alias("n"), F.max("event_id").alias("last_event")
    )
    out = agg.select("user_id", F.col("sw.start").alias("s_start"), "n", "last_event")
    # This result leg is corpus-proportional (~one session per active
    # user) — the r11 VERDICT design-note-b case for the
    # ESPK_RESULT_SINK=parquet opt-in, which _drain_to_memory routes for
    # every complete-mode leg from one policy point.
    return _drain_to_memory(out, "st_session_window_sink", "complete", source_rows=_table_rows(sf_dir, "events"))


def sliding_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h long, 30 min slide) per event type —
    every event lands in exactly two windows."""
    src = _events_stream(spark, sf_dir)
    agg = src.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type").agg(
        F.count("*").alias("n")
    )
    out = agg.select(F.col("win.start").alias("w_start"), "event_type", "n")
    return _drain_to_memory(out, "st_sliding_counts_sink", "complete", source_rows=_table_rows(sf_dir, "events"))


def _documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replayable documents stream (symlink-dir trick, as for events)."""
    ensure_session_confs(spark)
    src_file = os.path.abspath(table_path(sf_dir, "documents"))
    stream_dir = os.path.join(
        tempfile.gettempdir(), "espk_stream", src_file.strip("/").replace("/", "_")
    )
    os.makedirs(stream_dir, exist_ok=True)
    _ensure_symlink(src_file, os.path.join(stream_dir, "documents.parquet"))
    return spark.readStream.schema(SCHEMAS["documents"]).parquet(stream_dir)


def content_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming content dedup: SimHash each incoming document (Arrow
    kernel inside the stream) and keep one document per signature —
    the LLM-pipeline dedup shape applied online. Output is the kept
    signature set (deterministic regardless of which doc wins a bucket)."""
    from espkinesis_spark.functions import dedup

    src = _documents_stream(spark, sf_dir)
    signed = dedup.simhash(src)  # mapInPandas works on streaming DataFrames
    out = signed.dropDuplicates(["simhash"]).select("simhash")
    return _drain_to_memory(out, "st_content_dedup_sink", "append", source_rows=_table_rows(sf_dir, "documents"))


def image_neardup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming perceptual image dedup — the production lambda: the
    dHash fingerprint is extracted AT INGEST (synthesize + real-BMP
    decode + hash as a STATELESS zero-state append projection — Arrow
    kernels run on the stream, so fingerprinting keeps up at any
    ingest rate and the corpus payload is touched exactly once), the
    fingerprint rows land in the store, and the banded Hamming
    candidate join + exact verify run over the drained fingerprint
    store (the anomaly/heavy-hitters drain-then-analyze split:
    Structured Streaming cannot run the self-join + aggregation level
    in-query). The snapshot equals the batch hash table, so
    ex_image_neardup's oracle is exact."""
    from espkinesis_spark.functions import common as C
    from espkinesis_spark.functions.multimodal import (
        hamming_neardup,
        image_dhash,
        synthesize_gray_bmp,
    )

    src = _documents_stream(spark, sf_dir)
    hashes = image_dhash(synthesize_gray_bmp(src))
    store = _drain_rowstore(hashes, "st_image_neardup_sink", sf_dir)
    return hamming_neardup(store, max_hamming=C.IMG_HAM_MAX)


def dedup_substring_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-substring dedup (the Lee et al. 2022 rewrite as a
    lambda): BOTH narrow extraction tables — span hashes and positioned
    tokens — are computed AT INGEST as stateless append projections (the
    document payload is touched exactly once, on arrival), and the
    global analysis (first-occurrence window, overlap-merged cuts,
    anti-join rebuild) runs over the drained stores. The drained tables
    equal the batch extraction, so ex_dedup_substring's oracle is
    exact."""
    from espkinesis_spark.functions import dedup

    src = _documents_stream(spark, sf_dir)
    occ, tok = dedup.dup_spans_tables(src)
    # the token store feeds two analysis branches (totals + kept) — a
    # memory-sink view cannot appear twice in one plan (the st_anomaly
    # hazard), so freeze both snapshots
    # corpus-sized stores -> parquet drains (executor-parallel; a
    # file-backed frame can also feed both analysis branches without the
    # memory-sink twice-in-plan hazard)
    occ_store = _drain_to_parquet(occ, "st_dedup_substring_occ_sink")
    tok_store = _drain_to_parquet(tok, "st_dedup_substring_tok_sink")
    return dedup.dup_spans_apply_from(occ_store, tok_store)


def image_dedup_apply_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming leg of the CLOSED perceptual dedup chain:
    fingerprints at ingest (stateless append dHash projection — the
    st_image_neardup front), then pairs → connected components → drop
    set over the drained fingerprint store, and the anti-join apply
    against the landed corpus (the batch documents table — in the
    lambda, the ingested store itself). The drained hash table equals
    the batch one, so ex_image_dedup_apply's oracle is exact."""
    from espkinesis_spark.functions import common as C
    from espkinesis_spark.functions import dedup
    from espkinesis_spark.functions.multimodal import (
        hamming_neardup,
        image_dhash,
        synthesize_gray_bmp,
    )
    from espkinesis_spark.tables import load_table

    src = _documents_stream(spark, sf_dir)
    hashes = image_dhash(synthesize_gray_bmp(src))
    store = _drain_rowstore(hashes, "st_image_dedup_apply_sink", sf_dir)
    pairs = hamming_neardup(store, max_hamming=C.IMG_HAM_MAX).select(
        F.col("doc_id_a").alias("doc_a"), F.col("doc_id_b").alias("doc_b")
    )
    drops = (
        dedup.dedup_clusters(pairs)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup.apply_drop_set(docs, drops)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


def bm25_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming BM25 retrieval: the (doc_id, term) extraction computed
    AT INGEST (stateless append fan-out — the payload is tokenized once,
    on arrival), scoring over the drained token store. The drained table
    equals the batch extraction, so ex_bm25's oracle is exact."""
    from espkinesis_spark.functions import text as T

    src = _documents_stream(spark, sf_dir)
    tok = T.bm25_tokens(src)
    # corpus-sized store -> parquet drain (executor-parallel, the durable
    # production shape); no localCheckpoint needed — a file-backed frame
    # can appear in many plan branches
    store = _drain_to_parquet(tok, "st_bm25_sink")
    return T.bm25_from_tokens(store)


def audio_dedup_apply_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming acoustic dedup APPLIED: envelope fingerprints at ingest,
    pairs -> clusters -> drop set over the drained store, routed
    anti-join against the landed corpus. Shares ex_audio_dedup_apply's
    oracle."""
    from espkinesis_spark.functions import common as C
    from espkinesis_spark.functions import dedup
    from espkinesis_spark.functions.multimodal import (
        audio_envelope_hash,
        hamming_neardup,
        synthesize_tone_wav,
    )
    from espkinesis_spark.tables import load_table

    src = _documents_stream(spark, sf_dir)
    hashes = audio_envelope_hash(synthesize_tone_wav(src))
    store = _drain_rowstore(hashes, "st_audio_dedup_apply_sink", sf_dir)
    pairs = hamming_neardup(store, max_hamming=C.AUD_HAM_MAX).select(
        F.col("doc_id_a").alias("doc_a"), F.col("doc_id_b").alias("doc_b")
    )
    drops = (
        dedup.dedup_clusters(pairs)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup.apply_drop_set(docs, drops)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


def video_dedup_apply_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming video-shape dedup APPLIED: keyframe hashes at ingest,
    shared-frame pairs -> clusters -> drop set over the drained store,
    routed anti-join against the landed corpus. Shares
    ex_video_dedup_apply's oracle."""
    from espkinesis_spark.functions import dedup
    from espkinesis_spark.functions.multimodal import (
        attach_binary,
        sample_frames,
        shared_frame_neardup,
    )
    from espkinesis_spark.tables import load_table

    src = _documents_stream(spark, sf_dir)
    frames = sample_frames(attach_binary(src))
    # several keyframe rows PER document (sample_frames explodes the
    # payload) — the corpus-sized class _drain_rowstore excludes, so
    # this store always takes the executor-parallel parquet drain
    store = _drain_to_parquet(frames, "st_video_dedup_apply_sink")
    pairs = shared_frame_neardup(store).select(
        F.col("doc_id_a").alias("doc_a"), F.col("doc_id_b").alias("doc_b")
    )
    drops = (
        dedup.dedup_clusters(pairs)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup.apply_drop_set(docs, drops)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


def containment_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Broder-containment near-dup: the shingle fan-out runs at
    ingest WITHOUT the distinct (a streaming distinct is update-mode
    state; the raw fan-out is a stateless append projection), the
    corpus-sized shingle store drains through the parquet sink, and the
    post-drain distinct + containment scoring equal the batch chain —
    shares ex_containment_dedup's oracle."""
    from espkinesis_spark.functions import dedup

    src = _documents_stream(spark, sf_dir)
    sh = dedup.shingles(src, distinct=False)
    store = _drain_to_parquet(sh, "st_containment_sink")
    return dedup.containment_from_shingles(store.distinct())


def audio_neardup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming acoustic near-dup: the image_neardup_stream lambda with
    the WAV energy-envelope fingerprint (see image_neardup_stream for
    the ingest/drain split rationale). Shares ex_audio_neardup's
    oracle."""
    from espkinesis_spark.functions import common as C
    from espkinesis_spark.functions.multimodal import (
        audio_envelope_hash,
        hamming_neardup,
        synthesize_tone_wav,
    )

    src = _documents_stream(spark, sf_dir)
    hashes = audio_envelope_hash(synthesize_tone_wav(src))
    store = _drain_rowstore(hashes, "st_audio_neardup_sink", sf_dir)
    return hamming_neardup(store, max_hamming=C.AUD_HAM_MAX)


def video_neardup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming video-shape near-dup: keyframe hashes extracted at
    ingest (stateless append projection), the shared-frame pairing with
    its hot-frame df cap over the drained keyframe store. Shares
    ex_video_neardup's oracle."""
    from espkinesis_spark.functions.multimodal import (
        attach_binary,
        sample_frames,
        shared_frame_neardup,
    )

    src = _documents_stream(spark, sf_dir)
    frames = sample_frames(attach_binary(src))
    # several keyframe rows per document — always the parquet drain
    # (the _drain_rowstore policy routes only one-row-per-doc stores)
    store = _drain_to_parquet(frames, "st_video_neardup_sink")
    return shared_frame_neardup(store)


def anomaly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming observability lambda: hourly per-type event counts
    maintained incrementally on the stream (complete-mode aggregation —
    state is one row per (type, hour), calendar-sized, not event-sized),
    then the z-score flagging applied in BATCH over the drained snapshot.
    The aggregate-online / analyze-on-snapshot split exists because
    Structured Streaming forbids the second (stats-over-counts) level of
    aggregation in one query; the snapshot equals the batch hourly table,
    so ex_anomaly's oracle is exact.

    State retention bound: complete-mode state here is exactly
    |event types| x |distinct hours seen| rows (the replay test asserts
    the state-store row count equals that product's realized size). Event
    types are a small fixed vocabulary, so state grows only with the
    CALENDAR — ~9k rows/type/year — not with event volume; a 100 TB/day
    stream adds zero state beyond its new hours. If the deployment ever
    needs unbounded-calendar retention, the switch is update mode + a
    watermark on ``hr`` with the stats window bounded to the trailing N
    hours; for the z-score-over-observed-history semantics this entry
    declares, calendar-sized complete mode is the honest minimal state.
    """
    from espkinesis_spark.queries import hourly_zscore_flags

    src = _events_stream(spark, sf_dir)
    agg = src.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count("*").cast("long").alias("n"))
    counts = _drain_to_memory(agg, "st_anomaly_sink", "complete", source_rows=_table_rows(sf_dir, "events"))
    # the flagging self-joins the snapshot (stats side + probe side); a
    # memory-sink view can't appear twice in one plan (conflicting expr
    # ids), so freeze the calendar-sized table first
    counts = counts.localCheckpoint(eager=True)
    return hourly_zscore_flags(counts)


def quality_gate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming document quality gate: the Gopher-style repetition rules
    applied to documents AS THEY ARRIVE, via the stateless projection form
    (text.quality_gate_stateless) — zero state, no watermark, append mode,
    so the gate keeps up at any ingest rate; the batch form's per-doc
    aggregation shares the same thresholds/rounding and one oracle."""
    from espkinesis_spark.functions.text import quality_gate_stateless

    src = _documents_stream(spark, sf_dir)
    out = quality_gate_stateless(src)
    return _drain_to_memory(out, "st_quality_gate_sink", "append", source_rows=_table_rows(sf_dir, "documents"))


def quality_model_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming model-based quality scoring: the hashed-feature linear
    classifier applied to documents AS THEY ARRIVE — like the rule gate
    (quality_gate_stream) it is a STATELESS zero-state append-mode
    projection, so the scorer keeps up at any ingest rate; scores equal
    the batch pass exactly (exact-integer weight sums), one oracle."""
    from espkinesis_spark.functions.text import quality_model_score

    src = _documents_stream(spark, sf_dir)
    out = quality_model_score(src)
    return _drain_to_memory(out, "st_quality_model_sink", "append", source_rows=_table_rows(sf_dir, "documents"))


def winnow_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming winnowing near-dup: the fingerprint projection is a
    ZERO-SHUFFLE stateless transform (array window-minima per row), so
    it runs at ingest rate on the stream; the ~|tokens|/w-sized
    fingerprint store drains through the executor-parallel parquet sink
    (corpus-proportional — the st_bm25 drain rule), and the df-capped
    candidate join runs over the drained store. Snapshot equals the
    batch fingerprint table; shares ex_winnow_fingerprint's oracle."""
    from espkinesis_spark.functions.dedup import (
        winnow_candidates_from,
        winnow_fingerprints,
    )

    src = _documents_stream(spark, sf_dir)
    fp = winnow_fingerprints(src)
    store = _drain_to_parquet(fp, "st_winnow_sink")
    return winnow_candidates_from(store)


def repetition_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Gopher repetition stats: the trigram projection
    (non-distinct shingles — distinct would force update-mode state) is
    stateless, so it runs at ingest rate; the gram store drains through
    the executor-parallel parquet sink (corpus-proportional — the
    st_bm25 drain rule), and the exact-counter rollup + divide run over
    the drained store. Shares ex_repetition_stats' oracle."""
    from espkinesis_spark import queries
    from espkinesis_spark.functions import dedup

    src = _documents_stream(spark, sf_dir)
    sh = dedup.shingles(src, distinct=False)
    store = _drain_to_parquet(sh, "st_repetition_sink")
    return queries.repetition_stats_from(store)


def asof_features_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming point-in-time enrichment: events land from the stream
    into the durable store (stateless append passthrough — the as-of
    re-aggregation would be event-keyed update-mode state in-query, so
    the lambda splits drain from analysis), then the shared as-of
    composition joins the drained events against the batch orders
    dimension. Shares ex_asof_features' oracle."""
    from espkinesis_spark import queries

    ev = _events_stream(spark, sf_dir).select("event_id", "user_id", "ts")
    store = _drain_to_parquet(ev, "st_asof_sink")
    return queries.asof_feature_frame(spark, sf_dir, store)


def lang_id_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming language ID at ingest: the stopword-hit classifier as a
    STATELESS append-mode projection (Arrow kernel inside the stream —
    mapInPandas works on streaming DataFrames). Predictions equal the
    batch pass exactly; shares ex_lang_id's oracle."""
    from espkinesis_spark.functions.text import lang_id

    src = _documents_stream(spark, sf_dir)
    out = lang_id(src).select("doc_id", "lang_pred")
    return _drain_to_memory(out, "st_lang_id_sink", "append", source_rows=_table_rows(sf_dir, "documents"))


def pii_scrub_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PII redaction at ingest — the production placement
    (scrub BEFORE anything persists). The stream replays the same
    deterministic PII augmentation as ex_pii_scrub (the synthetic corpus
    carries no addresses), then the regex scrub runs as a stateless
    zero-shuffle append projection. Shares ex_pii_scrub's oracle."""
    from espkinesis_spark.functions.text import pii_scrub

    src = _documents_stream(spark, sf_dir)
    aug = src.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@testmail.org ref "),
            (F.col("doc_id") + F.lit(1_000_000)).cast("string"),
        ),
    )
    return _drain_to_memory(pii_scrub(aug), "st_pii_scrub_sink", "append", source_rows=_table_rows(sf_dir, "documents"))


def text_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-document quality statistics: the codegen stat
    projection applied as documents arrive (stateless append mode, the
    st_quality_model shape). Shares ex_text_stats' oracle."""
    from espkinesis_spark.functions.text import text_stats

    src = _documents_stream(spark, sf_dir)
    return _drain_to_memory(text_stats(src), "st_text_stats_sink", "append", source_rows=_table_rows(sf_dir, "documents"))


def stratified_sample_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stratified sampling AT INGEST — the production placement
    for rebalancing (rows the sampler drops are never persisted at all):
    the md5-bucket acceptance is row-local, so the filter is a stateless
    zero-shuffle projection on the stream. Shares
    ex_stratified_sample's oracle."""
    from espkinesis_spark.functions import sampling

    src = _documents_stream(spark, sf_dir)
    out = sampling.stratified_sample(
        src, "lang", rates={"en": 10}, default_pct=50, key_col="doc_id"
    ).select("doc_id", "lang", "source")
    return _drain_to_memory(out, "st_stratified_sink", "append", source_rows=_table_rows(sf_dir, "documents"))


def hash_split_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming train/val/test routing at ingest: the hash-bucket split
    decision is row-local (stateless projection — downstream the writer
    partitions by split), and the per-split-per-language audit folds
    INTO the stream as a complete-mode aggregation: state is one row per
    (split, lang) pair — splits x langs, never corpus-sized (the first
    cut drained every per-doc row through the driver memory sink and
    rolled up post-drain; at scale that materializes the whole corpus in
    driver memory — the r10 VERDICT weak item, same class as the
    st_zorder fix). Shares ex_hash_split's oracle."""
    from espkinesis_spark.functions import sampling

    src = _documents_stream(spark, sf_dir)
    split = sampling.hash_split(src, "doc_id", {"train": 90, "val": 5, "test": 5})
    out = split.groupBy("split", "lang").agg(F.count("*").cast("long").alias("n"))
    return _drain_to_memory(out, "st_hash_split_sink", "complete", source_rows=_table_rows(sf_dir, "documents"))


def perplexity_buckets_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CCNet terciles: the positional token table is extracted
    AT INGEST (stateless zero-shuffle posexplode — the corpus text is
    touched exactly once; the LM itself is corpus-global state no
    stream query should hold), the corpus-proportional token store
    drains through the executor-parallel parquet sink, and the bigram
    LM + tercile cut run over the drained store. Positional adjacency
    rebuilds the exact in-array bigrams, so ex_perplexity_buckets'
    oracle is exact."""
    from espkinesis_spark.functions import text as text_fns

    src = _documents_stream(spark, sf_dir)
    toks = text_fns.token_positions(src)
    store = _drain_to_parquet(toks, "st_perplexity_sink")
    return text_fns.perplexity_buckets_from(
        text_fns.bigram_logprob_from_tokens(store)
    )


def zorder_shard_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming z-SHARD assignment: the Morton key computed AT INGEST as
    a stateless zero-shuffle projection, bucketed by its LOW interleaved
    bits — the streaming goal is BALANCED SPREAD across writers (the low
    3 bits of each axis vary fastest), not the batch entry's locality
    (which needs corpus min/max bounds no endless stream has; the first
    cut bucketed the TOP bits of a modular grid and the report
    degenerated to 8 buckets with near-full spans on this fixture — the
    pmod-undershoot vacuity NOTES.md documents for the batch form). The
    interleave still buys hierarchical splitting: dropping one low
    z-bit merges shard pairs that are adjacent in BOTH axes' low bits.
    The drained store rolls up rows + user spread per shard; balance is
    pinned by test. The per-event z store is corpus-PROPORTIONAL (one
    row per event), so it drains through the executor-parallel parquet
    sink per the r8 discipline — the first cut used the driver memory
    sink (r10 VERDICT weak item); the rollup itself needs an exact
    countDistinct, which streaming aggregation can't hold, so it stays
    post-drain."""
    from espkinesis_spark.functions import common as C
    from espkinesis_spark.functions import layout

    grid = 1 << C.ZORDER_BITS
    src = _events_stream(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("t_ms"),
    )
    # pre-1970 timestamps are out of contract: Spark's `div`/pmod
    # truncate-vs-floor differs from DuckDB's `//`/`%` on NEGATIVE
    # operands, so the oracle mirror only holds for t_ms >= 0 (the same
    # non-negative-epoch assumption the as-of composite documents)
    z = src.select(
        "event_id",
        "user_id",
        "t_ms",
        layout.z_value(
            F.pmod(F.col("user_id"), F.lit(grid)).cast("long"),
            F.pmod(F.expr("t_ms div 1000"), F.lit(grid)).cast("long"),
        ).alias("z"),
    )
    store = _drain_to_parquet(z, "st_zorder_sink")
    shards = 1 << C.ZORDER_REPORT_BITS
    return store.groupBy(F.pmod(F.col("z"), F.lit(shards)).alias("zshard")).agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


def vocab_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus vocabulary: running token counts maintained
    incrementally as documents arrive (complete-mode aggregation — state is
    one row per distinct token, vocab-sized, not corpus-sized). Final table
    equals the batch token count, so the DuckDB oracle is exact."""
    from espkinesis_spark.functions.text import tokens

    src = _documents_stream(spark, sf_dir)
    out = (
        src.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return _drain_to_memory(out, "st_vocab_sink", "complete", source_rows=_table_rows(sf_dir, "documents"))


def heavy_hitters_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters: running token counts maintained
    complete-mode on the document stream (vocab-sized state, exactly the
    st_vocab shape), then the exact share filter (count·k > total) applied
    over the drained snapshot. The snapshot counts equal the batch counts,
    so this shares ex_heavy_hitters' exact oracle — the streaming leg of
    the Misra-Gries batch op (which bounds candidate memory instead of
    keeping the full vocab; pick per deployment by vocab size). The
    total-vs-counts comparison self-joins the snapshot, so it is frozen
    with localCheckpoint first (a memory-sink view cannot appear twice in
    one plan — the st_anomaly hazard)."""
    from espkinesis_spark.functions import common as C
    from espkinesis_spark.functions.text import exact_share_filter, tokens

    src = _documents_stream(spark, sf_dir)
    agg = (
        src.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
    )
    counts = _drain_to_memory(agg, "st_heavy_hitters_sink", "complete", source_rows=_table_rows(sf_dir, "documents"))
    counts = counts.localCheckpoint(eager=True)
    tot = counts.agg(F.sum("n").cast("long").alias("total"))
    return exact_share_filter(counts, tot, "token", C.HH_K)


def hdr_quantile_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming percentiles from the mergeable HDR sketch: the bucket
    counts aggregate complete-mode on the event stream (state is
    sketch-sized — bounded by the bucket-space constant, never
    data-sized), then the batch extraction runs over the drained
    snapshot. Bucket counts merge by integer addition, so the drained
    sketch is bit-identical to the batch sketch for any micro-batch
    split — shares ex_hdr_quantile's oracle."""
    from espkinesis_spark.functions import quantiles

    src = _events_stream(spark, sf_dir)
    buckets = quantiles.hdr_buckets(src, "value")
    snap = _drain_to_memory(buckets, "st_hdr_quantile_sink", "complete", source_rows=_table_rows(sf_dir, "events"))
    return quantiles.hdr_quantiles(snap.localCheckpoint(eager=True))


def ack_tracker_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7/A2 as a driver query: a deterministic ack stream derived from the
    events table (mac keyed by user_id % 8, ok unless event_id % 3 == 0)
    joined to the target dim; latest ack wins per target, ok acks refresh
    last_successful_send."""
    from espkinesis_spark.streaming.pipeline import ack_tracker

    src = _events_stream(spark, sf_dir)
    acks = src.select(
        F.col("ts").alias("ack_ts"),
        F.format_string("AA:BB:CC:DD:EE:%02X", (F.col("user_id") % 8 + 1).cast("int")).alias(
            "mac"
        ),
        (F.col("event_id") % 3 != 0).alias("ok"),
        F.col("event_id").alias("ack_id"),
    )
    targets = spark.createDataFrame(
        [(i, f"AA:BB:CC:DD:EE:{i:02X}") for i in range(1, 9)], "id int, mac string"
    )
    out = ack_tracker(acks, targets, tiebreak="ack_id")
    return _drain_to_memory(out, "st_ack_tracker_sink", "complete", source_rows=_table_rows(sf_dir, "events"))


def dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: first event per (user_id, event_type) wins;
    the kept-key set (not the arbitrary winning row) is the deterministic,
    oracle-checkable output. State is one entry per distinct key — bound it
    in production with ``dropDuplicatesWithinWatermark``."""
    src = _events_stream(spark, sf_dir)
    out = src.dropDuplicates(["user_id", "event_type"]).select("user_id", "event_type")
    return _drain_to_memory(out, "st_dedup_sink", "append", source_rows=_table_rows(sf_dir, "events"))


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each click joined to the same user's
    purchases within the preceding hour (the ack-correlation shape J7 as an
    event-time join). Watermarks bound the join state on both sides; the
    replay drains in append mode (matches emit as both sides arrive).
    Both sides branch from ONE source (a stream-stream self-join) — a
    second FileStreamSource instance measured ~25% slower and doubles the
    source-offset bookkeeping."""
    src = _events_stream(spark, sf_dir)
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") <= F.col("c_ts"))
        & (F.col("p_ts") > F.col("c_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("click_id", "purchase_id")
    return _drain_to_memory(joined, "st_stream_join_sink", "append", source_rows=_table_rows(sf_dir, "events"))


def _command_lines_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the deterministic synthetic command stream for a scale
    factor (once; marker-guarded) and return the replay directory."""
    src = os.path.abspath(table_path(sf_dir, "events"))
    st_ = os.stat(src)
    # cache key includes source mtime+size so regenerated testdata
    # invalidates stale fixtures; rename-into-place below makes the
    # directory appear atomically (no half-written dir visible to readers).
    key = f"{src.strip('/').replace('/', '_')}_{int(st_.st_mtime)}_{st_.st_size}"
    out_dir = os.path.join(tempfile.gettempdir(), "espk_stream", f"cmdlines_{key}")
    if os.path.isdir(out_dir):
        return out_dir
    from espkinesis_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    tid = (F.col("event_id") % 8 + 1).cast("int")
    m = F.col("event_id") % 10
    ok_line = (
        '{"command": "override_channels", "target_id": %d,'
        ' "channels": [1500, -1, 2000], "duration": 100}'
    )
    raw = (
        F.when(m == 0, F.lit('{"command": "override_channels", '))  # truncated
        .when(m == 1, F.lit("{}"))  # no command field
        .when(m == 2, F.format_string(ok_line.replace("override_channels", "reboot"), tid))
        .when(
            m == 3,
            F.format_string(
                '{"command": "override_channels", "target_id": %d, "duration": 100}', tid
            ),
        )
        .when(
            m == 4,
            F.format_string(
                '{"command": "override_channels", "target_id": %d,'
                f' "channels": [{", ".join(["1500"] * 9)}], "duration": 100}}',
                tid,
            ),
        )
        .when(m == 5, F.format_string(ok_line.replace('"duration": 100', '"duration": 0'), tid))
        .when(m == 6, F.format_string(ok_line.replace("2000", "3000"), tid))
        .when(m == 7, F.format_string(ok_line, F.lit(99)))
        .otherwise(F.format_string(ok_line, tid))
    )
    lines = ev.select(F.col("event_id").alias("cmd_id"), "ts", raw.alias("raw"))
    tmp_dir = out_dir + f".tmp.{os.getpid()}"
    lines.write.mode("overwrite").parquet(tmp_dir)
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        # another process won the race; its completed dir is equivalent
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


def command_plane_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full command plane (SURVEY §3.1) replayed as a stream and reduced
    to per-error-class counts.

    A deterministic JSON command line is derived from every event row
    (event_id % 10 selects the failure mode), materialized ONCE per scale
    factor into a replay directory (the reference replays a real command
    stream — synthesis is fixture prep, not the operator under test), then
    streamed through parse -> validate -> dispatch
    (ref: src/transmitter/main.cpp:125-277). The oracle maps each residue
    class straight to its expected verdict.
    """
    from espkinesis_spark.streaming.pipeline import classify_command_lines
    from espkinesis_spark.streaming.sources import COMMAND_LINE_SCHEMA, file_stream

    cmd_dir = _command_lines_dir(spark, sf_dir)
    lines = file_stream(spark, cmd_dir, COMMAND_LINE_SCHEMA, fmt="parquet")
    targets = spark.createDataFrame(
        [(i, f"AA:BB:CC:DD:EE:{i:02X}") for i in range(1, 9)], "id int, mac string"
    )
    annotated = classify_command_lines(lines, targets)
    out = (
        annotated.select(F.coalesce(F.col("error"), F.lit("ok")).alias("cls"))
        .groupBy("cls")
        .agg(F.count("*").alias("n"))
    )
    return _drain_to_memory(out, "st_command_plane_sink", "complete", source_rows=_rows_of(_source_files(cmd_dir)) or None)


_ROUNDTRIP_SCHEMA = "event_type string, n long, sum_v double, n_distinct long"


def _roundtrip_aggregate(df: DataFrame) -> DataFrame:
    """The shared delivery-check aggregate both round-trip jobs hash."""
    return df.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_v"),
        F.countDistinct("event_id").cast("long").alias("n_distinct"),
    )


def _read_back_batches(spark: SparkSession, out_dir: str, data_dir: str, read_fn):
    """Read the batch_id=N subdirectories a round-trip sink delivered
    (the retry-idempotent exactly-once layout), aggregate, detach from
    the tmp files, and clean up. A zero-batch stream never creates
    data_dir — deliver an empty result rather than a read error."""
    import shutil

    os.makedirs(data_dir, exist_ok=True)
    batch_dirs = [
        os.path.join(data_dir, d)
        for d in os.listdir(data_dir)
        if d.startswith("batch_id=")
    ]
    if not batch_dirs:
        shutil.rmtree(out_dir, ignore_errors=True)
        return spark.createDataFrame([], _ROUNDTRIP_SCHEMA)
    out = _roundtrip_aggregate(read_fn(batch_dirs)).localCheckpoint(eager=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    return out


def sink_roundtrip_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K2 driver-checkable delivery round-trip: the events stream goes
    through the keyed ``foreachBatch`` sink (per-key repartitioned delivery,
    the per-MAC radio-send shape) whose callback lands each batch in
    parquet, then the DELIVERED files are read back and aggregated. The
    oracle computes the same aggregate over the source table directly, so
    the value-hash asserts exactly-once-complete delivery — every source
    row shipped, none duplicated — not just that a sink ran.
    """
    from espkinesis_spark.streaming.sinks import keyed_foreach_batch_sink

    src = _events_stream(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="espk_sink_rt_")
    data_dir = os.path.join(out_dir, "delivered")

    def deliver(batch: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a retried micro-batch must not
        # append twice, so each batch overwrites its OWN batch_id-keyed
        # subdirectory — the retry lands on top of the partial attempt
        batch.write.mode("overwrite").parquet(
            os.path.join(data_dir, f"batch_id={batch_id}")
        )

    query = keyed_foreach_batch_sink(
        src.select("event_id", "user_id", "event_type", "value"),
        deliver,
        key_col="user_id",
        available_now=True,
        checkpoint=os.path.join(out_dir, "ckpt"),
        query_name="st_sink_roundtrip",
    )
    query.awaitTermination()
    _record_stream_plan(query)
    return _read_back_batches(
        spark, out_dir, data_dir, lambda dirs: spark.read.parquet(*dirs)
    )


def console_roundtrip_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 driver-checkable round-trip: the events stream goes through
    ``console_json_sink`` in capture mode — the exact serialized JSON-line
    documents the console surface prints, landed per-batch — then the
    delivered docs are read back, PARSED, and aggregated. The oracle
    computes the same aggregate over the source table directly, so the
    value hash proves the K3 serialization is lossless and delivery is
    exactly-once-complete (every row serialized once, parse round-trips
    every field)."""
    from espkinesis_spark.streaming.sinks import console_json_sink

    src = _events_stream(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="espk_console_rt_")
    cap = os.path.join(out_dir, "docs")
    query = console_json_sink(
        src.select("event_id", "event_type", "value"),
        available_now=True,
        query_name="st_console_roundtrip",
        capture_dir=cap,
        checkpoint=os.path.join(out_dir, "ckpt"),
    )
    query.awaitTermination()
    _record_stream_plan(query)

    def read_docs(dirs):
        return (
            spark.read.json(*dirs)
            .select(
                F.from_json(
                    "doc", "event_id bigint, event_type string, value double"
                ).alias("r")
            )
            .select("r.*")
        )

    return _read_back_batches(spark, out_dir, cap, read_docs)
