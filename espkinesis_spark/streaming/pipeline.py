"""The reference's three pipelines as Structured Streaming jobs.

Entry point 1 (command plane): parse -> validate -> dispatch -> state ->
response/error sinks (ref: src/transmitter/main.cpp:229-277).
Entry point 2 (data plane): frames x targets fan-out -> override patch ->
paced radio sink (ref: src/transmitter/main.cpp:78-106).
Entry point 3 (receiver): latest-frame hold -> 30 Hz SBUS remap emit
(ref: src/receiver/main.cpp:27-74).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from espkinesis_spark.operators import core as ops
from espkinesis_spark.streaming import state as st
from espkinesis_spark.streaming.sources import COMMAND_SCHEMA


def classify_command_lines(lines: DataFrame, targets: DataFrame) -> DataFrame:
    """Single-pass command classification: parse + every validation check as
    one ``when`` chain over one scan of the stream.

    Returns (cmd_id, ts, target_id, channels, duration, error) with
    ``error`` NULL for valid commands. One projection instead of
    branch-filter-union: a union of N filtered branches re-reads and
    re-parses the source N times — the difference between one pass and four
    at 100 TB. Check order mirrors the reference's lifecycle (parse ->
    command dispatch -> field checks -> registry lookup, early-exit
    ordering; ref: src/transmitter/main.cpp:125-277).
    """
    parsed = lines.withColumn("cmd", F.from_json(F.col("raw"), COMMAND_SCHEMA))
    joined = parsed.join(
        F.broadcast(targets.select(F.col("id").alias("__t_id"))),
        parsed["cmd.target_id"] == F.col("__t_id"),
        "left",
    )
    tid, ch, dur = F.col("cmd.target_id"), F.col("cmd.channels"), F.col("cmd.duration")
    error = (
        F.when(F.col("cmd").isNull() | F.col("cmd.command").isNull(), "parse_error")
        .when(F.col("cmd.command") != "override_channels", "unknown_command")
        .when(tid.isNull() | ch.isNull() | dur.isNull(), "missing_field")
        .when(~F.size(ch).between(1, ops.CHANNEL_COUNT), "bad_channel_count")
        .when(dur < 1, "bad_duration")
        .when(~ops.validate_channels(ch), "bad_channel_value")
        .when(F.col("__t_id").isNull(), "unknown_target")
    )
    return joined.select(
        "cmd_id",
        "ts",
        tid.alias("target_id"),
        ch.alias("channels"),
        dur.alias("duration"),
        error.alias("error"),
    )


def command_plane(lines: DataFrame, targets: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Parse + validate the raw command stream against the target dim.

    Returns (valid, rejected); rejected carries the error class (K4
    dead-letter branch). Both sides derive from the one-pass classification.
    """
    annotated = classify_command_lines(lines, targets)
    valid = annotated.filter(F.col("error").isNull()).drop("error")
    rejected = annotated.filter(F.col("error").isNotNull()).select("cmd_id", "ts", "error")
    return valid, rejected


def error_documents(rejected: DataFrame) -> DataFrame:
    """P7 — structured error docs for the dead-letter sink
    (ref: src/transmitter/main.cpp:125-140)."""
    return rejected.select(
        F.to_json(
            F.struct(
                F.lit("error").alias("type"),
                F.col("error").alias("message"),
                F.col("cmd_id").alias("cmd_id"),
            )
        ).alias("doc")
    )


def tag_frames_and_commands(
    frames: DataFrame, commands: DataFrame, targets: DataFrame
) -> DataFrame:
    """J5 fan-out + union with per-target commands into one tagged stream.

    Every frame goes to every target (broadcast nested-loop with the tiny
    target dim, ref: src/transmitter/main.cpp:78-97); commands route to
    exactly one target (J6). ``seq`` breaks ts ties: commands sort after
    frames at the same instant (the reference applies the frame copy first,
    then the command mutation within a loop tick).
    """
    fanned = frames.crossJoin(F.broadcast(targets.select(F.col("id").alias("target_id")))).select(
        "target_id",
        "ts",
        F.lit(0).alias("seq"),
        F.lit("frame").alias("kind"),
        "frame_id",
        "channels",
        F.lit(None).cast("long").alias("duration"),
    )
    cmds = commands.select(
        "target_id",
        "ts",
        F.lit(1).alias("seq"),
        F.lit("command").alias("kind"),
        F.lit(None).cast("long").alias("frame_id"),
        "channels",
        "duration",
    )
    return fanned.unionByName(cmds)


def transmitter(
    frames: DataFrame, command_lines: DataFrame, targets: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Full data plane: command plane -> override state -> output frames.

    Returns (output_frames, rejected_commands). Pacing to the 2 Hz radio
    cadence (T2) is a separate resample stage on the output (batch analog:
    ops.resample_last) or a 500 ms processing-time trigger on the sink.
    """
    valid_cmds, rejected = command_plane(command_lines, targets)
    tagged = tag_frames_and_commands(frames, valid_cmds, targets)
    return st.override_sessions(tagged), rejected


def receiver_remap(frames: DataFrame) -> DataFrame:
    """Entry point 3 — P1 remap of held frames to the SBUS domain
    (ref: src/receiver/main.cpp:68-71); the 30 Hz re-emit cadence is the
    sink trigger's concern, the transform is rate-agnostic."""
    return frames.withColumn("sbus", ops.remap_channels(F.col("channels")))


def ack_tracker(acks: DataFrame, targets: DataFrame, tiebreak: str | None = None) -> DataFrame:
    """A2 — connection state per target from the ack stream
    (ref: src/transmitter/main.cpp:55-75): latest ack wins; ok acks also
    refresh last_successful_send. Pass ``tiebreak`` (a unique column) to
    make same-timestamp acks deterministic."""
    order = f"struct(ack_ts, {tiebreak})" if tiebreak else "ack_ts"
    joined = acks.join(F.broadcast(targets.select("id", "mac")), "mac")
    return joined.groupBy("id").agg(
        F.expr(f"max_by(ok, {order})").alias("connection_state"),
        F.max(F.when(F.col("ok"), F.col("ack_ts"))).alias("last_successful_send"),
    )


def status_snapshots(output_frames: DataFrame, every: str = "500 milliseconds") -> DataFrame:
    """A4/T3 — periodic targets_update snapshot documents
    (ref: src/transmitter/main.cpp:282-296): per window, the latest frame
    per target collected into one JSON array doc."""
    latest = ops.resample_last(output_frames, ["target_id"], "ts", every=every)
    per_window = latest.groupBy("window_start").agg(
        F.to_json(
            F.array_sort(
                F.collect_list(F.struct("target_id", "channels", "overridden"))
            )
        ).alias("targets_json")
    )
    return per_window
