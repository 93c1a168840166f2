"""Stateful streaming processors (the reference's per-key mutable state).

The one genuinely stateful construct in the reference is the override
session (A5): a command patches a target's channels and sets an absolute
expiry; frames re-use the override until it lapses, checked lazily at frame
time (ref: src/transmitter/main.cpp:84-87,215-217). Both processors here use
``applyInPandasWithState`` — per-key state in the state store, Arrow-batched
user code, event-time logic so replays are deterministic.

Scale: state is per key (target/user); the state store shards by key across
executors (RocksDB provider in production: set
``spark.sql.streaming.stateStore.providerClass``). Per-key state is bounded
(pruned to the lookback horizon), so 1000 executors hold 1000th of the keys
each — no global state anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

US_PER_HOUR = 3_600_000_000

ASOF_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("active_override", T.LongType()),
    ]
)
ASOF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("p_ts", T.ArrayType(T.LongType())),
        T.StructField("p_id", T.ArrayType(T.LongType())),
    ]
)


def _make_asof_fn(late_slack_us: int):
    def _asof_fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-user as-of matcher: for each click, the max purchase event_id
        with purchase_ts in (click_ts - 1h, click_ts]. Purchases persist in
        state (pruned to the 1h horizon + late slack) so late batches
        continue correctly."""
        df = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        p_ts, p_id = (list(state.get[0]), list(state.get[1])) if state.exists else ([], [])
        out_ids: list[int] = []
        out_over: list[int | None] = []
        max_ts = 0
        for row in df.itertuples():
            t_us = row.ts.value // 1000  # pandas ns -> µs
            max_ts = max(max_ts, t_us)
            if row.event_type == "purchase":
                p_ts.append(t_us)
                p_id.append(int(row.event_id))
            elif row.event_type == "click":
                best = None
                for pt, pid in zip(p_ts, p_id):
                    if pt <= t_us and pt > t_us - US_PER_HOUR:
                        best = pid if best is None else max(best, pid)
                out_ids.append(int(row.event_id))
                out_over.append(best)
        horizon = max_ts - US_PER_HOUR - late_slack_us
        keep = [(a, b) for a, b in zip(p_ts, p_id) if a > horizon]
        state.update(([a for a, _ in keep], [b for _, b in keep]))
        yield pd.DataFrame(
            {"event_id": out_ids, "active_override": pd.array(out_over, dtype="Int64")}
        )

    return _asof_fn


def asof_override(events: DataFrame, late_slack: str = "1 hour") -> DataFrame:
    """A5 streaming form over an events stream (click/purchase rows).

    Ordering assumption: state is pruned relative to each batch's max event
    time (applyInPandasWithState exposes no per-group watermark), so a click
    arriving in a LATER micro-batch can only match purchases younger than
    (that batch max - lookback - ``late_slack``). ``late_slack`` must be >=
    the upstream watermark delay; events later than the watermark are the
    caller's responsibility to drop (``withWatermark`` upstream). Single-
    batch replays (the driver's availableNow drain) are exact regardless.
    """
    slack_us = int(pd.Timedelta(late_slack).value // 1000)
    filtered = events.filter(events.event_type.isin("click", "purchase")).select(
        "user_id", "ts", "event_id", "event_type"
    )
    return filtered.groupBy("user_id").applyInPandasWithState(
        _make_asof_fn(slack_us),
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- the transmitter override session itself (frames x commands) -----------

OVERRIDE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("target_id", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("frame_id", T.LongType()),
        T.StructField("channels", T.ArrayType(T.IntegerType())),
        T.StructField("overridden", T.BooleanType()),
    ]
)
# state: the active override patch + absolute expiry (µs epoch)
OVERRIDE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("patch", T.ArrayType(T.IntegerType())),
        T.StructField("expiry_us", T.LongType()),
    ]
)


def _override_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Override session per target (ref semantics, event-time):

    * command row -> store (patch, expiry = cmd_ts + duration ms)
      (ref: src/transmitter/main.cpp:215-217)
    * frame row   -> if frame_ts < expiry apply patch (-1 keeps live value,
      ref :190-213), else the override has lapsed (lazy check, ref :84-87).
    """
    df = pd.concat(list(pdfs)).sort_values(["ts", "seq"])
    patch, expiry = (state.get[0], state.get[1]) if state.exists else (None, -1)
    rows: list[tuple] = []
    for row in df.itertuples():
        t_us = row.ts.value // 1000
        if row.kind == "command":
            # plain Python ints — numpy scalars don't survive the return trip
            patch = [int(c) for c in row.channels]
            expiry = t_us + int(row.duration) * 1000
        else:  # frame
            live = [int(v) for v in row.channels]
            if patch is not None and t_us < expiry:
                merged = [c if c != -1 else v for c, v in zip(patch, live)]
                rows.append((int(key[0]), row.ts, int(row.frame_id), merged, True))
            else:
                rows.append((int(key[0]), row.ts, int(row.frame_id), live, False))
    state.update((patch, expiry))
    yield pd.DataFrame(
        rows, columns=["target_id", "ts", "frame_id", "channels", "overridden"]
    )


def override_sessions(tagged: DataFrame) -> DataFrame:
    """Run the override session over a unified (frames ∪ commands) stream.

    ``tagged`` columns: target_id, ts, seq, kind ('frame'|'command'),
    frame_id, channels, duration. Build it with
    ``pipeline.tag_frames_and_commands``.
    """
    return tagged.groupBy("target_id").applyInPandasWithState(
        _override_fn,
        outputStructType=OVERRIDE_OUTPUT_SCHEMA,
        stateStructType=OVERRIDE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def override_sessions_tws(tagged: DataFrame) -> DataFrame:
    """The same override session on Spark 4's ``transformWithStateInPandas``
    (the successor stateful API: typed state handles, timer support, state
    schema evolution). Semantics identical to ``override_sessions``;
    requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` — the production
    provider recommended at scale anyway). NOTE: the API's state workers
    need the ``google.protobuf`` runtime (they import pyspark's generated
    ``StateMessage_pb2``); an interpreter without protobuf crashes the
    "TransformWithStateInPySpark driver worker" at PRE_INIT —
    ``protobuf_compat.ensure_protobuf_runtime`` (called by
    ``session.get_spark``) shims a vendored runtime when one exists, and
    the test suite skips when none can be found. ``override_sessions`` is
    the portable default.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class OverrideProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("override", OVERRIDE_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            df = pd.concat(list(rows)).sort_values(["ts", "seq"])
            if self._state.exists():
                patch, expiry = self._state.get()
                patch = list(patch) if patch is not None else None
            else:
                patch, expiry = None, -1
            out: list[tuple] = []
            for row in df.itertuples():
                t_us = row.ts.value // 1000
                if row.kind == "command":
                    patch = [int(c) for c in row.channels]
                    expiry = t_us + int(row.duration) * 1000
                else:
                    live = [int(v) for v in row.channels]
                    if patch is not None and t_us < expiry:
                        merged = [c if c != -1 else v for c, v in zip(patch, live)]
                        out.append((int(key[0]), row.ts, int(row.frame_id), merged, True))
                    else:
                        out.append((int(key[0]), row.ts, int(row.frame_id), live, False))
            self._state.update((patch, int(expiry)))
            yield pd.DataFrame(
                out, columns=["target_id", "ts", "frame_id", "channels", "overridden"]
            )

        def close(self) -> None:
            pass

    return tagged.groupBy("target_id").transformWithStateInPandas(
        statefulProcessor=OverrideProcessor(),
        outputStructType=OVERRIDE_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
