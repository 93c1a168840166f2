"""Deterministic stream fixtures for replay tests (FIXTURES.md §B).

Generated with a fixed seed; value domains follow the reference contract
(channels 1000-2000 with -1 sentinel in commands; 8 targets named Drone_N
with canonical MAC strings; ~30% invalid commands covering every K4 error
class).
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from espkinesis_spark.streaming.sources import ACK_SCHEMA, COMMAND_LINE_SCHEMA, FRAME_SCHEMA

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("mac", T.StringType()),
        T.StructField("reg_ts", T.TimestampType()),
    ]
)


def targets_df(spark: SparkSession, n: int = 8) -> DataFrame:
    """The static target registry (ref: src/transmitter/main.cpp:42-51,328-331)."""
    rows = [
        (
            i + 1,
            f"Drone_{i + 1}",
            ":".join(f"{b:02X}" for b in (0xA0, 0xB1, 0xC2, 0xD3, 0xE4, i + 1)),
            T0 + timedelta(seconds=i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, TARGET_SCHEMA)


def frames_rows(n: int = 400, hz: float = 2.0, seed: int = 42):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        jitter = rng.uniform(-0.05, 0.05)
        ts = T0 + timedelta(seconds=i / hz + jitter)
        rows.append((i, ts, [rng.randint(1000, 2000) for _ in range(8)]))
    return rows


def commands_rows(n: int = 60, n_targets: int = 8, seed: int = 43):
    """Valid + every invalid class (~30%) — ref error branches
    (src/transmitter/main.cpp:125-273)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        ts = T0 + timedelta(seconds=rng.uniform(0, 200))
        kind = rng.random()
        tid = rng.randint(1, n_targets)
        chans = [rng.choice([-1, rng.randint(1000, 2000)]) for _ in range(8)]
        dur = rng.randint(500, 5000)
        if kind < 0.70:
            raw = json.dumps(
                {"command": "override_channels", "target_id": tid, "channels": chans, "duration": dur}
            )
        elif kind < 0.75:
            raw = '{"command": "override_channels", "target_id":'  # malformed JSON
        elif kind < 0.80:
            raw = json.dumps({"target_id": tid, "channels": chans, "duration": dur})  # no command
        elif kind < 0.85:
            raw = json.dumps({"command": "self_destruct", "target_id": tid})  # unknown command
        elif kind < 0.90:
            raw = json.dumps({"command": "override_channels", "target_id": 99, "channels": chans, "duration": dur})  # unknown target
        elif kind < 0.95:
            raw = json.dumps({"command": "override_channels", "target_id": tid, "channels": chans, "duration": 0})  # bad duration
        else:
            bad = chans[:]
            bad[rng.randint(0, 7)] = rng.choice([999, 2001, 12345])
            raw = json.dumps({"command": "override_channels", "target_id": tid, "channels": bad, "duration": dur})  # out of range
        rows.append((i, ts, raw))
    return rows


def acks_rows(n_frames: int = 400, n_targets: int = 8, hz: float = 2.0, seed: int = 44):
    """~90% ok with per-target failure runs so staleness has positives."""
    rng = random.Random(seed)
    rows = []
    dead_target = 3  # goes silent halfway through
    for i in range(n_frames):
        for t in range(1, n_targets + 1):
            ts = T0 + timedelta(seconds=i / hz + 0.01 + t * 0.001)
            mac = ":".join(f"{b:02X}" for b in (0xA0, 0xB1, 0xC2, 0xD3, 0xE4, t))
            ok = rng.random() < 0.9 and not (t == dead_target and i > n_frames // 2)
            rows.append((ts, mac, ok))
    return rows


def write_fixtures(spark: SparkSession, out_dir: str) -> dict[str, str]:
    """Write all replayable fixtures; returns name -> path."""
    paths = {}
    frames = spark.createDataFrame(frames_rows(), FRAME_SCHEMA)
    paths["frames"] = os.path.join(out_dir, "channel_frames")
    frames.coalesce(1).write.mode("overwrite").parquet(paths["frames"])

    cmds = spark.createDataFrame(commands_rows(), COMMAND_LINE_SCHEMA)
    paths["commands"] = os.path.join(out_dir, "commands")
    cmds.coalesce(1).write.mode("overwrite").json(paths["commands"])

    acks = spark.createDataFrame(acks_rows(), ACK_SCHEMA)
    paths["acks"] = os.path.join(out_dir, "send_acks")
    acks.coalesce(1).write.mode("overwrite").parquet(paths["acks"])
    return paths
