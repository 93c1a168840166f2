"""Skew-mitigation utilities.

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime; explicit salting remains the tool when one join key dominates so
heavily that even split partitions bottleneck, or when AQE is unavailable
(streaming stateful stages).

``salted_join``: replicate the build side SALT ways and scatter the probe
side uniformly across the replicas, so a hot key's rows spread over SALT
tasks instead of one. Cost: build side bytes x SALT — use for fact-to-
medium-dim joins where the dim is too big to broadcast but cheap to
replicate a few ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe`` x ``build`` on ``key`` with ``salt``-way key
    splitting. Result equals ``probe.join(build, key, how)`` (modulo column
    order); supported ``how``: inner / left.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    # round-robin salt: hot-key rows spread evenly regardless of content
    # (hashing row content would collapse identical rows into one bucket);
    # the salt value never reaches the output, so retry nondeterminism of
    # the id is harmless
    salted_probe = probe.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int")
    )
    replicas = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_probe.join(replicas, [key, "__salt"], how)
    return out.drop("__salt")
