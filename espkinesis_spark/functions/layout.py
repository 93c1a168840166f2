"""Z-order (Morton) data-layout operators.

Multi-dimensional clustering for the 100 TB write path: interleaving the
bits of two quantized dimensions yields ONE sort key whose ranges are
local in BOTH dimensions at once, so a range-partitioned, z-sorted
parquet layout lets predicates on EITHER column prune files via min/max
footer stats (the OPTIMIZE ZORDER idea in the open Delta/Iceberg
ecosystems; the curve itself is Morton 1966). A plain sort buys pruning
on one axis only — the layout report in ``ex_zorder_layout`` makes the
difference measurable: every z-bucket spans a small extent of BOTH axes.

Everything here is exact signed-64-bit integer bit manipulation (shifts,
masks, adds), so the DuckDB oracle replays the math verbatim and the
key survives any SF: 2 x 16 bits = a 32-bit z-value with 2^31 headroom.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from espkinesis_spark.functions import common as C


def z_value(x: Column, y: Column, bits: int = C.ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative long columns
    into one Morton key: x's bit i lands at position 2i, y's at 2i+1 (y
    is the HIGH axis of each pair). Pure codegen — 2*bits shift/mask/add
    terms, no UDF, no shuffle."""
    out: Column | None = None
    for i in range(bits):
        xt = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        yt = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = xt + yt
        out = term if out is None else out + term
    assert out is not None
    return out.cast("long")


def z_value_sql(x: str, y: str, bits: int = C.ZORDER_BITS) -> str:
    """The identical interleave as portable SQL (DuckDB oracle side)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def range_quantize(col: str, mn: str, mx: str, bits: int = C.ZORDER_BITS) -> Column:
    """Quantize column ``col`` onto a 2^bits grid over [mn, mx] with exact
    integer arithmetic: least((col - mn) * 2^bits div (mx - mn + 1),
    2^bits - 1). Integer `div` end to end — no float scaling, so the
    grid is deterministic and monotone (grid order = value order) and
    the DuckDB `//` replay is bit-identical. Arguments are COLUMN NAMES
    (the exact-div needs SQL `div`, which takes expressions by name).
    Callers keep (col - mn) * 2^bits inside int64 — e.g. quantize epoch
    MILLIS, not micros: a 10-year span in ms is ~3e11, x 65536 ~2e16,
    well under 2^63."""
    n = 1 << bits
    return F.expr(
        f"least((({col} - {mn}) * {n}) div ({mx} - {mn} + 1), {n - 1})"
    ).cast("long")


def bucket_axis_bits(bucket: Column, axis: int, report_bits: int = C.ZORDER_REPORT_BITS) -> Column:
    """De-interleave one axis' bits out of a z-REPORT bucket id: axis 0 is
    the LOW axis of each pair (x in ``z_value``), axis 1 the high (y).
    For the 6-bit report bucket this returns the axis' 3-bit octile —
    the exact top-3 grid bits of that axis (floor-div composition:
    (v * 2^bits div span) div 2^(bits-3) == v * 8 div span), which is
    what makes octile-range pruning LOSSLESS and monotone."""
    out: Column | None = None
    for i in range(report_bits // 2):
        bit = F.shiftright(bucket, 2 * i + axis).bitwiseAND(F.lit(1))
        term = F.shiftleft(bit, i)
        out = term if out is None else out + term
    assert out is not None
    return out.cast("long")


def zorder_write_plan(df: DataFrame, zcol: str, num_files: int) -> DataFrame:
    """The production z-ordered WRITE layout: range-partition the frame on
    the z-key (RangePartitioning — contiguous z-ranges per output file)
    and sort within each partition, so every parquet file carries tight
    min/max footer stats on BOTH underlying dimensions. Returned (not
    written) so callers pick the sink; the plan audit pins the
    RangePartitioning exchange."""
    return df.repartitionByRange(num_files, F.col(zcol)).sortWithinPartitions(zcol)
