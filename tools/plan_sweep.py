"""Red-flag physical-plan sweep over every batch registry entry.

Greps each entry's physical plan for the three 100 TB killers:
- ``CartesianProduct`` — an unkeyed join that explodes quadratically,
- ``BatchEvalPython`` — row-at-a-time Python (the only acceptable Python
  stages are Arrow-batched: MapInPandas / ArrowEvalPython / pandas UDFs),
- ``SinglePartition`` exchanges — all data funneled through one task.

SinglePartition hits are REPORTED, not failed: a global scalar reduce
over map-side partials (totals, bounds, vocab size) and summary-sized
windows (downsample anchors, sketch-quantile bounds) are inherent and
tiny — the sweep output is for eyeballing that every hit stays in that
category and none is data-sized. Streaming entries are skipped (their
plans only materialize at query start; the multibatch replay tests in
tests/test_streaming.py cover their shapes).

Usage: python tools/plan_sweep.py [SF_DIR]   (default sf0.001)
"""

from __future__ import annotations

import sys

from espkinesis_spark import queries
from espkinesis_spark.plans import physical_plan
from espkinesis_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    cartesian, row_python, single = [], [], []
    skipped, broken = [], []
    for name, fn in queries.registry().items():
        if name.startswith("st_"):
            skipped.append(name)
            continue
        try:
            plan = physical_plan(fn(spark, sf_dir))
        except Exception as exc:  # a broken entry is its own red flag
            print(f"ERROR {name}: {exc}")
            broken.append(name)
            continue
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BatchEvalPython" in plan:
            row_python.append(name)
        if "SinglePartition" in plan:
            single.append(name)
    print(f"cartesian ({len(cartesian)}): {cartesian}")
    print(f"row_at_a_time_python ({len(row_python)}): {row_python}")
    print(f"single_partition ({len(single)}): {single}")
    print(f"skipped_streaming ({len(skipped)})")
    assert not broken, f"entries failed to build a plan: {broken}"
    assert not cartesian, "CartesianProduct found"
    assert not row_python, "row-at-a-time Python found"
    print("SWEEP CLEAN (single-partition hits above are for review)")


if __name__ == "__main__":
    main()
