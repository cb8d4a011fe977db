"""Dump scale-hazard diagnostics for EVERY registered query's plan.

For each registered query (built at sf0.001), report occurrences of:
  - CartesianProduct              (always a hazard)
  - BroadcastNestedLoopJoin       (fine only when the broadcast side is
                                   a tiny aggregate / literal grid)
  - GLOBAL-WINDOW                 (Window fed by Exchange SinglePartition —
                                   detector shared with the test)
  - Exchange SinglePartition      (fine after aggregation, hazard before)

Used to seed tests/test_scale_audit.py's allowlists with *reviewed*
exceptions rather than guesses; the pass/fail gate is that test, this
script is the human-readable dump.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from etl_mudah_spark.session import get_spark  # noqa: E402
import etl_mudah_spark.plans  # noqa: E402,F401
from etl_mudah_spark.plans import registry  # noqa: E402

SF = "/root/testdata/sf0.001"

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
from tests.test_scale_audit import _global_windows  # noqa: E402


def main() -> None:
    spark = get_spark("scale-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, q in registry.REGISTRY.items():
        try:
            df = q.spark_fn(spark, SF)
            phys = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - diagnostic tool
            rows.append((name, f"BUILD-ERROR {str(e)[:120]}"))
            continue
        flags = []
        if "CartesianProduct" in phys:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in phys:
            flags.append("BNLJ")
        if _global_windows(phys):
            flags.append("GLOBAL-WINDOW")
        n_single = phys.count("Exchange SinglePartition")
        if n_single:
            flags.append(f"SINGLE-EXCH x{n_single}")
        if flags:
            rows.append((name, ", ".join(flags)))
    print(f"{len(registry.REGISTRY)} queries; {len(rows)} flagged:")
    for name, f in rows:
        print(f"  {name:40s} {f}")


if __name__ == "__main__":
    main()
