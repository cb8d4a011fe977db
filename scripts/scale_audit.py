"""Dump scale-hazard diagnostics for EVERY registered query's plan.

For each of the 110 registered queries (built lazily at sf0.001 — no
execution), report occurrences of:
  - CartesianProduct              (always a hazard)
  - BroadcastNestedLoopJoin       (fine only when the broadcast side is
                                   a tiny aggregate / literal grid)
  - unpartitioned Window          (single-task sort of the full input)
  - Exchange SinglePartition      (fine after aggregation, hazard before)

Used to seed tests/test_scale_audit.py's allowlists with *reviewed*
exceptions rather than guesses.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from etl_mudah_spark.session import get_spark  # noqa: E402
import etl_mudah_spark.plans  # noqa: E402,F401
from etl_mudah_spark.plans import registry  # noqa: E402

SF = "/root/testdata/sf0.001"

# Window [funcs], [partitionSpec], [orderSpec] in the optimized plan —
# an empty partitionSpec prints as `], [], [`.
_UNPART_WINDOW = re.compile(r"Window \[[^\n]*\], \[\], \[")


def main() -> None:
    spark = get_spark("scale-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, q in registry.REGISTRY.items():
        try:
            df = q.spark_fn(spark, SF)
            qe = df._jdf.queryExecution()
            opt = qe.optimizedPlan().toString()
            phys = qe.executedPlan().toString()
        except Exception as e:  # pragma: no cover - diagnostic tool
            rows.append((name, f"BUILD-ERROR {str(e)[:120]}"))
            continue
        flags = []
        if "CartesianProduct" in phys:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in phys:
            flags.append("BNLJ")
        if _UNPART_WINDOW.search(opt):
            flags.append("UNPART-WINDOW")
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
