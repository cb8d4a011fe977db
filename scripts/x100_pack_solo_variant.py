"""One-variant-per-session runner for the x100 pack A/B (round 14
cont.): a fresh JVM, the staged docs dir reused from
scripts/x100_pack_ab_r14.py, N noop-sink reps of ONE variant, printed
as min/med/all. Run alternately (old / new / old / new) so each
variant sees the same epoch mix without sharing a session's
checkpoint-storage history.

Usage: python scripts/x100_pack_solo_variant.py old|tok|new [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import etl_mudah_spark.plans  # noqa: F401
from etl_mudah_spark.plans.registry import REGISTRY
from etl_mudah_spark.session import get_spark
from scripts.x100_pack_ab_r14 import pack_global_old, pack_global_tok

variant = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
sc_dir = os.environ.get("PACK_SC_DIR", "/root/scratch_x100_docs/scaled")

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
fn = {
    "old": lambda: pack_global_old(spark, sc_dir),
    "tok": lambda: pack_global_tok(spark, sc_dir),
    "new": lambda: REGISTRY["doc_shard_pack_global"].spark_fn(spark, sc_dir),
}[variant]

ts = []
for rep in range(reps):
    spark.sparkContext.setJobDescription(f"pack_global {variant} rep{rep}")
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    ts.append(time.time() - t0)
    print(f"  rep{rep}: {ts[-1]:.2f}s", flush=True)
s = sorted(ts)
print(
    f"SOLO {variant}: min {s[0]:.2f} med {s[len(s) // 2]:.2f} "
    f"all {[round(t, 2) for t in ts]}"
)
