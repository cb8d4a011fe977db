"""Capture explain("formatted") before/after plans for round 15.

    python scripts/capture_plans_r15.py before [names...]
    python scripts/capture_plans_r15.py after  [names...]

Default name set: the 14 headline queries + the set-2 x10 queries +
the x100 members — every benched query surface. Plans go to
plans/r15/<name>_<tag>.txt. Explain-only (no execution), so this is
cheap and epoch-independent.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import bench
from etl_mudah_spark.plans import registry
from etl_mudah_spark.session import get_spark

DEFAULT = list(bench.HEADLINE) + [
    n for n in bench.HEADLINE2 if n not in bench.HEADLINE
] + ["big_orders_preagg", "doc_shard_pack_global"]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("capture_plans_r15")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(_ROOT, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = bench.BENCH_FNS.get(name) or registry.REGISTRY[name].spark_fn
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"{name}: {len(buf.getvalue())} chars -> {path}")
        except Exception as exc:  # corpus_prep_e2e stages eagerly; skip heavy ones on error
            print(f"{name}: FAILED ({exc})")


if __name__ == "__main__":
    main()
