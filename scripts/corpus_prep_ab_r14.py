"""Round-14 (cont.) same-epoch A/B at the x10 staged point:
corpus_prep_e2e WITH vs WITHOUT a lazy checkpoint on `e` (the
quality-gate + exact-dedup base that feeds the pairs pipeline, the
survivor-scoring join, and the staged `nd` write).

VERDICT (round 14): PARITY — old min 18.66/med 25.15 s vs checkpointed
18.24/24.21 s, old winning 4/6 rotation-paired reps; the checkpoint was
NOT adopted and the `_CPE_E_CKPT` toggle this probe flips was removed
with it. Re-running now times only the current (unchckpointed) form;
re-adding the A/B needs the flag restored at the `e` boundary in
plans/llmprep.py:corpus_prep_e2e.

Usage: python scripts/corpus_prep_ab_r14.py [--reps N] [--scratch DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import etl_mudah_spark.plans  # noqa: F401
from etl_mudah_spark.plans.registry import REGISTRY
from etl_mudah_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scratch", default="/root/scratch_x10_full")
    args = ap.parse_args()

    spark = get_spark()
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    sc_dir = os.path.join(args.scratch, "scaled")
    if not os.path.isdir(os.path.join(sc_dir, "documents")):
        from bench import stage_scaled

        print(f"staging full x10 into {args.scratch} ...")
        t0 = time.time()
        os.makedirs(args.scratch, exist_ok=True)
        stage_scaled(spark, SF_DIR, args.scratch, factor=10)
        print(f"staged in {time.time() - t0:.1f}s")
    else:
        print(f"reusing staged x10 at {sc_dir}")

    import etl_mudah_spark.plans.llmprep as lp

    def run(tag: str, rep: int) -> float:
        sc.setJobDescription(f"corpus_prep {tag} rep{rep}")
        t0 = time.time()
        REGISTRY["corpus_prep_e2e"].spark_fn(spark, sc_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.time() - t0
        print(f"  corpus_prep {tag} rep{rep}: {dt:.2f}s", flush=True)
        return dt

    times: dict[str, list[float]] = {"old": [], "new": []}
    has_flag = hasattr(lp, "_CPE_E_CKPT")
    for rep in range(args.reps):
        # rotate the within-rep order so neither form systematically
        # pays the round's cold cost
        pair = ("old", "new") if rep % 2 == 0 else ("new", "old")
        for tag in pair if has_flag else ("new",):
            if has_flag:
                lp._CPE_E_CKPT = tag == "new"
            times[tag].append(run(tag, rep))
    if has_flag:
        lp._CPE_E_CKPT = True
    sc.setJobDescription(None)
    for name, ts in times.items():
        if not ts:
            continue
        s = sorted(ts)
        print(
            f"corpus_prep {name}: min {s[0]:.2f} med {s[len(s) // 2]:.2f} "
            f"all {[round(t, 2) for t in ts]}"
        )


if __name__ == "__main__":
    main()
