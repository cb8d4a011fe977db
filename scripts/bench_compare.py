"""Round-over-round bench comparison (VERDICT r11 item 8): print the
per-query deltas between two BENCH_DETAIL records, flagging anything
>25% off — the guardrail that gives the set-2 LLM-tier series (and
every other per-query map) an actual reader each round.

Usage:
    python scripts/bench_compare.py OLD.json [NEW.json]
    # NEW defaults to the working-tree BENCH_DETAIL.json

Typical: compare the previous round's committed record
    git show <prev>:BENCH_DETAIL.json > /tmp/prev.json
    python scripts/bench_compare.py /tmp/prev.json
"""
import json
import sys

THRESH = 0.25

MAPS = [
    "queries",
    "queries_multifile",
    "queries_sf_x10",
    "queries2_sf_x10",
    "queries_sf_x100",
]
SCALARS = [
    "value",
    "value_multifile",
    "value_sf_x10",
    "value2_sf_x10",
    "value_sf_x100",
    "merge_upsert_batch",
    "srp_incremental_batch_sec",
    "q18_ivm_refresh_sec",
    "streaming_rows_per_sec",
    "streaming_rows_per_sec_state_sized",
    "streaming_rows_per_sec_saturated",
]


def main() -> None:
    old_path = sys.argv[1]
    new_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL.json"
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    print(f"old: {old_path} (solo={old.get('load', {}).get('solo_attested')})")
    print(f"new: {new_path} (solo={new.get('load', {}).get('solo_attested')})")
    flagged = 0
    for k in SCALARS:
        a, b = old.get(k), new.get(k)
        if a is None or b is None or not a:
            continue
        d = (b - a) / a
        mark = "  <-- >25%" if abs(d) > THRESH else ""
        print(f"{k:38s} {a:>10} -> {b:>10}  {d:+.0%}{mark}")
    for m in MAPS:
        a, b = old.get(m) or {}, new.get(m) or {}
        common = sorted(set(a) & set(b))
        gone, came = sorted(set(a) - set(b)), sorted(set(b) - set(a))
        if gone or came:
            print(f"[{m}] dropped={gone} added={came}")
        for q in common:
            if not a[q]:
                continue
            d = (b[q] - a[q]) / a[q]
            if abs(d) > THRESH:
                flagged += 1
                print(f"[{m}] {q:34s} {a[q]:8.3f} -> {b[q]:8.3f}  {d:+.0%}  <--")
    print(f"\n{flagged} per-query movers past {THRESH:.0%}")


if __name__ == "__main__":
    main()
