"""The round-6 AND round-11 bench records were lost because bench.py's
stdout JSON line outgrew the driver's capture (BENCH_r06.json and
BENCH_r11.json: "parsed": null — the driver keeps only the LAST ~2000
chars of stdout). These tests pin the round-12 fix: the emitted line
stays under MAX_LINE_BYTES (itself < 2000 with margin) for a full-size
result, per-query maps of the secondary scale points NEVER ride the
line, and nothing is lost — the detail file keeps the complete record.
"""

import json

import bench

# the empirical driver limit the line must survive, with margin
DRIVER_CAPTURE_CHARS = 2000


def _full_result() -> dict:
    """A synthetic result at least as large as round 11's real one
    (the one that overflowed): 14 queries x 3 scale points with
    per-query IO maps, per-query DuckDB timings at two points, the
    set-2 LLM-tier series, staging policies, streaming block."""
    qnames = [f"query_with_a_long_descriptive_name_{i:02d}" for i in range(14)]
    q = {n: 12.345678 for n in qnames}
    io = {
        n: {
            "shuffle_read": 123456789,
            "shuffle_write": 987654321,
            "input": 10**12,
            "spill": 0,
        }
        for n in qnames
    }
    s2names = [f"set2_query_with_a_long_name_{i:02d}" for i in range(10)]
    return {
        "metric": "headline_queries_total",
        "value": 123.456,
        "unit": "sec",
        "sf": 0.1,
        "queries": q,
        "io": io,
        "merge_upsert_batch": 0.6,
        "methodology": {
            "reps": 5,
            "reps_used": {n: 5 for n in qnames},
            "reps_used_multifile": {n: 5 for n in qnames},
            "reps_used_sf_x10": {n: 3 for n in qnames},
            "stat": "median",
            "sink": "noop",
            "merge_stat": "best",
        },
        "queries_multifile": q,
        "io_multifile": io,
        "value_multifile": 7.1,
        "multifile_policy": {"target_bytes": 524288, "cap": 32},
        "queries_sf_x10": q,
        "io_sf_x10": io,
        "value_sf_x10": 99.9,
        "scale_policy": {
            "factor": 10,
            "bytes": 10**9,
            "bytes_base": 10**8,
            "reps": 3,
            "notes": "x" * 200,
        },
        "queries2_sf_x10": {n: 16.789012 for n in s2names},
        "value2_sf_x10": 67.9,
        "value2_errors": 1,
        "queries2_errors_x10": {s2names[0]: "SomeError: " + "y" * 180},
        "srp_incremental_batch_sec": 3.912,
        "duckdb": {n: 0.123 for n in qnames},
        "value_duckdb": 0.67,
        "duckdb_sf_x10": {n: 1.234 for n in qnames},
        "value_duckdb_sf_x10": 12.3,
        "queries_sf_x100": {n: 30.0 for n in qnames[:3]},
        "io_sf_x100": {n: io[n] for n in qnames[:3]},
        "value_sf_x100": 90.0,
        "duckdb_sf_x100": {n: 20.0 for n in qnames[:3]},
        "scale_policy_x2": {"factor": 100, "bytes": 10**10},
        "spark_vs_duckdb": {
            "base_singlefile": 9.7,
            "x10": 2.2,
            "x100_scan_bound": 0.9,
        },
        "streaming_rows_per_sec": 6300,
        "streaming_rows_per_sec_saturated": 45800,
        "streaming_rows_per_sec_state_sized": 19100,
        "streaming_input_rows": 10**6,
        "streaming_batches": 16,
        "streaming_batch_latency_sec": 0.5,
        "streaming_state_groups": 1234,
        "load": {
            "start": [0.12, 0.34, 0.56],
            "pre_streaming": [28.5, 14.2, 7.1],
            "end": [30.0, 20.0, 10.0],
            "solo_attested": False,
        },
        "detail": "BENCH_DETAIL.json",
    }


def test_line_fits_driver_capture():
    line, detail = bench.split_result(_full_result())
    blob = json.dumps(line)
    # MAX_LINE_BYTES must itself clear the driver's 2000-char tail
    # capture with margin — round 11's 4096 allowance did not.
    assert bench.MAX_LINE_BYTES <= DRIVER_CAPTURE_CHARS - 300
    assert len(blob) <= bench.MAX_LINE_BYTES
    parsed = json.loads(blob)
    # the headline numbers the judge reads must survive on the line
    assert parsed["metric"] == "headline_queries_total"
    assert len(parsed["queries"]) == 14
    assert parsed["value_sf_x10"] == 99.9
    assert parsed["value2_sf_x10"] == 67.9
    # a set-2 error must be visible ON the line so a partial value2 sum
    # can never read as an improvement (ADVICE r11)
    assert parsed["value2_errors"] == 1
    assert parsed["value_sf_x100"] == 90.0
    assert parsed["srp_incremental_batch_sec"] == 3.912
    assert parsed["spark_vs_duckdb"]["x10"] == 2.2
    assert parsed["streaming_rows_per_sec_saturated"] == 45800
    assert parsed["streaming_rows_per_sec_state_sized"] == 19100
    # machine-load evidence must ride the line so floor metrics are
    # attributable (VERDICT r9 item 3)
    assert parsed["load"]["start"] == [0.12, 0.34, 0.56]
    assert parsed["load"]["solo_attested"] is False


def test_detail_keeps_everything():
    full = _full_result()
    _, detail = bench.split_result(full)
    # the detail file is the FULL record — io maps, duckdb per-query,
    # methodology, the per-query secondary-scale maps, and the x100
    # subset all present
    for k in full:
        assert k in detail, k
    assert detail["io"] and detail["duckdb"] and detail["queries_sf_x100"]
    assert detail["queries_sf_x10"] and detail["queries2_sf_x10"]


def test_skipped_surfaces_flagged_on_line():
    """A smoke config (scale/streaming surfaces skipped via env) must
    say so ON the line AND in the detail file, so a partial run that
    overwrites BENCH_DETAIL.json is recognizable as partial."""
    partial = _full_result()
    partial["surfaces_skipped"] = ["scale_x10", "scale_x100", "streaming"]
    line, detail = bench.split_result(partial)
    assert line["surfaces_skipped"] == ["scale_x10", "scale_x100", "streaming"]
    assert detail["surfaces_skipped"] == line["surfaces_skipped"]


def test_bulky_keys_never_on_line():
    line, _ = bench.split_result(_full_result())
    # EVERY per-query map of a secondary scale point stays off the
    # line — round 11 overflowed the driver capture when one landed
    for k in ("io", "io_multifile", "io_sf_x10", "duckdb", "duckdb_sf_x10",
              "methodology", "scale_policy", "queries_sf_x100",
              "queries_multifile", "queries_sf_x10", "queries2_sf_x10",
              "queries2_errors_x10"):
        assert k not in line, k


def test_bench_query_lists_resolve_in_registry():
    """Every name bench.py times must exist in the registry (BENCH_FNS
    production overrides excepted by construction) — a typo in
    HEADLINE/HEADLINE2/the x100 subset would otherwise surface only as
    a mid-run KeyError after minutes of staging."""
    import etl_mudah_spark.plans  # noqa: F401  (registers queries)
    from etl_mudah_spark.plans.registry import REGISTRY

    for name in bench.HEADLINE + bench.HEADLINE2:
        assert name in REGISTRY or name in bench.BENCH_FNS, name
    # the x100 subset literal inside main(); pin the names it uses
    import inspect

    src = inspect.getsource(bench.main)
    for name in ("pricing_summary", "big_orders", "big_orders_preagg",
                 "keep_one_per_order"):
        assert f'"{name}"' in src and name in REGISTRY, name
