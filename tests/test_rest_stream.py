"""Streaming listings source (sources/rest.py ListingsStreamReader):
offset-cursor incremental ingest over the same paginated transport as
the batch reader — the Structured-Streaming expression of the
reference's scheduled re-scrape (dags/dag.py:284-342)."""

import json

import pytest

from etl_mudah_spark.sources.fixtures import growing_fixture_fetcher_factory
from etl_mudah_spark.sources.rest import ListingsDataSource, ListingsStreamReader

FETCHER = "etl_mudah_spark.sources.fixtures:growing_fixture_fetcher_factory"


def _opts(count_file, **extra):
    return {
        "fetcher": FETCHER,
        "fetcher_arg": count_file,
        "regions": json.dumps(["1", "2"]),
        "page_size": "20",
        "rate_delay_s": "0",
        **extra,
    }


@pytest.fixture()
def count_file(tmp_path):
    p = str(tmp_path / "count.txt")
    with open(p, "w") as fh:
        fh.write("30")
    return p


def test_stream_reader_pages_from_cursor(count_file):
    r = ListingsStreamReader(None, _opts(count_file))
    assert r.initialOffset() == {"1": 0, "2": 0}
    rows, end = r.read(r.initialOffset())
    rows = list(rows)
    assert len(rows) == 60 and end == {"1": 30, "2": 30}
    # feed grows; next read ingests ONLY the new tail
    with open(count_file, "w") as fh:
        fh.write("50")
    rows2, end2 = r.read(end)
    assert len(list(rows2)) == 40 and end2 == {"1": 50, "2": 50}
    # caught-up read: empty batch, cursor parked
    rows3, end3 = r.read(end2)
    assert list(rows3) == [] and end3 == end2


def test_stream_reader_max_per_trigger_bounds_batch(count_file):
    r = ListingsStreamReader(None, _opts(count_file, max_per_trigger="10"))
    rows, end = r.read(r.initialOffset())
    assert len(list(rows)) == 20  # 10 per region
    assert end == {"1": 10, "2": 10}


def test_stream_reader_replay_window_is_exact(count_file):
    r = ListingsStreamReader(None, _opts(count_file))
    start = r.initialOffset()
    it, end = r.read(start)
    rows = list(it)
    replayed = list(r.readBetweenOffsets(start, end))
    assert replayed == rows
    # partial window replays exactly that slice
    mid = {"1": 10, "2": 0}
    sliced = list(r.readBetweenOffsets(r.initialOffset(), mid))
    assert sliced == rows[:10]


def test_stream_end_to_end_exactly_once_across_growth(spark, tmp_path, count_file):
    # two availableNow runs against a growing feed, one checkpoint:
    # the second ingests only the 20-per-region tail, no re-reads
    spark.dataSource.register(ListingsDataSource)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("mudah_listings")
            .options(**_opts(count_file))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    first = spark.read.parquet(out).count()
    assert first == 60
    with open(count_file, "w") as fh:
        fh.write("50")
    drain()
    df = spark.read.parquet(out)
    assert df.count() == 100
    assert df.select("id", "attributes.region_id").distinct().count() == 100


def test_growing_fixture_matches_static_fixture_prefix(count_file):
    # the stream fixture is the SAME deterministic listing generator:
    # offsets replay like an append-only feed
    from etl_mudah_spark.sources.fixtures import fixture_fetcher_factory

    grow = growing_fixture_fetcher_factory(count_file)
    static = fixture_fetcher_factory()
    assert grow("1", 0, 20) == static("1", 0, 20)
    assert grow("2", 20, 10) == static("2", 20, 10)


def test_stream_ingest_listings_live_end_to_end(spark, tmp_path, count_file):
    # API -> flatten -> keyed upsert, exactly-once across feed growth:
    # the reference's whole pipeline as one streaming statement
    from etl_mudah_spark.streaming.ingest import stream_ingest_listings_live

    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    opts = _opts(count_file)

    stream_ingest_listings_live(spark, table, ckpt, opts)
    t1 = spark.read.parquet(table)
    n1 = t1.count()
    # 30/region x 2 regions minus cross-region id dups merged away
    assert n1 == t1.select("listing_id").distinct().count()
    assert 50 < n1 <= 60

    with open(count_file, "w") as fh:
        fh.write("50")
    stream_ingest_listings_live(spark, table, ckpt, opts)
    t2 = spark.read.parquet(table)
    n2 = t2.count()
    assert n2 == t2.select("listing_id").distinct().count()
    assert n2 > n1  # the tail arrived, still one row per listing
