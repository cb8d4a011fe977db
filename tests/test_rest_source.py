"""The REST DataSource driven end-to-end through spark.read.format,
against the in-code fixture transport (full machinery, zero network)."""

from __future__ import annotations

import json

import pytest

from etl_mudah_spark.operators.dedup import exact_dedup
from etl_mudah_spark.operators.flatten import clean_listings, flatten_listings
from etl_mudah_spark.sources.fixtures import ROWS_PER_REGION
from etl_mudah_spark.sources.rest import (
    ListingsDataSource,
    TransientFetchError,
    fetch_with_retry,
)

FETCHER = "etl_mudah_spark.sources.fixtures:fixture_fetcher_factory"


@pytest.fixture(scope="module")
def raw(spark):
    spark.dataSource.register(ListingsDataSource)
    return (
        spark.read.format("mudah_listings")
        .option("fetcher", FETCHER)
        .option("regions", json.dumps(["1", "2", "3"]))
        .option("page_size", "20")
        .option("rate_delay_s", "0")
        .load()
    )


def test_reads_all_regions(raw):
    assert raw.count() == 3 * ROWS_PER_REGION


def test_nested_schema(raw):
    assert raw.schema["attributes"].dataType["mileage"].dataType["gte"].dataType.typeName() == "string"


def test_flatten_and_dedup(raw):
    flat = flatten_listings(raw)
    assert flat.columns[:3] == ["listing_id", "title", "price"]
    # cross-region duplicate ids planted by the fixture
    assert flat.count() > flat.select("listing_id").distinct().count()
    deduped = exact_dedup(flat, ["listing_id"], ["listing_date", "region_id"])
    assert deduped.count() == flat.select("listing_id").distinct().count()


def test_clean_drops_junk_years_and_zero_prices(raw):
    flat = flatten_listings(raw)
    cleaned = clean_listings(flat, as_of_year=2025)
    rows = cleaned.collect()
    assert rows, "cleaning removed everything"
    for r in rows:
        assert 0 < float(r.price) < 1_000_000
        assert len(r.year) == 4 and r.year.isdigit()
        assert r.age == 2025 - r.year_i
        if r.mileage_min_d is not None and r.mileage_max_d is not None:
            assert r.mileage_avg == (r.mileage_min_d + r.mileage_max_d) / 2


def test_row_cap_respected(spark):
    df = (
        spark.read.format("mudah_listings")
        .option("fetcher", FETCHER)
        .option("regions", json.dumps(["1"]))
        .option("page_size", "20")
        .option("max_per_region", "20")
        .option("rate_delay_s", "0")
        .load()
    )
    assert df.count() == 20


def test_retry_backoff_honors_retry_after():
    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky(region, offset, limit):
        calls["n"] += 1
        if calls["n"] < 3:
            raise TransientFetchError("429", retry_after=7.5 if calls["n"] == 1 else None)
        return {"data": []}

    page = fetch_with_retry(
        flaky, "1", 0, 20, initial_backoff_s=10.0, sleep=sleeps.append
    )
    assert page == {"data": []}
    # first sleep = Retry-After, second = current backoff
    assert sleeps == [7.5, 10.0]


def test_retry_gives_up():
    def always_fail(region, offset, limit):
        raise TransientFetchError("boom")

    with pytest.raises(RuntimeError, match="after 5 attempts"):
        fetch_with_retry(always_fail, "1", 0, 20, sleep=lambda s: None)


# --- default HTTP transport: transient-failure mapping ------------------

import contextlib
import io
from email.message import Message
from urllib.error import HTTPError, URLError

from etl_mudah_spark.sources.rest import default_http_fetcher


def _http_error(code: int, retry_after: str | None = None) -> HTTPError:
    headers = Message()
    if retry_after is not None:
        headers["Retry-After"] = retry_after
    return HTTPError("http://x", code, "err", headers, io.BytesIO(b""))


def _flaky_opener(failures: list[Exception]):
    """Opener raising each queued exception once, then serving a page."""
    calls = {"n": 0}

    @contextlib.contextmanager
    def opener(url, timeout=None):
        i = calls["n"]
        calls["n"] += 1
        if i < len(failures):
            raise failures[i]
        yield io.BytesIO(json.dumps({"data": []}).encode())

    opener.calls = calls
    return opener


def test_default_transport_maps_429_with_retry_after():
    fetch = default_http_fetcher(
        "http://x", opener=_flaky_opener([_http_error(429, "7.5")])
    )
    with pytest.raises(TransientFetchError) as exc:
        fetch("1", 0, 20)
    assert exc.value.retry_after == 7.5


def test_default_transport_maps_5xx_and_urlerror():
    for err in (_http_error(503), URLError("conn reset")):
        fetch = default_http_fetcher("http://x", opener=_flaky_opener([err]))
        with pytest.raises(TransientFetchError) as exc:
            fetch("1", 0, 20)
        assert exc.value.retry_after is None


def test_default_transport_http_date_retry_after_falls_back():
    # Retry-After may be an HTTP-date; parsing it as seconds fails, so
    # the retry loop falls back to exponential backoff (retry_after=None).
    fetch = default_http_fetcher(
        "http://x",
        opener=_flaky_opener([_http_error(429, "Wed, 21 Oct 2026 07:28:00 GMT")]),
    )
    with pytest.raises(TransientFetchError) as exc:
        fetch("1", 0, 20)
    assert exc.value.retry_after is None


def test_default_transport_propagates_hard_4xx():
    fetch = default_http_fetcher("http://x", opener=_flaky_opener([_http_error(404)]))
    with pytest.raises(HTTPError):
        fetch("1", 0, 20)


def test_retry_loop_recovers_through_default_transport():
    """End-to-end: a 429-then-503-then-success server succeeds after
    backoff, honoring the Retry-After value (reference dags/dag.py:61-66)."""
    opener = _flaky_opener([_http_error(429, "2.5"), _http_error(500)])
    fetch = default_http_fetcher("http://x", opener=opener)
    sleeps: list[float] = []
    page = fetch_with_retry(
        fetch, "1", 0, 20, initial_backoff_s=10.0, sleep=sleeps.append
    )
    assert page == {"data": []}
    assert opener.calls["n"] == 3
    assert sleeps == [2.5, 10.0]
