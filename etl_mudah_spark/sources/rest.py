"""Paginated, rate-limited REST listing source as a Spark 4 Python
DataSource (pyspark.sql.datasource).

Re-expresses the reference's extraction tier (S1-S4 in SURVEY.md §2.1):

- paginated search scan: dags/dag.py:43-78 (fetch_batch) +
  dags/dag.py:137-161 (fetch_single_region): page loop until empty page,
  short page, or the per-region row cap;
- parallel region fan-out: dags/dag.py:80-110 — ThreadPoolExecutor(3)
  → here one InputPartition PER REGION, scheduled by Spark (cap
  concurrency with the source's num_partitions option or a scheduler
  pool, not threads);
- rate limiter: dags/dag.py:29-41 — ≥delay seconds between requests,
  honoring Retry-After on 429. The reference's limiter was global
  cross-thread state; Spark tasks are distributed, so the limiter is
  per-partition (documented divergence — per-partition delay ×
  concurrent tasks bounds the global rate);
- retry w/ exponential backoff: dags/dag.py:55-76 — 5 attempts,
  10 s → ×2 → 60 s cap, with Spark task retries as the outer net.

The HTTP transport is injectable (``fetcher`` option = dotted path to a
callable) so tests drive the full DataSource machinery against JSON
fixtures with zero network. The default transport uses urllib and is
gated behind runtime availability.
"""

from __future__ import annotations

import importlib
import json
import time
from collections.abc import Callable, Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from etl_mudah_spark.schemas import API_LISTING, API_MOTOR_LISTING

# Operational constants mirroring the reference's envelope
# (dags/dag.py:18-27).
DEFAULT_REGIONS = tuple(str(i) for i in range(1, 16))
DEFAULT_PAGE_SIZE = 200
DEFAULT_MAX_PER_REGION = 10_000
DEFAULT_RATE_DELAY_S = 3.0
DEFAULT_MAX_RETRIES = 5
DEFAULT_INITIAL_BACKOFF_S = 10.0
DEFAULT_MAX_BACKOFF_S = 60.0

PageFetcher = Callable[[str, int, int], dict]
"""(region, offset, limit) -> decoded JSON page {"data": [...]}"""


def default_http_fetcher(
    base_url: str,
    extra_params: dict | None = None,
    *,
    opener: Callable | None = None,
) -> PageFetcher:
    """GET ``base_url`` with search params; returns the decoded page.

    ``extra_params`` carries endpoint-specific constants — the motor
    DAG adds ``category=1040`` and ``include=extra_images,body``
    (dags/motor_dag.py:47-54) on top of the shared paging params.

    Transient HTTP failures — 429 (honoring ``Retry-After``,
    reference dags/dag.py:61-66), 5xx, and network-level
    ``URLError`` — are mapped to :class:`TransientFetchError` so
    :func:`fetch_with_retry`'s backoff engages on the default
    transport, not only on injected fetchers. Non-retryable 4xx
    propagate unchanged.

    ``opener`` is injectable for tests (defaults to
    ``urllib.request.urlopen``).
    """
    from urllib.error import HTTPError, URLError
    from urllib.parse import urlencode
    from urllib.request import urlopen

    open_url = opener or urlopen

    def fetch(region: str, offset: int, limit: int) -> dict:
        params = {"region": region, "from": offset, "limit": limit}
        params.update(extra_params or {})
        qs = urlencode(params)
        url = f"{base_url}?{qs}"
        try:
            with open_url(url, timeout=30) as resp:  # noqa: S310
                return json.loads(resp.read().decode("utf-8"))
        except HTTPError as e:
            if e.code == 429 or e.code >= 500:
                retry_after = None
                raw = e.headers.get("Retry-After") if e.headers is not None else None
                if raw is not None:
                    try:
                        retry_after = float(raw)
                    except ValueError:
                        retry_after = None  # HTTP-date form: fall back to backoff
                raise TransientFetchError(
                    f"HTTP {e.code} for {url}", retry_after=retry_after
                ) from e
            raise
        except URLError as e:
            raise TransientFetchError(f"network error for {url}: {e.reason}") from e

    return fetch


class RateLimiter:
    """Minimum-interval limiter (per task/partition)."""

    def __init__(self, delay_s: float):
        self.delay_s = delay_s
        self._last = 0.0

    def wait(self) -> None:
        now = time.monotonic()
        remaining = self.delay_s - (now - self._last)
        if remaining > 0:
            time.sleep(remaining)
        self._last = time.monotonic()


class TransientFetchError(Exception):
    """Retryable fetch failure; optional ``retry_after`` seconds."""

    def __init__(self, msg: str, retry_after: float | None = None):
        super().__init__(msg)
        self.retry_after = retry_after


def fetch_with_retry(
    fetch: PageFetcher,
    region: str,
    offset: int,
    limit: int,
    *,
    max_retries: int = DEFAULT_MAX_RETRIES,
    initial_backoff_s: float = DEFAULT_INITIAL_BACKOFF_S,
    max_backoff_s: float = DEFAULT_MAX_BACKOFF_S,
    sleep: Callable[[float], None] = time.sleep,
) -> dict:
    """Retry loop with exponential backoff and Retry-After honoring
    (reference: dags/dag.py:55-76)."""
    backoff = initial_backoff_s
    last: Exception | None = None
    for _attempt in range(max_retries):
        try:
            return fetch(region, offset, limit)
        except TransientFetchError as e:
            last = e
            if e.retry_after is not None:
                # server-directed wait replaces (doesn't advance) backoff
                sleep(e.retry_after)
            else:
                sleep(backoff)
                backoff = min(backoff * 2, max_backoff_s)
    raise RuntimeError(f"fetch failed after {max_retries} attempts: {last}")


@dataclass
class RegionPartition(InputPartition):
    region: str


def _car_attrs(attrs: dict, region: str) -> tuple:
    mileage = attrs.get("mileage", {}) or {}
    return (
        attrs.get("subject", ""),
        float(attrs.get("price", 0) or 0),
        attrs.get("make_name"),
        attrs.get("model_name"),
        attrs.get("manufactured_year"),
        (mileage.get("gte", "0"), mileage.get("lte", "0")),
        attrs.get("transmission_name"),
        attrs.get("fueltype"),
        attrs.get("car_type"),
        attrs.get("name"),
        attrs.get("region_name"),
        attrs.get("date"),
        int(attrs.get("image_count", 0) or 0),
        attrs.get("adview_url"),
        attrs.get("region_id", region),
    )


def _motor_attrs(attrs: dict, region: str) -> tuple:
    # motor_dag.py:81-98: motorcycle_* make/model fields, no mileage
    # struct, no transmission/fuel/car_type.
    return (
        attrs.get("subject", ""),
        float(attrs.get("price", 0) or 0),
        attrs.get("motorcycle_make_name"),
        attrs.get("motorcycle_model_name"),
        attrs.get("manufactured_year"),
        attrs.get("name"),
        attrs.get("region_name"),
        attrs.get("date"),
        int(attrs.get("image_count", 0) or 0),
        attrs.get("adview_url"),
        attrs.get("region_id", region),
    )


VEHICLE_TYPES = {
    "car": (API_LISTING, _car_attrs),
    "motorcycle": (API_MOTOR_LISTING, _motor_attrs),
}


def _init_listing_options(obj, options: dict) -> None:
    """Shared option parsing for the batch and streaming readers."""
    obj.vehicle_type = options.get("vehicle_type", "car")
    if obj.vehicle_type not in VEHICLE_TYPES:
        raise ValueError(f"unknown vehicle_type {obj.vehicle_type!r}")
    obj.regions = tuple(
        json.loads(options.get("regions", json.dumps(list(DEFAULT_REGIONS))))
    )
    obj.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))
    obj.max_per_region = int(options.get("max_per_region", DEFAULT_MAX_PER_REGION))
    obj.rate_delay_s = float(options.get("rate_delay_s", DEFAULT_RATE_DELAY_S))
    obj.max_retries = int(options.get("max_retries", DEFAULT_MAX_RETRIES))
    obj.initial_backoff_s = float(
        options.get("initial_backoff_s", DEFAULT_INITIAL_BACKOFF_S)
    )
    # Transport: dotted path "pkg.mod:fn" to a PageFetcher factory
    # (callable returning a PageFetcher; called with the string
    # 'fetcher_arg' option when one is given — how tests hand a state
    # file to the growable stream fixture), or base_url for HTTP.
    obj.fetcher_path = options.get("fetcher")
    obj.fetcher_arg = options.get("fetcher_arg")
    obj.base_url = options.get("base_url")
    if not obj.fetcher_path and not obj.base_url:
        raise ValueError("listings source needs a 'fetcher' or 'base_url' option")


def _make_fetcher_from(obj) -> PageFetcher:
    if obj.fetcher_path:
        mod, _, attr = obj.fetcher_path.partition(":")
        factory = getattr(importlib.import_module(mod), attr)
        return factory(obj.fetcher_arg) if obj.fetcher_arg else factory()
    return default_http_fetcher(obj.base_url)


class ListingsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        _init_listing_options(self, options)

    def _make_fetcher(self) -> PageFetcher:
        return _make_fetcher_from(self)

    def partitions(self) -> Sequence[RegionPartition]:
        # One partition per region (reference fan-out S2) — Spark
        # schedules them; at scale add secondary splits (e.g. by page
        # range) if a single region exceeds one task's budget.
        return [RegionPartition(region=r) for r in self.regions]

    def read(self, partition: RegionPartition) -> Iterator[tuple]:
        fetch = self._make_fetcher()
        limiter = RateLimiter(self.rate_delay_s)
        region = partition.region
        seen = 0
        offset = 0
        while seen < self.max_per_region:
            limiter.wait()
            page = fetch_with_retry(
                fetch,
                region,
                offset,
                self.page_size,
                max_retries=self.max_retries,
                initial_backoff_s=self.initial_backoff_s,
            )
            listings = page.get("data", [])
            if not listings:
                break
            to_attrs = VEHICLE_TYPES[self.vehicle_type][1]
            for item in listings:
                attrs = item.get("attributes", {}) or {}
                yield (int(item["id"]), to_attrs(attrs, region))
            seen += len(listings)
            if len(listings) < self.page_size:
                break  # short page = last page (dags/dag.py:147-154)
            offset += self.page_size


class ListingsStreamReader(SimpleDataSourceStreamReader):
    """Incremental listings ingest: ``spark.readStream.format(
    "mudah_listings")`` — the Structured-Streaming expression of the
    reference's scheduled re-scrape (dags/dag.py:284-342 runs the full
    extraction daily and overwrites; here each micro-batch ingests only
    the items past the per-region offset, and the sink decides merge
    semantics).

    Offsets are ``{region: items_ingested}`` — exactly the page cursor
    the batch reader walks, persisted in the checkpoint. Each
    ``read(start)`` pages forward from the cursor until a short page
    (the reference's termination rule) or the per-trigger cap
    ``max_per_trigger`` (per region — bounds micro-batch size so a
    backlog drains in bounded batches instead of one giant one).

    This is the SIMPLE stream reader (driver-side reads): the right
    fit for a rate-limited REST tail, whose per-trigger volume is
    bounded by the API's own rate envelope, not by Spark's
    parallelism. The initial 10k-per-region backfill belongs to the
    BATCH source's region-partitioned fan-out; switchover = start the
    stream with a checkpoint whose initial offsets equal the backfill
    row counts (or just accept one re-paged first batch). Replay
    (``readBetweenOffsets``) re-fetches the same offset window — exact
    against an append-only API, best-effort if the remote mutates
    in-page (documented divergence, same as any offset-replay source
    over a non-versioned API).
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        _init_listing_options(self, options)
        self.max_per_trigger = int(
            options.get("max_per_trigger", self.max_per_region)
        )

    def initialOffset(self) -> dict:
        return {r: 0 for r in self.regions}

    def _page_region(
        self, fetch: PageFetcher, limiter: "RateLimiter", region: str,
        start: int, cap: int,
    ) -> tuple[list[tuple], int]:
        to_attrs = VEHICLE_TYPES[self.vehicle_type][1]
        rows: list[tuple] = []
        offset = start
        while len(rows) < cap:
            limiter.wait()
            page = fetch_with_retry(
                fetch,
                region,
                offset,
                min(self.page_size, cap - len(rows)),
                max_retries=self.max_retries,
                initial_backoff_s=self.initial_backoff_s,
            )
            listings = page.get("data", [])
            if not listings:
                break
            for item in listings:
                attrs = item.get("attributes", {}) or {}
                rows.append((int(item["id"]), to_attrs(attrs, region)))
            offset += len(listings)
            if len(listings) < self.page_size:
                break  # short page = current end of the feed
        return rows, offset

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        fetch = _make_fetcher_from(self)
        limiter = RateLimiter(self.rate_delay_s)
        rows: list[tuple] = []
        end: dict = {}
        for region in self.regions:
            got, cursor = self._page_region(
                fetch, limiter, region, int(start.get(region, 0)),
                self.max_per_trigger,
            )
            rows.extend(got)
            end[region] = cursor
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        fetch = _make_fetcher_from(self)
        limiter = RateLimiter(self.rate_delay_s)
        for region in self.regions:
            lo = int(start.get(region, 0))
            hi = int(end.get(region, lo))
            if hi > lo:
                got, _ = self._page_region(fetch, limiter, region, lo, hi - lo)
                yield from got

    def commit(self, end: dict) -> None:
        # nothing to release: the remote API holds no reader state
        return


class ListingsDataSource(DataSource):
    """``spark.read.format("mudah_listings")`` after
    ``spark.dataSource.register(ListingsDataSource)``.

    ``option("vehicle_type", "motorcycle")`` switches the page shape
    and schema to the motor DAG's field layout (motor_dag.py:81-98).
    ``spark.readStream`` on the same format yields the incremental
    tail via :class:`ListingsStreamReader`.
    """

    @classmethod
    def name(cls) -> str:
        return "mudah_listings"

    def schema(self) -> StructType:
        vt = self.options.get("vehicle_type", "car")
        if vt not in VEHICLE_TYPES:
            raise ValueError(f"unknown vehicle_type {vt!r}")
        return VEHICLE_TYPES[vt][0]

    def reader(self, schema: StructType) -> ListingsReader:
        return ListingsReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> ListingsStreamReader:
        return ListingsStreamReader(schema, self.options)
