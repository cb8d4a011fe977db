"""Deterministic fixture transport for the listings DataSource.

Generates synthetic API pages in-code (no files, no network) shaped
exactly like the reference's response (FIXTURES.md §1, consumed at
dags/dag.py:145): nested ``attributes.mileage``, missing prices,
junk years, duplicate listing ids across regions, and a short final
page to exercise the termination rule.

Used by tests and demos: pass
``fetcher="etl_mudah_spark.sources.fixtures:fixture_fetcher_factory"``
as a source option.
"""

from __future__ import annotations

PAGE_SIZE = 20
ROWS_PER_REGION = 50  # → 2 full pages + 1 short page


def _listing(region: str, i: int) -> dict:
    gid = int(region) * 1000 + i
    # every 10th listing duplicates an id from region "1" (cross-region
    # dup — dedup fixture, dags/dag.py:97-105)
    if i % 10 == 9 and region != "1":
        gid = 1000 + i
    attrs = {
        "subject": f"Vehicle {gid}",
        "make_name": ["Perodua", "Proton", "Toyota", "Honda"][i % 4],
        "model_name": f"Model{i % 7}",
        "manufactured_year": str(2000 + (i % 25)) if i % 13 else "unknown",
        "mileage": {"gte": str(10_000 * (i % 9)), "lte": str(10_000 * (i % 9) + 9_999)},
        "transmission_name": "Auto" if i % 3 else "Manual",
        "fueltype": ["Petrol", "petrol", "Diesel", "Electric"][i % 4],
        "car_type": "Sedan",
        "name": f"Seller {i % 11}",
        "region_name": ["Penang", "KL", "Johor", "Selangor"][int(region) % 4],
        "date": f"2024-{(i % 12) + 1:02d}-{(i % 27) + 1:02d} 10:00:00",
        "image_count": i % 6,
        "adview_url": f"https://example.invalid/ad/{gid}" if i % 5 else None,
        "region_id": region,
    }
    if i % 7 == 6:
        attrs.pop("price", None)  # missing price → default 0
    else:
        attrs["price"] = 5_000.0 + 997.0 * (i % 40)
    if i % 11 == 10:
        attrs.pop("mileage")  # missing mileage → defaults "0"
    return {"id": gid, "attributes": attrs}


def fixture_fetcher_factory():
    def fetch(region: str, offset: int, limit: int) -> dict:
        end = min(offset + limit, ROWS_PER_REGION)
        if offset >= ROWS_PER_REGION:
            return {"data": []}
        return {"data": [_listing(region, i) for i in range(offset, end)]}

    return fetch


def _motor_listing(region: str, i: int) -> dict:
    """Motorcycle page shape (dags/motor_dag.py:81-98): motorcycle_*
    make/model fields, no mileage struct, no transmission/fuel/type."""
    gid = 500_000 + int(region) * 1000 + i
    if i % 10 == 9 and region != "1":
        gid = 501_000 + i  # cross-region dup, like the car fixture
    attrs = {
        "subject": f"Motorcycle {gid}",
        "motorcycle_make_name": ["Yamaha", "Honda", "Kawasaki", "Modenas"][i % 4],
        "motorcycle_model_name": f"MModel{i % 5}",
        "manufactured_year": str(2005 + (i % 20)) if i % 13 else "n/a",
        "name": f"Seller {i % 11}",
        "region_name": ["Penang", "KL", "Johor", "Selangor"][int(region) % 4],
        "date": f"2024-{(i % 12) + 1:02d}-{(i % 27) + 1:02d} 11:00:00",
        "image_count": i % 6,
        "adview_url": f"https://example.invalid/ad/{gid}" if i % 5 else None,
        "region_id": region,
    }
    if i % 7 == 6:
        attrs.pop("price", None)
    else:
        attrs["price"] = 3_000.0 + 499.0 * (i % 30)
    return {"id": gid, "attributes": attrs}


def motor_fixture_fetcher_factory():
    def fetch(region: str, offset: int, limit: int) -> dict:
        end = min(offset + limit, ROWS_PER_REGION)
        if offset >= ROWS_PER_REGION:
            return {"data": []}
        return {"data": [_motor_listing(region, i) for i in range(offset, end)]}

    return fetch


def growing_fixture_fetcher_factory(count_file: str):
    """Stream-fixture transport: the per-region row count comes from a
    tiny state file a test rewrites between micro-batches, so the
    "API" grows while offsets persist in the checkpoint. Rows are the
    same deterministic :func:`_listing` records — replaying an offset
    window (ListingsStreamReader.readBetweenOffsets) reproduces them
    exactly, like an append-only feed."""

    def fetch(region: str, offset: int, limit: int) -> dict:
        with open(count_file) as fh:
            n = int(fh.read().strip() or 0)
        end = min(offset + limit, n)
        if offset >= n:
            return {"data": []}
        return {"data": [_listing(region, i) for i in range(offset, end)]}

    return fetch
