"""Geo dimension source (SURVEY §2 S9) + location standardization (J3).

Reference behavior: pages/regional_analysis.py loads a state-level
GeoJSON (load_geojson, regional_analysis.py:9-13), standardizes messy
listing locations to canonical state names via a synonym map
(standardize_location, regional_analysis.py:15-32), then groups
listings per state for the choropleth (regional_analysis.py:47-53).
State centroids live in streamlit/utils/constants.py:2-24.

Spark-first translation: the geo dim is a tiny table (16 states; at
most a few thousand admin regions anywhere on Earth) — ALWAYS the
broadcast side of a join, never shuffled. Standardization is a literal
``create_map`` lookup (functions/core.py synonym_remap) that stays in
codegen; no UDF, no driver round-trip.

The vendored ``STATES_GEOJSON`` is a GeoJSON-shaped FeatureCollection
(same ``properties.state`` + Point-coordinates layout the reference's
choropleth keys on, regional_analysis.py:80) so ``load_states_dim``
exercises a real GeoJSON parse; swap in a file-loaded document at
deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_mudah_spark.functions.core import synonym_remap
from etl_mudah_spark.schemas import STATES_DIM

# Canonical state -> centroid, from streamlit/utils/constants.py:2-24
# (canonical rows only; variants live in LOCATION_SYNONYMS below).
_CANONICAL_STATES: dict[str, tuple[float, float]] = {
    "Johor": (1.4854, 103.7618),
    "Kedah": (6.1184, 100.3685),
    "Kelantan": (6.1254, 102.2386),
    "Melaka": (2.1896, 102.2501),
    "Negeri Sembilan": (2.7258, 101.9424),
    "Pahang": (3.8126, 103.3256),
    "Perak": (4.5921, 101.0901),
    "Perlis": (6.4449, 100.2048),
    "Pulau Pinang": (5.4141, 100.3288),
    "Sabah": (5.9788, 116.0753),
    "Sarawak": (1.5533, 110.3592),
    "Selangor": (3.0738, 101.5183),
    "Terengganu": (5.3117, 103.1324),
    "W.P. Kuala Lumpur": (3.1390, 101.6869),
    "W.P. Putrajaya": (2.9264, 101.6964),
    "W.P. Labuan": (5.2831, 115.2308),
}

# Messy variant -> canonical, from standardize_location
# (regional_analysis.py:20-30).
LOCATION_SYNONYMS: dict[str, str] = {
    "Malacca": "Melaka",
    "N. Sembilan": "Negeri Sembilan",
    "Penang": "Pulau Pinang",
    "P. Pinang": "Pulau Pinang",
    "KL": "W.P. Kuala Lumpur",
    "Kuala Lumpur": "W.P. Kuala Lumpur",
    "Federal Territory of Kuala Lumpur": "W.P. Kuala Lumpur",
    "Putrajaya": "W.P. Putrajaya",
    "Labuan": "W.P. Labuan",
}

# GeoJSON-shaped fixture mirroring the DOSM administrative_1_state
# layout the reference fetches (regional_analysis.py:11): one Feature
# per state, name under properties.state, centroid as a Point.
STATES_GEOJSON: dict = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "properties": {"state": state},
            "geometry": {"type": "Point", "coordinates": [lon, lat]},
        }
        for state, (lat, lon) in _CANONICAL_STATES.items()
    ],
}


def load_states_dim(spark: SparkSession, geojson: dict | None = None) -> DataFrame:
    """Parse a GeoJSON FeatureCollection into the STATES_DIM frame.

    Each row carries the canonical name, centroid, and the list of
    known synonyms (so consumers can build a remap without a second
    source). Tiny by construction — broadcast it at every join site.
    """
    doc = geojson if geojson is not None else STATES_GEOJSON
    rows = []
    for feat in doc["features"]:
        state = feat["properties"]["state"]
        lon, lat = feat["geometry"]["coordinates"]
        syns = sorted(k for k, v in LOCATION_SYNONYMS.items() if v == state)
        rows.append((state, float(lat), float(lon), syns))
    return spark.createDataFrame(rows, STATES_DIM)


def standardize_state(col):
    """Messy location -> canonical state name (identity fallback),
    matching standardize_location (regional_analysis.py:15-32)."""
    return synonym_remap(col, LOCATION_SYNONYMS)
