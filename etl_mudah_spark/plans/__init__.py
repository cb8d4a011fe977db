"""Query plan library.

Importing this package registers every declared query into
``etl_mudah_spark.plans.registry.REGISTRY``.
"""

# Import order IS registry order, and the driver's correctness harness
# records only the first 50 registered queries. Rounds 1-2 checked the
# parity/datapipe/eventsq block; round 3 front-loads the families that
# have never had a driver CORRECTNESS row (starjoins, llmprep, profile,
# geoq, temporal). The displaced families stay covered by the identical
# DuckDB-oracle comparison in tests/test_oracle.py.
from etl_mudah_spark.plans import registry  # noqa: F401
from etl_mudah_spark.plans import starjoins  # noqa: F401
from etl_mudah_spark.plans import llmprep  # noqa: F401
from etl_mudah_spark.plans import profile  # noqa: F401
from etl_mudah_spark.plans import geoq  # noqa: F401
from etl_mudah_spark.plans import temporal  # noqa: F401
from etl_mudah_spark.plans import parity  # noqa: F401
from etl_mudah_spark.plans import datapipe  # noqa: F401
from etl_mudah_spark.plans import eventsq  # noqa: F401

__all__ = [
    "registry",
    "starjoins",
    "llmprep",
    "profile",
    "geoq",
    "temporal",
    "parity",
    "datapipe",
    "eventsq",
]
