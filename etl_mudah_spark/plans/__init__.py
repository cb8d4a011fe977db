"""Query plan library.

Importing this package registers every declared query into
``etl_mudah_spark.plans.registry.REGISTRY``.
"""

from etl_mudah_spark.plans import registry  # noqa: F401
from etl_mudah_spark.plans import parity  # noqa: F401
from etl_mudah_spark.plans import datapipe  # noqa: F401
from etl_mudah_spark.plans import eventsq  # noqa: F401
from etl_mudah_spark.plans import temporal  # noqa: F401
from etl_mudah_spark.plans import starjoins  # noqa: F401
from etl_mudah_spark.plans import profile  # noqa: F401
from etl_mudah_spark.plans import geoq  # noqa: F401
from etl_mudah_spark.plans import llmprep  # noqa: F401

__all__ = [
    "registry",
    "parity",
    "datapipe",
    "eventsq",
    "temporal",
    "starjoins",
    "profile",
    "geoq",
]
