"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``big_data_streaming_spark/workload/`` — each
query key maps to one operator from SURVEY.md §2 (anchors cited in the
workload docstrings); this module only re-exports the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may load this module by file path (spec_from_file_location),
# in which case the repo root isn't on sys.path — add it so the package
# import below works regardless of how we're invoked.
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from big_data_streaming_spark.workload import ORACLES, QUERIES  # noqa: E402

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7): 1-hour tumbling total value per
    event_type, top-20 descending — the reference's product query
    (README.md:2 'volume in the last 1 hour', public/demo.jpg)."""
    return QUERIES["q_flagship"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
