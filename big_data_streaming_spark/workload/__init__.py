"""Query workload registry.

Each submodule defines two dicts:

* ``QUERIES``: name → callable ``(spark, sf_dir) -> DataFrame`` — the
  Spark-first implementation of one operator from SURVEY.md §2.
* ``ORACLES``: name → ANSI SQL string for DuckDB over the same parquet
  tables. Keys missing from ``ORACLES`` are rows-only checked by the driver
  (non-SQL-expressible ops: LSH dedup, ANN, streaming smoke).

The registry is consumed by ``__spark_entry__.py`` (driver contract) and by
``bench.py``/tests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_streaming_spark.workload import (
    events as _events,
    relational as _relational,
    similarity as _similarity,
    streaming as _streaming,
    text as _text,
)

_MODULES = (_events, _relational, _text, _similarity, _streaming)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _m in _MODULES:
    _dup = QUERIES.keys() & _m.QUERIES.keys()
    if _dup:
        raise ValueError(f"duplicate query keys across workload modules: {_dup}")
    QUERIES.update(_m.QUERIES)
    ORACLES.update(getattr(_m, "ORACLES", {}))

_orphans = ORACLES.keys() - QUERIES.keys()
if _orphans:
    raise ValueError(f"oracle without query impl: {_orphans}")
