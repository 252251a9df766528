"""Batch file formats beyond parquet — declared-schema readers/writers.

Format policy at scale (SURVEY.md §1.1 row-vs-columnar note):
* **parquet** — curated/analytical layer: columnar, predicate pushdown,
  page statistics. The default everywhere.
* **ORC** — same class as parquet (columnar, built into Spark); offered
  for ecosystems standardized on it.
* **json / csv** — interchange and raw-landing formats only: row-oriented,
  no pushdown beyond partition pruning, schema ALWAYS declared (inference
  is an extra full scan — reference never infers either, SURVEY §1.2).
* **avro** — the reference's raw-layer format (A17); needs the
  spark-avro package, attempted lazily with a clear error when absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_json(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    return spark.read.schema(schema).options(**options).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    **options: str,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .options(**options)
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write(df: DataFrame, path: str, fmt: str, mode: str = "overwrite", **options: str) -> None:
    """Uniform writer; raises a remedy-bearing error for avro when the
    spark-avro package is missing."""
    try:
        df.write.format(fmt).mode(mode).options(**options).save(path)
    except Exception as e:  # pragma: no cover - depends on classpath
        if fmt == "avro" and "avro" in str(e).lower():
            raise RuntimeError(
                "avro sink needs the spark-avro package on the classpath "
                "(--packages org.apache.spark:spark-avro_2.13:<spark-version>)"
            ) from e
        raise
