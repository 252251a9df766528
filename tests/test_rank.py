"""Unit tests for plans.rank.global_rank — the distributed global
row_number that replaces single-partition rank windows (VERDICT r5
weak-flag fix). The contract: bit-identical to ``row_number() OVER
(ORDER BY ...)`` for any total order, independent of input partitioning
and of where range boundaries land."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_streaming_spark.plans.explain import (
    formatted_plan,
    unpartitioned_window_count,
)
from big_data_streaming_spark.plans.rank import global_ntile, global_order, global_rank


def test_global_rank_matches_row_number(spark):
    df = spark.range(10_000).select(
        (F.col("id") * 2654435761 % 100_000).alias("k"), "id"
    ).repartition(13)  # adversarial input partitioning
    out = global_rank(df, ["k", "id"], rank_col="r", total_col="n").toPandas()
    assert sorted(out["r"]) == list(range(1, 10_001))
    assert (out["n"] == 10_000).all()
    expect = out.sort_values(["k", "id"]).reset_index(drop=True)
    assert list(expect["r"]) == list(range(1, 10_001))


def test_global_rank_consistent_under_column_pruning(spark):
    """Regression pin for the round-6 bug: the sizes branch and the join
    branch are separate lineage evaluations whose range exchanges sample
    boundaries independently (seeded per-RDD) once column pruning gives
    them different child plans — without the persist, ranks duplicate.
    A wide payload column makes the pruning divergence real."""
    df = spark.range(20_000).select(
        (F.col("id") * 48271 % 65_536).alias("k"),
        "id",
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    out = global_rank(df, ["k", "id"], rank_col="r").toPandas()
    assert sorted(out["r"]) == list(range(1, 20_001))


def test_global_rank_arithmetic_range_id(spark):
    """The value-derived range split (q_train_order's path): same
    result, no persist, no sampling."""
    df = spark.range(5_000).select((F.col("id") % 997).alias("k"), "id")
    rng = F.floor(F.col("k") * 8 / 997)
    out = global_rank(
        df, ["k", "id"], rank_col="r", num_ranges=8, range_id=rng
    )
    assert "InMemoryTableScan" not in formatted_plan(out)
    pdf = out.toPandas().sort_values(["k", "id"]).reset_index(drop=True)
    assert list(pdf["r"]) == list(range(1, 5_001))


def test_global_rank_only_bounded_window_unpartitioned(spark):
    """The fact-sized relation is ranked by a PARTITIONED window; the
    only unpartitioned window in the plan is the O(ranges) offsets
    prefix-sum."""
    df = spark.range(1_000).select(F.col("id").alias("k"))
    out = global_rank(df, ["k"], rank_col="r", total_col="n")
    assert unpartitioned_window_count(out) == 1, formatted_plan(out)


def test_global_ntile_matches_builtin(spark):
    """global_ntile must be bit-identical to F.ntile over a single
    partition, including the uneven-bucket edge (n % k != 0) and the
    n < k edge."""
    from pyspark.sql.window import Window

    for n, k in [(10_007, 10), (9, 4), (3, 10), (1000, 7)]:
        df = spark.range(n).select(
            (F.col("id") * 2654435761 % 1_000_003).alias("v"), "id"
        )
        got = global_ntile(df, ["v", "id"], k, bucket_col="b").toPandas()
        # bounded: comparison baseline over the test relation only
        want = df.select(
            "id", F.ntile(k).over(Window.orderBy("v", "id")).alias("b")
        ).toPandas()
        m = got.merge(want, on="id", suffixes=("_g", "_w"))
        assert (m["b_g"] == m["b_w"]).all(), (n, k)


def test_global_cum_sum_and_max(spark):
    """Running SUM/MAX in global order must equal the single-partition
    window results."""
    from pyspark.sql.window import Window

    df = spark.range(8_000).select(
        (F.col("id") * 48271 % 100_000).alias("v"),
        "id",
        (F.col("id") % 1000).alias("x"),
    )
    got = global_order(
        df,
        ["v", "id"],
        cum_sums={"cs": "x"},
        cum_maxes={"cm": "x"},
    ).toPandas()
    # bounded: comparison baseline over the test relation only
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select(
        "id", F.sum("x").over(w).alias("cs"), F.max("x").over(w).alias("cm")
    ).toPandas()
    m = got.merge(want, on="id", suffixes=("_g", "_w"))
    assert (m["cs_g"] == m["cs_w"]).all()
    assert (m["cm_g"] == m["cm_w"]).all()


def test_persisted_pins_tracked_and_released(spark):
    """ADVICE r6: the sampled path's consistency persist must be
    trackable and freeable between queries — otherwise a 100-query
    session pins one fact-sized cache per sampled call forever. The
    registry wrapper releases on next-query construction; bench and
    conftest release post-action."""
    from big_data_streaming_spark.plans import rank as rank_mod
    from big_data_streaming_spark.workload import QUERIES

    rank_mod.release_persisted()
    assert not rank_mod._PERSISTED
    df = global_rank(spark.range(100).select("id"), ["id"])
    assert len(rank_mod._PERSISTED) == 1
    assert df.count() == 100
    assert rank_mod._PERSISTED[0].storageLevel.useMemory
    rank_mod.release_persisted()
    assert not rank_mod._PERSISTED
    # registry-wrapped construction releases the PREVIOUS query's pins
    pinned = global_rank(spark.range(10).select("id"), ["id"])
    pinned.count()
    assert len(rank_mod._PERSISTED) == 1
    QUERIES["q_count_all"](spark, "/root/testdata/sf0.001")
    assert not rank_mod._PERSISTED
