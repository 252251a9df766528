"""Distributed global ranking — ``row_number() OVER (ORDER BY ...)``
without the single-partition collapse.

An unpartitioned rank window moves EVERY row to one task (Spark's own
``WindowExec`` warns "Moving all data to a single partition"); over a
corpus-sized relation at 100 TB that plan is not slow, it is impossible.
This module factors the shape proven oracle-bit-identical by
``q_train_order`` (workload/pipeline.py) into a reusable helper:

1. range-partition the input on the order key (contiguous key ranges per
   partition — ``repartitionByRange``, or a caller-supplied arithmetic
   range id when the key is uniform and the exchange can be saved),
2. rank within each range in parallel (a PARTITIONED window),
3. add per-range exclusive prefix offsets (an O(ranges) aggregate,
   broadcast back).

The result depends only on the TOTAL order of ``order_cols`` — not on
where Spark's sampled range boundaries land — so it is bit-identical
run-to-run and equal to the oracle's global ``row_number()`` PROVIDED
``order_cols`` is a total order (include a unique tiebreaker; every
caller in this repo orders by a key suffix like ``doc_id``/``event_id``).
Ties never straddle ranges: range partitioning splits on key values, so
equal keys land in one range.

The only unpartitioned window left in the plan is the offsets prefix-sum
over the O(ranges) size relation — aggregate-sized by construction
(``tests/test_plans.py`` pins exactly one such window in the swapped
operators' plans; ``tests/test_window_lint.py`` enforces the discipline
source-wide).

Reference parity: the reference engine has no distributed ranker — its
per-batch frames are single-node (streaming-shorttime.py) — this is the
scale path a 100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Default number of contiguous key ranges. The parallelism dial:
#: thousands at 100 TB (each range then holds ~1/ranges of the data);
#: 8 keeps the offset relation readable in test plans.
DEFAULT_RANGES = 8


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    *,
    rank_col: str = "gpos",
    total_col: str | None = None,
    num_ranges: int = DEFAULT_RANGES,
    range_id: Column | None = None,
) -> DataFrame:
    """Append ``rank_col`` = global row_number() over ``order_cols``.

    ``order_cols`` must form a TOTAL order (unique tiebreaker last) —
    that is what makes the result independent of range-boundary
    placement. ``total_col``, when given, is additionally populated with
    the total row count (derived from the already-computed per-range
    sizes — NOT a second pass and NOT an unpartitioned count window).
    ``range_id``, when given, must be a monotone function of the order
    key mapping to ``[0, num_ranges)`` — the arithmetic split used by
    ``q_train_order`` for its uniform mixing hash; it saves the
    ``repartitionByRange`` exchange. Without it the helper range-
    partitions and reads ``spark_partition_id()`` (range partitions are
    contiguous and ordered, and the projection sits directly above the
    range exchange, so the id IS the range index; AQE-coalesced ranges
    merge adjacent ids and stay contiguous).
    """
    cols = [F.col(c) for c in order_cols]
    sampled = range_id is None
    if sampled:
        ranged = df.repartitionByRange(num_ranges, *cols).withColumn(
            "_rng", F.spark_partition_id()
        )
    else:
        ranged = df.withColumn("_rng", range_id.cast("int"))
    w = Window.partitionBy("_rng").orderBy(*cols)
    ranked = ranged.withColumn("_intra", F.row_number().over(w))
    if sampled:
        # CONSISTENCY-CRITICAL: the offsets branch and the join branch
        # both consume `ranked`. Without materialization they are two
        # independent lineage evaluations, and column pruning gives them
        # different child plans, defeating exchange reuse — each range
        # exchange then SAMPLES ITS OWN BOUNDARIES (RangePartitioner
        # seeds by RDD id), so the branches can disagree on range
        # assignment (observed at sf0.01: 132 duplicate ranks). Persist
        # pins ONE evaluation — which also halves the fact scans; a
        # cache-evicted partition recomputes against the already-fixed
        # shuffle boundaries, so recovery stays consistent. The
        # arithmetic range_id path derives _rng from VALUES and needs
        # none of this.
        ranked = ranked.persist()
    sizes = ranked.groupBy("_rng").agg(F.max("_intra").alias("_n"))
    # bounded: offsets window ranks the O(num_ranges) size relation —
    # the one intentionally-unpartitioned window in this shape.
    offsets = sizes.select(
        "_rng",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_rng").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_offset"),
        *(
            # same (empty) partition + same _rng order as the offset
            # window, so both expressions share ONE Window node
            [
                F.sum("_n")
                .over(
                    Window.orderBy("_rng").rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                )
                .alias("_total")
            ]
            if total_col
            else []
        ),
    )
    out = ranked.join(F.broadcast(offsets), "_rng").withColumn(
        rank_col, (F.col("_offset") + F.col("_intra")).cast("bigint")
    )
    if total_col:
        out = out.withColumn(total_col, F.col("_total").cast("bigint"))
    return out.drop("_rng", "_intra", "_offset", "_total")
