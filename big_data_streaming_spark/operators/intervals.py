"""Interval union (gaps-and-islands with variable-length intervals).

Merges overlapping-or-touching [s, e] intervals per key into disjoint
covering intervals — the scheduling/uptime/session primitive that
``session_window`` (fixed gap) cannot express: closure needs MAX(e) over
all PRECEDING rows, because one long interval can bridge past several
short ones.

Construction (one hash exchange on the key):
  1. sort per key by (s, e); running MAX(e) over the strictly-preceding
     frame;
  2. a row opens a new island when its start exceeds that running max;
  3. island id = running SUM of the open flags; aggregate per island.
The island aggregate reuses the window's HashPartitioning(key) — no
second exchange (plan-pinned via q_interval_merge in PLANS.md).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_intervals(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Disjoint merged intervals per key: (keys…, interval_start,
    interval_end, n_events). Touching intervals (s == prev_max) merge —
    the closed-interval convention."""
    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new",
        F.when(prev_max.isNull() | (F.col(start_col) > prev_max), 1).otherwise(0),
    )
    grouped = flagged.withColumn(
        "_grp", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        grouped.groupBy(*keys, "_grp")
        .agg(
            F.min(start_col).alias("interval_start"),
            F.max(end_col).alias("interval_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_grp")
    )


def label_sessions(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-EVENT session labels (gaps-and-islands): every input row plus
    ``session_seq`` (1-based per key, in time order) and
    ``is_session_start`` — the join-ready row-level form that
    ``session_window``'s per-session rows cannot provide. The gap
    comparison is µs-exact (unix_micros, never a seconds-flooring cast).
    One hash exchange on the keys; both windows and any follow-up
    per-(key, session) aggregate reuse that partitioning.

    ``order_cols`` break timestamp ties deterministically (e.g. an event
    id); sessions split when the gap STRICTLY exceeds ``gap_us``."""
    w = Window.partitionBy(*keys).orderBy(ts_col, *order_cols)
    prev = F.lag(ts_col).over(w)
    is_start = F.when(
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > gap_us),
        1,
    ).otherwise(0)
    flagged = df.withColumn("_is_start", is_start)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        flagged.withColumn(
            "session_seq", F.sum("_is_start").over(wsum).cast("bigint")
        )
        .withColumn("is_session_start", F.col("_is_start").cast("int"))
        .drop("_is_start")
    )
