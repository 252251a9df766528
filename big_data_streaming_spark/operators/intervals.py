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
