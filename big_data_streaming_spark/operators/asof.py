"""As-of join — the time-series join Spark lacks natively.

Semantics (backward, inclusive): for each left row, attach the right row
with the greatest ``right_ts ≤ left_ts`` within the same key — "the last
quote at or before this trade". The reference's domain (market data)
lives on this join; DuckDB/kdb/Pandas have it built in, Spark does not.

Spark-first construction — NO per-row Python, NO range explosion:

  1. tag both sides and ``unionByName`` them (right rows sorted before
     left rows at equal timestamps so 'inclusive' holds);
  2. one window per key ordered by (ts, side):
     ``last(right_payload, ignoreNulls=True)`` carries the most recent
     right values forward onto every subsequent left row;
  3. keep left rows.

Cost: exactly one shuffle (hash by key) + per-partition sort — identical
to what a native as-of physical operator would do, and strictly better
than the naive ``left ⋈ right ON key AND r.ts <= l.ts`` + argmax
(quadratic per key). At 100 TB: keys partition hash-uniformly; a single
hot key (one coin = most of the tape) is handled by time-bucketing the
key upstream (join on (key, ts_bucket) with the previous bucket's last
value unioned in) — same trick, one extra column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    suffix: str = "_right",
) -> DataFrame:
    """Backward-inclusive as-of join. Returns every left row plus
    ``<payload><suffix>`` columns from the latest right row at or before
    its timestamp (nulls when no right row precedes it)."""
    if not right_payload:
        right_payload = [
            c for c in right.columns if c not in keys and c != right_ts
        ]

    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in right_payload],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),  # 0 < 1: right sorts first at equal ts → inclusive
        *[F.col(c).alias(f"_p_{c}") for c in right_payload],
    )
    u = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*keys)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *lcols,
        "_side",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_payload
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")
