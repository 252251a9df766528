"""As-of join edge semantics: inclusivity at equal timestamps, null
before any right row, per-key isolation, multi-column payload."""

from __future__ import annotations

import datetime as dt

from big_data_streaming_spark.operators.asof import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            ("A", _ts(0), 1),   # before any quote → null
            ("A", _ts(10), 2),  # exactly at quote ts=10 → inclusive match
            ("A", _ts(15), 3),  # between quotes → quote@10
            ("A", _ts(30), 4),  # after last → quote@20
            ("B", _ts(15), 5),  # other key → B's quote only
        ],
        ["coin", "ts", "trade_id"],
    )
    right = spark.createDataFrame(
        [
            ("A", _ts(10), 100.0, "x"),
            ("A", _ts(20), 200.0, "y"),
            ("B", _ts(5), 999.0, "z"),
        ],
        ["coin", "ts", "px", "src"],
    )
    out = {
        r["trade_id"]: (r["px_right"], r["src_right"])
        for r in asof_join(left, right, keys=["coin"]).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (100.0, "x")   # inclusive
    assert out[3] == (100.0, "x")
    assert out[4] == (200.0, "y")
    assert out[5] == (999.0, "z")   # key isolation


def test_asof_join_preserves_left_rowcount(spark, sf_small):
    from big_data_streaming_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_small, "events").select("event_id", "ts", "user_id")
    marks = ev.groupBy("user_id").agg(F.min("ts").alias("mts")).withColumn(
        "flag", F.lit(1)
    )
    out = asof_join(ev, marks, keys=["user_id"], right_ts="mts",
                    right_payload=["flag"])
    assert out.count() == ev.count()


def test_asof_join_carries_null_payload_from_latest_row(spark):
    """A right row whose payload is legitimately NULL must win as the
    latest preceding row — not be skipped in favor of an older non-null
    value — and all payload columns must come from that same row."""
    left = spark.createDataFrame(
        [("A", _ts(30), 1)], ["coin", "ts", "trade_id"]
    )
    right = spark.createDataFrame(
        [
            ("A", _ts(10), 100.0, "old"),
            ("A", _ts(20), None, "new"),  # latest: px is genuinely NULL
        ],
        ["coin", "ts", "px", "src"],
    )
    row = asof_join(left, right, keys=["coin"]).first()
    assert row["px_right"] is None  # NOT 100.0 carried from the older row
    assert row["src_right"] == "new"


def test_asof_join_tie_break_is_deterministic(spark):
    """Two right rows at the same (key, ts): the winner is stable across
    repeated runs/partitionings (lexicographically greatest payload)."""
    left = spark.createDataFrame([("A", _ts(20), 1)], ["coin", "ts", "trade_id"])
    right = spark.createDataFrame(
        [("A", _ts(10), 1.0, "a"), ("A", _ts(10), 2.0, "b")],
        ["coin", "ts", "px", "src"],
    )
    outs = {
        (
            asof_join(left.repartition(n), right.repartition(5 - n), keys=["coin"])
            .first()["src_right"]
        )
        for n in (1, 2, 3)
    }
    assert outs == {"b"}


def test_asof_forward_semantics(spark):
    from big_data_streaming_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [
            ("A", _ts(0), 1),   # before first quote → quote@10
            ("A", _ts(10), 2),  # exactly at quote ts=10 → inclusive match
            ("A", _ts(15), 3),  # between quotes → next quote@20
            ("A", _ts(30), 4),  # after last quote → null
            ("B", _ts(2), 5),   # other key → B's quote only
        ],
        ["coin", "ts", "trade_id"],
    )
    right = spark.createDataFrame(
        [
            ("A", _ts(10), 100.0, "x"),
            ("A", _ts(20), 200.0, "y"),
            ("B", _ts(5), 999.0, "z"),
        ],
        ["coin", "ts", "px", "src"],
    )
    out = {
        r["trade_id"]: (r["px_right"], r["src_right"])
        for r in asof_join_forward(left, right, keys=["coin"]).collect()
    }
    assert out[1] == (100.0, "x")
    assert out[2] == (100.0, "x")   # inclusive
    assert out[3] == (200.0, "y")
    assert out[4] == (None, None)
    assert out[5] == (999.0, "z")


def test_asof_forward_carries_null_payload_whole_row(spark):
    """A right row whose payload is legitimately NULL must be carried AS
    NULL (not skipped for a later non-null row) — the struct-carry
    contract, forward edition."""
    from big_data_streaming_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame([("A", _ts(1), 1)], ["coin", "ts", "trade_id"])
    right = spark.createDataFrame(
        [("A", _ts(5), None, "null-px"), ("A", _ts(9), 7.0, "later")],
        ["coin", "ts", "px", "src"],
    )
    row = asof_join_forward(left, right, keys=["coin"]).collect()[0]
    assert row["px_right"] is None and row["src_right"] == "null-px"


def test_nearest_single_shuffle_and_tie_backward(spark):
    """asof_join_nearest: one exchange feeds both directional window
    frames, and an equidistant right pair resolves backward."""
    import datetime as dt

    from pyspark.sql import functions as F

    from big_data_streaming_spark.operators.asof import asof_join_nearest
    from big_data_streaming_spark.plans.explain import formatted_plan, shuffle_count

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, base)], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, base - dt.timedelta(minutes=5), 10.0),
            (1, base + dt.timedelta(minutes=5), 20.0),
        ],
        "k int, ts timestamp, v double",
    )
    out = asof_join_nearest(left, right, keys=["k"])
    # plan BEFORE execution: post-collect AQE final plans add reuse nodes
    # that inflate the textual exchange count
    assert shuffle_count(out) == 1, formatted_plan(out)
    rows = out.collect()
    assert rows[0].v_right == 10.0 and rows[0].direction_right == "backward"
    # nearer forward row wins when strictly closer
    right2 = spark.createDataFrame(
        [
            (1, base - dt.timedelta(minutes=9), 10.0),
            (1, base + dt.timedelta(minutes=5), 20.0),
        ],
        "k int, ts timestamp, v double",
    )
    rows2 = asof_join_nearest(left, right2, keys=["k"]).collect()
    assert rows2[0].v_right == 20.0 and rows2[0].direction_right == "forward"


def test_nearest_matches_pandas_merge_asof_property(spark):
    """Property test: asof_join_nearest agrees with pandas
    merge_asof(direction='nearest') — an independent third
    implementation — on randomized key/timestamp layouts. Left
    timestamps are even µs, right odd µs, so no left ts ever EQUALS a
    right ts (the inclusive-boundary case where conventions could
    differ). Equal backward/forward DISTANCES can still occur — both
    implementations resolve that tie backward (pandas picks backward
    when bdiff <= fdiff), which the equidistant test above pins for
    ours."""
    import datetime as dt

    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from big_data_streaming_spark.operators.asof import asof_join_nearest

    base = dt.datetime(2024, 1, 1)

    @settings(max_examples=12, deadline=None)
    @given(
        left=st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 5_000)),
            min_size=1,
            max_size=12,
            unique=True,
        ),
        right=st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 5_000), st.integers(0, 99)),
            min_size=1,
            max_size=12,
            unique_by=lambda t: (t[0], t[1]),
        ),
    )
    def check(left, right):
        lrows = [
            (k, base + dt.timedelta(microseconds=2 * s)) for k, s in left
        ]
        rrows = [
            (k, base + dt.timedelta(microseconds=2 * s + 1), float(v))
            for k, s, v in right
        ]
        ldf = spark.createDataFrame(lrows, "k int, ts timestamp")
        rdf = spark.createDataFrame(rrows, "k int, ts timestamp, v double")
        got = {
            (r.k, r.ts): r.v_right
            for r in asof_join_nearest(ldf, rdf, keys=["k"]).collect()
        }
        lp = pd.DataFrame(lrows, columns=["k", "ts"]).sort_values("ts")
        rp = pd.DataFrame(rrows, columns=["k", "ts", "v"]).sort_values("ts")
        exp = pd.merge_asof(
            lp, rp, on="ts", by="k", direction="nearest"
        )
        for row in exp.itertuples(index=False):
            want = None if pd.isna(row.v) else row.v
            assert got[(row.k, row.ts.to_pydatetime())] == want, (
                row,
                got,
            )

    check()


def test_tolerance_rejects_tainted_string_and_accepts_timedelta(spark):
    """The tolerance string is interpolated into an INTERVAL literal; a
    malformed or caller-tainted value must raise BEFORE reaching
    F.expr (ADVICE r3 expression-injection hardening), and a
    datetime.timedelta must behave identically to its string form."""
    import pytest

    left = spark.createDataFrame(
        [("A", _ts(0), 1), ("A", _ts(40), 2)], ["coin", "ts", "trade_id"]
    )
    right = spark.createDataFrame(
        [("A", _ts(10), 100.0)], ["coin", "ts", "px"]
    )
    for bad in (
        "15 minutes) OR (1=1",
        "15; DROP TABLE t",
        "fifteen minutes",
        "15",
        "minutes 15",
    ):
        with pytest.raises(ValueError, match="tolerance"):
            asof_join(left, right, keys=["coin"], tolerance=bad)

    via_str = {
        r["trade_id"]: r["px_right"]
        for r in asof_join(
            left, right, keys=["coin"], tolerance="15 minutes"
        ).collect()
    }
    via_td = {
        r["trade_id"]: r["px_right"]
        for r in asof_join(
            left, right, keys=["coin"], tolerance=dt.timedelta(minutes=15)
        ).collect()
    }
    # trade@40 is 30 min after the quote — stale under a 15 min tolerance
    assert via_str == via_td == {1: None, 2: None}

    via_str2 = {
        r["trade_id"]: r["px_right"]
        for r in asof_join(
            left, right, keys=["coin"], tolerance="45 minutes"
        ).collect()
    }
    assert via_str2 == {1: None, 2: 100.0}
