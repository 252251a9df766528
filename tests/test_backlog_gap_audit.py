"""Fixture replicas for the last seven never-driver-checked keys that
had no test anywhere (backlog audit, round 10): the feature-exercise
keys (recursive CTE spine, HLL sketch tolerance, VARIANT extraction,
RANGE-interval frames, bitmap-exact distinct, AES round-trip) and the
stream-stream left-outer join's decided-region semantics.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from big_data_streaming_spark.workload import QUERIES


def _write(tmp_path, name: str, cols: dict):
    import pyarrow as pa
    import pyarrow.parquet as pq

    arrays = {}
    for k, v in cols.items():
        if v and isinstance(v[0], datetime):
            arrays[k] = pa.array(v, pa.timestamp("us"))
        elif v and isinstance(v[0], float):
            arrays[k] = pa.array(v, pa.float64())
        elif v and isinstance(v[0], str):
            arrays[k] = pa.array(v, pa.string())
        else:
            arrays[k] = pa.array(v, pa.int64())
    pq.write_table(pa.table(arrays), str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def _events(tmp_path, rows, props=None):
    props = props or ["{}"] * len(rows)
    return _write(
        tmp_path,
        "events",
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": props,
        },
    )


_T0 = datetime(2024, 1, 10, 12, 0, 0)


def test_recursive_cte_fills_gap_months(spark, tmp_path):
    d = _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": [1, 2, 3],
            "o_totalprice": [100.0, 250.5, 400.25],
            "o_orderdate": [
                datetime(2024, 1, 15),
                datetime(2024, 1, 20),
                datetime(2024, 3, 5),  # February has NO orders
            ],
        },
    )
    rows = sorted(
        QUERIES["q_recursive_cte"](spark, d).collect(),
        key=lambda r: r["month_start"],
    )
    assert [r["month_start"].month for r in rows] == [1, 2, 3]
    assert [r["n_orders"] for r in rows] == [2, 0, 1]
    assert abs(rows[0]["total_price"] - 350.5) < 1e-9
    assert rows[1]["total_price"] == 0.0
    assert abs(rows[2]["total_price"] - 400.25) < 1e-9


def test_sketch_hll_estimate_within_tolerance(spark, tmp_path):
    rows, eid = [], 0
    for uid in range(1, 31):
        eid += 1
        rows.append((eid, _T0, uid, "click", 1.0))
    for uid in range(1, 11):
        eid += 1
        rows.append((eid, _T0, uid, "view", 1.0))
        eid += 1
        rows.append((eid, _T0, uid, "view", 1.0))  # dup events, same user
    d = _events(tmp_path, rows)
    got = {
        r["event_type"]: r
        for r in QUERIES["q_sketch_hll"](spark, d).collect()
    }
    assert got["click"]["exact_users"] == 30
    assert got["view"]["exact_users"] == 10
    assert got["ALL"]["exact_users"] == 30
    for r in got.values():
        assert r["within_tolerance"] is True


def test_variant_extract_filters_on_path(spark, tmp_path):
    ks = [5, 90, 89, 95, 100, 12]
    rows = [
        (i + 1, _T0, 1, "click", 1.0) for i in range(len(ks))
    ]
    props = ['{"k": %d}' % k for k in ks]
    d = _events(tmp_path, rows, props)
    got = {
        r["event_id"]: r["k"]
        for r in QUERIES["q_variant_extract"](spark, d).collect()
    }
    assert got == {2: 90, 4: 95, 5: 100}


def test_window_range_interval_matches_brute_force(spark, tmp_path):
    # per-user events with one pair exactly 1 h apart (RANGE includes
    # the boundary row) and one just past it
    plan = [
        # (event_id, user, offset_seconds, value)
        (1, 1, 0, 10.0),
        (2, 1, 3600, 5.0),  # exactly 1 h after e1 -> e1 included
        (3, 1, 7201, 2.0),  # 3601 s after e2 -> e2 NOT included
        (4, 2, 0, 1.25),
        (5, 2, 100, 2.75),
    ]
    rows = [
        (eid, _T0 + timedelta(seconds=off), uid, "click", v)
        for eid, uid, off, v in plan
    ]
    d = _events(tmp_path, rows)
    got = {
        r["event_id"]: r["rolling_1h"]
        for r in QUERIES["q_window_range_interval"](spark, d).collect()
    }
    for eid, uid, off, v in plan:
        exp = sum(
            v2
            for eid2, uid2, off2, v2 in plan
            if uid2 == uid and off - 3600 <= off2 <= off
        )
        assert abs(got[eid] - exp) < 1e-9, eid


def test_bitmap_distinct_spans_buckets(spark, tmp_path):
    # user ids far apart so the bitmap spans multiple buckets; dup
    # events must not double-count
    users = {
        "click": [1, 2, 40_000, 70_000, 70_000, 1],
        "view": [5, 5, 5],
    }
    rows, eid = [], 0
    for ty, uids in users.items():
        for uid in uids:
            eid += 1
            rows.append((eid, _T0, uid, ty, 1.0))
    d = _events(tmp_path, rows)
    got = {
        r["event_type"]: r["n_users"]
        for r in QUERIES["q_bitmap_distinct"](spark, d).collect()
    }
    assert got == {"click": 4, "view": 1}


def test_aes_roundtrip_restores_text(spark, tmp_path):
    texts = ["hello world", "unicode snowman ☃ ok", "a"]
    d = _write(
        tmp_path,
        "documents",
        {
            "doc_id": [1, 2, 3],
            "text": texts,
            "lang": ["en"] * 3,
            "source": ["web"] * 3,
            "n_chars": [len(t) for t in texts],
        },
    )
    rows = sorted(
        QUERIES["q_aes_roundtrip"](spark, d).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r["roundtrip"] for r in rows] == texts
    assert all(r["roundtrip_ok"] is True for r in rows)


def test_stream_stream_left_decided_region(spark, tmp_path):
    # clicks: user 1 matched within 30 min; user 2 unmatched (purchase
    # 31 min later); user 3 unmatched (no purchase at all); plus a late
    # click OUTSIDE the decided region that must be withheld.
    # A far-future click+purchase pair pushes both sides' max event
    # times (and thus the decided-region cutoff) past the early clicks.
    rows = [
        (1, _T0, 1, "click", 1.0),
        (2, _T0 + timedelta(minutes=10), 1, "purchase", 1.0),
        (3, _T0, 2, "click", 1.0),
        (4, _T0 + timedelta(minutes=31), 2, "purchase", 1.0),
        (5, _T0, 3, "click", 1.0),
        # decided-region pushers (both sides) far in the future
        (6, _T0 + timedelta(hours=20), 9, "click", 1.0),
        (7, _T0 + timedelta(hours=20), 9, "purchase", 1.0),
    ]
    d = _events(tmp_path, rows)
    out = QUERIES["q_stream_stream_left"](spark, d).collect()
    got = {(r["click_id"], r["purchase_id"]) for r in out}
    # decided cutoff = min(max click, max purchase) - 1 h - 1 s; the
    # hour-20 click's window is NOT closed before it -> withheld
    assert got == {(1, 2), (3, None), (5, None)}
    by_click = {r["click_id"]: r for r in out}
    assert by_click[1]["purchase_ts"] == _T0 + timedelta(minutes=10)
    assert by_click[3]["purchase_ts"] is None
    assert by_click[5]["purchase_ts"] is None
