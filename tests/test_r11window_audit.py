"""Known-truth replicas for keys queued for the ROUND-11 driver window
(VERDICT r9 task 7 pattern, extended per the round-10 rotation TODO):
the round-6 additions with no existing replica test. Each key runs on a
tiny synthetic fixture whose expected relation is re-derived with
brute-force Python — including the degenerate/boundary branches (gap
exactly at the session threshold, rank ties, empty histogram bins,
single-shard merges) where shared-text parity historically breaks.
"""

from __future__ import annotations

import math
from datetime import datetime, timezone

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


def _events(tmp_path, rows):
    return _write(
        tmp_path,
        "events",
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": ["{}"] * len(rows),
        },
    )


def _day0():
    """A UTC-midnight datetime whose epoch day number is divisible by
    7 (so the fixture's absolute weeks start at dow 0)."""
    d = datetime(2024, 1, 4, 0, 0, 0)  # epoch day 19726 = 7 * 2818
    assert int(d.replace(tzinfo=timezone.utc).timestamp()) % (86400 * 7) == 0
    return d


def _epoch_day(dt):
    return int(dt.replace(tzinfo=timezone.utc).timestamp()) // 86400


def test_cox_stuart_matches_brute_pairs(spark, tmp_path):
    from datetime import timedelta

    counts = [3, 5, 2, 7, 6, 9, 8, 4]  # 8 days -> 4 pairs, lag 4
    base = _day0()
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, base + timedelta(days=d, hours=10), 1, "click", 1.0)
            )
    d = _events(tmp_path, rows)
    row = QUERIES["q_cox_stuart"](spark, d).collect()[0]
    n = len(counts)
    half = n // 2
    pairs = [(counts[i], counts[i + half]) for i in range(half)]
    n_plus = sum(1 for a, b in pairs if b > a)
    n_minus = sum(1 for a, b in pairs if b < a)
    assert row["n_pairs"] == len(pairs)
    assert row["n_plus"] == n_plus and row["n_minus"] == n_minus
    assert row["trend_sign"] == n_plus - n_minus


def test_page_trend_matches_weekly_rank_replica(spark, tmp_path):
    from datetime import timedelta

    base = _day0()
    # two COMPLETE absolute weeks with increasing-through-week counts,
    # plus a partial third week that must be EXCLUDED
    counts = [1, 2, 3, 4, 5, 6, 7, 7, 6, 5, 4, 3, 2, 1, 9, 9]
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, base + timedelta(days=d, hours=8), 1, "click", 1.0)
            )
    d = _events(tmp_path, rows)
    row = QUERIES["q_page_trend"](spark, d).collect()[0]
    day0 = _epoch_day(base)
    daily = {day0 + i: c for i, c in enumerate(counts)}
    weeks = {}
    for day, x in daily.items():
        weeks.setdefault(day // 7, {})[day % 7] = x
    full = {w: dows for w, dows in weeks.items() if len(dows) == 7}
    assert len(full) == 2  # fixture sanity: partial week dropped
    rank_sums = {dow: 0 for dow in range(7)}
    for w, dows in full.items():
        order = sorted(dows.items(), key=lambda kv: (kv[1], kv[0]))
        for r, (dow, _) in enumerate(order, start=1):
            rank_sums[dow] += r
    page_l = sum((dow + 1) * rs for dow, rs in rank_sums.items())
    assert row["n_weeks"] == 2
    assert row["page_l"] == page_l


def _geo_cells(keys):
    out = {}
    for key in keys:
        lat = ((key % 2147483647) * 2654435761 % 4294967296) % 180000001 \
            - 90000000
        lon = (((key + 7) % 2147483647) * 2654435761 % 4294967296) \
            % 360000001 - 180000000
        out[key] = (lat, lon)
    return out


def _customer_geo(tmp_path, keys, bals):
    return _write(
        tmp_path,
        "customer",
        {
            "c_custkey": list(keys),
            "c_name": [f"c{k}" for k in keys],
            "c_nationkey": [0] * len(keys),
            "c_acctbal": bals,
        },
    )


def test_geo_multires_matches_hash_replica(spark, tmp_path):
    keys = [3, 17, 101, 5000, 77777, 123456]
    bals = [10.0, 25.5, 99.99, 1000.0, 0.01, 42.42]
    d = _customer_geo(tmp_path, keys, bals)
    rows = QUERIES["q_geo_multires"](spark, d).collect()
    got = {
        (r["res_deg"], r["cell_lat"], r["cell_lon"]): (
            r["n_customers"],
            r["balance_cents"],
        )
        for r in rows
    }
    pos = _geo_cells(keys)
    exp = {}
    for key, bal in zip(keys, bals):
        lat, lon = pos[key]
        for res in (10, 30, 90):
            us = res * 1_000_000
            cell = (res, (lat + 90000000) // us, (lon + 180000000) // us)
            n, c = exp.get(cell, (0, 0))
            exp[cell] = (n + 1, c + math.floor(bal * 100.0))
    assert got == exp


def test_geo_bbox_matches_hash_replica(spark, tmp_path):
    keys = list(range(1, 200))
    bals = [float(k % 50) + 0.25 for k in keys]
    d = _customer_geo(tmp_path, keys, bals)
    row = QUERIES["q_geo_bbox"](spark, d).collect()[0]
    pos = _geo_cells(keys)
    inside = [
        (k, b)
        for (k, b) in zip(keys, bals)
        if -30_000_000 <= pos[k][0] <= 30_000_000
        and 0 <= pos[k][1] <= 90_000_000
    ]
    assert inside, "fixture must put some points in the box"
    assert row["n_points"] == len(inside)
    assert row["min_lat_us"] == min(pos[k][0] for k, _ in inside)
    assert row["max_lat_us"] == max(pos[k][0] for k, _ in inside)
    assert row["balance_cents"] == sum(
        math.floor(b * 100.0) for _, b in inside
    )


def test_stream_decay_topk_matches_slice_replica(spark, tmp_path):
    # 8 events -> 4 contiguous micro-batches of 2; types arranged so
    # the decayed order DIFFERS from the raw-count order
    types = ["click", "click", "click", "view", "view", "view",
             "purchase", "purchase"]
    rows = [
        (i + 1, datetime(2024, 1, 5, 10, 0, 0), 1, ty, 1.0)
        for i, ty in enumerate(types)
    ]
    d = _events(tmp_path, rows)
    out = QUERIES["q_stream_decay_topk"](spark, d).collect()
    got = {r["event_type"]: r for r in out}
    total = len(types)
    per = (total + 3) // 4
    from collections import defaultdict

    raw = defaultdict(int)
    dec = defaultdict(int)
    for rn, ty in enumerate(types):
        part = rn // per
        raw[ty] += 1
        dec[ty] += 1 << part  # weights 1, 2, 4, 8 by batch index
    order = sorted(dec.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [r["event_type"] for r in sorted(out, key=lambda r: r["rank"])] \
        == [ty for ty, _ in order]
    for ty, w in order:
        assert got[ty]["raw_count"] == raw[ty]
        assert got[ty]["decayed_weight"] == w
    # purchase arrives only in the newest batch: decayed weight must
    # beat click's despite half the raw count
    assert got["purchase"]["decayed_weight"] > got["click"]["decayed_weight"]


def test_bucket_histogram_renders_empty_bins(spark, tmp_path):
    prices = [10_000.0, 60_000.0, 260_000.0, 270_000.0]  # gap in between
    d = _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": list(range(1, len(prices) + 1)),
            "o_totalprice": prices,
        },
    )
    rows = QUERIES["q_bucket_histogram"](spark, d).collect()
    got = {r["bucket"]: r for r in rows}
    # buckets 0..5 (width 50k): counts 1,1,0,0,0,2 — empty bins present
    assert sorted(got) == [0, 1, 2, 3, 4, 5]
    exp = {0: 1, 1: 1, 2: 0, 3: 0, 4: 0, 5: 2}
    for b, n in exp.items():
        assert got[b]["n_orders"] == n
        assert got[b]["lo_price"] == b * 50_000
        assert got[b]["hi_price"] == (b + 1) * 50_000


def test_dedup_canonical_keeps_smallest_id_on_ties(spark, tmp_path):
    texts = ["same text body", "unique one", "same text body",
             "same text body", "other dup", "other dup"]
    d = _write(
        tmp_path,
        "documents",
        {
            "doc_id": [5, 2, 9, 3, 7, 4],
            "text": texts,
            "lang": ["en"] * 6,
            "source": ["web"] * 6,
            "n_chars": [len(t) for t in texts],
        },
    )
    rows = QUERIES["q_dedup_canonical"](spark, d).collect()
    got = {r["keep_doc_id"]: r for r in rows}
    # md5 groups identical texts; n_chars ties inside each group, so
    # the keep policy must fall to SMALLEST doc_id
    assert set(got) == {3, 2, 4}
    assert got[3]["group_size"] == 3  # ids 5, 9, 3 -> keep 3
    assert got[2]["group_size"] == 1
    assert got[4]["group_size"] == 2  # ids 7, 4 -> keep 4
    for r in rows:
        assert r["keep_n_chars"] == len(
            [t for t in texts if len(t) == r["keep_n_chars"]][0]
        )


def test_rank_shift_reports_only_moved_ranks(spark, tmp_path):
    from datetime import timedelta

    base = _day0()
    # day 0: click 5, view 3, purchase 1 -> ranks 1, 2, 3
    # day 1: click 2, view 4, purchase 1 -> ranks view 1, click 2, purchase 3
    day_counts = [
        {"click": 5, "view": 3, "purchase": 1},
        {"click": 2, "view": 4, "purchase": 1},
    ]
    rows, eid = [], 0
    for d_i, cnts in enumerate(day_counts):
        for ty, c in cnts.items():
            for _ in range(c):
                eid += 1
                rows.append(
                    (eid, base + timedelta(days=d_i, hours=9), 1, ty, 1.0)
                )
    d = _events(tmp_path, rows)
    out = QUERIES["q_rank_shift"](spark, d).collect()
    got = {r["event_type"]: r for r in out}
    day1 = _epoch_day(base) + 1
    # purchase kept rank 3 -> must NOT appear
    assert set(got) == {"click", "view"}
    assert got["click"]["day"] == day1
    assert got["click"]["rank_today"] == 2
    assert got["click"]["rank_yesterday"] == 1
    assert got["click"]["rank_gain"] == -1
    assert got["view"]["rank_today"] == 1
    assert got["view"]["rank_yesterday"] == 2
    assert got["view"]["rank_gain"] == 1


def test_partial_merge_audit_single_shard_degenerate(spark, tmp_path):
    # one nation only -> merge of ONE partial must equal direct pass
    bals = [10.50, 20.25, 30.10]
    d = _write(
        tmp_path,
        "customer",
        {
            "c_custkey": [1, 2, 3],
            "c_nationkey": [7, 7, 7],
            "c_acctbal": bals,
        },
    )
    row = QUERIES["q_partial_merge_audit"](spark, d).collect()[0]
    cents = [math.floor(b * 100.0) for b in bals]
    assert row["n_shards"] == 1
    assert row["n"] == 3
    assert row["s"] == sum(cents)
    assert row["q"] == sum(c * c for c in cents)
    assert row["merge_exact"] is True


def test_lifetime_span_dist_matches_day_spans(spark, tmp_path):
    from datetime import timedelta

    base = _day0()
    rows = [
        # user 1: single event -> span 0
        (1, base + timedelta(hours=1), 1, "click", 1.0),
        # user 2: same day twice -> span 0
        (2, base + timedelta(hours=2), 2, "click", 1.0),
        (3, base + timedelta(hours=20), 2, "view", 1.0),
        # user 3: 5 whole days
        (4, base + timedelta(hours=3), 3, "click", 1.0),
        (5, base + timedelta(days=5, hours=1), 3, "click", 1.0),
        # user 4: 23h59m apart but crossing midnight -> span 1
        (6, base + timedelta(hours=23, minutes=30), 4, "view", 1.0),
        (7, base + timedelta(days=1, hours=23, minutes=29), 4, "view", 1.0),
    ]
    d = _events(tmp_path, rows)
    got = {
        r["span_days"]: r["n_users"]
        for r in QUERIES["q_lifetime_span_dist"](spark, d).collect()
    }
    assert got == {0: 2, 5: 1, 1: 1}


def test_mode_value_pins_count_then_value_tie(spark, tmp_path):
    rows = [
        # click: 1.50 x2, 2.50 x2 (count tie -> smaller cents wins)
        (1, datetime(2024, 1, 5, 9), 1, "click", 1.50),
        (2, datetime(2024, 1, 5, 9), 1, "click", 1.50),
        (3, datetime(2024, 1, 5, 9), 1, "click", 2.50),
        (4, datetime(2024, 1, 5, 9), 1, "click", 2.50),
        # view: clear mode 9.99 x3
        (5, datetime(2024, 1, 5, 9), 1, "view", 9.99),
        (6, datetime(2024, 1, 5, 9), 1, "view", 9.99),
        (7, datetime(2024, 1, 5, 9), 1, "view", 9.99),
        (8, datetime(2024, 1, 5, 9), 1, "view", 1.00),
    ]
    d = _events(tmp_path, rows)
    got = {
        r["event_type"]: r
        for r in QUERIES["q_mode_value"](spark, d).collect()
    }
    assert got["click"]["mode_cents"] == 150  # tie -> smaller cents
    assert got["click"]["mode_count"] == 2
    assert got["view"]["mode_cents"] == 999
    assert got["view"]["mode_count"] == 3


def test_session_size_dist_gap_boundary(spark, tmp_path):
    from datetime import timedelta

    base = _day0()
    rows = [
        # user 1: three events, gaps exactly 1800 s -> ONE session of 3
        # (the rule is STRICTLY greater than 1800)
        (1, base, 1, "click", 1.0),
        (2, base + timedelta(seconds=1800), 1, "click", 1.0),
        (3, base + timedelta(seconds=3600), 1, "click", 1.0),
        # user 2: gap 1801 s -> TWO sessions of 1
        (4, base, 2, "view", 1.0),
        (5, base + timedelta(seconds=1801), 2, "view", 1.0),
        # user 3: 2 + 1 split
        (6, base, 3, "view", 1.0),
        (7, base + timedelta(seconds=10), 3, "view", 1.0),
        (8, base + timedelta(seconds=7200), 3, "view", 1.0),
    ]
    d = _events(tmp_path, rows)
    got = {
        r["session_size"]: r["n_sessions"]
        for r in QUERIES["q_session_size_dist"](spark, d).collect()
    }
    assert got == {3: 1, 1: 3, 2: 1}
