"""Known-truth replicas for round-10-window keys, batch 3.

Risk pair (VaR/ES element selection), Goh-Barabasi burstiness, the
two-way fixed-effects within estimator, the retention curve, and
DAU/MAU stickiness — each re-derived with brute-force walks over the
raw sf0.001 parquet.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

duckdb = pytest.importorskip("duckdb")

from big_data_streaming_spark.workload import QUERIES  # noqa: E402


def _close(a, b, tol=1e-9):
    assert a is not None and b is not None, (a, b)
    assert abs(a - b) <= tol * max(1.0, abs(a), abs(b)), (a, b)


def _raw(sf_dir: str, table: str, cols: str, where: str = "", order: str = ""):
    con = duckdb.connect()
    q = f"SELECT {cols} FROM read_parquet('{sf_dir}/{table}.parquet')"
    if where:
        q += f" WHERE {where}"
    if order:
        q += f" ORDER BY {order}"
    return con.execute(q).fetch_df()


def test_var_es_matches_tail_selection_replica(spark, sf_small):
    got = {
        r["event_type"]: r
        for r in QUERIES["q_var_es"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "events",
        "event_type, value",
        "value IS NOT NULL",
        "event_type, ts, event_id",
    )
    for ty, sub in df.groupby("event_type"):
        vals = list(sub["value"])
        q = sorted(
            math.floor((b - a) * 1e6) for a, b in zip(vals, vals[1:])
        )
        n = len(q)
        k = (n - 1) * 5 // 100  # 0-based element index of the 5th pct
        var_q = q[k]
        tail = q[: k + 1]
        r = got[ty]
        assert r["n_returns"] == n
        _close(r["var95"], var_q / 1e6)
        _close(r["es95"], sum(tail) / len(tail) / 1e6, tol=1e-9)


def test_burstiness_matches_goh_barabasi_replica(spark, sf_small):
    import statistics

    got = {
        r["user_id"]: r
        for r in QUERIES["q_burstiness"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "events",
        "user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es",
        order="user_id, ts, event_id",
    )
    for uid, sub in df.groupby("user_id"):
        es = list(sub["es"])
        gaps = [b - a for a, b in zip(es, es[1:])]
        if len(gaps) < 2:
            assert uid not in got
            continue
        mu = statistics.mean(gaps)
        sig = statistics.pstdev(gaps)  # spec: population sd
        r = got[uid]
        assert r["n_gaps"] == len(gaps)
        _close(r["mean_gap_s"], mu)
        _close(r["burstiness"], (sig - mu) / (sig + mu), tol=1e-9)


def test_twfe_matches_within_transform_replica(spark, sf_small):
    row = QUERIES["q_twfe"](spark, sf_small).collect()[0]
    df = _raw(
        sf_small,
        "events",
        "event_type, CAST(ts AS DATE) AS d,"
        " CAST(floor(value * 1000000.0) AS BIGINT) AS v_us",
        "value IS NOT NULL",
    )
    cell = defaultdict(lambda: [0, 0])
    for _, r in df.iterrows():
        c = cell[(r["event_type"], r["d"])]
        c[0] += 1
        c[1] += r["v_us"]
    pts = {
        k: (float(n), s / n / 1e6) for k, (n, s) in cell.items()
    }
    # quantized margin means exactly as spec'd (floor before the mean)
    def qmean(values, scale):
        return sum(math.floor(v * scale) for v in values) / len(values) / scale

    mi, mt = defaultdict(list), defaultdict(list)
    for (ty, d), (x, y) in pts.items():
        mi[ty].append((x, y))
        mt[d].append((x, y))
    xi = {ty: qmean([x for x, _ in v], 1) for ty, v in mi.items()}
    yi = {ty: qmean([y for _, y in v], 1e6) for ty, v in mi.items()}
    xt = {d: qmean([x for x, _ in v], 1) for d, v in mt.items()}
    yt = {d: qmean([y for _, y in v], 1e6) for d, v in mt.items()}
    xg = qmean([x for x, _ in pts.values()], 1)
    yg = qmean([y for _, y in pts.values()], 1e6)
    sxy = sxx = 0
    for (ty, d), (x, y) in pts.items():
        xr = x - xi[ty] - xt[d] + xg
        yr = y - yi[ty] - yt[d] + yg
        sxy += math.floor(xr * yr * 1e6)
        sxx += math.floor(xr * xr * 1e6)
    assert row["n_cells"] == len(pts)
    assert row["sxy_q"] == sxy
    assert row["sxx_q"] == sxx


def test_retention_curve_matches_user_day_replica(spark, sf_small):
    got = {
        r["day_n"]: r
        for r in QUERIES["q_retention_curve"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "events",
        "DISTINCT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d",
    )
    days = defaultdict(set)
    for _, r in df.iterrows():
        days[r["user_id"]].add(r["d"])
    dmax = max(d for s in days.values() for d in s)
    for n in (1, 3, 7, 14):
        eligible = [u for u, s in days.items() if min(s) + n <= dmax]
        retained = [u for u in eligible if min(days[u]) + n in days[u]]
        r = got[n]
        assert (r["n_eligible"], r["n_retained"]) == (
            len(eligible), len(retained),
        ), n
        _close(r["retention_rate"], len(retained) / len(eligible))


def test_stickiness_matches_trailing_window_replica(spark, sf_small):
    got = {
        r[0]: r for r in QUERIES["q_stickiness"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "events",
        "DISTINCT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d",
    )
    by_day = defaultdict(set)
    for _, r in df.iterrows():
        by_day[r["d"]].add(r["user_id"])
    days = sorted(by_day)
    dmin = days[0]
    checked = 0
    for d in days:
        if d - dmin + 1 < 28:
            continue  # spec: full trailing window only
        dau = len(by_day[d])
        mau = len(set().union(*(by_day.get(k, set()) for k in range(d - 27, d + 1))))
        key = next((k for k in got if str(k).startswith(str(d))), d)
        r = got[key]
        assert r["dau"] == dau, d
        assert r["mau"] == mau, d
        _close(r["stickiness"], dau / mau)
        checked += 1
    assert checked > 0
