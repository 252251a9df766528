"""Known-truth replicas for keys queued for the ROUND-10 driver window.

The round-10 window will promote the round-5 additions
(workload/__init__.py rotation TODO); none of them has ever received a
driver row, and — as the round-9 q_boot_diff/Poisson-threshold finds
proved — the differential gate cannot see a wrong constant or formula
in the SHARED expression text. The formula/literal-bearing round-5
keys get engine-independent replicas here BEFORE their window:
textbook float recursions, statistics-module moments, brute-force
walks over the raw sf0.001 parquet.
"""

from __future__ import annotations

import math
import statistics
from collections import Counter, defaultdict

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


def test_kelly_matches_win_loss_replica(spark, sf_small):
    got = {
        r["event_type"]: r
        for r in QUERIES["q_kelly"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "events",
        "event_type, value, ts, event_id",
        "value IS NOT NULL",
        "event_type, ts, event_id",
    )
    for ty, sub in df.groupby("event_type"):
        vals = list(sub["value"])
        qd = [
            math.floor((b - a) * 1e6)
            for a, b in zip(vals, vals[1:])
        ]
        wins = sum(1 for q in qd if q > 0)
        losses = sum(1 for q in qd if q < 0)
        win_us = sum(q for q in qd if q > 0)
        loss_us = -sum(q for q in qd if q < 0)
        r = got[ty]
        assert (r["n_moves"], r["wins"], r["losses"]) == (
            len(qd), wins, losses,
        ), ty
        p = wins / (wins + losses)
        b = (win_us / wins) / (loss_us / losses)
        _close(r["win_rate"], p)
        _close(r["payoff_ratio"], b)
        _close(r["kelly_fraction"], p - (1 - p) / b)


def test_process_capability_matches_pstdev_replica(spark, sf_small):
    got = {
        r["priority"]: r
        for r in QUERIES["q_process_capability"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    df = con.execute(
        "SELECT o.o_orderpriority AS priority,"
        " CAST(floor(epoch(l.l_shipdate) / 86400)"
        " - floor(epoch(o.o_orderdate) / 86400) AS BIGINT) AS delay"
        f" FROM read_parquet('{sf_small}/lineitem.parquet') l"
        f" JOIN read_parquet('{sf_small}/orders.parquet') o"
        " ON l.l_orderkey = o.o_orderkey"
    ).fetch_df()
    for pr, sub in df.groupby("priority"):
        d = list(sub["delay"])
        mu = statistics.mean(d)
        sig = statistics.pstdev(d)  # spec: population sd
        r = got[pr]
        assert r["n"] == len(d)
        _close(r["mean_delay"], mu)
        _close(r["sigma_delay"], sig, tol=1e-9)
        _close(r["cp"], 120.0 / (6 * sig), tol=1e-9)
        _close(r["cpk"], min(120.0 - mu, mu - 0.0) / (3 * sig), tol=1e-9)


def test_queueing_advisor_matches_mm1_replica(spark, sf_small):
    got = {
        (r["event_type"], r["servers"]): r
        for r in QUERIES["q_queueing_advisor"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    df = con.execute(
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(floor(epoch(MAX(ts)) / 3600)"
        " - floor(epoch(MIN(ts)) / 3600) + 1 AS BIGINT) AS hours"
        f" FROM read_parquet('{sf_small}/events.parquet')"
        " GROUP BY event_type"
    ).fetch_df()
    s = 50
    for _, row in df.iterrows():
        n, hours = int(row["n"]), int(row["hours"])
        m_min = (n + s * hours - 1) // (s * hours)
        for extra in (0, 1):
            m = m_min + extra
            rho = n / (m * s * hours)
            r = got[(row["event_type"], m)]
            _close(r["lambda_per_hour"], n / hours)
            _close(r["utilization"], rho)
            _close(r["queue_length_lq"], rho * rho / (1 - rho))


def test_var_backtest_matches_split_replay(spark, sf_small):
    got = {
        r["event_type"]: r
        for r in QUERIES["q_var_backtest"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "events",
        "event_type, value, ts, event_id",
        "value IS NOT NULL",
        "event_type, ts, event_id",
    )
    for ty, sub in df.groupby("event_type"):
        vals = list(sub["value"])
        total = len(vals)
        q = [None] + [
            math.floor((b - a) * 1e6) for a, b in zip(vals, vals[1:])
        ]
        train = sorted(x for x in q[: total // 2] if x is not None)
        n1 = len(train)
        var_q = train[(n1 - 1) * 5 // 100]
        test = [x for x in q[total // 2:] if x is not None]
        n2 = len(test)
        breaches = sum(1 for x in test if x <= var_q)
        r = got[ty]
        assert (r["n_test_returns"], r["breaches"]) == (n2, breaches), ty
        _close(r["var95_train"], var_q / 1e6)
        _close(
            r["kupiec_z"],
            (breaches - n2 * 0.05) / math.sqrt(n2 * 0.05 * 0.95),
            tol=1e-9,
        )


def test_price_elasticity_matches_arc_replica(spark, sf_small):
    got = {
        r["band"]: r
        for r in QUERIES["q_price_elasticity"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "lineitem",
        "CAST(floor(l_discount * 100.0) AS BIGINT) AS band,"
        " CAST(floor(l_quantity) AS BIGINT) AS qv,"
        " CAST(floor((1.0 - l_discount) * 100.0) AS BIGINT) AS pv",
    )
    agg = {}
    for band, sub in df.groupby("band"):
        agg[band] = (len(sub), sum(sub["qv"]), sum(sub["pv"]))
    bands = sorted(agg)
    for prev, band in zip(bands, bands[1:]):
        n, sq, sp = agg[band]
        np_, sqp, spp = agg[prev]
        qm, pm = sq / n, sp / n / 100.0
        qp, pp = sqp / np_, spp / np_ / 100.0
        arc = ((qm - qp) / ((qm + qp) / 2)) / ((pm - pp) / ((pm + pp) / 2))
        r = got[band]
        _close(r["q_mean"], qm)
        _close(r["p_mean"], pm)
        _close(r["arc_elasticity"], arc, tol=1e-9)


def test_market_beta_matches_cov_var_replica(spark, sf_small):
    got = {
        r["event_type"]: r
        for r in QUERIES["q_market_beta"](spark, sf_small).collect()
    }
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
        c[0] += r["v_us"]
        c[1] += 1
    mkt = defaultdict(lambda: [0, 0])
    for (ty, d), (s, n) in cell.items():
        mkt[d][0] += s
        mkt[d][1] += n
    m = {d: s / n / 1e6 for d, (s, n) in mkt.items()}
    by_type = defaultdict(list)
    for (ty, d), (s, n) in cell.items():
        by_type[ty].append((m[d], s / n / 1e6))
    for ty, pairs in by_type.items():
        nd = len(pairs)
        # spec: means of floor-quantized micro-units
        xbar = sum(math.floor(x * 1e6) for x, _ in pairs) / nd / 1e6
        ybar = sum(math.floor(y * 1e6) for _, y in pairs) / nd / 1e6
        num = sum(
            math.floor((x - xbar) * (y - ybar) * 1e6) for x, y in pairs
        )
        den = sum(
            math.floor((x - xbar) * (x - xbar) * 1e6) for x, _ in pairs
        )
        beta = num / den
        r = got[ty]
        assert r["n_days"] == nd
        _close(r["beta"], beta, tol=1e-9)
        _close(r["alpha"], ybar - beta * xbar, tol=1e-9)


def test_control_chart_matches_imr_replica(spark, sf_small):
    rows = QUERIES["q_control_chart"](spark, sf_small).collect()
    df = _raw(
        sf_small,
        "events",
        "event_type, CAST(ts AS DATE) AS d, value",
        "value IS NOT NULL",
    )
    daily = defaultdict(lambda: defaultdict(list))
    for _, r in df.iterrows():
        daily[r["event_type"]][r["d"]].append(r["value"])
    for ty, days in daily.items():
        means = [
            statistics.mean(days[d]) for d in sorted(days)
        ]
        center = sum(math.floor(v * 1e6) for v in means) / len(means) / 1e6
        mrs = [abs(b - a) for a, b in zip(means, means[1:])]
        mr_bar = sum(math.floor(v * 1e6) for v in mrs) / len(mrs) / 1e6
        mine = [r for r in rows if r["event_type"] == ty]
        _close(mine[0]["center"], center, tol=1e-6)
        _close(mine[0]["ucl"], center + 2.66 * mr_bar, tol=1e-6)
        flags = {
            str(r["day"]): r["out_of_control"] for r in mine
        }
        for d, mean in zip(sorted(days), means):
            key = next(k for k in flags if k.startswith(str(d)))
            assert flags[key] == (
                mean > center + 2.66 * mr_bar
                or mean < center - 2.66 * mr_bar
            ), (ty, d)


def test_group_sequential_matches_pooled_z_replica(spark, sf_small):
    got = {
        r["look"]: r
        for r in QUERIES["q_group_sequential"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "events",
        "user_id % 2 AS arm,"
        " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv",
        order="event_id",
    )
    total = len(df)
    n = {1: 0, 0: 0}
    s = {1: 0, 0: 0}
    rows = list(zip(df["arm"], df["conv"]))
    for look in range(1, 6):
        hi = None
        # rows whose (rn*5-1)//total + 1 == look
        for rn, (arm, conv) in enumerate(rows, start=1):
            if (rn * 5 - 1) // total + 1 == look:
                n[arm] += 1
                s[arm] += conv
        p = (s[1] + s[0]) / (n[1] + n[0])
        z = (s[1] / n[1] - s[0] / n[0]) / math.sqrt(
            p * (1 - p) * (1 / n[1] + 1 / n[0])
        )
        r = got[look]
        assert (r["n1"], r["n0"], r["s1"], r["s0"]) == (
            n[1], n[0], s[1], s[0],
        ), look
        _close(r["z"], round(z, 9), tol=1e-8)
        _close(r["obf_boundary"], 2.04 * math.sqrt(5.0 / look))
        assert r["crossed"] == (
            abs(round(z, 9)) > 2.04 * math.sqrt(5.0 / look)
        ), look
