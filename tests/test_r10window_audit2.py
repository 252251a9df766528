"""Known-truth replicas for round-10-window keys, batch 2.

Highlight: the q_knee_point replica below caught a comment-vs-code
defect while being written — the docstring promises the Kneedle chord
"joining the curve's endpoints", but the round-5 draft anchored the
chord at (1, 1), which is not on the curve; the difference term
(y1-1)(xn-x) varies with x, so the selected knee was a different
functional. Both engines shared the wrong text, so the differential
gate was green throughout. The chord now runs (1, y1)-(xn, yn).
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


def test_knee_point_matches_kneedle_endpoint_chord(spark, sf_small):
    row = QUERIES["q_knee_point"](spark, sf_small).collect()[0]
    df = _raw(
        sf_small,
        "orders",
        "o_custkey, CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents",
    )
    rev = defaultdict(int)
    for _, r in df.iterrows():
        rev[r["o_custkey"]] += r["cents"]
    order = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    ys, cum = [], 0
    for _, c in order:
        cum += c
        ys.append(cum)
    xn, yn, y1 = len(ys), ys[-1], ys[0]
    best = max(
        range(1, xn + 1),
        key=lambda x: (
            abs((yn - y1) * (x - 1) - (xn - 1) * (ys[x - 1] - y1)),
            -x,
        ),
    )
    assert row["n_customers"] == xn
    assert row["knee_rank"] == best
    _close(row["knee_revenue_share"], ys[best - 1] / yn)
    assert row["knee_cross_product"] == abs(
        (yn - y1) * (best - 1) - (xn - 1) * (ys[best - 1] - y1)
    )


def test_shapley_matches_equal_split_replica(spark, sf_small):
    got = {
        r["channel"]: r
        for r in QUERIES["q_shapley"](spark, sf_small).collect()
    }
    df = _raw(sf_small, "events", "user_id, event_type")
    buyers = set(df[df["event_type"] == "purchase"]["user_id"])
    touch = defaultdict(set)
    for _, r in df.iterrows():
        if r["event_type"] != "purchase" and r["user_id"] in buyers:
            touch[r["user_id"]].add(r["event_type"])
    credit = Counter()
    users = Counter()
    for u, chans in touch.items():
        for c in chans:
            credit[c] += 12 // len(chans)
            users[c] += 1
    for c in credit:
        r = got[c]
        assert (r["n_users"], r["credit_x12"]) == (users[c], credit[c]), c
        _close(r["shapley_credit"], credit[c] / 12.0)


def test_eoq_advisor_matches_sqrt_formula(spark, sf_small):
    got = {
        r["p_brand"]: r
        for r in QUERIES["q_eoq_advisor"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    dem = dict(
        con.execute(
            "SELECT p.p_brand, SUM(l.l_quantity)"
            f" FROM read_parquet('{sf_small}/lineitem.parquet') l"
            f" JOIN read_parquet('{sf_small}/part.parquet') p"
            " ON l.l_partkey = p.p_partkey GROUP BY p.p_brand"
        ).fetchall()
    )
    price = dict(
        con.execute(
            "SELECT p_brand, AVG(p_retailprice)"
            f" FROM read_parquet('{sf_small}/part.parquet') GROUP BY p_brand"
        ).fetchall()
    )
    for b, r in got.items():
        d, h = dem[b], 0.2 * price[b]
        eoq = math.sqrt(2 * d * 100.0 / h)
        _close(r["annual_demand"], d, tol=1e-9)
        _close(r["avg_price"], price[b], tol=1e-9)
        _close(r["eoq_units"], eoq, tol=1e-9)
        _close(r["orders_per_year"], d / eoq, tol=1e-9)


def test_wasserstein_drift_matches_cdf_area_replica(spark, sf_small):
    got = {
        r["event_type"]: r
        for r in QUERIES["q_wasserstein_drift"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "events",
        "event_type, CAST(floor(value * 1000000.0) AS BIGINT) AS qv,"
        " CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we",
        "value IS NOT NULL",
    )
    for ty, sub in df.groupby("event_type"):
        wd = sorted(sub[sub["we"] == 0]["qv"])
        we = sorted(sub[sub["we"] == 1]["qv"])
        n1, n2 = len(wd), len(we)
        # W1 between the two empirical distributions on the shared
        # micro-unit support: integral of |F1 - F2|
        support = sorted(set(wd) | set(we))
        c1 = c2 = 0
        i1 = i2 = 0
        w1 = 0.0
        for v, nxt in zip(support, support[1:]):
            while i1 < n1 and wd[i1] <= v:
                c1 += 1
                i1 += 1
            while i2 < n2 and we[i2] <= v:
                c2 += 1
                i2 += 1
            w1 += abs(c1 / n1 - c2 / n2) * (nxt - v)
        r = got[ty]
        assert (r["n_weekday"], r["n_weekend"]) == (n1, n2), ty
        _close(r["w1_distance"], w1 / 1e6, tol=1e-9)


def test_period_detect_matches_folded_anova_replica(spark, sf_small):
    got = {
        r["period"]: r
        for r in QUERIES["q_period_detect"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "orders",
        "CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS dayn,"
        " CAST(floor(o_totalprice / 100.0) AS BIGINT) AS h",
    )
    daily = defaultdict(int)
    for _, r in df.iterrows():
        daily[r["dayn"]] += r["h"]
    series = [daily[d] for d in sorted(daily)]
    best = None
    for p in (3, 7, 14):
        m = len(series) // p
        x = series[: m * p]
        groups = defaultdict(list)
        for i, v in enumerate(x):
            groups[i % p].append(v)
        from fractions import Fraction

        gm = Fraction(sum(x), len(x))
        ssb = sum(
            len(g) * (Fraction(sum(g), len(g)) - gm) ** 2
            for g in groups.values()
        )
        sst = sum((v - gm) ** 2 for v in x)
        r2 = float(Fraction(ssb, sst))
        r = got[p]
        assert r["n_days_used"] == len(x)
        _close(r["r2_between"], r2, tol=1e-9)
        if best is None or r2 > best[1]:
            best = (p, r2)
    assert got[best[0]]["is_best"]


def test_seasonal_strength_matches_wang_hyndman_replica(spark, sf_small):
    row = QUERIES["q_seasonal_strength"](spark, sf_small).collect()[0]
    df = _raw(
        sf_small,
        "orders",
        "CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS dayn,"
        " CAST(EXTRACT(dow FROM o_orderdate) AS BIGINT) AS dow,"
        " CAST(floor(o_totalprice / 100.0) AS BIGINT) AS h",
    )
    daily = {}
    for _, r in df.iterrows():
        key = r["dayn"]
        if key not in daily:
            daily[key] = [r["dow"], 0]
        daily[key][1] += r["h"]
    days = sorted(daily)
    h = [daily[d][1] for d in days]
    det = []
    for i in range(len(h)):
        if 3 <= i < len(h) - 3:
            det.append((daily[days[i]][0], 7 * h[i] - sum(h[i - 3 : i + 4])))
    dm = defaultdict(list)
    for dow, v in det:
        dm[dow].append(v)
    dmean = {dow: statistics.mean(vs) for dow, vs in dm.items()}
    qrem = [math.floor(v - dmean[dow]) for dow, v in det]
    dv = [v for _, v in det]
    n = len(det)

    def nvar(xs):
        return n * sum(v * v for v in xs) - sum(xs) ** 2

    fs = max(0.0, 1.0 - nvar(qrem) / nvar(dv))
    assert row["n_days_used"] == n
    # floor(det7 - dmean) sits on an integer boundary when dmean is
    # near-integral: the replica's statistics.mean and the engine's
    # SUM/COUNT double can legitimately floor one residual differently,
    # moving F_s by ~1e-9 — tolerance reflects that, not formula slack
    _close(row["f_seasonal"], fs, tol=1e-6)


def test_heaps_curve_matches_first_position_replica(spark, sf_small):
    got = {
        r["decile"]: r
        for r in QUERIES["q_heaps_curve"](spark, sf_small).collect()
    }
    docs = _raw(sf_small, "documents", "doc_id, text", order="doc_id")
    first = {}
    pos = 0
    for _, r in docs.iterrows():
        for tok in r["text"].split(" "):
            pos += 1
            first.setdefault(tok, pos)
    total = pos
    for dec in range(1, 11):
        cut = (total * dec + 9) // 10
        vocab = sum(1 for p in first.values() if p <= cut)
        r = got[dec]
        assert r["n_tokens_seen"] == cut
        assert r["vocab_size"] == vocab, dec
