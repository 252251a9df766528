"""Known-truth replicas for round-9 driver-window keys, batch 2.

Same rationale as tests/test_r9window_audit.py: these keys enter the
round-9 correctness window never driver-checked, and the differential
gate is blind to defects in the SHARED expression text. Each statistic
is re-derived here from the raw sf0.001 parquet with textbook float
formulas and brute-force loops (no shared identities, no shared
quantization): energy distance by literal O(n^2) pair means, log-rank
by walking the risk table, Granger by two explicit OLS fits,
Page-Hinkley by replaying the sequential recursion.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

duckdb = pytest.importorskip("duckdb")

from big_data_streaming_spark.workload import QUERIES  # noqa: E402


def _close(a, b, tol=1e-9):
    assert a is not None and b is not None, (a, b)
    assert abs(a - b) <= tol * max(1.0, abs(a), abs(b)), (a, b)


def _raw(sf_dir: str, table: str, cols: str, where: str = ""):
    con = duckdb.connect()
    return con.execute(
        f"SELECT {cols} FROM read_parquet('{sf_dir}/{table}.parquet')"
        + (f" WHERE {where}" if where else "")
    ).fetch_df()


def test_energy_distance_matches_pairwise_means(spark, sf_small):
    row = QUERIES["q_energy_test"](spark, sf_small).collect()[0]
    df = _raw(
        sf_small,
        "events",
        "event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c",
        "value IS NOT NULL AND event_type IN ('click', 'view')",
    )
    x = [c / 100.0 for c in df[df["event_type"] == "click"]["c"]]
    y = [c / 100.0 for c in df[df["event_type"] == "view"]["c"]]
    n1, n2 = len(x), len(y)
    mxy = sum(abs(a - b) for a in x for b in y) / (n1 * n2)
    mxx = sum(abs(a - b) for a in x for b in x) / (n1 * n1)
    myy = sum(abs(a - b) for a in y for b in y) / (n2 * n2)
    e = 2 * mxy - mxx - myy
    assert row["n1"] == n1 and row["n2"] == n2
    _close(row["energy_distance"], e, tol=1e-9)
    _close(row["energy_stat"], n1 * n2 / (n1 + n2) * e, tol=1e-9)


def test_partial_corr_matches_pearson_replica(spark, sf_small):
    row = QUERIES["q_partial_corr"](spark, sf_small).collect()[0]
    df = _raw(
        sf_small,
        "events",
        "CAST(ts AS DATE) AS d, event_type",
    )
    days = sorted(set(df["d"]))
    series = {}
    for ty, col in (("click", "x"), ("purchase", "y"), ("view", "z")):
        c = Counter(df[df["event_type"] == ty]["d"])
        series[col] = [c.get(d, 0) for d in days]

    def pearson(a, b):
        n = len(a)
        ma, mb = sum(a) / n, sum(b) / n
        cov = sum((u - ma) * (v - mb) for u, v in zip(a, b))
        va = math.sqrt(sum((u - ma) ** 2 for u in a))
        vb = math.sqrt(sum((v - mb) ** 2 for v in b))
        return cov / (va * vb)

    rxy = pearson(series["x"], series["y"])
    rxz = pearson(series["x"], series["z"])
    ryz = pearson(series["y"], series["z"])
    _close(row["r_xy"], rxy, tol=1e-9)
    _close(row["r_xz"], rxz, tol=1e-9)
    _close(row["r_yz"], ryz, tol=1e-9)
    _close(
        row["partial_r"],
        (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2)),
        tol=1e-9,
    )


def test_granger_lite_matches_two_ols_fits(spark, sf_small):
    np = pytest.importorskip("numpy")
    row = QUERIES["q_granger_lite"](spark, sf_small).collect()[0]
    df = _raw(sf_small, "events", "CAST(ts AS DATE) AS d, event_type")
    days = sorted(set(df["d"]))
    cx = Counter(df[df["event_type"] == "click"]["d"])
    cy = Counter(df[df["event_type"] == "purchase"]["d"])
    x = [cx.get(d, 0) for d in days]
    y = [cy.get(d, 0) for d in days]
    yt = np.array(y[1:], dtype=float)
    y1 = np.array(y[:-1], dtype=float)
    x1 = np.array(x[:-1], dtype=float)
    n = len(yt)

    def sse(design):
        a = np.column_stack([np.ones(n)] + design)
        beta, *_ = np.linalg.lstsq(a, yt, rcond=None)
        r = yt - a @ beta
        return float(r @ r)

    sse_r, sse_u = sse([y1]), sse([y1, x1])
    assert row["n_obs"] == n
    # the engine's SSEs are n-scaled (moments cleared of /n); the ratio
    # statistic is scale-invariant, so compare F and the SSE ratio
    _close(row["sse_r"] / row["sse_u"], sse_r / sse_u, tol=1e-7)
    _close(row["f_granger"], (sse_r - sse_u) * (n - 3) / sse_u, tol=1e-6)


def test_logrank_matches_risk_table_walk(spark, sf_small):
    row = QUERIES["q_logrank"](spark, sf_small).collect()[0]
    df = _raw(
        sf_small,
        "events",
        "user_id, event_type,"
        " CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day",
    )
    users = {}
    for _, r in df.iterrows():
        u = users.setdefault(
            r["user_id"], {"d0": r["day"], "dl": r["day"], "dp": None}
        )
        u["d0"] = min(u["d0"], r["day"])
        u["dl"] = max(u["dl"], r["day"])
        if r["event_type"] == "purchase":
            u["dp"] = r["day"] if u["dp"] is None else min(u["dp"], r["day"])
    obs = [
        (
            uid % 2,
            (u["dp"] - u["d0"]) if u["dp"] is not None else (u["dl"] - u["d0"]),
            1 if u["dp"] is not None else 0,
        )
        for uid, u in users.items()
    ]
    event_days = sorted({tt for _, tt, ev in obs if ev == 1})
    o1 = e1 = v = 0.0
    for day in event_days:
        at = [(arm, tt, ev) for arm, tt, ev in obs if tt >= day]
        n = len(at)
        n1 = sum(1 for arm, *_ in at if arm == 1)
        d = sum(1 for _, tt, ev in at if tt == day and ev == 1)
        d1 = sum(1 for arm, tt, ev in at if tt == day and ev == 1 and arm == 1)
        o1 += d1
        e1 += d * n1 / n
        if n > 1:
            v += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
    assert row["n_users"] == len(users)
    assert row["n_event_days"] == len(event_days)
    assert row["o1"] == round(o1)
    _close(row["e1"], e1, tol=1e-6)
    _close(row["var_lr"], v, tol=1e-6)
    _close(row["logrank_chi2"], (o1 - e1) ** 2 / v, tol=1e-6)


def test_hash_uniformity_matches_hashlib_replica(spark, sf_small):
    row = QUERIES["q_hash_uniformity"](spark, sf_small).collect()[0]
    df = _raw(sf_small, "events", "event_id")
    buckets = Counter(
        int(hashlib.md5(str(e).encode()).hexdigest()[:8], 16) % 16
        for e in df["event_id"]
    )
    n = sum(buckets.values())
    sq = sum(o * o for o in buckets.values())
    assert row["min_bucket"] == min(buckets.values())
    assert row["max_bucket"] == max(buckets.values())
    _close(row["chi2"] if "chi2" in row.asDict() else row[-1],
           (16 * sq - n * n) / n, tol=1e-9)


def test_scan_stat_matches_sliding_range_replica(spark, sf_small):
    rows = {
        r["event_type"]: r
        for r in QUERIES["q_scan_stat"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "events",
        "event_type,"
        " CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) // 3600"
        " AS hidx",
    )
    for ty, sub in df.groupby("event_type"):
        c = Counter(sub["hidx"])
        best = None
        for h in sorted(c):
            c6 = sum(c.get(h - k, 0) for k in range(6))
            if best is None or c6 > best[1]:
                best = (h, c6)
        assert rows[ty]["window_end_hidx"] == best[0], ty
        assert rows[ty]["max_6h_count"] == best[1], ty


def test_page_hinkley_matches_sequential_replay(spark, sf_small):
    out = QUERIES["q_page_hinkley"](spark, sf_small).collect()
    df = _raw(sf_small, "events", "CAST(ts AS DATE) AS d")
    c = Counter(df["d"])
    days = sorted(c)
    cum = 0.0
    run_min = 0.0
    s = 0
    for i, d in enumerate(days, start=1):
        s += c[d]
        cum += c[d] - s / i - 0.5
        run_min = min(run_min, cum)
        r = out[i - 1]
        _close(r["ph_cum"], cum, tol=1e-6)
        # the spec's running minimum includes the current row and the
        # zero start; derive the stat the same way the trace defines it
        _close(r["ph_stat"], cum - min(run_min, cum), tol=1e-6)
        assert r["alert"] == (1 if cum - min(run_min, cum) > 50 else 0)
