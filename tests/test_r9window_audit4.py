"""Known-truth replicas for round-9 driver-window keys, batch 4.

Pearson/CV/ratio/band finishes re-derived with the statistics module
and brute-force dict walks from the raw sf0.001 parquet.
"""

from __future__ import annotations

import math
import statistics
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


def test_discount_corr_matches_pearson_replica(spark, sf_small):
    row = QUERIES["q_discount_corr"](spark, sf_small).collect()[0]
    df = _raw(
        sf_small,
        "lineitem",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x,"
        " CAST(l_quantity AS BIGINT) AS y",
    )
    x, y = list(df["x"]), list(df["y"])
    n = len(x)
    mx, my = sum(x) / n, sum(y) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(x, y))
    r = cov / math.sqrt(
        sum((a - mx) ** 2 for a in x) * sum((b - my) ** 2 for b in y)
    )
    assert row["n"] == n
    _close(row["r"], r, tol=1e-9)


def test_price_dispersion_matches_cv_replica(spark, sf_small):
    got = {
        r["p_type"]: r
        for r in QUERIES["q_price_dispersion"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    df = con.execute(
        "SELECT p.p_type,"
        " CAST(floor(l.l_extendedprice / l.l_quantity * 100.0 + 0.5)"
        " AS BIGINT) AS up"
        f" FROM read_parquet('{sf_small}/lineitem.parquet') l"
        f" JOIN read_parquet('{sf_small}/part.parquet') p"
        " ON l.l_partkey = p.p_partkey WHERE l.l_quantity > 0"
    ).fetch_df()
    cvs = {}
    for ty, sub in df.groupby("p_type"):
        ups = list(sub["up"])
        if len(ups) >= 20:
            cvs[ty] = statistics.stdev(ups) / statistics.mean(ups)
    want = sorted(cvs.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert set(got) == {ty for ty, _ in want}
    for rank, (ty, cv) in enumerate(want, start=1):
        assert got[ty]["rank"] == rank
        _close(got[ty]["cv"], cv, tol=1e-9)


def test_token_burst_matches_smoothed_ratio_replica(spark, sf_small):
    got = QUERIES["q_token_burst"](spark, sf_small).collect()
    docs = _raw(sf_small, "documents", "doc_id, text")
    split = min(docs["doc_id"]) + (max(docs["doc_id"]) - min(docs["doc_id"])) // 2
    c1, c2 = Counter(), Counter()
    for _, r in docs.iterrows():
        (c1 if r["doc_id"] <= split else c2).update(r["text"].split(" "))
    scored = [
        (tok, c1[tok], c2[tok], (c2[tok] + 1) / (c1[tok] + 1))
        for tok in set(c1) | set(c2)
        if c1[tok] + c2[tok] >= 10
    ]
    want = sorted(scored, key=lambda s: (-s[3], s[0]))[:15]
    assert len(got) == len(want)
    for g, (tok, a, b, ratio) in zip(got, want):
        assert (g["token"], g["c1"], g["c2"]) == (tok, a, b)
        _close(g["ratio"], ratio, tol=1e-9)


def test_daily_bands_matches_element_selection_replica(spark, sf_small):
    got = {
        str(r["d"]): r
        for r in QUERIES["q_daily_bands"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "events",
        "CAST(ts AS DATE) AS d,"
        " CAST(floor(value * 100 + 0.5) AS BIGINT) AS c, event_id",
        "value IS NOT NULL",
    )
    for d, sub in df.groupby("d"):
        cents = [
            c for c, _ in sorted(zip(sub["c"], sub["event_id"]))
        ]
        n = len(cents)
        key = next(k for k in got if k.startswith(str(d)))
        r = got[key]
        # element selection at rn = (n-1)*p//100 + 1, pinned order
        _close(r["p10"], cents[(n - 1) * 10 // 100] / 100.0)
        _close(r["p50"], cents[(n - 1) * 50 // 100] / 100.0)
        _close(r["p90"], cents[(n - 1) * 90 // 100] / 100.0)


def test_simpsons_check_matches_integer_cross_product_replica(
    spark, sf_small
):
    got = {
        r["stratum"]: r
        for r in QUERIES["q_simpsons_check"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "events",
        "user_id, event_type, EXTRACT(hour FROM ts) AS h",
    )
    cells = {"am": [0, 0, 0, 0], "pm": [0, 0, 0, 0], "_pooled_": [0, 0, 0, 0]}
    for _, r in df.iterrows():
        arm = int(r["user_id"]) % 2
        conv = 1 if r["event_type"] == "purchase" else 0
        for s in (("am" if r["h"] < 12 else "pm"), "_pooled_"):
            cells[s][0] += arm
            cells[s][1] += arm * conv
            cells[s][2] += 1 - arm
            cells[s][3] += (1 - arm) * conv
    n1, c1, n0, c0 = cells["_pooled_"]
    pooled_dir = (c1 * n0 > c0 * n1) - (c1 * n0 < c0 * n1)
    for s, (n1, c1, n0, c0) in cells.items():
        r = got[s]
        assert (r["n1"], r["c1"], r["n0"], r["c0"]) == (n1, c1, n0, c0), s
        d = (c1 * n0 > c0 * n1) - (c1 * n0 < c0 * n1)
        assert r["direction"] == d, s
        _close(r["rate_treat"], c1 / n1)
        _close(r["rate_control"], c0 / n0)
        if s != "_pooled_":
            assert r["reversal"] == (1 if d * pooled_dir < 0 else 0), s
