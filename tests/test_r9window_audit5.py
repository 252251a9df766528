"""Known-truth replicas for round-9 driver-window keys, batch 5.

q_bloom_advisor carries the round's only remaining transcendental
literals in the window (bits/key = -ln p / ln^2 2, k = log2(1/p) —
hard-coded per the q_ndcg policy); they are re-derived here with
math.log. q_yoy_growth and q_return_rates pin the growth-ledger and
cross-product-ranked share reshapes against dict-walk replicas.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

duckdb = pytest.importorskip("duckdb")

from big_data_streaming_spark.workload import QUERIES  # noqa: E402


def _close(a, b, tol=1e-9):
    assert a is not None and b is not None, (a, b)
    assert abs(a - b) <= tol * max(1.0, abs(a), abs(b)), (a, b)


def _con(sf_dir):
    return duckdb.connect()


def test_bloom_advisor_literals_rederive_from_math_log(spark, sf_small):
    rows = QUERIES["q_bloom_advisor"](spark, sf_small).collect()
    con = duckdb.connect()
    nu, ne = con.execute(
        "SELECT COUNT(DISTINCT user_id), COUNT(DISTINCT event_id)"
        f" FROM read_parquet('{sf_small}/events.parquet')"
    ).fetchone()
    n_keys = {"user_id": nu, "event_id": ne}
    ln2sq = math.log(2.0) ** 2
    for r in rows:
        n = n_keys[r["key_col"]]
        p = r["fpr"]
        bits_per_key = -math.log(p) / ln2sq
        assert r["n_keys"] == n
        assert r["bits"] == math.ceil(n * bits_per_key)
        _close(r["mib"], n * bits_per_key / 8388608.0, tol=1e-12)
        assert r["k_hashes"] == math.ceil(math.log2(1.0 / p))


def test_yoy_growth_matches_yearly_ledger_replica(spark, sf_small):
    got = {
        r["yr"]: r for r in QUERIES["q_yoy_growth"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    df = con.execute(
        "SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,"
        " l_extendedprice, l_discount"
        f" FROM read_parquet('{sf_small}/lineitem.parquet')"
    ).fetch_df()
    rev = {}
    for _, r in df.iterrows():
        rev[r["yr"]] = rev.get(r["yr"], 0.0) + r["l_extendedprice"] * (
            1 - r["l_discount"]
        )
    assert set(got) == set(rev)
    for yr, r in got.items():
        _close(r["revenue"], rev[yr], tol=1e-9)
        if (yr - 1) in rev:
            _close(
                r["yoy_growth"],
                (rev[yr] - rev[yr - 1]) / rev[yr - 1],
                tol=1e-9,
            )
        else:
            assert r["yoy_growth"] is None


def test_return_rates_matches_cross_product_rank_replica(spark, sf_small):
    got = QUERIES["q_return_rates"](spark, sf_small).collect()
    con = duckdb.connect()
    df = con.execute(
        "SELECT p.p_brand, l.l_returnflag"
        f" FROM read_parquet('{sf_small}/lineitem.parquet') l"
        f" JOIN read_parquet('{sf_small}/part.parquet') p"
        " ON l.l_partkey = p.p_partkey"
    ).fetch_df()
    n = Counter(df["p_brand"])
    ret = Counter(df[df["l_returnflag"] == "R"]["p_brand"])
    brands = [b for b in n if n[b] >= 20]
    # rank decided on integer cross-products, ties by brand name
    want = sorted(
        brands, key=lambda b: (-(ret[b] / n[b]), b)
    )
    for i, r in enumerate(got):
        b = want[i]
        assert r["p_brand"] == b, (i, r["p_brand"], b)
        assert (r["n_lines"], r["n_returned"]) == (n[b], ret[b])
        _close(r["return_share"], ret[b] / n[b])
        assert r["rank"] == i + 1
