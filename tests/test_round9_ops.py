"""Known-truth property tests for the round-9 operators.

Same discipline as tests/test_round8_ops.py (VERDICT r8 task 6): the
three-scale differential gate proves Spark and DuckDB agree, but both
evaluate the SAME shared expression text, so a defect in the shared
fragment (wrong formula, wrong constant) is invisible to it. Each
round-9 operator therefore runs against a tiny SYNTHETIC fixture whose
statistic is re-derived independently in Python — pair loops instead of
grid algebra, O(n^2) double sums instead of the sorted-prefix identity,
textbook definitions instead of the cleared-of-division finishes — so a
spec error fails loudly even though the engines agree with each other.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from big_data_streaming_spark.workload import QUERIES


def _write(tmp_path, name: str, cols: dict) -> str:
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
    """rows: (event_id, ts_datetime, user_id, event_type, value)."""
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


def _orders(tmp_path, rows):
    """rows: (o_orderkey, o_custkey, o_totalprice, o_orderpriority)."""
    return _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": [r[0] for r in rows],
            "o_custkey": [r[1] for r in rows],
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": [r[2] for r in rows],
            "o_orderdate": [datetime(2024, 1, 1)] * len(rows),
            "o_orderpriority": [r[3] for r in rows],
        },
    )


def _customer(tmp_path, rows):
    """rows: (c_custkey, c_nationkey)."""
    return _write(
        tmp_path,
        "customer",
        {
            "c_custkey": [r[0] for r in rows],
            "c_name": [f"c{r[0]}" for r in rows],
            "c_nationkey": [r[1] for r in rows],
            "c_acctbal": [100.0] * len(rows),
        },
    )


def _lineitem(tmp_path, rows):
    """rows: (l_orderkey, l_linenumber, l_quantity)."""
    return _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": [r[0] for r in rows],
            "l_linenumber": [r[1] for r in rows],
            "l_quantity": [float(r[2]) for r in rows],
            "l_extendedprice": [100.0] * len(rows),
        },
    )


def _close(a, b, tol=1e-9):
    assert a is not None and b is not None, (a, b)
    assert abs(a - b) <= tol * max(1.0, abs(a), abs(b)), (a, b)


def _pair_counts(xy):
    """Row-pair concordance ground truth: (Nc, Nd, Tx, Ty, Txy)."""
    nc = nd = tx = ty = txy = 0
    for i in range(len(xy)):
        for j in range(i + 1, len(xy)):
            (x1, y1), (x2, y2) = xy[i], xy[j]
            if x1 == x2 and y1 == y2:
                txy += 1
            elif x1 == x2:
                tx += 1
            elif y1 == y2:
                ty += 1
            elif (x1 < x2) == (y1 < y2):
                nc += 1
            else:
                nd += 1
    return nc, nd, tx, ty, txy


def test_somers_d_matches_row_pair_ground_truth(spark, tmp_path):
    prices = [50_000.0, 150_000.0, 250_000.0, 260_000.0, 90_000.0,
              310_000.0, 120_000.0, 510_000.0, 220_000.0, 70_000.0]
    prios = ["1-URGENT", "1-URGENT", "2-HIGH", "2-HIGH", "3-MEDIUM",
             "3-MEDIUM", "4-NOT SPECIFIED", "4-NOT SPECIFIED",
             "5-LOW", "5-LOW"]
    d = _orders(
        tmp_path,
        [(i + 1, i + 1, p, pr) for i, (p, pr) in enumerate(zip(prices, prios))],
    )
    row = QUERIES["q_somers_d"](spark, d).collect()[0]
    xy = [
        (int(pr[0]), min(int(p // 100000), 5))
        for p, pr in zip(prices, prios)
    ]
    nc, nd, tx, ty, txy = _pair_counts(xy)
    _close(row["nc"], nc)
    _close(row["nd"], nd)
    _close(row["ty"], ty)
    _close(row["somers_d"], (nc - nd) / (nc + nd + ty))


def test_gk_gamma_matches_row_pair_ground_truth(spark, tmp_path):
    rows, xy = [], []
    vals = [10.0, 60.0, 120.0, 480.0, 30.0, 220.0, 90.0, 450.0, 140.0]
    for i, v in enumerate(vals):
        hour = i % 4  # hours 0..3
        rows.append((i + 1, datetime(2024, 1, 5, hour, 0, 0), 1, "a", v))
        xy.append((hour, min(int(v // 50), 9)))
    d = _events(tmp_path, rows)
    row = QUERIES["q_gk_gamma"](spark, d).collect()[0]
    nc, nd, *_ = _pair_counts(xy)
    _close(row["nc"], nc)
    _close(row["nd"], nd)
    _close(row["gk_gamma"], (nc - nd) / (nc + nd))


def test_stuart_tau_c_matches_textbook_formula(spark, tmp_path):
    rows, xy = [], []
    qtys = [5, 15, 25, 35, 45, 8, 18, 28, 38, 48, 12, 22]
    for i, q in enumerate(qtys):
        ln = (i % 3) + 1  # line numbers 1..3
        rows.append((i + 1, ln, q))
        xy.append((ln, min(q // 10, 4)))
    d = _lineitem(tmp_path, rows)
    row = QUERIES["q_stuart_tau_c"](spark, d).collect()[0]
    nc, nd, *_ = _pair_counts(xy)
    n = len(xy)
    m = min(len({x for x, _ in xy}), len({y for _, y in xy}))
    _close(row["nc"], nc)
    _close(row["nd"], nd)
    assert row["n"] == n and row["m"] == m
    _close(row["tau_c"], 2.0 * m * (nc - nd) / (n * n * (m - 1)))


def test_mh_odds_matches_per_stratum_replica(spark, tmp_path):
    # two nations with OPPOSITE crude associations (Simpson-flavored)
    orders, cust = [], []
    data = [
        # (custkey, nation, price, urgent)
        (1, 0, 200_000.0, True), (2, 0, 200_000.0, True),
        (3, 0, 200_000.0, False), (4, 0, 90_000.0, True),
        (5, 0, 90_000.0, False), (6, 0, 90_000.0, False),
        (7, 1, 180_000.0, False), (8, 1, 180_000.0, True),
        (9, 1, 60_000.0, True), (10, 1, 60_000.0, True),
        (11, 1, 60_000.0, False), (12, 1, 60_000.0, False),
    ]
    for k, nk, price, urgent in data:
        cust.append((k, nk))
        orders.append((k, k, price, "1-URGENT" if urgent else "5-LOW"))
    d = _orders(tmp_path, orders)
    _customer(tmp_path, cust)
    row = QUERIES["q_mh_odds"](spark, d).collect()[0]
    import math

    num = den = 0
    for nk in (0, 1):
        sub = [(p > 150000, u) for k, n2, p, u in data if n2 == nk]
        a = sum(1 for e, y in sub if e and y)
        b = sum(1 for e, y in sub if e and not y)
        c = sum(1 for e, y in sub if not e and y)
        dd = sum(1 for e, y in sub if not e and not y)
        n = len(sub)
        # 1e6 quantization scale (ADVICE r9: 1e9 left <25% of 2^63
        # headroom for 25 strata at the 100 TB regime)
        num += math.floor(a * dd / n * 1e6 + 0.5)
        den += math.floor(b * c / n * 1e6 + 0.5)
    assert row["n_strata"] == 2
    assert row["num_q"] == num and row["den_q"] == den
    _close(row["or_mh"], num / den)


def test_dixon_q_matches_sorted_order_statistics(spark, tmp_path):
    vals = [10.0, 11.0, 11.5, 12.0, 13.0, 30.0]  # high outlier
    rows = [(i + 1, datetime(2024, 1, 2), 1, "a", v) for i, v in enumerate(vals)]
    # second type: duplicated min -> q_low must be exactly 0
    rows += [
        (100 + i, datetime(2024, 1, 2), 1, "b", v)
        for i, v in enumerate([5.0, 5.0, 7.0, 9.0])
    ]
    d = _events(tmp_path, rows)
    got = {r["event_type"]: r for r in QUERIES["q_dixon_q"](spark, d).collect()}
    sa = sorted(vals)
    _close(got["a"]["q_low"], (sa[1] - sa[0]) / (sa[-1] - sa[0]))
    _close(got["a"]["q_high"], (sa[-1] - sa[-2]) / (sa[-1] - sa[0]))
    sb = sorted([5.0, 5.0, 7.0, 9.0])
    _close(got["b"]["q_low"], (sb[1] - sb[0]) / (sb[-1] - sb[0]))  # 0.0
    _close(got["b"]["q_high"], (sb[-1] - sb[-2]) / (sb[-1] - sb[0]))


def test_lorenz_asymmetry_matches_definition(spark, tmp_path):
    # revenues in cents: mean = 260; below-mean set {100, 200} -> F = 2/5,
    # L = 300/1300; S = 0.4 + 3/13
    revs = [1.0, 2.0, 3.0, 3.0, 4.0]  # dollars -> 100..400 cents
    d = _orders(
        tmp_path,
        [(i + 1, i + 1, r, "3-MEDIUM") for i, r in enumerate(revs)],
    )
    row = QUERIES["q_lorenz_asymmetry"](spark, d).collect()[0]
    cents = [round(r * 100) for r in revs]
    total, n = sum(cents), len(cents)
    below = [c for c in cents if c * n < total]
    assert row["n_customers"] == n
    assert row["m_below"] == len(below)
    _close(row["s_lorenz"], len(below) / n + sum(below) / total)


def test_kendall_w_perfect_and_textbook_agreement(spark, tmp_path):
    # 3 days (judges), 3 types: every judge ranks a > b > c -> W = 1
    rows, eid = [], 0
    for day in (1, 2, 3):
        for ty, cnt in (("a", 9), ("b", 5), ("c", 2)):
            for _ in range(cnt):
                eid += 1
                rows.append((eid, datetime(2024, 1, day), 1, ty, 1.0))
    d = _events(tmp_path, rows)
    row = QUERIES["q_kendall_w"](spark, d).collect()[0]
    assert row["m_judges"] == 3 and row["k_items"] == 3
    _close(row["w_kendall"], 1.0)


def test_kendall_w_matches_python_rank_replica(spark, tmp_path):
    counts = {  # (day, type) -> count, including a judge disagreeing
        (1, "a"): 9, (1, "b"): 5, (1, "c"): 2,
        (2, "a"): 1, (2, "b"): 8, (2, "c"): 4,
        (3, "a"): 6, (3, "b"): 6, (3, "c"): 1,  # tie broken by type name
    }
    rows, eid = [], 0
    for (day, ty), cnt in counts.items():
        for _ in range(cnt):
            eid += 1
            rows.append((eid, datetime(2024, 1, day), 1, ty, 1.0))
    d = _events(tmp_path, rows)
    row = QUERIES["q_kendall_w"](spark, d).collect()[0]
    days, types = (1, 2, 3), ("a", "b", "c")
    r = {ty: 0 for ty in types}
    for day in days:
        order = sorted(types, key=lambda ty: (-counts.get((day, ty), 0), ty))
        for rank, ty in enumerate(order, start=1):
            r[ty] += rank
    m, k = len(days), len(types)
    mean_r = m * (k + 1) / 2
    s = sum((r[ty] - mean_r) ** 2 for ty in types)
    _close(row["w_kendall"], 12 * s / (m * m * (k**3 - k)))


def test_hoover_index_matches_definition(spark, tmp_path):
    # nation 0: 2 customers, 700+300 revenue; nation 1: 3 customers, 100
    cust = [(1, 0), (2, 0), (3, 1), (4, 1), (5, 1)]
    orders = [(1, 1, 7.0, "3-MEDIUM"), (2, 2, 3.0, "3-MEDIUM"),
              (3, 3, 1.0, "3-MEDIUM")]
    d = _orders(tmp_path, orders)
    _customer(tmp_path, cust)
    row = QUERIES["q_hoover_index"](spark, d).collect()[0]
    rev = {0: 1000, 1: 100}
    nc = {0: 2, 1: 3}
    R, C = sum(rev.values()), sum(nc.values())
    h = 0.5 * sum(abs(rev[k] / R - nc[k] / C) for k in rev)
    assert row["n_nations"] == 2
    _close(row["hoover"], h)


def test_gini_md_matches_quadratic_double_sum(spark, tmp_path):
    # the replica computes sum_ij |xi - xj| DIRECTLY, validating the
    # sorted-prefix identity the query uses
    prices = [10.0, 20.0, 20.0, 55.0, 80.0, 5.0, 130.0]
    d = _orders(
        tmp_path,
        [(i + 1, i + 1, p, "2-HIGH") for i, p in enumerate(prices)],
    )
    row = QUERIES["q_gini_md"](spark, d).collect()[0]
    cents = [round(p * 100) for p in prices]
    n = len(cents)
    dsum = sum(abs(a - b) for a in cents for b in cents)
    md = dsum / (n * (n - 1))
    _close(row["md_cents"], md)
    _close(row["rel_md"], md / (sum(cents) / n))


def test_bowley_skew_matches_quantile_cont_replica(spark, tmp_path):
    vals = [1.0, 2.0, 4.0, 8.0, 16.0, 32.0]  # right-skewed
    rows = [(i + 1, datetime(2024, 1, 3), 1, "a", v) for i, v in enumerate(vals)]
    d = _events(tmp_path, rows)
    row = QUERIES["q_bowley_skew"](spark, d).collect()[0]

    def qc(a, p):
        a = sorted(a)
        idx = p * (len(a) - 1)
        lo = int(idx)
        return a[lo] + (idx - lo) * (a[min(lo + 1, len(a) - 1)] - a[lo])

    q1, q2, q3 = qc(vals, 0.25), qc(vals, 0.5), qc(vals, 0.75)
    _close(row["q1"], q1)
    _close(row["q2"], q2)
    _close(row["q3"], q3)
    _close(row["bowley_skew"], (q1 + q3 - 2 * q2) / (q3 - q1))


def _cells_from_custkeys(keys):
    cells = {}
    for k in keys:
        lat = ((k % 2147483647) * 2654435761 % 4294967296) % 180000001 - 90000000
        lon = (
            ((k + 7) % 2147483647) * 2654435761 % 4294967296
        ) % 360000001 - 180000000
        cell = ((lat + 90000000) // 10_000_000, (lon + 180000000) // 10_000_000)
        cells[cell] = cells.get(cell, 0) + 1
    return cells


def _rook_pairs(cells):
    return [
        (a, b)
        for a in cells
        for b in cells
        if (a[0] == b[0] and abs(a[1] - b[1]) == 1)
        or (a[1] == b[1] and abs(a[0] - b[0]) == 1)
    ]


def test_moran_i_matches_first_principles_replica(spark, tmp_path):
    keys = list(range(1, 400))  # enough customers that cells get neighbors
    _customer(tmp_path, [(k, k % 5) for k in keys])
    _orders(tmp_path, [(1, 1, 10.0, "3-MEDIUM")])
    row = QUERIES["q_moran_i"](spark, str(tmp_path)).collect()[0]
    cells = _cells_from_custkeys(keys)
    pairs = _rook_pairs(cells)
    n = len(cells)
    xbar = sum(cells.values()) / n
    w = len(pairs)
    num = sum((cells[a] - xbar) * (cells[b] - xbar) for a, b in pairs)
    den = sum((x - xbar) ** 2 for x in cells.values())
    assert row["n_cells"] == n and row["w_pairs"] == w
    _close(row["moran_i"], (n / w) * num / den, tol=1e-6)


def test_geary_c_matches_first_principles_replica(spark, tmp_path):
    keys = list(range(1, 400))
    _customer(tmp_path, [(k, k % 5) for k in keys])
    _orders(tmp_path, [(1, 1, 10.0, "3-MEDIUM")])
    row = QUERIES["q_geary_c"](spark, str(tmp_path)).collect()[0]
    cells = _cells_from_custkeys(keys)
    pairs = _rook_pairs(cells)
    n = len(cells)
    xbar = sum(cells.values()) / n
    w = len(pairs)
    t_sum = sum((cells[a] - cells[b]) ** 2 for a, b in pairs)
    den = sum((x - xbar) ** 2 for x in cells.values())
    assert row["n_cells"] == n and row["w_pairs"] == w
    _close(row["geary_c"], ((n - 1) / (2 * w)) * t_sum / den, tol=1e-6)
