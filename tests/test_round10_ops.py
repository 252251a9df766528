"""Known-truth property tests for the round-10 operators.

Same discipline as tests/test_round{8,9}_ops.py: the three-scale
differential gate proves Spark and DuckDB agree, but both evaluate the
SAME shared expression text, so a defect in the shared fragment (wrong
formula, wrong constant, wrong closed form) is invisible to it. Each
round-10 operator therefore runs against a tiny SYNTHETIC fixture whose
statistic is re-derived independently in Python — brute-force pair
loops instead of moment identities, a literal outside-in deque walk
instead of the Siegel-Tukey closed form, midranks by position averaging
instead of the doubled-domain cumulative identity — so a spec error
fails loudly even though the engines agree with each other.
"""

from __future__ import annotations

import math
from datetime import datetime

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


def _lineitem(tmp_path, rows):
    """rows: (l_orderkey, l_linenumber, l_quantity, l_extendedprice)."""
    return _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": [r[0] for r in rows],
            "l_linenumber": [r[1] for r in rows],
            "l_quantity": [float(r[2]) for r in rows],
            "l_extendedprice": [float(r[3]) for r in rows],
        },
    )


def _customer(tmp_path, keys):
    return _write(
        tmp_path,
        "customer",
        {
            "c_custkey": list(keys),
            "c_name": [f"c{k}" for k in keys],
            "c_nationkey": [0] * len(keys),
            "c_acctbal": [100.0] * len(keys),
        },
    )


def _close(a, b, tol=1e-9):
    assert a is not None and b is not None, (a, b)
    assert abs(a - b) <= tol * max(1.0, abs(a), abs(b)), (a, b)


_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _rater_fixture(tmp_path):
    """Orders where rater A (priority band) and rater B (price band)
    agree often but not always, with every category present."""
    prices = [
        50_000.0, 150_000.0, 250_000.0, 350_000.0, 450_000.0,
        60_000.0, 160_000.0, 260_000.0, 470_000.0, 80_000.0,
        360_000.0, 170_000.0, 90_000.0, 270_000.0, 380_000.0,
        460_000.0, 130_000.0, 220_000.0, 340_000.0, 40_000.0,
    ]
    prios = [_PRIOS[min(int(p // 100000), 4)] for p in prices[:10]] + [
        _PRIOS[(min(int(p // 100000), 4) + 1) % 5] for p in prices[10:]
    ]
    d = _orders(
        tmp_path,
        [
            (i + 1, i + 1, p, pr)
            for i, (p, pr) in enumerate(zip(prices, prios))
        ],
    )
    pairs = [
        (int(pr[0]) - 1, min(int(p // 100000), 4))
        for p, pr in zip(prices, prios)
    ]
    return d, pairs


def test_weighted_kappa_matches_textbook_formula(spark, tmp_path):
    d, pairs = _rater_fixture(tmp_path)
    row = QUERIES["q_weighted_kappa"](spark, d).collect()[0]
    n = len(pairs)
    k = 5
    obs = {}
    for i, j in pairs:
        obs[(i, j)] = obs.get((i, j), 0) + 1
    rm = [sum(c for (i, _), c in obs.items() if i == q) for q in range(k)]
    cm = [sum(c for (_, j), c in obs.items() if j == q) for q in range(k)]
    # textbook: kappa_w = 1 - sum(w'_ij O_ij)/n / (sum(w'_ij R_i C_j)/n^2)
    d_obs = sum(abs(i - j) * c for (i, j), c in obs.items())
    d_exp = sum(
        abs(i - j) * rm[i] * cm[j] for i in range(k) for j in range(k)
    )
    assert row["n"] == n and row["d_obs"] == d_obs
    _close(row["d_exp"], float(d_exp))
    _close(row["kappa_w"], 1.0 - (d_obs / n) / (d_exp / n / n))


def test_gwet_ac1_matches_textbook_formula(spark, tmp_path):
    d, pairs = _rater_fixture(tmp_path)
    row = QUERIES["q_gwet_ac1"](spark, d).collect()[0]
    n = len(pairs)
    cats = sorted({i for i, _ in pairs} | {j for _, j in pairs})
    k = len(cats)
    p_a = sum(1 for i, j in pairs if i == j) / n
    pe = 0.0
    for q in cats:
        pi = (
            sum(1 for i, _ in pairs if i == q)
            + sum(1 for _, j in pairs if j == q)
        ) / (2 * n)
        pe += pi * (1 - pi)
    pe /= k - 1
    assert row["n"] == n and row["k"] == k
    _close(row["p_a"], p_a)
    _close(row["p_e"], pe)
    _close(row["ac1"], (p_a - pe) / (1 - pe))


def test_gk_tau_matches_pre_definition(spark, tmp_path):
    vals = [12.0, 63.0, 140.0, 77.0, 205.0, 33.0, 12.0, 91.0,
            260.0, 140.0, 55.0, 19.0, 301.0, 63.0, 88.0]
    types = ["click", "view", "click", "view", "purchase",
             "click", "view", "purchase", "click", "view",
             "click", "purchase", "view", "click", "view"]
    rows = [
        (i + 1, datetime(2024, 1, 5, i % 24, 0, 0), 1, ty, v)
        for i, (ty, v) in enumerate(zip(types, vals))
    ]
    d = _events(tmp_path, rows)
    row = QUERIES["q_gk_tau"](spark, d).collect()[0]
    xy = [(ty, min(int(v // 50), 9)) for ty, v in zip(types, vals)]
    n = len(xy)
    xs = sorted({x for x, _ in xy})
    ys = sorted({y for _, y in xy})
    # textbook PRE form: tau = (V(Y) - E[V(Y|X)]) / V(Y), Gini variation
    cj = {y: sum(1 for _, yy in xy if yy == y) for y in ys}
    v_y = 1.0 - sum((c / n) ** 2 for c in cj.values())
    ev = 0.0
    for x in xs:
        nx = sum(1 for xx, _ in xy if xx == x)
        inner = 1.0 - sum(
            (sum(1 for xx, yy in xy if xx == x and yy == y) / nx) ** 2
            for y in ys
        )
        ev += (nx / n) * inner
    assert row["n"] == n
    # the query quantizes each I_x / n_x term at 1e-6 (documented spec,
    # q_chi2 pattern); mirror it, then also bound the distance to the
    # unquantized textbook value
    s1q = sum(
        math.floor(
            sum(
                sum(1 for xx, yy in xy if xx == x and yy == y) ** 2
                for y in ys
            )
            / sum(1 for xx, _ in xy if xx == x)
            * 1e6
            + 0.5
        )
        for x in xs
    )
    s2 = sum(c * c for c in cj.values())
    tau_q = (n * (s1q / 1e6) - s2) / (n * n - s2)
    _close(row["gk_tau"], tau_q)
    assert abs(row["gk_tau"] - (v_y - ev) / v_y) < 1e-5


def test_blomqvist_beta_matches_quadrant_counts(spark, tmp_path):
    import statistics

    qty = [5, 15, 25, 35, 45, 8, 18, 28, 38, 48, 12, 22]
    price = [100.0, 210.0, 330.0, 455.0, 580.0, 130.0, 240.0,
             150.0, 470.0, 600.0, 90.0, 410.0]
    d = _lineitem(
        tmp_path,
        [(i + 1, 1, q, p) for i, (q, p) in enumerate(zip(qty, price))],
    )
    row = QUERIES["q_blomqvist_beta"](spark, d).collect()[0]
    mx, my = statistics.median(qty), statistics.median(price)
    n1 = sum(
        1
        for q, p in zip(qty, price)
        if (q > mx and p > my) or (q < mx and p < my)
    )
    n2 = sum(
        1
        for q, p in zip(qty, price)
        if (q > mx and p < my) or (q < mx and p > my)
    )
    assert row["n_conc"] == n1 and row["n_disc"] == n2
    _close(row["blomqvist_beta"], (n1 - n2) / (n1 + n2))


def _two_sample_fixture(tmp_path):
    """click vs view values, with cross-sample ties, on one day."""
    click = [10.0, 22.0, 22.0, 35.0, 47.0, 51.0, 64.0, 70.0, 88.0]
    view = [15.0, 22.0, 30.0, 30.0, 42.0, 59.0, 73.0, 95.0, 110.0, 120.0]
    rows = []
    eid = 0
    for v in click:
        eid += 1
        rows.append((eid, datetime(2024, 1, 5, 10, 0, 0), 1, "click", v))
    for v in view:
        eid += 1
        rows.append((eid, datetime(2024, 1, 5, 11, 0, 0), 1, "view", v))
    d = _events(tmp_path, rows)
    return d, click, view


def _strict_ranks(click, view):
    """(value, event_id)-ordered strict ranks; event_id = insertion
    order with click first — matches the fixture writer above."""
    tagged = [(v, i + 1, 0) for i, v in enumerate(click)] + [
        (v, len(click) + i + 1, 1) for i, v in enumerate(view)
    ]
    tagged.sort(key=lambda r: (r[0], r[1]))
    return [(g, rk + 1) for rk, (_, _, g) in enumerate(tagged)]


def test_cucconi_matches_published_formulas(spark, tmp_path):
    d, click, view = _two_sample_fixture(tmp_path)
    row = QUERIES["q_cucconi"](spark, d).collect()[0]
    ranks = _strict_ranks(click, view)
    nn = len(ranks)
    n1 = sum(1 for g, _ in ranks if g == 0)
    n2 = nn - n1
    u = sum(rk * rk for g, rk in ranks if g == 1)
    v = sum((nn + 1 - rk) ** 2 for g, rk in ranks if g == 1)
    eu = n2 * (nn + 1) * (2 * nn + 1) / 6.0
    var = n1 * n2 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 180.0
    zu, zv = (u - eu) / math.sqrt(var), (v - eu) / math.sqrt(var)
    rho = 2.0 * (nn * nn - 4) / ((2 * nn + 1) * (8 * nn + 11)) - 1.0
    c = (zu * zu + zv * zv - 2 * rho * zu * zv) / (2 * (1 - rho * rho))
    assert row["n1"] == n1 and row["n2"] == n2
    _close(row["u_sum"], float(u))
    _close(row["v_sum"], float(v))
    _close(row["c_stat"], c)


def test_lepage_matches_published_formulas(spark, tmp_path):
    d, click, view = _two_sample_fixture(tmp_path)
    row = QUERIES["q_lepage"](spark, d).collect()[0]
    ranks = _strict_ranks(click, view)
    nn = len(ranks)
    n1 = sum(1 for g, _ in ranks if g == 0)
    n2 = nn - n1
    w = sum(rk for g, rk in ranks if g == 1)
    a = sum(min(rk, nn + 1 - rk) for g, rk in ranks if g == 1)
    zw = (w - n2 * (nn + 1) / 2.0) / math.sqrt(
        n1 * n2 * (nn + 1) / 12.0
    )
    if nn % 2 == 0:
        ea = n2 * (nn + 2) / 4.0
        va = n1 * n2 * (nn + 2) * (nn - 2) / (48.0 * (nn - 1))
    else:
        ea = n2 * (nn + 1) ** 2 / (4.0 * nn)
        va = n1 * n2 * (nn + 1) * (3 + nn * nn) / (48.0 * nn * nn)
    za = (a - ea) / math.sqrt(va)
    assert row["n1"] == n1 and row["n2"] == n2
    _close(row["w_sum"], float(w))
    _close(row["a_sum"], float(a))
    _close(row["lepage_l"], zw * zw + za * za)


def _siegel_tukey_ranks_by_walk(nn):
    """Assign alternating ranks by literally walking the two ends of
    the sorted order — 1 to the low end, 2,3 to the high end, 4,5 to
    the low end, ... — independent of the closed form in the query."""
    st = [0] * nn
    lo, hi = 0, nn - 1
    rank = 1
    take_low, burst = True, 1
    while lo <= hi:
        for _ in range(burst):
            if lo > hi:
                break
            if take_low:
                st[lo] = rank
                lo += 1
            else:
                st[hi] = rank
                hi -= 1
            rank += 1
        take_low = not take_low
        burst = 2
    return st  # st[i] = alternating rank of ascending position i


def test_siegel_tukey_matches_end_walk(spark, tmp_path):
    d, click, view = _two_sample_fixture(tmp_path)
    row = QUERIES["q_siegel_tukey"](spark, d).collect()[0]
    ranks = _strict_ranks(click, view)
    nn = len(ranks)
    n1 = sum(1 for g, _ in ranks if g == 0)
    n2 = nn - n1
    st = _siegel_tukey_ranks_by_walk(nn)
    st_sum = sum(st[rk - 1] for g, rk in ranks if g == 1)
    z = (st_sum - n2 * (nn + 1) / 2.0) / math.sqrt(
        n1 * n2 * (nn + 1) / 12.0
    )
    assert sorted(st) == list(range(1, nn + 1))  # permutation sanity
    _close(row["st_sum"], float(st_sum))
    _close(row["z_st"], z)


def test_siegel_tukey_closed_form_is_a_permutation_for_many_n(spark):
    # pure closed-form property (no Spark needed beyond the fixture
    # session): the CASE expression must be a permutation of 1..N for
    # every N, else the Wilcoxon null is wrong
    for nn in range(1, 41):
        got = set()
        for a in range(1, nn + 1):
            q = nn + 1 - a
            if a == q:
                st = nn
            elif a < q:
                st = 2 * a if a % 2 == 0 else 2 * a - 1
            else:
                st = 2 * q if q % 2 == 1 else 2 * q - 1
            got.add(st)
        assert got == set(range(1, nn + 1)), nn


def test_brunner_munzel_matches_midrank_definition(spark, tmp_path):
    d, click, view = _two_sample_fixture(tmp_path)
    row = QUERIES["q_brunner_munzel"](spark, d).collect()[0]
    n1, n2 = len(click), len(view)
    combined = sorted(click + view)

    def midrank(v, pool):
        lo = sum(1 for x in pool if x < v)
        c = sum(1 for x in pool if x == v)
        return lo + (c + 1) / 2.0

    r1 = [midrank(v, combined) for v in click]
    r2 = [midrank(v, combined) for v in view]
    h1 = [midrank(v, click) for v in click]
    h2 = [midrank(v, view) for v in view]
    r1m, r2m = sum(r1) / n1, sum(r2) / n2
    s1 = sum(
        (r - h - r1m + (n1 + 1) / 2.0) ** 2 for r, h in zip(r1, h1)
    ) / (n1 - 1)
    s2 = sum(
        (r - h - r2m + (n2 + 1) / 2.0) ** 2 for r, h in zip(r2, h2)
    ) / (n2 - 1)
    p_hat = (r2m - (n2 + 1) / 2.0) / n1
    w_bm = (
        n1 * n2 * (r2m - r1m)
        / ((n1 + n2) * math.sqrt(n1 * s1 + n2 * s2))
    )
    assert row["n1"] == n1 and row["n2"] == n2
    _close(row["p_hat"], p_hat)
    _close(row["w_bm"], w_bm)


def test_pettitt_matches_brute_force(spark, tmp_path):
    counts = [4, 5, 3, 6, 5, 12, 14, 11, 13, 15, 12]  # shift at day 6
    rows, eid = [], 0
    for day, c in enumerate(counts, start=1):
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, datetime(2024, 1, day, 12, 0, 0), 1, "click", 1.0)
            )
    d = _events(tmp_path, rows)
    row = QUERIES["q_pettitt"](spark, d).collect()[0]
    dd = len(counts)
    order = sorted(range(dd), key=lambda i: (counts[i], i))
    rk = [0] * dd
    for pos, i in enumerate(order, start=1):
        rk[i] = pos
    best_k, best_t = -1, None
    cum = 0
    for tt in range(1, dd):
        cum += rk[tt - 1]
        u = abs(2 * cum - tt * (dd + 1))
        if u > best_k:
            best_k, best_t = u, tt
    assert row["d_days"] == dd
    assert row["k_stat"] == best_k
    assert row["t_star"] == datetime(2024, 1, best_t, 0, 0, 0)


def test_mmd_poly_matches_pair_kernel_means(spark, tmp_path):
    early = [1.2, 3.4, 5.0, 2.2, 4.8]  # days 1-15
    late = [7.5, 9.1, 6.3, 8.8]  # days 16+
    rows, eid = [], 0
    for v in early:
        eid += 1
        rows.append((eid, datetime(2024, 1, 5, 10, 0, 0), 1, "click", v))
    for v in late:
        eid += 1
        rows.append((eid, datetime(2024, 1, 25, 10, 0, 0), 1, "click", v))
    d = _events(tmp_path, rows)
    row = QUERIES["q_mmd_poly"](spark, d).collect()[0]
    xa = [math.floor(v * 100 + 0.5) for v in early]
    xb = [math.floor(v * 100 + 0.5) for v in late]

    def kmean(xs, ys):
        return sum(
            (1.0 + x * y) ** 2 for x in xs for y in ys
        ) / (len(xs) * len(ys))

    # V-statistic MMD^2 via raw pair kernel means — independent of the
    # moment identity the query uses
    mmd2 = kmean(xa, xa) + kmean(xb, xb) - 2 * kmean(xa, xb)
    assert row["n_a"] == len(xa) and row["n_b"] == len(xb)
    _close(row["mmd2"], mmd2)


def test_dunn_index_matches_brute_force(spark, tmp_path):
    groups = {
        "click": [1.0, 2.0, 3.0],
        "view": [10.0, 12.0, 11.0],
        "purchase": [30.0, 35.0],
    }
    rows, eid = [], 0
    for ty, vals in groups.items():
        for v in vals:
            eid += 1
            rows.append((eid, datetime(2024, 1, 5, 9, 0, 0), 1, ty, v))
    d = _events(tmp_path, rows)
    row = QUERIES["q_dunn_index"](spark, d).collect()[0]
    cents = {
        ty: [math.floor(v * 100 + 0.5) for v in vals]
        for ty, vals in groups.items()
    }
    mus = {ty: sum(ys) / len(ys) for ty, ys in cents.items()}
    diam = max(max(ys) - min(ys) for ys in cents.values())
    tys = sorted(cents)
    sep = min(
        abs(mus[a] - mus[b])
        for i, a in enumerate(tys)
        for b in tys[i + 1 :]
    )
    assert row["k"] == 3 and row["max_diam"] == diam
    _close(row["min_sep"], sep)
    _close(row["dunn"], sep / diam)


def test_ripley_k_matches_brute_force(spark, tmp_path):
    keys = [20 * i + 3 for i in range(40)]
    d = _customer(tmp_path, keys)
    rows = QUERIES["q_ripley_k"](spark, d).collect()
    got = {r["r"]: r for r in rows}

    def cell(key):
        lat = ((key % 2147483647) * 2654435761 % 4294967296) % 180000001 \
            - 90000000
        lon = (((key + 7) % 2147483647) * 2654435761 % 4294967296) \
            % 360000001 - 180000000
        return (lat + 90000000) // 10000000, (lon + 180000000) // 10000000

    cells = [cell(k) for k in keys]
    n = len(cells)
    n_cells = len(set(cells))
    for r in (1, 2, 3):
        pairs = sum(
            1
            for i in range(n)
            for j in range(n)
            if i != j
            and abs(cells[i][0] - cells[j][0]) <= r
            and abs(cells[i][1] - cells[j][1]) <= r
        )
        assert got[r]["n"] == n and got[r]["n_cells"] == n_cells
        _close(got[r]["pairs"], float(pairs))
        _close(got[r]["k_hat"], n_cells * pairs / (n * (n - 1)))
