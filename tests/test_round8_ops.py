"""Known-truth property tests for the round-8 statistics operators.

The three-scale differential gate proves Spark and DuckDB agree — but
both engines evaluate the SAME shared expression text, so a defect in
the shared fragment itself (wrong constant, wrong formula, wrong
literal) is invisible to it (the exact bug class ADVICE r7 found in
``_KMV_SET_EST_UNION``). These tests close that blind spot: each query
runs against a tiny SYNTHETIC fixture whose statistic is re-derived
independently in Python (math.log for the SPRT literals, first-
principles OLS/ANOVA replicas, closed-form identities like "zero
scatter -> DB index 0"), so a spec error fails loudly even though the
engines agree with each other.
"""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from big_data_streaming_spark.workload import QUERIES


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, day_of_jan_2024, user_id, event_type, value).

    Written with pyarrow as naive TIMESTAMP(MICROS) — the same flavor
    the driver testdata carries (TESTDATA.md / catalog.py round-2
    note), so ``load_table``'s normalizer takes the NTZ path it takes
    in production. A Spark-side write would emit INT96, which pyarrow
    reports as timestamp[ns] and the normalizer would mis-route."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime(2024, 1, r[1], 12, 0, 0) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _close(a, b, tol=1e-9):
    assert a is not None and b is not None, (a, b)
    assert abs(a - b) <= tol * max(1.0, abs(a), abs(b)), (a, b)


# --- SPRT: the log-likelihood literals -------------------------------------


def test_sprt_llr_matches_math_log(spark, tmp_path):
    """The four SPRT literals cannot be checked by the differential gate
    (shared text). Re-derive the LLR with math.log on a 2-day fixture:
    day 1 = 2 purchases / 10 events, day 2 adds 3 / 10."""
    rows = []
    eid = 0
    for day, n, s in ((1, 10, 2), (2, 10, 3)):
        for i in range(n):
            rows.append(
                (eid, day, i, "purchase" if i < s else "click", 1.0)
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["doy"]: r.asDict()
        for r in QUERIES["q_sprt_monitor"](spark, sf).collect()
    }
    l1, l0 = math.log(0.25 / 0.20), math.log(0.75 / 0.80)
    _close(got[1]["llr"], 2 * l1 + 8 * l0)
    _close(got[2]["llr"], 5 * l1 + 15 * l0)
    assert got[1]["decision"] == "continue"
    assert got[2]["n_cum"] == 20 and got[2]["s_cum"] == 5


def test_sprt_boundaries_are_log_alpha_beta(spark, tmp_path):
    """An extreme fixture must CROSS the ln(0.95/0.05) boundary exactly
    where math.log says it does: all-purchase days push LLR up by
    n*ln(1.25) per day, so the first day with cum LLR >= A flips to
    accept_h1."""
    rows = []
    eid = 0
    for day in range(1, 4):
        for i in range(10):
            rows.append((eid, day, i, "purchase", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["doy"]: r.asDict()
        for r in QUERIES["q_sprt_monitor"](spark, sf).collect()
    }
    a_bound = math.log(0.95 / 0.05)
    for day in (1, 2, 3):
        llr = 10 * day * math.log(1.25)
        _close(got[day]["llr"], llr)
        expect = "accept_h1" if llr >= a_bound else "continue"
        assert got[day]["decision"] == expect, (day, llr, a_bound)


# --- Goodman-Kruskal lambda: the two closed-form extremes -------------------


def test_gk_lambda_perfect_prediction_is_one(spark, tmp_path):
    """Each weekday maps to a unique type -> lambda = 1."""
    rows = [
        (d, d + 1, 0, f"type_{d}", 1.0) for d in range(7)  # Jan 1..7
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_gk_lambda"](spark, sf).collect()[0]
    _close(row["gk_lambda"], 1.0)


def test_gk_lambda_uninformative_is_zero(spark, tmp_path):
    """The same 2A:1B mix every day -> knowing the day never beats the
    modal guess -> lambda = 0."""
    rows = []
    eid = 0
    for day in range(1, 8):
        for et in ("A", "A", "B"):
            rows.append((eid, day, 0, et, 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_gk_lambda"](spark, sf).collect()[0]
    _close(row["gk_lambda"], 0.0)
    assert row["n_events"] == 21


# --- Le Cam drift: identical mixes -> 0 -------------------------------------


def test_lecam_identical_mixes_is_zero(spark, tmp_path):
    """Weekday and weekend value-bucket mixes identical -> drift 0.
    Jan 2024: Jan 1 is a Monday, Jan 6/7 the first weekend."""
    rows = []
    eid = 0
    for day in (2, 6):  # one weekday, one weekend day
        for val in (10.0, 10.0, 60.0):  # buckets 0, 0, 1
            rows.append((eid, day, 0, "click", val))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_lecam_drift"](spark, sf).collect()[0]
    _close(row["lecam"], 0.0)
    assert row["n_buckets"] == 2
    assert row["n_weekday"] == 3 and row["n_weekend"] == 3


def test_lecam_disjoint_mixes_is_two(spark, tmp_path):
    """Disjoint supports -> every term (p-q)^2/(p+q) = p or q ->
    LC = sum p + sum q = 2, the documented upper bound."""
    rows = [
        (0, 2, 0, "click", 10.0),   # weekday -> bucket 0
        (1, 6, 0, "click", 60.0),   # weekend -> bucket 1
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_lecam_drift"](spark, sf).collect()[0]
    _close(row["lecam"], 2.0)


# --- Chow test: first-principles OLS replica --------------------------------


def _sse(pts):
    n = len(pts)
    sx = float(sum(x for x, _ in pts))
    sy = float(sum(y for _, y in pts))
    sxy = float(sum(x * y for x, y in pts))
    sxx = float(sum(x * x for x, _ in pts))
    syy = float(sum(y * y for _, y in pts))
    return (syy - sy * sy / n) - (sxy - sx * sy / n) ** 2 / (
        sxx - sx * sx / n
    )


def test_chow_f_matches_python_ols(spark, tmp_path):
    """Replicate the full Chow F from raw (day, cents) points in pure
    Python (exact small-int float arithmetic) — a wrong moment, wrong
    pooling, or wrong df in the shared text fails here even though
    both engines agree on it."""
    pts = [
        (1, 100.00), (5, 180.00), (10, 240.00), (14, 330.00),
        (16, 10.00), (20, 20.00), (25, 25.00), (29, 35.00),
    ]
    rows = [
        (i, day, 0, "click", price) for i, (day, price) in enumerate(pts)
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_chow_test"](spark, sf).collect()[0]
    cents = [(d, round(p * 100)) for d, p in pts]
    h1 = [(x, y) for x, y in cents if x <= 15]
    h2 = [(x, y) for x, y in cents if x > 15]
    sse_h = _sse(h1) + _sse(h2)
    sse_p = _sse(cents)
    n = len(cents)
    f_stat = ((sse_p - sse_h) / 2.0) / (sse_h / (n - 4.0))
    assert row["n_events"] == n
    _close(row["sse_pooled"], sse_p)
    _close(row["sse_halves"], sse_h)
    _close(row["chow_f"], f_stat)


# --- Cochran-Armitage: first-principles replica ------------------------------


def test_cochran_armitage_matches_python(spark, tmp_path):
    """Monotone purchase share across 3 buckets; z re-derived from the
    textbook N-multiplied form in Python."""
    design = [(25.0, 4, 1), (75.0, 4, 2), (125.0, 4, 3)]
    rows = []
    eid = 0
    for val, n_i, r_i in design:
        for i in range(n_i):
            rows.append(
                (eid, 1 + eid % 28, eid, "purchase" if i < r_i else "view",
                 val)
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_cochran_armitage"](spark, sf).collect()[0]
    ws = [0, 1, 2]
    n = sum(n_i for _, n_i, _ in design)
    r = sum(r_i for _, _, r_i in design)
    swr = sum(w * r_i for w, (_, _, r_i) in zip(ws, design))
    swn = sum(w * n_i for w, (_, n_i, _) in zip(ws, design))
    swwn = sum(w * w * n_i for w, (_, n_i, _) in zip(ws, design))
    num = float(n) * swr - float(r) * swn
    var = float(r) * (n - r) / n * (float(n) * swwn - float(swn) * swn)
    _close(row["z_trend"], num / math.sqrt(var))
    assert row["n"] == n and row["n_purchase"] == r


# --- Cronbach's alpha: first-principles replica ------------------------------


def test_cronbach_alpha_matches_python(spark, tmp_path):
    """3 days x 2 items with hand-chosen counts; alpha re-derived from
    the n-multiplied variance numerators."""
    counts = {(1, "A"): 3, (1, "B"): 5, (2, "A"): 1, (2, "B"): 2,
              (3, "A"): 4, (3, "B"): 7}
    rows = []
    eid = 0
    for (day, et), c in counts.items():
        for _ in range(c):
            rows.append((eid, day, 0, et, 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_cronbach_alpha"](spark, sf).collect()[0]
    n_days, k = 3, 2
    def vnum(xs):
        return n_days * sum(x * x for x in xs) - sum(xs) ** 2
    va = vnum([3, 1, 4])
    vb = vnum([5, 2, 7])
    vt = vnum([8, 3, 11])
    alpha = k / (k - 1) * (1.0 - (va + vb) / vt)
    assert row["n_days"] == n_days and row["k_items"] == k
    assert row["sum_item_var"] == va + vb
    assert row["total_var"] == vt
    _close(row["cronbach_alpha"], alpha)


# --- ICC: perfect separation -> 1 -------------------------------------------


def test_icc_perfect_separation_is_one(spark, tmp_path):
    """Constant value within each type (zero within-group variance)
    -> SSW = 0 -> ICC = 1 (up to the documented 1e-2 term quantization)."""
    rows = []
    eid = 0
    for et, val in (("A", 10.0), ("B", 20.0), ("C", 40.0)):
        for i in range(4):
            rows.append((eid, 1 + eid % 28, i, et, val))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_icc_value"](spark, sf).collect()[0]
    assert row["k_groups"] == 3 and row["n_events"] == 12
    _close(row["msw"], 0.0, tol=1e-6)
    _close(row["icc"], 1.0, tol=1e-6)


# --- Davies-Bouldin: zero scatter -> 0 ---------------------------------------


def test_davies_bouldin_tight_clusters_is_zero(spark, tmp_path):
    """Every point ON its centroid -> scatters 0 -> DB index 0."""
    rows = []
    eid = 0
    for et, val in (("A", 1.0), ("B", 2.0)):
        for _ in range(3):
            rows.append((eid, 1 + eid % 28, 0, et, val))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_davies_bouldin"](spark, sf).collect()[0]
    assert row["k_clusters"] == 2
    _close(row["db_index"], 0.0)


def test_davies_bouldin_matches_python(spark, tmp_path):
    """Two spread clusters; DB re-derived from mean absolute deviations
    and centroid gaps in Python (cents domain)."""
    vals = {"A": [1.00, 2.00, 3.00], "B": [10.00, 12.00]}
    rows = []
    eid = 0
    for et, vs in vals.items():
        for v in vs:
            rows.append((eid, 1 + eid % 28, 0, et, v))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_davies_bouldin"](spark, sf).collect()[0]
    cents = {k: [round(v * 100) for v in vs] for k, vs in vals.items()}
    mu = {k: sum(vs) / len(vs) for k, vs in cents.items()}
    scat = {
        k: sum(abs(v - mu[k]) for v in vs) / len(vs)
        for k, vs in cents.items()
    }
    r_ab = (scat["A"] + scat["B"]) / abs(mu["A"] - mu["B"])
    _close(row["db_index"], r_ab)  # max_j is the only j for both


# --- Allan variance: constant series -> 0; replica -------------------------


def test_allan_constant_series_is_zero(spark, tmp_path):
    rows = []
    eid = 0
    for day in range(1, 17):
        for _ in range(5):
            rows.append((eid, day, 0, "click", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["tau"]: r.asDict()
        for r in QUERIES["q_allan_variance"](spark, sf).collect()
    }
    assert set(got) == {1, 2, 4, 8}
    for tau, r in got.items():
        _close(r["avar"], 0.0)
        assert r["m_bins"] == 16 // tau


def test_allan_matches_python(spark, tmp_path):
    counts = [3, 7, 4, 10, 2, 9, 5, 8]
    rows = []
    eid = 0
    for day, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append((eid, day, 0, "click", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["tau"]: r.asDict()
        for r in QUERIES["q_allan_variance"](spark, sf).collect()
    }
    for tau in (1, 2, 4):
        bins = [
            sum(counts[i : i + tau]) for i in range(0, len(counts), tau)
        ]
        diffs = [b - a for a, b in zip(bins, bins[1:])]
        avar = sum(float(d) * d for d in diffs) / (
            2.0 * (len(bins) - 1.0) * tau * tau
        )
        _close(got[tau]["avar"], avar)
        assert got[tau]["m_bins"] == len(bins)


# --- Rescaled range: first-principles replica --------------------------------


def test_rescaled_range_matches_python(spark, tmp_path):
    """10 days -> two full 5-day windows; R/S re-derived with the spec's
    Z_0 = 0 convention and population std."""
    counts = [3, 9, 2, 8, 5, 7, 1, 6, 4, 10]
    rows = []
    eid = 0
    for day, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append((eid, day, 0, "click", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["n_size"]: r.asDict()
        for r in QUERIES["q_rescaled_range"](spark, sf).collect()
    }
    n = 5
    rs_vals = []
    for w in range(2):
        xs = counts[w * n : (w + 1) * n]
        m = sum(xs) / n
        z, zs = 0.0, [0.0]
        for x in xs:
            z += x - m
            zs.append(z)
        r_range = max(zs) - min(zs)
        s = math.sqrt(sum((x - m) ** 2 for x in xs) / n)
        rs_vals.append(
            math.floor(r_range / s * 1e9 + 0.5) / 1e9
        )
    _close(got[5]["mean_rs"], sum(rs_vals) / len(rs_vals))
    assert got[5]["n_windows"] == 2
    assert got[10]["n_windows"] == 1
    assert 15 not in got  # no full 15-day window in 10 days


# --- Palma ratio: hand-checked shares ----------------------------------------


def test_palma_matches_hand_shares(spark, tmp_path):
    """10 customers with revenues 1..10 dollars: k_top = 1, k_bottom =
    4, so Palma = 10 / (1+2+3+4) = 1.0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "o_orderkey": pa.array(range(1, 11), pa.int64()),
            "o_custkey": pa.array(range(1, 11), pa.int64()),
            "o_totalprice": pa.array(
                [float(i) for i in range(1, 11)], pa.float64()
            ),
        }
    )
    pq.write_table(table, str(tmp_path / "orders.parquet"))
    row = QUERIES["q_palma_ratio"](spark, str(tmp_path)).collect()[0]
    assert row["n_customers"] == 10
    assert row["k_top"] == 1 and row["k_bottom"] == 4
    assert row["top_cents"] == 1000
    assert row["bottom_cents"] == 1000
    _close(row["palma_ratio"], 1.0)


# --- Breusch-Pagan: first-principles replica ---------------------------------


def test_breusch_pagan_matches_python(spark, tmp_path):
    """Heteroscedastic fixture; LM re-derived in Python INCLUDING the
    1e-2 residual quantization, so a wrong auxiliary moment or df in
    the shared text fails here."""
    pts = [
        (1, 10.00), (1, 10.20), (5, 12.00), (5, 11.00),
        (10, 15.00), (10, 9.00), (14, 20.00), (14, 4.00),
        (20, 30.00), (20, 1.00), (29, 45.00), (29, 0.50),
    ]
    rows = [
        (i, day, 0, "click", price) for i, (day, price) in enumerate(pts)
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_breusch_pagan"](spark, sf).collect()[0]
    cents = [(x, round(p * 100)) for x, p in pts]
    n = len(cents)
    sx = float(sum(x for x, _ in cents))
    sy = float(sum(y for _, y in cents))
    sxy = float(sum(x * y for x, y in cents))
    sxx = float(sum(x * x for x, _ in cents))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    icept = (sy - slope * sx) / n
    uq = [
        math.floor((y - icept - slope * x) * (y - icept - slope * x) * 100
                   + 0.5)
        for x, y in cents
    ]
    su = float(sum(uq))
    sux = float(sum(u * x for u, (x, _) in zip(uq, cents)))
    suu = float(sum(float(u) * u for u in uq))
    r2 = (n * sux - su * sx) ** 2 / (
        (n * suu - su * su) * (n * sxx - sx * sx)
    )
    _close(row["slope"], slope)
    _close(row["intercept"], icept)
    _close(row["r2_aux"], r2)
    _close(row["bp_lm"], n * r2)
