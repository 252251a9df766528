"""Spec audit of earlier rounds' shared-text statistics (round 8).

Same rationale as tests/test_round8_ops.py: the differential gate can
never catch a defect in an expression BOTH engines evaluate verbatim —
hand-typed transcendental literals are the highest-risk class (the
formula is uncheckable-by-construction, per the q_ndcg policy the logs/
z-quantiles enter as typed constants). Each test re-derives the
statistic independently in Python: Euler's gamma from the harmonic
asymptotic series, z-quantiles from statistics.NormalDist (a different
algorithm than whatever produced the typed constants — agreement within
1e-12 bounds both), logs/sqrt from math. Fixtures are synthetic, so
expected values are controlled, not fixture-fitted.
"""

from __future__ import annotations

import math
from statistics import NormalDist

from big_data_streaming_spark.workload import QUERIES
from tests.test_round8_ops import _close, _write_events


def _euler_gamma() -> float:
    """gamma = H_n - ln n - 1/(2n) + 1/(12 n^2) + O(n^-4), n = 1e6 —
    an independent derivation accurate far below double ulp."""
    n = 1_000_000
    h = math.fsum(1.0 / k for k in range(1, n + 1))
    return h - math.log(n) - 1.0 / (2 * n) + 1.0 / (12 * n * n)


# --- q_evt_gumbel: sqrt(6)/pi, Euler's gamma, -ln(-ln p) ---------------------


def test_evt_gumbel_literals_and_fit(spark, tmp_path):
    vals = [100.00, 250.00, 180.00, 420.00, 90.00, 310.00]
    rows = []
    eid = 0
    for day, v in enumerate(vals, start=1):
        rows.append((eid, day, 0, "click", v))       # the daily max
        rows.append((eid + 1, day, 0, "click", 1.0))  # a non-max row
        eid += 2
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_evt_gumbel"](spark, sf).collect()[0]
    m = [round(v * 100) for v in vals]
    n, s, qq = len(m), sum(m), sum(x * x for x in m)
    mean = s / n / 100.0
    sd = math.sqrt((n * qq - s * s) / (n * (n - 1))) / 100.0
    beta = sd * (math.sqrt(6.0) / math.pi)
    mu = mean - _euler_gamma() * beta
    r95 = mu + beta * (-math.log(-math.log(0.95)))
    r99 = mu + beta * (-math.log(-math.log(0.99)))
    assert row["n"] == n
    _close(row["mean_max"], mean)
    _close(row["sd_max"], sd)
    _close(row["gumbel_beta"], beta, tol=1e-12)
    _close(row["gumbel_mu"], mu, tol=1e-12)
    _close(row["return_level_95"], r95, tol=1e-12)
    _close(row["return_level_99"], r99, tol=1e-12)


# --- q_ab_power / q_mde_curve: z_{alpha/2} and z_beta ------------------------


def test_ab_power_matches_normaldist(spark, tmp_path):
    """Replicate the per-arm sample-size formula with z-quantiles from
    statistics.NormalDist. The typed constants and NormalDist's
    rational approximation differ by < 1e-15 relative; assert the
    pre-ceil value is far from an integer so the comparison is
    cliff-safe, then the ceiled outputs must agree exactly."""
    rows = []
    eid = 0
    # arm 1 (odd user_id): 3/12 purchase; arm 2 (even): 1/12
    for arm_uid, n_ev, n_p in ((1, 12, 3), (2, 12, 1)):
        for i in range(n_ev):
            rows.append(
                (eid, 1 + eid % 28, arm_uid,
                 "purchase" if i < n_p else "view", 1.0)
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_ab_power"](spark, sf).collect()[0]
    nd = NormalDist()
    za, zb = nd.inv_cdf(0.975), nd.inv_cdf(0.80)
    p1, p2 = 3 / 12, 1 / 12
    pbar = (p1 + p2) / 2
    raw = (
        za * math.sqrt(2 * pbar * (1 - pbar))
        + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
    ) ** 2 / (p1 - p2) ** 2
    assert abs(raw - round(raw)) > 1e-6, "fixture sits on a ceil cliff"
    assert row["n_required_per_arm"] == math.ceil(raw)
    _close(row["p1"], p1)
    _close(row["p2"], p2)


def test_mde_curve_matches_normaldist(spark, tmp_path):
    rows = []
    eid = 0
    # control arm = even user_id; 5/20 purchase
    for i in range(20):
        rows.append(
            (eid, 1 + i % 28, 2, "purchase" if i < 5 else "view", 1.0)
        )
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["n_arm"]: r.asDict()
        for r in QUERIES["q_mde_curve"](spark, sf).collect()
    }
    nd = NormalDist()
    zsum = nd.inv_cdf(0.975) + nd.inv_cdf(0.80)
    p = 5 / 20
    for n_arm in (1000, 10000, 100000):
        mde = zsum * math.sqrt(2 * p * (1 - p) / n_arm)
        _close(got[n_arm]["mde_abs"], mde, tol=1e-12)


# --- q_welch_t: quantized-moment t statistic ---------------------------------


def test_welch_t_matches_python(spark, tmp_path):
    clicks = [10.00, 12.50, 9.75, 14.20, 11.00]
    views = [20.00, 18.50, 22.25, 19.00, 21.75, 23.10]
    rows = []
    eid = 0
    for et, vs in (("click", clicks), ("view", views)):
        for v in vs:
            rows.append((eid, 1 + eid % 28, 0, et, v))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_welch_t"](spark, sf).collect()[0]
    q1 = [math.floor(v * 1000 + 0.5) for v in clicks]
    q2 = [math.floor(v * 1000 + 0.5) for v in views]
    n1, n2 = len(q1), len(q2)
    sx1, sx2 = float(sum(q1)), float(sum(q2))
    sxx1 = float(sum(x * x for x in q1))
    sxx2 = float(sum(x * x for x in q2))
    var1 = (sxx1 - sx1 * sx1 / n1) / (n1 - 1)
    var2 = (sxx2 - sx2 * sx2 / n2) / (n2 - 1)
    t_stat = (sx1 / n1 - sx2 / n2) / 1000.0 / math.sqrt(
        (var1 / n1 + var2 / n2) / 1e6
    )
    assert row["n1"] == n1 and row["n2"] == n2
    _close(row["mean_click"], sx1 / n1 / 1000.0)
    _close(row["welch_t"], t_stat)


# --- q_jarque_bera: n-multiplied central moments + m4 quantization -----------


def test_jarque_bera_matches_python(spark, tmp_path):
    counts = [4, 9, 2, 11, 6, 3, 8, 5]
    rows = []
    eid = 0
    for day, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append((eid, day, 0, "click", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_jarque_bera"](spark, sf).collect()[0]
    n, s = len(counts), sum(counts)
    un = [n * x - s for x in counts]
    m2 = sum(u * u for u in un)
    m3 = sum(u * u * u for u in un)
    m4q = sum(
        math.floor(float(u) * u * u * u / 1048576.0) for u in un
    )
    skew = (m3 / n) / ((m2 / n) * math.sqrt(m2 / n))
    kurt = (m4q * 1048576.0 / n) / ((m2 / n) * (m2 / n)) - 3.0
    jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
    assert row["n_days"] == n
    _close(row["skewness"], skew)
    _close(row["excess_kurtosis"], kurt)
    _close(row["jarque_bera"], jb)


# --- q_wilson_rank: the z = 1.96 constant family ------------------------------


def test_wilson_lower_bound_matches_python(spark, tmp_path):
    """The typed 1.9208 / 0.9604 / 3.8416 constants must be exactly
    z^2/2, z^2/4, z^2 for z = 1.96 — the replica derives all three."""
    rows = []
    eid = 0
    for et, n, hits in (("click", 8, 3), ("view", 5, 5)):
        for i in range(n):
            rows.append(
                (eid, 1 + eid % 28, 0, et, 150.0 if i < hits else 50.0)
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["event_type"]: r.asDict()
        for r in QUERIES["q_wilson_rank"](spark, sf).collect()
    }
    z = 1.96
    for et, n, hits in (("click", 8, 3), ("view", 5, 5)):
        p = hits / n
        lo = (
            p + (z * z / 2) / n
            - z * math.sqrt((p * (1 - p) + (z * z / 4) / n) / n)
        ) / (1 + (z * z) / n)
        assert got[et]["n_hits"] == hits and got[et]["n_total"] == n
        _close(got[et]["wilson_lower"], lo)


# --- wave 2: rank statistics -------------------------------------------------


def _write_events_h(tmp_path, rows):
    """rows: (event_id, day, hour, user_id, event_type, value) — the
    hour-aware variant of test_round8_ops._write_events."""
    from datetime import datetime as _dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [_dt(2024, 1, r[1], r[2], 0, 0) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[3] for r in rows], pa.int64()),
            "event_type": pa.array([r[4] for r in rows], pa.string()),
            "value": pa.array([r[5] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_mannwhitney_matches_python(spark, tmp_path):
    """One-vs-rest U and z re-derived with doubled midranks on a
    fixture WITH ties across groups."""
    data = [
        ("click", 1.0), ("click", 2.0), ("click", 2.0), ("click", 5.0),
        ("view", 2.0), ("view", 3.0), ("view", 4.0),
        ("purchase", 1.0), ("purchase", 4.0),
    ]
    rows = [
        (i, 1 + i % 28, 0, et, v) for i, (et, v) in enumerate(data)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["event_type"]: r.asDict()
        for r in QUERIES["q_mannwhitney"](spark, sf).collect()
    }
    all_vals = [v for _, v in data]
    n_all = len(all_vals)
    for et in ("click", "view", "purchase"):
        mine = [v for e, v in data if e == et]
        n1, n2 = len(mine), n_all - len(mine)
        r1_2 = sum(
            2 * sum(1 for w in all_vals if w < v)
            + sum(1 for w in all_vals if w == v)
            + 1
            for v in mine
        )
        u = (r1_2 - n1 * (n1 + 1)) / 2.0
        z = (u - n1 * n2 / 2.0) / math.sqrt(
            n1 * n2 * (n1 + n2 + 1) / 12.0
        )
        assert got[et]["n1"] == n1 and got[et]["n2"] == n2
        _close(got[et]["u"], u)
        _close(got[et]["z"], z)


def test_kendall_tau_matches_python(spark, tmp_path):
    """Tau-b over hour-of-day (click, view) count pairs, with an
    engineered x-tie; concordant/discordant/tie pair counts and the
    sqrt denominator re-derived by a direct O(h^2) Python loop."""
    design = {0: (5, 1), 1: (3, 2), 2: (3, 5), 3: (1, 7)}
    rows = []
    eid = 0
    for hod, (nc, nv) in design.items():
        for _ in range(nc):
            rows.append((eid, 1 + eid % 28, hod, 0, "click", 1.0))
            eid += 1
        for _ in range(nv):
            rows.append((eid, 1 + eid % 28, hod, 0, "view", 1.0))
            eid += 1
    sf = _write_events_h(tmp_path, rows)
    row = QUERIES["q_kendall_tau"](spark, sf).collect()[0]
    pts = [design[h] for h in sorted(design)]
    conc = disc = tx = ty = n_pairs = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            n_pairs += 1
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    tau = (conc - disc) / math.sqrt(
        (n_pairs - tx) * (n_pairs - ty)
    )
    assert row["n_pairs"] == n_pairs
    assert row["concordant"] == conc and row["discordant"] == disc
    assert row["ties_x"] == tx and row["ties_y"] == ty
    _close(row["tau_b"], tau)


def test_cvm_matches_python(spark, tmp_path):
    """Anderson's two-sample CvM T re-derived from pooled/within ranks
    under the pinned (value, event_id) total order."""
    data = [
        ("click", 1.5), ("click", 3.0), ("click", 3.0), ("click", 7.0),
        ("view", 2.0), ("view", 3.0), ("view", 5.0), ("view", 6.0),
        ("view", 8.0),
    ]
    rows = [
        (i, 1 + i % 28, 0, et, v) for i, (et, v) in enumerate(data)
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_cvm_test"](spark, sf).collect()[0]
    pooled = sorted(
        ((v, eid, et) for eid, (et, v) in enumerate(data)),
    )
    within = {"click": 0, "view": 0}
    d = {"click": 0, "view": 0}
    for pr, (v, eid, et) in enumerate(pooled, start=1):
        within[et] += 1
        d[et] += (pr - within[et]) ** 2
    n1, n2 = within["click"], within["view"]
    u = n1 * d["click"] + n2 * d["view"]
    t_stat = u / (n1 * n2 * (n1 + n2)) - (4.0 * n1 * n2 - 1.0) / (
        6.0 * (n1 + n2)
    )
    assert row["n1"] == n1 and row["n2"] == n2 and row["u"] == u
    _close(row["cvm_t"], t_stat)


def test_levene_bf_matches_python(spark, tmp_path):
    """Brown-Forsythe W re-derived: per-group lower-middle median under
    the (cents, event_id) order, |deviation| ANOVA with the floored
    b-term quantization."""
    data = [
        ("click", 1.00), ("click", 2.00), ("click", 9.00),
        ("click", 10.00),
        ("view", 5.00), ("view", 5.10), ("view", 5.20), ("view", 5.30),
        ("view", 5.40),
    ]
    rows = [
        (i, 1 + i % 28, 0, et, v) for i, (et, v) in enumerate(data)
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_levene_bf"](spark, sf).collect()[0]
    groups = {}
    for eid, (et, v) in enumerate(data):
        groups.setdefault(et, []).append((round(v * 100), eid))
    n = n_groups = s = qq = bsum = 0
    for et, pts in groups.items():
        pts.sort()
        med = pts[(len(pts) + 1) // 2 - 1][0]
        zs = [abs(c - med) for c, _ in pts]
        n1, s1 = len(zs), sum(zs)
        n += n1
        n_groups += 1
        s += s1
        qq += sum(z * z for z in zs)
        bsum += math.floor(float(s1) * s1 / n1)
    ssb = bsum - math.floor(float(s) * s / n)
    ssw = qq - bsum
    w = (ssb / (n_groups - 1)) / (ssw / (n - n_groups))
    assert row["n"] == n and row["n_groups"] == n_groups
    assert row["ssb_sc"] == ssb and row["ssw_sc"] == ssw
    _close(row["w_stat"], w)


# --- wave 3: CDF / robust-location / coverage estimators ---------------------


def test_kuiper_matches_python(spark, tmp_path):
    data = [
        ("click", 1.0), ("click", 2.0), ("click", 2.0), ("click", 6.0),
        ("view", 2.0), ("view", 4.0), ("view", 5.0),
    ]
    rows = [
        (i, 1 + i % 28, 0, et, v) for i, (et, v) in enumerate(data)
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_kuiper_drift"](spark, sf).collect()[0]
    a = sorted(v for et, v in data if et == "click")
    b = sorted(v for et, v in data if et == "view")
    support = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    dplus = max(
        sum(1 for x in a if x <= v) / na - sum(1 for x in b if x <= v) / nb
        for v in support
    )
    dminus = max(
        sum(1 for x in b if x <= v) / nb - sum(1 for x in a if x <= v) / na
        for v in support
    )
    assert row["n_a"] == na and row["n_b"] == nb
    _close(row["d_plus"], dplus)
    _close(row["d_minus"], dminus)
    _close(row["kuiper_v"], dplus + dminus)


def test_capture_recapture_matches_python(spark, tmp_path):
    """Chapman estimator + Seber variance on engineered half-presence:
    the replica recomputes the split day from calendar arithmetic."""
    from datetime import date

    presence = {  # user -> days seen in Jan 2024
        1: [1, 2, 3],        # first half only
        2: [8, 9],           # second half only
        3: [2, 9],           # both halves
        4: [7],              # second half
        5: [1, 10],          # both halves
    }
    rows = []
    eid = 0
    for uid, days in presence.items():
        for d in days:
            rows.append((eid, d, uid, "click", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_capture_recapture"](spark, sf).collect()[0]
    epoch = date(1970, 1, 1)
    def eday(d):
        return (date(2024, 1, d) - epoch).days
    lo = min(min(ds) for ds in presence.values())
    hi = max(max(ds) for ds in presence.values())
    split = (eday(lo) + eday(hi) + 1) // 2
    n1 = sum(1 for ds in presence.values() if any(eday(d) < split for d in ds))
    n2 = sum(1 for ds in presence.values() if any(eday(d) >= split for d in ds))
    m = sum(
        1
        for ds in presence.values()
        if any(eday(d) < split for d in ds)
        and any(eday(d) >= split for d in ds)
    )
    n_hat = (n1 + 1) * (n2 + 1) / (m + 1) - 1.0
    var = ((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
           / ((m + 1) ** 2 * (m + 2)))
    assert row["n1"] == n1 and row["n2"] == n2 and row["m"] == m
    assert row["observed"] == len(presence)
    _close(row["n_hat"], n_hat)
    _close(row["se_hat"], math.sqrt(var))


def test_hodges_lehmann_matches_python(spark, tmp_path):
    """Pseudo-median of Walsh averages (i <= j, self-pairs included),
    the lower-middle SELECTED sum halved last."""
    counts = [3, 9, 2, 8]  # daily click counts, days 1..4
    rows = []
    eid = 0
    for day, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append((eid, day, 0, "click", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_hodges_lehmann"](spark, sf).collect()[0]
    pair_sums = sorted(
        counts[i] + counts[j]
        for i in range(len(counts))
        for j in range(i, len(counts))
    )
    n_pairs = len(pair_sums)
    hl = pair_sums[(n_pairs + 1) // 2 - 1] / 2.0
    assert row["n_days"] == len(counts)
    assert row["n_pairs"] == n_pairs
    _close(row["hl_estimate"], hl)


def test_theilsen_matches_python(spark, tmp_path):
    """Per-user median pairwise slope (cap inactive at 4 events); the
    replica rebuilds every ordered-pair slope in per-hour units from
    microsecond deltas and selects the lower-middle by slope order."""
    pts = [(0, 10.0), (1, 12.0), (3, 11.0), (6, 20.0)]  # (hour, value)
    rows = [
        (i, 1, h, 42, "click", v) for i, (h, v) in enumerate(pts)
    ]
    sf = _write_events_h(tmp_path, rows)
    got = QUERIES["q_theilsen"](spark, sf).collect()
    assert len(got) == 1 and got[0]["user_id"] == 42
    slopes = sorted(
        (v2 - v1) * 3600000000.0 / ((h2 - h1) * 3600 * 1_000_000)
        for i, (h1, v1) in enumerate(pts)
        for h2, v2 in pts[i + 1 :]
    )
    m = len(slopes)
    assert got[0]["n_pairs"] == m
    _close(got[0]["trend_slope_per_hour"], slopes[(m + 1) // 2 - 1])


# --- wave 4: the KMV sketch estimators (the ADVICE r7 bug class) -------------

_M = 2147483647


def _kmv_hash(key: int) -> int:
    return ((key % _M) * 2654435761 + 12345) % _M


def test_kmv_distinct_unsaturated_is_exact_count(spark, tmp_path):
    """k_used < k means the sketch holds the whole set: the estimate
    must be EXACTLY k_used (the pre-ADVICE estimator applied the
    (k-1)M/h_k form here and was wrong)."""
    vals = [round(1.0 + i * 0.37, 2) for i in range(10)]
    rows = [(i, 1 + i % 28, 0, "click", v) for i, v in enumerate(vals)]
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_kmv_distinct"](spark, sf).collect()[0]
    hs = sorted({_kmv_hash(round(v * 100)) for v in vals})
    assert row["k_used"] == len(hs) and row["k_used"] < 64
    assert row["h_k"] == max(hs)
    _close(row["est_distinct"], float(len(hs)))
    _close(row["rel_err"], 0.0)


def test_kmv_distinct_saturated_matches_python(spark, tmp_path):
    """k_used = 64: estimate = 63*M/h_64 with h_64 the 64th smallest
    hash — replica computes the full bottom-k in Python."""
    vals = [round(1.0 + i * 0.73, 2) for i in range(120)]
    rows = [(i, 1 + i % 28, 0, "click", v) for i, v in enumerate(vals)]
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_kmv_distinct"](spark, sf).collect()[0]
    hs = sorted({_kmv_hash(round(v * 100)) for v in vals})
    h_k = hs[63]
    est = 63.0 * _M / h_k
    assert row["k_used"] == 64 and row["h_k"] == h_k
    _close(row["est_distinct"], est)
    _close(row["rel_err"], (est - len(hs)) / len(hs))


def test_kmv_setops_unsaturated_recovers_exact_overlap(spark, tmp_path):
    """|A ∪ B| < 64: the union sketch IS the union, so est_union,
    est_intersection and est_jaccard must equal the exact values."""
    rows = []
    eid = 0
    clicks = [(u, 3) for u in range(1, 11)]        # A: users 1..10, day 3
    purchases = [(u, 3) for u in range(6, 16)]     # B: users 6..15, day 3
    for u, d in clicks:
        rows.append((eid, d, u, "click", 1.0))
        eid += 1
    for u, d in purchases:
        rows.append((eid, d, u, "purchase", 1.0))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_kmv_setops"](spark, sf).collect()[0]
    a = {_kmv_hash(u * 1000 + d) for u, d in clicks}
    b = {_kmv_hash(u * 1000 + d) for u, d in purchases}
    union, inter = a | b, a & b
    assert row["k_used"] == len(union) and row["k_used"] < 64
    assert row["exact_union"] == len(union)
    assert row["exact_inter"] == len(inter)
    assert row["n_both"] == len(inter)
    _close(row["est_union"], float(len(union)))
    _close(row["est_intersection"], float(len(inter)))
    _close(row["est_jaccard"], len(inter) / len(union))


def test_kmv_setops_saturated_matches_python(spark, tmp_path):
    """Saturated sketch: replica rebuilds the bottom-64 union sketch,
    membership counts, and the 63*M/h_k estimator."""
    rows = []
    eid = 0
    clicks = [(u, 1 + u % 28) for u in range(1, 101)]
    purchases = [(u, 1 + u % 28) for u in range(61, 141)]
    for u, d in clicks:
        rows.append((eid, d, u, "click", 1.0))
        eid += 1
    for u, d in purchases:
        rows.append((eid, d, u, "purchase", 1.0))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_kmv_setops"](spark, sf).collect()[0]
    a = {_kmv_hash(u * 1000 + d) for u, d in clicks}
    b = {_kmv_hash(u * 1000 + d) for u, d in purchases}
    union, inter = sorted(a | b), a & b
    sketch = set(union[:64])
    h_k, k_used = union[63], 64
    n_both = len(sketch & a & b)
    est_u = 63.0 * _M / h_k
    rho = n_both / k_used
    assert row["k_used"] == k_used and row["h_k"] == h_k
    assert row["n_both"] == n_both
    assert row["exact_union"] == len(set(union))
    assert row["exact_inter"] == len(inter)
    _close(row["est_union"], est_u)
    _close(row["est_jaccard"], rho)
    _close(row["est_intersection"], rho * est_u)


# --- wave 5: recursions and retrieval constants -------------------------------


def test_holt_matches_python_recursion(spark, tmp_path):
    """Dyadic Holt smoothing (alpha = 1/2, beta = 1/4) replayed as a
    plain Python integer recursion in the 2^20 fixed-point domain."""
    counts = [5, 9, 4, 12, 7, 10]
    rows = []
    eid = 0
    for day, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append((eid, day, 0, "click", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["t"]: r.asDict() for r in QUERIES["q_holt"](spark, sf).collect()
    }
    s = 1 << 20
    lq = counts[0] * s
    bq = (counts[1] - counts[0]) * s
    expect = {1: (lq, bq)}
    for t_idx in range(2, len(counts) + 1):
        x = counts[t_idx - 1]
        lq_new = math.floor((x * s + lq + bq) / 2.0)
        bq = math.floor((lq_new - lq + 3 * bq) / 4.0)
        lq = lq_new
        expect[t_idx] = (lq, bq)
    assert set(got) == set(expect)
    for t_idx, (elq, ebq) in expect.items():
        assert got[t_idx]["level_q"] == elq, t_idx
        assert got[t_idx]["trend_q"] == ebq, t_idx
        _close(got[t_idx]["level"], elq / s)
        _close(got[t_idx]["trend"], ebq / s)
        _close(got[t_idx]["forecast_next"], (elq + ebq) / s)


def test_bm25_matches_python(spark, tmp_path):
    """BM25 with k1 = 1.2, b = 0.75 and the rational idf re-derived
    per (doc, term) from a synthetic corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = {
        1: "spark stream join spark filler filler",
        2: "vector big join",
        3: "filler filler filler filler",
        4: "big big big stream",
    }
    table = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["t"] * len(docs), pa.string()),
            "n_chars": pa.array(
                [len(t) for t in docs.values()], pa.int64()
            ),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["q_bm25"](spark, str(tmp_path)).collect()
    }
    terms = {"join", "vector", "spark", "stream", "big"}
    dls = {d: len(t.split(" ")) for d, t in docs.items()}
    n_docs = len(docs)
    avgdl = sum(dls.values()) / n_docs
    tf = {
        (d, w): t.split(" ").count(w)
        for d, t in docs.items()
        for w in terms
        if w in t.split(" ")
    }
    df = {w: sum(1 for (d2, w2) in tf if w2 == w) for w in terms}
    k1, b = 1.2, 0.75
    for d in docs:
        doc_terms = [(dd, w) for (dd, w) in tf if dd == d]
        if not doc_terms:
            assert d not in got
            continue
        score = sum(
            ((n_docs - df[w] + 0.5) / (df[w] + 0.5))
            * (tf[(d, w)] * (k1 + 1)
               / (tf[(d, w)] + k1 * (1 - b + b * dls[d] / avgdl)))
            for _, w in doc_terms
        )
        assert got[d]["n_terms"] == len(doc_terms)
        _close(got[d]["score"], score)


# --- wave 6: fixed-iteration PageRank over a hand-built trade graph ----------


def test_pagerank_matches_python(spark, tmp_path):
    """3 nations, hand-chosen line-item weights: edges n0->n1 (w=2),
    n0->n2 (w=1), n1->n2 (w=3); n2 is a sink (no dangling
    redistribution, per the implementation). Replica runs the same 3
    iterations r = (1.0-0.85)/n + 0.85*mass in Python doubles; the
    DECIMAL(38,12) mass routing bounds the divergence at ~1e-11, so
    the comparison runs at 1e-8."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def w(name, cols):
        pq.write_table(pa.table(cols), str(tmp_path / f"{name}.parquet"))

    w("nation", {
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["N0", "N1", "N2"], pa.string()),
    })
    w("supplier", {
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int32()),
    })
    w("customer", {
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([1, 2], pa.int32()),
    })
    w("orders", {
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
    })
    # lineitems: o1 x s1 twice (n0->n1 w2); o2 x s1 once (n0->n2 w1);
    # o2 x s2 three times (n1->n2 w3)
    w("lineitem", {
        "l_orderkey": pa.array([1, 1, 2, 2, 2, 2], pa.int64()),
        "l_suppkey": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
    })
    got = {
        r["nationkey"]: r["rank"]
        for r in QUERIES["q_pagerank"](spark, str(tmp_path)).collect()
    }
    edges = {(0, 1): 2, (0, 2): 1, (1, 2): 3}
    out = {0: 3, 1: 3}
    n = 3.0
    d = 0.85
    r = {k: 1.0 / n for k in (0, 1, 2)}
    for _ in range(3):
        mass = {k: 0.0 for k in (0, 1, 2)}
        for (s, t_), wgt in edges.items():
            mass[t_] += r[s] * (wgt / out[s])
        r = {k: (1.0 - d) / n + d * mass[k] for k in (0, 1, 2)}
    for k in (0, 1, 2):
        _close(got[k], r[k], tol=1e-8)


# --- wave 7: fixed-point Markov chain and Wilder RSI --------------------------


def test_markov_stationary_matches_python(spark, tmp_path):
    """Laplace-smoothed transition chain in the 1e9 fixed-point domain,
    25 power steps with sum-then-floor-divide — replayed as exact
    Python integer arithmetic on a 2-state fixture."""
    # one user walks A A B A B B A -> transitions AA, AB, BA, AB, BB, BA
    walk = ["A", "A", "B", "A", "B", "B", "A"]
    rows = [(i, 1, 7, et, 1.0) for i, et in enumerate(walk)]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["event_type"]: r.asDict()
        for r in QUERIES["q_markov_stationary"](spark, sf).collect()
    }
    s_fp = 1_000_000_000
    states = sorted(set(walk))
    tc = {}
    for a, b in zip(walk, walk[1:]):
        tc[(a, b)] = tc.get((a, b), 0) + 1
    sm = {
        (i, j): tc.get((i, j), 0) + 1 for i in states for j in states
    }
    rowtot = {i: sum(sm[(i, j)] for j in states) for i in states}
    fp = {ij: sm[ij] * s_fp // rowtot[ij[0]] for ij in sm}
    pi = {i: s_fp // len(states) for i in states}
    for _ in range(25):
        pi = {
            j: sum(pi[i] * fp[(i, j)] for i in states) // s_fp
            for j in states
        }
    for st in states:
        assert got[st]["pi_fp"] == pi[st], st
        _close(got[st]["stationary_p"], pi[st] / s_fp)


def test_rsi_matches_python(spark, tmp_path):
    """Wilder RSI on 16 hand-chosen prices: integer thousandth deltas,
    14-delta trailing sums, the all-gain 100.0 convention exercised by
    a monotone second fixture type."""
    prices = [10.0, 10.5, 10.2, 11.0, 10.8, 11.5, 11.2, 12.0,
              11.7, 12.5, 12.2, 13.0, 12.8, 13.5, 13.2, 14.0]
    rows = [(i, 1, 0, "click", p) for i, p in enumerate(prices)]
    rows += [
        (100 + i, 1, 0, "view", 1.0 + i) for i in range(15)
    ]  # strictly rising -> loss sum 0 -> RSI 100
    sf = _write_events(spark, tmp_path, rows)
    out = QUERIES["q_rsi"](spark, sf).collect()
    clicks = sorted(
        (r for r in out if r["event_type"] == "click"),
        key=lambda r: r["event_id"],
    )
    q = [round(p * 1000) for p in prices]
    deltas = [b - a for a, b in zip(q, q[1:])]
    expect = []
    for end in range(13, len(deltas)):
        window = deltas[end - 13 : end + 1]
        gain = sum(d for d in window if d > 0)
        loss = sum(-d for d in window if d < 0)
        rsi = 100.0 if loss == 0 else 100.0 - 100.0 / (1.0 + gain / loss)
        expect.append((gain, loss, rsi))
    assert len(clicks) == len(expect)
    for row, (gain, loss, rsi) in zip(clicks, expect):
        assert row["gain_q"] == gain and row["loss_q"] == loss
        _close(row["rsi"], rsi)
    views = [r for r in out if r["event_type"] == "view"]
    assert views and all(r["rsi"] == 100.0 for r in views)


# --- wave 8: deterministic Lloyd's k-means -----------------------------------


def test_kmeans_matches_python(spark, tmp_path):
    """Both engines unroll the SAME two Lloyd iterations, so a defect in
    the shared recursion (wrong init, wrong argmin tie-break, centroids
    from the wrong assignment) passes the gate. Replica: plain Python
    Lloyd's with id%8 init on float32-exact vectors (multiples of 0.25,
    well-separated clusters so the 1e-12 decimal centroid rounding can
    never flip an argmin)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vecs = {
        0: [0.0, 0.25, 0.0], 1: [0.25, 0.0, 0.0], 2: [0.0, 0.0, 0.25],
        3: [10.0, 10.25, 10.0], 4: [10.25, 10.0, 10.0],
        5: [10.0, 10.0, 10.25],
        6: [20.0, 20.5, 20.0], 7: [20.5, 20.0, 20.0],
        8: [20.0, 20.0, 20.5], 9: [0.25, 0.25, 0.0],
        10: [10.25, 10.25, 10.0], 11: [20.25, 20.25, 20.0],
    }
    table = pa.table(
        {
            "vec_id": pa.array(list(vecs), pa.int64()),
            "embedding": pa.array(
                list(vecs.values()), pa.list_(pa.float32())
            ),
            "label": pa.array([i % 3 for i in vecs], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    got = {
        r["vec_id"]: r.asDict()
        for r in QUERIES["q_kmeans"](spark, str(tmp_path)).collect()
    }

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    k = 8
    cid = {i: i % k for i in vecs}
    for _ in range(2):
        members = {}
        for i, c in cid.items():
            members.setdefault(c, []).append(i)
        cents = {
            c: [
                sum(vecs[i][d] for i in ids) / len(ids)
                for d in range(3)
            ]
            for c, ids in members.items()
        }
        new = {}
        for i, v in vecs.items():
            best = min(
                (
                    (dot(v, v) - 2.0 * dot(v, cv)) + dot(cv, cv),
                    c,
                )
                for c, cv in cents.items()
            )
            new[i] = (best[1], best[0])
        cid = {i: c for i, (c, _) in new.items()}
        d2 = {i: d for i, (_, d) in new.items()}
    assert set(got) == set(vecs)
    for i in vecs:
        assert got[i]["cluster_id"] == cid[i], i
        _close(got[i]["d2_r"], round(d2[i], 6), tol=1e-6)


# --- wave 9: unrolled Durbin-Levinson PACF ------------------------------------


def test_pacf_matches_python(spark, tmp_path):
    """phi11/phi22/phi33 from the textbook Durbin-Levinson recursion in
    Python, on hand-chosen daily counts (the closed-form unroll in the
    shared text must agree with the recursive formulation)."""
    counts = [4, 9, 2, 11, 6, 3, 8, 5, 10, 7]
    rows = []
    eid = 0
    for day, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append((eid, day, 0, "click", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_pacf"](spark, sf).collect()[0]
    n, s = len(counts), sum(counts)
    un = [n * x - s for x in counts]
    c0 = sum(u * u for u in un)
    c = [
        sum(un[t] * un[t + k] for t in range(n - k)) for k in (1, 2, 3)
    ]
    r1, r2, r3 = (ck / c0 for ck in c)
    # Durbin-Levinson, recursive form (independent of the unroll)
    phi11 = r1
    phi22 = (r2 - phi11 * r1) / (1.0 - phi11 * r1)
    phi21 = phi11 - phi22 * phi11
    phi33 = (r3 - phi21 * r2 - phi22 * r1) / (
        1.0 - phi21 * r1 - phi22 * r2
    )
    assert row["n_days"] == n
    _close(row["r1"], r1)
    _close(row["r2"], r2)
    _close(row["r3"], r3)
    _close(row["pacf1"], phi11)
    _close(row["pacf2"], phi22)
    _close(row["pacf3"], phi33)


# --- wave 10: attribution and risk selection ----------------------------------


def test_shapley_matches_python(spark, tmp_path):
    """Exact unanimity-decomposition Shapley credit: each converted
    user's touched-channel pattern P contributes 12//|P| to every
    member. Replica builds the patterns directly."""
    # user -> (converted?, touched channels)
    users = {
        1: (True, ["click"]),
        2: (True, ["click", "view"]),
        3: (True, ["click", "view", "cart"]),
        4: (True, []),                      # converts, credits nobody
        5: (False, ["view"]),               # not converted: excluded
    }
    rows = []
    eid = 0
    for uid, (conv, chans) in users.items():
        if conv:
            rows.append((eid, 1 + eid % 28, uid, "purchase", 1.0))
            eid += 1
        for ch in chans:
            rows.append((eid, 1 + eid % 28, uid, ch, 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["channel"]: r.asDict()
        for r in QUERIES["q_shapley"](spark, sf).collect()
    }
    credit = {}
    n_users = {}
    for uid, (conv, chans) in users.items():
        if not conv or not chans:
            continue
        for ch in chans:
            credit[ch] = credit.get(ch, 0) + 12 // len(chans)
            n_users[ch] = n_users.get(ch, 0) + 1
    assert set(got) == set(credit)
    for ch in credit:
        assert got[ch]["credit_x12"] == credit[ch]
        assert got[ch]["n_users"] == n_users[ch]
        _close(got[ch]["shapley_credit"], credit[ch] / 12.0)


def test_var_es_matches_python(spark, tmp_path):
    """Historical VaR/ES by ELEMENT selection: replica sorts the
    micro-quantized consecutive diffs, picks rank (n-1)*5//100 + 1,
    and averages the tail at-or-below that rank."""
    import random

    rng = random.Random(7)
    vals = [100.0]
    for _ in range(40):
        vals.append(round(vals[-1] + rng.uniform(-3, 3), 2))
    rows = [(i, 1, 0, "click", v) for i, v in enumerate(vals)]
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_var_es"](spark, sf).collect()[0]
    diffs = sorted(
        math.floor((b - a) * 1000000.0) for a, b in zip(vals, vals[1:])
    )
    n = len(diffs)
    var_rank = (n - 1) * 5 // 100 + 1
    var_q = diffs[var_rank - 1]
    es = sum(diffs[:var_rank]) / var_rank / 1000000.0
    assert row["n_returns"] == n
    _close(row["var95"], var_q / 1000000.0)
    _close(row["es95"], es)


# --- wave 11: interpolated percentile convention -------------------------------


def test_percentile_cont_matches_python(spark, tmp_path):
    """Spark `percentile` and DuckDB `quantile_cont` agree with each
    other by the gate — this pins BOTH to the textbook convention
    a[floor(p(n-1))] + frac*(a[next]-a[floor]) via a Python replica on
    one small group with genuinely interpolated values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    qtys = [3.0, 7.0, 1.0, 9.0, 4.0]        # one group (orderkey 97)
    prices = [110.5, 220.25, 330.75, 440.0, 550.125]
    table = pa.table(
        {
            "l_orderkey": pa.array([97] * 5, pa.int64()),
            "l_linenumber": pa.array(range(1, 6), pa.int32()),
            "l_quantity": pa.array(qtys, pa.float64()),
            "l_extendedprice": pa.array(prices, pa.float64()),
        }
    )
    pq.write_table(table, str(tmp_path / "lineitem.parquet"))
    row = QUERIES["q_percentile_cont"](spark, str(tmp_path)).collect()[0]

    def pcont(xs, p):
        a = sorted(xs)
        pos = p * (len(a) - 1)
        lo = math.floor(pos)
        frac = pos - lo
        hi = min(lo + 1, len(a) - 1)
        return a[lo] + frac * (a[hi] - a[lo])

    assert row["grp"] == 0
    _close(row["qty_q1"], pcont(qtys, 0.25))
    _close(row["qty_median"], pcont(qtys, 0.5))
    _close(row["qty_q3"], pcont(qtys, 0.75))
    _close(row["price_p905"], pcont(prices, 0.905))


# --- wave 12: Kaplan-Meier fixed-point recursion (round-8 driver-window key) --


def test_km_survival_matches_python(spark, tmp_path):
    """q_km_survival sits in the round-8 driver check window; replica
    re-derives the per-user time-to-purchase observations, the daily
    risk table, and the 1e12 fixed-point survival recursion
    s_q(t) = s_q(t-1)*(n_t - d_t) // n_t in plain Python ints."""
    # user -> list of (day, type); day 1..6 of Jan 2024
    journeys = {
        1: [(1, "click"), (3, "purchase"), (5, "click")],  # event tt=2
        2: [(1, "view"), (6, "view")],                      # censored tt=5
        3: [(2, "click"), (2, "purchase")],                 # event tt=0
        4: [(1, "view"), (4, "view")],                      # censored tt=3
        5: [(1, "click"), (3, "click"), (6, "purchase")],   # event tt=5
    }
    rows = []
    eid = 0
    for uid, evs in journeys.items():
        for day, et in evs:
            rows.append((eid, day, uid, et, 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["day"]: r.asDict()
        for r in QUERIES["q_km_survival"](spark, sf).collect()
    }
    obs = []
    for uid, evs in journeys.items():
        days = [d for d, _ in evs]
        p = [d for d, et in evs if et == "purchase"]
        d0, dl = min(days), max(days)
        if p:
            obs.append((min(p) - d0, 1))
        else:
            obs.append((dl - d0, 0))
    m = max(tt for tt, _ in obs)
    s_fp = 10**12
    sq = None
    at_risk_after = len(obs)
    expect = {}
    for day in range(0, m + 1):
        d_ev = sum(1 for tt, ev in obs if tt == day and ev == 1)
        c_cn = sum(1 for tt, ev in obs if tt == day and ev == 0)
        n_risk = sum(1 for tt, _ in obs if tt >= day)
        if day == 0:
            sq = (s_fp * (n_risk - d_ev)) // n_risk
        elif n_risk == 0:
            pass  # sq unchanged
        else:
            sq = (sq * (n_risk - d_ev)) // n_risk
        expect[day] = (n_risk, d_ev, c_cn, sq)
    assert set(got) == set(expect)
    for day, (n_risk, d_ev, c_cn, sq) in expect.items():
        assert got[day]["n_risk"] == n_risk, day
        assert got[day]["d_events"] == d_ev and got[day]["c_censored"] == c_cn
        assert got[day]["s_q"] == sq, day
        _close(got[day]["survival"], sq / s_fp)


# --- wave 13: split-conformal interval (round-8 driver-window key) ------------


def test_conformal_interval_matches_python(spark, tmp_path):
    """q_conformal_interval sits in the round-8 driver window; replica
    re-derives the train mean, the calibration quantile pick
    rank = min(ceil((n+1)*0.9), n) under the (r, event_id) order, and
    test coverage."""
    rows = []
    eid = 0
    vals = {0: [], 1: [], 2: []}
    import random

    rng = random.Random(11)
    for i in range(60):
        uid = i            # user_id % 3 cycles the three splits
        v = round(rng.uniform(10, 90), 2)
        vals[uid % 3].append((eid, v))
        rows.append((eid, 1 + i % 28, uid, "click", v))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = QUERIES["q_conformal_interval"](spark, sf).collect()[0]
    mu = sum(v for _, v in vals[0]) / len(vals[0])
    cal = sorted((abs(v - mu), e) for e, v in vals[1])
    n = len(cal)
    pick = min(math.ceil((n + 1) * 0.9), n)
    qhat = cal[pick - 1][0]
    covered = sum(1 for _, v in vals[2] if abs(v - mu) <= qhat)
    assert row["n_cal"] == n
    _close(row["qhat"], qhat)
    assert row["n_test"] == len(vals[2])
    assert row["n_covered"] == covered
    _close(row["coverage"], covered / len(vals[2]))
