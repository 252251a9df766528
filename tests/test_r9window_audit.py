"""Known-truth replicas for round-9 DRIVER-WINDOW keys.

The 50 keys in the round-9 correctness window (workload/__init__.py)
have never received a driver row, and the differential gate shares one
SQL text between both engines — a wrong constant or formula in that
shared text is invisible to it (the KMV-constant class, ADVICE r7).
Before the driver checks them, the formula-heaviest window keys get an
INDEPENDENT first-principles replica here: each statistic is recomputed
in plain Python (textbook formulas, float arithmetic, O(n^2) loops)
from the RAW sf0.001 parquet columns and compared with tolerance — no
shared text, no shared quantization, no shared identities.
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


def _raw(sf_dir: str, table: str, cols: str):
    con = duckdb.connect()
    return con.execute(
        f"SELECT {cols} FROM read_parquet('{sf_dir}/{table}.parquet')"
    ).fetch_df()


def _daily_counts(sf_dir: str):
    df = _raw(sf_dir, "events", "CAST(ts AS DATE) AS d")
    c = Counter(df["d"])
    return [c[d] for d in sorted(c)]


def test_ljung_box_matches_textbook_acf_formula(spark, sf_small):
    row = QUERIES["q_ljung_box"](spark, sf_small).collect()[0]
    x = _daily_counts(sf_small)
    n = len(x)
    xbar = sum(x) / n
    c0 = sum((v - xbar) ** 2 for v in x)
    q = 0.0
    for k in range(1, 6):
        ck = sum((x[t] - xbar) * (x[t + k] - xbar) for t in range(n - k))
        q += (ck / c0) ** 2 / (n - k)
    q *= n * (n + 2)
    assert row["n_days"] == n
    _close(row["q_stat"], q, tol=1e-9)


def test_sen_slope_matches_pairwise_median_replica(spark, sf_small):
    row = QUERIES["q_sen_slope"](spark, sf_small).collect()[0]
    x = _daily_counts(sf_small)
    slopes = sorted(
        (x[j] - x[i]) / (j - i)
        for i in range(len(x))
        for j in range(i + 1, len(x))
    )
    npairs = len(slopes)
    assert row["n_pairs"] == npairs
    # spec: element-selected lower-middle median and type-1 quartiles
    _close(row["sen_slope"], slopes[(npairs + 1) // 2 - 1])
    _close(row["slope_p25"], slopes[(npairs - 1) * 25 // 100])
    _close(row["slope_p75"], slopes[(npairs - 1) * 75 // 100])


def test_chao1_matches_spectrum_formula(spark, sf_small):
    row = QUERIES["q_chao1"](spark, sf_small).collect()[0]
    docs = _raw(sf_small, "documents", "text")
    freq = Counter()
    for text in docs["text"]:
        freq.update(text.split(" "))
    vocab = len(freq)
    n_tokens = sum(freq.values())
    n1 = sum(1 for v in freq.values() if v == 1)
    n2 = sum(1 for v in freq.values() if v == 2)
    assert (row["vocab"], row["n_tokens"], row["n1"], row["n2"]) == (
        vocab, n_tokens, n1, n2,
    )
    if n2 == 0:  # spec: NULL rather than a division by zero
        assert row["chao1_richness"] is None
    else:
        _close(row["chao1_richness"], vocab + n1 * n1 / (2.0 * n2))
    _close(row["unseen_mass"], n1 / n_tokens)
    assert n2 == 0, (
        "fixture grew doubletons — drop the synthetic branch below"
    )


def test_chao1_non_degenerate_branch_on_synthetic_spectrum(spark, tmp_path):
    """The driver fixtures have no doubletons (every synthetic token
    repeats heavily or is unique), so the Chao1 division never runs
    there — build a corpus with a KNOWN spectrum: f1 = 3 singletons,
    f2 = 2 doubletons, one common token."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "common common s1 d1",
        "common d1 s2 d2",
        "common d2 s3",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["a"] * 3, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    row = QUERIES["q_chao1"](spark, str(tmp_path)).collect()[0]
    # spectrum: common x4, d1 x2, d2 x2, s1/s2/s3 x1 -> V=6, N=11
    assert (row["vocab"], row["n_tokens"], row["n1"], row["n2"]) == (
        6, 11, 3, 2,
    )
    _close(row["chao1_richness"], 6 + 9 / 4.0)
    _close(row["unseen_mass"], 3 / 11.0)


def test_rbo_matches_textbook_truncated_sum(spark, sf_small):
    row = QUERIES["q_rbo"](spark, sf_small).collect()[0]
    docs = _raw(sf_small, "documents", "source, text")
    sa, sb = min(docs["source"]), max(docs["source"])

    def top20(src):
        freq = Counter()
        for _, r in docs[docs["source"] == src].iterrows():
            freq.update(r["text"].split(" "))
        ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        return {tok: i + 1 for i, (tok, _) in enumerate(ranked)}

    ra, rb = top20(sa), top20(sb)
    # RBO@20 with p = 1/2: sum_d (1-p) p^(d-1) X_d / d
    rbo = 0.0
    for d in range(1, 21):
        x_d = sum(
            1 for tok in ra if tok in rb and max(ra[tok], rb[tok]) <= d
        )
        rbo += x_d / (d * 2**d)
        if d == 20:
            overlap_k = x_d
    assert row["source_a"] == sa and row["source_b"] == sb
    assert row["overlap_at_k"] == overlap_k
    # per-term 1e-15 floor quantization -> within 20e-15 of the float sum
    _close(row["rbo"], rbo, tol=1e-9)


def test_variance_ratio_matches_lo_mackinlay_replica(spark, sf_small):
    import statistics

    row = QUERIES["q_variance_ratio"](spark, sf_small).collect()[0]
    df = _raw(
        sf_small,
        "events",
        "CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS didx",
    )
    c = Counter(df["didx"])
    d0 = min(c)
    days = sorted(c)
    blocks = Counter()
    members = Counter()
    for d in days:
        k = (d - d0) // 5
        blocks[k] += c[d]
        members[k] += 1
    bsums = [blocks[k] for k in sorted(blocks) if members[k] == 5]
    daily = [c[d] for d in days]
    vr = statistics.variance(bsums) / (5.0 * statistics.variance(daily))
    _close(row["vr5"] if "vr5" in row.asDict() else row[-1], vr, tol=1e-9)


def test_jonckheere_matches_pairwise_u_replica(spark, sf_small):
    row = QUERIES["q_jonckheere"](spark, sf_small).collect()[0]
    df = _raw(
        sf_small,
        "events",
        "CAST(EXTRACT(hour FROM ts) AS BIGINT) // 8 AS g,"
        " CAST(floor(value * 100 + 0.5) AS BIGINT) AS c",
    )
    df = df.dropna()
    groups = {g: list(sub["c"]) for g, sub in df.groupby("g")}
    jt = 0.0
    for lo, hi in ((0, 1), (0, 2), (1, 2)):
        for a in groups.get(lo, ()):
            for b in groups.get(hi, ()):
                jt += 1.0 if a < b else (0.5 if a == b else 0.0)
    sizes = [len(groups.get(g, ())) for g in (0, 1, 2)]
    n = sum(sizes)
    mu = sum(
        sizes[i] * sizes[j]
        for i in range(3)
        for j in range(i + 1, 3)
    ) / 2.0
    var = (
        n * n * (2 * n + 3) - sum(m * m * (2 * m + 3) for m in sizes)
    ) / 72.0
    assert row["jt2"] == round(2 * jt)
    _close(row["z"], (jt - mu) / math.sqrt(var), tol=1e-9)


def test_holt_winters_matches_float_recursion(spark, sf_small):
    rows = {
        r["t"]: r
        for r in QUERIES["q_holt_winters"](spark, sf_small).collect()
    }
    x = _daily_counts(sf_small)
    assert len(x) >= 8
    # float replica of additive HW, alpha = gamma = 1/2, beta = 1/4,
    # level init = first-week mean, trend 0, seasonal_i = x_i - level
    level = sum(x[:7]) / 7.0
    trend = 0.0
    season = [x[i] - level for i in range(7)]  # ring, index (t-1) % 7
    # anchor row t = 7
    _close(rows[7]["level"], level, tol=1e-4)
    _close(rows[7]["trend"], 0.0, tol=1e-4)
    _close(rows[7]["forecast_next"], level + trend + season[0], tol=1e-4)
    si = 0  # season[si] is the slot the NEXT observation consumes
    for t in range(8, len(x) + 1):
        xt = x[t - 1]
        s_old = season[si]
        new_level = 0.5 * (xt - s_old) + 0.5 * (level + trend)
        new_trend = 0.25 * (new_level - level) + 0.75 * trend
        season[si] = 0.5 * (xt - new_level) + 0.5 * s_old
        level, trend = new_level, new_trend
        si = (si + 1) % 7
        # fixed-point floors at 2^-20 accumulate over <= 31 steps
        _close(rows[t]["level"], level, tol=1e-4)
        _close(rows[t]["trend"], trend, tol=1e-4)
        _close(
            rows[t]["forecast_next"], level + trend + season[si], tol=1e-4
        )
