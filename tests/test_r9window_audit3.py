"""Known-truth replicas for round-9 driver-window keys, batch 3.

Highlight: the q_boot_diff replica below is the one that CAUGHT a real
shared-text defect while being written — the bootstrap weight
thresholds had been hand-derived with e rounded to 2.72
(1579032135 = 2^32/2.72) instead of the true Poisson(1) cumulative pmf
the docstring claims (and q_poisson_bootstrap correctly uses). Both
engines evaluated the same wrong constants, so the three-scale
differential gate was green throughout — exactly the KMV-constant
blind-spot class (ADVICE r7). The thresholds now come from the shared
_PB_* constants, re-derived here independently with math.exp.
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


def test_poisson_weight_thresholds_rederive_from_math_exp():
    """floor/round of cumulative Poisson(1) pmf x 2^32 — the constants
    q_poisson_bootstrap AND (since round 9) q_boot_diff share."""
    from big_data_streaming_spark.workload.analytics import (
        _PB_C0,
        _PB_C1,
        _PB_C2,
    )

    p0 = math.exp(-1.0)
    # within 1 of the true scaled cumulative (floor vs round ambiguity)
    assert abs(_PB_C0 - p0 * 2**32) <= 1.0, _PB_C0
    assert abs(_PB_C1 - 2 * p0 * 2**32) <= 1.0, _PB_C1
    assert abs(_PB_C2 - 2.5 * p0 * 2**32) <= 1.0, _PB_C2
    # and the OLD buggy constant is provably NOT the Poisson threshold
    assert abs(1579032135 - p0 * 2**32) > 900000


def test_boot_diff_matches_md5_replay_with_independent_thresholds(
    spark, sf_small
):
    rows = QUERIES["q_boot_diff"](spark, sf_small).collect()[0]
    df = _raw(
        sf_small,
        "events",
        "event_id, value, event_type",
        "value IS NOT NULL AND event_type IN ('click', 'view')",
    )
    # thresholds derived HERE from math.exp, not imported
    c0 = round(math.exp(-1.0) * 2**32)
    c1 = round(2 * math.exp(-1.0) * 2**32)
    c2 = round(2.5 * math.exp(-1.0) * 2**32)
    diffs = []
    for rep in range(32):
        sums = {1: 0.0, 0: 0.0}
        wts = {1: 0, 0: 0}
        for _, r in df.iterrows():
            h = int(
                hashlib.md5(f"{int(r['event_id'])}:{rep}".encode())
                .hexdigest()[:8],
                16,
            )
            wt = 0 if h < c0 else 1 if h < c1 else 2 if h < c2 else 3
            arm = 1 if r["event_type"] == "click" else 0
            sums[arm] += wt * r["value"]
            wts[arm] += wt
        diffs.append(sums[1] / wts[1] - sums[0] / wts[0])
    diffs.sort()
    assert rows["n_reps"] == 32
    _close(rows["boot_min"], diffs[0], tol=1e-9)
    _close(rows["boot_lo"], diffs[1], tol=1e-9)
    _close(rows["boot_hi"], diffs[30], tol=1e-9)
    _close(rows["boot_max"], diffs[31], tol=1e-9)


def test_keyness_matches_pearson_2x2_replica(spark, sf_small):
    got = QUERIES["q_keyness"](spark, sf_small).collect()
    docs = _raw(sf_small, "documents", "lang, text")
    tl = Counter()
    for _, r in docs.iterrows():
        for tok in r["text"].split(" "):
            tl[(tok, r["lang"])] += 1
    tw = Counter()
    lg = Counter()
    for (tok, lang), a in tl.items():
        tw[tok] += a
        lg[lang] += a
    nn = sum(tl.values())
    scored = []
    for (tok, lang), a in tl.items():
        if a < 5:
            continue
        b = tw[tok] - a
        c = lg[lang] - a
        d = nn - lg[lang] - b
        chi2 = (
            nn * (a * d - b * c) ** 2
            / ((a + b) * (c + d) * (a + c) * (b + d))
        )
        scored.append((lang, tok, a, chi2))
    want = []
    for lang in sorted({s[0] for s in scored}):
        per = sorted(
            (s for s in scored if s[0] == lang),
            key=lambda s: (-s[3], s[1]),
        )[:10]
        want.extend(
            (lang, tok, a, chi2, i + 1)
            for i, (_, tok, a, chi2) in enumerate(per)
        )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["lang"], g["token"], g["count_in_lang"], g["rank"]) == (
            w[0], w[1], w[2], w[4],
        )
        _close(g["chi2"], w[3], tol=1e-9)


def test_neyman_matches_stdev_allocation_replica(spark, sf_small):
    import statistics

    got = {
        r["event_type"]: r
        for r in QUERIES["q_neyman"](spark, sf_small).collect()
    }
    df = _raw(
        sf_small,
        "events",
        "event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c",
        "value IS NOT NULL",
    )
    ws = {}
    for ty, sub in df.groupby("event_type"):
        cents = list(sub["c"])
        sd = statistics.stdev(cents)
        ws[ty] = math.floor(len(cents) * sd * 1e6 + 0.5)
        _close(got[ty]["sd_value"], sd / 100.0, tol=1e-9)
        assert got[ty]["n_pop"] == len(cents)
    wsum = sum(ws.values())
    for ty, w in ws.items():
        assert got[ty]["w"] == w
        _close(got[ty]["alloc"], 1000.0 * w / wsum, tol=1e-9)
