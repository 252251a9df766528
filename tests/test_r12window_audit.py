"""Known-truth replicas for keys queued for the ROUND-12 driver window
(the round-6 remainder + round-7 additions): the six keys with no
existing replica test. Fixture-based brute-force expectations, with the
boundary branches pinned — 1-token documents (the concat_ws-vs-||
NULL divergence found and fixed during this pre-audit), exact
compaction-target prefixes, funnel windows at exactly +3600 s, and
purchase-anchor ties on (ts, event_id).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from big_data_streaming_spark.workload import QUERIES


def _write(tmp_path, name: str, cols: dict):
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


def _documents(tmp_path, texts, sources=None):
    sources = sources or ["web"] * len(texts)
    return _write(
        tmp_path,
        "documents",
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": sources,
            "n_chars": [len(t) for t in texts],
        },
    )


_BASE = datetime(2024, 1, 4, 0, 0, 0)  # UTC-midnight epoch day % 7 == 0


def _epoch(dt):
    return int(dt.replace(tzinfo=timezone.utc).timestamp())


def test_type_diversity_dist_matches_histogram(spark, tmp_path):
    plan = {1: ["click"], 2: ["click", "view"], 3: ["view"],
            4: ["click", "view", "purchase"], 5: ["click", "click"]}
    rows, eid = [], 0
    for uid, tys in plan.items():
        for ty in tys:
            eid += 1
            rows.append((eid, _BASE + timedelta(hours=eid), uid, ty, 1.0))
    d = _events(tmp_path, rows)
    got = {
        r["n_types"]: r["n_users"]
        for r in QUERIES["q_type_diversity_dist"](spark, d).collect()
    }
    # distinct-type counts: u1=1, u2=2, u3=1, u4=3, u5=1
    assert got == {1: 3, 2: 1, 3: 1}


def test_funnel_by_cohort_matches_window_semantics(spark, tmp_path):
    rows = [
        # user 1 (cohort week of _BASE): full funnel inside windows
        (1, _BASE + timedelta(hours=1), 1, "view", 1.0),
        (2, _BASE + timedelta(hours=1, minutes=30), 1, "click", 1.0),
        (3, _BASE + timedelta(hours=2), 1, "purchase", 1.0),
        # user 2: click at EXACTLY view + 3600 s (inclusive bound ->
        # qualifies), purchase at qc + 3601 s (exclusive -> step 3 no)
        (4, _BASE + timedelta(hours=3), 2, "view", 1.0),
        (5, _BASE + timedelta(hours=4), 2, "click", 1.0),
        (6, _BASE + timedelta(hours=5, seconds=1), 2, "purchase", 1.0),
        # user 3 (NEXT cohort week): view only
        (7, _BASE + timedelta(days=8), 3, "view", 1.0),
        # user 4: click BEFORE any view -> step 2 not reached
        (8, _BASE + timedelta(hours=6), 4, "click", 1.0),
        (9, _BASE + timedelta(hours=7), 4, "view", 1.0),
    ]
    d = _events(tmp_path, rows)
    got = {
        (r["cohort_week"], r["step"]): r["n_users"]
        for r in QUERIES["q_funnel_by_cohort"](spark, d).collect()
    }
    w0 = _epoch(_BASE) // 604800
    w1 = _epoch(_BASE + timedelta(days=8)) // 604800
    # week w0: step1 = users 1,2,4 (any view); step2 = 1,2; step3 = 1
    # week w1: step1 = user 3
    assert got == {
        (w0, 1): 3,
        (w0, 2): 2,
        (w0, 3): 1,
        (w1, 1): 1,
    }


def test_calendar_gaps_counts_empty_days(spark, tmp_path):
    base_day = _epoch(_BASE) // 86400
    # orders on relative days 0, 1, 5 and 35 — gaps inside and a jump
    # across the day//30 month-bucket boundary
    days = [0, 0, 1, 5, 35]
    d = _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": list(range(1, len(days) + 1)),
            "o_orderdate": [_BASE + timedelta(days=x) for x in days],
        },
    )
    got = {
        r["month_bucket"]: r
        for r in QUERIES["q_calendar_gaps"](spark, d).collect()
    }
    from collections import Counter

    per_day = Counter(base_day + x for x in days)
    lo, hi = min(per_day), max(per_day)
    exp = {}
    for day in range(lo, hi + 1):
        mb = day // 30
        n = per_day.get(day, 0)
        e = exp.setdefault(mb, [0, 0, 0])
        e[0] += 1
        e[1] += 1 if n == 0 else 0
        e[2] += n
    assert set(got) == set(exp)
    for mb, (nd, ne, no) in exp.items():
        assert got[mb]["n_days"] == nd
        assert got[mb]["n_empty_days"] == ne
        assert got[mb]["n_orders"] == no


def test_events_to_purchase_anchor_tie_break(spark, tmp_path):
    ts0 = _BASE + timedelta(hours=1)
    rows = [
        # user 1: two events before first purchase, one after; the
        # anchor TIES another event on ts — event_id breaks it
        (1, ts0, 1, "view", 1.0),
        (2, ts0 + timedelta(minutes=5), 1, "click", 1.0),
        (3, ts0 + timedelta(minutes=10), 1, "purchase", 1.0),  # anchor
        (4, ts0 + timedelta(minutes=10), 1, "view", 1.0),  # same ts, id>
        (5, ts0 + timedelta(minutes=20), 1, "purchase", 1.0),
        # user 2: purchase FIRST -> 0 before
        (6, ts0, 2, "purchase", 1.0),
        (7, ts0 + timedelta(minutes=1), 2, "view", 1.0),
        # user 3: never purchases -> excluded entirely
        (8, ts0, 3, "view", 1.0),
    ]
    d = _events(tmp_path, rows)
    got = {
        r["n_before"]: r["n_users"]
        for r in QUERIES["q_events_to_purchase"](spark, d).collect()
    }
    assert got == {2: 1, 0: 1}


def test_compaction_advisor_exact_target_boundaries(spark, tmp_path):
    # daily rows hit the 5000 target exactly: prefix-exclusive DIV
    # semantics -> day with prefix exactly 5000 STARTS group 1
    day_rows = [3000, 2000, 100, 4900, 1, 5000]
    rows, eid = [], 0
    for d_i, n in enumerate(day_rows):
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, _BASE + timedelta(days=d_i, hours=1), 1, "click", 1.0)
            )
    d = _events(tmp_path, rows)
    got = {
        r["group_id"]: r
        for r in QUERIES["q_compaction_advisor"](spark, d).collect()
    }
    base_day = _epoch(_BASE) // 86400
    # exclusive prefixes: 0, 3000, 5000, 5100, 10000, 10001
    # groups (prefix DIV 5000): d0,d1 -> 0; d2,d3 -> 1; d4,d5 -> 2
    exp = {
        0: (base_day + 0, base_day + 1, 2, 5000, 1),
        1: (base_day + 2, base_day + 3, 2, 5000, 1),
        2: (base_day + 4, base_day + 5, 2, 5001, 2),
    }
    assert set(got) == set(exp)
    for g, (df, dl, nd, nr, nf) in exp.items():
        r = got[g]
        assert (r["day_first"], r["day_last"]) == (df, dl)
        assert r["n_days"] == nd and r["n_rows"] == nr
        assert r["n_files_out"] == nf


def test_lead_bigram_boilerplate_excludes_single_token_docs(spark, tmp_path):
    texts = [
        "breaking news shared opening body one",
        "breaking news shared opening body two",
        "solo",  # 1 token — must NOT form an opening (pre-audit fix)
        "solo",  # even duplicated, 1-token docs never pair
        "unique start here",
        "cookie policy applies",
        "cookie policy applies again",
    ]
    sources = ["web", "blog", "web", "web", "web", "web", "forum"]
    d = _documents(tmp_path, texts, sources)
    got = {
        r["lead2"]: r
        for r in QUERIES["q_lead_bigram_boilerplate"](spark, d).collect()
    }
    assert set(got) == {"breaking news", "cookie policy"}
    assert got["breaking news"]["n_docs"] == 2
    assert got["breaking news"]["n_sources"] == 2
    assert got["breaking news"]["first_doc"] == 1
    assert got["cookie policy"]["n_docs"] == 2
    assert got["cookie policy"]["n_sources"] == 2
    assert got["cookie policy"]["first_doc"] == 6
