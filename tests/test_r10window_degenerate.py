"""Fixture-backed replicas for the 13 round-10-window keys that had no
known-truth test (VERDICT r9 task 4): the plain count/share/advisor
reshapes where the DuckDB differential was the full spec. Each test
feeds a tiny SYNTHETIC fixture — including the degenerate branches
(ties, single-cluster corpora, abstaining voters, constant series)
where shared-text parity historically breaks — and re-derives the
expected relation with brute-force Python.
"""

from __future__ import annotations

import math
from datetime import datetime

from big_data_streaming_spark.workload import QUERIES


def _write(tmp_path, name: str, cols: dict, types: dict | None = None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    types = types or {}
    arrays = {}
    for k, v in cols.items():
        if k in types:
            arrays[k] = pa.array(v, types[k])
        elif v and isinstance(v[0], datetime):
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
        types={"value": __import__("pyarrow").float64()},
    )


def _documents(tmp_path, texts):
    return _write(
        tmp_path,
        "documents",
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["web"] * len(texts),
            "n_chars": [len(t) for t in texts],
        },
    )


def test_pk_discovery_flags_dups_and_nulls(spark, tmp_path):
    import pyarrow as pa

    d = _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [10, 10, 11, 12],  # dup -> not a key
            "o_orderstatus": ["O", "F", "O", "F"],
            "o_totalprice": [100.0, None, 300.0, 400.0],  # null -> not key
            "o_orderdate": [datetime(2024, 1, i) for i in (1, 2, 3, 4)],
            "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"],
        },
        types={"o_totalprice": pa.float64()},
    )
    got = {
        r["column_name"]: r
        for r in QUERIES["q_pk_discovery"](spark, d).collect()
    }
    assert got["o_orderkey"]["is_key_candidate"] is True
    assert got["o_orderkey"]["n_distinct"] == 4
    assert got["o_custkey"]["is_key_candidate"] is False
    assert got["o_custkey"]["n_distinct"] == 3
    r = got["o_totalprice"]
    assert r["n_rows"] == 4 and r["n_nonnull"] == 3
    assert r["n_distinct"] == 3 and r["is_key_candidate"] is False
    assert got["o_orderpriority"]["is_key_candidate"] is True


def test_broadcast_advisor_matches_byte_model(spark, tmp_path):
    _write(tmp_path, "region", {"r_name": ["AMERICA", "ASIA"]})
    _write(tmp_path, "nation", {"n_name": ["FRANCE"]})
    _write(tmp_path, "supplier", {"s_name": ["Supplier#1", "S2"]})
    _write(
        tmp_path,
        "customer",
        {"c_name": ["Customer#1"], "c_mktsegment": ["BUILDING"]},
    )
    d = _write(
        tmp_path,
        "part",
        {
            "p_name": ["green thing", "x"],
            "p_brand": ["Brand#12", "Brand#3"],
            "p_type": ["SMALL", "LARGE POLISHED"],
        },
    )
    got = {
        r["table_name"]: r
        for r in QUERIES["q_broadcast_advisor"](spark, d).collect()
    }
    # model: 8 bytes * n_numeric_cols * rows + sum(len(str)) + 16/row/strcol
    exp = {
        "region": (2, 8 * 1 * 2 + (7 + 4) + 16 * 2),
        "nation": (1, 8 * 2 * 1 + 6 + 16),
        "supplier": (2, 8 * 3 * 2 + (10 + 2) + 16 * 2),
        "customer": (1, 8 * 3 * 1 + 10 + 16 + 8 + 16),
        "part": (
            2,
            8 * 3 * 2 + (11 + 1 + 16 * 2) + (8 + 7 + 16 * 2)
            + (5 + 14 + 16 * 2),
        ),
    }
    for name, (n, bytes_) in exp.items():
        assert got[name]["n_rows"] == n, name
        assert got[name]["est_bytes"] == bytes_, name
        assert got[name]["broadcastable"] is True  # all tiny


def test_value_patterns_signatures(spark, tmp_path):
    _write(
        tmp_path,
        "customer",
        {"c_name": ["Customer#000000001", "Customer#000000002", "weird9x"]},
    )
    d = _write(
        tmp_path,
        "part",
        {
            "p_brand": ["Brand#11", "Brand#2"],
            "p_type": ["STANDARD ANODIZED", "x1y"],
        },
    )
    got = {
        (r["column_name"], r["signature"]): r
        for r in QUERIES["q_value_patterns"](spark, d).collect()
    }
    r = got[("c_name", "Aa#9")]
    assert r["n_values"] == 2 and r["example"] == "Customer#000000001"
    assert got[("c_name", "a9a")]["n_values"] == 1
    assert got[("p_brand", "Aa#9")]["n_values"] == 2
    assert got[("p_type", "A A")]["n_values"] == 1
    assert got[("p_type", "a9a")]["n_values"] == 1


def test_sorted_neighborhood_matches_brute_force(spark, tmp_path):
    # names with TIES (tie-break by custkey) and balances around the
    # 100.00 closeness threshold, nations split
    recs = [
        # (custkey, name, nation, acctbal)
        (1, "alice", 0, 100.00),
        (2, "alice", 0, 199.99),  # name tie with 1; |bal diff| < 100
        (3, "bob", 1, 200.01),  # vs 2: nation differs, diff 0.02 close
        (4, "carol", 1, 500.00),
        (5, "dave", 0, 600.00),  # vs 4: diff exactly 100.00 -> close
    ]
    d = _write(
        tmp_path,
        "customer",
        {
            "c_custkey": [r[0] for r in recs],
            "c_name": [r[1] for r in recs],
            "c_nationkey": [r[2] for r in recs],
            "c_acctbal": [r[3] for r in recs],
        },
    )
    rows = QUERIES["q_sorted_neighborhood"](spark, d).collect()
    got = {(r["key_a"], r["key_b"]): r for r in rows}
    order = sorted(recs, key=lambda r: (r[1], r[0]))
    exp = {}
    for gap in (1, 2):
        for i in range(len(order) - gap):
            a, b = order[i], order[i + gap]
            same_nation = 1 if a[2] == b[2] else 0
            bal_close = (
                1
                if abs(
                    math.floor(a[3] * 100.0) - math.floor(b[3] * 100.0)
                )
                <= 10000
                else 0
            )
            if same_nation + bal_close >= 1:
                exp[(a[0], b[0])] = (gap, same_nation, bal_close)
    assert set(got) == set(exp)
    for k, (gap, sn, bc) in exp.items():
        assert got[k]["rank_gap"] == gap
        assert got[k]["same_nation"] == sn
        assert got[k]["bal_close"] == bc
        assert got[k]["match_score"] == sn + bc


def test_dict_advisor_matches_byte_model(spark, tmp_path):
    # degenerate: single distinct value in l_returnflag (NDV=1)
    _write(
        tmp_path,
        "customer",
        {"c_mktsegment": ["BUILDING", "BUILDING", "AUTOMOBILE"]},
    )
    _write(
        tmp_path,
        "part",
        {"p_brand": ["Brand#1", "Brand#2"], "p_type": ["SMALL", "SMALL"]},
    )
    _write(tmp_path, "orders", {"o_orderpriority": ["1-URGENT"]})
    d = _write(
        tmp_path, "lineitem", {"l_returnflag": ["N", "N", "N", "N"]}
    )
    got = {
        r["column_name"]: r
        for r in QUERIES["q_dict_advisor"](spark, d).collect()
    }
    r = got["lineitem.l_returnflag"]
    assert r["n_rows"] == 4 and r["ndv"] == 1
    assert r["raw_bytes"] == 4
    assert r["dict_bytes"] == 1 + 4 * 1  # dict chars + 1-byte codes
    assert r["dict_wins"] is False  # 5 < 4 is false
    r = got["customer.c_mktsegment"]
    assert r["ndv"] == 2 and r["raw_bytes"] == 8 + 8 + 10
    assert r["dict_bytes"] == 18 + 3 * 1
    assert r["dict_wins"] is True


def test_joinsize_estimator_matches_brute_force(spark, tmp_path):
    sup_nk = [0, 0, 1, 2]
    cus_nk = [0, 1, 1, 1, 3]
    okeys = [1, 2, 3]
    lkeys = [1, 1, 2, 2, 2, 3]
    _write(tmp_path, "supplier", {"s_nationkey": sup_nk})
    _write(tmp_path, "customer", {"c_nationkey": cus_nk})
    _write(tmp_path, "orders", {"o_orderkey": okeys})
    d = _write(tmp_path, "lineitem", {"l_orderkey": lkeys})
    got = {
        r["join_edge"]: r
        for r in QUERIES["q_joinsize_estimator"](spark, d).collect()
    }

    def brute(a, b):
        from collections import Counter

        ca, cb = Counter(a), Counter(b)
        exact = sum(ca[k] * cb[k] for k in ca if k in cb)
        est = len(a) * len(b) // max(len(ca), len(cb))
        return len(a), len(ca), len(b), len(cb), est, exact

    for edge, (a, b) in {
        "supplier*customer": (sup_nk, cus_nk),
        "orders*lineitem": (okeys, lkeys),
    }.items():
        na, da, nb, db, est, exact = brute(a, b)
        r = got[edge]
        assert (r["left_rows"], r["left_ndv"]) == (na, da)
        assert (r["right_rows"], r["right_ndv"]) == (nb, db)
        assert r["est_rows"] == est and r["exact_rows"] == exact
        assert abs(r["est_over_exact"] - est / exact) < 1e-12


def test_join_skew_advisor_matches_brute_force(spark, tmp_path):
    # one hot key: order 1 has 6 lineitems, others 1
    okeys = [1, 2, 3, 4]
    lkeys = [1] * 6 + [2, 3, 4]
    _write(tmp_path, "orders", {"o_orderkey": okeys})
    _write(tmp_path, "lineitem", {"l_orderkey": lkeys})
    _write(tmp_path, "customer", {"c_nationkey": [0, 0, 1]})
    d = _write(tmp_path, "supplier", {"s_nationkey": [0, 1, 1]})
    got = {
        r["join_edge"]: r
        for r in QUERIES["q_join_skew_advisor"](spark, d).collect()
    }
    r = got["orders*lineitem"]
    # per-key join rows: {1:6, 2:1, 3:1, 4:1}
    assert r["n_keys"] == 4 and r["join_rows"] == 9
    assert r["top_key"] == 1 and r["top_rows"] == 6
    assert abs(r["top_share"] - 6 / 9) < 1e-12
    assert r["salt_factor"] == math.ceil(6 * 4 / 9)
    assert r["salt_recommended"] is bool(6 * 4 > 4 * 9)
    r = got["customer*supplier"]
    # nation 0: 2*1=2, nation 1: 1*2=2 -> tie broken by key value -> 0
    assert r["n_keys"] == 2 and r["join_rows"] == 4
    assert r["top_key"] == 0 and r["top_rows"] == 2
    assert r["salt_factor"] == 1 and r["salt_recommended"] is False


def test_stream_imr_constant_series_degenerate(spark, tmp_path):
    # 8 identical values -> every batch mean equal, mr_bar = 0,
    # ucl = lcl = center, nothing out of control
    rows = [
        (i + 1, datetime(2024, 1, 5, 10, 0, 0), 1, "click", 7.5)
        for i in range(8)
    ]
    d = _events(tmp_path, rows)
    out = QUERIES["q_stream_imr"](spark, d).collect()
    assert len(out) == 4  # 4 micro-batches of 2 rows each
    for r in out:
        assert r["n_events"] == 2
        assert abs(r["batch_mean"] - 7.5) < 1e-12
        assert abs(r["center"] - 7.5) < 1e-12
        assert abs(r["ucl"] - 7.5) < 1e-12
        assert abs(r["lcl"] - 7.5) < 1e-12
        assert r["out_of_control"] is False
    assert [r["batch_key"] for r in out] == [1, 3, 5, 7]


def test_stream_imr_matches_slice_replica(spark, tmp_path):
    vals = [1.0, 3.0, 2.0, 8.0, 9.0, 7.0, 2.5, 3.5]
    rows = [
        (i + 1, datetime(2024, 1, 5, 10, 0, 0), 1, "click", v)
        for i, v in enumerate(vals)
    ]
    d = _events(tmp_path, rows)
    out = sorted(
        QUERIES["q_stream_imr"](spark, d).collect(),
        key=lambda r: r["batch_key"],
    )
    # replay the contiguous slicing: parts of ceil(8/4) = 2 rows
    means = []
    for p in range(4):
        sl = vals[2 * p : 2 * p + 2]
        qsum = sum(math.floor(v * 1e6) for v in sl)
        means.append(qsum / len(sl) / 1e6)
    qmeans = [math.floor(m * 1e6) for m in means]
    qmrs = [
        math.floor(abs(b - a) * 1e6) for a, b in zip(means, means[1:])
    ]
    center = sum(qmeans) / 4 / 1e6
    mr_bar = sum(qmrs) / 3 / 1e6
    for r, m in zip(out, means):
        assert abs(r["batch_mean"] - m) < 1e-12
        assert abs(r["center"] - center) < 1e-12
        assert abs(r["ucl"] - (center + 2.66 * mr_bar)) < 1e-9
        expected_ooc = m > center + 2.66 * mr_bar or m < center - 2.66 * mr_bar
        assert r["out_of_control"] is expected_ooc


def test_state_size_advisor_matches_brute_force(spark, tmp_path):
    # hours 0, 5, 23 and two types; frontier hour = 23
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 1, "click", 1.0),
        (2, datetime(2024, 1, 1, 5, 0, 0), 1, "click", 1.0),
        (3, datetime(2024, 1, 1, 5, 0, 0), 1, "view", 1.0),
        (4, datetime(2024, 1, 1, 23, 0, 0), 1, "view", 1.0),
        (5, datetime(2024, 1, 1, 23, 0, 0), 1, "view", 2.0),  # dup key
    ]
    d = _events(tmp_path, rows)
    got = {
        r["watermark_hours"]: r
        for r in QUERIES["q_state_size_advisor"](spark, d).collect()
    }
    # distinct (hr, type): (0,click),(5,click),(5,view),(23,view); frontier 23
    # horizon 1: hr > 22 -> 1 key; 6: hr > 17 -> 1; 24: hr > -1 -> 4
    exp = {1: 1, 6: 1, 24: 4}
    assert set(got) == set(exp)
    for h, keys in exp.items():
        assert got[h]["live_keys"] == keys
        assert got[h]["est_state_bytes"] == keys * 64
        assert got[h]["fits_64mb"] is True


def test_payload_histogram_matches_ord_bins(spark, tmp_path):
    texts = ["ab A1", "zzzz"]
    d = _documents(tmp_path, texts)
    rows = QUERIES["q_payload_histogram"](spark, d).collect()
    got = {(r["doc_id"], r["bin"]): r["n_bytes"] for r in rows}
    exp = {}
    for doc_id, text in enumerate(texts, start=1):
        for ch in text:
            b = ord(ch) // 16
            exp[(doc_id, b)] = exp.get((doc_id, b), 0) + 1
    assert got == exp


def test_weak_labels_covers_votes_ties_and_abstains(spark, tmp_path):
    # doc 1: long, diverse, non-repetitive -> all three vote 1
    t1 = " ".join(f"w{i:03d}" for i in range(40))  # 40 distinct tokens
    # doc 2: short and repetitive -> lf_length 0, diversity 0, repetition 0
    t2 = "x x x x x x x x x x"
    # doc 3: mid-length (abstain on length), diversity ratio 0.5
    # (abstain), top share 0.5 (vote 0) -> one vote, majority 0
    t3 = " ".join(["a a b c"] * 1) + " " + "a " * 0 + "d d e f"
    texts = [t1, t2, t3]
    d = _documents(tmp_path, texts)
    got = {
        r["doc_id"]: r for r in QUERIES["q_weak_labels"](spark, d).collect()
    }

    def replica(text, n_chars):
        toks = text.split(" ")
        from collections import Counter

        c = Counter(toks)
        n_tok, n_dis, top = len(toks), len(c), max(c.values())
        lf1 = 1 if n_chars >= 200 else (0 if n_chars < 80 else None)
        lf2 = (
            1
            if n_dis * 100 >= 55 * n_tok
            else (0 if n_dis * 100 <= 35 * n_tok else None)
        )
        lf3 = (
            1
            if top * 100 <= 8 * n_tok
            else (0 if top * 100 >= 20 * n_tok else None)
        )
        votes = [v for v in (lf1, lf2, lf3) if v is not None]
        pos = sum(votes)
        lab = (
            1
            if 2 * pos > len(votes)
            else (0 if 2 * pos < len(votes) else None)
        )
        return lf1, lf2, lf3, pos, len(votes), lab

    for doc_id, text in enumerate(texts, start=1):
        lf1, lf2, lf3, pos, nv, lab = replica(text, len(text))
        r = got[doc_id]
        assert r["lf_length"] == lf1, doc_id
        assert r["lf_diversity"] == lf2, doc_id
        assert r["lf_repetition"] == lf3, doc_id
        assert r["n_pos"] == pos and r["n_votes"] == nv
        assert r["weak_label"] == lab, doc_id


def test_weak_labels_tie_yields_null(spark, tmp_path):
    # engineered 2-vote tie: length says 1 (>=200 chars), repetition
    # says 0 (top share >= 0.2), diversity abstains (ratio between
    # 0.35 and 0.55): 24 tokens, 12 distinct (ratio 0.5), top count 12
    # (share 0.5) -> votes (1, None, 0), majority tie -> NULL
    filler = " ".join(f"t{i}xxxxxx" for i in range(11))
    text = ("q " * 12).strip() + " " + filler
    text += "z" * max(0, 200 - len(text))  # pad last token to 200+ chars
    d = _documents(tmp_path, [text])
    r = QUERIES["q_weak_labels"](spark, d).collect()[0]
    assert r["lf_length"] == 1
    assert r["lf_diversity"] is None
    assert r["lf_repetition"] == 0
    assert r["n_votes"] == 2 and r["n_pos"] == 1
    assert r["weak_label"] is None


def test_freshness_audit_matches_day_arithmetic(spark, tmp_path):
    _events(
        tmp_path,
        [(1, datetime(2024, 3, 31, 23, 0, 0), 1, "click", 1.0)],
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": [1],
            "o_orderdate": [datetime(2024, 3, 1, 0, 0, 0)],
        },
    )
    d = _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": [1, 2],
            "l_shipdate": [
                datetime(2024, 2, 15, 12, 0, 0),
                datetime(2024, 1, 10, 0, 0, 0),
            ],
        },
    )
    got = {
        r["table_name"]: r
        for r in QUERIES["q_freshness_audit"](spark, d).collect()
    }
    day = lambda dt: int(dt.timestamp() // 86400)  # noqa: E731
    ev, od, ls = (
        day(datetime(2024, 3, 31, 23)),
        day(datetime(2024, 3, 1)),
        day(datetime(2024, 2, 15, 12)),
    )
    frontier = max(ev, od, ls)
    assert got["events"]["max_day"] == ev
    assert got["orders"]["max_day"] == od
    assert got["lineitem"]["max_day"] == ls
    for name, md, n in (("events", ev, 1), ("orders", od, 1), ("lineitem", ls, 2)):
        r = got[name]
        assert r["n_rows"] == n
        assert r["frontier_day"] == frontier
        assert r["staleness_days"] == frontier - md
        assert r["fresh_within_30d"] is bool(frontier - md <= 30)


def test_dup_size_dist_single_cluster_degenerate(spark, tmp_path):
    # all docs share one 32-char prefix -> one cluster of size 4
    base = "x" * 32
    d = _documents(
        tmp_path, [base + "a", base + "b", base + "c", base + "d"]
    )
    r = QUERIES["q_dup_size_dist"](spark, d).collect()
    assert len(r) == 1
    row = r[0]
    assert row["cluster_size"] == 4 and row["n_clusters"] == 1
    assert row["n_docs"] == 4 and row["n_removable"] == 3


def test_dup_size_dist_matches_histogram(spark, tmp_path):
    texts = (
        ["p1" + "a" * 30 + "tail1", "p1" + "a" * 30 + "tail2"]  # size 2
        + ["q" * 40]  # singleton
        + ["r2" + "b" * 30 + str(i) for i in range(3)]  # size 3
    )
    d = _documents(tmp_path, texts)
    got = {
        r["cluster_size"]: r
        for r in QUERIES["q_dup_size_dist"](spark, d).collect()
    }
    assert got[1]["n_clusters"] == 1 and got[1]["n_removable"] == 0
    assert got[2]["n_clusters"] == 1 and got[2]["n_docs"] == 2
    assert got[3]["n_clusters"] == 1 and got[3]["n_removable"] == 2
