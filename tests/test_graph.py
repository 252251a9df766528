"""Connected components + transitive-closure dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_streaming_spark.functions.graph import (
    connected_components,
    minhash_dedup_components,
)


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4, pair 10-11, singleton edge 20-20 (self loop)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)], ["src", "dst"]
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert cc[1] == cc[2] == cc[3] == cc[4] == 1
    assert cc[10] == cc[11] == 10
    assert cc[20] == 20


def test_connected_components_long_chain_converges(spark):
    n = 30  # diameter 30 > default-ish round counts — exercises iteration
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], ["src", "dst"])
    cc = connected_components(edges, max_iter=50).collect()
    assert {r["component"] for r in cc} == {0}
    assert len(cc) == n + 1


def test_minhash_dedup_components_merges_chains(spark):
    # A and B near-identical; B and C near-identical; A vs C more distant.
    base = [f"tok{i}" for i in range(40)]
    a = " ".join(base)
    b = " ".join(base[:36] + ["x1", "x2", "x3", "x4"])
    c = " ".join(base[:32] + ["x1", "x2", "x3", "x4", "y1", "y2", "y3", "y4"])
    other = " ".join(f"zzz{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (9, other)], ["doc_id", "text"]
    )
    res = {
        r["doc_id"]: r["component"]
        for r in minhash_dedup_components(df, "doc_id", "text", bands=8).collect()
    }
    # transitive closure: all three near-dups share one component
    assert res[1] == res[2] == res[3] == 1
    assert res[9] == 9


def test_components_subsume_one_hop_clusters(spark, sf_small):
    """Every one-hop cluster pair must also share a CC component (CC only
    merges further, never splits)."""
    from big_data_streaming_spark.functions.dedup import minhash_dedup_clusters
    from big_data_streaming_spark.sources.catalog import load_table

    docs = load_table(spark, sf_small, "documents").limit(200)
    one_hop = minhash_dedup_clusters(docs, "doc_id", "text", bands=4)
    cc = minhash_dedup_components(docs, "doc_id", "text", bands=4)
    joined = (
        one_hop.select("doc_id", F.col("cluster_rep").alias("hop_rep"))
        .join(cc.select("doc_id", "component"), "doc_id")
        .join(
            cc.select(
                F.col("doc_id").alias("hop_rep"),
                F.col("component").alias("rep_component"),
            ),
            "hop_rep",
        )
    )
    # doc and its one-hop representative must be in the same component
    assert joined.filter(F.col("component") != F.col("rep_component")).count() == 0


def test_cc_probe_cadence_halves_actions(spark, monkeypatch):
    """check_every=2 must produce identical components with at most half
    the convergence-probe actions of per-round checking."""
    from pyspark.sql import DataFrame

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["src", "dst"]
    )

    probes = {"n": 0}
    orig_count = DataFrame.count

    def counting(self):
        probes["n"] += 1
        return orig_count(self)

    monkeypatch.setattr(DataFrame, "count", counting)
    # per-round checking baseline
    res1 = connected_components(edges, check_every=1)
    rows1 = res1.toPandas()
    n1 = probes["n"]
    probes["n"] = 0
    res2 = connected_components(edges, check_every=2)
    rows2 = res2.toPandas()
    n2 = probes["n"]
    assert n2 <= (n1 + 1) // 2
    c1 = dict(zip(rows1["node"], rows1["component"]))
    c2 = dict(zip(rows2["node"], rows2["component"]))
    assert c1 == c2
    assert set(c1.values()) == {0}


def test_star_cc_matches_propagation(spark):
    from big_data_streaming_spark.functions.graph import connected_components_star

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)], ["src", "dst"]
    )
    cc = {
        r["node"]: r["component"]
        for r in connected_components_star(edges).collect()
    }
    assert cc[1] == cc[2] == cc[3] == cc[4] == 1
    assert cc[10] == cc[11] == 10
    assert cc[20] == 20


def test_star_cc_long_chain_in_log_rounds(spark):
    """A 64-hop chain needs ~64 propagation rounds but only O(log n)
    large-star/small-star rounds — count them via the checkpoint calls."""
    from pyspark.sql import DataFrame

    from big_data_streaming_spark.functions.graph import connected_components_star

    n = 64
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], ["src", "dst"])

    rounds = {"n": 0}
    orig = DataFrame.localCheckpoint

    def counting(self, *a, **kw):
        rounds["n"] += 1
        return orig(self, *a, **kw)

    import pytest

    mp = pytest.MonkeyPatch()
    mp.setattr(DataFrame, "localCheckpoint", counting)
    try:
        cc = connected_components_star(edges, max_iter=25).collect()
    finally:
        mp.undo()
    assert {r["component"] for r in cc} == {0}
    assert len(cc) == n + 1
    # 2 checkpoints per round + 1 initial; diameter/2 rounds would be 32+
    n_rounds = (rounds["n"] - 1) // 2
    assert n_rounds <= 10, n_rounds


def test_star_cc_agrees_with_propagation_on_random_graph(spark):
    import random

    from big_data_streaming_spark.functions.graph import connected_components_star

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iter=50).collect()
    }
    b = {
        r["node"]: r["component"]
        for r in connected_components_star(df).collect()
    }
    assert a == b


def test_dedup_components_star_algorithm_matches(spark):
    base = [f"tok{i}" for i in range(40)]
    a = " ".join(base)
    b = " ".join(base[:36] + ["x1", "x2", "x3", "x4"])
    c = " ".join(base[:32] + ["x1", "x2", "x3", "x4", "y1", "y2", "y3", "y4"])
    other = " ".join(f"zzz{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (9, other)], ["doc_id", "text"]
    )
    prop = {
        r["doc_id"]: r["component"]
        for r in minhash_dedup_components(df, "doc_id", "text", bands=8).collect()
    }
    star = {
        r["doc_id"]: r["component"]
        for r in minhash_dedup_components(
            df, "doc_id", "text", bands=8, algorithm="star"
        ).collect()
    }
    assert prop == star


def test_cc_both_algorithms_match_union_find_property(spark):
    """Property test: min-label propagation AND large-star/small-star
    produce identical components to a pure-Python union-find (third
    independent implementation) on randomized graphs — including chains,
    cycles, self-contained cliques and isolated pairs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from big_data_streaming_spark.functions.graph import (
        connected_components,
        connected_components_star,
    )

    def union_find(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    @settings(max_examples=8, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 14), st.integers(0, 14)),
            min_size=1,
            max_size=20,
        )
    )
    def check(edges):
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            return
        expect = union_find(edges)
        df = spark.createDataFrame(edges, "src long, dst long")
        for algo in (connected_components, connected_components_star):
            got = {r.node: r.component for r in algo(df).collect()}
            assert got == expect, (algo.__name__, edges, got, expect)

    check()


def test_bfs_hops_matches_python_bfs_property(spark):
    """Property test: bounded-frontier BFS agrees with a pure-Python BFS
    (hop-capped) on random directed graphs, including unreachable nodes
    and shortcut edges."""
    from collections import deque

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from big_data_streaming_spark.functions.graph import bfs_hops

    def py_bfs(edges, source, hops):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
        dist = {source: 0}
        dq = deque([source])
        while dq:
            u = dq.popleft()
            if dist[u] >= hops:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        return dist

    @settings(max_examples=8, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 9)),
            min_size=1,
            max_size=25,
        ),
        hops=st.integers(1, 3),
    )
    def check(edges, hops):
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.dist for r in bfs_hops(df, 0, hops).collect()}
        assert got == py_bfs(edges, 0, hops), (edges, hops, got)

    check()


def test_bellman_ford_matches_python_minplus_property(spark):
    """Property test: the bounded min-plus relaxation agrees with a
    pure-Python DP over paths of <= hops edges on random weighted
    graphs (parallel edges collapse to min weight upstream in real
    callers; here they exercise the fold directly)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from big_data_streaming_spark.functions.graph import bellman_ford_hops

    def py_minplus(edges, source, hops):
        dist = {source: 0}
        for _ in range(hops):
            nxt = dict(dist)
            for a, b, w in edges:
                if a in dist:
                    cand = dist[a] + w
                    if b not in nxt or cand < nxt[b]:
                        nxt[b] = cand
            dist = nxt
        return dist

    @settings(max_examples=8, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(0, 7), st.integers(0, 7), st.integers(1, 50)
            ),
            min_size=1,
            max_size=20,
            unique_by=lambda t: (t[0], t[1]),
        ),
        hops=st.integers(1, 3),
    )
    def check(edges, hops):
        df = spark.createDataFrame(edges, "src long, dst long, w long")
        got = {r.node: r.dist for r in bellman_ford_hops(df, 0, hops).collect()}
        assert got == py_minplus(edges, 0, hops), (edges, hops, got)

    check()


def test_resolve_entities_matches_python_pipeline_property(spark):
    """Property test: the full block→verify→merge operator agrees with a
    pure-Python blocking + levenshtein + union-find pipeline on random
    record sets (short digit-string names, random block assignments)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from big_data_streaming_spark.operators.entity_resolution import (
        resolve_entities,
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    def py_resolve(rows, maxd):
        parent = {i: i for i, _, _ in rows}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i, (ida, na, ba) in enumerate(rows):
            for idb, nb, bb in rows[i + 1 :]:
                if ba == bb and lev(na, nb) <= maxd:
                    ra, rb = find(ida), find(idb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        clusters = {i: find(i) for i, _, _ in rows}
        sizes = {}
        for c in clusters.values():
            sizes[c] = sizes.get(c, 0) + 1
        return {
            i: (c, sizes[c], i == c) for i, c in clusters.items()
        }

    @settings(max_examples=8, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.text(alphabet="0123", min_size=2, max_size=4),
                st.integers(0, 1),
            ),
            min_size=1,
            max_size=10,
        )
    )
    def check(rows):
        recs = [(i, name, blk) for i, (name, blk) in enumerate(rows)]
        df = spark.createDataFrame(recs, "rid long, name string, blk int")
        got = {
            r.rid: (r.cluster_id, r.cluster_size, r.is_canonical)
            for r in resolve_entities(
                df, id_col="rid", match_col="name", block_cols=["blk"],
                max_distance=1,
            ).collect()
        }
        assert got == py_resolve(recs, 1), (recs, got)

    check()


def test_min_label_cc_raises_on_exhausted_rounds(spark):
    """A round budget smaller than the graph diameter must FAIL LOUDLY,
    not return labels that simply stopped where propagation ran out —
    unconverged labels silently split components (the q_dbscan_grid
    development find). A 30-node path needs ~30 min-label rounds."""
    import pytest as _pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src bigint, dst bigint"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=5)
    # and with an adequate budget the same graph converges to min labels
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, max_iter=50).collect()
    }
    assert got == {i: 0 for i in range(31)}


def test_min_label_cc_rejects_nonpositive_budget(spark):
    """max_iter=0 used to return all-singleton labels silently — the
    fabricated-components output the non-convergence guard exists to
    prevent (ADVICE r7). Must raise instead."""
    import pytest as _pytest

    edges = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
    for bad in (0, -3):
        with _pytest.raises(ValueError, match="max_iter"):
            connected_components(edges, max_iter=bad)


def test_min_label_cc_converging_on_final_round_returns(spark):
    """Convergence landing EXACTLY on round max_iter must return correct
    labels, not raise (ADVICE r7): the in-loop probe compares against a
    snapshot up to check_every rounds stale, so the guard needs one
    extra propagation probe to tell 'converged on the last round' from
    'still moving'. Min-label moves one hop per round along a path, so
    a length-L path converges in exactly L rounds — pick max_iter == L
    with a stale probe cadence and assert labels come back."""
    # path 0-1-2-...-6: min label 0 reaches node 6 after 6 rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src bigint, dst bigint"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            edges, max_iter=6, check_every=4
        ).collect()
    }
    assert got == {i: 0 for i in range(7)}


def test_star_cc_raises_on_exhausted_rounds(spark):
    """connected_components_star must FAIL LOUDLY when the alternating-
    round budget runs out before the edge-multiset fixed point (ADVICE
    r9): unconverged star edges can hold multiple edges per node, so
    minhash_dedup_components' comp join would emit duplicate rows with
    fabricated component labels. Star rounds collapse a path roughly
    geometrically, so a long path with max_iter=1 cannot converge."""
    import pytest as _pytest

    from big_data_streaming_spark.functions.graph import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "src bigint, dst bigint"
    )
    with _pytest.raises(RuntimeError, match="fixed point"):
        connected_components_star(edges, max_iter=1)
    # adequate budget: same graph converges to the min label everywhere
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(edges, max_iter=25).collect()
    }
    assert got == {i: 0 for i in range(201)}
