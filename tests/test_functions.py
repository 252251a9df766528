"""Unit + property tests for the functions layer (SURVEY.md §5.5):
dedup idempotence/determinism, similarity recall sanity, multimodal
mapInPandas plumbing, epoch round-trips."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_streaming_spark.functions.dedup import (
    dedup_keep_first,
    minhash_dedup_clusters,
    minhash_lsh_pairs,
    minhash_signature,
)
from big_data_streaming_spark.functions.multimodal import (
    decode_media,
    sample_frames,
    with_media_struct,
)
from big_data_streaming_spark.functions.similarity import cosine_topk, ivf_topk
from big_data_streaming_spark.sources.catalog import load_table


# --------------------------------------------------------------------- dedup
def test_dedup_keep_first_idempotent(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    once = dedup_keep_first(docs, key="text", order_col="doc_id")
    twice = dedup_keep_first(once, key="text", order_col="doc_id")
    assert once.count() == twice.count()
    assert once.count() == docs.select("text").distinct().count()


def test_minhash_deterministic_across_runs(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").limit(50)
    sig = docs.select(
        "doc_id", minhash_signature(F.split("text", " "), 16).alias("s")
    )
    a = sorted(map(str, sig.collect()))
    b = sorted(map(str, sig.collect()))
    assert a == b


def test_minhash_families_are_independent(spark):
    """Regression for the transform-lambda-arity bug: all signature slots
    equal would mean the families collapsed into one."""
    df = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta eta theta",)], ["text"]
    )
    sig = df.select(minhash_signature(F.split("text", " "), 16).alias("s")).first()["s"]
    assert len(set(sig)) > 8, sig


def test_identical_docs_share_cluster(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "completely different text about spark engines and shuffles"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    res = {
        r["doc_id"]: (r["cluster_rep"], r["is_dup"])
        for r in minhash_dedup_clusters(df, "doc_id", "text").collect()
    }
    assert res[1] == (1, False)
    assert res[2] == (1, True)
    assert res[3][0] == 3


def test_lsh_pairs_find_planted_near_dup(spark):
    base = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (1, base),
        (2, base + " thirteen"),  # jaccard 12/13 ≈ 0.92
        (3, "totally unrelated words nothing shared here at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", num_hashes=32, bands=8, jaccard_threshold=0.8
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


# ---------------------------------------------------------------- similarity
def test_cosine_topk_matches_numpy_ground_truth(spark, sf_small):
    """Exact brute-force top-k must agree with an independent numpy
    computation (note: the fixture's nearest neighbors do NOT reliably
    share cluster labels — sims top out ~0.33 across labels — so ground
    truth, not label recall, is the checkable property)."""
    import numpy as np

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    got = {
        (r["q_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(emb, queries, k=5).collect()
    }

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    V = np.vstack(pdf["embedding"].values).astype(np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    for qi in range(3):
        sims = Vn @ Vn[qi]
        order = [i for i in np.argsort(-sims) if i != qi][:5]
        for rank, idx in enumerate(order, start=1):
            assert got[(qi, rank)] == int(pdf.vec_id[idx])


def test_ivf_matches_brute_force_at_high_nprobe(spark, sf_small):
    """With nprobe = all clusters, IVF must equal brute force exactly."""
    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    n_clusters = emb.select("label").distinct().count()
    brute = {
        (r["q_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(emb, queries, k=3).collect()
    }
    ivf = {
        (r["q_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk(emb, queries, k=3, nprobe=n_clusters).collect()
    }
    assert brute == ivf


# ---------------------------------------------------------------- multimodal
def test_media_struct_shape(spark, sf_small):
    docs = with_media_struct(load_table(spark, sf_small, "documents"))
    row = docs.select("media").first()["media"]
    assert row["mime"] == "text/plain"
    assert row["uri"].startswith("s3://corpus/")
    assert row["nbytes"] == len(row["payload"])
    assert set(row["meta"].keys()) == {"lang", "source"}


def test_decode_media_fake_kernel(spark, sf_small):
    docs = with_media_struct(load_table(spark, sf_small, "documents")).limit(20)
    feats = decode_media(docs, fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["feature_vec"]) == 4
        assert r["feature_vec"][0] == float(r["n_bytes"])


def test_decode_media_stub_raises(spark, sf_small):
    docs = with_media_struct(load_table(spark, sf_small, "documents")).limit(2)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_media(docs, fake=False).collect()


def test_sample_frames_plumbing(spark, sf_small):
    every_n = 2
    docs = with_media_struct(load_table(spark, sf_small, "documents")).limit(5)
    frames = sample_frames(docs, every_n=every_n)
    assert frames.columns == ["doc_id", "uri", "frame_idx", "frame_no"]
    # exact per-doc contract: floor(nbytes / (64*every_n)) frame rows,
    # zero rows (not one) when the payload is too small for a single frame
    expected = {
        r["doc_id"]: int(r["nbytes"]) // (64 * every_n)
        for r in docs.select("doc_id", "media.nbytes").collect()
    }
    got = {
        r["doc_id"]: r["n"]
        for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    for doc_id, n_frames in expected.items():
        assert got.get(doc_id, 0) == n_frames, (doc_id, n_frames, got)
    assert sum(expected.values()) > 0, "fixture docs all too small to sample"


def test_sample_frames_empty_payload_yields_no_rows(spark):
    docs = spark.createDataFrame(
        [(1, "", "en", "fixture")], ["doc_id", "text", "lang", "source"]
    )
    frames = sample_frames(with_media_struct(docs), every_n=1)
    assert frames.count() == 0


# ------------------------------------------------------------- property-based
@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**53 - 1), min_size=1, max_size=8))
def test_epoch_ms_roundtrip_property(spark, ms_values):
    """A5 property: epoch-ms → timestamp → epoch-ms is the identity."""
    df = spark.createDataFrame([(v,) for v in ms_values], ["ms"])
    out = df.select(
        "ms", F.unix_millis(F.timestamp_millis("ms")).alias("back")
    ).collect()
    for r in out:
        assert r["ms"] == r["back"]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdefg ", min_size=0, max_size=30),
        min_size=1,
        max_size=5,
    )
)
def test_try_cast_never_throws_property(spark, texts):
    """A24 property: try_cast returns null-or-value, never raises."""
    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    res = df.select(F.col("s").try_cast("double").alias("d")).collect()
    assert len(res) == len(texts)


def test_cusum_terminal_identity(spark):
    """The CUSUM algebra check the shared-text oracle cannot provide:
    at t = n, cusum = sum(x) - n*mean == 0 exactly (all-integer
    arithmetic), and an interior value matches a hand computation."""
    from big_data_streaming_spark.workload import QUERIES

    rows = sorted(
        QUERIES["q_cusum"](spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["day"],
    )
    assert rows[-1]["cusum"] == 0.0
    # interior identity: cusum_t == sum_{i<=t} total_i - t * mean(total)
    totals = [r["total"] for r in rows]
    mean = sum(totals) / len(totals)
    t_idx = len(rows) // 2
    expect = sum(totals[: t_idx + 1]) - (t_idx + 1) * mean
    assert abs(rows[t_idx]["cusum"] - expect) < 1e-6


def test_merge_intervals_matches_python_sweep_property(spark):
    """Property test: merge_intervals agrees with a pure-Python sweep on
    random per-key interval sets — islands, bridges, exact-touch merges,
    duplicates, containment."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from big_data_streaming_spark.operators.intervals import merge_intervals

    def sweep(ivs):
        out = []
        for s, e in sorted(ivs):
            if out and s <= out[-1][1]:
                out[-1][1] = max(out[-1][1], e)
                out[-1][2] += 1
            else:
                out.append([s, e, 1])
        return [tuple(x) for x in out]

    @settings(max_examples=10, deadline=None)
    @given(
        ivs=st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 20)),
            min_size=1,
            max_size=18,
        )
    )
    def check(ivs):
        rows = [(k, s, s + d) for k, s, d in ivs]
        df = spark.createDataFrame(rows, "k int, s long, e long")
        got = {}
        for r in merge_intervals(df, keys=["k"]).collect():
            got.setdefault(r.k, []).append(
                (r.interval_start, r.interval_end, r.n_events)
            )
        for k in got:
            got[k].sort()
        expect = {}
        for k, s, d in ivs:
            expect.setdefault(k, []).append((s, s + d))
        expect = {k: sweep(v) for k, v in expect.items()}
        assert got == expect, (rows, got, expect)

    check()


def test_label_sessions_matches_python_labeler_property(spark):
    """Property test: row-level session labels agree with a pure-Python
    gaps-and-islands labeler on random per-key µs timestamp layouts
    (strict-gap split semantics, ties broken by the order column)."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from big_data_streaming_spark.operators.intervals import label_sessions

    base = dt.datetime(2024, 1, 1)
    GAP = 1_000  # µs

    @settings(max_examples=10, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 20_000)),
            min_size=1,
            max_size=15,
            unique=True,
        )
    )
    def check(rows):
        data = [
            (i, k, base + dt.timedelta(microseconds=us))
            for i, (k, us) in enumerate(rows)
        ]
        df = spark.createDataFrame(data, "rid int, k int, ts timestamp")
        got = {
            r.rid: (r.session_seq, r.is_session_start)
            for r in label_sessions(
                df, keys=["k"], gap_us=GAP, order_cols=["rid"]
            ).collect()
        }
        expect = {}
        by_key = {}
        for i, (k, us) in enumerate(rows):
            by_key.setdefault(k, []).append((us, i))
        for k, evts in by_key.items():
            evts.sort()
            seq, prev = 0, None
            for us, i in evts:
                if prev is None or us - prev > GAP:
                    seq += 1
                    expect[i] = (seq, 1)
                else:
                    expect[i] = (seq, 0)
                prev = us
        assert got == expect, (rows, got, expect)

    check()


def test_prefix_filter_candidates_complete_and_pruning(spark):
    """PPJoin prefix filter (SCALE.md tightening for q_containment):
    (a) COMPLETE — every pair with overlap >= ceil(theta*min(n_a,n_b))
    survives, checked against a brute-force python oracle; (b) PRUNES —
    on a fixture where 20 docs share two locally-hot boilerplate tokens
    (df=20, inside q_containment's rare band) but are otherwise
    disjoint, the naive shared-token channel yields C(20,2)=190
    candidates while the prefix channel yields only the one genuinely
    half-overlapping pair (hot tokens sort to the end of the canonical
    df-ascending order, so they fall out of every prefix)."""
    import itertools
    import math

    from pyspark.sql import functions as F

    from big_data_streaming_spark.functions.dedup import (
        prefix_filter_candidates,
    )

    docs = []
    for i in range(20):
        uniq = [f"u{i}_{j}" for j in range(10)]
        docs.append((i, uniq + ["boilA", "boilB"]))
    # one genuine near-duplicate pair: doc 100 ⊂-ish doc 101
    shared = [f"s{j}" for j in range(8)]
    docs.append((100, shared + ["x1", "x2", "boilA", "boilB"]))
    docs.append((101, shared + ["y1", "y2", "y3", "boilA"]))

    sets = spark.createDataFrame(docs, "doc_id long, toks array<string>")
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_filter_candidates(sets, "doc_id", "toks", 0.5).collect()
    }

    by_id = dict(docs)
    required = set()
    for a, b in itertools.combinations(sorted(by_id), 2):
        ta, tb = set(by_id[a]), set(by_id[b])
        t = math.ceil(0.5 * min(len(ta), len(tb)))
        if len(ta & tb) >= t:
            required.add((a, b))
    assert required == {(100, 101)}, required
    assert required <= got, required - got  # completeness

    naive = (
        sets.select("doc_id", F.explode("toks").alias("tk"))
        .alias("a")
        .join(
            sets.select("doc_id", F.explode("toks").alias("tk")).alias("b"),
            (F.col("a.tk") == F.col("b.tk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
        .count()
    )
    assert naive >= 190 + 1, naive
    # measured candidate-set shrinkage: two orders of magnitude here
    assert len(got) < naive / 10, (len(got), naive)


def test_maxsim_single_chunk_equals_numpy_dot_ranking(spark):
    """maxsim_topk with n_chunks=1 degenerates to exact quantized
    dot-product ranking — pinned against an independent numpy reference
    (third implementation, after the Spark plan and the q_maxsim DuckDB
    oracle)."""
    import numpy as np

    from pyspark.sql import functions as F

    from big_data_streaming_spark.functions.similarity import maxsim_topk

    rng = np.random.RandomState(7)
    vecs = rng.uniform(-1, 1, size=(40, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.q_id, r.rank): (r.doc_id, r.maxsim_q)
        for r in maxsim_topk(
            df, F.col("vec_id") < 3, n_chunks=1, k=5, scale=10_000
        ).collect()
    }

    q = np.floor(vecs.astype("float64") * 10_000 + 0.5).astype("int64")
    for qid in range(3):
        scores = sorted(
            ((int(q[qid] @ q[d]), d) for d in range(3, 40)),
            key=lambda sd: (-sd[0], sd[1]),
        )
        for rank, (s, d) in enumerate(scores[:5], start=1):
            assert got[(qid, rank)] == (d, s), (qid, rank, got[(qid, rank)], (d, s))


def test_maxsim_multichunk_dominates_worst_chunk(spark):
    """MaxSim structural property: with n_chunks=c, score >= the
    single-chunk dot of the full vectors is NOT guaranteed, but score is
    always >= sum over query chunks of the MIN doc chunk dot — and equals
    the full dot when query and doc chunks align best pairwise. Checked
    on a constructed case: a doc that matches the query chunk-for-chunk
    scores the full quantized dot; a permuted doc (same chunks, shuffled)
    scores the SAME MaxSim (chunk max is order-invariant) — the
    permutation invariance that makes late interaction robust to token
    order."""
    from pyspark.sql import functions as F

    from big_data_streaming_spark.functions.similarity import maxsim_topk

    a = [1.0, 0.0, 0.0, 1.0]  # 2 chunks of 2 dims
    doc_aligned = [1.0, 0.0, 0.0, 1.0]
    doc_permuted = [0.0, 1.0, 1.0, 0.0]  # chunks swapped within... distinct
    df = spark.createDataFrame(
        [(0, a), (10, doc_aligned), (11, [doc_aligned[2], doc_aligned[3], doc_aligned[0], doc_aligned[1]])],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r.doc_id: r.maxsim_q
        for r in maxsim_topk(
            df, F.col("vec_id") < 1, n_chunks=2, k=5, scale=100
        ).collect()
    }
    # aligned doc: chunk dots are (100*100, 100*100) -> 20000
    assert rows[10] == 20_000, rows
    # chunk-swapped doc: each query chunk still finds its best partner
    assert rows[11] == 20_000, rows


def test_cov_matrix_matches_integer_reference(spark):
    """cov_matrix vs a pure-Python exact replica: quantize with the same
    floor(x*scale + 0.5), accumulate exact integer sums, finish with the
    same fixed-order double formula — the third implementation beside
    the Spark plan and the q_embed_cov DuckDB oracle. Equality is exact
    (==), not approximate: both sides perform the identical IEEE
    sequence."""
    import math
    import random

    from big_data_streaming_spark.functions.similarity import cov_matrix

    rng = random.Random(7)
    dims, scale, n = 5, 1_000_000, 60
    vecs = [
        [rng.uniform(-2.0, 2.0) for _ in range(dims)] for _ in range(n)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id: bigint, embedding: array<float>",
    )
    got = {
        (r.dim_i, r.dim_j): (r.n, r.cov)
        for r in cov_matrix(df, "embedding", dims, scale).collect()
    }
    # float32 storage round-trip first (the column is array<float>)
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    q = [
        [math.floor(f32(x) * scale + 0.5) for x in v] for v in vecs
    ]
    for i in range(1, dims + 1):
        for j in range(i, dims + 1):
            si = sum(row[i - 1] for row in q)
            sj = sum(row[j - 1] for row in q)
            sij = sum(row[i - 1] * row[j - 1] for row in q)
            expect = (float(sij) / n - (float(si) / n) * (float(sj) / n)) / (
                float(scale) * float(scale)
            )
            rn, rcov = got[(i, j)]
            assert rn == n
            assert rcov == expect, (i, j, rcov, expect)
    # Symmetry/diagonal sanity: variances non-negative.
    assert all(got[(i, i)][1] >= 0.0 for i in range(1, dims + 1))


def test_pca_power_matches_numpy_eigensolve(spark, sf_small):
    """q_pca_power's 12 weighted power iterations must land on numpy's
    top eigenvector of the same weighted quantized covariance (|cos| >
    0.999) with a matching eigenvalue estimate — the third
    implementation beside the Spark+driver chain and the DuckDB CTE
    chain."""
    import numpy as np

    from big_data_streaming_spark.workload.similarity import QUERIES

    sf = sf_small
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    X = np.array(
        [np.floor(np.array(r.embedding[:8], dtype=np.float64) * 1e6 + 0.5)
         for r in emb]
    ) / 1e6
    Xw = X * np.arange(1, 9, dtype=float)
    C = np.cov(Xw.T, bias=True)
    w, V = np.linalg.eigh(C)
    rows = QUERIES["q_pca_power"](spark, sf).collect()
    v = np.array([r.loading for r in sorted(rows, key=lambda r: r.dim)])
    assert abs(float(v @ V[:, -1])) > 0.999
    assert abs(rows[0].lambda_est - w[-1]) < 1e-3 * abs(w[-1])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12


def test_maxsim_rejects_non_divisible_chunking(spark):
    """dim % n_chunks != 0 used to produce _cw = 0 (dim < n_chunks) or a
    ragged extra chunk — NULL chunk ids and silently empty scores
    (ADVICE r3). The contract violation must now fail loudly, in-plan."""
    import pytest

    from pyspark.sql import functions as F

    from big_data_streaming_spark.functions.similarity import maxsim_topk

    df = spark.createDataFrame(
        [(i, [float(j) for j in range(8)]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="maxsim_topk"):
        maxsim_topk(df, F.col("vec_id") < 2, n_chunks=3, k=3).collect()
    with pytest.raises(Exception, match="maxsim_topk"):
        maxsim_topk(df, F.col("vec_id") < 2, n_chunks=16, k=3).collect()
    with pytest.raises(ValueError, match="n_chunks"):
        maxsim_topk(df, F.col("vec_id") < 2, n_chunks=0, k=3)
    # the divisible case still works: 8 dims / 4 chunks
    assert maxsim_topk(df, F.col("vec_id") < 2, n_chunks=4, k=3).count() > 0
