"""Similarity-search workload over ``embeddings`` — SURVEY.md §2 Table C
(C2/C3) and the north-star ANN mandate.

``q_sim_topk`` carries a DuckDB oracle (explicit double-precision cosine,
same left-to-right fold order); the LSH/IVF neighbor lists are rows-only —
their hash families / routing are engine-specific by design — but the IVF
path additionally carries ``q_sim_ivf_checked``, a value-checked audit
(mechanics exactness within the probed lists + mean-recall floor vs exact
brute force) so the driver verifies the index finds what it scanned, not
merely that it runs. The IVF index itself is geometric: deterministic
k-means clusters (``kmeans_ivf_index``), not the fixture's arbitrary
``label`` column — label routing measured recall@5 ≈ 0.18 at nprobe=2,
k-means routing ≈ 0.68 on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_streaming_spark.functions.similarity import (
    cosine_topk,
    hyperplane_lsh_neardup,
    ivf_topk,
)
from big_data_streaming_spark.plans.rank import global_rank
from big_data_streaming_spark.workload.common import t, tr

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_N_QUERIES = 8  # query vectors = vec_id < 8
_K = 5


# --- C3: exact brute-force cosine top-k -----------------------------------
# Oracle computes the identical double-precision expression; rank ties are
# broken by neighbor_id on both sides so the result set is deterministic.
@_q(
    "q_sim_topk",
    f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec
        FROM embeddings WHERE vec_id < {_N_QUERIES}
    ), scored AS (
        SELECT q.q_id, e.vec_id AS neighbor_id,
               list_dot_product(e.embedding::DOUBLE[], q.q_vec)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.q_vec, q.q_vec))) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.q_id
    )
    SELECT q_id, neighbor_id, round(cosine, 6) AS cosine_r,
           CAST(row_number() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= {_K}
    """,
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    res = cosine_topk(emb, queries, k=_K)
    # Rounded cosine in the compared output: the ranking uses full
    # precision; the 6-dp rounding only absolves last-ulp libm divergence.
    return res.select(
        "q_id", "neighbor_id", F.round("cosine", 6).alias("cosine_r"), "rank"
    )


# --- north star: embedding normalization (ANN prep) -----------------------
# Unit-normalize vectors JVM-side (higher-order fns, no Python). After
# this, cosine becomes a plain dot product — the form every ANN index
# wants; at 100 TB you normalize once at ingest, not per query.
# Output is scalar-only (dim / norm / two unit components): the driver's
# pandas canonicalizer cannot hash rows holding array cells, and the
# scalars are bit-exact across engines (left-fold double dot + correctly-
# rounded sqrt/div — see SURVEY.md §4.3.7 exactness policy).
@_q(
    "q_embed_normalize",
    """
    WITH n AS (
      SELECT vec_id,
             len(embedding) AS dim,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS norm,
             embedding[1]::DOUBLE AS e0,
             embedding[2]::DOUBLE AS e1
      FROM embeddings
    )
    SELECT vec_id, CAST(dim AS INTEGER) AS dim, norm,
           e0 / norm AS u0, e1 / norm AS u1
    FROM n
    """,
)
def q_embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_streaming_spark.functions.similarity import l2_norm

    emb = t(spark, sf_dir, "embeddings")
    staged = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).select(
        "vec_id",
        F.size("v").alias("dim"),
        "v",
        l2_norm(F.col("v")).alias("norm"),
    )
    return staged.select(
        "vec_id",
        "dim",
        "norm",
        (F.col("v")[0] / F.col("norm")).alias("u0"),
        (F.col("v")[1] / F.col("norm")).alias("u1"),
    )


# Session-scoped quantizer cache: the decimal-exact centroid build is the
# expensive stage of IVF and semantic dedup, and it's a pure function of
# (session data, sf_dir) — build once, persist, reuse across queries.
# This is the index-build-once pattern every ANN deployment uses; keyed
# by applicationId so a new session never sees another session's handles.
_CENTROID_CACHE: dict[tuple[str, str], DataFrame] = {}


def _centroids_cached(spark: SparkSession, sf_dir: str, emb: DataFrame) -> DataFrame:
    from big_data_streaming_spark.functions.similarity import build_centroids

    key = (spark.sparkContext.applicationId, sf_dir)
    c = _CENTROID_CACHE.get(key)
    if c is None:
        c = build_centroids(emb, cluster_col="label", vec_col="embedding").persist()
        c.count()  # materialize under the persist
        _CENTROID_CACHE[key] = c
    return c


# Geometric IVF index cache (kmeans_ivf_index): distinct from the label
# centroids above — q_dedup_semantic's oracle is DEFINED over the label
# partitioning, while ANN routing needs clusters that follow the vector
# geometry (label-based lists measured recall@5 ≈ 0.18 at nprobe=2; the
# k-means lists ≈ 0.68 on the same fixture).
_IVF_INDEX_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}
_IVF_CLUSTERS = 4
_IVF_NPROBE = 2


def _ivf_index_cached(
    spark: SparkSession, sf_dir: str, emb: DataFrame
) -> tuple[DataFrame, DataFrame]:
    from big_data_streaming_spark.functions.similarity import kmeans_ivf_index

    key = (spark.sparkContext.applicationId, sf_dir)
    pair = _IVF_INDEX_CACHE.get(key)
    if pair is None:
        indexed, cents = kmeans_ivf_index(
            emb.select("vec_id", "embedding"), k=_IVF_CLUSTERS, iters=2
        )
        indexed = indexed.persist()
        cents = cents.persist()
        cents.count()  # materialize under the persist
        _IVF_INDEX_CACHE[key] = pair = (indexed, cents)
    return pair


# --- north star: IVF approximate top-k (rows-only) ------------------------
@_q("q_sim_ivf")
def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    indexed, cents = _ivf_index_cached(spark, sf_dir, emb)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(
        indexed,
        queries,
        k=_K,
        nprobe=_IVF_NPROBE,
        cluster_col="ivf_cluster",
        centroids=cents,
    )


# --- north star: embedding-cosine near-dup via hyperplane LSH (rows-only) -
@_q("q_embed_neardup")
def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Threshold calibrated to the fixture: its cross-vector cosines top
    # out ~0.51 (59 pairs ≥ 0.4 at sf0.01), so 0.4/4-planes yields a
    # non-vacuous result; a production corpus with true near-dups (cos
    # ≥ 0.95) would use the tighter default.
    # tr: the bucket self-join's exact-cosine verification otherwise fuses
    # into the single scan task of the one-row-group embeddings file —
    # the whole O(pairs·dim) kernel on one core (round-11 A/B:
    # 4.13 -> 1.30 s; no-op at production row-group counts).
    emb = tr(spark, sf_dir, "embeddings")
    return hyperplane_lsh_neardup(emb, min_cosine=0.4, n_planes=4)


# --- north star: semantic deduplication ------------------------------------
# The embedding-space analog of MinHash dedup, and the form that scales:
# cluster the corpus with a coarse quantizer (fixture labels stand in for
# k-means, as in ivf_topk), then within each cluster keep the vector
# closest to the decimal-exact centroid as the representative and mark the
# rest duplicates. No pair materialization anywhere — O(n) cosines against
# a broadcast centroid table, one ranking window per cluster. At 100 TB:
# store the corpus partitioned by cluster and this runs partition-local.
# Oracle-exact because centroids are decimal-routed sums and the cosine is
# the same left-fold double expression DuckDB's list_dot_product computes.
@_q(
    "q_dedup_semantic",
    """
    WITH dims AS (
        SELECT label, generate_subscripts(embedding, 1) AS i,
               unnest(embedding::DOUBLE[]) AS x
        FROM embeddings
    ), cent AS (
        SELECT label, i,
               CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS c
        FROM dims GROUP BY label, i
    ), cvec AS (
        SELECT label, list(c ORDER BY i) AS centroid FROM cent GROUP BY label
    ), scored AS (
        SELECT e.vec_id, e.label,
               list_dot_product(e.embedding::DOUBLE[], c.centroid)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(c.centroid, c.centroid)))
                 AS cos_c
        FROM embeddings e JOIN cvec c USING (label)
    )
    SELECT vec_id,
           CAST(label AS INTEGER) AS cluster_id,
           first_value(vec_id) OVER w AS rep_id,
           round(cos_c, 6) AS cos_to_centroid_r,
           (row_number() OVER w > 1) AS is_dup
    FROM scored
    WINDOW w AS (PARTITION BY label ORDER BY cos_c DESC, vec_id)
    """,
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from big_data_streaming_spark.functions.similarity import cosine

    emb = t(spark, sf_dir, "embeddings")
    centroids = F.broadcast(_centroids_cached(spark, sf_dir, emb))
    # NOT rebalanced (round-11): the per-vector centroid cosine is cheap
    # enough that the focused A/B read flat-to-negative (0.71 vs 0.65 s);
    # the broadcast-join probe does not pay a tr() exchange here.
    scored = emb.join(
        centroids, emb.label == centroids.centroid_id
    ).select(
        "vec_id",
        "label",
        cosine(F.col("embedding"), F.col("centroid")).alias("cos_c"),
    )
    w = Window.partitionBy("label").orderBy(F.desc("cos_c"), "vec_id")
    return scored.select(
        "vec_id",
        F.col("label").alias("cluster_id"),
        F.first("vec_id").over(w).alias("rep_id"),
        F.round("cos_c", 6).alias("cos_to_centroid_r"),
        (F.row_number().over(w) > 1).alias("is_dup"),
    )


# --- north star: deterministic k-means (fixed-iteration Lloyd's) ----------
# True iterative clustering (build_centroids only averages pre-assigned
# labels). Two Lloyd iterations from an id%k init, unrolled into one
# static plan; the oracle unrolls the SAME two iterations as chained
# CTEs — a fully value-checked iterative algorithm, which is only
# possible because every step (decimal centroid means, fixed-order
# double distances, id tie-breaks) is engine-exact by construction.
_KM_K = 8
_KM_ITERS = 2


def _km_oracle(iters: int = _KM_ITERS, k: int = _KM_K) -> str:
    sql = (
        f"WITH a0 AS (SELECT vec_id, embedding::DOUBLE[] AS v,"
        f" CAST(vec_id % {k} AS INTEGER) AS cid, CAST(0.0 AS DOUBLE) AS d2"
        f" FROM embeddings)"
    )
    for it in range(iters):
        p, n = f"a{it}", it + 1
        sql += f""",
    d{n} AS (SELECT cid, generate_subscripts(v, 1) AS i, unnest(v) AS x
             FROM {p}),
    c{n} AS (SELECT cid, i,
                    CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS c
             FROM d{n} GROUP BY cid, i),
    v{n} AS (SELECT cid, list(c ORDER BY i) AS cent FROM c{n} GROUP BY cid),
    s{n} AS (SELECT a.vec_id, a.v, t.cid,
                    (list_dot_product(a.v, a.v)
                     - 2.0 * list_dot_product(a.v, t.cent))
                      + list_dot_product(t.cent, t.cent) AS d2
             FROM a0 a CROSS JOIN v{n} t),
    a{n} AS (SELECT vec_id, v, cid, d2 FROM s{n}
             QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY d2, cid) = 1)"""
    sql += f"""
    SELECT vec_id, CAST(cid AS INTEGER) AS cluster_id, round(d2, 6) AS d2_r
    FROM a{iters}"""
    return sql


@_q("q_kmeans", _km_oracle())
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_streaming_spark.functions.similarity import kmeans_assign

    emb = t(spark, sf_dir, "embeddings")
    res = kmeans_assign(emb, k=_KM_K, iters=_KM_ITERS)
    return res.select(
        "vec_id",
        F.col("cid").alias("cluster_id"),
        F.round("d2", 6).alias("d2_r"),
    )


# --- C3: IVF audit (gate-checkable form of the ANN path) ------------------
# q_sim_ivf's neighbor lists are rows-only (routing is engine-specific);
# this query makes the ANN path VALUE-checkable the way the sketch pack
# is, with two separable claims folded into one audit row:
#
# * MECHANICS (probed_exact): among the clusters the query probed, IVF
#   returned exactly the best candidates — checked by an independent
#   inequality (best excluded candidate cosine ≤ worst returned cosine),
#   not by re-running the same ranking pipeline. A rank off-by-one or a
#   dropped inverted list flips this to FALSE at any data scale.
# * QUALITY (mean_recall_ok): mean recall@5 vs exact brute force ≥ 0.5.
#   The fixture's vectors are unstructured (no real cluster geometry), so
#   per-query recall at nprobe=2/4 clusters ranges 0.2–1.0 with mean
#   ≈ 0.68–0.73 across sf0.001–sf0.1; the 0.5 floor is the honest bound
#   for this data. A clusterable production corpus would pin ≥ 0.9.
#
# All arithmetic in the audit is exact (integer counts, one double
# division), so the booleans are deterministic and the oracle is plain
# SQL over the query-id set.
@_q(
    "q_sim_ivf_checked",
    f"""
    SELECT COUNT(*) AS n_queries, TRUE AS probed_exact, TRUE AS mean_recall_ok
    FROM embeddings WHERE vec_id < {_N_QUERIES}
    """,
)
def q_sim_ivf_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from big_data_streaming_spark.functions.similarity import cosine

    emb = t(spark, sf_dir, "embeddings")
    indexed, cents = _ivf_index_cached(spark, sf_dir, emb)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    # The IVF result feeds THREE audit branches (the min-returned-cosine
    # aggregate, the excluded-candidate anti filter, and the recall
    # semi-join); unpersisted, each branch re-runs the whole probe+rank
    # pipeline (round-11: 4.2 -> 2.6 s at sf0.1). track_persist shares
    # one evaluation; bench/tests release it between queries — the same
    # lifecycle as the ranker's consistency pin. At 100 TB you would
    # never re-probe the index three times to audit one answer.
    from big_data_streaming_spark.plans.rank import track_persist

    ivf = track_persist(
        ivf_topk(
            indexed,
            queries,
            k=_K,
            nprobe=_IVF_NPROBE,
            cluster_col="ivf_cluster",
            centroids=cents,
        ).select("q_id", "neighbor_id", "cosine")
    )

    # Independent candidate derivation: re-route the queries, score every
    # candidate in the probed lists, and bound the IVF result from the
    # outside instead of re-ranking.
    q = queries.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    routed = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "q_id",
            "q_vec",
            "centroid_id",
            cosine(F.col("q_vec"), F.col("centroid")).alias("c_cos"),
        )
        .withColumn(
            "c_rank",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("c_cos"), "centroid_id")
            ),
        )
        .filter(F.col("c_rank") <= _IVF_NPROBE)
        .select("q_id", "q_vec", "centroid_id")
    )
    scored = (
        indexed.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_vec"),
            F.col("ivf_cluster").alias("centroid_id"),
        )
        .join(F.broadcast(routed), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", cosine(F.col("c_vec"), F.col("q_vec")).alias("cand_cos"))
    )
    min_ivf = ivf.groupBy("q_id").agg(
        F.min("cosine").alias("min_ret"), F.count(F.lit(1)).alias("n_ret")
    )
    excluded = scored.join(
        ivf.select("q_id", "neighbor_id").withColumn("_ret", F.lit(1)),
        ["q_id", "neighbor_id"],
        "left",
    ).filter(F.col("_ret").isNull())
    best_exc = excluded.groupBy("q_id").agg(F.max("cand_cos").alias("best_exc"))
    mech = (
        min_ivf.join(best_exc, "q_id", "left")
        .select(
            "q_id",
            (
                F.coalesce(F.col("best_exc") <= F.col("min_ret"), F.lit(True))
                & (F.col("n_ret") == _K)
            ).alias("q_exact"),
        )
    )
    brute = cosine_topk(emb, queries, k=_K).select(
        "q_id", F.col("neighbor_id").alias("true_neighbor")
    )
    matches = (
        brute.join(
            ivf.select("q_id", "neighbor_id"),
            (brute.q_id == ivf.q_id) & (brute.true_neighbor == ivf.neighbor_id),
            "left_semi",
        )
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    per_q = mech.join(matches, "q_id", "left").select(
        "q_id", "q_exact", F.coalesce("n_match", F.lit(0)).alias("n_match")
    )
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.bool_and("q_exact").alias("probed_exact"),
        (
            F.sum("n_match").cast("double")
            / (F.count(F.lit(1)) * F.lit(_K)).cast("double")
            >= F.lit(0.5)
        ).alias("mean_recall_ok"),
    )


# --- int8 scalar quantization of embeddings (+ reconstruction audit) ------
# Symmetric per-vector quantization: scale = max|x| / 127, q = round-half-
# up(x / scale) via floor(u + 0.5) (Spark CAST and DuckDB round() disagree
# on halves; floor text is identical), reconstruction x' = q * scale. The
# value-checked output is the per-vector scale plus exact error moments
# (decimal-routed MSE, order-free max |err|). At 100 TB this is the
# compression pass before ANN shipping: 4x smaller vectors, one shuffle
# (explode → window amax → re-aggregate rides a single vec_id exchange).
_QZ_SCALE = "(amax / 127)"
_QZ_Q = f"floor(x / nullif({_QZ_SCALE}, 0) + 0.5)"
_QZ_ERR = f"(x - {_QZ_Q} * {_QZ_SCALE})"

@_q(
    "q_embed_quantize",
    f"""
    WITH x AS (
        SELECT vec_id, CAST(u.e AS DOUBLE) AS x
        FROM embeddings, UNNEST(embedding) AS u(e)
    ), m AS (
        SELECT vec_id, x,
               MAX(abs(x)) OVER (PARTITION BY vec_id) AS amax
        FROM x
    )
    SELECT vec_id, {_QZ_SCALE} AS scale, COUNT(*) AS n_dims,
           CAST(SUM(CAST({_QZ_ERR} * {_QZ_ERR} AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*) AS mse,
           MAX(abs({_QZ_ERR})) AS max_abs_err
    FROM m GROUP BY vec_id, amax
    """,
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    x = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", F.explode("embedding").alias("f"))
        .select("vec_id", F.col("f").cast("double").alias("x"))
    )
    m = x.withColumn(
        "amax", F.max(F.abs("x")).over(Window.partitionBy("vec_id"))
    )
    err = F.expr(_QZ_ERR)
    return m.groupBy("vec_id", "amax").agg(
        F.count(F.lit(1)).alias("n_dims"),
        (
            F.sum((err * err).cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mse"),
        F.max(F.abs(err)).alias("max_abs_err"),
    ).select(
        "vec_id",
        F.expr(_QZ_SCALE).alias("scale"),
        "n_dims",
        "mse",
        "max_abs_err",
    )


# --- per-dimension embedding statistics (feature-quality audit) -----------
# Distribution audit across the corpus per embedding dimension: the
# pre-normalization check a training pipeline runs before cosine math
# (dead dims, scale drift). Moments are computed on explicitly
# 1e-6-quantized values — floor(x*1e6 + 0.5) is the same IEEE double
# sequence on both engines, so every sum is an exact integer. (The
# decimal-routed form was one ulp off here: double→DECIMAL casts of
# arbitrary-mantissa float32 values hit the rounding knife edge where
# Spark's BigDecimal HALF_UP and DuckDB's scaled-multiply disagree —
# "nice" money doubles never do, which is why the suite's other decimal
# routings hold.) min/max are raw doubles (order-free). One dim shuffle.
_DS_Q = "CAST(floor(x * 1000000 + 0.5) AS BIGINT)"
_DS_MEAN = "(CAST(sx AS DOUBLE) / n / CAST(1000000 AS DOUBLE))"
_DS_VAR = (
    "(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)"
    " / nullif(n - 1, 0))"
    " / (CAST(1000000 AS DOUBLE) * CAST(1000000 AS DOUBLE)))"
)

@_q(
    "q_embed_dimstats",
    f"""
    WITH x AS (
        SELECT CAST(t.i AS INTEGER) AS dim, CAST(embedding[t.i] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ), q AS (
        SELECT dim, x, {_DS_Q} AS xq FROM x
    ), s AS (
        SELECT dim, COUNT(x) AS n,
               CAST(SUM(xq) AS BIGINT) AS sx,
               CAST(SUM(xq * xq) AS BIGINT) AS sxx,
               MIN(x) AS lo, MAX(x) AS hi
        FROM q GROUP BY dim
    )
    SELECT dim, n, {_DS_MEAN} AS mean, {_DS_VAR} AS var, lo, hi FROM s
    """,
)
def q_embed_dimstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = (
        t(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("pos", "f"))
        .select(
            (F.col("pos") + 1).cast("int").alias("dim"),
            F.col("f").cast("double").alias("x"),
        )
    )
    q = x.withColumn("xq", F.expr(_DS_Q))
    s = q.groupBy("dim").agg(
        F.count("x").alias("n"),
        F.sum("xq").cast("bigint").alias("sx"),
        F.sum(F.col("xq") * F.col("xq")).cast("bigint").alias("sxx"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
    )
    return s.select(
        "dim",
        "n",
        F.expr(_DS_MEAN).alias("mean"),
        F.expr(_DS_VAR).alias("var"),
        "lo",
        "hi",
    )


# --- hard-negative mining (contrastive-training shape) --------------------
# For each query vector: the top-3 most-similar vectors with a DIFFERENT
# label — the "hard negatives" a contrastive trainer pairs against
# positives. Same broadcast(queries) × one-corpus-scan plan as
# q_sim_topk with the label-mismatch predicate fused into the join;
# ranking ties broken by neighbor_id, cosine reported at 6 dp to absolve
# last-ulp libm divergence (the ranking itself uses full precision).
_HN_K = 3

@_q(
    "q_hard_negatives",
    f"""
    WITH q AS (
        SELECT vec_id AS q_id, label AS q_label, embedding::DOUBLE[] AS q_vec
        FROM embeddings WHERE vec_id < {_N_QUERIES}
    ), scored AS (
        SELECT q.q_id, e.vec_id AS neighbor_id, e.label AS neg_label,
               list_dot_product(e.embedding::DOUBLE[], q.q_vec)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.q_vec, q.q_vec))) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.label <> q.q_label
    )
    SELECT q_id, neighbor_id, neg_label, round(cosine, 6) AS cosine_r,
           CAST(row_number() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, neighbor_id)
                AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= {_HN_K}
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from big_data_streaming_spark.functions.similarity import cosine

    emb = t(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("q_id"),
            F.col("label").alias("q_label"),
            F.col("embedding").alias("q_vec"),
        )
    )
    scored = (
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neg_label"),
            F.col("embedding").alias("c_vec"),
        )
        .join(q, F.col("neg_label") != F.col("q_label"))
        .select(
            "q_id",
            "neighbor_id",
            "neg_label",
            cosine(F.col("c_vec"), F.col("q_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _HN_K)
        .select(
            "q_id",
            "neighbor_id",
            "neg_label",
            F.round("cosine", 6).alias("cosine_r"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --- k-NN classification (majority vote over exact top-k) ------------------
# The serving-side complement of q_sim_topk: predict each query vector's
# label from its 5 nearest corpus neighbors (corpus = the non-query
# slice, so train/test are disjoint). Ranking reuses the full-precision
# cosine (same left-fold dot the green q_sim_topk oracle pins);
# the vote and its tie-break (votes DESC, label ASC) are pure integer
# logic, so the prediction is bit-deterministic. Scale = q_sim_topk's:
# broadcast queries × one corpus scan, then O(queries·k) vote rows.
_KNN_K = 5


@_q(
    "q_knn_classify",
    f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec, label AS true_label
        FROM embeddings WHERE vec_id < {_N_QUERIES}
    ), scored AS (
        SELECT q.q_id, q.true_label, e.vec_id AS neighbor_id, e.label,
               list_dot_product(e.embedding::DOUBLE[], q.q_vec)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.q_vec, q.q_vec))) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id >= {_N_QUERIES}
    ), nn AS (
        SELECT q_id, true_label, label,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    ), votes AS (
        SELECT q_id, true_label, label AS pred_label, COUNT(*) AS votes
        FROM nn WHERE rank <= {_KNN_K}
        GROUP BY q_id, true_label, label
    )
    SELECT q_id, true_label, pred_label, votes,
           pred_label = true_label AS correct
    FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY votes DESC, pred_label) AS vr
        FROM votes
    )
    WHERE vr = 1
    """,
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    corpus = emb.filter(F.col("vec_id") >= _N_QUERIES)
    nn = cosine_topk(corpus, queries, k=_KNN_K)
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("pred_label")
    )
    truth = queries.select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("true_label")
    )
    votes = (
        nn.join(F.broadcast(labels), "neighbor_id")
        .groupBy("q_id", "pred_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("votes"), "pred_label")
    top = votes.withColumn("vr", F.row_number().over(w)).filter("vr = 1").drop("vr")
    return top.join(F.broadcast(truth), "q_id").select(
        "q_id",
        "true_label",
        "pred_label",
        "votes",
        (F.col("pred_label") == F.col("true_label")).alias("correct"),
    )


# --- retrieval evaluation: first-relevant rank / reciprocal rank ----------
# The retrieval-quality complement of q_knn_classify: for each query
# vector, the rank of the first corpus neighbor sharing its label (the
# "first relevant hit"), plus its reciprocal — the per-query terms of
# MRR. Emitted per query (no mean) so every output value is an exact
# integer or an exact-ratio double; a mean would sum arbitrary doubles
# order-dependently. A query whose label never appears in the corpus
# STILL emits a row (NULL rank, reciprocal 0.0) — dropping it would
# silently shrink a downstream mean's denominator and inflate MRR
# (review finding). Ranking reuses cosine_topk(k=None): one contract
# for fold order and tie-breaks across the similarity tier.
@_q(
    "q_retrieval_mrr",
    f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec, label AS q_label
        FROM embeddings WHERE vec_id < {_N_QUERIES}
    ), scored AS (
        SELECT q.q_id, q.q_label, e.vec_id AS neighbor_id, e.label,
               list_dot_product(e.embedding::DOUBLE[], q.q_vec)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.q_vec, q.q_vec))) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id >= {_N_QUERIES}
    ), ranked AS (
        SELECT q_id, q_label, label,
               CAST(row_number() OVER (PARTITION BY q_id
                                       ORDER BY cosine DESC, neighbor_id)
                    AS BIGINT) AS rank
        FROM scored
    ), hit AS (
        SELECT q_id, CAST(MIN(rank) AS BIGINT) AS first_relevant_rank
        FROM ranked WHERE label = q_label GROUP BY q_id
    )
    SELECT q.q_id, q.q_label, hit.first_relevant_rank,
           COALESCE(1.0 / CAST(hit.first_relevant_rank AS DOUBLE), 0.0)
               AS reciprocal_rank
    FROM q LEFT JOIN hit ON q.q_id = hit.q_id
    """,
)
def q_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    corpus = emb.filter(F.col("vec_id") >= _N_QUERIES)
    ranked = cosine_topk(corpus, queries, k=None)
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    truth = queries.select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label")
    )
    hit = (
        ranked.join(F.broadcast(labels), "neighbor_id")
        .join(F.broadcast(truth), "q_id")
        .where(F.col("n_label") == F.col("q_label"))
        .groupBy("q_id")
        .agg(F.min("rank").cast("bigint").alias("first_relevant_rank"))
    )
    return (
        # hit is O(queries) rows — broadcast it so the outer join never
        # plans a sort-merge on two tiny sides
        truth.join(F.broadcast(hit), "q_id", "left")
        .select(
            "q_id",
            "q_label",
            "first_relevant_rank",
            F.coalesce(
                F.lit(1.0) / F.col("first_relevant_rank").cast("double"),
                F.lit(0.0),
            ).alias("reciprocal_rank"),
        )
    )


# ===================== round-3 additions ====================================
# --- MaxSim late-interaction scoring (ColBERT-style) ------------------------
# Multi-vector retrieval: treat each 64-dim embedding as 4 token vectors
# of 16 dims; score(q, d) = Σ over q's chunks of max over d's chunks of
# their dot product — the late-interaction form that beats single-vector
# cosine on fine-grained matches. Components are quantized once to exact
# 1e-4 integers (the q_embed_quantize floor pattern), so every dot, max
# and sum is integer-exact and the oracle matches bit-for-bit. The whole
# computation is RELATIONAL (posexplode to (vec, chunk, dim, q) rows;
# dot = grouped SUM of products over the dim equi-join) — no UDFs, all
# codegen. Scale: the 5-query side is broadcast (320 component rows);
# the corpus is scanned once; chunk-dot cardinality is
# |queries|·|docs|·16 grouped rows — at real scale the IVF router
# (functions/similarity.py) prunes the doc side first and MaxSim
# re-ranks only the candidate list, which is exactly how ColBERT serves.
@_q(
    "q_maxsim",
    """
    WITH comp AS (
        SELECT vec_id,
               CAST((g.i - 1) // 16 AS INTEGER) AS ch,
               CAST((g.i - 1) % 16 AS INTEGER) AS d,
               CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 10000 + 0.5)
                    AS BIGINT) AS q
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
    ), qc AS (SELECT * FROM comp WHERE vec_id < 5),
    cc AS (SELECT * FROM comp WHERE vec_id >= 5),
    dots AS (
        SELECT qc.vec_id AS q_id, cc.vec_id AS doc_id,
               qc.ch AS q_ch, cc.ch AS d_ch,
               SUM(qc.q * cc.q) AS dot
        FROM qc JOIN cc ON qc.d = cc.d
        GROUP BY 1, 2, 3, 4
    ), best AS (
        SELECT q_id, doc_id, q_ch, MAX(dot) AS best_dot
        FROM dots GROUP BY q_id, doc_id, q_ch
    ), scores AS (
        SELECT q_id, doc_id, CAST(SUM(best_dot) AS BIGINT) AS maxsim_q
        FROM best GROUP BY q_id, doc_id
    )
    SELECT q_id, doc_id, maxsim_q,
           CAST(row_number() OVER (PARTITION BY q_id
                                   ORDER BY maxsim_q DESC, doc_id) AS INTEGER)
               AS rank
    FROM scores
    QUALIFY rank <= 3
    """,
)
def q_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_streaming_spark.functions.similarity import maxsim_topk

    return maxsim_topk(
        t(spark, sf_dir, "embeddings"),
        F.col("vec_id") < 5,
        n_chunks=4,
        k=3,
        scale=10_000,
    )


# --- covariance matrix of the leading embedding dimensions (PCA prep) -----
# The single-pass sufficient-statistics shape: ONE aggregate over the
# corpus produces count + per-dim sums + all pairwise product sums, then
# the (i, j, cov) matrix is unpivoted from that one row with stack().
# No explode, no shuffle of row-level data — at 100 TB this is a map-side
# partial aggregate per partition plus a single-row final reduce, the
# cheapest possible plan for second moments (the same statistics feed a
# driver-side eigensolve for PCA; the Spark job's product is the exact
# scatter matrix). Exactness: dims are 1e6-quantized up front
# (floor(x*1e6 + 0.5), the q_embed_dimstats policy) so every sum is an
# exact integer; the covariance formula is ONE fixed-order double
# expression evaluated verbatim by both engines. Population covariance
# (divide by n). Quantized products are <= 1e12 and row counts here are
# <= 5e4 per dim-pair, so bigint sums cannot overflow until ~9e6 rows;
# the 100 TB variant widens the accumulators to DECIMAL(38,0).
_COV_DIMS = 8
# ONE formula text shared by the Spark implementation (via
# functions/similarity.py:cov_matrix) and the DuckDB oracle below.
from big_data_streaming_spark.functions.similarity import (  # noqa: E402
    cov_formula as _cov_formula,
    int_dot_expr as _idot,
    quantize_int_expr as _q127,
)

_COV_FORMULA = _cov_formula(1_000_000)


def _scatter_sql(dims: int) -> str:
    """The q/s CTE pair: 1e6-quantized scatter statistics over the
    embeddings table — the SQL twin of functions/similarity.py:
    scatter_stats, shared by the covariance and PCA oracles."""
    qcols = ",\n               ".join(
        f"CAST(floor(CAST(embedding[{i}] AS DOUBLE) * 1000000 + 0.5)"
        f" AS BIGINT) AS q{i}"
        for i in range(1, dims + 1)
    )
    sums = ",\n               ".join(
        f"CAST(SUM(q{i}) AS BIGINT) AS s{i}" for i in range(1, dims + 1)
    )
    psums = ",\n               ".join(
        f"CAST(SUM(q{i} * q{j}) AS BIGINT) AS s{i}_{j}"
        for i in range(1, dims + 1)
        for j in range(i, dims + 1)
    )
    return f"""q AS (
        SELECT {qcols}
        FROM embeddings
    ), s AS (
        SELECT COUNT(*) AS n,
               {sums},
               {psums}
        FROM q
    )"""


def _cov_oracle() -> str:
    arms = "\n        UNION ALL ".join(
        f"SELECT {i} AS dim_i, {j} AS dim_j, n, s{i} AS si, s{j} AS sj,"
        f" s{i}_{j} AS sij FROM s"
        for i in range(1, _COV_DIMS + 1)
        for j in range(i, _COV_DIMS + 1)
    )
    return f"""
    WITH {_scatter_sql(_COV_DIMS)}, u AS (
        {arms}
    )
    SELECT CAST(dim_i AS INTEGER) AS dim_i, CAST(dim_j AS INTEGER) AS dim_j,
           n, {_COV_FORMULA} AS cov
    FROM u
    """


@_q("q_embed_cov", _cov_oracle())
def q_embed_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Core promoted to functions/similarity.py:cov_matrix (single-pass
    # scatter statistics; property-tested against an exact integer
    # replica of the quantized formula on random vectors).
    from big_data_streaming_spark.functions.similarity import cov_matrix

    return cov_matrix(
        t(spark, sf_dir, "embeddings"), "embedding", _COV_DIMS, 1_000_000
    )


# --- PCA top component via unrolled power iteration -----------------------
# The "big data, small model" split made fully relational: the corpus
# contributes ONLY the one-row scatter statistics (same map-side-partial
# plan as q_embed_cov); the iterative linear algebra runs as a chain of
# projections over that single row. Every level — matvec, norm,
# normalize — is a FIXED-ORDER double expression generated ONCE and
# evaluated verbatim by both engines (left-fold sums, correctly-rounded
# sqrt, no aggregates), so six unrolled iterations stay bit-identical
# cross-engine, eigenvector sign included (the all-ones start vector is
# entrywise positive). At 100 TB the cost is exactly one fact scan; the
# iteration chain is O(dims² · iters) scalar arithmetic on one row.
# lambda_est = ||C·v|| at the last step (the power-method eigenvalue
# estimate for a PSD matrix).
#
# Spectral-gap note (the uniform-fixture degeneracy, again): the
# synthetic embedding dims are near-isotropic (eigenvalue ratio ~1.06
# at the top), where NO fixed iteration count isolates a direction. The
# demo therefore weights dim i by i before the scatter — an EXACT
# integer post-transform of the unweighted statistics (i·s_i, i·j·s_ij;
# quantized sums commute with constant scaling), creating a 1.28 gap so
# 12 iterations reach |cos| > 0.999 against numpy's eigensolve (pinned
# in tests/test_functions.py). On real anisotropic data drop the
# weights. Weighted s_ij stays within bigint to ~5e5 rows at dims=8;
# widen to DECIMAL(38,0) past that.
_PCA_DIMS = 8
_PCA_ITERS = 12


def _pca_cov_text(i: int, j: int) -> str:
    a, b = min(i, j), max(i, j)
    return (
        _COV_FORMULA.replace("sij", f"({a * b} * s{a}_{b})")
        .replace("si", f"({i} * s{i})")
        .replace("sj", f"({j} * s{j})")
    )


def _fold(terms: list[str]) -> str:
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def _pca_levels() -> list[list[tuple[str, str]]]:
    """Projection levels as (alias, expression-text) lists; each level
    references only aliases from earlier levels. Shared by the Spark
    implementation and the DuckDB oracle."""
    d = _PCA_DIMS
    levels: list[list[tuple[str, str]]] = []
    levels.append(
        [(f"c{i}_{j}", _pca_cov_text(i, j)) for i in range(1, d + 1)
         for j in range(1, d + 1)]
    )
    levels.append(
        [(f"v{i}", f"(CAST(1 AS DOUBLE) / sqrt(CAST({d} AS DOUBLE)))")
         for i in range(1, d + 1)]
    )
    for _ in range(_PCA_ITERS):
        levels.append(
            [(f"w{i}",
              _fold([f"(c{i}_{j} * v{j})" for j in range(1, d + 1)]))
             for i in range(1, d + 1)]
        )
        levels.append(
            [("nrm", f"sqrt({_fold([f'(w{i} * w{i})' for i in range(1, d + 1)])})")]
        )
        levels.append(
            [(f"v{i}", f"(w{i} / nrm)") for i in range(1, d + 1)]
        )
    return levels


def _pca_oracle() -> str:
    d = _PCA_DIMS
    carried = ["n"]
    ctes = [f"WITH {_scatter_sql(d)}"]
    prev = "s"
    for k, level in enumerate(_pca_levels()):
        new = [a for a, _ in level]
        # nrm from the PREVIOUS iteration is dead once the new w-level
        # lands; keep the carry list minimal: n, c*, and live v/w/nrm.
        live = [c for c in carried if c == "n" or c.startswith("c")]
        if new[0].startswith("w"):
            live += [c for c in carried if c.startswith("v")]
        elif new[0] == "nrm":
            live += [c for c in carried if c.startswith("w")]
        elif new[0].startswith("v"):
            live += [c for c in carried if c.startswith("w") or c == "nrm"]
        cols = ", ".join(live + [f"{txt} AS {a}" for a, txt in level])
        ctes.append(f"l{k} AS (SELECT {cols} FROM {prev})")
        prev = f"l{k}"
        carried = live + new
    arms = "\n        UNION ALL ".join(
        f"SELECT {i} AS dim, v{i} AS loading, nrm AS lambda_est, n"
        f" FROM {prev}"
        for i in range(1, d + 1)
    )
    return (
        ",\n    ".join(ctes)
        + f""", u AS (
        {arms}
    )
    SELECT CAST(dim AS INTEGER) AS dim, loading, lambda_est, n FROM u
    """
    )


@_q("q_pca_power", _pca_oracle())
def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Distributed part: ONE scan producing the 45 scatter scalars
    # (functions/similarity.py:scatter_stats). The iteration itself runs
    # driver-side on that single collected row (A13 bounded-scalars
    # rule) with Python floats — IEEE doubles performing the IDENTICAL
    # fixed-order sequence as the oracle's CTE chain, so the results are
    # bit-equal. (A fully in-plan variant — 12 unrolled projection
    # levels — was measured to trip janino's 64 KB method limit and fall
    # back to interpreted evaluation; collecting the sufficient
    # statistics is the production design, exactly like the driver-side
    # eigensolve every large-scale PCA uses.)
    import math

    from big_data_streaming_spark.functions.similarity import scatter_stats

    d = _PCA_DIMS
    row = (
        scatter_stats(t(spark, sf_dir, "embeddings"), "embedding", d)
        .collect()[0]
        .asDict()
    )
    n = row["n"]
    # Weighted covariance, mirroring _pca_cov_text term for term.
    c = {}
    for i in range(1, d + 1):
        for j in range(1, d + 1):
            a, b = min(i, j), max(i, j)
            c[(i, j)] = (
                float(a * b * row[f"s{a}_{b}"]) / n
                - (float(i * row[f"s{i}"]) / n) * (float(j * row[f"s{j}"]) / n)
            ) / (float(1000000) * float(1000000))
    v = {i: float(1) / math.sqrt(float(d)) for i in range(1, d + 1)}
    nrm = None
    for _ in range(_PCA_ITERS):
        w = {}
        for i in range(1, d + 1):
            acc = c[(i, 1)] * v[1]
            for j in range(2, d + 1):
                acc = acc + c[(i, j)] * v[j]
            w[i] = acc
        sq = w[1] * w[1]
        for i in range(2, d + 1):
            sq = sq + w[i] * w[i]
        nrm = math.sqrt(sq)
        v = {i: w[i] / nrm for i in range(1, d + 1)}
    return spark.createDataFrame(
        [(i, v[i], nrm, n) for i in range(1, d + 1)],
        "dim: int, loading: double, lambda_est: double, n: bigint",
    )


# --- hybrid retrieval: reciprocal-rank fusion (RRF) -----------------------
# The fusion layer of a hybrid search stack: two retrieval systems rank
# the corpus per query — system A = exact double-precision cosine (the
# fine scorer), system B = int8-quantized dot product (the coarse
# scorer an ANN index serves) — and RRF combines them with
# score = Σ 1/(60 + rank), the rank-only formula (Cormack et al.'s
# constant) that needs no score calibration between systems. Exactness:
# ranks are integers with deterministic tie-breaks, each RRF term is
# one exact double division, and the two-term sum is a fixed-order
# shared text. Plan: both systems are the broadcast-queries × one-
# corpus-scan shape of q_sim_topk; the fusion join runs on the
# O(queries × depth) rank lists only. At 100 TB each system's list
# comes from its own index (IVF for B); the fusion cost never touches
# the corpus.
_RRF_DEPTH = 10
_RRF_K = 5
_RRF_SCORE = (
    "(COALESCE(CAST(1 AS DOUBLE) / (60 + rank_a), CAST(0 AS DOUBLE))"
    " + COALESCE(CAST(1 AS DOUBLE) / (60 + rank_b), CAST(0 AS DOUBLE)))"
)


@_q(
    "q_rrf_fusion",
    f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec,
               [CAST(floor(CAST(e AS DOUBLE) * 127 + 0.5) AS BIGINT)
                FOR e IN embedding] AS q_q
        FROM embeddings WHERE vec_id < {_N_QUERIES}
    ), c AS (
        SELECT vec_id, embedding::DOUBLE[] AS vec,
               [CAST(floor(CAST(e AS DOUBLE) * 127 + 0.5) AS BIGINT)
                FOR e IN embedding] AS cq
        FROM embeddings
    ), a AS (
        SELECT q.q_id, c.vec_id AS neighbor_id,
               CAST(row_number() OVER (
                   PARTITION BY q.q_id
                   ORDER BY list_dot_product(c.vec, q.q_vec)
                            / (sqrt(list_dot_product(c.vec, c.vec))
                               * sqrt(list_dot_product(q.q_vec, q.q_vec)))
                            DESC, c.vec_id) AS INTEGER) AS rank_a
        FROM c CROSS JOIN q
        WHERE c.vec_id <> q.q_id
        QUALIFY rank_a <= {_RRF_DEPTH}
    ), b AS (
        SELECT q.q_id, c.vec_id AS neighbor_id,
               CAST(row_number() OVER (
                   PARTITION BY q.q_id
                   ORDER BY CAST(list_dot_product(c.cq, q.q_q) AS BIGINT)
                            DESC, c.vec_id) AS INTEGER) AS rank_b
        FROM c CROSS JOIN q
        WHERE c.vec_id <> q.q_id
        QUALIFY rank_b <= {_RRF_DEPTH}
    ), fused AS (
        SELECT COALESCE(a.q_id, b.q_id) AS q_id,
               COALESCE(a.neighbor_id, b.neighbor_id) AS neighbor_id,
               a.rank_a, b.rank_b, {_RRF_SCORE} AS rrf_score
        FROM a FULL OUTER JOIN b
          ON a.q_id = b.q_id AND a.neighbor_id = b.neighbor_id
    )
    SELECT q_id, neighbor_id, rank_a, rank_b, rrf_score,
           CAST(row_number() OVER (PARTITION BY q_id
                                   ORDER BY rrf_score DESC, neighbor_id)
                AS INTEGER) AS fused_rank
    FROM fused
    QUALIFY fused_rank <= {_RRF_K}
    """,
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from big_data_streaming_spark.functions.similarity import cosine

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
        F.expr(_q127("embedding")).alias("cq"),
    )
    q = F.broadcast(
        emb.where(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("q_id"),
            F.col("vec").alias("q_vec"),
            F.col("cq").alias("q_q"),
        )
    )
    pairs = emb.crossJoin(q).where(F.col("vec_id") != F.col("q_id"))
    wa = Window.partitionBy("q_id").orderBy(
        F.desc(cosine(F.col("vec"), F.col("q_vec"))), "vec_id"
    )
    a = (
        pairs.withColumn("rank_a", F.row_number().over(wa).cast("int"))
        .where(F.col("rank_a") <= _RRF_DEPTH)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rank_a")
    )
    int_dot = F.expr(_idot("cq", "q_q"))
    wb = Window.partitionBy("q_id").orderBy(F.desc(int_dot), "vec_id")
    b = (
        pairs.withColumn("rank_b", F.row_number().over(wb).cast("int"))
        .where(F.col("rank_b") <= _RRF_DEPTH)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rank_b")
    )
    fused = (
        a.join(b, ["q_id", "neighbor_id"], "full_outer")
        .withColumn("rrf_score", F.expr(_RRF_SCORE))
    )
    wf = Window.partitionBy("q_id").orderBy(F.desc("rrf_score"), "neighbor_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("int"))
        .where(F.col("fused_rank") <= _RRF_K)
        .select(
            "q_id", "neighbor_id", "rank_a", "rank_b", "rrf_score",
            "fused_rank",
        )
    )


# --- diversified re-ranking: Maximal Marginal Relevance (MMR) -------------
# The diversity layer a retrieval stack applies after scoring: greedily
# pick k results balancing relevance against redundancy with what is
# already selected — score = λ·rel − (1−λ)·max_sim_to_selected
# (Carbonell & Goldstein's MMR). The greedy loop is unrolled into k
# relational selection steps over the POOLED candidates only (top-8 per
# query), so the corpus is touched once by candidate generation and the
# iteration runs on an O(queries × pool) frame. Exactness: relevance
# and pairwise similarity are exact integer dots over 127-quantized
# vectors; the MMR score is ONE fixed-order double text; ties break on
# doc_id. rank-1 uses the same formula with max-sim := 0, so one text
# serves every step.
_MMR_NQ = 4
_MMR_POOL = 8
_MMR_SCORE = "(0.7 * CAST(rel AS DOUBLE) - 0.3 * CAST(msim AS DOUBLE))"


@_q(
    "q_mmr_rerank",
    f"""
    WITH c0 AS (
        SELECT vec_id,
               [CAST(floor(CAST(e AS DOUBLE) * 127 + 0.5) AS BIGINT)
                FOR e IN embedding] AS cq
        FROM embeddings
    ), q AS (
        SELECT vec_id AS q_id, cq AS q_q FROM c0 WHERE vec_id < {_MMR_NQ}
    ), scored AS (
        SELECT q.q_id, c0.vec_id AS doc_id, c0.cq,
               CAST(list_dot_product(c0.cq, q.q_q) AS BIGINT) AS rel
        FROM c0 CROSS JOIN q
        WHERE c0.vec_id <> q.q_id
    ), cand AS (
        SELECT q_id, doc_id, cq, rel
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY q_id
                                   ORDER BY rel DESC, doc_id) <= {_MMR_POOL}
    ), sims AS (
        SELECT a.q_id, a.doc_id AS a, b.doc_id AS b,
               CAST(list_dot_product(a.cq, b.cq) AS BIGINT) AS sim
        FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.doc_id <> b.doc_id
    ), s1 AS (
        SELECT q_id, doc_id, rel, CAST(0 AS BIGINT) AS msim
        FROM cand
        QUALIFY row_number() OVER (PARTITION BY q_id
                                   ORDER BY rel DESC, doc_id) = 1
    ), rem1 AS (
        SELECT c.q_id, c.doc_id, c.rel FROM cand c
        JOIN s1 ON c.q_id = s1.q_id AND c.doc_id <> s1.doc_id
    ), sc2 AS (
        SELECT r.q_id, r.doc_id, r.rel, sims.sim AS msim
        FROM rem1 r
        JOIN s1 ON r.q_id = s1.q_id
        JOIN sims ON sims.q_id = r.q_id AND sims.a = r.doc_id
                 AND sims.b = s1.doc_id
    ), s2 AS (
        SELECT q_id, doc_id, rel, msim
        FROM sc2
        QUALIFY row_number() OVER (PARTITION BY q_id
                                   ORDER BY {_MMR_SCORE} DESC, doc_id) = 1
    ), rem2 AS (
        SELECT r.q_id, r.doc_id, r.rel FROM rem1 r
        JOIN s2 ON r.q_id = s2.q_id AND r.doc_id <> s2.doc_id
    ), sc3 AS (
        SELECT r.q_id, r.doc_id, r.rel,
               CAST(MAX(sims.sim) AS BIGINT) AS msim
        FROM rem2 r
        JOIN s1 ON r.q_id = s1.q_id
        JOIN s2 ON r.q_id = s2.q_id
        JOIN sims ON sims.q_id = r.q_id AND sims.a = r.doc_id
                 AND sims.b IN (s1.doc_id, s2.doc_id)
        GROUP BY r.q_id, r.doc_id, r.rel
    ), s3 AS (
        SELECT q_id, doc_id, rel, msim
        FROM sc3
        QUALIFY row_number() OVER (PARTITION BY q_id
                                   ORDER BY {_MMR_SCORE} DESC, doc_id) = 1
    ), united AS (
        SELECT q_id, 1 AS mmr_rank, doc_id, rel, msim FROM s1
        UNION ALL SELECT q_id, 2, doc_id, rel, msim FROM s2
        UNION ALL SELECT q_id, 3, doc_id, rel, msim FROM s3
    )
    SELECT q_id, CAST(mmr_rank AS INTEGER) AS mmr_rank, doc_id, rel, msim,
           {_MMR_SCORE} AS mmr_score
    FROM united
    """,
)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(_q127("embedding")).alias("cq"),
    )
    q = F.broadcast(
        emb.where(F.col("vec_id") < _MMR_NQ).select(
            F.col("vec_id").alias("q_id"), F.col("cq").alias("q_q")
        )
    )

    def int_dot(a: str, b: str):
        return F.expr(_idot(a, b))

    scored = (
        emb.crossJoin(q)
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("doc_id"),
            "cq",
            int_dot("cq", "q_q").alias("rel"),
        )
    )
    wr = Window.partitionBy("q_id").orderBy(F.desc("rel"), "doc_id")
    cand = (
        scored.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= _MMR_POOL)
        .drop("rn")
        .persist()
    )
    a, b = cand.alias("a"), cand.alias("b")
    sims = (
        a.join(
            b,
            (F.col("a.q_id") == F.col("b.q_id"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.q_id").alias("q_id"),
            F.col("a.doc_id").alias("sa"),
            F.col("b.doc_id").alias("sb"),
            int_dot("a.cq", "b.cq").alias("sim"),
        )
        .persist()
    )

    def argmax(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("q_id").orderBy(
            F.desc(F.expr(_MMR_SCORE)), "doc_id"
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    flat = cand.select("q_id", "doc_id", "rel")
    s1 = argmax(flat.withColumn("msim", F.lit(0).cast("bigint")))
    rem1 = flat.join(
        s1.select("q_id", F.col("doc_id").alias("sel1")), "q_id"
    ).where(F.col("doc_id") != F.col("sel1"))
    sc2 = rem1.join(
        sims,
        (sims.q_id == rem1.q_id)
        & (sims.sa == rem1.doc_id)
        & (sims.sb == rem1.sel1),
    ).select(rem1.q_id, "doc_id", "rel", F.col("sim").alias("msim"))
    s2 = argmax(sc2)
    rem2 = rem1.join(
        s2.select("q_id", F.col("doc_id").alias("sel2")), "q_id"
    ).where(F.col("doc_id") != F.col("sel2"))
    sc3 = (
        rem2.join(
            sims,
            (sims.q_id == rem2.q_id)
            & (sims.sa == rem2.doc_id)
            & ((sims.sb == rem2.sel1) | (sims.sb == rem2.sel2)),
        )
        .groupBy(rem2.q_id, "doc_id", "rel")
        .agg(F.max("sim").cast("bigint").alias("msim"))
    )
    s3 = argmax(sc3)
    united = (
        s1.select("q_id", F.lit(1).alias("mmr_rank"), "doc_id", "rel", "msim")
        .unionAll(
            s2.select("q_id", F.lit(2).alias("mmr_rank"), "doc_id", "rel", "msim")
        )
        .unionAll(
            s3.select("q_id", F.lit(3).alias("mmr_rank"), "doc_id", "rel", "msim")
        )
    )
    return united.select(
        "q_id",
        F.col("mmr_rank").cast("int").alias("mmr_rank"),
        "doc_id",
        "rel",
        "msim",
        F.expr(_MMR_SCORE).alias("mmr_score"),
    )


# --- per-label centroid shift (embedding drift by group, round 4) ----------
# How far does each label's embedding centroid sit from the global
# centroid — the geometric drift check a training pipeline runs per
# source/label before mixing corpora (the vector-space complement to
# q_hellinger_drift's distributional form). Per-dim means come from the
# q_embed_dimstats 1e-6-quantized integer sums (order-free, cross-engine
# exact); the per-dim mean gaps are squared and re-quantized before the
# across-dims reduce (the q_chi2 integer-summation rule), so the final
# sqrt sees the identical double on both engines. Plan: ONE posexplode
# aggregate to (label × dims) + a broadcast of the dims-sized global
# row — no second corpus scan, no row shuffle beyond the tiny rollups.
@_q(
    "q_centroid_shift",
    f"""
    WITH x AS (
        SELECT label, CAST(t.i AS INTEGER) AS dim,
               CAST(embedding[t.i] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ), q AS (
        SELECT label, dim, {_DS_Q} AS xq FROM x
    ), per AS (
        SELECT label, dim, CAST(SUM(xq) AS BIGINT) AS sx,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM q GROUP BY label, dim
    ), gctr AS (
        SELECT dim, CAST(SUM(sx) AS BIGINT) AS gx,
               CAST(SUM(n) AS BIGINT) AS gn
        FROM per GROUP BY dim
    ), gap AS (
        SELECT per.label,
               CAST(SUM(CAST(floor(
                   (CAST(per.sx AS DOUBLE) / per.n
                    - CAST(gctr.gx AS DOUBLE) / gctr.gn)
                   * (CAST(per.sx AS DOUBLE) / per.n
                      - CAST(gctr.gx AS DOUBLE) / gctr.gn)
                   * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS ssq,
               CAST(MAX(per.n) AS BIGINT) AS n_vecs
        FROM per JOIN gctr USING (dim)
        GROUP BY per.label
    )
    SELECT label, n_vecs,
           sqrt(CAST(ssq AS DOUBLE) / 1000000.0) / 1000000.0
               AS centroid_shift
    FROM gap
    """,
)
def q_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = (
        t(spark, sf_dir, "embeddings")
        .select("label", F.posexplode("embedding").alias("pos", "f"))
        .select(
            "label",
            (F.col("pos") + 1).cast("int").alias("dim"),
            F.col("f").cast("double").alias("x"),
        )
    )
    q = x.withColumn("xq", F.expr(_DS_Q))
    per = q.groupBy("label", "dim").agg(
        F.sum("xq").cast("bigint").alias("sx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    glob = per.groupBy("dim").agg(
        F.sum("sx").cast("bigint").alias("gx"),
        F.sum("n").cast("bigint").alias("gn"),
    )
    d = (
        F.col("sx").cast("double") / F.col("n")
        - F.col("gx").cast("double") / F.col("gn")
    )
    gap = (
        per.join(F.broadcast(glob), "dim")
        .groupBy("label")
        .agg(
            F.sum(
                F.floor(d * d * 1000000 + F.lit(0.5)).cast("bigint")
            )
            .cast("bigint")
            .alias("ssq"),
            F.max("n").cast("bigint").alias("n_vecs"),
        )
    )
    return gap.select(
        "label",
        "n_vecs",
        (F.sqrt(F.col("ssq").cast("double") / 1000000.0) / 1000000.0).alias(
            "centroid_shift"
        ),
    )


# ===================== round-4 closing wave: retrieval evaluation ===========
# NDCG@10 and precision/recall/AP@10 complete the evaluation tier next to
# q_retrieval_mrr: MRR grades the first hit, NDCG the whole ranked prefix,
# AP the precision profile. Binary relevance (neighbor label == query
# label) over the same exact-cosine full ranking the MRR query uses.
#
# Exactness policy: the per-rank discount 1/log2(r+1) is transcendental,
# so both engines consume the SAME pre-computed integer literals
# W[r] = round(1e12 / log2(r+1)) (computed once in Python, injected into
# the Spark plan and the oracle SQL verbatim) — DCG/IDCG are then exact
# integer sums, order-free under any shuffle, and the final NDCG is one
# deterministic double division. Scale: the query side is broadcast, the
# corpus is scanned once, and the per-query ranking is a row_number
# window over (q_id) — the identical shape the green MRR query runs.
import math as _math

_NDCG_K = 10
_NDCG_W = [round(1e12 / _math.log2(r + 1)) for r in range(1, _NDCG_K + 1)]
_NDCG_P = [sum(_NDCG_W[: m + 1]) for m in range(_NDCG_K)]

# Shared ranking CTE text (mirrors q_retrieval_mrr's green oracle).
_EVAL_RANKED_SQL = f"""
    q AS (
        SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec, label AS q_label
        FROM embeddings WHERE vec_id < {_N_QUERIES}
    ), scored AS (
        SELECT q.q_id, q.q_label, e.vec_id AS neighbor_id, e.label,
               list_dot_product(e.embedding::DOUBLE[], q.q_vec)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.q_vec, q.q_vec))) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id >= {_N_QUERIES}
    ), ranked AS (
        SELECT q_id, q_label, neighbor_id, label,
               CAST(row_number() OVER (PARTITION BY q_id
                                       ORDER BY cosine DESC, neighbor_id)
                    AS BIGINT) AS rank
        FROM scored
    ), rel AS (
        SELECT q_id, q_label, rank,
               CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel
        FROM ranked
    ), nrel AS (
        SELECT q_id, CAST(SUM(rel) AS BIGINT) AS n_rel_corpus
        FROM rel GROUP BY q_id
    )
"""

_W_LIST = "[" + ", ".join(str(w) for w in _NDCG_W) + "]"
_P_LIST = "[" + ", ".join(str(p) for p in _NDCG_P) + "]"


@_q(
    "q_ndcg",
    f"""
    WITH {_EVAL_RANKED_SQL},
    dcg AS (
        SELECT q_id,
               CAST(SUM(rel) AS BIGINT) AS n_rel_10,
               CAST(SUM(CASE WHEN rel = 1
                             THEN list_extract({_W_LIST}, rank)
                             ELSE 0 END) AS BIGINT) AS dcg_q
        FROM rel WHERE rank <= {_NDCG_K} GROUP BY q_id
    )
    SELECT q.q_id, q.q_label, d.n_rel_10, n.n_rel_corpus, d.dcg_q,
           CAST(list_extract({_P_LIST}, least(n.n_rel_corpus, {_NDCG_K}))
                AS BIGINT) AS idcg_q,
           CAST(d.dcg_q AS DOUBLE)
             / CAST(list_extract({_P_LIST}, least(n.n_rel_corpus, {_NDCG_K}))
                    AS DOUBLE) AS ndcg_10
    FROM q JOIN dcg d ON q.q_id = d.q_id JOIN nrel n ON q.q_id = n.q_id
    """,
)
def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    corpus = emb.filter(F.col("vec_id") >= _N_QUERIES)
    ranked = cosine_topk(corpus, queries, k=None)
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    truth = queries.select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label")
    )
    rel = (
        ranked.join(F.broadcast(labels), "neighbor_id")
        .join(F.broadcast(truth), "q_id")
        .withColumn(
            "rel",
            F.when(F.col("n_label") == F.col("q_label"), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
    )
    nrel = rel.groupBy("q_id").agg(
        F.sum("rel").cast("bigint").alias("n_rel_corpus")
    )
    warr = F.array(*[F.lit(w) for w in _NDCG_W])
    parr = F.array(*[F.lit(p) for p in _NDCG_P])
    dcg = (
        rel.where(F.col("rank") <= _NDCG_K)
        .groupBy("q_id")
        .agg(
            F.sum("rel").cast("bigint").alias("n_rel_10"),
            F.sum(
                F.when(
                    F.col("rel") == 1,
                    F.element_at(warr, F.col("rank").cast("int")),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("dcg_q"),
        )
    )
    idcg = F.element_at(
        parr, F.least(F.col("n_rel_corpus"), F.lit(_NDCG_K)).cast("int")
    )
    return (
        truth.join(F.broadcast(dcg), "q_id")
        .join(F.broadcast(nrel), "q_id")
        .select(
            "q_id",
            "q_label",
            "n_rel_10",
            "n_rel_corpus",
            "dcg_q",
            idcg.cast("bigint").alias("idcg_q"),
            (F.col("dcg_q").cast("double") / idcg.cast("double")).alias(
                "ndcg_10"
            ),
        )
    )


# Precision@10, recall@10, and average precision@10 per query. AP terms
# are precision-at-relevant-rank rationals; each is ONE double division
# then floor-quantized to a 1e-12 integer, so the per-query sum is
# order-free and exact; the finish is two deterministic divisions.
@_q(
    "q_precision_at_k",
    f"""
    WITH {_EVAL_RANKED_SQL},
    cum AS (
        SELECT q_id, rank, rel,
               CAST(SUM(rel) OVER (PARTITION BY q_id ORDER BY rank)
                    AS BIGINT) AS cum_rel
        FROM rel
    ), top AS (
        SELECT q_id,
               CAST(SUM(rel) AS BIGINT) AS n_rel_10,
               CAST(SUM(CASE WHEN rel = 1
                             THEN CAST(floor(1000000000000.0 * cum_rel / rank
                                             + 0.5) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS ap_num_q
        FROM cum WHERE rank <= {_NDCG_K} GROUP BY q_id
    )
    SELECT t.q_id, q.q_label, t.n_rel_10, n.n_rel_corpus,
           CAST(t.n_rel_10 AS DOUBLE) / {_NDCG_K}.0 AS precision_10,
           CAST(t.n_rel_10 AS DOUBLE) / n.n_rel_corpus AS recall_10,
           CAST(t.ap_num_q AS DOUBLE) / least(n.n_rel_corpus, {_NDCG_K})
             / 1000000000000.0 AS ap_10
    FROM top t JOIN q ON t.q_id = q.q_id JOIN nrel n ON t.q_id = n.q_id
    """,
)
def q_precision_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    corpus = emb.filter(F.col("vec_id") >= _N_QUERIES)
    ranked = cosine_topk(corpus, queries, k=None)
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    truth = queries.select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label")
    )
    rel = (
        ranked.join(F.broadcast(labels), "neighbor_id")
        .join(F.broadcast(truth), "q_id")
        .withColumn(
            "rel",
            F.when(F.col("n_label") == F.col("q_label"), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
    )
    nrel = rel.groupBy("q_id").agg(
        F.sum("rel").cast("bigint").alias("n_rel_corpus")
    )
    w = Window.partitionBy("q_id").orderBy("rank")
    cum = rel.withColumn("cum_rel", F.sum("rel").over(w).cast("bigint"))
    ap_term = F.floor(
        F.lit(1000000000000.0) * F.col("cum_rel") / F.col("rank") + F.lit(0.5)
    ).cast("bigint")
    top = (
        cum.where(F.col("rank") <= _NDCG_K)
        .groupBy("q_id")
        .agg(
            F.sum("rel").cast("bigint").alias("n_rel_10"),
            F.sum(F.when(F.col("rel") == 1, ap_term).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("ap_num_q"),
        )
    )
    return (
        top.join(F.broadcast(truth), "q_id")
        .join(F.broadcast(nrel), "q_id")
        .select(
            "q_id",
            "q_label",
            "n_rel_10",
            "n_rel_corpus",
            (F.col("n_rel_10").cast("double") / F.lit(float(_NDCG_K))).alias(
                "precision_10"
            ),
            (
                F.col("n_rel_10").cast("double") / F.col("n_rel_corpus")
            ).alias("recall_10"),
            (
                F.col("ap_num_q").cast("double")
                / F.least(F.col("n_rel_corpus"), F.lit(_NDCG_K))
                / F.lit(1000000000000.0)
            ).alias("ap_10"),
        )
    )


# --- k-center coreset selection (farthest-first traversal, round 4) ---------
# The embedding-space twin of q_maxcover_select's token coverage:
# greedily pick the point FARTHEST from everything picked so far
# (Gonzalez's 2-approximation for k-center) — the classic diverse-
# coreset curation step for training-set subsampling. Components are
# 1e-4-quantized once (the q_maxsim policy), so every pairwise
# distance² is an exact integer and min/argmax chains are total-order
# deterministic (ties → lower vec_id). Seed = vec_id 0; 8 subsequent
# picks; each pick's selection distance is the shrinking coverage
# radius. Scale: per step ONE broadcast of the new center's 64
# components against the exploded corpus (O(n·dims) grouped rows), the
# running min-distance relation localCheckpoints per step, and the
# argmax collects ONE row (BPE precedent) — never a pairwise n² join.
_KC_PICKS = 8
_KC_SCALE = 10_000


def _kc_comp_sql() -> str:
    return f"""
    comp AS MATERIALIZED (
        SELECT vec_id, g.i AS dim,
               CAST(floor(CAST(embedding[g.i] AS DOUBLE) * {_KC_SCALE} + 0.5)
                    AS BIGINT) AS q
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
    )"""


def _kcenter_oracle() -> str:
    parts = [_kc_comp_sql()]
    parts.append(
        """
    d0 AS MATERIALIZED (
        SELECT comp.vec_id,
               CAST(SUM((comp.q - c.q) * (comp.q - c.q)) AS BIGINT) AS mind
        FROM comp
        JOIN (SELECT dim, q FROM comp WHERE vec_id = 0) c USING (dim)
        GROUP BY comp.vec_id
    )"""
    )
    picks = []
    for k in range(1, _KC_PICKS + 1):
        parts.append(
            f"""
    s{k} AS MATERIALIZED (
        SELECT vec_id, mind FROM d{k - 1}
        ORDER BY mind DESC, vec_id LIMIT 1
    )"""
        )
        picks.append(
            f"SELECT {k} AS step, vec_id, mind AS radius_q FROM s{k}"
        )
        if k < _KC_PICKS:
            parts.append(
                f"""
    d{k} AS MATERIALIZED (
        SELECT d.vec_id, least(d.mind, nd.nd) AS mind
        FROM d{k - 1} d
        JOIN (
            SELECT comp.vec_id,
                   CAST(SUM((comp.q - c.q) * (comp.q - c.q)) AS BIGINT) AS nd
            FROM comp
            JOIN (SELECT dim, q FROM comp
                  WHERE vec_id = (SELECT vec_id FROM s{k})) c USING (dim)
            GROUP BY comp.vec_id
        ) nd ON d.vec_id = nd.vec_id
    )"""
            )
    union = " UNION ALL ".join(picks)
    return f"""
    WITH {', '.join(parts)}
    SELECT step, vec_id, radius_q,
           sqrt(CAST(radius_q AS DOUBLE)) / {_KC_SCALE}.0 AS radius
    FROM ({union})
    """


@_q("q_kcenter_select", _kcenter_oracle())
def q_kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType, StructField, StructType

    emb = t(spark, sf_dir, "embeddings")
    comp = (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "f"))
        .select(
            "vec_id",
            (F.col("pos") + 1).cast("bigint").alias("dim"),
            F.floor(F.col("f").cast("double") * _KC_SCALE + F.lit(0.5))
            .cast("bigint")
            .alias("q"),
        )
        .persist()
    )

    def dist_to(center_id: int):
        c = comp.where(F.col("vec_id") == center_id).select(
            "dim", F.col("q").alias("qc")
        )
        return (
            comp.join(F.broadcast(c), "dim")
            .groupBy("vec_id")
            .agg(
                F.sum(
                    (F.col("q") - F.col("qc")) * (F.col("q") - F.col("qc"))
                )
                .cast("bigint")
                .alias("nd")
            )
        )

    mind = dist_to(0).withColumnRenamed("nd", "mind").localCheckpoint()
    picks = []
    for k in range(1, _KC_PICKS + 1):
        top = mind.orderBy(F.desc("mind"), "vec_id").limit(1).collect()[0]
        picks.append((k, top["vec_id"], top["mind"]))  # 1 row per step
        if k < _KC_PICKS:
            nd = dist_to(int(top["vec_id"]))
            mind = (
                mind.join(nd, "vec_id")
                .select("vec_id", F.least("mind", "nd").alias("mind"))
                .localCheckpoint()
            )
    schema = StructType(
        [
            StructField("step", LongType()),
            StructField("vec_id", LongType()),
            StructField("radius_q", LongType()),
        ]
    )
    out = spark.createDataFrame(picks, schema)
    return out.select(
        "step",
        "vec_id",
        "radius_q",
        (
            F.sqrt(F.col("radius_q").cast("double")) / F.lit(float(_KC_SCALE))
        ).alias("radius"),
    )


# --- simplified silhouette by label (round 4) ------------------------------
# Clustering-quality audit over the labeled embedding space: the
# SIMPLIFIED silhouette (distance to centroids, the O(n·k) form that
# survives 100 TB — classic all-pairs silhouette is O(n²) and is
# exactly what this variant exists to avoid), on squared Euclidean
# distance (documented; monotone in the Euclidean form per centroid).
# Exactness: dims quantized at 1e-6 so centroid sums are exact BIGINTs;
# the centroid mean and per-dim squared deviation are shared-text IEEE
# expressions; per-(vector, centroid) distances are 1e-12-quantized
# integer sums over dims (order-free); the per-label mean silhouette is
# a 1e-9-quantized integer mean. Plan: one posexplode scan → a 640-row
# broadcast centroid relation → one combinable (vec, label) fold; no
# vector ever meets another vector.
_SIL_M = "(CAST(sq AS DOUBLE) / CAST(cn AS DOUBLE) / 1000000.0)"
_SIL_TERM = (
    "CAST(floor((x - m) * (x - m) * 1000000000000.0 + 0.5) AS BIGINT)"
)
_SIL_S = (
    "(CASE WHEN greatest(a_q, b_q) = 0 THEN 0.0"
    " ELSE CAST(b_q - a_q AS DOUBLE) / CAST(greatest(a_q, b_q) AS DOUBLE)"
    " END)"
)
_SIL_MEAN = "(CAST(ssq AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000.0)"


@_q(
    "q_silhouette",
    f"""
    WITH x AS (
        SELECT vec_id, label, CAST(t.i AS INTEGER) AS dim,
               CAST(embedding[t.i] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ), q AS (
        SELECT vec_id, label, dim, x,
               CAST(floor(x * 1000000.0 + 0.5) AS BIGINT) AS xq
        FROM x
    ), cent AS (
        SELECT label AS cent_label, dim,
               CAST(COUNT(*) AS BIGINT) AS cn,
               CAST(SUM(xq) AS BIGINT) AS sq
        FROM q GROUP BY 1, 2
    ), cm AS (
        SELECT cent_label, dim, {_SIL_M} AS m FROM cent
    ), terms AS (
        SELECT q.vec_id, q.label, cm.cent_label, {_SIL_TERM} AS term
        FROM q JOIN cm ON q.dim = cm.dim
    ), d2 AS (
        SELECT vec_id, label, cent_label,
               CAST(SUM(term) AS BIGINT) AS d2q
        FROM terms GROUP BY 1, 2, 3
    ), ab AS (
        SELECT vec_id, label,
               CAST(MAX(CASE WHEN cent_label = label THEN d2q END)
                    AS BIGINT) AS a_q,
               CAST(MIN(CASE WHEN cent_label <> label THEN d2q END)
                    AS BIGINT) AS b_q
        FROM d2 GROUP BY 1, 2
    ), s AS (
        SELECT label,
               CAST(floor({_SIL_S} * 1000000000.0 + 0.5) AS BIGINT) AS sq_i
        FROM ab
    ), agg AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(sq_i) AS BIGINT) AS ssq
        FROM s GROUP BY label
    )
    SELECT label, n, {_SIL_MEAN} AS mean_silhouette
    FROM agg ORDER BY label
    """,
)
def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "f")
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("f").cast("double").alias("x"),
    )
    q = x.withColumn(
        "xq", F.expr("CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)")
    )
    cent = q.groupBy(
        F.col("label").alias("cent_label"), F.col("dim")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("cn"),
        F.sum("xq").cast("bigint").alias("sq"),
    )
    cm = cent.selectExpr("cent_label", "dim", f"{_SIL_M} AS m")
    terms = q.join(F.broadcast(cm), "dim").selectExpr(
        "vec_id", "label", "cent_label", f"{_SIL_TERM} AS term"
    )
    d2 = terms.groupBy("vec_id", "label", "cent_label").agg(
        F.sum("term").cast("bigint").alias("d2q")
    )
    ab = d2.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("cent_label") == F.col("label"), F.col("d2q"))
        )
        .cast("bigint")
        .alias("a_q"),
        F.min(
            F.when(F.col("cent_label") != F.col("label"), F.col("d2q"))
        )
        .cast("bigint")
        .alias("b_q"),
    )
    s = ab.selectExpr(
        "label",
        f"CAST(floor({_SIL_S} * 1000000000.0 + 0.5) AS BIGINT) AS sq_i",
    )
    agg = s.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("sq_i").cast("bigint").alias("ssq"),
    )
    return agg.selectExpr(
        "label", "n", f"{_SIL_MEAN} AS mean_silhouette"
    ).orderBy("label")


# --- per-label medoid selection (round 4) ----------------------------------
# The representative-example picker (dataset cards, few-shot exemplar
# mining): within each label, the vector minimizing the summed squared
# distance to its peers. Distances use the polarization identity
# d²(i,j) = <i,i> + <j,j> - 2<i,j> on the engines' identical left-fold
# dot products, then 1e-9 quantization makes the per-candidate sum an
# order-free exact integer; argmin breaks ties by vec_id. Plan: the
# pair join is WITHIN-label only (bounded by cluster size, the same
# policy as q_entity_resolution's blocked verify — never a global
# all-pairs); self-dots are computed once per row on the scan.
_MED_D2 = "(dda + ddb - 2.0 * dot)"
_MED_MEAN = "(CAST(s AS DOUBLE) / CAST(n_others AS DOUBLE) / 1000000000.0)"


@_q(
    "q_medoid",
    f"""
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])
                   AS dd
        FROM embeddings
    ), pairs AS (
        SELECT a.label, a.vec_id,
               a.dd AS dda, b.dd AS ddb,
               list_dot_product(a.v, b.v) AS dot
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
    ), per AS (
        SELECT label, vec_id,
               CAST(COUNT(*) AS BIGINT) AS n_others,
               CAST(SUM(CAST(floor({_MED_D2} * 1000000000.0 + 0.5)
                             AS BIGINT)) AS BIGINT) AS s
        FROM pairs GROUP BY 1, 2
    ), rk AS (
        SELECT label, vec_id, n_others, s,
               row_number() OVER (PARTITION BY label ORDER BY s, vec_id)
                   AS rn
        FROM per
    )
    SELECT label, vec_id AS medoid_id,
           CAST(n_others + 1 AS BIGINT) AS cluster_size,
           {_MED_MEAN} AS mean_d2
    FROM rk WHERE rn = 1 ORDER BY label
    """,
)
def q_medoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from big_data_streaming_spark.functions.similarity import dot

    # tr(): the within-label pairwise distance kernel fused into the
    # single scan task (round-12 sweep); A/B 3.4 -> 0.7 s at sf0.1.
    emb = tr(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").alias("v"),
        dot(F.col("embedding"), F.col("embedding")).alias("dd"),
    )
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.label").alias("label"),
        F.col("a.vec_id").alias("vec_id"),
        F.col("a.dd").alias("dda"),
        F.col("b.dd").alias("ddb"),
        dot(F.col("a.v"), F.col("b.v")).alias("dot"),
    )
    per = pairs.groupBy("label", "vec_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_others"),
        F.sum(
            F.expr(f"CAST(floor({_MED_D2} * 1000000000.0 + 0.5) AS BIGINT)")
        )
        .cast("bigint")
        .alias("s"),
    )
    rk = per.select(
        "label",
        "vec_id",
        "n_others",
        "s",
        F.row_number()
        .over(Window.partitionBy("label").orderBy("s", "vec_id"))
        .alias("rn"),
    )
    return (
        rk.where(F.col("rn") == 1)
        .selectExpr(
            "label",
            "vec_id AS medoid_id",
            "CAST(n_others + 1 AS BIGINT) AS cluster_size",
            f"{_MED_MEAN} AS mean_d2",
        )
        .orderBy("label")
    )


# --- Johnson-Lindenstrauss projection distortion audit (round 4) ------------
# Before trusting an 8-dim random projection for coarse ANN routing,
# measure what it does to pairwise geometry: for a bounded pair panel
# (vec_id < 40), compare the projected squared distance (scaled by
# 1/k) against the true one. The SAME 8 fixed Gaussian hyperplanes
# (fixed_hyperplanes seed=42) enter BOTH engines as full-precision
# literals; projections and true distances are the engines' identical
# left-fold dots; the distortion ratios are identically-computed
# doubles, summarized by a 1e-9-quantized mean |ratio−1| and an
# element-selected median; the reported median/max ratios round to
# 9 dp (the q_sim_topk last-ulp absolution — the fold can differ by
# one ulp between engines on adversarial values). Plan: projections are per-row folds on the
# scan; the pair stage is the bounded 40-vector panel (the documented
# audit-panel policy), never the corpus.
_JL_K = 8
_JL_PANEL = 40


def _jl_planes() -> list[list[float]]:
    from big_data_streaming_spark.functions.similarity import (
        fixed_hyperplanes,
    )

    return fixed_hyperplanes(64, n=_JL_K, seed=42)


def _jl_proj_sql() -> str:
    cols = []
    for j, hp in enumerate(_jl_planes()):
        lit = "[" + ", ".join(repr(float(v)) for v in hp) + "]::DOUBLE[]"
        cols.append(
            f"list_dot_product(embedding::DOUBLE[], {lit}) AS p{j}"
        )
    return ",\n               ".join(cols)


_JL_DPROJ = "(" + " + ".join(
    f"(a.p{j} - b.p{j}) * (a.p{j} - b.p{j})" for j in range(_JL_K)
) + ")"
_JL_RATIO = f"({_JL_DPROJ} / ({_JL_K}.0 * (a.dd + b.dd - 2.0 * dot)))"


def _jl_oracle() -> str:
    return f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS vec,
               list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])
                   AS dd,
               {_jl_proj_sql()}
        FROM embeddings WHERE vec_id < {_JL_PANEL}
    ), pairs AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               {_JL_RATIO.replace('dot', 'list_dot_product(a.vec, b.vec)')}
                   AS ratio
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE (a.dd + b.dd
               - 2.0 * list_dot_product(a.vec, b.vec)) > 0.0
    ), q AS (
        SELECT ratio,
               CAST(floor(abs(ratio - 1.0) * 1000000000.0 + 0.5) AS BIGINT)
                   AS devq,
               row_number() OVER (ORDER BY ratio, ia, ib) AS rn,
               COUNT(*) OVER () AS n
        FROM pairs
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
           CAST(SUM(devq) AS DOUBLE) / (CAST(MAX(n) AS DOUBLE)
               * 1000000000.0) AS mean_abs_distortion,
           round(MAX(CASE WHEN rn = (n + 1) // 2 THEN ratio END), 9)
               AS median_ratio,
           round(MAX(ratio), 9) AS max_ratio
    FROM q
    """


@_q("q_jl_audit", _jl_oracle())
def q_jl_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from big_data_streaming_spark.functions.similarity import dot

    emb = t(spark, sf_dir, "embeddings").where(F.col("vec_id") < _JL_PANEL)
    planes = _jl_planes()
    projs = [
        dot(
            F.col("embedding"),
            F.array(*[F.lit(float(x)) for x in hp]),
        ).alias(f"p{j}")
        for j, hp in enumerate(planes)
    ]
    v = emb.select(
        "vec_id",
        F.col("embedding").alias("vec"),
        dot(F.col("embedding"), F.col("embedding")).alias("dd"),
        *projs,
    )
    a = v.alias("a")
    b = v.alias("b")
    pairs = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("dot", dot(F.col("a.vec"), F.col("b.vec")))
        .where((F.col("a.dd") + F.col("b.dd") - 2.0 * F.col("dot")) > 0.0)
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            F.expr(_JL_RATIO).alias("ratio"),
        )
    )
    q = pairs.select(
        "ratio",
        "ia",
        "ib",
        F.expr(
            "CAST(floor(abs(ratio - 1.0) * 1000000000.0 + 0.5) AS BIGINT)"
        ).alias("devq"),
    )
    # the audited pair set is corpus-shaped: median rank + total via
    # the range-partitioned ranker (plans/rank.py)
    q = global_rank(q, ["ratio", "ia", "ib"], rank_col="rn", total_col="n")
    return q.agg(
        F.max("n").cast("bigint").alias("n_pairs"),
        (
            F.sum("devq").cast("double")
            / (F.max("n").cast("double") * 1000000000.0)
        ).alias("mean_abs_distortion"),
        F.round(
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("ratio")
                )
            ),
            9,
        ).alias("median_ratio"),
        F.round(F.max("ratio"), 9).alias("max_ratio"),
    )


# --- per-label centroid outliers, exact integer L1 (round 6) -----------------
# The embedding-quality scan a training pipeline runs on labeled
# clusters: which vectors sit farthest from their label centroid?
# Exactness at the float boundary: dims quantize to integer micro-units
# (floor(x·1e6 + 0.5), the q_embed_dimstats idiom), the centroid is
# held as the RATIONAL (S_dim, n) pair, and the scaled L1 distance
# Σ_dim |q·n − S_dim| is a pure BIGINT (≤ 64 · 2q·n ≈ 1.7e11 at sf1 —
# far inside int64; the L2 square would overflow, which is why this is
# the L1 audit). Top-3 per label via a PARTITIONED rank. Plan: explode
# to (label, dim) partials (64·|labels| rows), broadcast back, one
# vector-level aggregate.
@_q(
    "q_embed_outliers",
    """
    WITH q AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                             AS BIGINT)) AS qv
        FROM embeddings
    ), d AS (
        SELECT vec_id, label, unnest(qv) AS v,
               generate_subscripts(qv, 1) AS i
        FROM q
    ), s AS (
        SELECT label, i, CAST(SUM(v) AS BIGINT) AS sv,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM d GROUP BY 1, 2
    ), dist AS (
        SELECT d.vec_id, d.label,
               CAST(SUM(ABS(d.v * s.n - s.sv)) AS BIGINT) AS l1q,
               CAST(MAX(s.n) AS BIGINT) AS n
        FROM d JOIN s ON d.label = s.label AND d.i = s.i
        GROUP BY 1, 2
    )
    SELECT label, vec_id, l1q,
           CAST(l1q AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
               AS l1_distance,
           CAST(rk AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                     ORDER BY l1q DESC, vec_id) AS rk
        FROM dist
    ) WHERE rk <= 3
    """,
)
def q_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = t(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
            " * 1000000 + 0.5) AS BIGINT))"
        ).alias("qv"),
    )
    d = q.select(
        "vec_id", "label", F.posexplode("qv").alias("i0", "v")
    ).select("vec_id", "label", (F.col("i0") + 1).alias("i"), "v")
    s = d.groupBy("label", "i").agg(
        F.sum("v").cast("bigint").alias("sv"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    dist = (
        d.join(F.broadcast(s), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.abs(F.col("v") * F.col("n") - F.col("sv")))
            .cast("bigint")
            .alias("l1q"),
            F.max("n").cast("bigint").alias("n"),
        )
    )
    rk = dist.select(
        "label",
        "vec_id",
        "l1q",
        (F.col("l1q").cast("double") / (F.col("n").cast("double") * 1e6)).alias(
            "l1_distance"
        ),
        F.row_number()
        .over(Window.partitionBy("label").orderBy(F.desc("l1q"), "vec_id"))
        .cast("bigint")
        .alias("rank"),
    )
    return rk.where(F.col("rank") <= 3)


# --- stride-pair distance profile (round 6) ----------------------------------
# The LINEAR-cost companion to q_jl_audit's all-pairs audit: distance
# distribution over deterministic stride pairs (i, i+s) for strides
# 1/17/289 — O(n) pairs per stride at any corpus size, never n². Dims
# quantize to integer micro-units; squared L2 of a pair stays BIGINT
# (64 · (1.2e6)² ≈ 9e13); means are single divisions of exact sums.
@_q(
    "q_embed_stride_distances",
    """
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                             AS BIGINT)) AS qv
        FROM embeddings
    ), strides AS (
        SELECT CAST(g.x AS BIGINT) AS stride
        FROM (VALUES (1), (17), (289)) g(x)
    ), pairs AS (
        SELECT s.stride, a.vec_id,
               CAST(list_sum(list_transform(
                   list_zip(a.qv, b.qv),
                   p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS d2q
        FROM strides s
        JOIN q a ON TRUE
        JOIN q b ON b.vec_id = a.vec_id + s.stride
    )
    SELECT stride,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(d2q) AS BIGINT) AS sum_d2q,
           CAST(MIN(d2q) AS BIGINT) AS min_d2q,
           CAST(MAX(d2q) AS BIGINT) AS max_d2q,
           CAST(SUM(d2q) AS DOUBLE)
               / (COUNT(*) * 1000000.0 * 1000000.0) AS mean_sq_dist
    FROM pairs GROUP BY stride
    """,
)
def q_embed_stride_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
            " * 1000000 + 0.5) AS BIGINT))"
        ).alias("qv"),
    )
    strides = F.broadcast(
        q.sparkSession.createDataFrame([(1,), (17,), (289,)], "stride long")
    )
    a = q.select("vec_id", F.col("qv").alias("qa")).crossJoin(strides)
    b = q.select(
        F.col("vec_id").alias("vb"), F.col("qv").alias("qb")
    )
    pairs = a.join(
        b, F.col("vb") == F.col("vec_id") + F.col("stride")
    ).select(
        "stride",
        F.expr(
            "CAST(aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS BIGINT)"
        ).alias("d2q"),
    )
    return pairs.groupBy("stride").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("d2q").cast("bigint").alias("sum_d2q"),
        F.min("d2q").cast("bigint").alias("min_d2q"),
        F.max("d2q").cast("bigint").alias("max_d2q"),
        (
            F.sum("d2q").cast("double")
            / (F.count(F.lit(1)) * F.lit(1e6) * F.lit(1e6))
        ).alias("mean_sq_dist"),
    )


# --- per-dimension sign balance profile (round 7) ---------------------------
# SimHash/bit-quantization pre-flight: a dimension whose signs are
# heavily imbalanced contributes near-zero entropy to a sign-bit
# fingerprint (every doc hashes the same bit), so the audit reports the
# per-dimension positive/negative/zero counts and the positive share.
# float32 sign tests are exact — no quantization needed. One dim-keyed
# aggregate, map-side combinable; output is O(dims).
@_q(
    "q_embed_bit_profile",
    """
    WITH x AS (
        SELECT CAST(t.i AS INTEGER) AS dim,
               CAST(embedding[t.i] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    )
    SELECT dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
           CAST(SUM(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
           CAST(SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS pos_share
    FROM x GROUP BY dim
    """,
)
def q_embed_bit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = (
        t(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("pos", "f"))
        .select(
            (F.col("pos") + 1).cast("int").alias("dim"),
            F.col("f").cast("double").alias("x"),
        )
    )
    pos = F.sum(F.when(F.col("x") > 0, 1).otherwise(0))
    return x.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        pos.cast("bigint").alias("n_pos"),
        F.sum(F.when(F.col("x") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_neg"),
        F.sum(F.when(F.col("x") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
        (pos.cast("double") / F.count(F.lit(1))).alias("pos_share"),
    )


# --- per-label Fisher separability scatter (round 7) -------------------------
# Embedding-quality audit for labeled corpora: how far is each label's
# centroid from the global centroid, relative to the label's internal
# spread? Everything is DENOMINATOR-CLEARED exact integers on
# 1e3-quantized components (the q_embed_dimstats quantize idiom, coarser
# so every squared term stays in bigint):
#   within_x_n  = n_l * sum(q^2 over label) - sum_d s_ld^2
#                 (= n_l^2 * mean squared distance to own centroid)
#   between_x_s = sum_d (N * s_ld - n_l * g_d)^2
#                 (= (n_l*N)^2 * squared centroid-to-global distance)
# The normalized doubles divide those integers in one fixed-order
# expression shared by both engines. Plan: one (label, dim) aggregate
# over the exploded components; the O(dims) global sums and O(labels)
# counts broadcast back. Never a pairwise or per-row second pass.
_SCAT_Q = "CAST(floor(x * 1000 + 0.5) AS BIGINT)"
_SCAT_SEP = (
    "(CAST(between_x_s AS DOUBLE)"
    " / (CAST(n_all AS DOUBLE) * CAST(n_all AS DOUBLE))"
    " / nullif(CAST(within_x_n AS DOUBLE), 0))"
)


@_q(
    "q_embed_class_scatter",
    f"""
    WITH x AS (
        SELECT label, CAST(t.i AS INTEGER) AS dim,
               CAST(embedding[t.i] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ), q AS (
        SELECT label, dim, {_SCAT_Q} AS q FROM x
    ), ld AS (
        SELECT label, dim,
               CAST(SUM(q) AS BIGINT) AS s_ld,
               CAST(SUM(q * q) AS BIGINT) AS ssq_ld,
               CAST(COUNT(*) AS BIGINT) AS n_l
        FROM q GROUP BY label, dim
    ), g AS (
        SELECT dim, CAST(SUM(s_ld) AS BIGINT) AS g_d,
               CAST(SUM(n_l) AS BIGINT) AS n_all
        FROM ld GROUP BY dim
    )
    SELECT label,
           CAST(MAX(ld.n_l) AS BIGINT) AS n,
           CAST(MAX(ld.n_l) * SUM(ssq_ld) - SUM(s_ld * s_ld) AS BIGINT)
               AS within_x_n,
           CAST(SUM((g.n_all * s_ld - ld.n_l * g.g_d)
                    * (g.n_all * s_ld - ld.n_l * g.g_d)) AS BIGINT)
               AS between_x_s,
           CAST(MAX(g.n_all) AS BIGINT) AS n_all,
           (CAST(SUM((g.n_all * s_ld - ld.n_l * g.g_d)
                     * (g.n_all * s_ld - ld.n_l * g.g_d)) AS DOUBLE)
            / (CAST(MAX(g.n_all) AS DOUBLE) * CAST(MAX(g.n_all) AS DOUBLE))
            / nullif(CAST(MAX(ld.n_l) * SUM(ssq_ld) - SUM(s_ld * s_ld)
                          AS DOUBLE), 0)) AS separability
    FROM ld JOIN g USING (dim)
    GROUP BY label
    """,
)
def q_embed_class_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = (
        t(spark, sf_dir, "embeddings")
        .select("label", F.posexplode("embedding").alias("pos", "f"))
        .select(
            "label",
            (F.col("pos") + 1).cast("int").alias("dim"),
            F.col("f").cast("double").alias("x"),
        )
    )
    q = x.withColumn("q", F.expr(_SCAT_Q))
    ld = q.groupBy("label", "dim").agg(
        F.sum("q").cast("bigint").alias("s_ld"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("ssq_ld"),
        F.count(F.lit(1)).cast("bigint").alias("n_l"),
    )
    g = ld.groupBy("dim").agg(
        F.sum("s_ld").cast("bigint").alias("g_d"),
        F.sum("n_l").cast("bigint").alias("n_all"),
    )
    dev = F.col("n_all") * F.col("s_ld") - F.col("n_l") * F.col("g_d")
    per = ld.join(F.broadcast(g), "dim").groupBy("label").agg(
        F.max("n_l").cast("bigint").alias("n"),
        (F.max("n_l") * F.sum("ssq_ld") - F.sum(F.col("s_ld") * F.col("s_ld")))
        .cast("bigint")
        .alias("within_x_n"),
        F.sum(dev * dev).cast("bigint").alias("between_x_s"),
        F.max("n_all").cast("bigint").alias("n_all"),
    )
    return per.select(
        "label", "n", "within_x_n", "between_x_s", "n_all",
        F.expr(_SCAT_SEP).alias("separability"),
    )
