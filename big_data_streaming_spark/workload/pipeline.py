"""Training-data pipeline operators beyond dedup/similarity: benchmark
contamination detection, PII scrubbing, repetition quality signals.

These are the remaining first-class citizens of a 100 TB pretraining
pipeline (north-star mandate, VERDICT round 1 "LLM-data-pipeline
operators" table): before training you (1) drop documents that leak the
eval benchmarks, (2) redact PII, (3) kill degenerate/repetitive text.
All three are expressed with built-in functions only (whole-stage
codegen, no Python) and carry exact DuckDB oracles.

Scale notes:
* Contamination is a shingle equi-join: corpus side shuffles once on the
  shingle hash; the benchmark side is tiny (eval sets are KBs) →
  broadcast. At 100 TB the corpus side streams through the join —
  never materialize the shingle set.
* PII scrub is a pure map (regexp_replace) — embarrassingly parallel,
  zero shuffles.
* Repetition signals need one explode + one (doc, token) aggregate —
  the same shape as TF-IDF's first stage; partial aggregation absorbs
  the token fan-out map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_streaming_spark.workload.common import t

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_SHINGLE = 8  # tokens per contamination shingle

# --- north star: benchmark contamination check ----------------------------
# "Benchmark" = a deterministic, SQL-expressible subset (doc_id % 10 = 0
# stands in for the eval set). A corpus document is contaminated when it
# shares ≥1 full 8-token shingle with any benchmark document. Output: the
# contaminated corpus docs with the overlap count — exact string-equality
# shingles, so Spark and DuckDB agree bit-for-bit.
@_q(
    "q_contamination",
    f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents
    ), shingles AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(0, len(toks) - {_SHINGLE} + 1),
                   i -> array_to_string(toks[i + 1 : i + {_SHINGLE}], ' ')
               )) AS shingle
        FROM tok
        WHERE len(toks) >= {_SHINGLE}
    ), bench AS (
        SELECT DISTINCT shingle FROM shingles WHERE doc_id % 10 = 0
    )
    SELECT s.doc_id,
           COUNT(DISTINCT s.shingle) AS n_hit_shingles
    FROM shingles s JOIN bench b USING (shingle)
    WHERE s.doc_id % 10 <> 0
    GROUP BY s.doc_id
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    shingles = (
        d.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= _SHINGLE)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - _SHINGLE),
                    lambda i: F.array_join(
                        F.slice(F.col("toks"), i + 1, _SHINGLE), " "
                    ),
                )
            ).alias("shingle"),
        )
    )
    bench = (
        shingles.where(F.col("doc_id") % 10 == 0).select("shingle").distinct()
    )
    return (
        shingles.where(F.col("doc_id") % 10 != 0)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_hit_shingles"))
    )


# --- north star: PII scrub -------------------------------------------------
# Regex redaction of emails and US-SSN-shaped tokens. The fixture corpus
# has no PII, so the query PLANTS one deterministic email per document
# (derived from doc_id) before scrubbing — the redaction path is then
# exercised on every row and the count is exactly checkable. Patterns are
# kept to the RE2-compatible common subset (no lookaround) so the Java
# and DuckDB regex engines agree.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_SSN_RE = "[0-9]{3}-[0-9]{2}-[0-9]{4}"


@_q(
    "q_pii_scrub",
    f"""
    WITH planted AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com ssn 123-45-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_SSN_RE}', '[SSN]', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INTEGER)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{_SSN_RE}')) AS INTEGER) AS n_ssns
    FROM planted
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ssn 123-45-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return planted.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "[EMAIL]"), _SSN_RE, "[SSN]"
        ).alias("clean_text"),
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_SSN_RE), F.lit(0))).alias(
            "n_ssns"
        ),
    )


# --- north star: repetition quality signals (Gopher-style) ----------------
# Degenerate text screams through these two numbers: the fraction of
# tokens that are the single most-frequent token, and the distinct-token
# ratio. Tie-break on the lexicographically smallest token so the
# "top token" is deterministic across engines and partitionings.
@_q(
    "q_repetition_signals",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), counts AS (
        SELECT doc_id, token, COUNT(*) AS c
        FROM tok GROUP BY doc_id, token
    ), ranked AS (
        SELECT doc_id, token, c,
               SUM(c) OVER (PARTITION BY doc_id) AS n_tokens,
               COUNT(*) OVER (PARTITION BY doc_id) AS n_distinct,
               row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, token)
                 AS rn
        FROM counts
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           token AS top_token,
           CAST(c AS BIGINT) AS top_count,
           round(c / n_tokens, 6) AS top_token_frac,
           round(n_distinct / n_tokens, 6) AS distinct_frac
    FROM ranked WHERE rn = 1
    """,
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    counts = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wdoc = Window.partitionBy("doc_id")
    ranked = counts.select(
        "doc_id",
        "token",
        "c",
        F.sum("c").over(wdoc).alias("n_tokens"),
        F.count(F.lit(1)).over(wdoc).alias("n_distinct"),
        F.row_number()
        .over(wdoc.orderBy(F.col("c").desc(), F.col("token")))
        .alias("rn"),
    )
    nt = F.col("n_tokens").cast("double")
    return ranked.where(F.col("rn") == 1).select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.col("token").alias("top_token"),
        F.col("c").alias("top_count"),
        F.round(F.col("c") / nt, 6).alias("top_token_frac"),
        F.round(F.col("n_distinct") / nt, 6).alias("distinct_frac"),
    )
