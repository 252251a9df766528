"""Invariant tests for the round-2 training-data pipeline operators —
properties the DuckDB oracle can't express (the oracle proves value
equality; these prove the SEMANTICS are the ones claimed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_streaming_spark.workload.pipeline import (
    _PACK_BUDGET,
    _PACK_SHARDS,
    QUERIES as PIPE_Q,
)
from big_data_streaming_spark.workload.similarity import QUERIES as SIM_Q

SF = "/root/testdata/sf0.001"


def test_pack_sequences_respects_budget(spark):
    """No packed sequence exceeds the token budget unless it is a single
    oversized document; doc order inside a shard is contiguous by doc_id."""
    out = PIPE_Q["q_pack_sequences"](spark, SF)
    per_seq = (
        out.groupBy("shard", "seq_id")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .collect()
    )
    assert per_seq, "packing produced no sequences"
    for r in per_seq:
        assert r.total <= _PACK_BUDGET or r.n_docs == 1, r

    # contiguity: within a shard, seq_id is non-decreasing in doc_id order
    rows = out.orderBy("shard", "doc_id").collect()
    last = {}
    for r in rows:
        assert r.seq_id >= last.get(r.shard, 0), r
        last[r.shard] = r.seq_id
    assert len({r.shard for r in rows}) <= _PACK_SHARDS


def test_mix_domains_caps_every_source_at_min(spark):
    """After rebalancing, every source's kept count is ≤ the smallest
    source's original count (the target rate), and the selection is
    deterministic across invocations."""
    out = PIPE_Q["q_mix_domains"](spark, SF)
    kept = {r.source: r.cnt for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    n_min = out.select(F.min("n_min")).first()[0]
    assert kept, "sampler kept nothing"
    for src, c in kept.items():
        # hash selection is Bernoulli-at-rate, so allow the small-sample
        # wobble: bounded by the min-source size + 3σ of Binomial(n, rate)
        n_source = out.where(F.col("source") == src).first().n_source
        sigma = (n_min * (1 - n_min / n_source)) ** 0.5
        assert c <= n_min + 3 * sigma + 1, (src, c, n_min)

    again = sorted(r.doc_id for r in PIPE_Q["q_mix_domains"](spark, SF).collect())
    assert again == sorted(r.doc_id for r in out.collect())


def test_train_order_is_permutation_and_stable(spark):
    out = PIPE_Q["q_train_order"](spark, SF).collect()
    n = len(out)
    assert sorted(r.train_pos for r in out) == list(range(1, n + 1))
    # deterministic: same order on re-run
    again = PIPE_Q["q_train_order"](spark, SF).collect()
    assert [r.doc_id for r in sorted(out, key=lambda r: r.train_pos)] == [
        r.doc_id for r in sorted(again, key=lambda r: r.train_pos)
    ]


def test_lm_novelty_bounds(spark):
    """n_novel ≤ n_bigrams, n_unique ≤ n_bigrams, mean frequency ≥ 1."""
    rows = PIPE_Q["q_lm_novelty"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_novel <= r.n_bigrams
        assert 1 <= r.n_unique <= r.n_bigrams
        assert r.mean_bigram_freq >= 1.0


def test_dedup_semantic_one_rep_per_cluster(spark):
    out = SIM_Q["q_dedup_semantic"](spark, SF)
    per_cluster = (
        out.groupBy("cluster_id")
        .agg(
            F.sum(F.when(~F.col("is_dup"), 1).otherwise(0)).alias("n_reps"),
            F.count_distinct("rep_id").alias("n_rep_ids"),
        )
        .collect()
    )
    assert per_cluster
    for r in per_cluster:
        assert r.n_reps == 1, r
        assert r.n_rep_ids == 1, r
    # the representative is never marked duplicate of someone else
    reps = out.where(~F.col("is_dup")).collect()
    for r in reps:
        assert r.rep_id == r.vec_id


def test_pack_shard_matches_reference_greedy():
    """Property: the Arrow kernel's per-shard packing equals a plain
    Python greedy replay for arbitrary token-length sequences."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from big_data_streaming_spark.workload.pipeline import (
        _PACK_BUDGET,
        _pack_shard,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=_PACK_BUDGET * 2), max_size=60)
    )
    def check(lengths):
        pdf = pd.DataFrame(
            {
                "shard": [0] * len(lengths),
                # shuffled doc_ids: the kernel must sort by doc_id itself
                "doc_id": list(reversed(range(len(lengths)))),
                "n_tokens": list(reversed(lengths)),
            }
        )
        out = _pack_shard(pdf.copy())
        # reference replay in doc_id order
        seq, acc, want = 0, 0, {}
        for doc_id, n in enumerate(lengths):
            if doc_id == 0:
                acc = n
            elif acc + n <= _PACK_BUDGET:
                acc += n
            else:
                seq += 1
                acc = n
            want[doc_id] = seq
        got = dict(zip(out["doc_id"], out["seq_id"]))
        assert got == want

    check()
