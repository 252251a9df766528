"""Property tests for the round-4 sketch/placement operators.

The oracle gate proves these on the fixture; the properties here attack
them with adversarial inputs the fixture can't produce:

* Misra-Gries (`_mg_partition`): the mergeable-summaries theorem
  0 <= true_count - est <= n/(K+1) must hold for ANY stream and ANY
  split of it into Arrow batches — hypothesis drives both.
* Rendezvous hashing (`_hrw_shard`): growing the shard set may only
  move keys TO the new shard (the minimal-movement argument), for any
  key values including negatives and int64 extremes.
"""

from __future__ import annotations

import collections

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_streaming_spark.workload.text import _MG_K, _mg_partition


def _mg_run(stream: list[str], batch_sizes: list[int]) -> dict[str, int]:
    batches = []
    i = 0
    for b in batch_sizes:
        if i >= len(stream):
            break
        batches.append(pd.DataFrame({"bigram": stream[i : i + b]}))
        i += b
    if i < len(stream):
        batches.append(pd.DataFrame({"bigram": stream[i:]}))
    out = pd.concat(list(_mg_partition(iter(batches))), ignore_index=True)
    return dict(zip(out["bigram"], out["lb"]))


@settings(max_examples=200, deadline=None)
@given(
    stream=st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=2),
        min_size=0,
        max_size=400,
    ),
    batch_sizes=st.lists(
        st.integers(min_value=1, max_value=50), min_size=1, max_size=10
    ),
)
def test_misra_gries_bound_any_stream_any_batching(stream, batch_sizes):
    est = _mg_run(stream, batch_sizes)
    true = collections.Counter(stream)
    n = len(stream)
    for token, cnt in true.items():
        e = est.get(token, 0)
        assert 0 <= e <= cnt, f"{token}: est {e} outside [0, {cnt}]"
        assert (cnt - e) * (_MG_K + 1) <= n, (
            f"{token}: undercount {cnt - e} violates n/(K+1) with n={n}"
        )
    for token, e in est.items():
        assert e <= true[token], f"{token}: overcount {e} > {true[token]}"


def test_misra_gries_small_vocab_is_exact():
    # Fewer distinct items than counters -> no eviction ever fires and
    # the sketch degenerates to exact counting.
    stream = ["x", "y", "z"] * 100
    est = _mg_run(stream, [7])
    assert est == {"x": 100, "y": 100, "z": 100}


def test_hrw_growth_only_moves_to_new_shard(spark):
    import pyspark.sql.functions as F

    from big_data_streaming_spark.workload.pipeline import _hrw_shard

    ids = [0, 1, -1, 7, 10**12, -(10**12), 2**62, -(2**62), 999999937]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long").select(
        "doc_id",
        _hrw_shard(8).alias("s8"),
        _hrw_shard(9).alias("s9"),
        _hrw_shard(16).alias("s16"),
    )
    rows = df.collect()
    for r in rows:
        assert 0 <= r.s8 < 8 and 0 <= r.s9 < 9 and 0 <= r.s16 < 16
        if r.s9 != r.s8:
            assert r.s9 == 8, f"doc {r.doc_id} moved to {r.s9}, not the new shard"
        # growing 9 -> 16 may only move keys to shards 9..15
        if r.s16 != r.s9:
            assert r.s16 >= 9, f"doc {r.doc_id} moved to old shard {r.s16}"
