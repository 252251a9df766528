"""Format round-trips (JSON/CSV/ORC; avro gated) and the bucketed-table
zero-shuffle join — the storage-layout payoff `plans/layout.py` promises."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_streaming_spark.plans.explain import formatted_plan, shuffle_count
from big_data_streaming_spark.plans.layout import write_bucketed
from big_data_streaming_spark.sources.catalog import load_table
from big_data_streaming_spark.sources.files import read_csv, read_json, read_orc, write


def _events(spark, sf_small):
    return load_table(spark, sf_small, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


def test_json_roundtrip(spark, sf_small, tmp_path):
    ev = _events(spark, sf_small)
    path = str(tmp_path / "ev_json")
    write(ev, path, "json")
    back = read_json(spark, path, ev.schema)
    assert back.count() == ev.count()
    assert sorted(map(str, back.collect())) == sorted(map(str, ev.collect()))


def test_csv_roundtrip(spark, sf_small, tmp_path):
    ev = _events(spark, sf_small)
    path = str(tmp_path / "ev_csv")
    write(ev, path, "csv", header="true")
    back = read_csv(spark, path, ev.schema)
    assert back.count() == ev.count()
    assert sorted(map(str, back.collect())) == sorted(map(str, ev.collect()))


def test_orc_roundtrip_with_pushdown(spark, sf_small, tmp_path):
    ev = _events(spark, sf_small)
    path = str(tmp_path / "ev_orc")
    write(ev, path, "orc")
    back = read_orc(spark, path).filter(F.col("value") > 100.0)
    plan = formatted_plan(back)
    assert "PushedFilters" in plan and "value" in plan
    assert back.count() == ev.filter(F.col("value") > 100.0).count()


def test_avro_write_roundtrips_via_fallback(spark, sf_small, tmp_path):
    """Without the spark-avro jar, write(fmt='avro') routes to the pure-
    Python container-file fallback instead of raising (see test_avro.py
    for the JVM reference-implementation interop proof)."""
    from big_data_streaming_spark.sources.files import read_avro

    ev = _events(spark, sf_small).limit(5)
    path = str(tmp_path / "ev_avro")
    write(ev, path, "avro")
    assert read_avro(spark, path).count() == 5


def test_bucketed_join_has_no_shuffle(spark, sf_small):
    """Both sides bucketed on the join key → the sort-merge join reads
    co-located buckets, ZERO exchanges in the plan. This is the layout
    lever that removes the fact-fact shuffle at 100 TB."""
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(li, "li_bkt", "l_orderkey", num_buckets=8)
        write_bucketed(orders, "ord_bkt", "o_orderkey", num_buckets=8)
        a = spark.table("li_bkt")
        b = spark.table("ord_bkt")
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        n_shuffles = shuffle_count(joined)
        assert n_shuffles == 0, formatted_plan(joined)
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")
