"""MERGE-style upsert (operators/upsert.py): full-snapshot and
partition-scoped paths, last-wins precedence, key-uniqueness guard."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_streaming_spark.operators.upsert import merge_upsert


def _base(spark):
    return spark.createDataFrame(
        [
            Row(k=1, region="eu", v="a", ver=1),
            Row(k=2, region="eu", v="b", ver=1),
            Row(k=3, region="us", v="c", ver=1),
            Row(k=4, region="ap", v="d", ver=1),
        ]
    )


def test_full_merge_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_upsert(spark, path, _base(spark), keys=["k"])
    upd = spark.createDataFrame(
        [Row(k=2, region="eu", v="B2", ver=2), Row(k=9, region="us", v="new", ver=2)]
    )
    merge_upsert(spark, path, upd, keys=["k"])
    got = {r.k: (r.v, r.ver) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("a", 1),
        2: ("B2", 2),
        3: ("c", 1),
        4: ("d", 1),
        9: ("new", 2),
    }


def test_last_wins_precedence_with_order_col(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_upsert(spark, path, _base(spark), keys=["k"])
    upd = spark.createDataFrame(
        [
            Row(k=2, region="eu", v="older", ver=2),
            Row(k=2, region="eu", v="newer", ver=3),
        ]
    )
    merge_upsert(spark, path, upd, keys=["k"], order_col="ver")
    got = {r.k: (r.v, r.ver) for r in spark.read.parquet(path).collect()}
    assert got[2] == ("newer", 3)
    assert len(got) == 4


def test_duplicate_updates_without_order_col_raise(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_upsert(spark, path, _base(spark), keys=["k"])
    upd = spark.createDataFrame(
        [Row(k=2, region="eu", v="x", ver=2), Row(k=2, region="eu", v="y", ver=2)]
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_upsert(spark, path, upd, keys=["k"])


def test_partition_scoped_merge_leaves_other_partitions_untouched(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_upsert(
        spark, path, _base(spark), keys=["k"], partition_keys=["region"]
    )
    untouched_before = sorted(glob.glob(os.path.join(path, "region=us", "*")))
    mtimes_before = [os.path.getmtime(f) for f in untouched_before]

    upd = spark.createDataFrame(
        [Row(k=1, region="eu", v="A2", ver=2), Row(k=8, region="ap", v="e", ver=1)]
    )
    merge_upsert(spark, path, upd, keys=["k"], partition_keys=["region"])

    got = {r.k: (r.region, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("eu", "A2"),
        2: ("eu", "b"),
        3: ("us", "c"),
        4: ("ap", "d"),
        8: ("ap", "e"),
    }
    # the us partition (no updates) kept its exact files
    untouched_after = sorted(glob.glob(os.path.join(path, "region=us", "*")))
    assert untouched_after == untouched_before
    assert [os.path.getmtime(f) for f in untouched_after] == mtimes_before


def test_merge_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_upsert(spark, path, _base(spark), keys=["k"])
    upd = spark.createDataFrame([Row(k=2, region="eu", v="B2", ver=2)])
    merge_upsert(spark, path, upd, keys=["k"])
    once = sorted(map(str, spark.read.parquet(path).collect()))
    merge_upsert(spark, path, upd, keys=["k"])  # replay the same batch
    twice = sorted(map(str, spark.read.parquet(path).collect()))
    assert once == twice


def test_streaming_upsert_sink_converges_to_last_write(spark, tmp_path):
    """CDC stream → MERGE sink: two files of updates (second corrects the
    first) drain through foreachBatch; the target holds last-write-wins
    state keyed on k, not an append log."""
    import json

    from big_data_streaming_spark.streaming.sinks import start_upsert_sink

    src = tmp_path / "cdc"
    src.mkdir()
    (src / "b1.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"k": 1, "v": "a", "ver": 1},
                {"k": 2, "v": "b", "ver": 1},
            ]
        )
    )
    (src / "b2.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"k": 2, "v": "b-fixed", "ver": 2},
                {"k": 3, "v": "c", "ver": 1},
            ]
        )
    )
    stream = (
        spark.readStream.schema("k long, v string, ver long")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    target = str(tmp_path / "target")
    q = start_upsert_sink(
        stream,
        target,
        str(tmp_path / "ckpt"),
        keys=("k",),
        order_col="ver",
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    got = {r.k: (r.v, r.ver) for r in spark.read.parquet(target).collect()}
    assert got == {1: ("a", 1), 2: ("b-fixed", 2), 3: ("c", 1)}


def test_empty_update_batch_is_a_safe_noop(spark, tmp_path):
    """A CDC stream can deliver an empty micro-batch; merging it must
    leave the target byte-identical on both paths."""
    full = str(tmp_path / "full")
    part = str(tmp_path / "part")
    merge_upsert(spark, full, _base(spark), keys=["k"])
    merge_upsert(spark, part, _base(spark), keys=["k"], partition_keys=["region"])
    empty = _base(spark).where("k < 0")

    before_full = sorted(map(str, spark.read.parquet(full).collect()))
    merge_upsert(spark, full, empty, keys=["k"])
    assert sorted(map(str, spark.read.parquet(full).collect())) == before_full

    before_part = sorted(map(str, spark.read.parquet(part).collect()))
    merge_upsert(spark, part, empty, keys=["k"], partition_keys=["region"])
    assert sorted(map(str, spark.read.parquet(part).collect())) == before_part
