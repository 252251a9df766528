"""Z-order clustering (plans/zorder.py): the bounding boxes of z-ordered
files must be dramatically tighter than a linear sort's on the SECOND
column — that tightness is exactly what parquet min/max skipping prunes
by. Verified quantitatively from the real parquet footers via pyarrow."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from big_data_streaming_spark.plans.zorder import (
    interleave_bits,
    write_zordered,
)
from big_data_streaming_spark.sources.catalog import load_table


def _col_spans(path: str, col: str) -> list[tuple[float, float]]:
    """(min, max) of ``col`` per parquet file under ``path``."""
    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append((float(lo), float(hi)))
    return spans


def test_interleave_bits_matches_reference(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], ["x", "y"]
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", interleave_bits([F.col("x"), F.col("y")], bits=3).alias("z")
        ).collect()
    }

    def ref(x, y):
        z = 0
        for i in range(3):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == ref(x, y), (x, y, z)


def test_zorder_tightens_second_column_bounds(spark, tmp_path):
    """Linear sort on user_id leaves each file spanning ~the full value
    range; the z-ordered layout bounds BOTH columns. Compare the mean
    per-file span of the second key."""
    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "user_id", "value", "event_id"
    )

    linear = str(tmp_path / "linear")
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(linear)
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(ev, zpath, ["user_id", "value"], bits=6, n_files=8)

    # same data either way
    assert spark.read.parquet(zpath).count() == ev.count()

    def mean_span(path):
        spans = _col_spans(path, "value")
        assert spans, path
        return sum(hi - lo for lo, hi in spans) / len(spans)

    lin_span, z_span = mean_span(linear), mean_span(zpath)
    # the z-curve must tighten the second column's per-file range by a lot;
    # 2x is a loose floor (typically 3-6x at 8 files / 6 bits)
    assert z_span < lin_span / 2, (lin_span, z_span)


def test_parquet_bloom_filters_written_and_effective(spark, tmp_path):
    """Layout tier between stats pruning and Z-order: per-column parquet
    bloom filters. Asserts (a) the footer carries a bloom filter for the
    opted-in high-cardinality column and none for the opted-out one, and
    (b) a point lookup on the filtered column still returns exact rows."""
    import os

    from big_data_streaming_spark.plans.layout import (
        bloom_filter_offsets,
        write_with_bloom_filters,
    )
    from big_data_streaming_spark.sources.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    dest = str(tmp_path / "bloomed")
    # event_id is unique → plain-encoded chunk → a real bloom filter.
    # (A fully dictionary-encoded column would be silently skipped by
    # parquet-mr — the dictionary is already an exact membership index.)
    write_with_bloom_filters(
        ev.repartition(1), dest, bloom_cols=["event_id"], ndv=10_000
    )
    part = next(
        os.path.join(dest, f)
        for f in os.listdir(dest)
        if f.endswith(".parquet")
    )
    offsets = bloom_filter_offsets(spark, part)
    assert offsets["event_id"] >= 0, offsets
    assert offsets["event_type"] < 0, offsets  # not opted in

    got = spark.read.parquet(dest).where(F.col("event_id") == 42)
    want = ev.where(F.col("event_id") == 42)
    assert got.count() == want.count() > 0
