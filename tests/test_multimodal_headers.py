"""Container-header decode kernels (functions/multimodal.py): PNG, GIF,
WAV parsing from raw bytes — the codec-free half of multimodal decode."""

from __future__ import annotations

import struct

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_streaming_spark.functions.multimodal import (
    parse_audio_headers,
    parse_image_headers,
    synth_png_payload,
    synth_wav_payload,
)


def _png(w: int, h: int) -> bytes:
    return (
        bytes.fromhex("89504E470D0A1A0A")
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + bytes.fromhex("0806000000")
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def test_parse_mixed_image_formats_and_garbage(spark):
    rows = [
        Row(doc_id=1, payload=_png(640, 480)),
        Row(doc_id=2, payload=_gif(320, 200)),
        Row(doc_id=3, payload=b"not an image at all"),
        Row(doc_id=4, payload=None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in parse_image_headers(df).collect()}
    assert (got[1].mime, got[1].width, got[1].height) == ("image/png", 640, 480)
    assert (got[2].mime, got[2].width, got[2].height) == ("image/gif", 320, 200)
    assert got[3].mime is None and got[3].width is None
    assert got[4].mime is None and got[4].n_bytes == 0


def test_synth_png_is_spec_valid_and_roundtrips(spark):
    df = spark.range(5).select(
        F.col("id").alias("doc_id"),
        synth_png_payload(F.lit(100) + F.col("id"), F.lit(7) * (F.col("id") + 1)).alias(
            "payload"
        ),
    )
    # the JVM-built bytes equal the reference Python construction
    raw = {r.doc_id: bytes(r.payload) for r in df.collect()}
    for i in range(5):
        assert raw[i] == _png(100 + i, 7 * (i + 1))
    got = {r.doc_id: r for r in parse_image_headers(df).collect()}
    for i in range(5):
        assert (got[i].width, got[i].height) == (100 + i, 7 * (i + 1))


def test_synth_wav_roundtrips_and_rejects_garbage(spark):
    df = spark.range(3).select(
        F.col("id").alias("doc_id"),
        synth_wav_payload(F.lit(16000), F.lit(8000) + F.col("id")).alias("payload"),
    )
    got = {r.doc_id: r for r in parse_audio_headers(df).collect()}
    for i in range(3):
        r = got[i]
        assert (r.mime, r.sample_rate, r.channels) == ("audio/wav", 16000, 1)
        assert r.n_samples == 8000 + i
        assert r.duration_ms == (8000 + i) * 1000 // 16000
    bad = spark.createDataFrame(
        [Row(doc_id=9, payload=b"RIFFxxxx not wav")], "doc_id long, payload binary"
    )
    assert parse_audio_headers(bad).first().mime is None


def test_payload_stats_arrow_matches_builtin(spark):
    """mapInArrow kernel vs JVM built-ins on the same synthetic payloads:
    byte length, first byte, and additive checksum must agree exactly
    (aggregate(transform(...)) is the codegen-side mirror)."""
    from pyspark.sql import functions as F

    from big_data_streaming_spark.functions.multimodal import payload_stats_arrow

    docs = spark.range(64).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(b"\x89PNG"),
            F.sha2(F.col("id").cast("string"), 256).cast("binary"),
        ).alias("payload"),
    )
    got = {
        r["doc_id"]: (r["nbytes"], r["first_byte"], r["checksum32"])
        for r in payload_stats_arrow(docs).collect()
    }
    want = {
        r["doc_id"]: (r["nbytes"], r["first_byte"], r["checksum32"])
        for r in docs.select(
            "doc_id",
            F.length("payload").cast("bigint").alias("nbytes"),
            F.expr("ascii(decode(substring(payload, 1, 1), 'ISO-8859-1'))")
            .cast("int")
            .alias("first_byte"),
            F.expr(
                "aggregate(transform(sequence(1, length(payload)),"
                " i -> ascii(decode(substring(payload, i, 1), 'ISO-8859-1'))),"
                " 0L, (a, x) -> a + x) % 4294967296"
            ).alias("checksum32"),
        ).collect()
    }
    assert len(got) == 64
    for k, (nb, fb, cs) in got.items():
        wnb, wfb, wcs = want[k]
        assert nb == wnb and fb == wfb and cs == wcs, (k, got[k], want[k])


def test_resize_raster_nearest_neighbor_exact(spark):
    """NN resize is pure index math — assert exact pixel selection on a
    known gradient, identity at same size, and corrupt-row filtering."""
    import numpy as np

    from big_data_streaming_spark.functions.multimodal import resize_raster

    grad = bytes(range(16))  # 4x4 row-major: [[0..3],[4..7],[8..11],[12..15]]
    rows = [
        (1, 4, 4, bytearray(grad)),
        (2, 4, 4, bytearray(b"\x00" * 7)),  # corrupt: wrong length → dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, width int, height int, payload binary")

    out = {r["doc_id"]: bytes(r["payload"]) for r in resize_raster(df, 2, 2).collect()}
    assert set(out) == {1}
    # source rows/cols picked at floor(i*4/2) = 0, 2 → pixels (0,0),(0,2),(2,0),(2,2)
    assert np.frombuffer(out[1], np.uint8).tolist() == [0, 2, 8, 10]

    same = {r["doc_id"]: bytes(r["payload"]) for r in resize_raster(df, 4, 4).collect()}
    assert same[1] == grad  # identity at the original size

    up = resize_raster(df, 8, 8).collect()
    assert len(up[0]["payload"]) == 64  # upsampling works too


def test_dhash_drops_rasters_over_64_bits(spark):
    """dhash_raster packs (w-1)*h bits into one uint64; a raster wider
    than that contract would shift numpy uint64 by >=64 — undefined
    behavior that silently wraps. Oversized rasters must be DROPPED
    like corrupt ones, and the 9x8 contract raster must still hash."""
    from big_data_streaming_spark.functions.multimodal import dhash_raster

    rows = [
        (1, 9, 8, bytearray(bytes(range(72)))),        # contract 9x8 → 64 bits
        (2, 17, 8, bytearray(bytes(128))),             # (17-1)*8 = 128 bits → drop
        (3, 65, 1, bytearray(bytes(range(65)))),       # boundary: exactly 64 → keep
        (4, 66, 1, bytearray(bytes(66))),              # 65 bits → drop
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, width int, height int, payload binary"
    )
    got = {r["doc_id"]: (r["dhash_hi"], r["dhash_lo"]) for r in dhash_raster(df).collect()}
    assert set(got) == {1, 3}
    # the monotone gradient row hashes to all-ones in the low 63... each
    # adjacent pair increases, so every bit is set: (w-1)*h = 64 ones
    assert got[3] == (0xFFFFFFFF, 0xFFFFFFFF)
