"""Multimodal columns: media as opaque binary + typed metadata.

Convention (schemas.MEDIA_STRUCT): ``struct<uri, mime, nbytes, payload
binary, meta map<string,string>>``. At 100 TB the payload usually lives in
object storage (``payload`` null, ``uri`` set); small assets inline. All
*engine-side* ops (project, filter on meta, batch shaping for decoders)
work on either shape.

Decoders (image/audio/video) need codec libraries this container doesn't
ship, so the decode kernels are STUBBED — ``decode_media`` raises
``NotImplementedError`` unless given ``fake=True``, in which case it emits
deterministic pseudo-features. The Spark-side plumbing is real either way:
Arrow-batched ``mapInPandas`` with an explicit output schema, batch-size
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, and the
payload column pruned out before the Python boundary when features don't
need it (only metadata crosses — keep the Arrow transfer narrow).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def with_media_struct(docs: DataFrame) -> DataFrame:
    """Lift ``documents`` rows into the media-column convention: the text
    payload becomes inline bytes with uri/mime/meta populated."""
    return docs.withColumn(
        "media",
        F.struct(
            F.concat(
                F.lit("s3://corpus/"),
                F.col("lang"),
                F.lit("/"),
                F.col("doc_id").cast("string"),
                F.lit(".txt"),
            ).alias("uri"),
            F.lit("text/plain").alias("mime"),
            F.length("text").cast("bigint").alias("nbytes"),
            F.col("text").cast("binary").alias("payload"),
            F.create_map(
                F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
            ).alias("meta"),
        ),
    )


MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("uri", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature_vec", ArrayType(DoubleType())),
    ]
)


def decode_media(df: DataFrame, *, fake: bool = False, feature_dim: int = 4) -> DataFrame:
    """Feature-extract media payloads via Arrow-batched ``mapInPandas``.

    ``fake=False`` raises ``NotImplementedError`` from inside the UDF on
    the first batch — real decode needs PIL/ffmpeg, absent here. With
    ``fake=True`` the features are a deterministic function of the payload
    bytes (length + leading byte moments), so tests pin exact values.

    Input must carry ``doc_id`` and ``media`` (see with_media_struct).
    Only (doc_id, uri, payload) cross the Arrow boundary — metadata stays
    JVM-side and is re-joined by the caller if needed.
    """
    narrow = df.select(
        "doc_id",
        F.col("media.uri").alias("uri"),
        F.col("media.payload").alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries (PIL/ffmpeg) not "
                    "present in this environment; pass fake=True for the "
                    "deterministic test kernel"
                )
            payloads = pdf["payload"]
            feats = []
            for buf in payloads:
                b = bytes(buf) if buf is not None else b""
                n = len(b)
                head = b[:32]  # fixed probe window: dims don't change base feats
                vec = [
                    float(n),
                    float(sum(head) % 997),
                    float(head[0]) if head else 0.0,
                    float(n % 251),
                ][:feature_dim]
                # feature_dim > 4 extends with deterministic derived
                # components instead of silently capping at 4.
                vec += [
                    float((n * (i + 1)) % 1013) for i in range(len(vec), feature_dim)
                ]
                feats.append(vec)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "uri": pdf["uri"],
                    "n_bytes": payloads.map(lambda x: len(bytes(x)) if x is not None else 0),
                    "feature_vec": feats,
                }
            )

    return narrow.mapInPandas(run, MEDIA_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, *, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: expands one media row to
    frame-index rows JVM-side (posexplode over a sequence sized from
    metadata), leaving the per-frame decode to ``decode_media``. Real
    frame extraction is stubbed the same way; the *shape* — explode before
    decode so Arrow batches stay bounded — is the part that matters at
    scale."""
    with_count = df.select(
        "doc_id",
        F.col("media.uri").alias("uri"),
        (F.col("media.nbytes") / (64 * every_n))
        .cast("int")
        .alias("n_frames"),
    )
    # sequence() is upper-bound inclusive, so the bound is n_frames - 1 and
    # media with zero frames (empty payload) must yield zero rows, not one.
    return (
        with_count.where(F.col("n_frames") > 0)
        .select(
            "doc_id",
            "uri",
            F.posexplode(
                F.sequence(F.lit(0), F.col("n_frames") - F.lit(1))
            ).alias("frame_idx", "frame_offset"),
        )
        .select(
            "doc_id",
            "uri",
            "frame_idx",
            (F.col("frame_offset") * every_n).alias("frame_no"),
        )
    )


# --- real decode kernel: container-header parsing --------------------------
# Full image decode needs codec libraries this container lacks, but the
# METADATA half of decode — dimensions, format detection — lives in the
# first bytes of the container and parses with nothing but struct. That
# is a real production operation (corpus triage filters on dimensions
# long before pixels are decoded). ``synth_png_payload`` builds a
# spec-valid PNG signature + IHDR chunk entirely JVM-side (hex/unhex
# codegen); ``parse_image_headers`` reads it back in an Arrow-batched
# kernel. Unknown signatures yield NULL dims, not errors.

IMAGE_HEADER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
    ]
)

_PNG_SIG = "89504E470D0A1A0A"  # \x89PNG\r\n\x1a\n


def synth_png_payload(width_col, height_col):
    """A valid PNG signature + IHDR chunk (width, height, 8-bit RGBA) as a
    binary column — built with hex/unhex so it stays in codegen."""

    def be32(col):
        return F.unhex(F.lpad(F.hex(col.cast("bigint")), 8, "0"))

    return F.concat(
        F.unhex(F.lit(_PNG_SIG)),        # signature
        F.unhex(F.lit("0000000D")),      # IHDR length = 13
        F.encode(F.lit("IHDR"), "UTF-8"),
        be32(width_col),
        be32(height_col),
        F.unhex(F.lit("0806000000")),    # bit depth 8, RGBA, defaults
    )


def parse_image_headers(df: DataFrame) -> DataFrame:
    """(doc_id, payload) → (doc_id, mime, width, height, n_bytes): parse
    PNG headers from raw bytes in an Arrow-batched kernel. Only the first
    32 payload bytes are needed; callers should slice before the Python
    boundary when payloads are large (``F.substring(payload, 1, 32)``
    keeps the Arrow transfer narrow)."""
    import struct

    png_sig = bytes.fromhex(_PNG_SIG)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mimes, widths, heights, sizes = [], [], [], []
            for buf in pdf["payload"]:
                b = bytes(buf) if buf is not None else b""
                sizes.append(len(b))
                if b[:8] == png_sig and b[12:16] == b"IHDR" and len(b) >= 24:
                    w, h = struct.unpack(">II", b[16:24])
                    mimes.append("image/png")
                    widths.append(w)
                    heights.append(h)
                elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
                    w, h = struct.unpack("<HH", b[6:10])
                    mimes.append("image/gif")
                    widths.append(w)
                    heights.append(h)
                else:
                    mimes.append(None)
                    widths.append(None)
                    heights.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pd.array(mimes, dtype="object"),
                    "width": pd.array(widths, dtype="Int64"),
                    "height": pd.array(heights, dtype="Int64"),
                    "n_bytes": sizes,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, IMAGE_HEADER_SCHEMA)


# --- real decode kernel: WAV (RIFF) audio headers --------------------------
# Same triage principle for audio: sample rate / channels / duration parse
# out of the canonical 44-byte RIFF/fmt/data header with struct alone.
AUDIO_HEADER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def synth_wav_payload(sample_rate_col, n_samples_col):
    """A canonical 44-byte PCM WAV header (16-bit mono) as a binary
    column — little-endian fields via hex/unhex + byte reversal, all in
    codegen. data_size = n_samples * 2 (16-bit mono)."""

    def le32(col):
        # 4-byte little-endian: hex → pad → reverse byte pairs
        h = F.lpad(F.hex(col.cast("bigint")), 8, "0")
        return F.unhex(
            F.concat(
                F.substring(h, 7, 2),
                F.substring(h, 5, 2),
                F.substring(h, 3, 2),
                F.substring(h, 1, 2),
            )
        )

    data_size = n_samples_col.cast("bigint") * 2
    byte_rate = sample_rate_col.cast("bigint") * 2
    return F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"),
        le32(data_size + 36),
        F.encode(F.lit("WAVEfmt "), "UTF-8"),
        le32(F.lit(16)),                      # fmt chunk size
        F.unhex(F.lit("01000100")),           # PCM, mono
        le32(sample_rate_col),
        le32(byte_rate),
        F.unhex(F.lit("02001000")),           # block align 2, 16 bits
        F.encode(F.lit("data"), "UTF-8"),
        le32(data_size),
    )


def parse_audio_headers(df: DataFrame) -> DataFrame:
    """(doc_id, payload) → RIFF/WAV header fields; NULLs for non-WAV."""
    import struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "mime": [], "sample_rate": [], "channels": [],
                "n_samples": [], "duration_ms": [],
            }
            for buf in pdf["payload"]:
                b = bytes(buf) if buf is not None else b""
                ok = (
                    len(b) >= 44
                    and b[:4] == b"RIFF"
                    and b[8:16] == b"WAVEfmt "
                )
                if ok:
                    channels, rate = struct.unpack("<HI", b[22:28])
                    bits = struct.unpack("<H", b[34:36])[0]
                    data_size = struct.unpack("<I", b[40:44])[0]
                # A corrupt fmt chunk with zero channels/bits/rate must
                # yield the same NULL row as any other malformed shape,
                # not a ZeroDivisionError that kills the batch.
                if ok and channels > 0 and bits > 0 and rate > 0:
                    n = data_size * 8 // (bits * channels)
                    out["mime"].append("audio/wav")
                    out["sample_rate"].append(rate)
                    out["channels"].append(channels)
                    out["n_samples"].append(n)
                    out["duration_ms"].append(n * 1000 // rate)
                else:
                    for k in out:
                        out[k].append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pd.array(out["mime"], dtype="object"),
                    "sample_rate": pd.array(out["sample_rate"], dtype="Int64"),
                    "channels": pd.array(out["channels"], dtype="Int64"),
                    "n_samples": pd.array(out["n_samples"], dtype="Int64"),
                    "duration_ms": pd.array(out["duration_ms"], dtype="Int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, AUDIO_HEADER_SCHEMA)


def payload_stats_arrow(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-native batch kernel (``mapInArrow``): per-row payload byte
    statistics computed directly on ``pyarrow.RecordBatch`` — no
    pandas materialization at all, the zero-copy tier below
    ``mapInPandas`` for binary-heavy columns. At 100 TB this is the
    shape for byte-level featurizers (magic sniffing, entropy, chunk
    hashing): Arrow buffers stream through the Python worker without
    per-row object churn.

    Output: (doc_id, nbytes, first_byte, checksum32) — checksum32 is a
    simple additive mod-2^32 checksum, deterministic and cheap to
    verify engine-side.
    """
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            doc_ids = tbl.column("doc_id").to_pylist()
            payloads = tbl.column(payload_col).to_pylist()
            nbytes, first, csum = [], [], []
            for p in payloads:
                b = p or b""
                nbytes.append(len(b))
                first.append(b[0] if b else None)
                csum.append(sum(b) % 4294967296)
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": pa.array(doc_ids, pa.int64()),
                    "nbytes": pa.array(nbytes, pa.int64()),
                    "first_byte": pa.array(first, pa.int32()),
                    "checksum32": pa.array(csum, pa.int64()),
                }
            )

    narrow = df.select("doc_id", payload_col)
    return narrow.mapInArrow(
        run, "doc_id bigint, nbytes bigint, first_byte int, checksum32 bigint"
    )


RESIZED_SCHEMA = (
    "doc_id bigint, out_width int, out_height int, payload binary"
)


def resize_raster(
    df: DataFrame,
    out_width: int,
    out_height: int,
    *,
    width_col: str = "width",
    height_col: str = "height",
    payload_col: str = "payload",
) -> DataFrame:
    """North-star 'resize' kernel — genuinely functional, no codec needed:
    nearest-neighbor resampling of raw single-channel rasters
    (``payload`` = width*height bytes, row-major) via an Arrow-batched
    ``mapInPandas`` kernel. Unlike the decode stubs (which honestly gate
    on the absent image libraries), NN resampling is pure index math, so
    this path runs for real: np.frombuffer → reshape → integer source
    grid (floor(i*src/dst)) → take → tobytes. Rows whose payload length
    does not match width*height are dropped (corrupt-raster policy:
    filter, don't crash the batch — the DQ audit counts them upstream).

    At 100 TB: payload bytes stay in Arrow buffers end-to-end; the
    kernel is O(out_pixels) per row with zero Python-per-pixel work.
    """
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = {"doc_id": [], "out_width": [], "out_height": [], "payload": []}
            for doc_id, w, h, payload in zip(
                pdf["doc_id"], pdf[width_col], pdf[height_col], pdf[payload_col]
            ):
                # NULL/NaN dims arrive from header parsers on unknown
                # signatures — corrupt-raster policy covers them too.
                if payload is None or w is None or h is None:
                    continue
                if w != w or h != h:  # NaN after pandas null coercion
                    continue
                w, h = int(w), int(h)
                if w <= 0 or h <= 0 or len(payload) != w * h:
                    continue
                raster = np.frombuffer(payload, dtype=np.uint8).reshape(
                    int(h), int(w)
                )
                rows = (np.arange(out_height) * int(h)) // out_height
                cols = (np.arange(out_width) * int(w)) // out_width
                resized = raster[np.ix_(rows, cols)]
                out_rows["doc_id"].append(doc_id)
                out_rows["out_width"].append(out_width)
                out_rows["out_height"].append(out_height)
                out_rows["payload"].append(resized.tobytes())
            yield pd.DataFrame(out_rows)

    narrow = df.select("doc_id", width_col, height_col, payload_col)
    return narrow.mapInPandas(run, RESIZED_SCHEMA)


DHASH_SCHEMA = "doc_id bigint, dhash_hi bigint, dhash_lo bigint"


def dhash_raster(
    df: DataFrame,
    *,
    width_col: str = "width",
    height_col: str = "height",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual difference-hash (dHash) of single-channel rasters —
    the image analogue of the text near-dup fingerprints: bit k of the
    hash is 1 iff pixel (i, j) < pixel (i, j+1) on a (w, h) grayscale
    grid (canonically 9×8 → 64 bits; Krawetz's published algorithm).
    Identical images — and near-identical ones after the resize
    normalizer — collide, so grouping by the hash buckets visual
    duplicates without any pairwise comparison.

    Pure index/compare math like ``resize_raster`` — no codec needed,
    so the kernel runs for real (the honest-gate decode stubs stay
    upstream for actual JPEG/PNG pixels). Vectorized per row:
    np.frombuffer → reshape → one vectorized comparison → one packed
    shift-sum; emitted as two signed 32-bit halves (``dhash_hi``/
    ``dhash_lo``) so bit 63 never touches the BIGINT sign bit in any
    engine. Rows with corrupt payloads (length ≠ w·h) are dropped —
    the same corrupt-raster policy as resize.

    At 100 TB: Arrow-batched ``mapInPandas``, O(pixels) per row, and
    the downstream dedup is a hash groupBy on the 64-bit key — the
    exact-dedup shuffle shape, never an all-pairs image join.
    """
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "dhash_hi": [], "dhash_lo": []}
            for doc_id, w, h, payload in zip(
                pdf["doc_id"], pdf[width_col], pdf[height_col], pdf[payload_col]
            ):
                if payload is None or w is None or h is None:
                    continue
                if w != w or h != h:
                    continue
                w, h = int(w), int(h)
                if w <= 1 or h <= 0 or len(payload) != w * h:
                    continue
                # The hash packs (w-1)*h bits into ONE 64-bit word;
                # shifting uint64 by >=64 is undefined in numpy and
                # would silently wrap to garbage. Oversized rasters are
                # dropped like corrupt ones — the documented contract
                # is the 9x8 dHash raster (64 bits exactly).
                if (w - 1) * h > 64:
                    continue
                raster = np.frombuffer(payload, dtype=np.uint8).reshape(h, w)
                bits = (raster[:, :-1] < raster[:, 1:]).ravel()
                k = np.arange(bits.size, dtype=np.uint64)
                val = int((bits.astype(np.uint64) << k).sum())
                out["doc_id"].append(doc_id)
                out["dhash_hi"].append(val >> 32)
                out["dhash_lo"].append(val & 0xFFFFFFFF)
            yield pd.DataFrame(out)

    narrow = df.select("doc_id", width_col, height_col, payload_col)
    return narrow.mapInPandas(run, DHASH_SCHEMA)


BYTE_HISTOGRAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bin", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def byte_histogram(df: DataFrame, *, payload_col: str = "media.payload", n_bins: int = 16) -> DataFrame:
    """Arrow-batched payload byte histogram: bin = byte_value // (256 //
    n_bins). The luminance-histogram shape of image triage (dark/blank/
    over-exposed detection) run on the raw payload bytes — one
    vectorized np.bincount per row, no codec required. Only (doc_id,
    payload) cross the Arrow boundary; zero-count bins are not emitted.
    At 100 TB: mapInPandas over a narrow projection, O(bytes) per row,
    output O(n_bins) per row."""
    import numpy as np
    import pandas as pd

    width = 256 // n_bins

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "bin": [], "n_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                counts = np.bincount(arr // width, minlength=n_bins)
                for b in np.nonzero(counts)[0]:
                    out["doc_id"].append(doc_id)
                    out["bin"].append(int(b))
                    out["n_bytes"].append(int(counts[b]))
            yield pd.DataFrame(out)

    narrow = df.select("doc_id", F.col(payload_col).alias("payload"))
    return narrow.mapInPandas(run, BYTE_HISTOGRAM_SCHEMA)


CLIP_STATS_SCHEMA = (
    "doc_id bigint, n_samples bigint, clip_count bigint, "
    "max_abs bigint, clip_share double"
)


def synth_wav_tone_payload(seed_col, n_samples_col):
    """A complete PCM WAV payload — the 44-byte header from
    ``synth_wav_payload`` plus ``n`` deterministic 16-bit LE samples:
    the stored uint16 is m_k = (seed + k * 2654435761) % 65536, whose
    two's-complement signed reading is s_k = m_k if m_k < 32768 else
    m_k - 65536 — built entirely in codegen (hex per sample,
    byte-swapped to little-endian, array_join, unhex). The recurrence
    is restatable arithmetically in SQL, so byte-level kernels over the
    data section are value-checkable the same way the header kernels
    are. Keep ``n`` small (hundreds): the payload is a per-row string
    expression, not a media store."""
    seed = seed_col.cast("bigint")
    n = n_samples_col.cast("bigint")

    def le_sample(k):
        h = F.lpad(F.hex((seed + k * F.lit(2654435761)) % 65536), 4, "0")
        return F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2))

    data_hex = F.array_join(
        F.transform(F.sequence(F.lit(0), n - 1), le_sample), ""
    )
    return F.concat(
        synth_wav_payload(F.lit(44100), n), F.unhex(data_hex)
    )


def audio_clip_stats(df: DataFrame, threshold: int = 32000) -> DataFrame:
    """(doc_id, payload) → 16-bit PCM clipping statistics: sample count
    (from the data section, not the header), samples at or beyond
    ``threshold`` magnitude, the peak magnitude, and the clipped share.
    The audio-QA triage that runs BEFORE any resample/transcode —
    vectorized ``np.frombuffer`` over the Arrow batch, no per-sample
    Python. Non-WAV payloads yield NULL stats (same policy as
    parse_audio_headers)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"n_samples": [], "clip_count": [], "max_abs": [],
                   "clip_share": []}
            for buf in pdf["payload"]:
                b = bytes(buf) if buf is not None else b""
                ok = (
                    len(b) >= 44
                    and b[:4] == b"RIFF"
                    and b[8:16] == b"WAVEfmt "
                    and (len(b) - 44) % 2 == 0
                )
                if ok:
                    s = np.frombuffer(b, dtype="<i2", offset=44)
                    n = int(s.size)
                    a = np.abs(s.astype(np.int32))
                    clip = int((a >= threshold).sum())
                    out["n_samples"].append(n)
                    out["clip_count"].append(clip)
                    out["max_abs"].append(int(a.max()) if n else 0)
                    out["clip_share"].append(clip / n if n else 0.0)
                else:
                    for k in out:
                        out[k].append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": pd.array(out["n_samples"], dtype="Int64"),
                    "clip_count": pd.array(out["clip_count"], dtype="Int64"),
                    "max_abs": pd.array(out["max_abs"], dtype="Int64"),
                    "clip_share": pd.array(out["clip_share"], dtype="float64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, CLIP_STATS_SCHEMA)
