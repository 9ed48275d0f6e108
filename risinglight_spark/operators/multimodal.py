"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decode / feature-extract / frame-sample stages.

Pixel decode is REAL for dependency-free formats: mm_decode_pixels
round-trips genuine 24-bit BMP and binary PPM payloads through the
codecs in functions/imaging.py (header parsing, bottom-up/BGR/row-pad
inversion) inside the Arrow mapInPandas stage, and its DuckDB oracle
replays the decoded statistics in closed form.  Compressed formats
(JPEG/PNG/video) still need external libraries this container lacks —
on a cluster with them installed, swap the codec dispatch in
imaging.decode_image; every Spark-side piece (binary column schema,
metadata struct, batch shapes, partitioning) is shared and tested.

Payloads are synthesized from ``documents.text`` (utf-8 bytes) or the
deterministic pixel formula because the fixture set has no true image
table; at 100 TB the same plan shape reads parquet ``binary`` columns
directly.

Scale notes:
- Binary payloads stay opaque until the one mapInPandas stage; column
  pruning means scans that don't touch ``payload`` never read those
  parquet pages.
- mapInPandas streams Arrow batches (vectorized, no per-row pickling);
  the decode stage is embarrassingly parallel, no shuffle.
- Frame sampling is explode-based fan-out: rows grow by the frame
  count, but it's map-side only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from risinglight_spark.functions.text import CHAR_MULT, HASH_P, char_hash_sql
from risinglight_spark.operators import Tables
from risinglight_spark.registry import register

FRAME_BYTES = 100  # fake "frame" granularity for sampling


# Real decode lives in functions/imaging.py (BMP/PPM, dependency-free)
# and is exercised by mm_decode_pixels below; the former
# NotImplementedError stub is retired.


def _poly_hash_bytes(data: bytes) -> int:
    """The same polynomial rolling hash functions/text.py evaluates
    JVM-side, over raw bytes — exact-integer, engine-portable."""
    h = 0
    for byte in data:
        h = (h * CHAR_MULT + byte) % HASH_P
    return h


@register(
    "mm_binary_payload",
    oracle="""
    SELECT doc_id,
           octet_length(text::BLOB) AS n_bytes,
           md5(text) AS checksum,
           'text/plain' AS mime
    FROM documents
    """,
    doc="Opaque binary payload column + typed metadata (size, "
    "checksum, mime) — the storage contract for image/audio/video "
    "columns.  md5 over the utf-8 bytes equals DuckDB's md5 over the "
    "string.",
)
def mm_binary_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    payload = F.encode(F.col("text"), "UTF-8")
    return t.documents.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
        F.lit("text/plain").alias("mime"),
    )


@register(
    "mm_metadata_struct",
    oracle="""
    SELECT doc_id, mime, n_bytes, n_frames
    FROM (
      SELECT doc_id,
             'application/octet-stream' AS mime,
             octet_length(text::BLOB) AS n_bytes,
             greatest(octet_length(text::BLOB) // 100, 1) AS n_frames
      FROM documents
    )
    WHERE n_frames > 1
    """,
    doc="Typed metadata struct (struct<mime,n_bytes,n_frames>) riding "
    "next to the payload; predicate on a struct field prunes without "
    "touching payload bytes.",
)
def mm_metadata_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    payload = F.encode(F.col("text"), "UTF-8")
    nb = F.octet_length(payload).cast("bigint")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        nb.alias("n_bytes"),
        F.greatest(F.floor(nb / FRAME_BYTES), F.lit(1))
        .cast("bigint")
        .alias("n_frames"),
    )
    return (
        t.documents.select("doc_id", meta.alias("meta"))
        .filter(F.col("meta.n_frames") > 1)
        .select("doc_id", "meta.mime", "meta.n_bytes", "meta.n_frames")
    )


_DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, mean_px double"
)


@register(
    "mm_decode_stub",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {char_hash_sql("text")} AS ph,
             octet_length(text::BLOB) AS nb
      FROM documents
    )
    SELECT doc_id,
           (32 + ph % 608)::INT AS width,
           (32 + (ph // 608) % 608)::INT AS height,
           (1 + ph % 3)::INT AS channels,
           ((ph % 256)::DOUBLE / 255.0) AS mean_px
    FROM h
    """,
    doc="Arrow-batched mapInPandas feature stage with a deterministic "
    "extractor over the payload's polynomial byte hash (name kept for "
    "driver-history continuity; real pixel decode is the "
    "mm_decode_pixels entry).  The Python side recomputes the "
    "engine-portable polynomial byte hash, so the oracle verifies the "
    "full UDF round trip, not just row counts.",
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    payload_df = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = pdf["payload"].map(_poly_hash_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (32 + hashes % 608).astype("int32"),
                    "height": (32 + (hashes // 608) % 608).astype("int32"),
                    "channels": (1 + hashes % 3).astype("int32"),
                    "mean_px": (hashes % 256) / 255.0,
                }
            )

    return payload_df.mapInPandas(decode_batches, schema=_DECODE_SCHEMA)


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             octet_length(text::BLOB) AS nb,
             greatest(octet_length(text::BLOB) // {FRAME_BYTES}, 1)
               AS n_frames
      FROM documents
    )
    SELECT doc_id, unnest(generate_series(0, n_frames - 1)) AS frame_no,
           unnest(generate_series(0, n_frames - 1)) * {FRAME_BYTES}
             AS byte_offset
    FROM f
    """,
    doc="Frame sampling: explode a payload into per-frame rows "
    "(frame_no, byte_offset) — map-side fan-out, the shape of video "
    "frame extraction at scale.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    payload = F.encode(F.col("text"), "UTF-8")
    n_frames = F.greatest(
        F.floor(F.octet_length(payload) / FRAME_BYTES), F.lit(1)
    ).cast("bigint")
    return (
        t.documents.select("doc_id", n_frames.alias("n_frames"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), F.col("n_frames") - 1)
            ).alias("frame_no"),
        )
        .select(
            "doc_id",
            "frame_no",
            (F.col("frame_no") * FRAME_BYTES).alias("byte_offset"),
        )
    )


TARGET_W, TARGET_H = 224, 224
_RESIZE_SCHEMA = (
    "doc_id bigint, src_w int, src_h int, dst_w int, dst_h int, "
    "scale double, out_bytes bigint"
)


def _resize_batches(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """Arrow-batched 'resize' stage.  The pixel resample itself is
    elided (nearest-neighbor over BMP/PPM payloads would be possible
    via functions/imaging.py, but this entry pins the GEOMETRY
    contract): source dims derive deterministically from the payload
    and the letterbox math (aspect-preserving scale into
    TARGET_WxTARGET_H) is computed exactly as a real resizer would."""
    for pdf in batches:
        n = pdf["n_bytes"]
        src_w = (n % 640 + 32).astype("int32")
        src_h = (n % 480 + 24).astype("int32")
        scale = pd.concat(
            [TARGET_W / src_w, TARGET_H / src_h], axis=1
        ).min(axis=1)
        # truncation (astype) is mirrored by trunc() in the oracle —
        # DuckDB's bare CAST rounds instead
        dst_w = (src_w * scale).astype("int64")
        dst_h = (src_h * scale).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "src_w": src_w,
                "src_h": src_h,
                "dst_w": dst_w.astype("int32"),
                "dst_h": dst_h.astype("int32"),
                "scale": scale,
                "out_bytes": (dst_w * dst_h * 3).astype("int64"),
            }
        )


@register(
    "mm_resize_stub",
    oracle=f"""
    WITH src AS (
      SELECT doc_id, octet_length(text::BLOB) AS n
      FROM documents
    ),
    dims AS (
      SELECT doc_id,
             (n % 640 + 32)::INT AS src_w,
             (n % 480 + 24)::INT AS src_h
      FROM src
    ),
    scaled AS (
      SELECT doc_id, src_w, src_h,
             least({TARGET_W}.0 / src_w, {TARGET_H}.0 / src_h) AS scale
      FROM dims
    ),
    sized AS (
      SELECT *,
             CAST(trunc(src_w * scale) AS BIGINT) AS dw,
             CAST(trunc(src_h * scale) AS BIGINT) AS dh
      FROM scaled
    )
    SELECT doc_id, src_w, src_h,
           dw::INT AS dst_w, dh::INT AS dst_h, scale,
           (dw * dh * 3) AS out_bytes
    FROM sized
    """,
    doc=f"Image resize stage ({TARGET_W}x{TARGET_H} letterbox): "
    "mapInPandas over the payload batches computes the aspect-"
    "preserving scale, output dims, and output byte size.  The pixel "
    "resample itself is stubbed (no image libs here) but the Spark "
    "plumbing — Arrow batch shapes, schema, partition-parallel map, "
    "zero shuffles — is the real 100 TB dataflow; the oracle replays "
    "the geometry exactly.",
)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "UTF-8"))
        .cast("bigint")
        .alias("n_bytes"),
    )
    return src.mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Real pixel decode: genuine BMP/PPM payloads round-tripped through the
# dependency-free codecs in functions/imaging.py.
# ---------------------------------------------------------------------------

_PIXEL_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, channels int, "
    "mean_px double, px00 int"
)


def _pixel_formula(doc_id: int, n: int):
    """Deterministic per-doc pixel bytes: v(i) = (doc_id*31 + i*7) % 256
    — chosen so the DuckDB oracle can replay the DECODED statistics in
    closed form (generate_series sum), making the codec round trip
    value-verified, not just row-counted."""
    import numpy as np

    return (
        (doc_id * 31 + np.arange(n, dtype=np.int64) * 7) % 256
    ).astype(np.uint8)


def _image_payload_df(base: DataFrame, key_of) -> DataFrame:
    """(doc_id, payload) with a genuine 24-bit BMP (even keys) or
    binary PPM (odd keys) payload encoded from the deterministic pixel
    formula — the ONE payload recipe shared by every image entry (and
    mirrored in their oracles), so dims/formula/format-split changes
    happen in exactly one place.  ``key_of`` maps doc_id to the
    payload key: identity for per-doc images, doc_id % IMG_POOL for
    the shared dedup pool."""
    from risinglight_spark.functions.imaging import encode_bmp24, encode_ppm

    def encode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"].astype("int64"):
                k = key_of(int(doc_id))
                w, h = 8 + k % 9, 8 + k % 7
                px = _pixel_formula(k, w * h * 3)
                payloads.append(
                    encode_bmp24(w, h, px)
                    if k % 2 == 0
                    else encode_ppm(w, h, px)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return base.mapInPandas(
        encode_batches, schema="doc_id bigint, payload binary"
    )


@register(
    "mm_decode_pixels",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             (8 + doc_id % 9) AS w,
             (8 + doc_id % 7) AS h
      FROM documents
    ), px AS (
      SELECT doc_id, w, h,
             unnest(generate_series(0, w * h * 3 - 1)) AS i
      FROM d
    ), s AS (
      SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
             sum((doc_id * 31 + i * 7) % 256) AS s, count(*) AS n
      FROM px GROUP BY doc_id
    )
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS fmt,
           w::INT AS width,
           h::INT AS height,
           3 AS channels,
           (s::DOUBLE / n / 255.0) AS mean_px,
           ((doc_id * 31) % 256)::INT AS px00
    FROM s
    """,
    doc="REAL image decode: per doc, a genuine 24-bit BMP (even ids) "
    "or binary PPM (odd ids) payload is encoded from a deterministic "
    "pixel formula, then decoded by the format parsers in "
    "functions/imaging.py — BMP header fields, bottom-up row order, "
    "BGR channel swap, and 4-byte row padding are all inverted for "
    "real (px00 pins the top-left pixel, which a flipped or "
    "channel-swapped decode would get wrong).  Both stages are Arrow "
    "mapInPandas scans, embarrassingly parallel, no shuffle; at "
    "100 TB the encode stage is replaced by reading the parquet "
    "binary column and the decode stage is unchanged.",
)
def mm_decode_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from risinglight_spark.functions.imaging import decode_image

    t = Tables(spark, sf_dir)
    payload_df = _image_payload_df(
        t.documents.select("doc_id"), lambda doc_id: doc_id
    )

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "fmt": [],
                "width": [],
                "height": [],
                "channels": [],
                "mean_px": [],
                "px00": [],
            }
            for doc_id, data in zip(pdf["doc_id"], pdf["payload"]):
                fmt, w, h, c, px = decode_image(bytes(data))
                s = int(px.sum(dtype=np.int64))
                out["doc_id"].append(int(doc_id))
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["mean_px"].append(s / (w * h * c) / 255.0)
                out["px00"].append(int(px[0]))
            pdf_out = pd.DataFrame(out)
            pdf_out["width"] = pdf_out["width"].astype("int32")
            pdf_out["height"] = pdf_out["height"].astype("int32")
            pdf_out["channels"] = pdf_out["channels"].astype("int32")
            pdf_out["px00"] = pdf_out["px00"].astype("int32")
            yield pdf_out

    return payload_df.mapInPandas(decode_batches, schema=_PIXEL_SCHEMA)


# ---------------------------------------------------------------------------
# Real pixel resize: decode -> nearest-neighbor resample -> stats, all
# value-verified in closed form (completes the mm_resize_stub geometry
# stage with actual pixel work, the way mm_decode_pixels completed the
# decode stub).
# ---------------------------------------------------------------------------

RSZ_W = 6
RSZ_H = 5

_RESIZE_PX_SCHEMA = (
    "doc_id bigint, src_w int, src_h int, dst_w int, dst_h int, "
    "mean_resized double, px00 int, px_br int"
)


def _resize_px_oracle() -> str:
    k_per_row = RSZ_W * 3
    n = RSZ_H * k_per_row
    return f"""
    WITH d AS (
      SELECT doc_id, (8 + doc_id % 9) AS w, (8 + doc_id % 7) AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, unnest(generate_series(0, {n - 1})) AS k
      FROM d
    ),
    m AS (
      SELECT doc_id, w, h,
             ((k // {k_per_row}) * h) // {RSZ_H} AS sy,
             (((k % {k_per_row}) // 3) * w) // {RSZ_W} AS sx,
             k % 3 AS c
      FROM px
    ),
    v AS (
      SELECT doc_id, w, h,
             (doc_id * 31 + ((sy * w + sx) * 3 + c) * 7) % 256 AS val
      FROM m
    )
    SELECT doc_id,
           any_value(w)::INT AS src_w, any_value(h)::INT AS src_h,
           {RSZ_W} AS dst_w, {RSZ_H} AS dst_h,
           (sum(val)::DOUBLE / {n} / 255.0) AS mean_resized,
           ((doc_id * 31) % 256)::INT AS px00,
           ((doc_id * 31
             + (((({RSZ_H - 1} * any_value(h)) // {RSZ_H}) * any_value(w)
                 + (({RSZ_W - 1} * any_value(w)) // {RSZ_W})) * 3 + 2) * 7)
            % 256)::INT AS px_br
    FROM v GROUP BY doc_id
    """


@register(
    "mm_resize_pixels",
    oracle=_resize_px_oracle(),
    doc=f"REAL pixel resize: each doc's BMP/PPM payload (same codec "
    "round trip as mm_decode_pixels) is decoded and nearest-neighbor "
    f"resampled to {RSZ_W}x{RSZ_H} with integer source mapping "
    f"(sx = x*w//{RSZ_W}, sy = y*h//{RSZ_H}) — the deterministic "
    "resample every vision-data pipeline runs before feature "
    "extraction.  px00 and px_br pin the top-left and bottom-right-"
    "blue samples, so a flipped row order, swapped channels, or an "
    "off-by-one in the index mapping all fail the hash.  Both stages "
    "are Arrow mapInPandas scans, embarrassingly parallel, zero "
    "shuffle; at 100 TB the encode stage is replaced by reading the "
    "parquet binary column and the resample is unchanged.",
)
def mm_resize_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from risinglight_spark.functions.imaging import decode_image

    t = Tables(spark, sf_dir)
    payload_df = _image_payload_df(
        t.documents.select("doc_id"), lambda doc_id: doc_id
    )

    def resize_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "src_w": [], "src_h": [],
                "dst_w": [], "dst_h": [],
                "mean_resized": [], "px00": [], "px_br": [],
            }
            for doc_id, data in zip(pdf["doc_id"], pdf["payload"]):
                _, w, h, c, px = decode_image(bytes(data))
                arr = px.reshape(h, w, c)
                sy = (np.arange(RSZ_H, dtype=np.int64) * h) // RSZ_H
                sx = (np.arange(RSZ_W, dtype=np.int64) * w) // RSZ_W
                res = arr[sy][:, sx, :]
                out["doc_id"].append(int(doc_id))
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["dst_w"].append(RSZ_W)
                out["dst_h"].append(RSZ_H)
                out["mean_resized"].append(
                    int(res.sum(dtype=np.int64))
                    / (RSZ_W * RSZ_H * c)
                    / 255.0
                )
                out["px00"].append(int(res[0, 0, 0]))
                out["px_br"].append(int(res[-1, -1, 2]))
            pdf_out = pd.DataFrame(out)
            for col in ("src_w", "src_h", "dst_w", "dst_h", "px00", "px_br"):
                pdf_out[col] = pdf_out[col].astype("int32")
            yield pdf_out

    return payload_df.mapInPandas(resize_batches, schema=_RESIZE_PX_SCHEMA)


# ---------------------------------------------------------------------------
# Real audio decode: genuine PCM16 WAV payloads round-tripped through
# the dependency-free codec in functions/audio.py — the audio leg of
# the multimodal column family (image decode/resize are above).
# ---------------------------------------------------------------------------

WAV_RATE = 8000

_AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, duration_ms double, "
    "first_sample int, mean_amp double, rms double"
)


def _audio_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT doc_id, (160 + doc_id % 81) AS n FROM documents
    ),
    s AS (
      SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i
      FROM d
    ),
    v AS (
      SELECT doc_id, n,
             ((doc_id * 13 + i * 11) % 4096) - 2048 AS val
      FROM s
    )
    SELECT doc_id,
           {WAV_RATE} AS sample_rate,
           any_value(n)::BIGINT AS n_samples,
           (any_value(n) * 1000.0 / {WAV_RATE}) AS duration_ms,
           ((doc_id * 13) % 4096 - 2048)::INT AS first_sample,
           (sum(val)::DOUBLE / any_value(n)) AS mean_amp,
           sqrt(sum(val * val)::DOUBLE / any_value(n)) AS rms
    FROM v GROUP BY doc_id
    """


@register(
    "mm_audio_wav_features",
    oracle=_audio_oracle(),
    doc="REAL audio decode: per doc, a genuine PCM16 WAV payload "
    "(44-byte RIFF header + little-endian samples, encoded from a "
    "deterministic sample formula) is parsed back by the chunk-walking "
    "decoder in functions/audio.py, and the standard audio-curation "
    "features come off the decoded samples: duration, first sample "
    "(pins byte order — a big-endian read fails the hash), mean "
    "amplitude (DC offset) and RMS (loudness — the gate feature "
    "audio-dataset pipelines threshold on).  Closed-form oracle "
    "replays the decoded values exactly; both stages are Arrow "
    "mapInPandas scans, zero shuffle; at 100 TB the encode stage is "
    "replaced by reading the parquet binary column and the decode "
    "stage is unchanged.",
)
def mm_audio_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from risinglight_spark.functions.audio import decode_wav, encode_wav_pcm16

    t = Tables(spark, sf_dir)
    base = t.documents.select("doc_id")

    def encode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"].astype("int64"):
                doc_id = int(doc_id)
                n = 160 + doc_id % 81
                i = np.arange(n, dtype=np.int64)
                samples = ((doc_id * 13 + i * 11) % 4096) - 2048
                payloads.append(
                    encode_wav_pcm16(WAV_RATE, samples.astype(np.int16))
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    payload_df = base.mapInPandas(
        encode_batches, schema="doc_id bigint, payload binary"
    )

    def feature_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "sample_rate": [], "n_samples": [],
                "duration_ms": [], "first_sample": [],
                "mean_amp": [], "rms": [],
            }
            for doc_id, data in zip(pdf["doc_id"], pdf["payload"]):
                rate, ch, s = decode_wav(bytes(data))
                s64 = s.astype(np.int64)
                n = len(s)
                # duration counts FRAMES: a stereo file interleaves 2
                # samples per frame, so n/rate alone would double it
                frames = n // ch
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_ms"].append(frames * 1000.0 / rate)
                out["first_sample"].append(int(s[0]))
                out["mean_amp"].append(int(s64.sum()) / n)
                out["rms"].append(
                    float(np.sqrt(int((s64 * s64).sum()) / n))
                )
            pdf_out = pd.DataFrame(out)
            pdf_out["sample_rate"] = pdf_out["sample_rate"].astype("int32")
            pdf_out["first_sample"] = pdf_out["first_sample"].astype("int32")
            yield pdf_out

    return payload_df.mapInPandas(feature_batches, schema=_AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# Image near-dup dedup via difference hash (dHash) over REAL decoded
# pixels — the image leg of the dedup family (LAION-style image
# dedup: perceptual hash -> hash-keyed grouping).  Payloads are keyed
# by doc_id % IMG_POOL so exact image replicas exist and the dedup is
# non-vacuous.
# ---------------------------------------------------------------------------

IMG_POOL = 50
DHASH_W = 9  # grayscale grid: 9 wide x 8 tall -> 8x8 comparisons
DHASH_H = 8

_DHASH_SCHEMA = (
    "doc_id bigint, dhash string, keeper bigint, n_copies bigint, "
    "is_dup boolean"
)


def _dhash_oracle() -> str:
    gray = lambda sx, sy, seed: (  # noqa: E731
        "(("
        + " + ".join(
            f"(({seed} * 31 + ((({sy}) * w + ({sx})) * 3 + {c}) * 7) % 256)"
            for c in range(3)
        )
        + ") // 3)"
    )
    ga = gray("(x * w) // " + str(DHASH_W), "(y * h) // " + str(DHASH_H), "seed")
    gb = gray(
        "((x + 1) * w) // " + str(DHASH_W),
        "(y * h) // " + str(DHASH_H),
        "seed",
    )
    return f"""
    WITH seeds AS (
      SELECT DISTINCT doc_id % {IMG_POOL} AS seed,
             (8 + (doc_id % {IMG_POOL}) % 9) AS w,
             (8 + (doc_id % {IMG_POOL}) % 7) AS h
      FROM documents
    ),
    grid AS (
      SELECT seed, w, h, y.y, x.x
      FROM seeds,
           (SELECT unnest(generate_series(0, {DHASH_H - 1})) AS y) y,
           (SELECT unnest(generate_series(0, {DHASH_W - 2})) AS x) x
    ),
    bits AS (
      SELECT seed, y,
             sum(CASE WHEN {ga} > {gb} THEN 1 << x ELSE 0 END) AS byte
      FROM grid GROUP BY seed, y
    ),
    hashes AS (
      SELECT seed,
             string_agg(printf('%02x', byte::BIGINT), '' ORDER BY y)
                 AS dhash
      FROM bits GROUP BY seed
    ),
    docs AS (
      SELECT d.doc_id, h.dhash
      FROM documents d JOIN hashes h ON d.doc_id % {IMG_POOL} = h.seed
    ),
    groups AS (
      SELECT dhash, min(doc_id) AS keeper, count(*) AS n_copies
      FROM docs GROUP BY dhash
    )
    SELECT d.doc_id, d.dhash, g.keeper, g.n_copies,
           (d.doc_id <> g.keeper) AS is_dup
    FROM docs d JOIN groups g USING (dhash)
    """


@register(
    "mm_image_dhash_dedup",
    oracle=_dhash_oracle(),
    doc=f"Image near-dup dedup by difference hash over REAL decoded "
    f"pixels: payloads (shared across docs via doc_id % {IMG_POOL}) "
    "are decoded by the BMP/PPM codecs, integer-grayscaled, nearest-"
    f"neighbor sampled to a {DHASH_W}x{DHASH_H} grid, and hashed by "
    "the left>right comparison bits (dHash — the standard perceptual "
    "hash image-dataset pipelines group on; LAION dedups this way).  "
    "Keep-lowest-doc_id per hash, copy counts, and a dup flag come "
    "from ONE hash-keyed shuffle of 16-char strings — pixels never "
    "shuffle.  The oracle replays the decode, grayscale, sampling, "
    "and bit arithmetic in closed form, so a flipped comparison or "
    "channel-order bug fails the hash.  At 100 TB: decode+hash is a "
    "stateless Arrow scan; the grouping shuffles ~24 B/doc.",
)
def mm_image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from risinglight_spark.functions.imaging import decode_image

    t = Tables(spark, sf_dir)
    payload_df = _image_payload_df(
        t.documents.select("doc_id"), lambda doc_id: doc_id % IMG_POOL
    )

    def dhash_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, data in zip(pdf["doc_id"], pdf["payload"]):
                _, w, h, c, px = decode_image(bytes(data))
                arr = px.reshape(h, w, c).astype(np.int64)
                gray = arr.sum(axis=2) // 3
                sy = (np.arange(DHASH_H, dtype=np.int64) * h) // DHASH_H
                sx = (np.arange(DHASH_W, dtype=np.int64) * w) // DHASH_W
                g = gray[sy][:, sx]
                bits = g[:, :-1] > g[:, 1:]
                weights = 1 << np.arange(DHASH_W - 1, dtype=np.int64)
                row_bytes = (bits * weights).sum(axis=1)
                hashes.append("".join(f"{b:02x}" for b in row_bytes))
                ids.append(int(doc_id))
            yield pd.DataFrame({"doc_id": ids, "dhash": hashes})

    docs = payload_df.mapInPandas(
        dhash_batches, schema="doc_id bigint, dhash string"
    )
    groups = docs.groupBy("dhash").agg(
        F.min("doc_id").alias("keeper"),
        F.count("*").alias("n_copies"),
    )
    return docs.join(groups, "dhash").select(
        "doc_id",
        "dhash",
        "keeper",
        "n_copies",
        (F.col("doc_id") != F.col("keeper")).alias("is_dup"),
    )
