"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decode / feature-extract / frame-sample stages.

The container has no image/audio libraries, so the *real* decoders are
stubbed (`decode_image_real` raises NotImplementedError); what is real
— and tested — is everything Spark-side: the binary column schema, the
metadata struct, the Arrow-batched ``mapInPandas`` plumbing (batch
shapes, output schema, partition behavior), and a deterministic fake
feature extractor whose formula the DuckDB oracle replays exactly.

Payloads are synthesized from ``documents.text`` (utf-8 bytes) because
the fixture set has no true image table; at 100 TB the same plan shape
reads parquet ``binary`` columns directly.

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


def decode_image_real(payload: bytes) -> "object":
    """REAL image decode — NOT IMPLEMENTED in this container (no
    PIL/opencv).  The Spark-side plumbing around it (schema, batching,
    partitioning) is what this module exercises; swap this function for
    a real decoder on a cluster with the libs installed."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available here; "
        "use fake_features (deterministic stand-in) instead"
    )


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
    doc="Arrow-batched mapInPandas 'decode' stage with a deterministic "
    "fake extractor (real decoder: decode_image_real, stubbed — no "
    "image libs in container).  The Python side recomputes the "
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
    """Arrow-batched 'resize' stage.  The real pixel resample is
    stubbed (no PIL/opencv in this container — see decode_image_real);
    source dims are derived deterministically from the payload and the
    letterbox geometry (aspect-preserving scale into TARGET_WxTARGET_H)
    is computed exactly as a real resizer would."""
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
