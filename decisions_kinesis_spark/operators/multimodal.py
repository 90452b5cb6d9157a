"""Multimodal (binary) column handling (north-star, SURVEY.md §7 M6).

Media payloads are opaque ``binary`` columns with typed metadata —
exactly the reference's data model for Kinesis record payloads
(``Record.Data`` bytes, SURVEY.md §1.1).  The Spark-side plumbing
(schema, partitioning, Arrow batch shape) is real and tested; the
actual codec step is stubbed behind ``decode_image`` because no
image/audio libraries exist in this container.

The ``multimodal_blob_metadata`` query demonstrates the metadata path
end-to-end with a DuckDB value oracle (byte length + hex/base64
prefixes of the blob).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from decisions_kinesis_spark.sources.tables import load_table

#: Media-envelope schema: opaque bytes + typed metadata (mirrors the
#: record envelope of functions/envelope.py for media payloads).
MEDIA_SCHEMA = (
    "media_id long, blob binary, media_type string, n_bytes long, meta string"
)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: treat document text bytes as an opaque media blob —
    the container has no real media fixtures, so this exercises the
    binary-column plumbing with deterministic content."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("blob"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
        F.to_json(F.struct("lang", "source")).alias("meta"),
    )


def decode_image(blob: bytes) -> "object":
    """STUB — real image decode requires PIL/cv2 (absent here).

    The Spark-side contract (bytes in, HxWxC array out) is what a
    production deployment plugs a codec into.
    """
    raise NotImplementedError("image codecs not available in this container")


def fake_decode_features(blob: bytes) -> list[float]:
    """Deterministic stand-in for a media feature extractor: fixed-size
    feature vector derived from byte statistics (testable, stable)."""
    if not blob:
        return [0.0] * 4
    n = len(blob)
    return [
        float(n),
        float(sum(blob) % 997),
        float(blob[0]),
        float(blob[-1]),
    ]


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over media blobs — the real
    Arrow-batched plumbing a decode/resize/frame-sample step uses.

    Scale: pure per-partition map (no shuffle); batch size bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
    large blobs cannot blow executor memory.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["blob"].map(fake_decode_features)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return df.mapInPandas(
        _batches, "media_id long, media_type string, features array<double>"
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled offset of
    each blob (stand-in for video frame extraction).  Pure Column ops —
    ``sequence`` + ``explode`` — so it scales as a flatMap, no Python.
    """
    return df.select(
        "media_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(octet_length(blob) div"
                f" {every_n_bytes}, 1)), i -> substring(blob,"
                f" (i - 1) * {every_n_bytes} + 1, {every_n_bytes}))"
            )
        ).alias("frame_no", "frame_bytes"),
    )


def multimodal_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata over opaque blobs: sizes + content prefixes (hex/b64)."""
    media = documents_as_media(spark, sf_dir)
    return media.select(
        "media_id",
        "media_type",
        "n_bytes",
        # prefix of the hex dump (DuckDB cannot substring a BLOB directly)
        F.lower(F.substring(F.hex(F.col("blob")), 1, 16)).alias("hex_prefix"),
        F.get_json_object("meta", "$.lang").alias("lang"),
    )


def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling end-to-end with a value oracle: every 64-byte
    frame of every blob with its length and content prefix — proves the
    sequence+explode framing (the video-frame-extraction plumbing)
    produces exactly the bytes a SQL engine slices from the hex dump."""
    frames = frame_sample(documents_as_media(spark, sf_dir), every_n_bytes=64)
    return frames.select(
        "media_id",
        (F.col("frame_no") + 1).cast("bigint").alias("frame_no"),
        F.octet_length("frame_bytes").cast("bigint").alias("frame_len"),
        F.lower(F.substring(F.hex(F.col("frame_bytes")), 1, 8)).alias("frame_prefix"),
    )


def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas (Arrow-batched Python) feature path, value-checked
    against SQL: the deterministic byte-statistics features let DuckDB
    recompute what the Python extractor produced — the correctness
    harness a real codec would get via golden files."""
    feats = extract_features(documents_as_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "media_type",
        F.col("features")[0].alias("f_len"),
        F.col("features")[1].alias("f_bytesum"),
        F.col("features")[2].alias("f_first"),
        F.col("features")[3].alias("f_last"),
    )


QUERIES = {
    "multimodal_blob_metadata": multimodal_blob_metadata,
    "multimodal_frame_stats": multimodal_frame_stats,
    "multimodal_feature_extract": multimodal_feature_extract,
}

ORACLES = {
    "multimodal_frame_stats": """
        WITH media AS (
            SELECT doc_id AS media_id,
                   hex(encode(text)) AS hexd,
                   octet_length(encode(text))::BIGINT AS n_bytes
            FROM documents
        ),
        frames AS (
            SELECT media_id,
                   i.i AS frame_no,
                   substr(hexd, (i.i - 1) * 128 + 1, 128) AS frame_hex
            FROM media, LATERAL (
                SELECT unnest(generate_series(1,
                           greatest(n_bytes // 64, 1))) AS i
            ) i
        )
        SELECT media_id, frame_no,
               (length(frame_hex) // 2)::BIGINT AS frame_len,
               lower(substr(frame_hex, 1, 8)) AS frame_prefix
        FROM frames
    """,
    "multimodal_feature_extract": """
        WITH media AS (
            SELECT doc_id AS media_id,
                   'text/plain' AS media_type,
                   hex(encode(text)) AS hexd,
                   octet_length(encode(text))::BIGINT AS n_bytes
            FROM documents
        )
        SELECT media_id, media_type,
               n_bytes::DOUBLE AS f_len,
               CASE WHEN n_bytes = 0 THEN 0.0 ELSE
                   (list_sum(list_transform(generate_series(1, n_bytes),
                        i -> ('0x' || substr(hexd, (i - 1) * 2 + 1, 2))::INT))
                    % 997)::DOUBLE END AS f_bytesum,
               CASE WHEN n_bytes = 0 THEN 0.0 ELSE
                   ('0x' || substr(hexd, 1, 2))::INT::DOUBLE END AS f_first,
               CASE WHEN n_bytes = 0 THEN 0.0 ELSE
                   ('0x' || substr(hexd, (n_bytes - 1) * 2 + 1, 2))::INT::DOUBLE
               END AS f_last
        FROM media
    """,
    "multimodal_blob_metadata": """
        WITH media AS (
            SELECT doc_id AS media_id,
                   'text/plain' AS media_type,
                   encode(text) AS blob,
                   octet_length(encode(text))::BIGINT AS n_bytes,
                   lang
            FROM documents
        )
        SELECT media_id, media_type, n_bytes,
               lower(substr(hex(blob), 1, 16)) AS hex_prefix,
               lang
        FROM media
    """,
}
