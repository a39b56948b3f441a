"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

The fixture tables carry no real image/audio bytes (and this container has
no decode libs), so the *plumbing* is real — BinaryType columns, Arrow
batch shapes, mapInPandas feature extraction, partitioning by modality —
while the codec step is a clearly-marked stub (``decode_image`` raises
NotImplementedError; ``fake_decode_features`` is the deterministic stand-in
wired into tests and the oracle-checked query).

At 100 TB: binary payloads dominate bytes — the layout keeps them in their
own column (parquet column pruning means metadata-only queries never read
the blobs), partitions by (modality, size-bucket) for balanced decode
fan-out, and runs decoders as Arrow-batched mapInPandas so each Python
worker amortizes codec init across a batch.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pypgcdc_spark.queries import load, query

MEDIA_SCHEMA = (
    "doc_id BIGINT, modality STRING, payload BINARY, media_w INT, media_h INT"
)
FEATURE_SCHEMA = "doc_id BIGINT, n_bytes BIGINT, content_md5 STRING, feat0 DOUBLE"


def decode_image(payload: bytes):  # pragma: no cover - deliberate stub
    """Real image decode requires PIL/libjpeg — absent in this container.

    STUB: a production build plugs the codec in here; everything around it
    (schema, batching, partitioning) is already exercised."""
    raise NotImplementedError("image codecs not available in this environment")


def resize_image(payload: bytes, w: int, h: int):  # pragma: no cover - stub
    """STUB (no PIL in container): production resize kernel plugs in here;
    runs inside the same mapInPandas batch loop as decode."""
    raise NotImplementedError("image codecs not available in this environment")


def sample_frames(payload: bytes, every_n: int = 30):  # pragma: no cover - stub
    """STUB (no video libs): frame sampling for video payloads — yields
    (frame_idx, frame_bytes); batch shape identical to decode."""
    raise NotImplementedError("video codecs not available in this environment")


def fake_decode_features(payload: bytes) -> tuple:
    """Deterministic stand-in for decode+feature-extract: byte length,
    content hash, and a pseudo-feature derived from the first hash byte."""
    h = hashlib.md5(payload).hexdigest()
    return len(payload), h, float(int(h[:2], 16)) / 255.0


def media_table(spark, sf_dir: str) -> DataFrame:
    """Synthesize a media table: documents' text bytes as the opaque
    payload, plus typed metadata columns (the convention real ingest would
    follow: payload BINARY + modality + dimensions)."""
    (docs,) = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.lit("text").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("media_w"),
        F.lit(None).cast("int").alias("media_h"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    The per-batch loop is where a real codec would run; batch size is
    controlled by spark.sql.execution.arrow.maxRecordsPerBatch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [f[0] for f in feats],
                    "content_md5": [f[1] for f in feats],
                    "feat0": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


@query(
    "multimodal_binary_features",
    oracle="""
    -- Oracle recomputes the deterministic fake decode in SQL: octet length,
    -- md5 of the utf-8 payload, first-hash-byte pseudo-feature.
    WITH f AS (
      SELECT doc_id, source,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS content_md5
      FROM documents
    )
    SELECT source, COUNT(*) AS n_media,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT content_md5) AS n_distinct_payloads,
           ROUND(SUM(('0x' || substr(content_md5, 1, 2))::INTEGER) / 255.0, 2) AS sum_feat0
    FROM f GROUP BY source
    """,
)
def multimodal_binary_features(spark, sf_dir):
    """Binary-column pipeline end-to-end: build the media table, run the
    Arrow-batched (stub) decoder via mapInPandas, aggregate typed features.
    The one intentionally-Python stage in the engine — everything before
    and after is Catalyst."""
    (docs,) = load(spark, sf_dir, "documents")
    media = media_table(docs.sparkSession, sf_dir)
    feats = extract_features(media)
    src = docs.select("doc_id", "source")
    return (
        feats.join(F.broadcast(src), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("content_md5").alias("n_distinct_payloads"),
            F.round(
                F.sum(F.conv(F.substring("content_md5", 1, 2), 16, 10).cast("long"))
                / 255.0,
                2,
            ).alias("sum_feat0"),
        )
    )
