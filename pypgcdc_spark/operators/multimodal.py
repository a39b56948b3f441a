"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

The codec layer is dependency-free (this container has no PIL/libjpeg):
``decode_image`` parses uncompressed PPM (P6) and 24-bit BMP payloads into
numpy pixel arrays, ``resize_image`` is a nearest-neighbor numpy kernel,
and ``sample_frames`` walks a trivial length-prefixed frame container.
Compressed formats (JPEG/PNG/H.264) would plug into the same three
functions — the Spark-side plumbing (BinaryType columns, Arrow batch
shapes, mapInPandas signatures) is identical for any codec.

At 100 TB: binary payloads dominate bytes — the layout keeps them in their
own column (parquet column pruning means metadata-only queries never read
the blobs), partitions by (modality, size-bucket) for balanced decode
fan-out, and runs decoders as Arrow-batched mapInPandas so each Python
worker amortizes codec init across a batch.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pypgcdc_spark.queries import load, query

MEDIA_SCHEMA = (
    "doc_id BIGINT, modality STRING, payload BINARY, media_w INT, media_h INT"
)
FEATURE_SCHEMA = "doc_id BIGINT, n_bytes BIGINT, content_md5 STRING, feat0 DOUBLE"

VIDEO_MAGIC = b"VID0"


# -- codecs (pure Python/numpy; no external image libraries) ---------------


def encode_ppm(w: int, h: int, pixels: bytes) -> bytes:
    """Binary PPM (P6, maxval 255): the simplest real image format."""
    if len(pixels) != w * h * 3:
        raise ValueError(f"expected {w * h * 3} RGB bytes, got {len(pixels)}")
    return b"P6\n%d %d\n255\n" % (w, h) + pixels


def decode_image(payload: bytes) -> Tuple[int, int, np.ndarray]:
    """Decode an uncompressed image payload -> (w, h, uint8 array [h,w,3]).

    Supports PPM P6 and 24-bit uncompressed BMP. A production build adds
    compressed codecs here; callers never change.
    """
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp24(payload)
    raise ValueError(f"unsupported image payload (magic {payload[:2]!r})")


def _decode_ppm(payload: bytes) -> Tuple[int, int, np.ndarray]:
    # Header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster.
    fields: List[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(payload[i:j])
        i = j
    i += 1  # the single whitespace byte before the raster
    w, h, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    raster = payload[i : i + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return w, h, np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _decode_bmp24(payload: bytes) -> Tuple[int, int, np.ndarray]:
    # BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40): little-endian,
    # rows bottom-up, BGR order, each row padded to 4 bytes.
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h, planes, bpp, compression = struct.unpack_from(
        "<IiihhI", payload, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    row_stride = (w * 3 + 3) & ~3
    top_down = h < 0
    h = abs(h)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for row in range(h):
        src = data_off + row * row_stride
        bgr = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=src).reshape(
            w, 3
        )
        dst = row if top_down else (h - 1 - row)
        out[dst] = bgr[:, ::-1]  # BGR -> RGB
    return w, h, out


def resize_image(payload_or_array, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize -> uint8 array [out_h, out_w, 3].

    ``src_x = floor(dst_x * w / out_w)`` — the standard NN mapping, chosen
    so the oracle SQL can recompute sampled pixel positions exactly.
    """
    if isinstance(payload_or_array, (bytes, bytearray)):
        _, _, arr = decode_image(bytes(payload_or_array))
    else:
        arr = payload_or_array
    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[np.ix_(ys, xs)]


def encode_video(frames: List[bytes]) -> bytes:
    """Trivial frame container: magic + u16 frame count + per-frame
    u32-length-prefixed image payloads (any format decode_image accepts)."""
    out = [VIDEO_MAGIC, struct.pack(">H", len(frames))]
    for fr in frames:
        out.append(struct.pack(">I", len(fr)))
        out.append(fr)
    return b"".join(out)


def sample_frames(
    payload: bytes, every_n: int = 30
) -> Iterator[Tuple[int, int, int, np.ndarray]]:
    """Decode every ``every_n``-th frame of a video payload; yields
    ``(frame_idx, w, h, pixels)``. Frames in between are *skipped without
    decoding* — at scale that is the point of sampling."""
    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("not a VID0 payload")
    (n_frames,) = struct.unpack_from(">H", payload, 4)
    pos = 6
    for idx in range(n_frames):
        (ln,) = struct.unpack_from(">I", payload, pos)
        pos += 4
        if idx % every_n == 0:
            w, h, arr = decode_image(payload[pos : pos + ln])
            yield idx, w, h, arr
        pos += ln


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
    # No broadcast hint: `src` is one row per document — O(corpus) — so a
    # forced broadcast cannot survive large inputs (r12 scale guard, same
    # rule as the dedup size tables).  Statistics pick broadcast while the
    # projection is small and a shuffle join once it is not.
    return (
        feats.join(src, "doc_id")
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


# -- deterministic synthetic media (oracle-recomputable payloads) ----------


def _synth_dims(doc_id: int) -> Tuple[int, int, int]:
    """(w, h, seed) for the synthetic image of a document — tiny enough
    that w*h*3 < 256, which keeps the oracle's mod-256 sum formula to a
    single wraparound."""
    return 4 + doc_id % 5, 3 + doc_id % 4, (doc_id * 7) % 256


def synth_image(doc_id: int) -> bytes:
    """PPM whose pixel bytes are the sequence (s+k) % 256 — closed-form
    recomputable in SQL, so decode results are oracle-checkable."""
    w, h, s = _synth_dims(doc_id)
    return encode_ppm(w, h, bytes((s + k) % 256 for k in range(w * h * 3)))


def synth_video(doc_id: int, n_frames: int = 3) -> bytes:
    """VID0 container of ``n_frames`` PPM frames; frame f starts its pixel
    sequence at (s + 11*f) % 256."""
    w, h, s = _synth_dims(doc_id)
    return encode_video(
        [
            encode_ppm(w, h, bytes(((s + 11 * f + k) % 256) for k in range(w * h * 3)))
            for f in range(n_frames)
        ]
    )


@query(
    "multimodal_decode_stats",
    oracle="""
    -- Recomputes the real decode/resize/frame-sample results in closed
    -- form: pixels of doc d are the sequence (s+k)%256 (s=7d%256,
    -- n=w*h*3<256), so a run's sum is n*s + n(n-1)/2 minus 256 per
    -- wrapped term. Resize is nearest-neighbor (src = dst*size//2);
    -- frame f of the video starts at (s+11f)%256, sampled every 2nd.
    WITH g AS (
      SELECT doc_id, source,
             4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
             (doc_id * 7) % 256 AS s
      FROM documents
    ),
    base AS (
      SELECT doc_id, source, w, h, s, w*h*3 AS n,
             (h // 2) * 3 * w AS ys2, (w // 2) * 3 AS xs2
      FROM g
    ),
    rs AS (
      SELECT b.doc_id, SUM((b.s + t1.ysv + t2.xsv + t3.c) % 256) AS rs_sum
      FROM base b,
           UNNEST([0, b.ys2]) AS t1(ysv),
           UNNEST([0, b.xs2]) AS t2(xsv),
           UNNEST([0, 1, 2]) AS t3(c)
      GROUP BY b.doc_id
    ),
    per_doc AS (
      SELECT b.source, b.w * b.h AS npx,
             b.n * b.s + b.n * (b.n - 1) // 2
               - 256 * GREATEST(0, b.s + b.n - 256) AS px_sum,
             rs.rs_sum,
             (b.n * b.s + b.n * (b.n - 1) // 2
               - 256 * GREATEST(0, b.s + b.n - 256))
             + (b.n * ((b.s + 22) % 256) + b.n * (b.n - 1) // 2
               - 256 * GREATEST(0, ((b.s + 22) % 256) + b.n - 256)) AS vid_sum
      FROM base b JOIN rs ON b.doc_id = rs.doc_id
    )
    SELECT source,
           COUNT(*) AS n_images,
           CAST(SUM(npx) AS BIGINT) AS total_pixels,
           CAST(SUM(px_sum) AS BIGINT) AS total_px_sum,
           CAST(SUM(rs_sum) AS BIGINT) AS total_resized_sum,
           CAST(SUM(vid_sum) AS BIGINT) AS total_sampled_sum
    FROM per_doc GROUP BY source
    """,
)
def multimodal_decode_stats(spark, sf_dir):
    """REAL decode path end-to-end, no stubs: synthesize deterministic
    PPM/VID0 payloads into binary columns (Arrow round-trip #1), then
    decode + nearest-neighbor resize + every-2nd frame-sample with the
    dependency-free codecs (Arrow round-trip #2), then Catalyst aggregates
    the integer pixel statistics per source. The oracle recomputes every
    stage in closed form."""
    (docs,) = load(spark, sf_dir, "documents")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "img": [synth_image(int(d)) for d in pdf["doc_id"]],
                    "vid": [synth_video(int(d)) for d in pdf["doc_id"]],
                }
            )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "source": [], "npx": [], "px_sum": [],
                    "rs_sum": [], "vid_sum": []}
            for doc_id, source, img, vid in zip(
                pdf["doc_id"], pdf["source"], pdf["img"], pdf["vid"]
            ):
                w, h, arr = decode_image(bytes(img))
                resized = resize_image(arr, 2, 2)
                vsum = sum(
                    int(frame.sum())
                    for _, _, _, frame in sample_frames(bytes(vid), every_n=2)
                )
                rows["doc_id"].append(doc_id)
                rows["source"].append(source)
                rows["npx"].append(w * h)
                rows["px_sum"].append(int(arr.sum()))
                rows["rs_sum"].append(int(resized.sum()))
                rows["vid_sum"].append(vsum)
            yield pd.DataFrame(rows)

    media = docs.select("doc_id", "source").mapInPandas(
        synth, "doc_id bigint, source string, img binary, vid binary"
    )
    feats = media.mapInPandas(
        decode,
        "doc_id bigint, source string, npx bigint, px_sum bigint, "
        "rs_sum bigint, vid_sum bigint",
    )
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("npx").alias("total_pixels"),
        F.sum("px_sum").alias("total_px_sum"),
        F.sum("rs_sum").alias("total_resized_sum"),
        F.sum("vid_sum").alias("total_sampled_sum"),
    )


# -- audio: real RIFF/WAVE PCM16 codec (dependency-free) -------------------

WAV_SAMPLE_RATE = 8000


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """Minimal but spec-true RIFF/WAVE writer: PCM16 mono."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    chunks = fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE") + chunks


def decode_wav(payload: bytes) -> Tuple[int, np.ndarray]:
    """Real RIFF chunk walker: finds fmt/data chunks wherever they sit,
    validates PCM16 mono, returns (sample_rate, int16 array)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sr, data


def synth_audio(doc_id: int) -> bytes:
    """WAV whose samples are ((s·31 + k·17) mod 4001) − 2000 with
    s = (13·doc_id) mod 997 — closed-form recomputable in SQL."""
    n = 40 + doc_id % 50
    s = (doc_id * 13) % 997
    k = np.arange(n, dtype=np.int64)
    return encode_wav(WAV_SAMPLE_RATE, ((s * 31 + k * 17) % 4001 - 2000))


@query(
    "multimodal_audio_stats",
    oracle="""
    -- Recomputes the real WAV decode + every-2nd-sample downsample in
    -- closed form: samples of doc d are ((s*31 + k*17) % 4001) - 2000,
    -- s = (13d) % 997, n = 40 + d % 50 — every statistic is an exact
    -- integer, so the whole audio path is hash-checked.
    WITH g AS (
      SELECT doc_id, source, 40 + doc_id % 50 AS n, (doc_id * 13) % 997 AS s
      FROM documents
    ),
    samp AS (
      SELECT g.doc_id, g.source, g.n, t.k,
             ((g.s * 31 + t.k * 17) % 4001) - 2000 AS v
      FROM g, UNNEST(range(g.n)) AS t(k)
    ),
    per AS (
      SELECT doc_id, any_value(source) AS source, any_value(n) AS n,
             SUM(ABS(v)) AS sum_abs, SUM(v * v) AS sum_sq,
             SUM(CASE WHEN v >= 0 THEN 1 ELSE 0 END) AS n_nonneg,
             SUM(CASE WHEN k % 2 = 0 THEN ABS(v) ELSE 0 END) AS ds_sum_abs
      FROM samp GROUP BY doc_id
    )
    SELECT source,
           COUNT(*) AS n_clips,
           CAST(SUM(n) AS BIGINT) AS total_samples,
           CAST(SUM(n) * 1000000 / 8000 AS BIGINT) AS total_duration_us,
           CAST(SUM(sum_abs) AS BIGINT) AS total_abs,
           CAST(SUM(sum_sq) AS BIGINT) AS total_sq,
           CAST(SUM(n_nonneg) AS BIGINT) AS total_nonneg,
           CAST(SUM(ds_sum_abs) AS BIGINT) AS total_downsampled_abs
    FROM per GROUP BY source
    """,
)
def multimodal_audio_stats(spark, sf_dir):
    """REAL audio path end-to-end: synthesize deterministic PCM16 WAV
    payloads into a binary column, decode them with the dependency-free
    RIFF parser, downsample 2:1, and aggregate exact integer signal
    statistics per source.  Same design as ``multimodal_decode_stats``
    (closed-form oracle, Arrow-batched mapInPandas, payloads prunable as
    their own column); a compressed codec (MP3/FLAC) would drop into
    ``decode_wav``'s slot with zero plan changes."""
    (docs,) = load(spark, sf_dir, "documents")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "wav": [synth_audio(int(d)) for d in pdf["doc_id"]],
                }
            )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "source": [], "n": [], "dur_us": [],
                    "sum_abs": [], "sum_sq": [], "n_nonneg": [], "ds_abs": []}
            for doc_id, source, wav in zip(pdf["doc_id"], pdf["source"], pdf["wav"]):
                sr, x = decode_wav(bytes(wav))
                xl = x.astype(np.int64)
                rows["doc_id"].append(doc_id)
                rows["source"].append(source)
                rows["n"].append(len(x))
                rows["dur_us"].append(len(x) * 1_000_000 // sr)
                rows["sum_abs"].append(int(np.abs(xl).sum()))
                rows["sum_sq"].append(int((xl * xl).sum()))
                rows["n_nonneg"].append(int((xl >= 0).sum()))
                rows["ds_abs"].append(int(np.abs(xl[::2]).sum()))
            yield pd.DataFrame(rows)

    media = docs.select("doc_id", "source").mapInPandas(
        synth, "doc_id bigint, source string, wav binary"
    )
    feats = media.mapInPandas(
        decode,
        "doc_id bigint, source string, n bigint, dur_us bigint, sum_abs bigint, "
        "sum_sq bigint, n_nonneg bigint, ds_abs bigint",
    )
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum("n").alias("total_samples"),
        F.sum("dur_us").alias("total_duration_us"),
        F.sum("sum_abs").alias("total_abs"),
        F.sum("sum_sq").alias("total_sq"),
        F.sum("n_nonneg").alias("total_nonneg"),
        F.sum("ds_abs").alias("total_downsampled_abs"),
    )
