"""Multimodal-column plumbing: media as opaque binary columns + typed
metadata, with decode / feature-extraction / frame-sampling operators.

The container ships no image/audio libraries, so the *codec* step is a
deterministic fake (documented stub): a 16-byte header
(magic, width, height, n_frames as big-endian u32) prepended to a payload.
Everything around the codec — binary schema, Arrow-batched mapInPandas
decode, batch shapes, feature extraction, frame-index explosion — is real
and is exactly the plumbing a PIL/ffmpeg-backed decoder would plug into
(swap _parse_header/_decode_payload for the real library call).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"LDSM"
_HEADER_FMT = ">4sIII"                 # magic, width, height, n_frames
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)   # plain ints/str pickle fine

# Schema of a decoded-metadata row (the typed side of the opaque binary).
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("payload_len", T.LongType(), True),
])


def synth_media(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Deterministic fake media blobs derived from the documents table:
    header dims are doc_id arithmetic, payload is the utf-8 text.  Stands
    in for `spark.read.format("binaryFile")` in this container."""
    @F.pandas_udf("binary")
    def _pack(ids: pd.Series, texts: pd.Series) -> pd.Series:
        out = []
        for i, t in zip(ids, texts):
            w = 16 * (int(i) % 40) + 16
            h = 16 * (int(i) % 30) + 16
            nf = int(i) % 25 + 1
            out.append(struct.pack(_HEADER_FMT, _MAGIC, w, h, nf) + t.encode("utf-8"))
        return pd.Series(out)
    return docs.select(F.col(id_col).alias("doc_id"),
                       _pack(F.col(id_col), F.col(text_col)).alias("media"))


def decode_media_meta(media: DataFrame, binary_col: str = "media",
                      real_codec: bool = False) -> DataFrame:
    """Parse the typed metadata out of the binary column via Arrow-batched
    mapInPandas (one pandas frame per input batch — the shape a real
    decoder wants: decode library loaded once per worker, rows processed
    vectorized).  real_codec=True is the seam for an actual image/video
    library, absent in this container."""
    if real_codec:
        raise NotImplementedError(
            "no image/audio codecs in this environment; wire PIL/av here")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[binary_col]):
                b = bytes(blob)
                if len(b) >= _HEADER_SIZE and b[:4] == _MAGIC:
                    _, w, h, nf = struct.unpack(_HEADER_FMT, b[:_HEADER_SIZE])
                    metas.append((int(doc_id), w, h, nf,
                                  len(b) - _HEADER_SIZE))
                else:
                    metas.append((int(doc_id), None, None, None, None))
            yield pd.DataFrame(metas, columns=[f.name for f in
                                               MEDIA_META_SCHEMA.fields])

    return media.mapInPandas(_decode, MEDIA_META_SCHEMA)


def byte_histogram_features(media: DataFrame, binary_col: str = "media",
                            n_bins: int = 16) -> DataFrame:
    """Deterministic payload features: normalized byte histogram
    (array<double>, n_bins) — the feature-extraction plumbing a real
    embedding model would replace."""
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ])

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[binary_col]):
                b = bytes(blob)[_HEADER_SIZE:]
                hist = [0] * n_bins
                for byte in b:
                    hist[byte * n_bins // 256] += 1
                total = max(len(b), 1)
                rows.append((int(doc_id), [c / total for c in hist]))
            yield pd.DataFrame(rows, columns=["doc_id", "features"])

    return media.mapInPandas(_feat, out_schema)


def resize_media(media: DataFrame, target_w: int, target_h: int,
                 binary_col: str = "media",
                 real_codec: bool = False) -> DataFrame:
    """Resize operator: binary in -> binary out, Arrow-batched mapInPandas
    (the batch shape a PIL `Image.resize` / ffmpeg scale filter plugs
    into; load-library-once-per-worker, vectorized rows).  The stub
    "resize" rewrites the header to the target dims and scales the
    payload length proportionally to the pixel-count ratio —
    deterministic, so tests can pin exact output sizes.  real_codec=True
    is the seam for the actual library, absent in this container."""
    if real_codec:
        raise NotImplementedError(
            "no image/audio codecs in this environment; wire PIL/av here")
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField(binary_col, T.BinaryType(), True),
    ])

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[binary_col]):
                b = bytes(blob)
                if len(b) < _HEADER_SIZE or b[:4] != _MAGIC:
                    rows.append((int(doc_id), None))
                    continue
                _, w, h, nf = struct.unpack(_HEADER_FMT, b[:_HEADER_SIZE])
                payload = b[_HEADER_SIZE:]
                ratio = (target_w * target_h) / max(w * h, 1)
                new_len = max(int(len(payload) * ratio), 0)
                resized = (payload * (new_len // max(len(payload), 1) + 1)
                           )[:new_len] if payload else b""
                rows.append((int(doc_id),
                             struct.pack(_HEADER_FMT, _MAGIC, target_w,
                                         target_h, nf) + resized))
            yield pd.DataFrame(rows, columns=["doc_id", binary_col])

    return media.mapInPandas(_resize, out_schema)


def sample_frames(meta: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame sampling for video rows: one output row per kept frame index
    (JVM-side sequence + explode — sampling itself needs no codec)."""
    idx: Column = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return (meta.filter(F.col("n_frames").isNotNull())
            .withColumn("frame_idx", F.explode(idx)))


def read_media_dir(spark, path: str) -> DataFrame:
    """The real ingest path for media blobs: Spark's binaryFile source —
    one row per file with (path, modificationTime, length, content).
    Returns (doc_id, media) where doc_id comes from the file stem, so
    the result is a drop-in for synth_media's output and flows into the
    same decode/feature/resize/frame-sample operators.  At 100 TB this
    is the pattern for object-store image/audio corpora: listing
    parallelizes over executors, each task reads whole objects as
    opaque bytes."""
    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.bin")
           .load(path))
    stem = F.regexp_extract(F.col("path"), r"([0-9]+)\.bin$", 1)
    return raw.select(stem.cast("long").alias("doc_id"),
                      F.col("content").alias("media"))
