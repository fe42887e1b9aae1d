"""Multimodal-column plumbing: media as opaque binary columns + typed
metadata, with decode / feature-extraction / frame-sampling operators.

Two codec tiers (r13):
- WAV/PCM is a REAL codec, implemented here from the RIFF spec with
  the stdlib only (struct walk of fmt/data chunks; numpy resample) —
  synth_wav emits genuine PCM16 WAVE files, decode_wav_meta parses
  them, resample_wav re-rates them, and tests cross-check the bytes
  against the stdlib `wave` module.
- Image/video codecs (JPEG decode, ffmpeg frames) need libraries this
  container doesn't ship, so THAT step is a deterministic fake: a
  16-byte header (magic, width, height, n_frames as big-endian u32)
  prepended to a payload.  Everything around it — binary schema,
  Arrow-batched mapInPandas decode, batch shapes, feature extraction,
  frame-index explosion — is real and is exactly the plumbing a
  PIL/ffmpeg-backed decoder would plug into.  real_codec=True
  dispatches RIFF/WAVE blobs through the real WAV path and refuses
  other formats loudly (ValueError naming the missing library).
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
    vectorized).  real_codec=True decodes REAL formats: RIFF/WAVE blobs
    go through the from-spec WAV parser (_wav_info; width carries the
    sample rate, height the channel count, n_frames the PCM frame
    count — the time-series reading of the image axes); any other real
    format refuses loudly with the library it would need."""
    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[binary_col]):
                b = bytes(blob)
                if real_codec:
                    info = _wav_info(b)
                    if info is None:
                        raise ValueError(
                            "real_codec: only WAV/PCM is decodable in "
                            "this container (blob is not RIFF/WAVE); "
                            "JPEG/video need PIL/av — wire them here")
                    rate, ch, _bits, nf, _off, _dlen = info
                    metas.append((int(doc_id), rate, ch, nf,
                                  len(b)))
                elif len(b) >= _HEADER_SIZE and b[:4] == _MAGIC:
                    _, w, h, nf = struct.unpack(_HEADER_FMT, b[:_HEADER_SIZE])
                    metas.append((int(doc_id), w, h, nf,
                                  len(b) - _HEADER_SIZE))
                else:
                    metas.append((int(doc_id), None, None, None, None))
            yield pd.DataFrame(metas, columns=[f.name for f in
                                               MEDIA_META_SCHEMA.fields])

    return media.mapInPandas(_decode, MEDIA_META_SCHEMA)


# ---------------------------------------------------------------------------
# WAV/PCM: a REAL codec, from the RIFF spec, stdlib-only (r13).
# Reference parity: the reference models media as opaque blobs with
# typed accessors; this implements the audio tier end-to-end.
# ---------------------------------------------------------------------------

WAV_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("bits_per_sample", T.IntegerType(), True),
    T.StructField("n_samples", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])


def wav_pack_pcm16(rate: int, channels: int, frames: bytes) -> bytes:
    """Minimal canonical PCM16 WAVE file: RIFF header + fmt chunk +
    data chunk (the exact layout `wave.open` writes; cross-checked in
    tests by reading these bytes back with the stdlib module)."""
    n = len(frames)
    block = channels * 2
    return b"".join([
        b"RIFF", struct.pack("<I", 36 + n), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, channels, rate,
                             rate * block, block, 16),
        b"data", struct.pack("<I", n), frames,
    ])


def _wav_info(b: bytes):
    """Walk a RIFF/WAVE file's chunks: (sample_rate, n_channels,
    bits_per_sample, n_frames, data_offset, data_len) or None when the
    blob is not WAVE / is malformed.  Handles arbitrary chunk order and
    extra chunks (LIST, fact, ...) — a real parser, not a fixed-offset
    read."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = b[pos + 8:pos + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            # Truncated blobs (declared length past EOF) must not
            # inflate n_frames or crash downstream frombuffer/reshape:
            # clamp to the bytes actually present.
            data = (pos + 8, min(clen, len(b) - (pos + 8)))
        pos += 8 + clen + (clen & 1)        # chunks are word-aligned
    if fmt is None or data is None:
        return None
    _audio_fmt, channels, rate, _bps, block, bits = fmt
    if block == 0:
        return None
    n_frames = data[1] // block
    return (rate, channels, bits, n_frames, data[0], n_frames * block)


def synth_wav(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PCM16 WAVE fixtures derived from doc_id arithmetic
    (rate/channels/length are pure doc_id functions, the samples a
    fixed ramp), so an exact SQL oracle can PREDICT what the real
    parser must decode — the Spark side still round-trips through
    genuine RIFF bytes.  Stands in for binaryFile ingest of an audio
    corpus."""
    rates = _WAV_RATES

    @F.pandas_udf("binary")
    def _pack(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            rate = rates[i % len(rates)]
            channels = i % 2 + 1
            n_samp = (i % 50 + 1) * 100
            frames = bytes(n_samp * channels * 2)   # silence PCM16
            out.append(wav_pack_pcm16(rate, channels, frames))
        return pd.Series(out)
    return docs.select(F.col(id_col).alias("doc_id"),
                       _pack(F.col(id_col)).alias("media"))


_WAV_RATES = (8000, 16000, 22050, 44100)


def decode_wav_meta(media: DataFrame,
                    binary_col: str = "media") -> DataFrame:
    """REAL audio decode: RIFF chunk walk per blob via Arrow-batched
    mapInPandas -> (sample_rate, n_channels, bits_per_sample,
    n_samples, duration_ms).  Non-WAV blobs yield NULL metadata (the
    dirty-corpus posture: one bad object must not kill a 100 TB scan).
    duration_ms = n_samples * 1000 // rate (integer floor, exact in
    SQL)."""
    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[binary_col]):
                info = _wav_info(bytes(blob))
                if info is None:
                    rows.append((int(doc_id),) + (None,) * 5)
                    continue
                rate, ch, bits, nf, _off, _dlen = info
                rows.append((int(doc_id), rate, ch, bits, nf,
                             nf * 1000 // rate if rate else None))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              WAV_META_SCHEMA.fields])
    return media.mapInPandas(_decode, WAV_META_SCHEMA)


def resample_wav(media: DataFrame, target_hz: int,
                 binary_col: str = "media") -> DataFrame:
    """REAL PCM16 resample (nearest-sample index mapping, vectorized
    numpy per Arrow batch): binary WAV in -> binary WAV at target_hz
    out.  Output frame count is the exact integer
    floor(n_in * target_hz / rate_in), so tests and SQL oracles can pin
    it.  Non-WAV blobs pass through as NULL."""
    import numpy as np
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField(binary_col, T.BinaryType(), True),
    ])

    def _res(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[binary_col]):
                b = bytes(blob)
                info = _wav_info(b)
                if info is None or info[2] != 16:
                    rows.append((int(doc_id), None))
                    continue
                rate, ch, _bits, nf, off, dlen = info
                buf = b[off:off + dlen]
                buf = buf[:(len(buf) // (ch * 2)) * (ch * 2)]
                pcm = np.frombuffer(buf, dtype="<i2")
                pcm = pcm[:nf * ch].reshape(nf, ch) if nf else \
                    pcm.reshape(0, max(ch, 1))
                n_out = nf * target_hz // rate
                idx = (np.arange(n_out, dtype="int64") * rate
                       // target_hz).clip(0, max(nf - 1, 0))
                out_pcm = pcm[idx] if nf else pcm[:0]
                rows.append((int(doc_id), wav_pack_pcm16(
                    target_hz, ch, out_pcm.astype("<i2").tobytes())))
            yield pd.DataFrame(rows, columns=["doc_id", binary_col])
    return media.mapInPandas(_res, out_schema)


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
    resizes REAL media: for RIFF/WAVE blobs the temporal axis is the
    resolution, so target_w is the target sample rate and the blob is
    genuinely resampled (resample_wav); non-WAV blobs yield NULL
    (dirty-corpus row-level posture — the decode_media_meta seam is
    the one that refuses loudly when a format needs PIL/av)."""
    if real_codec:
        return resample_wav(media, target_hz=target_w,
                            binary_col=binary_col)
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
