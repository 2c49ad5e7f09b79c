"""Multimodal (image / video / audio binary column) operators.

Media rows are opaque ``binary`` columns with typed metadata (images:
w, h, fmt per the BASELINE.json input_hint schema; audio: sr, channels,
fmt).  Decode / feature-extract / resize / frame-sample / chunk run as
Arrow-batched ``mapInPandas`` transforms.  Real codecs in this
container: raw RGB + minimal PNG (kernels/image.py), the deterministic
'rawvideo' concatenated-frame container, and pcm16 audio (numpy int16);
everything else raises NotImplementedError (clearly-marked stub, per
round brief) — the Spark-side plumbing (schema, batching, row
explosion, UDF signatures) is real and tested either way.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from pyshp_spark.kernels.image import average_hash, decode_image


def with_image_stats(df: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """Decode each image and append per-channel mean/std + recomputed
    phash.  Decode errors surface as null stats (corrupt-tolerant, like
    the reference's corrupt-file handling, reference
    src/shapefile.py tests test.py:1315-1353)."""
    keep = keep or [c for c in df.columns if c != "bytes"]
    fields = [f for f in df.schema.fields if f.name in keep]
    schema = StructType(
        fields
        + [
            StructField("mean_r", DoubleType()),
            StructField("mean_g", DoubleType()),
            StructField("mean_b", DoubleType()),
            StructField("std_gray", DoubleType()),
            StructField("phash_check", LongType()),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            mr = np.full(n, np.nan)
            mg = np.full(n, np.nan)
            mb = np.full(n, np.nan)
            sg = np.full(n, np.nan)
            ph = np.zeros(n, dtype=np.int64)
            ok = np.zeros(n, dtype=bool)
            for i, (buf, w, h, fmt) in enumerate(
                zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ):
                try:
                    rgb = decode_image(bytes(buf), int(w), int(h), str(fmt))
                except (NotImplementedError, ValueError):
                    continue
                a = rgb.astype(np.float64)
                mr[i], mg[i], mb[i] = a[..., 0].mean(), a[..., 1].mean(), a[..., 2].mean()
                sg[i] = (a @ np.array([0.299, 0.587, 0.114])).std()
                ph[i] = average_hash(rgb)
                ok[i] = True
            out = pdf[[f.name for f in fields]].copy()
            out["mean_r"] = mr
            out["mean_g"] = mg
            out["mean_b"] = mb
            out["std_gray"] = sg
            out["phash_check"] = pd.array(
                [int(p) if o else None for p, o in zip(ph, ok)], dtype="Int64"
            )
            yield out

    return df.mapInPandas(stats, schema=schema)


def resize_nearest(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize every decodable image to (out_w, out_h);
    output keeps the input_hint schema with fmt='raw' bytes."""
    fields = [
        f if f.name != "bytes" else StructField("bytes", BinaryType())
        for f in df.schema.fields
    ]
    schema = StructType(fields)
    names = [f.name for f in fields]

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = None
        for pdf in batches:
            new_bytes = []
            new_w = []
            new_h = []
            new_fmt = []
            for buf, w, h, fmt in zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]):
                try:
                    rgb = decode_image(bytes(buf), int(w), int(h), str(fmt))
                except (NotImplementedError, ValueError):
                    new_bytes.append(None)
                    new_w.append(int(w))
                    new_h.append(int(h))
                    new_fmt.append(str(fmt))
                    continue
                yi = (np.arange(out_h) * rgb.shape[0] // out_h).astype(int)
                xi = (np.arange(out_w) * rgb.shape[1] // out_w).astype(int)
                small = rgb[yi][:, xi]
                new_bytes.append(small.tobytes())
                new_w.append(out_w)
                new_h.append(out_h)
                new_fmt.append("raw")
            out = pdf.copy()
            out["bytes"] = new_bytes
            out["w"] = np.array(new_w, dtype=np.int32)
            out["h"] = np.array(new_h, dtype=np.int32)
            out["fmt"] = new_fmt
            yield out[names]

    return df.mapInPandas(resize, schema=schema)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (every
    ``every_n``-th), input_hint image schema + ``frame_idx:long``; the
    emitted bytes are the single frame as fmt='raw' RGB.

    The Spark-side plumbing (schema, mapInPandas batching, row
    explosion) is real and tested against fmt='rawvideo' — a
    deterministic container of n concatenated w*h*3 RGB frames.  Real
    codecs (mp4/webm/...) are STUBBED: no video libraries exist in this
    container, so those rows raise NotImplementedError with the format
    named — swap the decode branch for pyav/ffmpeg where available."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    fields = [
        f if f.name != "bytes" else StructField("bytes", BinaryType())
        for f in df.schema.fields
    ] + [StructField("frame_idx", LongType())]
    schema = StructType(fields)
    names = [f.name for f in df.schema.fields]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                d = dict(zip(names, row))
                fmt = str(d["fmt"])
                if fmt != "rawvideo":
                    raise NotImplementedError(
                        f"stub: no codec for video format {fmt!r} in this "
                        "environment (only the deterministic 'rawvideo' "
                        "container decodes); plug a real decoder here"
                    )
                w, h = int(d["w"]), int(d["h"])
                frame_bytes = w * h * 3
                if frame_bytes <= 0 or d["bytes"] is None:
                    continue  # corrupt header: zero frames, not a crash
                buf = bytes(d["bytes"])
                n_frames = len(buf) // frame_bytes
                for fi in range(0, n_frames, every_n):
                    out = dict(d)
                    out["bytes"] = buf[fi * frame_bytes : (fi + 1) * frame_bytes]
                    out["fmt"] = "raw"
                    out["frame_idx"] = fi
                    rows.append(out)
            yield pd.DataFrame(rows, columns=names + ["frame_idx"])

    return df.mapInPandas(sample, schema=schema)


# ------------------------------------------------------------- audio ----


def with_audio_stats(df: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """Decode each audio row (opaque ``bytes`` + ``sr:int`` +
    ``channels:int`` + ``fmt:string`` metadata) and append duration_s /
    rms / peak.  fmt='pcm16' (interleaved little-endian int16) decodes
    for real via numpy; other formats surface null stats (the codec
    stub — no audio libraries in this container)."""
    keep = keep or [c for c in df.columns if c != "bytes"]
    fields = [f for f in df.schema.fields if f.name in keep]
    schema = StructType(
        fields
        + [
            StructField("duration_s", DoubleType()),
            StructField("rms", DoubleType()),
            StructField("peak", DoubleType()),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            dur = np.full(n, np.nan)
            rms = np.full(n, np.nan)
            peak = np.full(n, np.nan)
            for i, (buf, sr, ch, fmt) in enumerate(
                zip(pdf["bytes"], pdf["sr"], pdf["channels"], pdf["fmt"])
            ):
                # corrupt-tolerant like with_image_stats: bad metadata
                # (sr<=0, null channels, odd byte length) -> null stats
                try:
                    if str(fmt) != "pcm16" or buf is None or int(sr) <= 0:
                        continue
                    raw = bytes(buf)
                    raw = raw[: len(raw) - (len(raw) % 2)]
                    pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                    pcm /= 32768.0
                    frames = len(pcm) // max(int(ch), 1)
                    dur[i] = frames / float(sr)
                    if len(pcm):
                        rms[i] = float(np.sqrt(np.mean(pcm * pcm)))
                        peak[i] = float(np.abs(pcm).max())
                except (TypeError, ValueError):
                    continue
            out = pdf[[f.name for f in fields]].copy()
            out["duration_s"] = dur
            out["rms"] = rms
            out["peak"] = peak
            yield out

    return df.mapInPandas(stats, schema=schema)


def audio_chunk(df: DataFrame, chunk_s: float) -> DataFrame:
    """Explode long audio into fixed-duration chunks (the ASR-pipeline
    unit of work): one output row per chunk with ``chunk_idx:long`` and
    re-sliced pcm16 bytes (final partial chunk kept).  fmt='pcm16'
    decodes for real; other formats raise (codec stub)."""
    if chunk_s <= 0:
        raise ValueError(f"chunk_s must be > 0, got {chunk_s}")
    fields = [
        f if f.name != "bytes" else StructField("bytes", BinaryType())
        for f in df.schema.fields
    ] + [StructField("chunk_idx", LongType())]
    schema = StructType(fields)
    names = [f.name for f in df.schema.fields]

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                d = dict(zip(names, row))
                if str(d["fmt"]) != "pcm16":
                    raise NotImplementedError(
                        f"stub: no codec for audio format {d['fmt']!r}; "
                        "only pcm16 decodes in this environment"
                    )
                # corrupt-tolerant like with_audio_stats / frame_sample:
                # null bytes or junk sr/channels -> zero chunks, not a
                # job-killing TypeError; empty buffers emit zero chunks
                try:
                    if d["bytes"] is None:
                        continue
                    sr, ch = int(d["sr"]), max(int(d["channels"]), 1)
                    if sr <= 0:
                        continue
                    buf = bytes(d["bytes"])
                except (TypeError, ValueError):
                    continue
                # floor of one frame: chunk_s*sr < 1 must not produce a
                # zero range step
                stride = max(int(chunk_s * sr), 1) * ch * 2  # bytes/chunk
                for ci, s in enumerate(range(0, len(buf), stride)):
                    out = dict(d)
                    out["bytes"] = buf[s : s + stride]
                    out["chunk_idx"] = ci
                    rows.append(out)
            yield pd.DataFrame(rows, columns=names + ["chunk_idx"])

    return df.mapInPandas(chunk, schema=schema)


def phash_dedup_pairs(df: DataFrame, max_hamming: int = 6,
                      key: str = "image_id", phash: str = "phash") -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance,
    pigeonhole-banded into ``max_hamming + 1`` contiguous chunks (a pair
    with <= max_hamming differing bits must agree on at least one chunk,
    so recall is guaranteed for ANY max_hamming in [0, 63]), verified by
    an exact popcount."""
    from pyshp_spark.operators.dedup import hamming_band_exprs  # noqa: PLC0415

    chunk_exprs = hamming_band_exprs(F.col(phash), max_hamming)
    chunks = df.select(
        F.col(key).alias("id"),
        F.col(phash).alias("ph"),
        F.posexplode(F.array(*chunk_exprs)).alias("chunk_idx", "chunk_val"),
    )
    left = chunks.select(F.col("id").alias("id_a"), F.col("ph").alias("ph_a"),
                         "chunk_idx", "chunk_val")
    right = chunks.select(F.col("id").alias("id_b"), F.col("ph").alias("ph_b"),
                          "chunk_idx", "chunk_val")
    return (
        left.join(right, on=["chunk_idx", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
