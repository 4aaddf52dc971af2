"""Multimodal columns: opaque binary media + typed metadata.

The container model (SURVEY §1.2) already has BLOB → ``BinaryType``; this
module adds the pipeline plumbing a media corpus needs at 100 TB:

- a conventional schema: ``(media BINARY, media_meta STRUCT<format,width,
  height,n_bytes,...>)`` — metadata is queryable/prunable without touching
  the blobs;
- ``extract_meta`` — cheap JVM-side header fields (no decode);
- ``decode_features`` — the decode/feature-extract stage as an
  Arrow-batched ``mapInPandas``: real Spark plumbing (schema, batch shape,
  partition parallelism), with the codec behind ``_decode_image``.

The actual image/audio codecs are NOT in this environment, so
``_decode_image`` raises ``NotImplementedError`` unless ``fake=True``
(deterministic stand-in features), keeping the distributed machinery fully
testable.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("header_hex", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("mean_byte", T.DoubleType(), True),
        # double, not float: features feed the DuckDB-oracle differential
        # gate, and float32 quantization would defeat the rounded compare
        T.StructField("feat", T.ArrayType(T.DoubleType()), True),
    ]
)


def pack_binary(df: DataFrame, src_col: str, out_col: str = "media") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 of a text column —
    the stand-in for real image/audio bytes) plus queryable metadata."""
    media = F.encode(F.col(src_col), "utf-8")
    meta = F.struct(
        F.lit("fake/text").alias("format"),
        F.octet_length(media).cast("int").alias("n_bytes"),
        F.lower(F.hex(F.substring(media, 1, 4))).alias("header_hex"),
    )
    return df.withColumn(out_col, media).withColumn(f"{out_col}_meta", meta)


def _decode_image(buf: bytes, fake: bool):
    """Decode one media blob → (mean_byte, feature vector).

    STUB: real codecs (PIL/libvips/ffmpeg) are not installed in this
    container. ``fake=True`` computes deterministic byte-level features so
    the distributed path is exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True or plug a codec into _decode_image"
        )
    n = len(buf)
    mean = sum(buf) / n if n else 0.0
    # 4 deterministic "features": byte means of quarters
    quarters = [buf[i * n // 4:(i + 1) * n // 4] for i in range(4)]
    feat = [float(sum(q)) / len(q) if q else 0.0 for q in quarters]
    return mean, feat


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("r_mean", T.DoubleType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("frame_idx", T.LongType(), True),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("f_mean", T.DoubleType(), True),
    ]
)


def resize_media(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    out_bytes: int = 64,
) -> DataFrame:
    """Resize stage: deterministic stride-resample of the byte stream to
    exactly ``out_bytes`` (STUB for decode+interpolate — codecs aren't in
    this container). The Spark-side contract is the real thing: Arrow
    batches in/out, bounded per-row output size, and the blob never
    leaves the executor."""
    import pandas as pd

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out, means = [], []
            for buf in pdf[media_col]:
                b = bytes(buf)
                n = len(b)
                if n == 0:
                    out.append(b"")
                    means.append(0.0)
                    continue
                r = bytes(b[(i * n) // out_bytes] for i in range(out_bytes))
                out.append(r)
                means.append(sum(r) / len(r))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "resized": out, "r_mean": means}
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        _resize, schema=RESIZED_SCHEMA
    )


def frame_sample(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    frame_bytes: int = 32,
    stride: int = 2,
) -> DataFrame:
    """Frame-sampling stage: the blob is treated as a raw buffer of
    fixed-size frames (the video stand-in); emit every ``stride``-th
    COMPLETE frame. Row-expanding ``mapInPandas`` — one input row yields
    ``ceil(n_frames/stride)`` output rows, the shape a real video
    frame-sampler has."""
    import pandas as pd

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, means = [], [], [], []
            for i, buf in zip(pdf[id_col], pdf[media_col]):
                b = bytes(buf)
                for k in range(0, len(b) // frame_bytes, stride):
                    fr = b[k * frame_bytes:(k + 1) * frame_bytes]
                    ids.append(i)
                    idxs.append(k)
                    frames.append(fr)
                    means.append(sum(fr) / len(fr))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": frames,
                    "f_mean": pd.Series(means, dtype="float64"),
                }
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        _frames, schema=FRAME_SCHEMA
    )


def decode_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    fake: bool = True,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract stage over ``mapInPandas`` (Arrow batches).

    Each batch is decoded row-wise in Python (the unavoidable codec hop),
    everything before/after stays columnar. ``repartition`` upstream if
    blobs are large — decode cost, not row count, should size partitions.
    """
    import pandas as pd

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, feats = [], []
            for buf in pdf[media_col]:
                m, f = _decode_image(bytes(buf), fake)
                means.append(m)
                feats.append(f)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[media_col].map(len).astype("int32"),
                    "mean_byte": means,
                    "feat": feats,
                }
            )

    src = df.select(F.col(id_col), F.col(media_col))
    if batch_hint:
        src = src.repartition(batch_hint)
    return src.mapInPandas(_decode, schema=FEATURE_SCHEMA)
