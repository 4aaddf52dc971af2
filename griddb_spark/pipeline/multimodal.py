"""Multimodal columns: opaque binary media + typed metadata.

The container model (SURVEY §1.2) already has BLOB → ``BinaryType``; this
module adds the pipeline plumbing a media corpus needs at 100 TB:

- a conventional schema: ``(media BINARY, media_meta STRUCT<format,width,
  height,n_bytes,...>)`` — metadata is queryable/prunable without touching
  the blobs;
- ``extract_meta`` / ``png_meta`` — cheap JVM-side header fields (no
  decode; IHDR width/height parse is pure substring+conv Column algebra);
- ``decode_features`` / ``resize_media`` / ``frame_sample`` — the
  decode/resize/frame stages as Arrow-batched ``mapInPandas``: real Spark
  plumbing (schema, batch shape, partition parallelism).

The codec: PNG (8-bit grayscale/RGB/RGBA, non-interlaced) is decoded FOR
REAL with the stdlib — zlib inflate + scanline unfilter (all five PNG
filters incl. Paeth) — and ``png_encode`` writes spec-compliant PNGs with
the standard minimum-sum-of-residuals adaptive filter choice, so the
decoder's Sub/Up/Average/Paeth reconstruction is genuinely exercised.
Other formats (JPEG/audio/video) still raise ``NotImplementedError``
unless ``fake=True`` (deterministic byte-level stand-in features): those
codecs aren't in this container, and a production deployment would plug
PIL/libvips/ffmpeg into ``_decode_image`` — the distributed machinery is
identical. The pure-Python per-scanline filter loop is fine for the
fixture-scale images here; a real deployment's codec hop is C either way.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: per-(label, application) task-kernel-seconds accumulators — see
#: _task_timer
_TASK_TIMERS: dict = {}


def _task_timer(df: DataFrame, label: str):
    """A per-application Spark accumulator of task-kernel seconds for
    ``label`` (``@``-prefixed), registered as a perfstages metric so
    bench stage maps attribute time spent INSIDE the codec kernels —
    which run in executor python workers where driver-side ``stage()``
    can't see (VERDICT r12 item 5: the multimodal transients had no
    in-profile attribution). Task-seconds overlap the driver's force
    wall, hence the informational ``@`` convention. One accumulator per
    (label, SparkContext); creation + the per-batch ``add`` are
    microseconds next to a zlib pass."""
    sc = df.sparkSession.sparkContext
    key = (label, sc.applicationId)
    acc = _TASK_TIMERS.get(key)
    if acc is None:
        for k in [k for k in _TASK_TIMERS if k[1] != sc.applicationId]:
            del _TASK_TIMERS[k]  # dead-context entries
        acc = sc.accumulator(0.0)
        _TASK_TIMERS[key] = acc
        from griddb_spark import perfstages

        perfstages.register_metric(label, lambda a=acc: a.value)
    return acc

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


# -- PNG codec (stdlib only: zlib inflate/deflate + filter math) -----------


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9, filter type 4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_line(ft: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply PNG filter ``ft`` to a raw scanline (encode direction)."""
    n = len(line)
    out = bytearray(n)
    for i in range(n):
        x = line[i]
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            v = x
        elif ft == 1:
            v = x - a
        elif ft == 2:
            v = x - b
        elif ft == 3:
            v = x - ((a + b) >> 1)
        else:
            v = x - _paeth(a, b, c)
        out[i] = v & 0xFF
    return bytes(out)


def _unfilter_line(ft: int, line: bytearray, prev: bytes, bpp: int) -> bytearray:
    """Reconstruct a filtered scanline in place (decode direction)."""
    n = len(line)
    for i in range(n):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            add = 0
        elif ft == 1:
            add = a
        elif ft == 2:
            add = b
        elif ft == 3:
            add = (a + b) >> 1
        elif ft == 4:
            add = _paeth(a, b, c)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        line[i] = (line[i] + add) & 0xFF
    return line


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels → PNG color type
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type → channels


def png_encode(pixels: bytes, width: int, height: int, channels: int = 1) -> bytes:
    """Encode raw 8-bit pixels as a spec-compliant non-interlaced PNG.

    Per-scanline adaptive filtering (the libpng heuristic: pick the
    filter minimizing the sum of absolute residuals), vectorized: the
    None/Sub/Up candidates are three whole-image NumPy expressions and
    the per-line argmin picks among them. Sub/Up lines decode through
    the vectorized inverse; Average/Paeth stay decode-supported for
    foreign PNGs (a real encoder may emit them) but aren't worth their
    per-byte Python cost on the encode side."""
    import numpy as np

    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match width*height*channels")
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0
    )
    stride = width * channels
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, stride)
    # filter candidates, computed image-wide
    f_none = img
    left = np.zeros_like(img)
    left[:, channels:] = img[:, :-channels]
    f_sub = img - left  # uint8 wraparound == mod-256 residual
    up = np.zeros_like(img)
    up[1:, :] = img[:-1, :]
    f_up = img - up
    cands = (f_none, f_sub, f_up)

    def score(m):
        v = m.astype(np.int64)
        return np.minimum(v, 256 - v).sum(axis=1)

    best = np.argmin(np.stack([score(m) for m in cands]), axis=0)
    raw = np.empty((height, stride + 1), dtype=np.uint8)
    raw[:, 0] = best
    for ft, m in enumerate(cands):
        rows = best == ft
        raw[rows, 1:] = m[rows]
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def png_decode(buf: bytes) -> "tuple[int, int, int, bytes]":
    """Decode a PNG → (width, height, channels, raw 8-bit pixel bytes).

    Supports bit depth 8, color types 0/2/4/6, non-interlaced — the
    overwhelmingly common PNG profile. zlib-inflates the IDAT stream and
    reconstructs every scanline through the five PNG filters."""
    if buf[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, plte = 8, bytearray(), None
    w = h = channels = ctype = None
    while pos + 8 <= len(buf):
        ln = int.from_bytes(buf[pos:pos + 4], "big")
        tag = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth}")
            if interlace:
                raise NotImplementedError("interlaced PNG")
            # indexed-color (type 3) carries one palette index per pixel
            channels = 1 if ctype == 3 else _CHANNELS[ctype]
        elif tag == b"PLTE":
            plte = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    import numpy as np

    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data does not match dimensions")
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    fts, lines = mat[:, 0], mat[:, 1:]
    recon = np.empty((h, stride), dtype=np.uint8)
    prev_np = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft, line = int(fts[y]), lines[y]
        if ft == 0:
            recon[y] = line
        elif ft == 2:  # Up: whole-line vector add (uint8 wrap == mod 256)
            recon[y] = line + prev_np
        elif ft == 1:  # Sub: per-phase cumulative sum
            ph = line.reshape(-1, channels).astype(np.int64)
            recon[y] = (np.cumsum(ph, axis=0) % 256).astype(np.uint8).reshape(-1)
        else:  # Average/Paeth: inherently sequential reconstruction
            recon[y] = np.frombuffer(
                bytes(
                    _unfilter_line(
                        ft, bytearray(line.tobytes()), prev_np.tobytes(),
                        channels,
                    )
                ),
                dtype=np.uint8,
            )
        prev_np = recon[y]
    out = bytearray(recon.tobytes())
    if ctype == 3:  # expand palette indices → RGB
        if plte is None:
            raise ValueError("indexed PNG missing PLTE")
        rgb = bytearray()
        for i in out:
            rgb += plte[i * 3:i * 3 + 3]
        return w, h, 3, bytes(rgb)
    return w, h, channels, bytes(out)


def _gray(pixels: bytes, channels: int) -> bytes:
    """Collapse multi-channel pixels to 8-bit grayscale (integer mean of
    the color channels; alpha ignored)."""
    import numpy as np

    if channels == 1:
        return pixels
    nc = 3 if channels >= 3 else 1  # gray+alpha: first channel is gray
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, channels)
    return (px[:, :nc].astype(np.int64).sum(axis=1) // nc).astype(
        np.uint8
    ).tobytes()


def _decode_image(buf: bytes, fake: bool):
    """Decode one media blob → (mean_pixel, feature vector).

    PNG bytes decode FOR REAL (``png_decode``); features are the mean
    pixel plus per-quadrant means of the grayscale image. Other formats:
    real codecs (PIL/libvips/ffmpeg) are not installed in this container,
    so ``fake=True`` computes deterministic byte-level features to keep
    the distributed path exercised end-to-end, and ``fake=False`` raises.
    """
    if buf[:8] == PNG_MAGIC:
        import numpy as np

        w, h, channels, px = png_decode(buf)
        g = np.frombuffer(_gray(px, channels), dtype=np.uint8).astype(
            np.float64
        )
        n = len(g)
        mean = float(g.mean()) if n else 0.0
        feat = [
            float(g[i * n // 4:(i + 1) * n // 4].mean())
            if (i + 1) * n // 4 > i * n // 4
            else 0.0
            for i in range(4)
        ]
        return mean, feat
    if not fake:
        raise NotImplementedError(
            "only the stdlib PNG codec is available in this environment; "
            "pass fake=True or plug a codec into _decode_image"
        )
    n = len(buf)
    mean = sum(buf) / n if n else 0.0
    # 4 deterministic "features": byte means of quarters
    quarters = [buf[i * n // 4:(i + 1) * n // 4] for i in range(4)]
    feat = [float(sum(q)) / len(q) if q else 0.0 for q in quarters]
    return mean, feat


def png_pack(
    df: DataFrame,
    src_col: str,
    id_col: str = "doc_id",
    width: int = 32,
    out_col: str = "media",
) -> DataFrame:
    """Materialize REAL PNG bytes per row: the utf-8 bytes of ``src_col``
    laid out as an 8-bit grayscale image of the given width (height =
    n_bytes // width complete scanlines; rows shorter than one scanline
    are dropped). The deterministic pixel↔byte mapping is what lets a SQL
    oracle verify the decode path without itself decoding PNG: any
    pixel statistic equals the same statistic over the source bytes."""
    import pandas as pd

    t_enc = _task_timer(df, "@png_encode")

    def _pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        for pdf in batches:
            t0 = time.perf_counter()
            media = []
            for t in pdf[src_col]:
                b = ("" if t is None else t).encode("utf-8")
                h = len(b) // width
                media.append(
                    png_encode(b[: width * h], width, h) if h else None
                )
            out = pd.DataFrame({id_col: pdf[id_col], out_col: media})
            t_enc.add(time.perf_counter() - t0)
            yield out

    packed = (
        df.select(id_col, src_col)
        .mapInPandas(_pack, schema=f"{id_col} long, {out_col} binary")
        .filter(F.col(out_col).isNotNull())
    )
    return packed.withColumn(f"{out_col}_meta", png_meta(F.col(out_col)))


def png_meta(media: Column) -> Column:
    """Typed PNG metadata as a pure JVM Column expression — width/height
    parsed out of the IHDR chunk with substring + hex + conv, format from
    the magic. NO decode, no Python: at 100 TB metadata predicates prune
    on this struct without ever inflating a blob."""
    be_int = lambda pos: F.conv(  # noqa: E731 — 4-byte big-endian int
        F.hex(F.substring(media, pos, 4)), 16, 10
    ).cast("int")
    is_png = F.substring(media, 1, 8) == F.lit(PNG_MAGIC)
    return F.struct(
        F.when(is_png, F.lit("image/png")).otherwise(F.lit("unknown"))
        .alias("format"),
        F.when(is_png, be_int(17)).alias("width"),
        F.when(is_png, be_int(21)).alias("height"),
        F.octet_length(media).cast("int").alias("n_bytes"),
        F.lower(F.hex(F.substring(media, 1, 4))).alias("header_hex"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("r_w", T.IntegerType(), True),
        T.StructField("r_h", T.IntegerType(), True),
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
    out_w: int = 8,
    out_h: int = 8,
) -> DataFrame:
    """Resize stage over Arrow-batched ``mapInPandas``.

    PNG blobs take the REAL path: decode (zlib inflate + unfilter) →
    grayscale → nearest-neighbor resample to ``out_w × out_h`` →
    re-encode PNG. Non-PNG blobs fall back to a deterministic byte-stride
    resample to ``out_bytes`` (the stand-in for formats whose codecs
    aren't in this container). Either way the Spark contract is the real
    thing: Arrow batches in/out, bounded per-row output size, and the
    blob never leaves the executor."""
    import pandas as pd

    t_rz = _task_timer(df, "@resize_kernel")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        for pdf in batches:
            t0 = time.perf_counter()
            out, ws, hs, means = [], [], [], []
            for buf in pdf[media_col]:
                b = bytes(buf)
                if b[:8] == PNG_MAGIC:
                    w, h, channels, px = png_decode(b)
                    g = _gray(px, channels)
                    rp = bytes(
                        g[((r * h) // out_h) * w + (c * w) // out_w]
                        for r in range(out_h)
                        for c in range(out_w)
                    )
                    out.append(png_encode(rp, out_w, out_h))
                    ws.append(out_w)
                    hs.append(out_h)
                    means.append(sum(rp) / len(rp))
                    continue
                n = len(b)
                if n == 0:
                    out.append(b"")
                    ws.append(0)
                    hs.append(1)
                    means.append(0.0)
                    continue
                r = bytes(b[(i * n) // out_bytes] for i in range(out_bytes))
                out.append(r)
                ws.append(out_bytes)
                hs.append(1)
                means.append(sum(r) / len(r))
            res = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "resized": out,
                    "r_w": pd.Series(ws, dtype="int32"),
                    "r_h": pd.Series(hs, dtype="int32"),
                    "r_mean": means,
                }
            )
            t_rz.add(time.perf_counter() - t0)
            yield res

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
    """Frame-sampling stage: emit every ``stride``-th frame as its own
    row (row-expanding ``mapInPandas`` — one input row yields
    ``ceil(n_frames/stride)`` output rows, the shape a real video
    frame-sampler has).

    PNG blobs take the REAL path: decode, then each grayscale scanline is
    one frame (the decoded-pixel analog of fixed-rate frames — exercises
    inflate + unfilter on every sampled row). Non-PNG blobs are treated
    as a raw buffer of ``frame_bytes``-sized frames."""
    import pandas as pd

    t_fr = _task_timer(df, "@frame_kernel")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        for pdf in batches:
            t0 = time.perf_counter()
            ids, idxs, frames, means = [], [], [], []
            for i, buf in zip(pdf[id_col], pdf[media_col]):
                b = bytes(buf)
                if b[:8] == PNG_MAGIC:
                    w, h, channels, px = png_decode(b)
                    g = _gray(px, channels)
                    for k in range(0, h, stride):
                        fr = g[k * w:(k + 1) * w]
                        ids.append(i)
                        idxs.append(k)
                        frames.append(fr)
                        means.append(sum(fr) / len(fr))
                    continue
                for k in range(0, len(b) // frame_bytes, stride):
                    fr = b[k * frame_bytes:(k + 1) * frame_bytes]
                    ids.append(i)
                    idxs.append(k)
                    frames.append(fr)
                    means.append(sum(fr) / len(fr))
            res = pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": frames,
                    "f_mean": pd.Series(means, dtype="float64"),
                }
            )
            t_fr.add(time.perf_counter() - t0)
            yield res

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        _frames, schema=FRAME_SCHEMA
    )


def dhash_media(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    grid: int = 8,
) -> DataFrame:
    """Perceptual difference-hash (dHash) over decoded images: decode →
    grayscale → nearest-neighbor ``grid×grid`` downsample → one bit per
    horizontally-adjacent pixel pair (left < right), packed LSB-first
    into a ``grid·(grid-1)``-bit BIGINT (56 bits at the default grid=8 —
    deliberately under 63 so the hash stays a signed long everywhere).
    Identical-looking images collide exactly; near-identical images land
    within small Hamming distance, so the banding/multi-probe machinery
    used for embeddings applies unchanged. Non-PNG blobs fall back to the
    same deterministic byte-stride sample as ``resize_media``. Arrow
    batches in/out; the blob never leaves the executor."""
    import pandas as pd

    nbits = grid * (grid - 1)

    def _dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs = []
            for buf in pdf[media_col]:
                b = bytes(buf)
                if b[:8] == PNG_MAGIC:
                    w, h, channels, px = png_decode(b)
                    g = _gray(px, channels)
                    p = [
                        g[((r * h) // grid) * w + (c * w) // grid]
                        for r in range(grid)
                        for c in range(grid)
                    ]
                elif len(b) == 0:
                    p = [0] * (grid * grid)
                else:
                    n = len(b)
                    p = [
                        b[(i * n) // (grid * grid)]
                        for i in range(grid * grid)
                    ]
                bits = 0
                for i in range(nbits):
                    r, c = i // (grid - 1), i % (grid - 1)
                    if p[r * grid + c] < p[r * grid + c + 1]:
                        bits |= 1 << i
                hs.append(bits)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "dhash": pd.Series(hs, dtype="int64")}
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        _dhash, schema=f"{id_col} {id_t}, dhash long"
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

    t_dec = _task_timer(df, "@png_decode")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        for pdf in batches:
            t0 = time.perf_counter()
            means, feats = [], []
            for buf in pdf[media_col]:
                m, f = _decode_image(bytes(buf), fake)
                means.append(m)
                feats.append(f)
            res = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[media_col].map(len).astype("int32"),
                    "mean_byte": means,
                    "feat": feats,
                }
            )
            t_dec.add(time.perf_counter() - t0)
            yield res

    src = df.select(F.col(id_col), F.col(media_col))
    if batch_hint:
        src = src.repartition(batch_hint)
    return src.mapInPandas(_decode, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Audio: REAL RIFF/WAV PCM codec (stdlib `wave` — no external libs) + the
# Arrow-batched feature plumbing. Same philosophy as the PNG path: the
# container format round-trips genuinely; only perceptual codecs (MP3 etc.)
# stay behind NotImplementedError.
# ---------------------------------------------------------------------------


def wav_encode(samples: "list[int]", rate: int = 8000) -> bytes:
    """16-bit mono PCM WAV bytes from integer samples (stdlib wave)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def wav_decode(buf: bytes) -> "tuple[int, int, list[int]]":
    """(sample_rate, n_channels, samples) from WAV bytes. 16-bit PCM
    only — compressed audio raises NotImplementedError (honest codec
    boundary, like non-PNG images)."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(buf), "rb") as w:
            if w.getsampwidth() != 2:
                raise NotImplementedError(
                    f"only 16-bit PCM supported, got {w.getsampwidth() * 8}-bit"
                )
            n = w.getnframes()
            raw = w.readframes(n)
            samples = list(
                struct.unpack(f"<{n * w.getnchannels()}h", raw)
            )
            return w.getframerate(), w.getnchannels(), samples
    except wave.Error as e:  # non-PCM compression codes land here
        raise NotImplementedError(f"unsupported WAV encoding: {e}") from None


def wav_pack(
    df: DataFrame,
    samples_col: str,
    rate_col: str,
    id_col: str = "doc_id",
    out_col: str = "media",
) -> DataFrame:
    """Encode an ``array<int>`` sample column into real WAV bytes —
    Arrow-batched, binary out (the ingest step that turns raw signal
    columns into an opaque media column + typed metadata)."""
    import pandas as pd

    def _pack(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: [
                        wav_encode([int(x) for x in s], int(r))
                        for s, r in zip(pdf[samples_col], pdf[rate_col])
                    ],
                }
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, samples_col, rate_col).mapInPandas(
        _pack, schema=f"{id_col} {id_t}, {out_col} binary"
    )


def audio_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode WAV media and emit the deterministic signal features a
    corpus pipeline filters on: sample count/rate, duration, EXACT
    integer sum-of-squares (RMS derives JVM-side — one IEEE sqrt, no
    order-dependent float accumulation), zero-crossing count, and peak
    amplitude. Arrow-batched mapInPandas; NumPy per batch.
    """
    import numpy as np
    import pandas as pd

    def _feat(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for i, buf in zip(pdf[id_col], pdf[media_col]):
                rate, _ch, samples = wav_decode(bytes(buf))
                a = np.asarray(samples, dtype=np.int64)
                zc = int(((a[:-1] < 0) != (a[1:] < 0)).sum()) if len(a) > 1 else 0
                rows.append(
                    (i, len(a), rate, int((a * a).sum()), zc,
                     int(np.abs(a).max()) if len(a) else 0)
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_samples", "sample_rate", "sum_sq",
                         "zero_crossings", "peak"],
            )

    id_t = df.schema[id_col].dataType.simpleString()
    out = df.select(id_col, media_col).mapInPandas(
        _feat,
        schema=(f"{id_col} {id_t}, n_samples int, sample_rate int, "
                "sum_sq bigint, zero_crossings int, peak int"),
    )
    return out.select(
        id_col, "n_samples", "sample_rate",
        F.round(F.col("n_samples") * 1000.0 / F.col("sample_rate"), 3)
        .alias("duration_ms"),
        F.round(F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6).alias("rms"),
        "zero_crossings", "peak",
    )


def resample_audio(
    df: DataFrame,
    target_rate: int,
    media_col: str = "media",
    id_col: str = "doc_id",
    out_col: str = "media_rs",
) -> DataFrame:
    """Resample WAV media to ``target_rate`` by linear interpolation and
    re-encode — the audio analog of ``resize_media``. Output position i
    samples the source at ``i · src/dst``; the interpolated value rounds
    half-away-from-zero to int16 (the engine-portable rounding rule), so
    the result is bit-deterministic. Arrow-batched; NumPy per batch.
    """
    import numpy as np
    import pandas as pd

    def _rs(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, outs, rates = [], [], []
            for i, buf in zip(pdf[id_col], pdf[media_col]):
                rate, _ch, samples = wav_decode(bytes(buf))
                a = np.asarray(samples, dtype=np.float64)
                n_out = max(1, int(len(a) * target_rate / rate))
                pos = np.arange(n_out, dtype=np.float64) * rate / target_rate
                lo = np.minimum(pos.astype(np.int64), len(a) - 1)
                hi = np.minimum(lo + 1, len(a) - 1)
                frac = pos - lo
                v = a[lo] * (1.0 - frac) + a[hi] * frac
                vi = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
                vi = np.clip(vi, -32768, 32767)
                ids.append(i)
                outs.append(wav_encode([int(x) for x in vi], target_rate))
                rates.append(rate)
            yield pd.DataFrame(
                {id_col: ids, out_col: outs, "src_rate": rates}
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, media_col).mapInPandas(
        _rs, schema=f"{id_col} {id_t}, {out_col} binary, src_rate int"
    )
