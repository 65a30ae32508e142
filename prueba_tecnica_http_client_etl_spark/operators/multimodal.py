"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed through Arrow-batched `mapInPandas` (driver north star,
SURVEY.md §2.8).

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (md5-derived metadata) or an explicit
NotImplementedError stub — but the Spark-side plumbing is real and is the
part that matters at 100 TB:

- payloads travel as a `binary` column next to their keys (never driver
  memory);
- Python work happens in `mapInPandas` over Arrow record batches, so the
  JVM<->Python boundary is columnar, zero-copy-ish, and batch-sized
  (`spark.sql.execution.arrow.maxRecordsPerBatch` bounds peak memory per
  task regardless of payload size);
- the output schema is declared up front, so downstream relational ops
  (joins on doc_id, filters on width/height) plan normally.

The fake decode is md5-based and therefore reproducible by the DuckDB
oracle — giving the pandas-UDF path a real correctness gate, which a
stubbed NotImplementedError could never have.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table
from ..session import default_parallelism

META_SCHEMA = "doc_id long, n_bytes long, checksum string, width int, height int, fmt string"
_FORMATS = ["png", "jpeg", "webp"]


def _decode_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-payload decode: real header parse for the containers a
    pure-Python decoder can handle (PPM/PGM/BMP — `decode_image`), md5-
    derived fake metadata for everything else (no image codecs in this
    container). Both paths are pure functions of the bytes ->
    deterministic under retry/partitioning. The corpus's text payloads
    never carry an image magic number, so the oracle-checked query always
    takes the fake path; the real path is exercised by synthetic
    PPM/BMP payloads in tests."""
    for pdf in batches:
        rows: dict[str, list] = {k: [] for k in ("doc_id", "n_bytes", "checksum", "width", "height", "fmt")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            p = bytes(payload)
            d = hashlib.md5(p).hexdigest()
            try:
                meta = decode_image(p)
                w, h, fmt = meta["width"], meta["height"], meta["fmt"]
            except ValueError:
                w = int(d[0:8], 16) % 1920 + 1
                h = int(d[8:16], 16) % 1080 + 1
                fmt = _FORMATS[int(d[16], 16) % 3]
            rows["doc_id"].append(doc_id)
            rows["n_bytes"].append(len(p))
            rows["checksum"].append(d)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["fmt"].append(fmt)
        yield pd.DataFrame(rows)


def decode_image(payload: bytes) -> dict:
    """Pure-Python image decode for uncompressed containers — the formats
    whose headers need no codec library: binary PPM/PGM (P6/P5) and BMP
    (BITMAPINFOHEADER). Returns {"width", "height", "channels", "fmt"};
    raises ValueError for any other container (the batch decoder then
    falls back to the md5 fake). Compressed formats (png/jpeg/webp) still
    need real codecs — swap this body when they exist; the Arrow
    plumbing, schema, and batch shape above stay identical."""
    if payload[:2] in (b"P6", b"P5"):
        # PNM header: magic, then three ASCII ints (width, height, maxval)
        # separated by whitespace, with '#' comments running to newline.
        vals: list[int] = []
        i, n = 2, len(payload)
        while len(vals) < 3 and i < n:
            c = payload[i : i + 1]
            if c.isspace():
                i += 1
            elif c == b"#":
                while i < n and payload[i : i + 1] != b"\n":
                    i += 1
            elif c.isdigit():
                j = i
                while j < n and payload[j : j + 1].isdigit():
                    j += 1
                vals.append(int(payload[i:j]))
                i = j
            else:
                raise ValueError("malformed PNM header")
        if len(vals) < 3:
            raise ValueError("truncated PNM header")
        width, height, maxval = vals
        if width <= 0 or height <= 0 or not (0 < maxval < 65536):
            raise ValueError("implausible PNM dimensions")
        channels = 3 if payload[:2] == b"P6" else 1
        bytes_per = channels * (2 if maxval > 255 else 1)
        if n - (i + 1) < width * height * bytes_per:
            raise ValueError("truncated PNM pixel data")
        return {
            "width": width,
            "height": height,
            "channels": channels,
            "fmt": "ppm" if channels == 3 else "pgm",
        }
    if payload[:2] == b"BM" and len(payload) >= 54:
        import struct

        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:  # BITMAPCOREHEADER etc. — out of scope
            raise ValueError("unsupported BMP header")
        width, height = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
        if compression != 0 or bpp not in (8, 24, 32) or width <= 0 or height == 0:
            raise ValueError("unsupported BMP variant")
        return {
            "width": width,
            "height": abs(height),  # negative height = top-down row order
            "channels": bpp // 8,
            "fmt": "bmp",
        }
    raise ValueError("unsupported image container")


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded to a binary payload column, then decoded to
    typed metadata via Arrow-batched mapInPandas."""
    payloads = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
        # spread before the Python stage: the table arrives as one parquet
        # split, which would serialize all decode work through a single
        # Python worker; after the repartition every core runs a worker.
        # Explicit count — an unsized repartition(col) is AQE-coalescible
        # back to ~1 partition on byte-small inputs (bytes are a bad proxy
        # for decode cost).
        .repartition(default_parallelism(), F.col("doc_id"))
    )
    return payloads.mapInPandas(_decode_meta_batches, META_SCHEMA).orderBy("doc_id")


# --- frame sampling (1 -> N generator through Arrow) -------------------------

MAX_FRAMES = 48
FRAME_STRIDE = 7


def _sample_frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fake video frame sampler: the payload stands in for a container
    whose frame count and per-frame digests derive from the payload md5
    (pure function of bytes — deterministic under retry/partitioning).
    Swap this body for a real demuxer (pyav/opencv) when codecs exist;
    the 1->N row-expansion shape, schema, and batching stay identical."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "n_frames": [], "frame_idx": [], "frame_hash": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            digest = hashlib.md5(bytes(payload)).hexdigest()
            n_frames = int(digest[:8], 16) % MAX_FRAMES + 1
            for idx in range(0, n_frames, FRAME_STRIDE):
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n_frames)
                out["frame_idx"].append(idx)
                out["frame_hash"].append(hashlib.md5(f"{digest}:{idx}".encode()).hexdigest())
        yield pd.DataFrame(out)


FRAME_SCHEMA = "doc_id long, n_frames long, frame_idx long, frame_hash string"


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling over video-like payloads — the 1->N
    generator variant of the multimodal plumbing: one input row fans out
    to a variable number of frame rows INSIDE the Arrow batch iterator
    (mapInPandas yields frames, never materializing per-doc frame lists
    in driver or JVM memory). At 100 TB this is the decode->sample stage
    of a video pipeline: payloads spread across workers before the Python
    stage, output rows flow straight into relational ops."""
    payloads = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
        .repartition(default_parallelism(), F.col("doc_id"))
    )
    return payloads.mapInPandas(_sample_frame_batches, FRAME_SCHEMA).orderBy("doc_id", "frame_idx")


# DuckDB twin: range() in DuckDB 1.0 cannot take a per-row (lateral) bound,
# so the oracle joins a constant 0..MAX_FRAMES-1 spine and filters.
SQL_MULTIMODAL_FRAME_SAMPLE = f"""
WITH meta AS (
  SELECT doc_id, md5(text) AS digest,
         CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % {MAX_FRAMES} + 1 AS n_frames
  FROM documents
),
spine AS (SELECT unnest(range({MAX_FRAMES})) AS frame_idx)
SELECT m.doc_id,
       m.n_frames,
       CAST(s.frame_idx AS BIGINT) AS frame_idx,
       md5(m.digest || ':' || CAST(s.frame_idx AS VARCHAR)) AS frame_hash
FROM meta m JOIN spine s ON s.frame_idx < m.n_frames AND s.frame_idx % {FRAME_STRIDE} = 0
ORDER BY m.doc_id, s.frame_idx"""


# DuckDB twin: md5 of a VARCHAR hashes its UTF-8 bytes — identical to the
# Python-side md5 of the encoded payload.
SQL_MULTIMODAL_META = """
WITH meta AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS checksum
  FROM documents
)
SELECT doc_id,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       checksum,
       CAST(CAST(('0x' || substr(checksum, 1, 8)) AS BIGINT) % 1920 + 1 AS INT) AS width,
       CAST(CAST(('0x' || substr(checksum, 9, 8)) AS BIGINT) % 1080 + 1 AS INT) AS height,
       CASE CAST(('0x' || substr(checksum, 17, 1)) AS INT) % 3
         WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS fmt
FROM meta
ORDER BY doc_id"""


# --- real-decoder statistics over synthesized uncompressed images ------------

# Deterministic image geometry from doc_id — the DuckDB oracle recomputes
# these arithmetically and NEVER parses bytes, so the query certifies that
# the real header parser (decode_image) extracts exactly the dimensions the
# payloads were built with.
_IMG_W_MOD, _IMG_W_OFF = 29, 2
_IMG_H_MOD, _IMG_H_OFF = 17, 2
_TWO_BYTE_MOD = 5  # P6 payloads with doc_id % 5 == 0 use maxval 65535
_COMMENT_MOD = 11  # PNM headers with doc_id % 11 == 0 carry a '#' comment
_TOPDOWN_MOD = 7  # BMPs with doc_id % 7 == 0 use negative (top-down) height


def build_image_payload(doc_id: int) -> bytes:
    """Deterministic uncompressed image bytes for a doc_id: P6 PPM
    (doc_id%3==0, two-byte samples every %5, header comments every %11),
    P5 PGM (%3==1), or BMP 24bpp (%3==2, top-down rows every %7). Pixel
    bytes are zeros — decode_image reads headers and validates lengths,
    not pixels."""
    import struct

    w = doc_id % _IMG_W_MOD + _IMG_W_OFF
    h = doc_id % _IMG_H_MOD + _IMG_H_OFF
    k = doc_id % 3
    if k in (0, 1):
        magic, channels = (b"P6", 3) if k == 0 else (b"P5", 1)
        maxval = 65535 if (k == 0 and doc_id % _TWO_BYTE_MOD == 0) else 255
        comment = b"# synthetic geometry\n" if doc_id % _COMMENT_MOD == 0 else b""
        header = magic + b"\n" + comment + f"{w} {h}\n{maxval}\n".encode()
        n_pix = w * h * channels * (2 if maxval > 255 else 1)
        return header + b"\x00" * n_pix
    row = ((w * 3 + 3) // 4) * 4  # BMP rows pad to 4-byte boundaries
    n_pix = row * h
    height = -h if doc_id % _TOPDOWN_MOD == 0 else h
    file_hdr = b"BM" + struct.pack("<IHHI", 54 + n_pix, 0, 0, 54)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, height, 1, 24, 0, n_pix, 2835, 2835, 0, 0)
    return file_hdr + info_hdr + b"\x00" * n_pix


def _decode_stats_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: dict[str, list] = {k: [] for k in ("doc_id", "fmt", "width", "height")}
        for doc_id in pdf["doc_id"]:
            meta = decode_image(build_image_payload(int(doc_id)))
            rows["doc_id"].append(int(doc_id))
            rows["fmt"].append(meta["fmt"])
            rows["width"].append(meta["width"])
            rows["height"].append(meta["height"])
        yield pd.DataFrame(rows)


_DECODE_STATS_SCHEMA = "doc_id long, fmt string, width int, height int"


def image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-format geometry statistics from the REAL pure-Python image
    parser: every doc_id synthesizes an actual PPM/PGM/BMP binary
    (comments, two-byte samples, top-down BMPs included), decode_image
    parses it inside Arrow-batched mapInPandas, and the aggregate is
    checked against an oracle that recomputes the geometry
    arithmetically — if the parser mis-read any header field on any
    payload, a count or pixel total would shift and the hash check
    would fail.

    Plan shape at 100 TB: payload build + decode are per-row Python over
    Arrow batches after an explicit repartition (same discipline as
    multimodal_meta); the aggregate partial-reduces to |formats| rows.
    """
    from ..functions.portable import roundn

    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(default_parallelism(), F.col("doc_id"))
    )
    decoded = base.mapInPandas(_decode_stats_batches, _DECODE_STATS_SCHEMA)
    return (
        decoded.groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum(F.col("width").cast("long") * F.col("height").cast("long")).alias(
                "total_pixels"
            ),
            F.sum("width").cast("long").alias("sum_width"),
            F.max("height").cast("long").alias("max_height"),
        )
        .select(
            "fmt",
            "n_images",
            "total_pixels",
            roundn(F.col("sum_width").cast("double") / F.col("n_images"), 4).alias(
                "avg_width"
            ),
            "max_height",
        )
        .orderBy("fmt")
    )


SQL_IMAGE_DECODE_STATS = f"""
WITH g AS (
  SELECT doc_id,
         doc_id % {_IMG_W_MOD} + {_IMG_W_OFF} AS w,
         doc_id % {_IMG_H_MOD} + {_IMG_H_OFF} AS h,
         CASE doc_id % 3 WHEN 0 THEN 'ppm' WHEN 1 THEN 'pgm' ELSE 'bmp' END AS fmt
  FROM documents
)
SELECT fmt,
       count(*) AS n_images,
       CAST(sum(w * h) AS BIGINT) AS total_pixels,
       (floor((CAST(sum(w) AS DOUBLE) / count(*)) * 10000 + 0.5) / 10000) AS avg_width,
       CAST(max(h) AS BIGINT) AS max_height
FROM g
GROUP BY fmt
ORDER BY fmt"""
