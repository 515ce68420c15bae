"""Multimodal columns: image/audio as opaque ``binary`` with typed metadata.

Large-scale training pipelines carry media as binary blobs next to typed
metadata; the engine treats them exactly like token arrays: Arrow-batched
``mapInPandas`` kernels, never per-row Python UDF registration.

The container has no image/audio codecs (PIL/libav are absent), so the
actual *decode* is stubbed behind an import-try: when a codec is present
``decode_image`` uses it, otherwise a clearly-marked DETERMINISTIC FAKE
tiles the payload bytes into the (h, w, c) shape declared by the header.
Everything Spark-side — schema, batch shape, partitioning, UDF signature —
is real and tested either way.

Synthetic media format (deterministic from the documents table, so the
decode path has a DuckDB-expressible oracle):

  image:  b"TSFI" | u32 width | u32 height | u16 channels | payload
  audio:  b"TSFA" | u32 sample_rate | u32 n_samples | u16 1 | payload

with width = len(text)*7 % 1024 + 1, height = len(text)*13 % 768 + 1,
channels = 3, sample_rate = 16000, n_samples = len(text)*31 % 8000 + 1,
payload = first 64 bytes of utf-8 text; images for even octet lengths,
audio for odd.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:  # pragma: no cover - codec not present in this container
    from PIL import Image  # noqa: F401
    _HAS_CODEC = True
except ImportError:
    _HAS_CODEC = False

#: the deterministic-fake decode is the DEFAULT even when an imaging
#: library happens to be importable — merely installing PIL must not
#: break media_features/frame_sample. Wiring a real codec is an explicit
#: opt-in (TSF_REAL_DECODE=1) and still requires _HAS_CODEC.
_REAL_DECODE = _HAS_CODEC and os.environ.get("TSF_REAL_DECODE") == "1"

MAGIC_IMAGE = b"TSFI"
MAGIC_AUDIO = b"TSFA"
_HEADER = struct.Struct("<4sIIH")

META_SCHEMA = ("doc_id string, media_type string, byte_len int, "
               "width int, height int, channels int, "
               "sample_rate int, n_samples int")

FEATURE_SCHEMA = ("doc_id string, media_type string, "
                  "mean_val double, std_val double, n_values bigint")


def _encode_one(doc_id: str, text: str) -> tuple[bytes, str]:
    raw = text.encode("utf-8")
    payload = raw[:64]
    n = len(raw)
    if n % 2 == 0:
        header = _HEADER.pack(MAGIC_IMAGE, n * 7 % 1024 + 1, n * 13 % 768 + 1, 3)
        return header + payload, "image"
    header = _HEADER.pack(MAGIC_AUDIO, 16000, n * 31 % 8000 + 1, 1)
    return header + payload, "audio"


def synth_media(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media binary, media_type) via one Arrow pass."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            enc = [_encode_one(d, t) for d, t in zip(pdf["doc_id"].astype(str),
                                                     pdf["text"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype(str),
                "media": [e[0] for e in enc],
                "media_type": [e[1] for e in enc]})
    return docs.mapInPandas(fn, "doc_id string, media binary, media_type string")


def parse_header(blob: bytes) -> dict:
    """Parse the typed header of one media blob (driver/worker shared)."""
    magic, a, b, c = _HEADER.unpack_from(blob)
    meta = {"byte_len": len(blob)}
    if magic == MAGIC_IMAGE:
        meta.update(media_type="image", width=a, height=b, channels=c,
                    sample_rate=None, n_samples=None)
    elif magic == MAGIC_AUDIO:
        meta.update(media_type="audio", width=None, height=None, channels=None,
                    sample_rate=a, n_samples=b)
    else:
        raise ValueError(f"unknown media magic {magic!r}")
    return meta


def decode_media_meta(media: DataFrame) -> DataFrame:
    """Typed metadata extraction from the binary column (Arrow batches)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_header(bytes(b)) for b in pdf["media"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].astype(str).to_numpy())
            yield out[["doc_id", "media_type", "byte_len", "width", "height",
                       "channels", "sample_rate", "n_samples"]]
    return media.mapInPandas(fn, META_SCHEMA)


def _tiled_payload(blob: bytes, count: int) -> np.ndarray:
    """First ``count`` values of the deterministic-fake decode: the
    payload bytes tiled (an empty payload tiles a single zero byte)."""
    payload = np.frombuffer(blob, dtype=np.uint8, offset=_HEADER.size)
    if payload.size == 0:
        payload = np.zeros(1, dtype=np.uint8)
    reps = -(-count // payload.size)
    return np.tile(payload, reps)[:count]


def decode_image(blob: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Decode one image blob to (height, width, channels) uint8.

    STUB: with no codec in the container, a deterministic fake tiles the
    payload bytes to the declared shape — the real codec slots in behind
    the same signature (NotImplementedError marks the boundary if neither
    path applies). ``max_pixels`` bounds the materialized values (rows
    from the top of the image) for feature extraction on large frames."""
    meta = parse_header(blob)
    if meta["media_type"] != "image":
        raise ValueError("not an image blob")
    h, w, c = meta["height"], meta["width"], meta["channels"]
    if max_pixels is not None:
        h = max(1, min(h, max_pixels // max(w * c, 1)))
    if _REAL_DECODE:  # pragma: no cover — explicit opt-in once a codec is wired
        raise NotImplementedError("real codec decode not wired in this sandbox")
    return _tiled_payload(blob, h * w * c).reshape(h, w, c)


def decode_image_rows(blob: bytes, row_ids: np.ndarray) -> np.ndarray:
    """Decode ONLY the requested image rows to (len(row_ids), width *
    channels) uint8 — the frame-sampling fast path (a real video codec
    seeks to the sampled keyframes instead of decoding every frame; the
    fake decode does the same by indexing the tiled payload closed-form).
    Bit-identical to ``decode_image(blob)[row_ids]``."""
    meta = parse_header(blob)
    if meta["media_type"] != "image":
        raise ValueError("not an image blob")
    w, c = meta["width"], meta["channels"]
    if _REAL_DECODE:  # pragma: no cover — explicit opt-in, see decode_image
        raise NotImplementedError("real codec decode not wired in this sandbox")
    payload = np.frombuffer(blob, dtype=np.uint8, offset=_HEADER.size)
    if payload.size == 0:
        payload = np.zeros(1, dtype=np.uint8)
    wc = w * c
    idx = (np.asarray(row_ids, dtype=np.int64)[:, None] * wc
           + np.arange(wc, dtype=np.int64)[None, :]) % payload.size
    return payload[idx]


def decode_audio(blob: bytes) -> np.ndarray:
    """Decode one audio blob to (n_samples,) float32 in [-1, 1) — same
    deterministic-fake contract as :func:`decode_image`."""
    meta = parse_header(blob)
    if meta["media_type"] != "audio":
        raise ValueError("not an audio blob")
    n = meta["n_samples"]
    return (_tiled_payload(blob, n).astype(np.float32) - 128.0) / 128.0


def _spread(media: DataFrame) -> DataFrame:
    """Repartition a media frame to the session's parallelism before a
    decode-heavy UDF stage. Decoded output is ~4 orders of magnitude
    larger than the blob column, so Spark's file-size-based splitting
    under-partitions badly (one 0.6 MB parquet = ONE task doing ALL the
    decoding); the pre-UDF exchange moves only the small undecoded
    blobs. No-op when the input is already split at least that wide."""
    sc = media.sparkSession.sparkContext
    target = sc.defaultParallelism
    if media.rdd.getNumPartitions() >= target:
        return media
    return media.repartition(target, "doc_id")


def media_features(media: DataFrame, max_values: int = 65536) -> DataFrame:
    """Per-blob decoded-content statistics (mean/std over pixels or
    samples) — the downstream plumbing a real feature extractor would use:
    decode inside the Arrow batch, vectorized numpy reduction, typed
    output schema. Stats are computed over a bounded prefix of at most
    ``max_values`` decoded values (real pipelines likewise featurize a
    resized thumbnail, not the megapixel original); ``n_values`` reports
    the full logical size.

    Mean/std come from EXACT integer sufficient statistics over the
    decoded bytes (sum / sum-of-squares as int64, converted to double in
    one fixed expression): integer sums are order-free and the float
    formula is replayed verbatim by :func:`media_features_duckdb`, so the
    driver value-checks this query bit-for-bit (a numpy two-pass
    mean/std differs from the SQL formula in the last ULP, which flips
    6-dp rounding)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, b in zip(pdf["doc_id"].astype(str), pdf["media"]):
                blob = bytes(b)
                meta = parse_header(blob)
                mt = meta["media_type"]
                if mt == "image":
                    full = meta["height"] * meta["width"] * meta["channels"]
                    v = decode_image(blob, max_pixels=max_values) \
                        .ravel()[:max_values]
                else:
                    full = meta["n_samples"]
                    v = _tiled_payload(blob, min(full, max_values))
                m = int(v.size)
                s = int(v.sum(dtype=np.int64))
                ss = int((v.astype(np.int64) ** 2).sum())
                mean = s / m
                std = (np.sqrt(max((ss - s * s / m) / (m - 1), 0.0))
                       if m > 1 else float("nan"))
                if mt == "audio":  # bytes -> [-1, 1): affine, exact
                    mean = (mean - 128.0) / 128.0
                    std = std / 128.0
                rows.append((d, mt, float(mean), float(std), int(full)))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type",
                                              "mean_val", "std_val", "n_values"])
    return _spread(media).mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every: int = 8) -> DataFrame:
    """Video-style frame sampling plumbing: treat each image row's height
    as the frame axis and emit every ``every``-th row as its own blob-less
    record (doc_id, frame_id, frame array<int>) — shows the explode shape
    a video pipeline uses, with deterministic content.

    Runs as ``mapInArrow`` with the output ``list<int32>`` column built
    directly from one flat values buffer + offsets: the previous
    ``mapInPandas`` form went through an object-dtype pandas Series of
    per-frame numpy arrays, and that per-row python→Arrow conversion —
    not the decode — was ~80% of the query's time (profiled 5.3s vs 0.95s
    decode-only at sf0.1; this form ~1.3s)."""
    import pyarrow as pa

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index("doc_id")).to_pylist()
            blobs = batch.column(batch.schema.get_field_index("media")).to_pylist()
            doc_ids: list[str] = []
            reps: list[int] = []
            fid_parts: list[np.ndarray] = []
            val_parts: list[np.ndarray] = []
            wcs: list[np.ndarray] = []
            for d, blob in zip(ids, blobs):
                meta = parse_header(blob)
                if meta["media_type"] != "image":
                    continue
                # decode only the sampled rows (a real video codec seeks
                # to the sampled keyframes instead of decoding every
                # frame): ~``every``x less decode work per blob
                fi = np.arange(0, meta["height"], every)
                rows = decode_image_rows(blob, fi)
                doc_ids.append(d)
                reps.append(len(fi))
                fid_parts.append(fi)
                val_parts.append(rows.ravel())
                wcs.append(np.full(len(fi), rows.shape[1], dtype=np.int64))
            if doc_ids:
                id_arr = pa.array(np.repeat(
                    np.asarray(doc_ids, dtype=object), reps), type=pa.string())
                fid_arr = pa.array(
                    np.concatenate(fid_parts).astype(np.int32))
                values = pa.array(
                    np.concatenate(val_parts).astype(np.int32))
                off64 = np.zeros(len(fid_arr) + 1, dtype=np.int64)
                np.cumsum(np.concatenate(wcs), out=off64[1:])
                if off64[-1] >= 2**31:  # list<int32> offset ceiling: split
                    raise ValueError(
                        "Arrow batch exceeds int32 list offsets; lower "
                        "spark.sql.execution.arrow.maxRecordsPerBatch")
                frame_arr = pa.ListArray.from_arrays(
                    pa.array(off64.astype(np.int32)), values)
            else:
                id_arr = pa.array([], type=pa.string())
                fid_arr = pa.array([], type=pa.int32())
                frame_arr = pa.array([], type=pa.list_(pa.int32()))
            yield pa.RecordBatch.from_arrays(
                [id_arr, fid_arr, frame_arr], ["doc_id", "frame_id", "frame"])
    return _spread(media).mapInArrow(
        fn, "doc_id string, frame_id int, frame array<int>")


#: shared oracle arithmetic for the deterministic-fake decode: payload =
#: first 64 utf-8 bytes of text (ASCII fixture: byte i == ascii(char i)),
#: values = payload tiled; prefix sums over the tiled sequence are
#: closed-form ((x // p) * sum(pl) + sum of the first x % p payload
#: bytes), so the oracle never materializes 65k values per row.
_MEDIA_CTE = """
    base AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
                    octet_length(encode(text)) AS bl
             FROM documents),
    pay AS (SELECT doc_id, bl,
                   CASE WHEN least(bl, 64) = 0 THEN [0]
                        ELSE list_transform(range(1, least(bl, 64) + 1),
                                            i -> ascii(substring(text, i, 1)))
                   END AS pl
            FROM base),
    p2 AS (SELECT doc_id, bl, pl, len(pl) AS p,
                  list_sum(pl) AS tot,
                  list_sum(list_transform(pl, v -> v * v)) AS tot2
           FROM pay)
"""


def _ps(x: str, sq: bool = False) -> str:
    """Prefix sum of the first ``x`` tiled values (or squares)."""
    tot = "tot2" if sq else "tot"
    vals = "list_transform(pl, v -> v * v)" if sq else "pl"
    return (f"(({x}) // p) * {tot} "
            f"+ coalesce(list_sum(({vals})[1:(({x}) % p)]), 0)")


def media_features_duckdb(max_values: int = 65536) -> str:
    """DuckDB replay of :func:`media_features` over the documents table:
    identical header arithmetic (media_meta rules), identical value-count
    capping, and the IDENTICAL double-precision formula over the same
    integer sufficient statistics — value-checks the fake-decode feature
    path end-to-end."""
    mv = int(max_values)
    r6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"
    return f"""
    WITH {_MEDIA_CTE},
    dims AS (SELECT doc_id, bl, pl, p, tot, tot2,
                    CASE WHEN bl % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
                    (bl * 7 % 1024 + 1) * 3 AS wc,
                    bl * 13 % 768 + 1 AS h,
                    bl * 31 % 8000 + 1 AS ns
             FROM p2),
    m AS (SELECT doc_id, media_type, pl, p, tot, tot2,
                 CASE WHEN media_type = 'image'
                      THEN least(greatest(1, least(h, {mv} // wc)) * wc, {mv})
                      ELSE least(ns, {mv}) END AS m,
                 CASE WHEN media_type = 'image' THEN h * wc ELSE ns END AS fullv
          FROM dims),
    st AS (SELECT doc_id, media_type, m, fullv,
                  {_ps('m')} AS s, {_ps('m', sq=True)} AS ss
           FROM m),
    ft AS (SELECT doc_id, media_type, fullv, m,
                  CAST(s AS DOUBLE) / m AS mean_b,
                  CASE WHEN m > 1 THEN sqrt(greatest(
                       (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / m)
                       / (m - 1), 0)) END AS std_b
           FROM st)
    SELECT doc_id, media_type,
           {r6.format(x="CASE WHEN media_type = 'audio' "
                        "THEN (mean_b - 128.0) / 128.0 ELSE mean_b END")} AS mean_val,
           {r6.format(x="CASE WHEN media_type = 'audio' "
                        "THEN std_b / 128.0 ELSE std_b END")} AS std_val,
           CAST(fullv AS BIGINT) AS n_values
    FROM ft
    """


def frame_sample_duckdb(every: int = 8) -> str:
    """DuckDB replay of :func:`frame_sample` (+ the per-frame summary in
    the driver query): every ``every``-th image row as a frame, with its
    pixel count and exact integer pixel sum via tiled prefix sums."""
    return f"""
    WITH {_MEDIA_CTE},
    img AS (SELECT doc_id, pl, p, tot,
                   (bl * 7 % 1024 + 1) * 3 AS wc,
                   bl * 13 % 768 + 1 AS h
            FROM p2 WHERE bl % 2 = 0),
    fr AS (SELECT doc_id, pl, p, tot, wc,
                  unnest(range(0, h, {int(every)})) AS frame_id
           FROM img)
    SELECT doc_id, CAST(frame_id AS INT) AS frame_id,
           CAST(wc AS INT) AS n_px,
           CAST({_ps('frame_id * wc + wc')} - ({_ps('frame_id * wc')})
                AS BIGINT) AS px_sum
    FROM fr
    """


def media_meta_duckdb() -> str:
    """DuckDB oracle: recompute the typed metadata arithmetically from the
    source table — if the Spark encode->binary->decode path corrupts
    anything, the join of values diverges."""
    return """
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
           CAST(14 + least(octet_length(encode(text)), 64) AS INT) AS byte_len,
           CAST(CASE WHEN octet_length(encode(text)) % 2 = 0
                THEN octet_length(encode(text)) * 7 % 1024 + 1 END AS INT) AS width,
           CAST(CASE WHEN octet_length(encode(text)) % 2 = 0
                THEN octet_length(encode(text)) * 13 % 768 + 1 END AS INT) AS height,
           CAST(CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 3 END AS INT) AS channels,
           CAST(CASE WHEN octet_length(encode(text)) % 2 = 1 THEN 16000 END AS INT) AS sample_rate,
           CAST(CASE WHEN octet_length(encode(text)) % 2 = 1
                THEN octet_length(encode(text)) * 31 % 8000 + 1 END AS INT) AS n_samples
    FROM documents
    """
