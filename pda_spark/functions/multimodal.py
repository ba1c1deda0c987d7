"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow UDFs over
``mapInPandas``. Compressed-codec libraries (JPEG/PNG/video) are NOT
present in this container, so decode is layered (VERDICT r5 #3):

- ``decode_image`` is a REAL dependency-free decoder for the
  uncompressed formats (binary PPM/PGM, 24-bit + 8-bit-grayscale BMP
  with row padding) — pure numpy byte parsing, gated end-to-end by
  q98 (encode -> bytes -> decode -> integer pixel stats vs a DuckDB
  oracle replaying the pixel formula);
- compressed formats still raise ``NotImplementedError`` (the external
  codec slot);
- ``fake_decode_image`` remains the deterministic stand-in for opaque
  payloads whose format we can't parse (q28 gate — unchanged).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mime", T.StringType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("std_px", T.DoubleType()),
        T.StructField("phash", T.LongType()),
    ]
)


def _pnm_header_tokens(payload: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse ``n_tokens`` whitespace-separated integers after the PNM
    magic, honoring ``#`` comments; returns (tokens, offset_past_header).
    The pixel data starts exactly ONE whitespace byte after the last
    header token (Netpbm spec)."""
    toks: list[int] = []
    i = 2  # past the 2-byte magic
    cur = b""
    while len(toks) < n_tokens:
        if i >= len(payload):
            raise ValueError("truncated PNM header")
        c = payload[i : i + 1]
        if c == b"#":
            # a comment terminates the current token (its closing
            # newline is whitespace per the Netpbm spec) — without the
            # flush, digits on either side of a comment merged into one
            # token (round-6 review)
            if cur:
                toks.append(int(cur))
                cur = b""
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c in (b" ", b"\t", b"\r", b"\n"):
            if cur:
                toks.append(int(cur))
                cur = b""
        else:
            cur += c
        i += 1
    return toks, i


def _decode_pnm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    channels = 3 if magic == b"P6" else 1
    (w, h, maxval), off = _pnm_header_tokens(payload, 3)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"PNM maxval {maxval} unsupported (8-bit only)")
    need = w * h * channels
    px = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    if channels == 3:
        return px.reshape(h, w, 3)
    return px.reshape(h, w)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Windows BMP, BITMAPINFOHEADER, uncompressed (BI_RGB): 24-bit BGR
    or 8-bit grayscale-palette; rows bottom-up (positive height) or
    top-down (negative), each padded to a 4-byte multiple."""
    if len(payload) < 54:
        raise ValueError("truncated BMP")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"BMP header size {hdr_size} unsupported (need BITMAPINFOHEADER)")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} requires an external codec"
        )
    if bpp not in (8, 24):
        raise ValueError(f"BMP bpp {bpp} unsupported (8 or 24)")
    if bpp == 8:
        # the 8-bit path returns palette INDICES as gray values, which
        # is only correct when the palette is the identity grayscale
        # ramp (entry i == BGRA(i, i, i, _)); any other palette must
        # refuse loudly rather than silently emit indices (round-6
        # review)
        pal = np.frombuffer(payload, dtype=np.uint8, count=data_off - 14 - hdr_size,
                            offset=14 + hdr_size)
        if len(pal) % 4:
            raise ValueError("BMP palette not 4-byte aligned")
        pal = pal.reshape(-1, 4)
        idx = np.arange(len(pal), dtype=np.uint8)
        if not (np.array_equal(pal[:, 0], idx) and np.array_equal(pal[:, 1], idx)
                and np.array_equal(pal[:, 2], idx)):
            raise ValueError(
                "8-bit BMP palette is not the identity grayscale ramp; "
                "color-palette BMPs need a palette-applying decode"
            )
    bottom_up, h = h > 0, abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * nch]
    if bottom_up:
        rows = rows[::-1]
    if nch == 1:
        return np.ascontiguousarray(rows)
    # stored BGR -> returned RGB
    return np.ascontiguousarray(rows.reshape(h, w, 3)[:, :, ::-1])


def decode_image(payload: bytes) -> np.ndarray:
    """Dependency-free image decode for uncompressed formats: binary
    PPM (P6) / PGM (P5) and BMP (24-bit BGR or 8-bit grayscale, BI_RGB,
    bottom-up or top-down, 4-byte row padding). Returns uint8
    ``(h, w, 3)`` (RGB) or ``(h, w)`` (gray). Compressed formats
    (JPEG/PNG/...) raise NotImplementedError — that codec slot stays
    external to this container."""
    payload = bytes(payload)
    if payload[:2] in (b"P6", b"P5"):
        return _decode_pnm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "compressed image codecs unavailable in this environment; "
        "decode_image handles PPM/PGM/BMP — use fake_decode_image for opaque payloads"
    )


def encode_ppm(arr: np.ndarray) -> bytes:
    """Binary PPM (P6) / PGM (P5) encoder for fixture synthesis — the
    inverse of ``_decode_pnm``."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 3:
        h, w, _ = arr.shape
        return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()
    h, w = arr.shape
    return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """24-bit (RGB input) or 8-bit-grayscale BMP encoder, BITMAPINFOHEADER,
    bottom-up rows with 4-byte padding — the inverse of ``_decode_bmp``."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    nch = 1 if gray else 3
    stride = (w * nch + 3) & ~3
    palette = b"".join(bytes([i, i, i, 0]) for i in range(256)) if gray else b""
    data_off = 54 + len(palette)
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y] if gray else arr[y, :, ::-1]  # RGB -> BGR
        body += row.tobytes() + b"\x00" * (stride - w * nch)
    file_hdr = (
        b"BM"
        + (data_off + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
    )
    info_hdr = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (nch * 8).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + ((256 if gray else 0)).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    return file_hdr + info_hdr + palette + bytes(body)


def fake_decode_image(payload: bytes, w: int = 8, h: int = 8) -> np.ndarray:
    """Deterministic pseudo-decode: payload bytes -> (h, w) uint8 'pixels'
    via sha256 expansion. Pure function of payload. The counter suffix is
    ASCII ('#0', '#1', ...) so SQL engines can replay the expansion on
    text payloads (DuckDB sha256 takes VARCHAR) — the driver-gate oracle
    for q28 depends on this."""
    need = w * h
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.sha256(payload + f"#{counter}".encode()).digest()
        counter += 1
    return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(h, w)


def extract_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the opaque payload column:
    byte size, pixel mean/std, and an 8x8 average-hash (pHash-style) —
    all from the deterministic fake decode."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = fake_decode_image(bytes(payload)).astype(np.float64)
                bits = (px > px.mean()).ravel()
                phash = 0
                for i, b in enumerate(bits[:63]):
                    phash |= int(b) << i
                rows.append(
                    {
                        "media_id": mid,
                        "n_bytes": len(bytes(payload)),
                        "mean_px": round(float(px.mean()), 6),
                        "std_px": round(float(px.std()), 6),
                        "phash": phash,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(fn, FEATURE_SCHEMA)


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
    ]
)


def decode_image_stats(media: DataFrame) -> DataFrame:
    """REAL-decode feature extraction (q98 gate): parse each payload
    with ``decode_image`` (PPM/PGM/BMP byte parsing — header offsets,
    BGR order, bottom-up rows, stride padding) and emit exact integer
    stats. Any parsing bug shifts bytes and breaks the channel sums, so
    the DuckDB oracle (which replays the fixture's pixel formula
    arithmetically) gates the decoder end-to-end. Grayscale decodes
    fill all three channel sums with the gray sum."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload))
                if px.ndim == 2:
                    h, w = px.shape
                    s = int(px.astype(np.int64).sum())
                    sums = (s, s, s)
                else:
                    h, w, _ = px.shape
                    sums = tuple(
                        int(px[:, :, c].astype(np.int64).sum()) for c in range(3)
                    )
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "r_sum": sums[0],
                        "g_sum": sums[1],
                        "b_sum": sums[2],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA.fields])

    return media.mapInPandas(fn, DECODE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_no, frame)
    rows; frame decode itself is the deterministic stub."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = max(1, len(bytes(payload)) // 64)
                for f_no in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_no": f_no,
                            "frame": hashlib.sha256(bytes(payload) + f_no.to_bytes(4, "big")).digest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    return media.filter(F.col("kind") == "video").mapInPandas(fn, schema)


def synth_media(spark, n: int = 50) -> DataFrame:
    """Deterministic synthetic media table for tests/bench."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 7)
        kind = ["image", "audio", "video"][i % 3]
        rows.append((f"m{i:05d}", kind, bytearray(payload), (8, 8, f"x-fake/{kind}")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


DOWNSAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("by", T.IntegerType()),
        T.StructField("bx", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("mean_px", T.DoubleType()),
    ]
)


def downsample_block_mean(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Thumbnail / resize via area (block-mean) downsampling over REAL
    decoded payloads: pixel (y, x) lands in output cell
    (y*out_h // h, x*out_w // w) — the integer-exact area partition that
    handles non-divisible sizes with varying block extents and no
    floating-point resampling grid. Emits one row per output cell with
    the exact integer sum over all channels (order-independent), the
    contributing sample count (pixels x channels), and the rounded
    mean. Grayscale decodes contribute one sample per pixel.

    One ``mapInPandas`` stage (decode + pool fused — a separate resize
    stage would double the Python worker hop, the q98 lesson); at scale
    this is embarrassingly parallel per payload with output a constant
    out_w*out_h rows per image."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload))
                if px.ndim == 2:
                    px = px[:, :, None]
                h, w, nch = px.shape
                by = (np.arange(h, dtype=np.int64) * out_h) // h
                bx = (np.arange(w, dtype=np.int64) * out_w) // w
                acc = np.zeros((out_h, out_w), dtype=np.int64)
                cnt = np.zeros((out_h, out_w), dtype=np.int64)
                np.add.at(acc, (by[:, None], bx[None, :]), px.astype(np.int64).sum(axis=2))
                np.add.at(cnt, (by[:, None], bx[None, :]), nch)
                for yy in range(out_h):
                    for xx in range(out_w):
                        if cnt[yy, xx] == 0:
                            continue
                        rows.append(
                            {
                                "media_id": mid,
                                "by": yy,
                                "bx": xx,
                                "px_sum": int(acc[yy, xx]),
                                "n_px": int(cnt[yy, xx]),
                                "mean_px": round(float(acc[yy, xx]) / float(cnt[yy, xx]), 6),
                            }
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in DOWNSAMPLE_SCHEMA.fields])

    return media.mapInPandas(fn, DOWNSAMPLE_SCHEMA)
