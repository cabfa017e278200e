"""Multimodal columns: opaque binary media + typed metadata.

Design (SURVEY.md §2.10 / driver mandate): media travel as
``binary`` columns with a typed manifest (media_type, n_bytes, chunking)
— at 100 TB the binary column holds *pointers* (path/offset/len) for
large blobs and inlines small ones; either way the Spark-side plumbing
(schema, partitioning, Arrow batch shape through mapInPandas) is the
same and is what this module implements and tests.

Codec status: every modality has a REAL decode path for at least one
uncompressed container, all pure stdlib — audio via ``wave`` RIFF
parsing (``wav_decode_features``), images via ``struct`` BMP/DIB
parsing (``bmp_decode_features``: file header, BITMAPINFOHEADER,
palette, bottom-up padded rows), video via ``struct`` RIFF/AVI chunk
walking (``avi_decode_frames``: hdrl/avih header, movi '00db' frame
chunks, even-byte padding). Images additionally have a REAL
COMPRESSED path: PNG via stdlib ``zlib`` (``png_decode_features``:
chunk walk + CRC32 verification, DEFLATE decompression, full
five-filter scanline reconstruction). Remaining compressed formats
(JPEG/H.264/MP3) need codec libraries not present in this container,
so the generic ``decode_features``/``resize_media``/``sample_frames``
kernels keep their ``codec="fake"`` deterministic byte-math path and
raise NotImplementedError for ``codec="real"``. Everything around the
kernels — binary ingest, chunk manifest, Arrow batching, output
schemas — is real.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator
from typing import Literal

import pandas as pd

from pyspark.sql import DataFrame, functions as F

CHUNK_BYTES = 64 * 1024

FEATURE_SCHEMA = "doc_id bigint, media_type string, n_bytes bigint, feature array<double>"


def to_media(docs: DataFrame, text_col: str = "text",
             media_type: str = "application/octet-stream") -> DataFrame:
    """Ingest: wrap a payload as an opaque binary column + typed metadata.

    (Testdata has no real image/audio files, so document text stands in
    as the payload bytes; with real data this is ``format("binaryFile")``
    or a pointer manifest read.)
    """
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.lit(media_type).alias("media_type"),
    )


def media_manifest(media: DataFrame) -> DataFrame:
    """Chunk manifest: byte size + number of fixed-size chunks per blob."""
    n_bytes = F.octet_length("media")
    return media.select(
        "doc_id", "media_type",
        n_bytes.alias("n_bytes"),
        F.ceil(n_bytes / F.lit(CHUNK_BYTES)).cast("long").alias("n_chunks"),
    )


def decode_features(media: DataFrame, codec: Literal["fake", "real"] = "fake",
                    dim: int = 8) -> DataFrame:
    """Feature extraction over binary media via Arrow-batched mapInPandas.

    The per-batch kernel sees a pandas DataFrame with raw ``bytes`` —
    exactly the shape a real decoder (PIL/libsndfile/ffmpeg) needs. The
    "fake" codec derives a deterministic feature vector from byte
    statistics so tests can assert the full pipeline shape end-to-end.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "real media decode requires image/audio libraries not "
                    "bundled in this environment; use codec='fake' for the "
                    "pipeline-shape path")
            feats = [
                [float(len(b)), float(b[0] if b else 0), float(b[-1] if b else 0),
                 float(sum(b[:64]) % 997)] + [float((len(b) >> s) & 0xFF)
                                              for s in range(dim - 4)]
                for b in pdf["media"]
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(b) for b in pdf["media"]],
                "feature": feats,
            })

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


WAV_RATE = 8000
WAV_SCHEMA = ("doc_id bigint, n_frames bigint, sample_rate int, "
              "n_channels int, samp_width int, max_amp int, mean_amp double")


def wav_decode_features(media: DataFrame) -> DataFrame:
    """REAL audio decode via the stdlib ``wave`` codec (no external libs).

    Each payload is containerized as an 8-bit mono WAV (RIFF header +
    the payload as PCM frames) and then decoded back through
    ``wave.open`` — actual RIFF chunk-walking, not byte math — inside
    the same Arrow-batched mapInPandas shape as the other kernels. This
    is the one "real"-codec path that needs nothing beyond the stdlib;
    image/video stay declared stubs.

    Oracle-able because the PCM frames ARE the payload bytes: frame
    count and amplitude statistics are SQL-expressible over the text's
    byte values. The mean is one exact-int sum divided once — both
    engines produce the identical double.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "n_frames", "sample_rate",
                                    "n_channels", "samp_width", "max_amp",
                                    "mean_amp")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(1)
                    w.setframerate(WAV_RATE)
                    w.writeframes(bytes(payload))
                buf.seek(0)
                with wave.open(buf, "rb") as r:
                    frames = r.readframes(r.getnframes())
                    rows["doc_id"].append(doc_id)
                    rows["n_frames"].append(r.getnframes())
                    rows["sample_rate"].append(r.getframerate())
                    rows["n_channels"].append(r.getnchannels())
                    rows["samp_width"].append(r.getsampwidth())
                    rows["max_amp"].append(max(frames) if frames else 0)
                    rows["mean_amp"].append(
                        sum(frames) / len(frames) if frames else 0.0)
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, schema=WAV_SCHEMA)


BMP_WIDTH = 64  # pixels per row; 8bpp stride 64 is already 4-byte aligned
BMP_SCHEMA = ("doc_id bigint, width int, height int, bpp int, "
              "n_px bigint, max_px int, mean_px double")


def _encode_bmp(payload: bytes) -> bytes:
    """Containerize payload bytes as an 8-bit grayscale BMP: each byte
    is one pixel, rows of BMP_WIDTH, last row zero-padded, rows stored
    bottom-up per the DIB spec, 256-entry gray palette."""
    w = BMP_WIDTH
    h = (len(payload) + w - 1) // w
    rows = [payload[r * w:(r + 1) * w].ljust(w, b"\x00") for r in range(h)]
    px = b"".join(reversed(rows))
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    off = 14 + 40 + len(palette)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(px),
                       2835, 2835, 256, 0)
    head = struct.pack("<2sIHHI", b"BM", off + len(px), 0, 0, off)
    return head + info + palette + px


def bmp_decode_features(media: DataFrame) -> DataFrame:
    """REAL image decode via stdlib ``struct`` BMP parsing (no external libs).

    Mirrors ``wav_decode_features``: each payload is containerized as an
    8-bit grayscale BMP (``_encode_bmp``) then decoded back by walking
    the actual container structure — BITMAPFILEHEADER magic + pixel
    offset, BITMAPINFOHEADER dims/bpp/compression, 4-byte-aligned
    bottom-up rows reassembled top-down — inside the same Arrow-batched
    mapInPandas shape as the other kernels. ``codec="real"`` therefore
    no longer raises for uncompressed images.

    Oracle-able because the pixels ARE the payload bytes plus
    deterministic zero padding to a full last row: width/height/bpp and
    the max/mean over all width*height pixels are SQL-expressible over
    the text's byte values.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "bpp",
                                    "n_px", "max_px", "mean_px")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                blob = _encode_bmp(bytes(payload))
                magic, _fsize, _r1, _r2, off = struct.unpack_from(
                    "<2sIHHI", blob, 0)
                if magic != b"BM":
                    raise ValueError("not a BMP stream")
                (hsz, w, h, _planes, bpp, comp, _isz, _xp, _yp, _ncol,
                 _nimp) = struct.unpack_from("<IiiHHIIiiII", blob, 14)
                if hsz != 40 or comp != 0 or bpp != 8:
                    raise ValueError("unsupported DIB variant")
                stride = (w * bpp // 8 + 3) & ~3
                px = b"".join(
                    blob[off + r * stride: off + r * stride + w]
                    for r in reversed(range(h)))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["bpp"].append(bpp)
                rows["n_px"].append(len(px))
                rows["max_px"].append(max(px) if px else 0)
                rows["mean_px"].append(sum(px) / len(px) if px else 0.0)
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, schema=BMP_SCHEMA)


AVI_W, AVI_H = 8, 8            # frame dims: 64 pixels = 64 payload bytes
AVI_FPS_US = 40_000            # 25 fps in avih units (us per frame)
AVI_EVERY_N = 4                # emit every 4th frame, like sample_frames
PNG_WIDTH = 32  # pixels per row in the PNG containerization
PNG_SCHEMA = ("doc_id bigint, width int, height int, bit_depth int, "
              "color_type int, n_px bigint, max_px int, mean_px double")


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): pick of left/up/up-left
    closest to the linear estimate a + b - c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _encode_png(payload: bytes) -> bytes:
    """Containerize payload bytes as an 8-bit grayscale PNG — a REAL
    compressed container: rows of PNG_WIDTH (last row zero-padded),
    scanlines run through the full adaptive filter set (row r uses
    filter r % 5, so None/Sub/Up/Average/Paeth all appear), the
    filtered stream is zlib-DEFLATEd into IDAT, and every chunk
    carries its real CRC32.

    Filtering is numpy-vectorized: every prediction reads ORIGINAL
    pixel values (unlike decode there is no sequential dependency),
    so a/b/c are just shifted views of the pixel matrix."""
    import zlib

    import numpy as np
    w = PNG_WIDTH
    h = (len(payload) + w - 1) // w
    if h:
        px = np.frombuffer(payload.ljust(h * w, b"\x00"),
                           dtype=np.uint8).reshape(h, w).astype(np.int16)
        a = np.zeros_like(px)
        a[:, 1:] = px[:, :-1]                       # left
        b = np.zeros_like(px)
        b[1:, :] = px[:-1, :]                       # up
        c = np.zeros_like(px)
        c[1:, 1:] = px[:-1, :-1]                    # up-left
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        paeth = np.where((pa <= pb) & (pa <= pc), a,
                         np.where(pb <= pc, b, c))
        preds = (np.zeros_like(px), a, b, (a + b) >> 1, paeth)
        ft = (np.arange(h) % 5)
        pred = np.choose(ft[:, None], preds)
        filtered = ((px - pred) & 0xFF).astype(np.uint8)
        raw = np.hstack([ft[:, None].astype(np.uint8),
                         filtered]).tobytes()
    else:
        raw = b""

    def chunk(typ: bytes, data: bytes) -> bytes:
        import zlib as _z
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", _z.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def png_decode_features(media: DataFrame) -> DataFrame:
    """REAL COMPRESSED image decode, pure stdlib: PNG via ``zlib``.

    Closes the module's compressed-format gap for images without any
    external codec library — DEFLATE decompression IS a real
    compression codec and ships in the stdlib. Each payload is
    containerized as an adaptively-filtered grayscale PNG
    (``_encode_png``) and decoded back the real way: signature check,
    chunk walk with CRC32 verification on every chunk, IHDR
    validation, IDAT concatenation + ``zlib.decompress``, then full
    scanline reconstruction for all five PNG filter types (the
    encoder cycles through them, so every branch executes on every
    blob of 5+ rows). Same Arrow-batched mapInPandas shape as the
    other codecs. JPEG/H.264/MP3 remain external-library-blocked.

    Oracle-able exactly like ``bmp_decode_features``: the
    reconstructed pixels are the payload bytes plus zero padding to a
    full last row, so dims and pixel stats are SQL-expressible over
    the text's byte values — the oracle proving, end to end, that
    compress -> CRC -> decompress -> unfilter is lossless.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "bit_depth",
                                   "color_type", "n_px", "max_px", "mean_px")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                w, h, bd, ct, px = _decode_png(_encode_png(bytes(payload)))
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["bit_depth"].append(bd)
                out["color_type"].append(ct)
                out["n_px"].append(len(px))
                out["max_px"].append(max(px) if px else 0)
                out["mean_px"].append(sum(px) / len(px) if px else 0.0)
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=PNG_SCHEMA)


def _decode_png(blob: bytes) -> tuple[int, int, int, int, bytes]:
    """The real PNG decode used by the kernel, factored out so tests
    can drive it on corrupted streams directly. Returns
    (width, height, bit_depth, color_type, pixels)."""
    import zlib
    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    pos, idat = 8, b""
    w = h = bd = ct = None
    while pos < len(blob):
        ln, typ = struct.unpack_from(">I4s", blob, pos)
        data = blob[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + ln)
        if crc != (zlib.crc32(typ + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk CRC mismatch in {typ!r}")
        if typ == b"IHDR":
            w, h, bd, ct, comp, filt, ilace = struct.unpack(">IIBBBBB", data)
            if (bd, ct, comp, filt, ilace) != (8, 0, 0, 0, 0):
                raise ValueError("unsupported PNG variant")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    if len(raw) != h * (w + 1):
        raise ValueError("IDAT length != h*(w+1) scanlines")
    import numpy as np
    if h == 0:
        return w, h, bd, ct, b""
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, w + 1)
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int16)
    for r in range(h):
        ft = int(scan[r, 0])
        line = scan[r, 1:].astype(np.int16)
        # None/Sub/Up reconstruct vectorized (Sub's left-to-right
        # carry is a plain prefix sum mod 256); Average/Paeth read the
        # RECONSTRUCTED left neighbor through a nonlinear predictor,
        # so those rows walk pixel-by-pixel
        if ft == 0:
            rec = line
        elif ft == 1:
            rec = np.cumsum(line) & 0xFF
        elif ft == 2:
            rec = (line + prev) & 0xFF
        elif ft in (3, 4):
            rec = np.zeros(w, dtype=np.int16)
            for i in range(w):
                a = int(rec[i - 1]) if i else 0
                b, c = int(prev[i]), (int(prev[i - 1]) if i else 0)
                pred = (a + b) >> 1 if ft == 3 else _paeth(a, b, c)
                rec[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[r] = rec.astype(np.uint8)
        prev = rec.astype(np.int16)
    return w, h, bd, ct, out.tobytes()


AVI_SCHEMA = ("doc_id bigint, frame_idx int, n_frames int, width int, "
              "height int, us_per_frame int, max_px int, mean_px double")


def _encode_avi(payload: bytes) -> bytes:
    """Containerize payload bytes as a minimal uncompressed 8-bit AVI:
    RIFF('AVI ') > LIST(hdrl){avih, LIST(strl){strh, strf}} >
    LIST(movi){'00db' frame chunks}. Each frame is AVI_W*AVI_H raw
    pixels (one payload byte per pixel, last frame zero-padded)."""
    fs = AVI_W * AVI_H
    n_frames = max(1, (len(payload) + fs - 1) // fs) if payload else 0
    frames = [payload[i * fs:(i + 1) * fs].ljust(fs, b"\x00")
              for i in range(n_frames)]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    avih = struct.pack("<14I", AVI_FPS_US, fs * 25, 0, 0, n_frames, 0, 1,
                       fs, AVI_W, AVI_H, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<I", 0)
            + struct.pack("<2H10I", 0, 0, 0, 1, 25, 0, n_frames, fs, 0, 0,
                          fs, 0))
    strf = struct.pack("<IiiHHIIiiII", 40, AVI_W, AVI_H, 1, 8, 0, fs,
                       0, 0, 256, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode_frames(media: DataFrame,
                      every_n: int = AVI_EVERY_N) -> DataFrame:
    """REAL video decode via stdlib ``struct`` RIFF/AVI parsing.

    Completes the wave/BMP trilogy for the frame-fan-out shape: each
    payload is containerized as an uncompressed 8-bit AVI
    (``_encode_avi``) and decoded back by walking the actual RIFF
    chunk tree — RIFF magic + 'AVI ' form type, LIST(hdrl) > avih for
    frame count/dims/rate, LIST(movi) > '00db' chunks (even-byte
    padding honored) for the frames — inside the same Arrow-batched
    mapInPandas shape as the other kernels, emitting one row per
    every_n-th frame (1 row in -> N rows out).

    Oracle-able because each frame's pixels are a fixed 64-byte slice
    of the payload (last frame zero-padded): per-frame max/mean are
    exact byte math over that slice.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx", "n_frames",
                                    "width", "height", "us_per_frame",
                                    "max_px", "mean_px")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                blob = _encode_avi(bytes(payload))
                if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
                    raise ValueError("not a RIFF/AVI stream")
                pos, end = 12, 8 + struct.unpack_from("<I", blob, 4)[0]
                n_frames = w = h = uspf = None
                frames = []
                while pos + 8 <= end:
                    fourcc = blob[pos:pos + 4]
                    size = struct.unpack_from("<I", blob, pos + 4)[0]
                    body_at = pos + 8
                    if fourcc == b"LIST":
                        kind = blob[body_at:body_at + 4]
                        if kind in (b"hdrl", b"movi"):
                            pos = body_at + 4  # descend into this list
                            continue
                        pos = body_at + size + (size % 2)  # skip (e.g. strl)
                        continue
                    if fourcc == b"avih":
                        fields = struct.unpack_from("<14I", blob, body_at)
                        uspf, n_frames = fields[0], fields[4]
                        w, h = fields[8], fields[9]
                    elif fourcc == b"00db":
                        frames.append(blob[body_at:body_at + size])
                    pos = body_at + size + (size % 2)
                if n_frames is None or len(frames) != n_frames:
                    raise ValueError("AVI header/frame-count mismatch")
                for i in range(0, n_frames, every_n):
                    px = frames[i]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["n_frames"].append(n_frames)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["us_per_frame"].append(uspf)
                    rows["max_px"].append(max(px) if px else 0)
                    rows["mean_px"].append(sum(px) / len(px) if px else 0.0)
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, schema=AVI_SCHEMA)


RESIZED_SCHEMA = "doc_id bigint, media_type string, media binary, n_bytes bigint"


def resize_media(media: DataFrame, target_bytes: int = 256,
                 codec: Literal["fake", "real"] = "fake") -> DataFrame:
    """Resize/transcode kernel over mapInPandas (1 row in -> 1 row out).

    With a real codec this is image resize / audio downsample; the fake
    codec takes a deterministic byte stride so output size and schema
    behave like a real resizer (bounded by target_bytes).
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "real resize requires media libraries not bundled here; "
                    "use codec='fake' for the pipeline-shape path")
            out = []
            for b in pdf["media"]:
                stride = max(1, len(b) // target_bytes)
                out.append(bytes(b[::stride][:target_bytes]))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": "resized/" + pdf["media_type"],
                "media": out,
                "n_bytes": [len(b) for b in out],
            })

    return media.mapInPandas(kernel, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = ("doc_id bigint, frame_idx int, frame binary, "
                "n_frames int")


def sample_frames(media: DataFrame, frame_bytes: int = 1024,
                  every_n: int = 4,
                  codec: Literal["fake", "real"] = "fake") -> DataFrame:
    """Frame sampling kernel (1 row in -> N rows out) over mapInPandas.

    Models video frame extraction: the payload is treated as a sequence
    of fixed-size frames and every `every_n`-th frame is emitted as its
    own row — the fan-out shape (and the reason this is mapInPandas, not
    a scalar UDF). A real codec would seek keyframes instead.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "real frame extraction requires a video codec; "
                    "use codec='fake' for the pipeline-shape path")
            ids, idxs, frames, totals = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                n = max(1, (len(b) + frame_bytes - 1) // frame_bytes)
                for i in range(0, n, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(b[i * frame_bytes:(i + 1) * frame_bytes]))
                    totals.append(n)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame": frames, "n_frames": totals})

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)
