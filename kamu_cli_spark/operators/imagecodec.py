"""Dependency-free decoders for two trivial image formats.

The container has no media libraries (PIL/ffmpeg), but two formats are
simple enough to parse from their public specs in ~100 lines — the same
spirit as the dependency-free shapefile reader
(kamu_cli_spark/sources/shapefile.py):

- **PPM** (netpbm): ``P6`` binary and ``P3`` ASCII RGB, maxval <= 255.
- **BMP**: ``BM`` + BITMAPINFOHEADER (>=40 bytes), 24 bpp, BI_RGB
  (uncompressed), bottom-up or top-down rows, 4-byte row padding.

These give the multimodal operators (operators/multimodal.py) a REAL
in-environment decode path: payloads that sniff as PPM/BMP decode to an
HxWx3 uint8 array; everything else falls back to the deterministic
digest stub. The reference has no twin (media decode is an extension
surface there); this exists so the Spark-side decode plumbing is
exercised on real bytes, not only on stubs.
"""

from __future__ import annotations

import struct

import numpy as np


class ImageDecodeError(Exception):
    pass


def sniff(payload: bytes | None) -> str | None:
    """'ppm' | 'bmp' | None for an (undecoded) payload."""
    if not payload or len(payload) < 16:
        return None
    if payload[:2] in (b"P6", b"P3") and payload[2:3] in b" \t\r\n":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    return None


def _ppm_tokens(buf: bytes, n: int, start: int = 0):
    """First `n` whitespace-separated tokens, skipping '#' comments;
    returns (tokens, offset one whitespace byte past the last token)."""
    toks: list[bytes] = []
    i, end = start, len(buf)
    while len(toks) < n:
        while i < end and buf[i : i + 1].isspace():
            i += 1
        if i < end and buf[i : i + 1] == b"#":
            while i < end and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < end and not buf[j : j + 1].isspace() and buf[j : j + 1] != b"#":
            j += 1
        if j == i:
            raise ImageDecodeError("truncated PPM header")
        toks.append(buf[i:j])
        i = j
    if i >= end or not buf[i : i + 1].isspace():
        raise ImageDecodeError("PPM header not followed by whitespace")
    return toks, i + 1


def decode_ppm(payload: bytes) -> np.ndarray:
    """PPM -> HxWx3 uint8 (P6 binary or P3 ASCII, maxval <= 255)."""
    magic = payload[:2]
    if magic not in (b"P6", b"P3"):
        raise ImageDecodeError(f"not a PPM payload: {magic!r}")
    (w_b, h_b, max_b), off = _ppm_tokens(payload, 3, start=2)
    w, h, maxval = int(w_b), int(h_b), int(max_b)
    if w <= 0 or h <= 0 or not (0 < maxval <= 255):
        raise ImageDecodeError(f"unsupported PPM geometry {w}x{h} maxval={maxval}")
    n = w * h * 3
    if magic == b"P6":
        data = payload[off : off + n]
        if len(data) < n:
            raise ImageDecodeError("truncated P6 pixel data")
        px = np.frombuffer(data, dtype=np.uint8, count=n)
    else:  # P3: ASCII sample values (comments legal here too)
        body = b"\n".join(
            ln.split(b"#", 1)[0] for ln in payload[off - 1 :].splitlines()
        )
        vals = body.split()
        if len(vals) < n:
            raise ImageDecodeError("truncated P3 pixel data")
        px = np.array([int(v) for v in vals[:n]], dtype=np.uint8)
    if maxval != 255:  # rescale to full range like stb/netpbm do
        px = ((px.astype(np.uint16) * 255) // maxval).astype(np.uint8)
    return px.reshape(h, w, 3)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> HxWx3 uint8 (RGB)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ImageDecodeError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ImageDecodeError(f"unsupported DIB header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if planes != 1 or bpp != 24 or compression != 0:
        raise ImageDecodeError(
            f"only 24bpp BI_RGB supported (planes={planes} bpp={bpp} "
            f"compression={compression})"
        )
    bottom_up, h = h_raw > 0, abs(h_raw)
    if w <= 0 or h == 0:
        raise ImageDecodeError(f"bad BMP geometry {w}x{h_raw}")
    row_bytes = ((bpp * w + 31) // 32) * 4
    need = data_off + row_bytes * h
    if len(payload) < need:
        raise ImageDecodeError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def decode(payload: bytes) -> np.ndarray:
    kind = sniff(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    raise ImageDecodeError("payload is not a decodable PPM/BMP image")


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (pixel-center sampling) -> HxWx3 uint8."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return img[ys][:, xs]


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 -> P6 bytes (round-trip aid for tests/fixtures)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24bpp BI_RGB bottom-up BMP bytes."""
    h, w = img.shape[:2]
    row_bytes = ((24 * w + 31) // 32) * 4
    pad = row_bytes - w * 3
    body = bytearray()
    bgr = np.ascontiguousarray(img[:, :, ::-1], dtype=np.uint8)
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].tobytes() + b"\x00" * pad
    data_off = 14 + 40
    file_size = data_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + bytes(body)
