"""BMP codec in pure Python/NumPy — a real Windows DIB (device-
independent bitmap) encoder + decoder, the sixth REAL codec in the media
family next to WAV, PPM, baseline JPEG (operators/jpeg.py), PNG
(operators/png.py) and GIF (operators/gif.py).

Why this exists (reference parity): the reference crawl pipeline ships
image payloads around as opaque bytes (WARC records); this engine's
multimodal posture (SURVEY extension) is that decode happens INSIDE the
engine as Arrow-batched mapInPandas stages. BMP is uncompressed, so the
decode is trivially lossless and the decoded sample statistics are
closed-form in the generator seed — the strongest possible value gate
(plans/q_crawl.py::media_bmp_features).

Spec: the Windows BMP file format (public: BITMAPFILEHEADER +
BITMAPINFOHEADER as documented by Microsoft and in the ubiquitous
file-format references). Supported on decode: BI_RGB (uncompressed)
at 8 bits/pixel (palettized, BGRA color table) and 24 bits/pixel
(BGR), bottom-up (positive biHeight) and top-down (negative biHeight)
row order, 4-byte-aligned rows. Everything else (RLE, 1/4/16/32-bit,
BITFIELDS, OS/2 headers) raises BmpError — honestly rejected, never
silently misdecoded.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["BmpError", "encode_bmp", "decode_bmp", "pattern_bmp"]

_FILE_HEADER = struct.Struct("<2sIHHI")  # bfType, bfSize, res, res, bfOffBits
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER (40 bytes)
_BI_RGB = 0


class BmpError(ValueError):
    """Malformed or unsupported BMP payload."""


def _row_stride(width: int, bits: int) -> int:
    return ((width * bits + 31) // 32) * 4


def encode_bmp(
    arr: "np.ndarray",
    bits: int = 24,
    top_down: bool = False,
) -> bytes:
    """Encode an image as an uncompressed BI_RGB BMP.

    ``bits=24``: ``arr`` is (h, w, 3) uint8 RGB, stored as padded BGR
    rows. ``bits=8``: ``arr`` is (h, w) uint8 palette indices, stored
    with a 256-entry grayscale BGRA color table (index i → (i, i, i)).
    ``top_down`` stores rows in natural order with negative biHeight;
    the default is the classic bottom-up layout.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if bits == 24:
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("24-bit BMP needs an (h, w, 3) array")
        h, w = a.shape[:2]
        rows = a[:, :, ::-1]  # RGB -> BGR
        palette = b""
        n_colors = 0
    elif bits == 8:
        if a.ndim != 2:
            raise ValueError("8-bit BMP needs an (h, w) index array")
        h, w = a.shape
        rows = a[:, :, None]
        gray = np.arange(256, dtype=np.uint8)
        palette = (
            np.stack([gray, gray, gray, np.zeros(256, dtype=np.uint8)], axis=1)
            .tobytes()
        )
        n_colors = 256
    else:
        raise ValueError(f"unsupported encode bit depth {bits}")
    stride = _row_stride(w, bits)
    used = w * (bits // 8)
    body = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    pad = b"\x00" * (stride - used)
    for y in order:
        body += rows[y].tobytes() + pad
    off = _FILE_HEADER.size + _INFO_HEADER.size + len(palette)
    info = _INFO_HEADER.pack(
        _INFO_HEADER.size,
        w,
        -h if top_down else h,
        1,
        bits,
        _BI_RGB,
        len(body),
        2835,
        2835,
        n_colors,
        0,
    )
    head = _FILE_HEADER.pack(b"BM", off + len(body), 0, 0, off)
    return head + info + palette + bytes(body)


def decode_bmp(payload: bytes) -> "np.ndarray":
    """Decode a BI_RGB BMP to an (h, w, 3) uint8 RGB array.

    Accepts 8-bit palettized (any BGRA table) and 24-bit BGR payloads,
    bottom-up or top-down. Raises BmpError on anything malformed or
    outside that envelope, including truncated pixel data and palette
    indices past the declared table."""
    if len(payload) < _FILE_HEADER.size + _INFO_HEADER.size:
        raise BmpError("truncated header")
    magic, _fsize, _r1, _r2, off = _FILE_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise BmpError(f"bad magic {magic!r}")
    (
        hsize,
        w,
        h_signed,
        planes,
        bits,
        compression,
        _img_size,
        _xppm,
        _yppm,
        n_colors,
        _important,
    ) = _INFO_HEADER.unpack_from(payload, _FILE_HEADER.size)
    if hsize != _INFO_HEADER.size:
        raise BmpError(f"unsupported DIB header size {hsize}")
    if planes != 1:
        raise BmpError(f"bad plane count {planes}")
    if compression != _BI_RGB:
        raise BmpError(f"unsupported compression {compression}")
    if bits not in (8, 24):
        raise BmpError(f"unsupported bit depth {bits}")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise BmpError(f"bad dimensions {w}x{h_signed}")
    if bits == 8:
        n_colors = n_colors or 256
        pal_off = _FILE_HEADER.size + _INFO_HEADER.size
        pal_end = pal_off + 4 * n_colors
        if pal_end > len(payload) or pal_end > off:
            raise BmpError("truncated color table")
        pal = np.frombuffer(payload, dtype=np.uint8, count=4 * n_colors,
                            offset=pal_off).reshape(n_colors, 4)
        palette_rgb = pal[:, 2::-1]  # BGRA -> RGB
        # (an off inside the palette is already rejected above by the
        # pal_end > off check — no separate overlap guard needed here)
    elif off < _FILE_HEADER.size + _INFO_HEADER.size:
        # a bfOffBits pointing inside the headers would decode header
        # bytes as pixels — reject, never silently misdecode
        raise BmpError(
            f"pixel offset {off} overlaps headers "
            f"(min {_FILE_HEADER.size + _INFO_HEADER.size})"
        )
    stride = _row_stride(w, bits)
    need = off + stride * h
    if need > len(payload):
        raise BmpError(
            f"truncated pixel data: need {need} bytes, have {len(payload)}"
        )
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)
    if not top_down:
        raw = raw[::-1]
    if bits == 24:
        bgr = raw[:, : w * 3].reshape(h, w, 3)
        return np.ascontiguousarray(bgr[:, :, ::-1])
    idx = raw[:, :w]
    if int(idx.max(initial=0)) >= n_colors:
        raise BmpError("palette index out of range")
    return np.ascontiguousarray(palette_rgb[idx])


def pattern_bmp(seed: int, width: int, height: int, bits: int = 8) -> bytes:
    """Deterministic gradient test image, same closed-form pixel pattern
    as pattern_png/pattern_gif: sample (y, x) = (seed*31 + y*7 + x*13)
    % 256. 8-bit form uses the grayscale palette (all channels equal);
    24-bit form writes the same gray value to all three channels — so
    both predict identical RGB statistics analytically."""
    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    v = ((seed * 31 + y * 7 + x * 13) % 256).astype(np.uint8)
    if bits == 8:
        return encode_bmp(v, bits=8, top_down=bool(seed % 2))
    rgb = np.repeat(v[:, :, None], 3, axis=2)
    return encode_bmp(rgb, bits=24, top_down=bool(seed % 2))
