"""Pure-NumPy PNG (RFC 2083 / ISO 15948) decoder + a minimal spec-driven
encoder for fixtures.

Public-spec implementation: the DEFLATE layer is Python's stdlib ``zlib``
(PNG's compression method 0 is exactly zlib RFC 1950), chunk framing and
the five scanline filters are implemented here from the spec. With this,
the PNG path of the multimodal family runs for real in this sandbox —
after round 5's T.81 JPEG decoder, only genuinely library-bound codecs
(MP3, H.264) remain gated in multimodal.py.

Supported: 8-bit samples, color types 0 (grayscale), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA); all five filter types; chunk CRC
validation; multiple IDAT chunks. Not supported (raises ``PngError``):
bit depths other than 8, Adam7 interlacing.

Decode cost shape: zlib inflate is C-speed; unfiltering loops rows, and
within a row filters 0 (None), 1 (Sub: a strided mod-256 cumsum) and
2 (Up) are fully vectorized. Filters 3 (Average) and 4 (Paeth) are
nonlinear left-to-right recurrences, so those rows fall back to a
per-pixel loop over ``bpp``-wide NumPy vectors — fine for the Arrow
batch sizes the mapInPandas stage hands a worker, and documented here so
nobody mistakes the fallback for a vectorization miss.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["PngError", "decode_png", "encode_png", "pattern_png"]

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type -> samples per pixel (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed or unsupported PNG payload."""


def _chunks(payload: bytes):
    """Yield (type, data) for every chunk, validating length and CRC."""
    if payload[:8] != _SIGNATURE:
        raise PngError("bad PNG signature")
    pos = 8
    n = len(payload)
    while pos < n:
        if pos + 8 > n:
            raise PngError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > n:
            raise PngError(f"truncated {ctype!r} chunk")
        data = payload[pos + 8 : end]
        (crc,) = struct.unpack(">I", payload[end : end + 4])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype!r} chunk")
        yield ctype, data
        pos = end + 4
        if ctype == b"IEND":
            return
    raise PngError("missing IEND chunk")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PaethPredictor over int16 vectors (spec section 6.6)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters; raw is (height, 1+stride) uint8
    with the filter byte leading each row. Returns (height, stride)."""
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(raw[y, 0])
        line = raw[y, 1:]
        if ftype == 0:  # None
            recon = line.copy()
        elif ftype == 1:  # Sub: recon[i] = line[i] + recon[i-bpp]
            # mod-256 prefix sum along each bpp-strided lane
            recon = line.copy()
            lanes = recon[: (stride // bpp) * bpp].reshape(-1, bpp)
            np.cumsum(lanes, axis=0, dtype=np.uint8, out=lanes)
        elif ftype == 2:  # Up
            recon = line + prior
        elif ftype == 3:  # Average
            recon = np.empty(stride, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.int16)
            for i in range(0, stride, bpp):
                avg = (left + prior[i : i + bpp].astype(np.int16)) >> 1
                left = (line[i : i + bpp] + avg).astype(np.uint8)
                recon[i : i + bpp] = left
                left = left.astype(np.int16)
        elif ftype == 4:  # Paeth
            recon = np.empty(stride, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.uint8)
            upleft = np.zeros(bpp, dtype=np.uint8)
            for i in range(0, stride, bpp):
                up = prior[i : i + bpp]
                recon[i : i + bpp] = line[i : i + bpp] + _paeth(left, up, upleft)
                left = recon[i : i + bpp]
                upleft = up
        else:
            raise PngError(f"unknown filter type {ftype} on row {y}")
        out[y] = recon
        prior = recon
    return out


# Adam7 pass grid: (x0, y0, dx, dy) per pass, spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _adam7_passes(width: int, height: int):
    """Yield (x0, y0, dx, dy, pw, ph) for every NON-EMPTY pass — empty
    passes contribute no scanlines at all (not even filter bytes)."""
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            yield x0, y0, dx, dy, pw, ph


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG payload: (H, W) for grayscale, (H, W, C) otherwise —
    uint8 at depth 8, uint16 at depth 16 (big-endian samples; the
    bytewise filters run at bpp = 2·channels). Palette images expand to
    RGB. Handles both sequential and Adam7-interlaced streams (each
    interlace pass is an independently-filtered sub-image scattered
    onto the x0::dx, y0::dy grid)."""
    header = None
    palette = None
    idat = []
    for ctype, data in _chunks(bytes(payload)):
        if ctype == b"IHDR":
            if header is not None:
                raise PngError("duplicate IHDR")
            if len(data) != 13:
                raise PngError(f"IHDR length {len(data)} != 13")
            header = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if len(data) == 0 or len(data) % 3:
                raise PngError(f"PLTE length {len(data)} not a multiple of 3")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if header is None:
        raise PngError("missing IHDR")
    width, height, depth, color, comp, filt, interlace = header
    if comp != 0 or filt != 0:
        raise PngError("unknown compression/filter method")
    if interlace not in (0, 1):
        raise PngError(f"unknown interlace method {interlace}")
    if depth not in (8, 16):
        raise PngError(f"bit depth {depth} not supported (8/16 only)")
    if color not in _CHANNELS:
        raise PngError(f"unknown color type {color}")
    if depth == 16 and color == 3:
        raise PngError("16-bit palette images are not legal PNG")
    if width == 0 or height == 0:
        raise PngError("zero-dimension image")
    channels = _CHANNELS[color]
    # filters are defined BYTE-wise with bpp = bytes per complete pixel
    # (RFC 2083 §6.2) — at depth 16 each sample is two big-endian bytes
    bpp = channels * (depth // 8)
    stride = width * bpp
    if interlace == 0:
        expected = (stride + 1) * height
    else:
        expected = sum(
            (pw * bpp + 1) * ph
            for _x0, _y0, _dx, _dy, pw, ph in _adam7_passes(width, height)
        )
    try:
        # bound the inflate at expected+1 bytes: a crafted IDAT must not
        # be able to balloon memory (the decode stage quarantines bad
        # blobs per-row at scale; it must not be DoS-able by one)
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected + 1)
    except zlib.error as exc:
        raise PngError(f"IDAT inflate failed: {exc}") from exc
    if len(raw) != expected or not d.eof or d.unconsumed_tail:
        got = f"> {expected}" if d.unconsumed_tail else str(len(raw))
        raise PngError(f"decompressed size {got} != expected {expected}")
    if interlace == 0:
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(
            height, stride + 1
        )
        img = _unfilter(rows, height, stride, bpp)
    else:
        # each Adam7 pass is an independently-filtered sub-image; the
        # per-pass unfilter is the SAME kernel, prior reset per pass
        img = np.zeros((height, stride), dtype=np.uint8)
        full = img.reshape(height, width, bpp)
        off = 0
        buf = np.frombuffer(raw, dtype=np.uint8)
        for x0, y0, dx, dy, pw, ph in _adam7_passes(width, height):
            pstride = pw * bpp
            size = (pstride + 1) * ph
            rows = buf[off : off + size].reshape(ph, pstride + 1)
            off += size
            sub = _unfilter(rows, ph, pstride, bpp).reshape(ph, pw, bpp)
            full[y0::dy, x0::dx, :] = sub
    if color == 3:
        if palette is None:
            raise PngError("palette image missing PLTE")
        if int(img.max(initial=0)) >= len(palette):
            raise PngError("palette index out of range")
        return palette[img.reshape(height, width)]
    if depth == 16:
        by = img.reshape(height, width, channels, 2)
        img16 = (by[..., 0].astype(np.uint16) << 8) | by[..., 1]
        return img16[:, :, 0] if channels == 1 else img16
    if channels == 1:
        return img.reshape(height, width)
    return img.reshape(height, width, channels)


# ---------------------------------------------------------------------------
# Minimal encoder (fixtures): forward-filters each scanline, deflates.


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_row(
    ftype: int, line: np.ndarray, prior: np.ndarray, bpp: int
) -> np.ndarray:
    """Apply filter ``ftype`` to a reconstructed scanline (spec 6.5-6.6)."""
    left = np.zeros_like(line)
    left[bpp:] = line[:-bpp]
    upleft = np.zeros_like(prior)
    upleft[bpp:] = prior[:-bpp]
    if ftype == 0:
        return line.copy()
    if ftype == 1:
        return line - left
    if ftype == 2:
        return line - prior
    if ftype == 3:
        avg = (left.astype(np.int16) + prior.astype(np.int16)) >> 1
        return (line.astype(np.int16) - avg).astype(np.uint8)
    if ftype == 4:
        return line - _paeth(left, prior, upleft)
    raise PngError(f"unknown filter type {ftype}")


def encode_png(arr, filters=None, level: int = 6, interlace: bool = False) -> bytes:
    """Encode a uint8 array — (H, W) gray or (H, W, 3/4) color — as an
    8-bit PNG (a uint16 array encodes as 16-bit big-endian samples),
    sequential or Adam7-interlaced. ``filters`` picks the
    filter type per row: an int, a sequence of ints indexed by DISPLAY
    row (length == image height, also under interlace — each display
    row keeps its designated filter in whichever pass stores it), or
    None (default: cycle ``y % 5`` within each stored image so a
    round-trip exercises every filter path)."""
    a0 = np.asarray(arr)
    depth = 16 if a0.dtype == np.uint16 else 8
    a = a0 if depth == 16 else np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, channels = 0, 1
        img3 = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        color = {2: 4, 3: 2, 4: 6}[a.shape[2]]
        channels = a.shape[2]
        img3 = a
    else:
        raise PngError(f"unsupported array shape {a.shape}")
    height, width = img3.shape[:2]
    if depth == 16:
        # big-endian sample bytes; the filter pipeline below is bytewise
        img3 = (
            img3.astype(">u2").view(np.uint8).reshape(height, width, -1)
        )
    bpp = channels * (depth // 8)

    if filters is not None and not isinstance(filters, int):
        filters = list(filters)
        if len(filters) != height:
            raise PngError("filters sequence length != height")

    def ftype_for(display_y: int, pass_y: int) -> int:
        if filters is None:
            return pass_y % 5  # cycle within the stored image
        if isinstance(filters, int):
            return filters
        return filters[display_y]

    def filter_image(sub: np.ndarray, display_rows) -> bytes:
        h, w = sub.shape[:2]
        flat = sub.reshape(h, w * bpp)
        body = bytearray()
        prior = np.zeros(w * bpp, dtype=np.uint8)
        for y in range(h):
            ft = ftype_for(display_rows[y], y)
            body.append(ft)
            body.extend(_filter_row(ft, flat[y], prior, bpp).tobytes())
            prior = flat[y]
        return bytes(body)

    if not interlace:
        body = filter_image(img3, range(height))
    else:
        body = b"".join(
            filter_image(
                np.ascontiguousarray(img3[y0::dy, x0::dx]),
                range(y0, height, dy),
            )
            for x0, y0, dx, dy, _pw, _ph in _adam7_passes(width, height)
        )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color, 0, 0,
        1 if interlace else 0,
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(body, level))
        + _chunk(b"IEND", b"")
    )


def pattern_png(seed: int, width: int, height: int) -> bytes:
    """Deterministic grayscale fixture: pixel(y, x) = (seed*31 + y*7 +
    x*13) % 256, rows filtered on the ``y % 5`` cycle so decoding walks
    every filter type. The closed-form pixel values are what lets a SQL
    oracle predict the decode output analytically."""
    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    img = ((seed * 31 + y * 7 + x * 13) % 256).astype(np.uint8)
    return encode_png(img)


def pattern_png16(seed: int, width: int, height: int) -> bytes:
    """16-bit fixture: sample(y, x) = (seed*4099 + y*709 + x*1303)
    % 65536 — even seeds grayscale, odd seeds RGB with all channels
    equal (so the closed form predicts every channel), rows on the
    default y % 5 filter cycle at bpp 2 / 6 bytes. seed % 4 >= 2
    additionally stores the image Adam7-INTERLACED (per-pass bytewise
    unfilter at 16-bit bpp); decoded pixels are identical by
    construction, so one oracle certifies both storage orders."""
    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    v = ((seed * 4099 + y * 709 + x * 1303) % 65536).astype(np.uint16)
    interlace = seed % 4 >= 2
    if seed % 2 == 0:
        return encode_png(v, interlace=interlace)
    return encode_png(
        np.repeat(v[:, :, None], 3, axis=2), interlace=interlace
    )
