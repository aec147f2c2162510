"""Pure-Python QOI codec — the tenth REAL format (the "Quite OK Image
Format", qoiformat.org; public-domain one-page spec, 2022). Lossless
RGB/RGBA with five op codes:

    QOI_OP_RGB   11111110 r g b
    QOI_OP_RGBA  11111111 r g b a
    QOI_OP_INDEX 00iiiiii         — 64-slot running palette,
                                    hash = (3r + 5g + 7b + 11a) % 64
    QOI_OP_DIFF  01drdgdb         — per-channel -2..1 deltas (bias 2)
    QOI_OP_LUMA  10dddddd drdb    — dg -32..31 (bias 32), dr-dg / db-dg
                                    -8..7 (bias 8)
    QOI_OP_RUN   11rrrrrr         — run 1..62 of the previous pixel

All integer byte math (wrapping mod 256), so decode is exact and an
analytic SQL oracle over a closed-form pattern image replays the pixel
statistics bit-for-bit (the BMP/GIF discipline). The encoder is a
greedy spec encoder (run → index → diff → luma → rgb/rgba), the
decoder's exact inverse on every image. Malformed payloads (bad magic,
truncation, missing end marker, trailing bytes, pixel under/overrun)
raise QoiError — honestly rejected, never silently misdecoded.

Reference surface: the reference toolkit moves crawl payloads without
decoding them; media feature extraction is the extension family
(SURVEY.md §7.6)."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["QoiError", "encode_qoi", "decode_qoi", "pattern_qoi"]

_END = b"\x00" * 7 + b"\x01"


class QoiError(ValueError):
    """Malformed or out-of-envelope QOI payload."""


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(arr, channels: int = 3) -> bytes:
    """Encode an (h, w, 3|4) uint8 array. Greedy spec encoder: longest
    run, then palette hit, then DIFF, then LUMA, then raw RGB(A)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise QoiError("expected an (h, w, 3|4) array")
    if channels not in (3, 4) or channels != a.shape[2]:
        raise QoiError("channels must match the array depth")
    h, w = a.shape[:2]
    out = bytearray(b"qoif" + struct.pack(">IIBB", w, h, channels, 0))
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = a.reshape(-1, channels)
    for px in flat:
        r, g, b = int(px[0]), int(px[1]), int(px[2])
        al = int(px[3]) if channels == 4 else 255
        if (r, g, b, al) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hidx = _hash(r, g, b, al)
        if index[hidx] == (r, g, b, al):
            out.append(hidx)
        else:
            index[hidx] = (r, g, b, al)
            if al == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(
                        0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                    )
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr - dg <= 7
                    and -8 <= db - dg <= 7
                ):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes((0xFE, r, g, b))
            else:
                out += bytes((0xFF, r, g, b, al))
        pr, pg, pb, pa = r, g, b, al
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(payload: bytes):
    """Decode to ((h, w, channels) uint8 array). Strict: every byte of
    the stream must be consumed exactly, the end marker must follow the
    final pixel, and the pixel count must match the header."""
    if len(payload) < 14 + 8 or payload[:4] != b"qoif":
        raise QoiError("not a QOI payload")
    w, h, channels, colorspace = struct.unpack_from(">IIBB", payload, 4)
    if channels not in (3, 4):
        raise QoiError(f"bad channel count {channels}")
    if colorspace not in (0, 1):
        raise QoiError(f"bad colorspace {colorspace}")
    if w == 0 or h == 0 or w * h > 1 << 26:
        raise QoiError(f"bad dimensions {w}x{h}")
    n = w * h
    px = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    data = payload
    end_at = len(payload) - 8
    while i < n:
        if pos >= end_at:
            raise QoiError(
                f"pixel underrun: stream ended at {i}/{n} pixels"
            )
        byte = data[pos]
        pos += 1
        if byte == 0xFE:
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:
            r, g, b, a = (
                data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            )
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0b00:
                r, g, b, a = index[byte & 0x3F]
            elif tag == 0b01:
                r = (r + ((byte >> 4) & 3) - 2) % 256
                g = (g + ((byte >> 2) & 3) - 2) % 256
                b = (b + (byte & 3) - 2) % 256
            elif tag == 0b10:
                dg = (byte & 0x3F) - 32
                nxt = data[pos]
                pos += 1
                r = (r + dg + ((nxt >> 4) & 0xF) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (nxt & 0xF) - 8) % 256
            else:  # run
                run = (byte & 0x3F) + 1
                if i + run > n:
                    raise QoiError("run overflows the pixel count")
                px[i : i + run] = (r, g, b, a)
                i += run
                index[_hash(r, g, b, a)] = (r, g, b, a)
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        px[i] = (r, g, b, a)
        i += 1
    if data[pos:] != _END:
        raise QoiError(
            "missing or misplaced end marker / trailing bytes"
        )
    out = px.reshape(h, w, 4)
    return out[:, :, :channels].copy()


def pattern_qoi(seed: int, width: int, height: int) -> bytes:
    """Deterministic gradient fixture, same closed-form pixel pattern as
    pattern_bmp/pattern_png: gray value at (y, x) =
    (seed*31 + y*7 + x*13) % 256 in all three channels."""
    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    v = ((seed * 31 + y * 7 + x * 13) % 256).astype(np.uint8)
    return encode_qoi(np.repeat(v[:, :, None], 3, axis=2))
