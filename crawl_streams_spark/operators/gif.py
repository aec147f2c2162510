"""GIF codec in pure Python/NumPy — a real CompuServe GIF87a/89a
encoder + decoder with the genuine variable-width LZW entropy coder (no
codec library), completing the media family next to the T.81 JPEG
(operators/jpeg.py) and RFC 2083 PNG (operators/png.py) codecs.

Why this exists (reference parity): the reference crawl pipeline ships
image payloads around as opaque bytes (WARC records); this engine's
multimodal posture (SURVEY extension) is that decode happens INSIDE the
engine as Arrow-batched mapInPandas stages. GIF is the third real image
codec whose decode is value-oracle-checkable end to end: the palette is
synthesized grayscale and LZW is lossless, so decoded sample statistics
are closed-form in the generator seed (plans/q_crawl.py::
media_gif_features).

Spec: GIF89a specification (CompuServe 1990, public) — logical screen
descriptor, global color table, image descriptor, sub-blocked LZW data
with variable code width 3..12 bits, clear/EOI codes, LSB-first bit
packing. The LZW coder implements the GIF convention (code width grows
when the next free code would overflow it, NO "early change" — that is
TIFF's variant) and resets the table via a clear code when the 4096-code
space fills.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "GifError",
    "lzw_encode",
    "lzw_decode",
    "encode_gif",
    "decode_gif",
    "pattern_gif",
]

_MAX_CODE_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096 codes


class GifError(ValueError):
    """Malformed GIF payload (bad signature, truncated stream, bad LZW)."""


# ---------------------------------------------------------------------------
# LZW (GIF variant)


class _BitWriter:
    """LSB-first bit packer (GIF packs the low bit of each code first)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def done(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF LZW over a palette-index sequence → raw code bytes (without
    sub-block framing). Starts with a clear code; emits EOI last; resets
    the string table with a clear code when the 4096-code space fills —
    the table-reset path is exercised by tests with long low-palette
    streams.

    Code-width schedule: the decoder grows its read width off ITS table
    length, which trails the encoder's dictionary by exactly one entry at
    every data code except the final flush (where the decoder still adds
    a phantom entry the encoder never uses). Rather than re-deriving that
    off-by-one per site, the writer below simulates the decoder's counter
    verbatim (``dec_len``, bumped per data code after the first in each
    clear-segment, growth at ``dec_len >= 1 << width``) — the encoder's
    emit width is then correct by construction, including the EOI after a
    flush that tips the decoder over a width boundary."""
    if not 2 <= min_code_size <= 8:
        raise GifError(f"min_code_size must be 2..8, got {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _BitWriter()
    state = {"width": min_code_size + 1, "dec_len": eoi + 1, "first": True}

    def emit_data(code: int) -> None:
        w.put(code, state["width"])
        if state["first"]:
            state["first"] = False
            return
        if state["dec_len"] < _TABLE_LIMIT:
            state["dec_len"] += 1
            if (
                state["dec_len"] >= (1 << state["width"])
                and state["width"] < _MAX_CODE_WIDTH
            ):
                state["width"] += 1

    def emit_clear() -> None:
        w.put(clear, state["width"])
        state["width"] = min_code_size + 1
        state["dec_len"] = eoi + 1
        state["first"] = True

    emit_clear()
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    free = eoi + 1
    cur = b""
    for raw in indices:
        i = int(raw)
        if not 0 <= i < clear:
            raise GifError(f"palette index {i} out of range for {clear}")
        nxt = cur + bytes([i])
        if nxt in table:
            cur = nxt
            continue
        emit_data(table[cur])
        if free < _TABLE_LIMIT:
            table[nxt] = free
            free += 1
        else:
            # table full: reset so the stream never emits >12-bit codes
            emit_clear()
            table = {bytes([j]): j for j in range(clear)}
            free = eoi + 1
        cur = bytes([i])
    if cur:
        emit_data(table[cur])
    w.put(eoi, state["width"])
    return w.done()


def lzw_decode(
    data: bytes, min_code_size: int, max_symbols: int | None = None
) -> bytes:
    """Inverse of :func:`lzw_encode` — raw code bytes → index bytes.
    Implements the KwKwK first-unknown-code rule and the clear-code table
    reset; raises GifError on codes beyond the table, a stream that ends
    without EOI, or (when ``max_symbols`` is given) output exceeding the
    declared size — the decompression-bomb gate: LZW amplifies ~2700×,
    so a crafted stream for a "1×1" image must fail FAST in the error
    column, not balloon executor memory before the post-hoc size check
    (the bounded-inflate discipline of operators/png.py)."""
    if not 2 <= min_code_size <= 8:
        raise GifError(f"min_code_size must be 2..8, got {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise GifError("LZW stream ended without EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise GifError(f"first code {code} not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            raise GifError(f"LZW code {code} beyond table size {len(table)}")
        out.extend(entry)
        if max_symbols is not None and len(out) > max_symbols:
            raise GifError(
                f"LZW output exceeds declared {max_symbols} pixels"
            )
        if prev is not None and len(table) < _TABLE_LIMIT:
            table.append(prev + entry[:1])
            if len(table) >= (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry


# ---------------------------------------------------------------------------
# Container


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(arr, interlace: bool = False) -> bytes:
    """Encode a (h, w) uint8 index array as a single-frame GIF89a with a
    256-entry grayscale global color table (index i → RGB (i, i, i)).
    ``interlace`` stores rows in the spec's 4-pass order and sets the
    descriptor flag."""
    px = np.asarray(arr, dtype=np.uint8)
    if px.ndim != 2:
        raise GifError(f"expected (h, w) index array, got shape {px.shape}")
    h, wth = px.shape
    if h == 0 or wth == 0 or h > 0xFFFF or wth > 0xFFFF:
        raise GifError(f"bad dimensions {wth}x{h}")
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, 8-bit color resolution,
    # 256-entry table (2^(7+1))
    out += struct.pack("<HHBBB", wth, h, 0xF7, 0, 0)
    gct = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += gct.tobytes()
    ipacked = 0x40 if interlace else 0
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, wth, h, ipacked)
    out.append(8)  # LZW minimum code size
    stream = px[_interlace_order(h)] if interlace else px
    out += _sub_blocks(lzw_encode(stream.reshape(-1).tolist(), 8))
    out.append(0x3B)  # trailer
    return bytes(out)


def _read_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise GifError("truncated sub-block stream")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(payload):
            raise GifError("truncated sub-block")
        out += payload[pos : pos + n]
        pos += n


def _interlace_order(height: int) -> "np.ndarray":
    """GIF 4-pass interlace row order (spec appendix E): rows are stored
    as passes 0::8, 4::8, 2::4, 1::2 — returns the display row index of
    each stored row."""
    return np.concatenate(
        [
            np.arange(0, height, 8),
            np.arange(4, height, 8),
            np.arange(2, height, 4),
            np.arange(1, height, 2),
        ]
    )


def decode_gif(payload: bytes):
    """Decode the first image of a GIF87a/89a payload → (pixels, palette):
    ``pixels`` an (h, w) uint8 index array, ``palette`` a (n, 3) uint8
    RGB table (local table wins over global, per spec). Extensions are
    skipped; interlaced images (the 4-pass row interleave) are
    de-interlaced on decode."""
    if len(payload) < 13:
        raise GifError("payload shorter than GIF header")
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError(f"bad signature {payload[:6]!r}")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise GifError("truncated global color table")
        palette = np.frombuffer(
            payload[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    while True:
        if pos >= len(payload):
            raise GifError("no image descriptor before end of payload")
        introducer = payload[pos]
        pos += 1
        if introducer == 0x3B:  # trailer
            raise GifError("trailer reached without an image")
        if introducer == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                raise GifError("truncated extension")
            pos += 1
            _, pos = _read_sub_blocks(payload, pos)
            continue
        if introducer != 0x2C:
            raise GifError(f"unexpected block introducer 0x{introducer:02x}")
        break
    if pos + 9 > len(payload):
        raise GifError("truncated image descriptor")
    left, top, iw, ih, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
    pos += 9
    if iw == 0 or ih == 0 or left + iw > sw or top + ih > sh:
        raise GifError(f"image {iw}x{ih}@{left},{top} outside screen {sw}x{sh}")
    interlaced = bool(ipacked & 0x40)
    if ipacked & 0x80:  # local color table
        n = 2 << (ipacked & 0x07)
        if pos + 3 * n > len(payload):
            raise GifError("truncated local color table")
        palette = np.frombuffer(
            payload[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    if palette is None:
        raise GifError("no color table (global absent, local absent)")
    if pos >= len(payload):
        raise GifError("missing LZW minimum code size")
    mcs = payload[pos]
    pos += 1
    data, pos = _read_sub_blocks(payload, pos)
    indices = lzw_decode(data, mcs, max_symbols=iw * ih)
    if len(indices) != iw * ih:
        raise GifError(
            f"decoded {len(indices)} indices for a {iw}x{ih} image"
        )
    px = np.frombuffer(indices, dtype=np.uint8)
    if int(px.max(initial=0)) >= palette.shape[0]:
        raise GifError("palette index beyond color table")
    img = px.reshape(ih, iw)
    if interlaced:
        out = np.empty_like(img)
        out[_interlace_order(ih)] = img  # stored pass order → display rows
        img = out
    return img, palette


# ---------------------------------------------------------------------------
# Deterministic fixture


def pattern_gif(seed: int, width: int, height: int) -> bytes:
    """The shared deterministic test pattern (same closed form as
    operators/png.py::pattern_png): index(y, x) =
    (seed*31 + y*7 + x*13) % 256 — an analytic-oracle-friendly gradient
    whose LZW stream mixes literal and multi-symbol codes."""
    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    return encode_gif(((seed * 31 + y * 7 + x * 13) % 256).astype(np.uint8))
