"""Baseline TIFF codec in pure Python/NumPy — uncompressed and PackBits
strips, the eleventh REAL codec in the media family (WAV, G.711, IMA/MS
ADPCM, FLAC, PPM, JPEG, PNG, GIF, BMP, QOI, now TIFF).

Why this exists (reference parity): crawl logs in the wild carry
``image/tiff`` mimetypes — TIFF is the last major legacy web image
format this engine could not decode; the multimodal posture (SURVEY
extension) is that decode happens INSIDE the engine as Arrow-batched
mapInPandas stages, so the payloads must parse here, not in a library
the container doesn't have.

Spec: TIFF 6.0 (public Adobe/ISO 12639 specification). Supported on
decode — honestly bounded, everything else raises ``TiffError``, never
a silent misdecode:

- both byte orders (``II`` little-endian, ``MM`` big-endian);
- the FIRST IFD only (multi-page files reject rather than silently
  decoding page 1 as "the" image);
- 8 bits per sample, 1 (grayscale) or 3 (RGB) samples per pixel,
  chunky planar configuration;
- PhotometricInterpretation 0 (WhiteIsZero — inverted on decode),
  1 (BlackIsZero) and 2 (RGB);
- Compression 1 (none), 32773 (PackBits — the spec's byte-oriented
  run-length scheme: n in [0,127] copies n+1 literals, n in [-127,-1]
  repeats the next byte 1-n times, -128 is a no-op) and 5 (LZW, §13:
  MSB-first code packing, ClearCode 256 / EOI 257, 9→12-bit codes with
  the TIFF "early change" — the width grows one code EARLIER than
  classic LZW, at table size 2^w−1; the encoder keeps a simulated
  decoder counter so both sides bump at the same code by construction,
  the gif.py width-schedule lesson), each decompressed per strip with
  exact expected-size accounting (overrun AND underrun are errors);
- TILED organization (tags 322-325, §15): 16-multiple tile dims,
  left-to-right top-to-bottom, edge tiles stored padded and cropped on
  decode; compression and predictor apply per tile;
- any RowsPerStrip / strip count (offsets and byte counts validated
  against the payload before any allocation; declared dimensions are
  bounded by what the payload could possibly encode, so a forged
  header cannot allocate unbounded memory — the decoder-totality-fuzz
  discipline).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "TiffError",
    "encode_tiff",
    "decode_tiff",
    "pattern_tiff",
    "packbits_encode",
    "packbits_decode",
    "lzw_encode",
    "lzw_decode",
]

_COMPRESSION_NONE = 1
_COMPRESSION_LZW = 5
_COMPRESSION_PACKBITS = 32773

_LZW_CLEAR, _LZW_EOI, _LZW_FIRST = 256, 257, 258
_LZW_MAX_WIDTH = 12
# encoder clears before the table is literally full (the spec's
# recommendation), leaving headroom below 2^12
_LZW_CLEAR_AT = 4094

# tag ids (TIFF 6.0 baseline)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325

_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}


class TiffError(ValueError):
    """Malformed or unsupported TIFF payload."""


def packbits_encode(data: bytes) -> bytes:
    """PackBits (TIFF 6.0 §9): greedy — runs of >=3 identical bytes
    become replicate packets, everything else literal packets."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # measure the run starting here
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        # literal stretch: until the next >=3 run or 128 bytes
        lit = i
        while (
            lit < n
            and lit - i < 128
            and not (
                lit + 2 < n
                and data[lit] == data[lit + 1] == data[lit + 2]
            )
        ):
            lit += 1
        out += bytes([lit - i - 1]) + data[i:lit]
        i = lit
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Decode exactly ``expected`` bytes; overrun, underrun, and a
    replicate packet missing its value byte all raise TiffError."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        ctl = data[i]
        i += 1
        if ctl == 128:  # no-op
            continue
        if ctl < 128:  # literal: ctl+1 bytes follow
            need = ctl + 1
            if i + need > n:
                raise TiffError("PackBits literal packet truncated")
            out += data[i : i + need]
            i += need
        else:  # replicate: next byte repeated 257-ctl times
            if i >= n:
                raise TiffError("PackBits replicate packet truncated")
            out += bytes([data[i]]) * (257 - ctl)
            i += 1
    if len(out) != expected:
        raise TiffError(
            f"PackBits strip decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def _lzw_width(next_entry: int) -> int:
    """Code width for the next read/emit given the DECODER's next free
    table index — the TIFF early-change schedule: grow at 2^w−1, one
    code earlier than classic LZW's 2^w."""
    width = 9
    while next_entry >= (1 << width) - 1 and width < _LZW_MAX_WIDTH:
        width += 1
    return width


class _MsbWriter:
    """MSB-first bit packer (TIFF §13; GIF packs LSB-first)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(self.buf)


def lzw_encode(data: bytes) -> bytes:
    """TIFF LZW for one strip. Emit widths follow the SIMULATED decoder
    counter (``dec_next`` — what the decoder's next free entry will be
    when it extracts the code being emitted), so encoder and decoder
    bump at the same code by construction whatever the off-by-one
    folklore says; the early-change rule itself lives in _lzw_width."""
    w = _MsbWriter()
    state = {"dcodes": 0}  # data codes emitted since the last clear

    def width_now() -> int:
        # decoder's next free entry when it extracts the code emitted
        # now: it adds one entry per data code after its first
        return _lzw_width(_LZW_FIRST + max(0, state["dcodes"] - 1))

    def put_data(code: int) -> None:
        w.put(code, width_now())
        state["dcodes"] += 1

    def put_clear() -> None:
        w.put(_LZW_CLEAR, width_now())
        state["dcodes"] = 0

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_e = _LZW_FIRST
    put_clear()
    prev = b""
    for byte in data:
        cand = prev + bytes([byte])
        if cand in table:
            prev = cand
            continue
        put_data(table[prev])
        table[cand] = next_e
        next_e += 1
        if next_e == _LZW_CLEAR_AT:
            # flush the dangling byte under the old table, then reset —
            # the decoder mirrors the reset on the clear code
            put_data(byte)
            put_clear()
            table = {bytes([i]): i for i in range(256)}
            next_e = _LZW_FIRST
            prev = b""
        else:
            prev = bytes([byte])
    if prev:
        put_data(table[prev])
    w.put(_LZW_EOI, width_now())
    return w.done()


def lzw_decode(data: bytes, expected: int) -> bytes:
    """Decode one TIFF LZW strip to exactly ``expected`` bytes; overrun,
    underrun, codes past the table, a missing leading ClearCode, and
    table overflow without a clear all raise TiffError."""
    out = bytearray()
    table: list[bytes] | None = None
    next_d = _LZW_FIRST
    prev: bytes | None = None
    pos = 0  # bit position
    total_bits = 8 * len(data)
    while True:
        width = _lzw_width(next_d if table is not None else _LZW_FIRST)
        if pos + width > total_bits:
            raise TiffError("LZW strip ends without an EOI code")
        code = 0
        for _ in range(width):  # MSB-first extraction
            code = (code << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            next_d = _LZW_FIRST
            prev = None
            continue
        if code == _LZW_EOI:
            break
        if table is None:
            raise TiffError("LZW data code before the initial ClearCode")
        if prev is None:
            if code >= 256:
                raise TiffError(f"LZW first code {code} is not a literal")
            entry = table[code]
        else:
            if code < next_d:
                entry = table[code]
            elif code == next_d:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise TiffError(f"LZW code {code} past table end {next_d}")
            if next_d >= (1 << _LZW_MAX_WIDTH):
                raise TiffError("LZW table overflow without a clear code")
            table.append(prev + entry[:1])
            next_d += 1
        out += entry
        if len(out) > expected:
            raise TiffError(
                f"LZW strip decoded past expected size {expected}"
            )
        prev = entry
    if len(out) != expected:
        raise TiffError(
            f"LZW strip decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def encode_tiff(
    arr: "np.ndarray",
    photometric: str = "rgb",
    compression: str = "none",
    big_endian: bool = False,
    rows_per_strip: int = 0,
    predictor: int = 1,
    tile_size: tuple | None = None,
) -> bytes:
    """Encode an image as a baseline TIFF.

    ``photometric='rgb'``: ``arr`` is (h, w, 3) uint8. ``'gray'`` /
    ``'gray_inverted'``: (h, w) uint8 (the inverted form stores 255-v
    with PhotometricInterpretation 0 — WhiteIsZero). ``compression``:
    ``'none'`` or ``'packbits'``. ``rows_per_strip=0`` means one strip
    for the whole image. ``tile_size=(tw, th)`` stores TILES instead of
    strips (§15: dimensions multiples of 16, edge tiles zero-padded to
    full size, left-to-right top-to-bottom order)."""
    a = np.asarray(arr, dtype=np.uint8)
    if photometric == "rgb":
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("rgb TIFF needs an (h, w, 3) array")
        h, w = a.shape[:2]
        spp, pmi = 3, 2
    elif photometric in ("gray", "gray_inverted"):
        if a.ndim != 2:
            raise ValueError("gray TIFF needs an (h, w) array")
        h, w = a.shape
        spp = 1
        if photometric == "gray_inverted":
            a, pmi = 255 - a, 0
        else:
            pmi = 1
    else:
        raise ValueError(f"unknown photometric {photometric!r}")
    comps = {
        "none": _COMPRESSION_NONE,
        "packbits": _COMPRESSION_PACKBITS,
        "lzw": _COMPRESSION_LZW,
    }
    if compression not in comps:
        raise ValueError(f"unknown compression {compression!r}")
    comp = comps[compression]
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")
    if predictor == 2 and comp != _COMPRESSION_LZW:
        raise ValueError("predictor 2 is only supported with LZW")
    rps = rows_per_strip or h
    e = ">" if big_endian else "<"
    flat = a.reshape(h, w * spp)

    def pack_rows(rows):
        if predictor == 2:
            # horizontal differencing per row, per sample channel
            # (mod-256): raw[x] = v[x] - v[x-spp]
            d = rows.reshape(rows.shape[0], -1, spp).astype(np.int16)
            d[:, 1:, :] -= d[:, :-1, :].copy()
            rows = (d % 256).astype(np.uint8).reshape(rows.shape)
        raw = rows.tobytes()
        if comp == _COMPRESSION_PACKBITS:
            raw = packbits_encode(raw)
        elif comp == _COMPRESSION_LZW:
            raw = lzw_encode(raw)
        return raw

    strips = []
    if tile_size is None:
        for y0 in range(0, h, rps):
            strips.append(pack_rows(flat[y0 : y0 + rps]))
    else:
        tw, th = tile_size
        if tw % 16 or th % 16 or tw <= 0 or th <= 0:
            raise ValueError("tile dimensions must be multiples of 16")
        px = a.reshape(h, w, spp)
        for y0 in range(0, h, th):
            for x0 in range(0, w, tw):
                tile = np.zeros((th, tw, spp), dtype=np.uint8)
                sub = px[y0 : y0 + th, x0 : x0 + tw]
                tile[: sub.shape[0], : sub.shape[1]] = sub
                strips.append(pack_rows(tile.reshape(th, tw * spp)))
    n_strips = len(strips)

    # layout: header(8) | strip data | out-of-line values | IFD
    out = bytearray(struct.pack(e + "2sHI", b"MM" if big_endian else b"II",
                                42, 0))
    strip_offsets = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s

    extra = bytearray()  # out-of-line value area, filled as entries build
    entries = []

    def add(tag, typ, values):
        unit = _TYPE_SIZES[typ]
        code = "H" if typ == _TYPE_SHORT else "I"
        packed = struct.pack(f"{e}{len(values)}{code}", *values)
        if len(packed) <= 4:
            entries.append((tag, typ, len(values),
                            packed + b"\x00" * (4 - len(packed)), None))
        else:
            entries.append((tag, typ, len(values), None, bytes(packed)))
        del unit

    add(_T_WIDTH, _TYPE_LONG, [w])
    add(_T_LENGTH, _TYPE_LONG, [h])
    add(_T_BITS, _TYPE_SHORT, [8] * spp)
    add(_T_COMPRESSION, _TYPE_SHORT, [comp])
    add(_T_PHOTOMETRIC, _TYPE_SHORT, [pmi])
    if tile_size is None:
        add(_T_STRIP_OFFSETS, _TYPE_LONG, strip_offsets)
        add(_T_ROWS_PER_STRIP, _TYPE_LONG, [rps])
        add(_T_STRIP_COUNTS, _TYPE_LONG, [len(s) for s in strips])
    else:
        add(_T_TILE_WIDTH, _TYPE_LONG, [tile_size[0]])
        add(_T_TILE_LENGTH, _TYPE_LONG, [tile_size[1]])
        add(_T_TILE_OFFSETS, _TYPE_LONG, strip_offsets)
        add(_T_TILE_COUNTS, _TYPE_LONG, [len(s) for s in strips])
    add(_T_SPP, _TYPE_SHORT, [spp])
    add(_T_PLANAR, _TYPE_SHORT, [1])
    if predictor != 1:
        add(_T_PREDICTOR, _TYPE_SHORT, [predictor])
    del n_strips

    # out-of-line values sit between strip data and the IFD
    oov_base = len(out)
    resolved = []
    for tag, typ, count, inline, oov in sorted(entries):
        if inline is not None:
            resolved.append((tag, typ, count, inline))
        else:
            resolved.append(
                (tag, typ, count,
                 struct.pack(e + "I", oov_base + len(extra)))
            )
            extra += oov
    out += extra

    ifd_off = len(out)
    out += struct.pack(e + "H", len(resolved))
    for tag, typ, count, value4 in resolved:
        out += struct.pack(e + "HHI", tag, typ, count) + value4
    out += struct.pack(e + "I", 0)  # no next IFD
    struct.pack_into(e + "I", out, 4, ifd_off)
    return bytes(out)


def _read_values(payload, e, typ, count, value_field, tag):
    unit = _TYPE_SIZES.get(typ)
    if typ not in (_TYPE_SHORT, _TYPE_LONG):
        raise TiffError(f"unsupported type {typ} for required tag {tag}")
    code = "H" if typ == _TYPE_SHORT else "I"
    size = unit * count
    if size <= 4:
        return list(struct.unpack_from(f"{e}{count}{code}", value_field, 0))
    (off,) = struct.unpack_from(e + "I", value_field, 0)
    if off + size > len(payload):
        raise TiffError(f"tag {tag} values truncated")
    return list(struct.unpack_from(f"{e}{count}{code}", payload, off))


def decode_tiff(payload: bytes):
    """Decode a baseline TIFF to ``((h, w, 3) uint8 RGB, info)`` where
    ``info = {"compression", "photometric", "spp"}``. Raises TiffError
    on anything malformed or outside the documented envelope."""
    if len(payload) < 8:
        raise TiffError("truncated header")
    order = payload[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise TiffError(f"bad byte-order mark {order!r}")
    magic, ifd_off = struct.unpack_from(e + "HI", payload, 2)
    if magic != 42:
        raise TiffError(f"bad magic {magic}")
    if ifd_off + 2 > len(payload):
        raise TiffError("IFD offset past end of payload")
    (n_entries,) = struct.unpack_from(e + "H", payload, ifd_off)
    if n_entries == 0:
        raise TiffError("empty IFD")
    end = ifd_off + 2 + 12 * n_entries + 4
    if end > len(payload):
        raise TiffError("IFD truncated")
    (next_ifd,) = struct.unpack_from(e + "I", payload, end - 4)
    if next_ifd != 0:
        raise TiffError("multi-page TIFF not supported")

    raw_entries = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(e + "HHI", payload, base)
        raw_entries[tag] = (typ, count, payload[base + 8 : base + 12])

    def tag_values(tag, default=None):
        if tag not in raw_entries:
            if default is not None:
                return default
            raise TiffError(f"missing required tag {tag}")
        typ, count, vf = raw_entries[tag]
        if count == 0 or count > (1 << 20):
            raise TiffError(f"tag {tag} has implausible count {count}")
        return _read_values(payload, e, typ, count, vf, tag)

    w = tag_values(_T_WIDTH)[0]
    h = tag_values(_T_LENGTH)[0]
    if w <= 0 or h <= 0:
        raise TiffError(f"bad dimensions {w}x{h}")
    spp = tag_values(_T_SPP, [1])[0]
    if spp not in (1, 3):
        raise TiffError(f"unsupported samples/pixel {spp}")
    bits = tag_values(_T_BITS, [8] * spp)
    if len(bits) != spp or any(b != 8 for b in bits):
        raise TiffError(f"unsupported bits/sample {bits}")
    comp = tag_values(_T_COMPRESSION, [_COMPRESSION_NONE])[0]
    if comp not in (_COMPRESSION_NONE, _COMPRESSION_PACKBITS,
                    _COMPRESSION_LZW):
        raise TiffError(f"unsupported compression {comp}")
    pmi = tag_values(_T_PHOTOMETRIC)[0]
    if pmi not in (0, 1, 2):
        raise TiffError(f"unsupported photometric {pmi}")
    if (pmi == 2) != (spp == 3):
        raise TiffError(f"photometric {pmi} inconsistent with spp {spp}")
    planar = tag_values(_T_PLANAR, [1])[0]
    if planar != 1:
        raise TiffError(f"unsupported planar configuration {planar}")
    pred = tag_values(_T_PREDICTOR, [1])[0]
    if pred not in (1, 2):
        raise TiffError(f"unsupported predictor {pred}")
    if pred == 2 and comp != _COMPRESSION_LZW:
        raise TiffError(
            f"predictor 2 with compression {comp} not supported"
        )
    tiled = _T_TILE_OFFSETS in raw_entries
    if tiled and _T_STRIP_OFFSETS in raw_entries:
        raise TiffError("both strip and tile offset tags present")

    def unpack_segment(raw, label, expected, seg_w, seg_rows):
        if comp == _COMPRESSION_NONE:
            if len(raw) != expected:
                raise TiffError(
                    f"{label} has {len(raw)} bytes, expected {expected}"
                )
            return raw
        if comp == _COMPRESSION_PACKBITS:
            return packbits_decode(raw, expected)
        seg = lzw_decode(raw, expected)
        if pred == 2:
            # undo horizontal differencing: per-row, per-channel
            # cumulative sum mod 256 (rows are SEGMENT-wide — a tile's
            # rows difference within the tile, not across the image)
            a = np.frombuffer(seg, dtype=np.uint8).reshape(
                seg_rows, seg_w, spp
            )
            seg = (
                np.cumsum(a.astype(np.int64), axis=1) % 256
            ).astype(np.uint8).tobytes()
        return seg

    def read_segment(offsets, counts, i, label):
        off, cnt = offsets[i], counts[i]
        if off + cnt > len(payload) or cnt < 0:
            raise TiffError(f"{label} extends past end of payload")
        return payload[off : off + cnt]

    # a forged header must not allocate unbounded memory, but the bound
    # has to be COMPRESSION-AWARE: an uncompressed segment needs every
    # byte present, PackBits expands one input byte to at most 128
    # output bytes, and LZW codes emit dictionary strings that grow one
    # byte per prior code — but lzw_decode caps the table at
    # 2^_LZW_MAX_WIDTH (= 4096) entries, so no string (and hence no
    # single code's emission) ever exceeds ~4096 bytes: achievable
    # expansion is LINEAR at ~4096 bytes/code, not the quadratic
    # k(k+1)/2 an uncapped dictionary would allow (ADVICE r10: the
    # quadratic formula authorized ~100x more than the decoder can
    # produce). The quadratic term still applies below ~8k codes, where
    # it is the tighter bound, so take the min. Equally important, the
    # bound is GLOBAL: declared segment counts are summed and the sum
    # clamped to the payload size, because segments may legally overlap
    # (read_segment only checks off+cnt<=len) and a per-segment clamp
    # would let N segments aliasing the same bytes multiply the cap
    # N-fold (ADVICE r10 part b). Tiled images bound the PADDED pixel
    # count (edge tiles are stored full).
    def _payload_capacity(counts) -> int:
        total = min(sum(max(int(c), 0) for c in counts), len(payload))
        if total <= 0:
            return 0
        if comp == _COMPRESSION_NONE:
            return total
        if comp == _COMPRESSION_PACKBITS:
            return 128 * total
        k = (8 * total) // 9  # max number of LZW codes in total bytes
        max_string = 1 << _LZW_MAX_WIDTH  # decoder's 12-bit table cap
        return min(k * (k + 1) // 2, max_string * k)

    if not tiled:
        rps = tag_values(_T_ROWS_PER_STRIP, [h])[0]
        if rps <= 0:
            raise TiffError(f"bad rows/strip {rps}")
        rps = min(rps, h)
        offsets = tag_values(_T_STRIP_OFFSETS)
        counts = tag_values(_T_STRIP_COUNTS)
        n_strips = (h + rps - 1) // rps
        if len(offsets) != n_strips or len(counts) != n_strips:
            raise TiffError(
                f"strip table size {len(offsets)}/{len(counts)} "
                f"disagrees with {n_strips} strips"
            )
        if h * w * spp > _payload_capacity(counts):
            raise TiffError(
                f"declared dimensions ({w}x{h}x{spp}) exceed what the "
                f"payload could encode"
            )
        row_bytes = w * spp
        chunks = []
        for s in range(n_strips):
            rows = min(rps, h - s * rps)
            raw = read_segment(offsets, counts, s, f"strip {s}")
            chunks.append(
                unpack_segment(raw, f"strip {s}", rows * row_bytes, w, rows)
            )
        flat = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    else:
        tw = tag_values(_T_TILE_WIDTH)[0]
        th = tag_values(_T_TILE_LENGTH)[0]
        if tw <= 0 or th <= 0 or tw % 16 or th % 16:
            raise TiffError(
                f"tile dimensions {tw}x{th} not positive multiples of 16"
            )
        offsets = tag_values(_T_TILE_OFFSETS)
        counts = tag_values(_T_TILE_COUNTS)
        ta = (w + tw - 1) // tw
        td = (h + th - 1) // th
        if len(offsets) != ta * td or len(counts) != ta * td:
            raise TiffError(
                f"tile table size {len(offsets)}/{len(counts)} "
                f"disagrees with {ta * td} tiles"
            )
        if ta * td * tw * th * spp > _payload_capacity(counts):
            raise TiffError(
                f"declared tile grid ({ta}x{td} of {tw}x{th}x{spp}) "
                f"exceeds what the payload could encode"
            )
        img = np.zeros((h, w, spp), dtype=np.uint8)
        expected = tw * th * spp
        for ty in range(td):
            for tx in range(ta):
                i = ty * ta + tx
                raw = read_segment(offsets, counts, i, f"tile {i}")
                seg = unpack_segment(raw, f"tile {i}", expected, tw, th)
                tile = np.frombuffer(seg, dtype=np.uint8).reshape(
                    th, tw, spp
                )
                y0, x0 = ty * th, tx * tw
                ys, xs = min(th, h - y0), min(tw, w - x0)
                # edge padding is storage, not image — cropped here
                img[y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
        flat = img.reshape(-1)
    if pmi == 0:  # WhiteIsZero
        flat = 255 - flat
    if spp == 3:
        rgb = flat.reshape(h, w, 3)
    else:
        rgb = np.repeat(flat.reshape(h, w)[:, :, None], 3, axis=2)
    info = {"compression": int(comp), "photometric": int(pmi),
            "spp": int(spp), "predictor": int(pred),
            "tiled": bool(tiled)}
    return np.ascontiguousarray(rgb), info


def pattern_tiff(seed: int, width: int, height: int) -> bytes:
    """Deterministic test image with the shared closed-form pixel value
    — but row-alternating so PackBits compresses FOR REAL: even rows
    are constant (replicate packets), odd rows a gradient (literals).
    sample (y, x) = (seed*31 + y*7 + (x*13 if y odd else 0)) % 256.
    The seed cycles the codec surface: compression none/packbits by
    seed%2, little/big endian by seed%4//2, photometric
    gray / WhiteIsZero-gray / RGB by seed%3 (channels replicate, so
    RGB statistics are the same closed form for every arm), and
    seed%5==4 stores the image TILED (one 16x16 tile, edge-padded —
    the image is smaller than a tile, so the decode-side crop runs for
    real; decoded pixels identical, same oracle)."""
    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    v = ((seed * 31 + y * 7 + np.where(y % 2 == 1, x * 13, 0)) % 256).astype(
        np.uint8
    )
    compression = "none" if seed % 2 == 0 else "packbits"
    big_endian = bool((seed % 4) // 2)
    arm = seed % 3
    if arm == 2:
        arr = np.repeat(v[:, :, None], 3, axis=2)
        pm = "rgb"
    else:
        arr = v
        pm = "gray" if arm == 1 else "gray_inverted"
    if seed % 5 == 4:
        return encode_tiff(
            arr, photometric=pm, compression=compression,
            big_endian=big_endian, tile_size=(16, 16),
        )
    return encode_tiff(
        arr, photometric=pm, compression=compression,
        big_endian=big_endian, rows_per_strip=2,
    )


def pattern_tiff_lzw(seed: int, width: int, height: int) -> bytes:
    """LZW-compressed sibling of pattern_tiff (same closed-form pixels,
    same photometric cycle by seed%3, endian by seed%2) at
    rows_per_strip=3 — every strip runs the real variable-width coder:
    constant even rows build long matches (table hits), gradient odd
    rows force fresh table entries. seed%4 >= 2 additionally applies
    PREDICTOR 2 (tag 317 horizontal differencing — the spec's LZW
    pairing); decoded pixels are identical by construction, so the same
    analytic oracle certifies both arms."""
    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    v = ((seed * 31 + y * 7 + np.where(y % 2 == 1, x * 13, 0)) % 256).astype(
        np.uint8
    )
    arm = seed % 3
    if arm == 2:
        arr = np.repeat(v[:, :, None], 3, axis=2)
        pm = "rgb"
    else:
        arr = v
        pm = "gray" if arm == 1 else "gray_inverted"
    return encode_tiff(
        arr, photometric=pm, compression="lzw",
        big_endian=bool(seed % 2), rows_per_strip=3,
        predictor=2 if seed % 4 >= 2 else 1,
    )
