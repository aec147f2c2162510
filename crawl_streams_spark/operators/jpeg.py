"""Pure-NumPy baseline JPEG (ITU-T T.81 / JFIF) decoder + a minimal
spec-driven encoder for fixtures.

Public-spec implementation (T.81 Annex F decoding procedures, Annex K
reference Huffman tables); no codec libraries involved, so the JPEG path
of the multimodal family runs for real in this sandbox — only genuinely
library-bound codecs (MP3, H.264) remain gated in multimodal.py.

Supported: baseline DCT (SOF0) and extended sequential (SOF1) with
8-bit samples, 1-4 components, integer chroma subsampling ratios
(4:4:4 / 4:2:2 / 4:2:0 …), restart markers, 8- and 16-bit quantization
tables, byte stuffing. Not supported (raises ``JpegError``): progressive
(SOF2), arithmetic coding, hierarchical, 12-bit precision.

Decoding math is vectorized per block batch: Huffman bit-reading is the
only scalar loop (bounded by coded size), and the IDCT runs as one
einsum over all blocks of a component. That is the right shape for the
mapInPandas stage in multimodal.decode_jpeg: Arrow hands the worker a
batch of payloads, each decode is numpy-bound, and nothing touches the
JVM.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["JpegError", "decode_jpeg", "encode_baseline", "gray_jpeg"]


class JpegError(ValueError):
    """Malformed or unsupported JPEG payload."""


#: Zigzag scan order: index k in the scan -> linear position (row*8+col)
#: in the 8x8 block (T.81 Figure 5).
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: 8x8 DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1)u*pi/16); the 2-D
#: inverse transform is C.T @ B @ C.
_C = np.array([
    [
        (np.sqrt(0.125) if u == 0 else 0.5)
        * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])


def _build_decode_table(bits: list[int], values: list[int]) -> dict:
    """(code_length, code) -> symbol, per T.81 Annex C code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], values: list[int]) -> dict:
    """symbol -> (code, length) — the encoder-side view of the same
    assignment."""
    return {
        v: (code, length)
        for (length, code), v in _build_decode_table(bits, values).items()
    }


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.n = 0
        #: a well-formed scan never needs a byte past the segment end
        #: (padding bits live inside the final byte), so reading past it
        #: means the stream was truncated — flagged here, raised by the
        #: MCU loop rather than silently decoding 1-padding as data
        self.overrun = False

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                self.overrun = True
                return 1  # T.81 pad bits
            self.buf = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v


def _read_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code in scan data")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s low bits to the signed coefficient."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(br, dc_tbl, ac_tbl, pred: int):
    """One 8x8 block of quantized coefficients in ZIGZAG order."""
    s = _read_huff(br, dc_tbl)
    if s > 11:
        # T.81 F.1.2.1.2: 8-bit baseline DC categories are 0..11; a
        # larger symbol only arises from a corrupt table and would make
        # bits(s) astronomically large (totality-fuzz finding)
        raise JpegError(f"DC magnitude category {s} out of range")
    pred += _extend(br.bits(s), s)
    if not -(1 << 31) <= pred < (1 << 31):
        raise JpegError("DC predictor out of int32 range (corrupt scan)")
    zz = np.zeros(64, dtype=np.int32)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _read_huff(br, ac_tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: run of 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC run past end of block")
        zz[k] = _extend(br.bits(s), s)
        k += 1
    return zz, pred


def _split_scan(payload: bytes, start: int):
    """Entropy-coded segments between ``start`` and the next
    non-restart marker: de-stuff 0xFF00, split at RSTn (predictors reset
    per segment). Returns (segments, position_of_terminating_marker)."""
    segs = []
    buf = bytearray()
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            buf.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = payload[i + 1]
        if m == 0x00:  # stuffed data byte
            buf.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(buf))
            buf = bytearray()
            i += 2
        else:  # real marker terminates the scan
            break
    segs.append(bytes(buf))
    return segs, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an (h, w, channels) uint8 array —
    always 3-D: channels = 1 for grayscale, 3 for YCbCr input converted
    to RGB. Raises ``JpegError`` on malformed or unsupported input."""
    try:
        return _decode(payload)
    except JpegError:
        raise
    except (IndexError, struct.error, StopIteration) as e:
        # truncated / corrupt structure: normalize to the typed error so
        # callers (decode_jpeg_features) can quarantine per-row
        raise JpegError(f"corrupt stream: {type(e).__name__}: {e}")


def _decode(payload: bytes) -> np.ndarray:
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise JpegError("missing SOI marker")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None
    restart = 0  # DRI restart interval (MCUs per entropy segment)
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise JpegError(f"expected marker at offset {i}")
        # optional 0xFF fill bytes may pad before any marker (T.81
        # B.1.1.2) — skip them or the next real marker byte would be
        # misread as a segment length
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
        if i + 1 >= n:
            raise JpegError("truncated marker")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            raise JpegError("EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / bare RST
            continue
        if i + 2 > n:
            raise JpegError("truncated marker segment")
        (seglen,) = struct.unpack_from(">H", payload, i)
        if seglen < 2 or i + seglen > n:
            raise JpegError(
                f"segment length {seglen} overruns the payload at {i}"
            )
        body = payload[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq == 0:
                    if len(body) - p < 64:
                        raise JpegError("truncated DQT table")
                    q = np.frombuffer(body, np.uint8, 64, p).astype(np.int32)
                    p += 64
                elif pq == 1:
                    if len(body) - p < 128:
                        raise JpegError("truncated DQT table")
                    q = np.frombuffer(body, ">u2", 64, p).astype(np.int32)
                    p += 128
                else:
                    raise JpegError(f"bad DQT precision {pq}")
                qtables[tq] = q  # zigzag order
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                if len(bits) < 16:
                    raise JpegError("truncated DHT counts")
                nv = sum(bits)
                if len(body) - (p + 17) < nv:
                    raise JpegError("truncated DHT values")
                vals = list(body[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            if len(body) < 6:
                raise JpegError("truncated SOF header")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * nc:
                raise JpegError("truncated SOF components")
            if prec != 8:
                raise JpegError(f"unsupported precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported coding process (SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            sel = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(
                    x for x in frame["comps"] if x["id"] == cs
                )
                sel.append((comp, tt >> 4, tt & 15))
            segs, _ = _split_scan(payload, i + seglen)
            return _decode_scan(frame, sel, qtables, huff, segs, restart)
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise JpegError("truncated DRI segment")
            (restart,) = struct.unpack_from(">H", body, 0)
        # APPn, COM, DNL: skip
        i += seglen
    raise JpegError("no SOS marker found")


def _decode_scan(frame, sel, qtables, huff, segs, restart=0):
    h, w = frame["h"], frame["w"]
    comps = [c for c, _, _ in sel]
    if len(comps) != len(frame["comps"]):
        raise JpegError("multi-scan (non-interleaved) streams unsupported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise JpegError("bad sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    blocks = {c["id"]: [] for c in comps}
    tables = []
    for comp, td, ta in sel:
        try:
            dc, ac = huff[(0, td)], huff[(1, ta)]
        except KeyError:
            raise JpegError("scan references undefined Huffman table")
        if comp["tq"] not in qtables:
            raise JpegError("component references undefined quant table")
        tables.append((comp, dc, ac))
    n_mcu = mcux * mcuy
    mcu_done = 0
    for seg in segs:
        br = _BitReader(seg)
        preds = {c["id"]: 0 for c in comps}
        # with a DRI interval each restart segment holds exactly
        # `restart` MCUs (the last may hold fewer); without one, the
        # single segment holds the whole scan
        seg_budget = restart if restart else n_mcu
        for _ in range(min(seg_budget, n_mcu - mcu_done)):
            for comp, dc, ac in tables:
                for _ in range(comp["v"] * comp["h"]):
                    zz, preds[comp["id"]] = _decode_block(
                        br, dc, ac, preds[comp["id"]]
                    )
                    blocks[comp["id"]].append(zz)
            mcu_done += 1
        if br.overrun:
            raise JpegError(
                f"truncated scan data after {mcu_done}/{n_mcu} MCUs"
            )
    if mcu_done < n_mcu:
        raise JpegError(
            f"truncated scan: {mcu_done}/{n_mcu} MCUs decoded"
        )
    planes = []
    for comp in comps:
        zzs = np.stack(blocks[comp["id"]])  # (nblocks, 64) zigzag
        deq = zzs.astype(np.float64) * qtables[comp["tq"]][None, :]
        raster = np.zeros_like(deq)
        raster[:, ZIGZAG] = deq
        b8 = raster.reshape(-1, 8, 8)
        # vectorized 2-D IDCT over every block of the component
        spat = np.einsum("ua,nuv,vb->nab", _C, b8, _C)
        cols = mcux * comp["h"]
        rows = mcuy * comp["v"]
        # MCU-interleaved block order -> plane: reshape via the MCU grid
        plane = (
            spat.reshape(mcuy, mcux, comp["v"], comp["h"], 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(rows * 8, cols * 8)
        )
        plane = np.clip(np.round(plane) + 128, 0, 255)
        # upsample to full resolution (integer ratios only)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if vmax % comp["v"] or hmax % comp["h"]:
            raise JpegError("non-integer subsampling ratio")
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h, :w])
    img = np.stack(planes, axis=-1)
    if img.shape[-1] == 3:  # JFIF YCbCr -> RGB (full range)
        y, cb, cr = img[..., 0], img[..., 1] - 128.0, img[..., 2] - 128.0
        img = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
        img = np.clip(np.round(img), 0, 255)
    return img.astype(np.uint8)


# --- minimal encoder (fixtures + round-trip tests) ------------------------

#: T.81 Annex K reference Huffman tables (public spec constants).
_K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_K_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.buf = (self.buf << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.buf)
            if self.buf == 0xFF:
                self.out.append(0x00)
            self.buf = 0
            self.n = 0
        return bytes(self.out)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def encode_baseline(
    comp_blocks: list[np.ndarray],
    width: int,
    height: int,
    qtable: np.ndarray,
    sampling: list[tuple[int, int]] | None = None,
    restart_interval: int = 0,
    q16: bool = False,
) -> bytes:
    """Minimal baseline encoder: ``comp_blocks[c]`` is an (n_blocks, 64)
    int array of QUANTIZED coefficients in ZIGZAG order, blocks listed in
    MCU-interleaved order; one shared quant table (zigzag order) and the
    Annex K luma Huffman tables for every component. 1 component (gray)
    or 3 components (YCbCr, default 4:4:4). ``restart_interval`` emits
    DRI + RSTn markers with per-segment predictor resets; ``q16`` writes
    the 16-bit DQT form — both exist to exercise those decoder paths
    with valid T.81 streams. A fixture builder, not a production
    encoder."""
    nc = len(comp_blocks)
    if sampling is None:
        sampling = [(1, 1)] * nc
    q = np.asarray(qtable, dtype=np.int64)
    out = bytearray(b"\xff\xd8")  # SOI
    if q16:  # DQT, 16-bit precision, table 0
        out += b"\xff\xdb" + struct.pack(">H", 131) + b"\x10"
        out += b"".join(struct.pack(">H", int(x)) for x in q)
    else:  # DQT, 8-bit precision, table 0
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
        out += bytes(int(x) for x in q)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOF0
    sof = struct.pack(">BHHB", 8, height, width, nc)
    for c in range(nc):
        hv = (sampling[c][0] << 4) | sampling[c][1]
        sof += struct.pack(">BBB", c + 1, hv, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC table 0 + AC table 0
    for tc, (bits, vals) in (
        (0, _K_DC_LUMA),
        (1, (_K_AC_LUMA_BITS, _K_AC_LUMA_VALS)),
    ):
        seg = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    # SOS
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    dc_enc = _build_encode_table(*_K_DC_LUMA)
    ac_enc = _build_encode_table(_K_AC_LUMA_BITS, _K_AC_LUMA_VALS)
    bw = _BitWriter()
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    idx = [0] * nc
    preds = [0] * nc
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            out += bw.flush()
            bw = _BitWriter()
            out += bytes(
                [0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]
            )
            preds = [0] * nc
        for c in range(nc):
            for _ in range(sampling[c][0] * sampling[c][1]):
                zz = comp_blocks[c][idx[c]]
                idx[c] += 1
                diff = int(zz[0]) - preds[c]
                preds[c] = int(zz[0])
                s = _category(diff)
                code, length = dc_enc[s]
                bw.write(code, length)
                if s:
                    v = diff if diff >= 0 else diff + (1 << s) - 1
                    bw.write(v, s)
                run = 0
                last_nz = max(
                    (k for k in range(1, 64) if zz[k] != 0), default=0
                )
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_enc[0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    s = _category(v)
                    code, length = ac_enc[(run << 4) | s]
                    bw.write(code, length)
                    vv = v if v >= 0 else v + (1 << s) - 1
                    bw.write(vv, s)
                    run = 0
                if last_nz < 63:
                    code, length = ac_enc[0x00]  # EOB
                    bw.write(code, length)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def gray_jpeg(width: int, height: int, gray: int) -> bytes:
    """Flat-gray baseline JPEG with q[0]=8 so the decode is EXACT:
    the quantized DC is (gray−128) (since 8·(gray−128)/q00 = gray−128),
    and IDCT of a DC-only block is uniform DC·q00/8 = gray−128, level
    shifted back to gray. The analytic exactness is what lets a SQL
    oracle predict the decoded features (plans/q_crawl.py)."""
    if not (0 <= gray <= 255):
        raise ValueError("gray out of range")
    q = np.ones(64, dtype=np.int64)
    q[0] = 8
    bx = -(-width // 8)
    by = -(-height // 8)
    blocks = np.zeros((bx * by, 64), dtype=np.int64)
    blocks[:, 0] = gray - 128
    return encode_baseline([blocks], width, height, q)
