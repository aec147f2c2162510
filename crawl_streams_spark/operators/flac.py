"""Pure-NumPy/stdlib FLAC decode (subset) — the ninth REAL codec.

Scope, honestly bounded (same charter as bmp.py/jpeg.py: decode what we
claim exactly, reject everything else loudly, never silently misdecode):

- container: ``fLaC`` magic + STREAMINFO (other metadata blocks are
  skipped by length);
- frames: fixed-blocksize strategy, mono, 16-bit, CRC-8-verified
  headers and CRC-16-verified frames;
- subframes: CONSTANT, VERBATIM, FIXED predictors of order 0-4 (the
  five published polynomial predictors), and quantized LPC of any order
  (precision-bit signed coefficients, arithmetic-shift scaling) — all
  with 4-bit Rice-coded residuals (partition order 0);
- channels: mono, and ALL FOUR stereo assignments — independent L/R,
  left/side, right/side, mid/side (the side channel at bps+1 bits, the
  exact integer decorrelation transforms of the spec); rice partitions,
  wasted bits, and escaped partitions are rejected, not guessed.

Everything is integer-exact: zigzag+Rice decode, warm-up samples, and
the fixed-predictor reconstruction

    o=0: s[i] = r[i]                 o=1: s[i] = s[i-1] + r[i]
    o=2: s[i] = 2s[i-1] -  s[i-2] + r[i]
    o=3: s[i] = 3s[i-1] - 3s[i-2] +  s[i-3] + r[i]
    o=4: s[i] = 4s[i-1] - 6s[i-2] + 4s[i-3] - s[i-4] + r[i]

and the LPC reconstruction

    s[i] = ((Σ_j c_j · s[i-1-j]) >> shift) + r[i]

(arithmetic shift = floor division by 2^shift, exactly Python's ``>>``
on negative ints), so a SQL oracle that regenerates the residual stream
replays the samples exactly (order-1 fixed reconstruction is an integer
prefix sum; the LPC recurrence replays as a recursive CTE — both arms
of plans/q_crawl.py::media_flac_features, cycled by doc_id since r12).

Reference surface comparison: the reference toolkit (crawlstreams)
moves crawl payloads without decoding them; media feature extraction is
an extension family (SURVEY.md §7.6)."""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "FlacError",
    "crc8",
    "crc16",
    "encode_flac",
    "encode_flac_stereo",
    "decode_flac",
]


class FlacError(ValueError):
    """Malformed or out-of-envelope FLAC payload."""


def _crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)  # x^8 + x^2 + x + 1, init 0
_CRC16_TABLE = _crc_table(0x8005, 16)  # x^16 + x^15 + x^2 + 1, init 0


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF]
    return crc


# fixed-predictor coefficients on the last o samples, newest first
_FIXED_COEFFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


class _BitWriter:
    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self._acc = (self._acc << bits) | (value & ((1 << bits) - 1))
        self._n += bits
        while self._n >= 8:
            self._n -= 8
            self._buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits terminated by a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def bytes(self) -> bytes:
        assert self._n == 0
        return bytes(self._buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._data = data
        self._byte = pos
        self._bit = 0

    def read(self, bits: int) -> int:
        # multi-bit form (r13, guide §1.2 per-task work): grab the whole
        # field from the underlying bytes in one int.from_bytes instead of
        # a per-bit Python loop — same values, same FlacError on
        # truncation (the per-bit loop raised as soon as a needed bit was
        # past the end; reader state after a raise is unspecified either
        # way, every caller aborts the payload).
        if bits == 0:
            return 0
        end = self._bit + bits
        nbytes = (end + 7) >> 3
        chunk = self._data[self._byte : self._byte + nbytes]
        if len(chunk) < nbytes:
            raise FlacError("truncated bitstream")
        val = int.from_bytes(chunk, "big") >> ((nbytes << 3) - end)
        self._byte += end >> 3
        self._bit = end & 7
        return val & ((1 << bits) - 1)

    def read_unary(self) -> int:
        # byte-at-a-time scan for the terminating 1 bit (was one read(1)
        # call per zero bit); the 2^20 cap on a RETURNED run is identical
        # to the old per-bit guard, and a capless all-zero tail still
        # raises within one byte of the old position.
        data = self._data
        nbytes = len(data)
        byte, bit = self._byte, self._bit
        q = 0
        while True:
            if byte >= nbytes:
                raise FlacError("truncated bitstream")
            cur = data[byte] & (0xFF >> bit)
            if cur:
                hit = 8 - cur.bit_length()
                q += hit - bit
                if q > 1 << 20:
                    raise FlacError("unary run too long")
                bit = hit + 1
                if bit == 8:
                    byte += 1
                    bit = 0
                self._byte, self._bit = byte, bit
                return q
            q += 8 - bit
            byte += 1
            bit = 0
            if q > (1 << 20) + 8:
                raise FlacError("unary run too long")

    def align(self) -> None:
        if self._bit:
            self._bit = 0
            self._byte += 1

    def tell(self) -> int:
        return self._byte


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (-(r << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _utf8_frame_number(n: int) -> bytes:
    """FLAC frame numbers use UTF-8-style variable-length coding."""
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    if n < 0x10000:
        return bytes(
            [0xE0 | (n >> 12), 0x80 | ((n >> 6) & 0x3F), 0x80 | (n & 0x3F)]
        )
    raise FlacError("frame number too large for the fixture encoder")


def _read_utf8_number(br: "_BitReader") -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    n_cont = 0
    mask = 0x40
    while first & mask:
        n_cont += 1
        mask >>= 1
    if n_cont == 0 or n_cont > 5:
        raise FlacError(f"bad UTF-8 frame number lead byte {first:#x}")
    value = first & (mask - 1)
    for _ in range(n_cont):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise FlacError("bad UTF-8 continuation in frame number")
        value = (value << 6) | (cont & 0x3F)
    return value


def encode_flac(
    samples,
    sample_rate: int = 8000,
    block_size: int = 256,
    order: int = 1,
    rice_param: int = 4,
    subframe: str = "fixed",
    lpc_coeffs: "list[int] | None" = None,
    lpc_shift: int = 5,
    lpc_precision: int = 12,
) -> bytes:
    """Fixture FLAC encoder (the decoder's inverse on its whole
    envelope): mono 16-bit, fixed-blocksize frames, one Rice partition.
    ``subframe`` picks 'fixed' (order 0-4), 'constant' (requires each
    block constant), 'verbatim', or 'lpc' (``lpc_coeffs`` = quantized
    signed coefficients, newest-sample first, each within
    ``lpc_precision`` signed bits; residual = s[i] − ((Σ c_j·s[i−1−j])
    >> lpc_shift))."""
    x = [int(v) for v in np.asarray(samples, dtype=np.int64)]
    if any(not -32768 <= v <= 32767 for v in x):
        raise FlacError("samples out of int16 range")
    if order not in _FIXED_COEFFS:
        raise FlacError(f"unsupported fixed order {order}")

    if subframe not in ("fixed", "constant", "verbatim", "lpc"):
        raise FlacError(f"unknown subframe mode {subframe!r}")

    # STREAMINFO
    info = _BitWriter()
    info.write(block_size, 16)  # min block size
    info.write(block_size, 16)  # max block size
    info.write(0, 24)  # min frame size (unknown)
    info.write(0, 24)  # max frame size (unknown)
    info.write(sample_rate, 20)
    info.write(0, 3)  # channels - 1
    info.write(15, 5)  # bits per sample - 1
    info.write(len(x), 36)
    info_body = info.bytes() + b"\x00" * 16  # md5 unknown
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(info_body))[1:]
    out += info_body

    for fno, start in enumerate(range(0, len(x), block_size)):
        block = x[start : start + block_size]
        n = len(block)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy
        hdr.write(0b0111, 4)  # blocksize: 16 bits at end of header
        hdr.write(_sr_code(sample_rate), 4)
        hdr.write(0b0000, 4)  # mono
        hdr.write(0b100, 3)  # 16 bits per sample
        hdr.write(0, 1)  # reserved
        head = hdr.bytes() + _utf8_frame_number(fno)
        tail = _BitWriter()
        tail.write(n - 1, 16)
        head += tail.bytes()
        head += bytes([crc8(head)])

        body = _BitWriter()
        o = order
        if subframe == "constant":
            if any(v != block[0] for v in block):
                raise FlacError("constant subframe needs a constant block")
            body.write(0, 1)
            body.write(0b000000, 6)
            body.write(0, 1)  # no wasted bits
            body.write(block[0] & 0xFFFF, 16)
        elif subframe == "verbatim":
            body.write(0, 1)
            body.write(0b000001, 6)
            body.write(0, 1)
            for v in block:
                body.write(v & 0xFFFF, 16)
        elif subframe == "lpc":
            coeffs = list(lpc_coeffs or [])
            lo = len(coeffs)
            if not 1 <= lo <= 32:
                raise FlacError("LPC order must be 1..32")
            if not 1 <= lpc_precision <= 15:
                raise FlacError("LPC precision must be 1..15")
            if not 0 <= lpc_shift <= 15:
                raise FlacError("LPC shift must be 0..15")
            half = 1 << (lpc_precision - 1)
            if any(not -half <= c < half for c in coeffs):
                raise FlacError("LPC coefficient exceeds precision")
            if n < lo:
                raise FlacError("block shorter than LPC order")
            body.write(0, 1)
            body.write(0b100000 | (lo - 1), 6)
            body.write(0, 1)
            for v in block[:lo]:
                body.write(v & 0xFFFF, 16)
            body.write(lpc_precision - 1, 4)
            body.write(lpc_shift, 5)
            for c in coeffs:
                body.write(c & ((1 << lpc_precision) - 1), lpc_precision)
            body.write(0b00, 2)
            body.write(0, 4)
            body.write(rice_param, 4)
            for i in range(lo, n):
                pred = sum(
                    c * block[i - 1 - j] for j, c in enumerate(coeffs)
                ) >> lpc_shift
                u = _zigzag(block[i] - pred)
                body.write_unary(u >> rice_param)
                body.write(u, rice_param)
        else:  # "fixed" — validated above; shares the stereo encoder's writer
            if n < o:
                raise FlacError("block shorter than predictor order")
            _write_fixed_subframe(body, block, o, rice_param, 16)
        body.align()
        frame = head + body.bytes()
        frame += struct.pack(">H", crc16(frame))
        out += frame
    return bytes(out)


_SAMPLE_RATES = {0b0100: 8000, 0b0101: 16000, 0b0110: 22050, 0b0111: 24000,
                 0b1000: 32000, 0b1001: 44100, 0b1010: 48000, 0b1011: 96000}
_SR_CODES = {v: k for k, v in _SAMPLE_RATES.items()}


def _sr_code(rate: int) -> int:
    """Frame-header sample-rate code: the table code when the rate has
    one, else 0b0000 = 'get from STREAMINFO' (spec-legal for any rate —
    the old hardcoded 8 kHz code made the encoder's own output
    undecodable at other rates)."""
    return _SR_CODES.get(rate, 0b0000)


def _write_fixed_subframe(
    body: "_BitWriter", block: list, order: int, rice_param: int, sbits: int
) -> None:
    """Write one FIXED-predictor subframe at ``sbits`` bits (16 regular,
    17 side)."""
    mask = (1 << sbits) - 1
    body.write(0, 1)
    body.write(0b001000 | order, 6)
    body.write(0, 1)
    for v in block[:order]:
        body.write(v & mask, sbits)
    body.write(0b00, 2)
    body.write(0, 4)
    body.write(rice_param, 4)
    coeffs = _FIXED_COEFFS[order]
    for i in range(order, len(block)):
        pred = sum(c * block[i - 1 - j] for j, c in enumerate(coeffs))
        u = _zigzag(block[i] - pred)
        body.write_unary(u >> rice_param)
        body.write(u, rice_param)


_STEREO_MODES = {"independent": 1, "left_side": 8, "right_side": 9,
                 "mid_side": 10}


def encode_flac_stereo(
    left,
    right,
    mode: str = "mid_side",
    sample_rate: int = 8000,
    block_size: int = 256,
    order: int = 1,
    rice_param: int = 6,
) -> bytes:
    """Fixture stereo FLAC encoder: both channels as FIXED subframes
    under the chosen channel assignment — independent, left/side,
    right/side, or mid/side (side = L−R at 17 bits; mid = (L+R)>>1,
    the spec's exact integer decorrelation)."""
    if mode not in _STEREO_MODES:
        raise FlacError(f"unknown stereo mode {mode!r}")
    l = [int(v) for v in np.asarray(left, dtype=np.int64)]
    r = [int(v) for v in np.asarray(right, dtype=np.int64)]
    if len(l) != len(r):
        raise FlacError("left/right length mismatch")
    if any(not -32768 <= v <= 32767 for v in l + r):
        raise FlacError("samples out of int16 range")
    ch_code = _STEREO_MODES[mode]

    info = _BitWriter()
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(1, 3)  # channels - 1
    info.write(15, 5)
    info.write(len(l), 36)
    info_body = info.bytes() + b"\x00" * 16
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(info_body))[1:]
    out += info_body

    for fno, start in enumerate(range(0, len(l), block_size)):
        bl = l[start : start + block_size]
        brt = r[start : start + block_size]
        n = len(bl)
        if n < order:
            raise FlacError("block shorter than predictor order")
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)
        hdr.write(0b0111, 4)
        hdr.write(_sr_code(sample_rate), 4)
        hdr.write(ch_code, 4)
        hdr.write(0b100, 3)
        hdr.write(0, 1)
        head = hdr.bytes() + _utf8_frame_number(fno)
        tail = _BitWriter()
        tail.write(n - 1, 16)
        head += tail.bytes()
        head += bytes([crc8(head)])

        side = [a - b for a, b in zip(bl, brt)]
        if mode == "independent":
            chans = [(bl, 16), (brt, 16)]
        elif mode == "left_side":
            chans = [(bl, 16), (side, 17)]
        elif mode == "right_side":
            chans = [(side, 17), (brt, 16)]
        else:
            mid = [(a + b) >> 1 for a, b in zip(bl, brt)]
            chans = [(mid, 16), (side, 17)]

        body = _BitWriter()
        for block, sbits in chans:
            _write_fixed_subframe(body, block, order, rice_param, sbits)
        body.align()
        frame = head + body.bytes()
        frame += struct.pack(">H", crc16(frame))
        out += frame
    return bytes(out)





def decode_flac(payload: bytes):
    """Decode a subset FLAC payload to (meta, samples): meta =
    (sample_rate, n_channels, bits, total_samples_declared); samples =
    int64 array of every decoded sample. Raises FlacError on anything
    malformed or outside the documented envelope, including CRC-8/16
    mismatches."""
    if len(payload) < 8 or payload[:4] != b"fLaC":
        raise FlacError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise FlacError("truncated metadata block header")
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise FlacError("truncated metadata block")
        if btype == 0:
            if blen != 34:
                raise FlacError(f"bad STREAMINFO length {blen}")
            br = _BitReader(body)
            br.read(16)  # min blocksize
            br.read(16)  # max blocksize
            br.read(24)
            br.read(24)
            rate = br.read(20)
            n_ch = br.read(3) + 1
            bits = br.read(5) + 1
            total = br.read(36)
            streaminfo = (rate, n_ch, bits, total)
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise FlacError("missing STREAMINFO")
    rate, n_ch, bits, total = streaminfo
    if n_ch not in (1, 2):
        raise FlacError(f"only mono/stereo supported (got {n_ch} channels)")
    if bits != 16:
        raise FlacError(f"only 16-bit supported (got {bits})")

    samples: list[int] = []
    per_channel = 0
    while pos < len(payload):
        frame_start = pos
        br = _BitReader(payload, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise FlacError(f"bad frame sync {sync:#x} at byte {pos}")
        if br.read(1):
            raise FlacError("reserved bit set in frame header")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise FlacError("reserved bit set in frame header")
        if n_ch == 1:
            if ch_code != 0:
                raise FlacError(
                    f"channel assignment {ch_code} in a mono stream"
                )
        elif ch_code not in (1, 8, 9, 10):
            raise FlacError(f"unsupported channel assignment {ch_code}")
        if ss_code != 0b100:
            raise FlacError(f"unsupported sample size code {ss_code}")
        _read_utf8_number(br)
        if bs_code == 0b0110:
            n = br.read(8) + 1
        elif bs_code == 0b0111:
            n = br.read(16) + 1
        elif 0b0010 <= bs_code <= 0b0101:
            n = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            n = 256 << (bs_code - 8)
        else:
            raise FlacError(f"unsupported blocksize code {bs_code}")
        if sr_code in _SAMPLE_RATES:
            frame_rate = _SAMPLE_RATES[sr_code]
        elif sr_code == 0:
            frame_rate = rate
        else:
            raise FlacError(f"unsupported sample rate code {sr_code}")
        if frame_rate != rate:
            raise FlacError("frame sample rate disagrees with STREAMINFO")
        hdr_end = br.tell()
        if br._bit != 0:
            raise FlacError("frame header not byte-aligned before CRC-8")
        want_crc8 = br.read(8)
        if crc8(payload[frame_start:hdr_end]) != want_crc8:
            raise FlacError("frame header CRC-8 mismatch")

        # subframes (one per channel; side channels carry bps+1 bits —
        # the spec's decorrelation headroom)
        if ch_code == 0 or ch_code == 1:
            ch_bits = [16] * n_ch
        elif ch_code == 8:  # left/side
            ch_bits = [16, 17]
        elif ch_code == 9:  # side/right (channel 0 is the SIDE)
            ch_bits = [17, 16]
        else:  # mid/side
            ch_bits = [16, 17]
        blocks = [_read_subframe(br, n, b) for b in ch_bits]

        if ch_code in (0, 1):
            chans = blocks
        elif ch_code == 8:
            left = blocks[0]
            chans = [left, [l - s for l, s in zip(left, blocks[1])]]
        elif ch_code == 9:
            right = blocks[1]
            chans = [[r + s for r, s in zip(right, blocks[0])], right]
        else:  # mid/side: m carries (l+r)>>1, side's low bit restores parity
            left, right = [], []
            for m, s in zip(blocks[0], blocks[1]):
                lr_sum = (m << 1) | (s & 1)
                left.append((lr_sum + s) >> 1)
                right.append((lr_sum - s) >> 1)
            chans = [left, right]

        br.align()
        frame_end = br.tell()
        if frame_end + 2 > len(payload):
            raise FlacError("truncated frame CRC-16")
        want_crc16 = struct.unpack_from(">H", payload, frame_end)[0]
        if crc16(payload[frame_start:frame_end]) != want_crc16:
            raise FlacError("frame CRC-16 mismatch")
        if n_ch == 1:
            samples.extend(chans[0])
        else:  # interleaved L R L R ...
            for pair in zip(chans[0], chans[1]):
                samples.extend(pair)
        per_channel += n
        pos = frame_end + 2

    if total and per_channel != total:
        raise FlacError(
            f"decoded {per_channel} samples, STREAMINFO declared {total}"
        )
    return (rate, n_ch, bits, total or per_channel), np.array(
        samples, dtype=np.int64
    )


def _read_subframe(br: "_BitReader", n: int, sbits: int) -> list:
    """Parse one subframe of ``n`` samples at ``sbits`` bits (16 for
    regular channels, 17 for side channels)."""
    if br.read(1):
        raise FlacError("subframe padding bit set")
    stype = br.read(6)
    if br.read(1):
        raise FlacError("wasted bits unsupported")
    half = 1 << (sbits - 1)
    full = 1 << sbits

    def sread() -> int:
        u = br.read(sbits)
        return u - full if u >= half else u

    def rice_tail(block: list, count: int, predict) -> None:
        method = br.read(2)
        if method != 0:
            raise FlacError(f"unsupported residual method {method}")
        part_order = br.read(4)
        if part_order != 0:
            raise FlacError(
                f"unsupported rice partition order {part_order}"
            )
        p = br.read(4)
        if p == 0xF:
            raise FlacError("escaped rice partition unsupported")
        # hot loop: locals + inlined unzigzag (r13); one unary+field read
        # and one predictor call per sample, nothing else
        read_unary, read, append = br.read_unary, br.read, block.append
        for _ in range(count):
            u = (read_unary() << p) | read(p)
            append(predict(block) + ((u >> 1) ^ -(u & 1)))

    if stype == 0b000000:
        return [sread()] * n
    if stype == 0b000001:
        return [sread() for _ in range(n)]
    if 0b001000 <= stype <= 0b001100:
        o = stype & 0x7
        if n < o:
            raise FlacError("block shorter than predictor order")
        block = [sread() for _ in range(o)]
        coeffs = _FIXED_COEFFS[o]

        if o == 1:

            def predict(b: list, c0=coeffs[0]) -> int:
                return c0 * b[-1]

        elif o == 2:

            def predict(b: list, c0=coeffs[0], c1=coeffs[1]) -> int:
                return c0 * b[-1] + c1 * b[-2]

        else:

            def predict(b: list) -> int:
                return sum(
                    c * b[len(b) - 1 - j] for j, c in enumerate(coeffs)
                )

        rice_tail(block, n - o, predict)
        return block
    if stype & 0b100000:
        lo = (stype & 0b011111) + 1
        if n < lo:
            raise FlacError("block shorter than LPC order")
        block = [sread() for _ in range(lo)]
        prec = br.read(4) + 1
        if prec == 16:
            raise FlacError("invalid LPC precision code 1111")
        shift = br.read(5)
        if shift >= 16:
            # 5-bit field is SIGNED in the spec; negative shifts are
            # forbidden by the format text — reject, never guess
            raise FlacError(f"negative LPC shift {shift - 32}")
        chalf = 1 << (prec - 1)
        coeffs = []
        for _ in range(lo):
            c = br.read(prec)
            coeffs.append(c - (1 << prec) if c >= chalf else c)

        # arithmetic shift: floor division by 2^shift, exactly
        # Python's >> on negative ints (and C's on int64)
        if lo == 1:

            def predict(b: list, c0=coeffs[0]) -> int:
                return (c0 * b[-1]) >> shift

        elif lo == 2:

            def predict(b: list, c0=coeffs[0], c1=coeffs[1]) -> int:
                return (c0 * b[-1] + c1 * b[-2]) >> shift

        else:

            def predict(b: list) -> int:
                return (
                    sum(c * b[len(b) - 1 - j] for j, c in enumerate(coeffs))
                    >> shift
                )

        rice_tail(block, n - lo, predict)
        return block
    raise FlacError(f"unsupported subframe type {stype:#08b}")
