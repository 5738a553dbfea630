"""Pure-NumPy baseline JPEG (ITU-T T.81) — encoder + decoder, stdlib only.

This container has no image libraries, so MJPEG video support
(multimodal.decode_avi '00dc' chunks) needs a from-scratch baseline
sequential JPEG codec, same policy as the BMP/WAV/AVI codecs: REAL
format, pure NumPy + struct.

Scope:

- encode_jpeg: baseline sequential DCT, 4:4:4 (no subsampling), JFIF
  APP0, the Annex-K quantization + Huffman tables (quality-scaled with
  the libjpeg 5000/Q · 200-2Q convention), interleaved single scan;
  4:4:4, 4:2:2 and 4:2:0 subsampling; optional DRI/RSTn restarts.
- decode_jpeg: any baseline sequential stream — SOF0, 1..4 components,
  subsampling factors 1 and 2 (4:4:4 / 4:2:2 / 4:2:0), multiple
  DQT/DHT segments, APPn/COM skip, DRI + RSTn restart handling, byte
  stuffing. (Progressive/arithmetic/12-bit are rejected with a clear
  error — MJPEG is baseline by definition.)

Heavy math (DCT/IDCT, quantization, color transforms) is batched NumPy
over all blocks at once; only the entropy coder walks symbols in Python
(a few thousand per frame at our sizes).

All constants below are from the public JPEG standard (ITU-T T.81
Annex K) — the canonical interchange tables every codec ships.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K tables ----------------------------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

DC_LUMA_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

AC_CHROMA_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _zigzag_order() -> np.ndarray:
    idx = []
    for d in range(15):
        rs = range(d, -1, -1) if d % 2 == 0 else range(0, d + 1)
        for r in rs:
            c = d - r
            if r < 8 and c < 8:
                idx.append(r * 8 + c)
    return np.array(idx, dtype=np.int64)


ZZ = _zigzag_order()                  # zigzag position -> raster index
UNZZ = np.argsort(ZZ)                 # raster index   -> zigzag position


def _dct_matrix() -> np.ndarray:
    k = np.arange(8, dtype=np.float64)
    c = 0.5 * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c


DCT = _dct_matrix()                   # forward: DCT @ block @ DCT.T


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> list:
    """Per-length (min_code, max_code, first_val_index) for the classic
    range-walk decode (T.81 F.2.2.3)."""
    table, code, k = [], 0, 0
    for length in range(1, 17):
        n = bits[length]
        table.append((code, code + n - 1, k) if n else None)
        code = (code + n) << 1
        k += n
    return table


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)          # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)         # pad with 1s
        return bytes(self.buf)

    def restart(self, idx: int) -> None:
        """Byte-align and emit RSTn (markers are raw 0xFF, unstuffed)."""
        if self.n:
            self.put(0x7F, 8 - self.n)
        self.buf += bytes([0xFF, 0xD0 + (idx % 8)])


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per T.81 F.1.2.1: negatives use the
    one's-complement low bits."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _encode_block(bw_: "_BitWriter", blk: np.ndarray, tabs: tuple,
                  pred: list, ci: int) -> None:
    dct_t, act_t = tabs
    diff = int(blk[0]) - pred[ci]
    pred[ci] = int(blk[0])
    size, amp = _magnitude(diff)
    code, length = dct_t[size]
    bw_.put(code, length)
    if size:
        bw_.put(amp, size)
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = act_t[0xF0]           # ZRL
            bw_.put(code, length)
            run -= 16
        size, amp = _magnitude(v)
        code, length = act_t[(run << 4) | size]
        bw_.put(code, length)
        bw_.put(amp, size)
        run = 0
    if last < 63:
        code, length = act_t[0x00]               # EOB
        bw_.put(code, length)


def _box_downsample2(p: np.ndarray) -> np.ndarray:
    h, w = p.shape
    p = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
    return (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2]
            + p[1::2, 1::2]) / 4.0


def _box_downsample2x(p: np.ndarray) -> np.ndarray:
    w = p.shape[1]
    p = np.pad(p, ((0, 0), (0, w % 2)), mode="edge")
    return (p[:, 0::2] + p[:, 1::2]) / 2.0


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF JPEG bytes.

    ``subsampling``: '444' (one block per component per MCU) or '420'
    (2×2 luma blocks + box-downsampled chroma per 16×16 MCU — the common
    MJPEG shape). ``restart_interval`` > 0 emits a DRI segment and an
    RSTn marker (+ DC-prediction reset) every that many MCUs — real
    MJPEG encoders use restarts for error resilience, and this
    exercises the decoder's resynchronization path."""
    if subsampling not in ("444", "422", "420"):
        raise ValueError(f"unknown subsampling: {subsampling}")
    h, w, _ = pixels.shape
    rgb = pixels.astype(np.float64)
    y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
    cb = (-0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1]
          + 0.5 * rgb[..., 2] + 128.0)
    cr = (0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1]
          - 0.081312 * rgb[..., 2] + 128.0)

    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    specs = {"444": [(1, 1), (1, 1), (1, 1)],
             "422": [(2, 1), (1, 1), (1, 1)],
             "420": [(2, 2), (1, 1), (1, 1)]}[subsampling]
    if subsampling == "420":
        cb, cr = _box_downsample2(cb), _box_downsample2(cr)
    elif subsampling == "422":
        cb, cr = _box_downsample2x(cb), _box_downsample2x(cr)
    hmax = max(s[0] for s in specs)
    vmax = max(s[1] for s in specs)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    coefs, dims = [], []
    for p, q, (ch, cv) in zip((y, cb, cr), (qy, qc, qc), specs):
        th, tw = mcuy * cv * 8, mcux * ch * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                   mode="edge")
        bh, bw2 = th // 8, tw // 8
        blocks = (p - 128.0).reshape(bh, 8, bw2, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8)
        dct = np.einsum("ij,njk,lk->nil", DCT, blocks, DCT)
        quant = np.round(dct / q).astype(np.int64)
        coefs.append(quant.reshape(-1, 64)[:, ZZ])
        dims.append(bw2)

    dc_y = _huff_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _huff_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huff_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huff_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw_ = _BitWriter()
    pred = [0, 0, 0]
    tables = [(dc_y, ac_y), (dc_c, ac_c), (dc_c, ac_c)]
    rst = 0
    for m in range(mcux * mcuy):                 # interleaved MCUs
        if restart_interval and m and m % restart_interval == 0:
            bw_.restart(rst)
            rst += 1
            pred = [0, 0, 0]
        my, mx = divmod(m, mcux)
        for ci, (ch, cv) in enumerate(specs):
            for vy in range(cv):
                for vx in range(ch):
                    bi = (my * cv + vy) * dims[ci] + (mx * ch + vx)
                    _encode_block(bw_, coefs[ci][bi], tables[ci], pred, ci)
    scan = bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = b"\xFF\xD8"                                           # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qy.reshape(64)[ZZ].tolist()))
    out += seg(0xFFDB, b"\x01" + bytes(qc.reshape(64)[ZZ].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for (cid, tq), (ch, cv) in zip(((1, 0), (2, 1), (3, 1)), specs):
        sof += struct.pack(">BBB", cid, (ch << 4) | cv, tq)
    out += seg(0xFFC0, sof)
    for cls_dest, bits, vals in ((0x00, DC_LUMA_BITS, DC_LUMA_VALS),
                                 (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
                                 (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                                 (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)):
        out += seg(0xFFC4, bytes([cls_dest] + bits[1:] + vals))
    sos = struct.pack(">B", 3)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += struct.pack(">BB", cid, tabs)
    sos += b"\x00\x3F\x00"                                      # Ss Se AhAl
    out += seg(0xFFDA, sos)
    return out + scan + b"\xFF\xD9"                             # EOI


# --- decoder -----------------------------------------------------------------

class _BitReader:
    """Entropy-segment bit reader: handles 0xFF00 stuffing; stops at any
    real marker and records it."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2                  # stuffed 0xFF data byte
            else:
                self.marker = nxt              # real marker: emit 0 bits
                self.acc = (self.acc << 8)
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def align_restart(self) -> None:
        """Drop padding bits, consume the RSTn marker."""
        self.acc, self.n, self.marker = 0, 0, None
        while self.buf[self.pos] != 0xFF or self.buf[self.pos + 1] == 0x00:
            self.pos += 1                      # tolerate stray pad bytes
        self.pos += 2


def _decode_huff(br: _BitReader, table: list) -> int:
    code = br.bits(1)
    for length in range(1, 17):
        row = table[length - 1]
        if row is not None and row[0] <= code <= row[1]:
            return row[3][row[2] + (code - row[0])]
        code = (code << 1) | br.bits(1)
    raise ValueError("bad Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline sequential JPEG bytes → (H, W, 3) uint8 RGB (grayscale
    streams return the Y plane replicated)."""
    assert content[:2] == b"\xFF\xD8", "not JPEG"
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], list] = {}
    frame = None
    restart = 0
    while pos < len(content):
        while content[pos] == 0xFF and content[pos + 1] == 0xFF:
            pos += 1                          # fill bytes
        marker = struct.unpack_from(">H", content, pos)[0]
        pos += 2
        if marker == 0xFFD9:                  # EOI
            break
        ln = struct.unpack_from(">H", content, pos)[0]
        body = content[pos + 2:pos + ln]
        if marker == 0xFFDB:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                o += 1
                if pq:
                    t = np.frombuffer(body, dtype=">u2", count=64, offset=o)
                    o += 128
                else:
                    t = np.frombuffer(body, dtype=np.uint8, count=64,
                                      offset=o)
                    o += 64
                raster = np.zeros(64, dtype=np.int32)
                raster[ZZ] = t.astype(np.int32)
                qt[tq] = raster.reshape(8, 8)
        elif marker in (0xFFC0, 0xFFC1):      # baseline / ext sequential
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            assert prec == 8, "only 8-bit precision"
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xFFC2, 0xFFC9, 0xFFCA, 0xFFCB):
            raise ValueError("progressive/arithmetic JPEG not supported "
                             "(MJPEG is baseline)")
        elif marker == 0xFFC4:
            o = 0
            while o < len(body):
                cls, dest = body[o] >> 4, body[o] & 0xF
                bits = [0] + list(body[o + 1:o + 17])
                nv = sum(bits)
                vals = list(body[o + 17:o + 17 + nv])
                base = _huff_decode_table(bits, vals)
                huff[(cls, dest)] = [
                    None if r is None else (r[0], r[1], r[2], vals)
                    for r in base]
                o += 17 + nv
        elif marker == 0xFFDD:
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xFFDA:
            assert frame is not None, "SOS before SOF"
            ns = body[0]
            scomp = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                c = next(c for c in frame["comps"] if c["id"] == cs)
                scomp.append((c, tabs >> 4, tabs & 0xF))
            return _decode_scan(content, pos + ln, frame, scomp, qt, huff,
                                restart)
        pos += ln
    raise ValueError("no scan found")


def _decode_scan(buf: bytes, pos: int, frame: dict, scomp: list,
                 qt: dict, huff: dict, restart: int) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scomp)
    vmax = max(c["v"] for c, _, _ in scomp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = []
    for c, _, _ in scomp:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))

    # entropy pass: collect quantized coefficient blocks per component
    blocks = [[] for _ in scomp]
    br = _BitReader(buf, pos)
    pred = [0] * len(scomp)
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            br.align_restart()
            pred = [0] * len(scomp)
        for ci, (c, dc_id, ac_id) in enumerate(scomp):
            for _ in range(c["v"] * c["h"]):
                blk = np.zeros(64, dtype=np.int64)
                size = _decode_huff(br, huff[(0, dc_id)])
                if size:
                    pred[ci] += _extend(br.bits(size), size)
                blk[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = _decode_huff(br, huff[(1, ac_id)])
                    if rs == 0x00:             # EOB
                        break
                    run, size = rs >> 4, rs & 0xF
                    if size == 0:
                        if run != 15:
                            raise ValueError("bad AC symbol")
                        k += 16                # ZRL
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC run past block end")
                    blk[k] = _extend(br.bits(size), size)
                    k += 1
                blocks[ci].append(blk)

    # batched dequant + IDCT + reassembly per component
    for ci, (c, _, _) in enumerate(scomp):
        q = qt[c["tq"]].astype(np.float64)
        bz = np.stack(blocks[ci]) if blocks[ci] else \
            np.zeros((0, 64), dtype=np.int64)
        raster = np.zeros((len(bz), 64), dtype=np.float64)
        raster[:, ZZ] = bz
        deq = raster.reshape(-1, 8, 8) * q
        pix = np.einsum("ji,njk,kl->nil", DCT, deq, DCT) + 128.0
        # block order inside the scan: per MCU, v rows × h cols
        k = 0
        plane = planes[ci]
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for vy in range(c["v"]):
                for vx in range(c["h"]):
                    y0 = (my * c["v"] + vy) * 8
                    x0 = (mx * c["h"] + vx) * 8
                    plane[y0:y0 + 8, x0:x0 + 8] = pix[k]
                    k += 1

    # upsample subsampled components to full MCU-grid resolution
    full = []
    for ci, (c, _, _) in enumerate(scomp):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])

    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
