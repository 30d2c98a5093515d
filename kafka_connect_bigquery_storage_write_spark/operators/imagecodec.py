"""Pure-numpy image codec for the multimodal kernels (VERDICT r5 #7).

No image library ships in this environment, but two PUBLIC formats are
simple enough to implement exactly from their specs, which turns the
multimodal pipeline's decode stage from a stub into a real kernel for
those formats while the opaque-bytes stub remains for everything else:

- PPM (P6, Netpbm): ASCII header ``P6 <w> <h> <maxval>`` with ``#``
  comments, then raw RGB bytes (1 byte/channel for maxval <= 255).
- BMP (Windows, BITMAPINFOHEADER, 24-bit uncompressed BI_RGB): 14-byte
  file header + 40-byte DIB header, BGR pixel rows bottom-up (top-down
  when height is negative), each row padded to a 4-byte boundary.
- PNG (W3C/RFC 2083, round 7): 8-bit RGB/RGBA non-interlaced — chunk
  walk, multi-IDAT zlib inflate (stdlib), and per-row unfiltering of
  all five filter types (None/Sub/Up/Average/Paeth).

Everything operates on ``np.ndarray`` of shape (h, w, 3) dtype uint8 in
RGB order. ``bilinear_resize`` uses the half-pixel-center convention
(src = (dst + 0.5) * scale - 0.5, edge-clamped) with round-half-up to
uint8 — fully deterministic, pinned against a naive per-pixel reference
implementation in tests/test_imagecodec.py.
"""

from __future__ import annotations

import struct

import numpy as np


def _ppm_tokens(data: bytes, n: int) -> tuple[list[int], int]:
    """First ``n`` whitespace-separated integer tokens after the magic,
    honoring ``#`` comments; returns (tokens, offset_of_pixel_data)."""
    toks: list[int] = []
    i = 2  # past 'P6'
    while len(toks) < n:
        if i >= len(data):
            raise ValueError("truncated PPM header")
        c = data[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < len(data) and not data[j : j + 1].isspace():
                j += 1
            toks.append(int(data[i:j]))
            i = j
    # exactly one whitespace byte separates the header from pixel data
    return toks, i + 1


def decode_ppm(data: bytes) -> np.ndarray:
    if data[:2] != b"P6":
        raise ValueError("not a binary PPM (P6)")
    (w, h, maxval), off = _ppm_tokens(data, 3)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (1-byte samples only)")
    need = w * h * 3
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    return px.reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_offset,) = struct.unpack_from("<I", data, 10)
    (dib_size, w, h_signed) = struct.unpack_from("<Iii", data, 14)
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp}, compression={compression})")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    row_bytes = (w * 3 + 3) & ~3  # 4-byte row padding
    rows = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=data_offset).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]  # stored bottom-up
    return bgr[..., ::-1].copy()  # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    padded = np.zeros((h, row_bytes), dtype=np.uint8)
    padded[:, : w * 3] = np.ascontiguousarray(img[..., ::-1], dtype=np.uint8).reshape(h, w * 3)
    pixel_data = padded[::-1].tobytes()  # bottom-up
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return header + dib + pixel_data


# -- PNG (VERDICT r6 #6): public spec (RFC 2083 / W3C PNG), stdlib zlib --

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor, exactly as specified (left, up, up-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit RGB/RGBA non-interlaced PNG to (h, w, 3) uint8.

    Full spec path for the supported subset: chunk walk, IHDR validation,
    multi-IDAT concatenation, zlib inflate, and per-row unfiltering of
    all five filter types (None/Sub/Up/Average/Paeth). RGBA input drops
    the alpha plane after unfiltering (the (h, w, 3) kernel contract —
    alpha participates in filtering as the spec requires, so it cannot
    simply be skipped during the unfilter pass).
    """
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, bit_depth, color_type, compression, filter_method, interlace = ihdr
    if bit_depth != 8 or color_type not in (2, 6) or compression != 0 or filter_method != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bit_depth={bit_depth}, color_type={color_type}, interlace={interlace}); "
            "only 8-bit RGB/RGBA non-interlaced is implemented"
        )
    ch = 3 if color_type == 2 else 4
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = raw[y * (1 + stride)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1).astype(np.int64)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prior) & 0xFF
        else:
            # Sub/Average/Paeth depend on the just-reconstructed left
            # neighbor — inherently sequential along the row
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prior[x]
                if ftype == 1:  # Sub
                    rec[x] = (line[x] + a) & 0xFF
                elif ftype == 3:  # Average
                    rec[x] = (line[x] + (a + b) // 2) & 0xFF
                elif ftype == 4:  # Paeth
                    c = prior[x - ch] if x >= ch else 0
                    rec[x] = (line[x] + _paeth(int(a), int(b), int(c))) & 0xFF
                else:
                    raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    px = out.reshape(h, w, ch)
    return px[..., :3].copy()


def encode_png(img: np.ndarray, filter_mode: str | int = "mixed") -> bytes:
    """Encode (h, w, 3) uint8 RGB as a non-interlaced 8-bit PNG.

    ``filter_mode``: an int 0-4 applies that row filter everywhere;
    "mixed" (default) cycles filter type ``y % 5`` so a round-trip
    exercises EVERY unfilter branch of ``decode_png`` — the encoder
    exists to drive the decoder's oracle, so it deliberately produces
    all five filter types rather than the compression-optimal choice.
    """
    import zlib

    h, w = img.shape[:2]
    px = np.ascontiguousarray(img, dtype=np.uint8).astype(np.int64).reshape(h, w * 3)
    ch = 3
    lines = []
    prior = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        ftype = (y % 5) if filter_mode == "mixed" else int(filter_mode)
        rec = px[y]
        left = np.concatenate([np.zeros(ch, dtype=np.int64), rec[:-ch]])
        if ftype == 0:
            filt = rec
        elif ftype == 1:
            filt = (rec - left) & 0xFF
        elif ftype == 2:
            filt = (rec - prior) & 0xFF
        elif ftype == 3:
            filt = (rec - (left + prior) // 2) & 0xFF
        elif ftype == 4:
            upleft = np.concatenate([np.zeros(ch, dtype=np.int64), prior[:-ch]])
            pred = np.array(
                [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prior, upleft)], dtype=np.int64
            )
            filt = (rec - pred) & 0xFF
        else:
            raise ValueError(f"invalid filter_mode {filter_mode}")
        lines.append(bytes([ftype]) + filt.astype(np.uint8).tobytes())
        prior = rec

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", zlib.crc32(ctype + body))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


# ---- JPEG (ITU-T T.81 baseline, grayscale, round 8) -------------------------
#
# Baseline sequential DCT, 8-bit, single component: JFIF/APP0, DQT, SOF0,
# DHT (Annex K standard luminance tables, built from their (BITS, HUFFVAL)
# spec lists by the canonical-code algorithm of §C.2), SOS, entropy-coded
# segment with 0xFF00 byte stuffing, EOI. Forward/inverse DCT are the
# orthonormal matrix form (D f D^T / D^T F D with D[u,x] =
# c(u)/2 * cos((2x+1)u*pi/16), c(0)=1/sqrt(2)); DC is differentially coded,
# AC run-length coded with ZRL/EOB in zigzag order (generated
# programmatically from the diagonal walk, not transcribed).
#
# Lossy in general — but a block-constant image quantized with a DC step
# dividing 8*(v-128) round-trips EXACTLY (only the DC coefficient is
# nonzero and its quantization is lossless), which is what lets q165 oracle
# a lossy container with closed-form integer pixel sums. Encoder exists to
# drive the decoder (the PNG pattern); both ends verified in
# tests/test_imagecodec.py against naive references (O(n^4) DCT loop,
# independent canonical-code construction) and exactness/err-bound pins.

_JPEG_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_JPEG_DC_VALS = tuple(range(12))
_JPEG_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_JPEG_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)


def _jpeg_zigzag() -> np.ndarray:
    """Zigzag scan order as flat row-major indices, generated from the
    diagonal walk (even diagonals ascend, odd descend) — no transcribed
    64-entry table to get wrong."""
    order = []
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 else range(max(0, s - 7), min(s, 7) + 1)
        for r in rng:
            order.append(r * 8 + (s - r))
    return np.array(order, dtype=np.int64)


_ZZ = _jpeg_zigzag()


def _jpeg_dct_matrix() -> np.ndarray:
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    d = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    d[0, :] *= 1 / np.sqrt(2)
    return d


_DCT = _jpeg_dct_matrix()


def _jpeg_codes(bits: tuple, vals: tuple) -> dict[int, tuple[int, int]]:
    """Canonical Huffman codes per T.81 §C.2: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy segment")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside entropy segment")
                self.pos += 1  # consume the stuffed zero
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """(category size, amplitude bits) per T.81 §F.1.2.1."""
    size = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def encode_jpeg_gray(img: np.ndarray, qtable: np.ndarray | int = 8) -> bytes:
    """Encode a 2-D uint8 grayscale image as baseline JFIF. ``qtable`` is
    a scalar (uniform steps) or a 64-entry table in NATURAL (row-major)
    order. Edge-replicated padding to 8x8 multiples; SOF0 records the true
    dimensions so the decoder crops."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg_gray wants a 2-D uint8 array")
    h, w = img.shape
    q = (np.full(64, int(qtable)) if np.isscalar(qtable) else np.asarray(qtable, dtype=np.int64).reshape(64))
    if (q < 1).any() or (q > 255).any():
        raise ValueError("qtable entries must be in 1..255")
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    dc_codes = _jpeg_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _BitWriter()
    qgrid = q.reshape(8, 8)
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coef = _DCT @ block @ _DCT.T
            quant = np.round(coef / qgrid).astype(np.int64)
            zz = quant.reshape(64)[_ZZ]
            size, bits = _magnitude(int(zz[0]) - prev_dc)
            prev_dc = int(zz[0])
            c, ln = dc_codes[size]
            bw.put(c, ln)
            if size:
                bw.put(bits, size)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]  # ZRL
                    bw.put(c, ln)
                    run -= 16
                size, bits = _magnitude(v)
                c, ln = ac_codes[(run << 4) | size]
                bw.put(c, ln)
                bw.put(bits, size)
                run = 0
            if run:
                c, ln = ac_codes[0x00]  # EOB
                bw.put(c, ln)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + q[_ZZ].astype(np.uint8).tobytes())
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += seg(0xFFC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    return out + entropy + b"\xff\xd9"  # EOI


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """Decode baseline JFIF grayscale (single component, no restart
    markers) to a 2-D uint8 array. Marker walk + canonical Huffman decode
    + dequant + IDCT, all pure numpy/stdlib."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = -1
    qsel = dcsel = acsel = 0
    i = 2
    entropy_start = -1
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI without SOS
            break
        ln = struct.unpack(">H", data[i + 2 : i + 4])[0]
        body = data[i + 4 : i + 2 + ln]
        i += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables)
            j = 0
            while j < len(body):
                if body[j] >> 4 != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline is 8-bit)")
                tid = body[j] & 0x0F
                zz = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8).astype(np.int64)
                nat = np.empty(64, dtype=np.int64)
                nat[_ZZ] = zz
                qtables[tid] = nat.reshape(8, 8)
                j += 65
        elif marker == 0xC0:  # SOF0
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise ValueError("decode_jpeg_gray supports 8-bit single-component baseline only")
            if body[7] != 0x11:
                raise ValueError("subsampling other than 1x1 unsupported")
            qsel = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("not baseline sequential (SOF0)")
        elif marker == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0x0F
                bits = tuple(body[j + 1 : j + 17])
                n = sum(bits)
                vals = tuple(body[j + 17 : j + 17 + n])
                huff[(cls, tid)] = {(c, ln_): s for s, (c, ln_) in _jpeg_codes(bits, vals).items()}
                j += 17 + n
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            if body[0] != 1:
                raise ValueError("single-component scan expected")
            dcsel, acsel = body[2] >> 4, body[2] & 0x0F
            entropy_start = i
            break
        # APPn/COM/others: skipped via their length field
    if entropy_start < 0 or h < 0:
        raise ValueError("missing SOS/SOF0")
    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    br = _BitReader(data[entropy_start:end])

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | br.bit()
            ln += 1
            s = table.get((code, ln))
            if s is not None:
                return s
        raise ValueError("invalid Huffman code")

    dct, act = huff[(0, dcsel)], huff[(1, acsel)]
    qgrid = qtables[qsel].astype(np.float64)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    out = np.empty((ph, pw), dtype=np.uint8)
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            zz = np.zeros(64, dtype=np.int64)
            size = read_symbol(dct)
            prev_dc += _extend(br.bits(size), size)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = read_symbol(act)
                if rs == 0x00:  # EOB
                    break
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run != 15:
                        raise ValueError("invalid AC run/size")
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC coefficient index out of range")
                zz[k] = _extend(br.bits(size), size)
                k += 1
            nat = np.empty(64, dtype=np.float64)
            nat[_ZZ] = zz
            coef = nat.reshape(8, 8) * qgrid
            block = _DCT.T @ coef @ _DCT + 128.0
            out[by : by + 8, bx : bx + 8] = np.clip(np.round(block), 0, 255).astype(np.uint8)
    return out[:h, :w]


def decode_image(data: bytes) -> np.ndarray | None:
    """Decode a supported public format, or None for opaque payloads
    (the caller's stub path). Never raises on foreign magic bytes."""
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        g = decode_jpeg_gray(data)
        return np.repeat(g[:, :, None], 3, axis=2)
    return None


def bilinear_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Half-pixel-center bilinear resample, edge-clamped, round-half-up."""
    h, w = img.shape[:2]
    ys = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    p = img.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.floor(out + 0.5).astype(np.uint8)


def box_downsample(img: np.ndarray, factor: int) -> np.ndarray:
    """Integer box-filter (area) downsample by an exact divisor.

    Each ``factor x factor`` block collapses to the floor of its mean —
    pure integer arithmetic, so the result is bit-reproducible across
    platforms and expressible in SQL (the q192 oracle recomputes it from
    the planted pixel formula). This is the thumbnailing resample every
    image-curation pipeline runs before feature extraction; for
    non-divisor targets use :func:`bilinear_resize`.
    """
    h, w = img.shape[:2]
    if factor <= 0 or h % factor or w % factor:
        raise ValueError(f"factor {factor} must evenly divide {h}x{w}")
    c = img.shape[2] if img.ndim == 3 else 1
    blocks = img.reshape(h // factor, factor, w // factor, factor, c).astype(np.int64)
    out = blocks.sum(axis=(1, 3)) // (factor * factor)
    out = out.astype(np.uint8)
    return out if img.ndim == 3 else out[..., 0]


def image_features(img: np.ndarray, dim: int = 64) -> np.ndarray:
    """Deterministic pixel feature: resize to the smallest square grid
    covering ``dim``, integer luma (299/587/114 per mille, floor), first
    ``dim`` values scaled to [0,1], unit-normalized. A real encoder slots
    in above this; the point is a decode-sensitive, reproducible vector."""
    g = int(np.ceil(np.sqrt(dim)))
    small = bilinear_resize(img, g, g).astype(np.int64)
    luma = (small[..., 0] * 299 + small[..., 1] * 587 + small[..., 2] * 114) // 1000
    v = luma.reshape(-1)[:dim].astype(np.float64) / 255.0
    n = np.linalg.norm(v)
    if n == 0.0:
        v = np.zeros(dim)
        v[0] = 1.0
        return v
    return v / n


def equalize_hist(img: np.ndarray) -> np.ndarray:
    """Global histogram equalization per channel, integer-exact: the
    standard contrast-normalization step of an image curation pipeline,
    with the remap defined as

        out(v) = ((cdf(v) - cdf_min) * 255) // (N - cdf_min)

    — floor division on non-negative integers, so the result is
    bit-reproducible and SQL-expressible (the q202 oracle recomputes the
    identical cdf remap from the planted pixel formula). cdf_min is the
    count of the smallest occupied bin (Gonzalez-Woods form); a constant
    channel (N == cdf_min) maps to 0.
    """
    if img.ndim == 2:
        img = img[:, :, None]
        squeeze = True
    else:
        squeeze = False
    out = np.empty_like(img)
    n = img.shape[0] * img.shape[1]
    for c in range(img.shape[2]):
        chan = img[:, :, c]
        hist = np.bincount(chan.reshape(-1), minlength=256).astype(np.int64)
        cdf = hist.cumsum()
        nz = np.nonzero(hist)[0]
        cdf_min = int(cdf[nz[0]]) if nz.size else 0
        denom = n - cdf_min
        if denom <= 0:
            lut = np.zeros(256, dtype=np.int64)
        else:
            lut = ((cdf - cdf_min) * 255) // denom
            lut = np.clip(lut, 0, 255)
        out[:, :, c] = lut[chan].astype(img.dtype)
    return out[:, :, 0] if squeeze else out
