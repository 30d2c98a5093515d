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


def decode_image(data: bytes) -> np.ndarray | None:
    """Decode a supported public format, or None for opaque payloads
    (the caller's stub path). Never raises on foreign magic bytes."""
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:8] == _PNG_SIG:
        return decode_png(data)
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
