"""Pure-numpy image codec exactness (VERDICT r5 #7): every kernel is
pinned against a naive handwritten reference implementation — the
vectorized decode/resize must be byte-identical to the spec read off
per pixel in plain Python loops."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kafka_connect_bigquery_storage_write_spark.operators.imagecodec import (
    bilinear_resize,
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
    encode_ppm,
    image_features,
)


def _gradient(w, h, seed=0):
    idx = np.arange(h * w * 3, dtype=np.int64)
    return ((seed * 7 + idx * 13) % 256).astype(np.uint8).reshape(h, w, 3)


# -- reference decoders: naive loops straight off the format specs -------


def _ref_decode_ppm(data: bytes) -> np.ndarray:
    # tokenize header by hand (no comments in test inputs built this way)
    parts = data.split(maxsplit=4)
    assert parts[0] == b"P6"
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    assert maxval == 255
    # pixel data = everything after the single whitespace following maxval
    header_len = data.index(parts[3], 2) + len(parts[3]) + 1
    px = data[header_len : header_len + w * h * 3]
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            for c in range(3):
                out[y, x, c] = px[(y * w + x) * 3 + c]
    return out


def _ref_decode_bmp(data: bytes) -> np.ndarray:
    assert data[:2] == b"BM"
    (off,) = struct.unpack_from("<I", data, 10)
    _, w, hs = struct.unpack_from("<Iii", data, 14)
    h = abs(hs)
    row_bytes = (w * 3 + 3) // 4 * 4
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        src_row = (h - 1 - y) if hs > 0 else y  # bottom-up storage
        base = off + src_row * row_bytes
        for x in range(w):
            b, g, r = data[base + x * 3 : base + x * 3 + 3]
            out[y, x] = (r, g, b)
    return out


def _ref_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = img.shape[:2]
    out = np.zeros((out_h, out_w, 3), dtype=np.uint8)
    for oy in range(out_h):
        sy = min(max((oy + 0.5) * h / out_h - 0.5, 0), h - 1)
        y0 = int(np.floor(sy))
        y1 = min(y0 + 1, h - 1)
        fy = sy - y0
        for ox in range(out_w):
            sx = min(max((ox + 0.5) * w / out_w - 0.5, 0), w - 1)
            x0 = int(np.floor(sx))
            x1 = min(x0 + 1, w - 1)
            fx = sx - x0
            for c in range(3):
                top = img[y0, x0, c] * (1 - fx) + img[y0, x1, c] * fx
                bot = img[y1, x0, c] * (1 - fx) + img[y1, x1, c] * fx
                out[oy, ox, c] = int(np.floor(top * (1 - fy) + bot * fy + 0.5))
    return out


# -- exactness pins -------------------------------------------------------


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (64, 48), (5, 7)])
def test_ppm_roundtrip_and_reference_decode(w, h):
    img = _gradient(w, h, seed=w * h)
    data = encode_ppm(img)
    assert np.array_equal(decode_ppm(data), img)
    assert np.array_equal(decode_ppm(data), _ref_decode_ppm(data))


def test_ppm_header_comments_and_whitespace():
    img = _gradient(4, 3)
    data = b"P6  # comment\n# another comment\n 4\t3 \n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(data), img)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (64, 48), (5, 7)])
def test_bmp_roundtrip_and_reference_decode(w, h):
    """w=3,5 exercise non-zero row padding; decode must match the naive
    bottom-up BGR reference byte for byte."""
    img = _gradient(w, h, seed=w + h)
    data = encode_bmp(img)
    assert np.array_equal(decode_bmp(data), img)
    assert np.array_equal(decode_bmp(data), _ref_decode_bmp(data))


def test_bmp_top_down_negative_height():
    img = _gradient(4, 2)
    data = bytearray(encode_bmp(img))
    # rewrite as top-down: negate height, reverse the stored row order
    (off,) = struct.unpack_from("<I", bytes(data), 10)
    _, w, h = struct.unpack_from("<Iii", bytes(data), 14)
    struct.pack_into("<i", data, 22, -h)
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = [bytes(data[off + i * row_bytes : off + (i + 1) * row_bytes]) for i in range(h)]
    data[off:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(data)), img)


def test_decode_image_dispatch():
    img = _gradient(8, 8)
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    assert np.array_equal(decode_image(encode_png(img)), img)  # round-7: real PNG path
    assert decode_image(b"\xff\xd8\xff\xe0 jpeg-is-not-implemented") is None
    assert decode_image(b"") is None


@pytest.mark.parametrize("shape", [((64, 48), (8, 8)), ((5, 7), (16, 3)), ((9, 9), (9, 9)), ((2, 2), (4, 4))])
def test_bilinear_matches_naive_reference(shape):
    (w, h), (ow, oh) = shape
    img = _gradient(w, h, seed=ow)
    assert np.array_equal(bilinear_resize(img, ow, oh), _ref_bilinear(img, ow, oh))


def test_identity_resize_is_exact():
    img = _gradient(10, 6)
    assert np.array_equal(bilinear_resize(img, 10, 6), img)


def test_features_unit_norm_and_decode_sensitivity():
    a = image_features(_gradient(64, 48, seed=1))
    b = image_features(_gradient(64, 48, seed=2))
    assert a.shape == (64,)
    assert abs(np.linalg.norm(a) - 1.0) < 1e-12
    assert not np.array_equal(a, b)
    # identical pixels through either container format -> identical features
    img = _gradient(32, 32, seed=3)
    from kafka_connect_bigquery_storage_write_spark.operators.multimodal import _default_feature_kernel

    assert _default_feature_kernel(encode_ppm(img), 64) == _default_feature_kernel(encode_bmp(img), 64)


# -- property-based roundtrips (hypothesis) --------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _images(draw):
    w = draw(st.integers(min_value=1, max_value=24))
    h = draw(st.integers(min_value=1, max_value=24))
    n = w * h * 3
    data = draw(st.binary(min_size=n, max_size=n))
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3).copy()


@settings(max_examples=60, deadline=None)
@given(_images())
def test_ppm_roundtrip_property(img):
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


@settings(max_examples=60, deadline=None)
@given(_images())
def test_bmp_roundtrip_property(img):
    # exercises every row-padding residue (w mod 4) and arbitrary bytes
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=30, deadline=None)
@given(_images(), st.integers(min_value=1, max_value=16), st.integers(min_value=1, max_value=16))
def test_bilinear_property_matches_reference(img, ow, oh):
    assert np.array_equal(bilinear_resize(img, ow, oh), _ref_bilinear(img, ow, oh))


# -- PNG (round 7): reference unfilter straight off the W3C spec ----------


def _ref_decode_png(data: bytes) -> np.ndarray:
    import struct as _s
    import zlib

    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat = 8, b""
    while pos < len(data):
        (ln,) = _s.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, inter = _s.unpack(">IIBBBBB", body)
            assert depth == 8 and color in (2, 6) and inter == 0
            ch = 3 if color == 2 else 4
        elif ctype == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * ch
    rec = [[0] * stride for _ in range(h)]
    for y in range(h):
        ftype = raw[y * (1 + stride)]
        line = raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)]
        for x in range(stride):
            a = rec[y][x - ch] if x >= ch else 0
            b = rec[y - 1][x] if y > 0 else 0
            c = rec[y - 1][x - ch] if (y > 0 and x >= ch) else 0
            if ftype == 0:
                v = line[x]
            elif ftype == 1:
                v = line[x] + a
            elif ftype == 2:
                v = line[x] + b
            elif ftype == 3:
                v = line[x] + (a + b) // 2
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = line[x] + pred
            rec[y][x] = v & 0xFF
    arr = np.array(rec, dtype=np.uint8).reshape(h, w, ch)
    return arr[..., :3].copy()


@pytest.mark.parametrize("filter_mode", [0, 1, 2, 3, 4, "mixed"])
def test_png_roundtrip_every_filter_type(filter_mode):
    img = _gradient(13, 11, seed=5)
    data = encode_png(img, filter_mode=filter_mode)
    assert np.array_equal(decode_png(data), img)
    assert np.array_equal(decode_png(data), _ref_decode_png(data))


def test_png_rgba_drops_alpha_after_unfilter():
    """Alpha must participate in the unfilter pass (spec: filtering is over
    the full scanline) and only then be dropped — a hand-built RGBA PNG
    with Sub/Paeth rows catches a decoder that strips alpha too early."""
    import struct as _s
    import zlib

    w, h, ch = 5, 4, 4
    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    # hand-filter: row y uses filter (y % 5), scalar spec math
    raw = b""
    rec = rgba.astype(np.int64).reshape(h, w * ch)
    for y in range(h):
        ftype = y % 5
        line = bytearray([ftype])
        for x in range(w * ch):
            a = rec[y][x - ch] if x >= ch else 0
            b = rec[y - 1][x] if y > 0 else 0
            c = rec[y - 1][x - ch] if (y > 0 and x >= ch) else 0
            if ftype == 0:
                f = rec[y][x]
            elif ftype == 1:
                f = rec[y][x] - a
            elif ftype == 2:
                f = rec[y][x] - b
            elif ftype == 3:
                f = rec[y][x] - (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                f = rec[y][x] - pred
            line.append(f & 0xFF)
        raw += bytes(line)

    def chunk(ctype, body):
        return _s.pack(">I", len(body)) + ctype + body + _s.pack(">I", zlib.crc32(ctype + body))

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), rgba[..., :3])
    assert np.array_equal(decode_png(data), _ref_decode_png(data))


def test_png_multi_idat_and_dispatch():
    import struct as _s
    import zlib

    img = _gradient(8, 6, seed=3)
    data = encode_png(img, filter_mode="mixed")
    # split the single IDAT into two chunks (spec: IDAT data concatenates)
    pos = 8
    parts = {}
    order = []
    while pos < len(data):
        (ln,) = _s.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        parts[ctype] = data[pos + 8 : pos + 8 + ln]
        order.append(ctype)
        pos += 12 + ln

    def chunk(ctype, body):
        return _s.pack(">I", len(body)) + ctype + body + _s.pack(">I", zlib.crc32(ctype + body))

    idat = parts[b"IDAT"]
    split = (
        data[:8]
        + chunk(b"IHDR", parts[b"IHDR"])
        + chunk(b"IDAT", idat[: len(idat) // 2])
        + chunk(b"IDAT", idat[len(idat) // 2 :])
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(split), img)
    # dispatch recognizes the signature; unsupported configs raise loudly
    assert np.array_equal(decode_image(data), img)
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(
            data[:8]
            + chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))  # palette color type
            + chunk(b"IEND", b"")
        )


@settings(max_examples=40, deadline=None)
@given(_images())
def test_png_roundtrip_property(img):
    assert np.array_equal(decode_png(encode_png(img, filter_mode="mixed")), img)


def test_q161_planted_patterns_have_distinct_ahashes():
    """q161's oracle equates aHash groups with doc_id%40 residue classes;
    that only holds if the 40 planted pixel patterns produce 40 DISTINCT
    aHashes through every container format. Pins the invariant, and that
    the hash is container-independent (same pixels -> same hash via PPM,
    BMP and PNG)."""
    from kafka_connect_bigquery_storage_write_spark.operators.imagecodec import (
        decode_image,
        encode_bmp,
        encode_png,
        encode_ppm,
    )

    H_, W_ = 24, 32
    idx = np.arange(H_ * W_ * 3, dtype=np.int64)

    def ahash(payload: bytes) -> int:
        dec = decode_image(payload).astype(np.int64)
        gray = dec.sum(axis=2)
        cells = gray.reshape(8, H_ // 8, 8, W_ // 8).sum(axis=(1, 3))
        total = int(gray.sum())
        h = 0
        for k, b in enumerate(cells.reshape(-1) * 64 > total):
            if b:
                h |= 1 << k
        return h

    seen = set()
    for g in range(40):
        img = ((g * 7 + idx * 13) % 256).astype(np.uint8).reshape(H_, W_, 3)
        hs = {ahash(encode_ppm(img)), ahash(encode_bmp(img)), ahash(encode_png(img, filter_mode="mixed"))}
        assert len(hs) == 1, f"container-dependent aHash for pattern {g}"
        seen.add(hs.pop())
    assert len(seen) == 40
