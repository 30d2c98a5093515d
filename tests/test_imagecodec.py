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
    # round-8: JPEG dispatches to the real decoder (and raises on garbage
    # after valid SOI rather than silently returning None)
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-garbage")
    assert decode_image(b"GIF89a not-a-supported-format") is None
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
    BMP, PNG and baseline JPEG — the lossy container decodes these
    block-constant patterns EXACTLY, see encode_jpeg_gray)."""
    from kafka_connect_bigquery_storage_write_spark.operators.imagecodec import (
        decode_image,
        encode_bmp,
        encode_jpeg_gray,
        encode_png,
        encode_ppm,
    )

    H_, W_ = 24, 32
    blk = (np.arange(H_)[:, None] // 8) * (W_ // 8) + (np.arange(W_)[None, :] // 8)

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
        gray8 = ((53 * (g + blk) + 7 * g * blk) % 256).astype(np.uint8)
        img = np.repeat(gray8[:, :, None], 3, axis=2)
        hs = {
            ahash(encode_ppm(img)),
            ahash(encode_bmp(img)),
            ahash(encode_png(img, filter_mode="mixed")),
            ahash(encode_jpeg_gray(gray8, qtable=8)),
        }
        assert len(hs) == 1, f"container-dependent aHash for pattern {g}"
        seen.add(hs.pop())
    assert len(seen) == 40


# ---- baseline JPEG (round 8) -------------------------------------------------


def _naive_dct2(block: np.ndarray) -> np.ndarray:
    """O(n^4) textbook DCT-II with JPEG normalization — an independent
    reference for the codec's matrix form."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[x, y] * np.cos((2 * x + 1) * u * np.pi / 16) * np.cos((2 * y + 1) * v * np.pi / 16)
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            out[u, v] = 0.25 * cu * cv * s
    return out


def test_jpeg_dct_matrix_matches_naive_reference():
    from kafka_connect_bigquery_storage_write_spark.operators.imagecodec import _DCT

    rng = np.random.RandomState(3)
    block = rng.randint(-128, 128, (8, 8)).astype(np.float64)
    assert np.allclose(_DCT @ block @ _DCT.T, _naive_dct2(block), atol=1e-9)
    # and the inverse really inverts (orthonormal)
    assert np.allclose(_DCT.T @ (_DCT @ block @ _DCT.T) @ _DCT, block, atol=1e-9)


def test_jpeg_huffman_tables_are_canonical_and_prefix_free():
    """Independent check of the Annex-K table construction: code counts
    per length match BITS, codes are canonical (sorted, dense per length)
    and prefix-free."""
    from kafka_connect_bigquery_storage_write_spark.operators.imagecodec import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _jpeg_codes,
    )

    for bits, vals in [(_JPEG_DC_BITS, _JPEG_DC_VALS), (_JPEG_AC_BITS, _JPEG_AC_VALS)]:
        assert sum(bits) == len(vals)
        codes = _jpeg_codes(bits, vals)
        assert len(codes) == len(vals)
        by_len: dict[int, list[int]] = {}
        for _sym, (code, ln) in codes.items():
            by_len.setdefault(ln, []).append(code)
        for ln, cs in by_len.items():
            assert len(cs) == bits[ln - 1]
            assert sorted(cs) == list(range(min(cs), min(cs) + len(cs)))  # dense
        # prefix-free: no code is a prefix of a longer one
        all_codes = sorted((ln, c) for c, ln in codes.values())
        for i, (ln1, c1) in enumerate(all_codes):
            for ln2, c2 in all_codes[i + 1 :]:
                assert not (ln2 > ln1 and (c2 >> (ln2 - ln1)) == c1), "prefix violation"
    assert len(_JPEG_AC_VALS) == 162  # the Annex-K luminance AC table size


def test_jpeg_block_constant_roundtrip_is_exact():
    rng = np.random.RandomState(0)
    from kafka_connect_bigquery_storage_write_spark.operators.imagecodec import decode_jpeg_gray, encode_jpeg_gray

    img = np.repeat(np.repeat(rng.randint(0, 256, (3, 4)), 8, axis=0), 8, axis=1).astype(np.uint8)
    back = decode_jpeg_gray(encode_jpeg_gray(img, qtable=8))
    assert np.array_equal(back, img)


def test_jpeg_q1_roundtrip_error_bound_and_odd_dims():
    """With unit quantization the only loss is coefficient rounding; the
    reconstruction must stay within 2 grey levels everywhere, including
    edge-replicated padding of non-multiple-of-8 dimensions."""
    from kafka_connect_bigquery_storage_write_spark.operators.imagecodec import decode_jpeg_gray, encode_jpeg_gray

    rng = np.random.RandomState(7)
    for shape in [(24, 32), (13, 10), (8, 8), (1, 1), (9, 17)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        back = decode_jpeg_gray(encode_jpeg_gray(img, qtable=1))
        assert back.shape == shape
        assert np.abs(back.astype(int) - img.astype(int)).max() <= 2, shape


def test_jpeg_lossy_table_bounded_and_structure():
    """A real lossy table still reconstructs within the quant-step bound,
    and the container structure carries the mandatory baseline markers in
    order with stuffed entropy bytes."""
    from kafka_connect_bigquery_storage_write_spark.operators.imagecodec import decode_jpeg_gray, encode_jpeg_gray

    rng = np.random.RandomState(11)
    # smooth image: low-frequency content, tight bound under coarse quant
    y, x = np.mgrid[0:24, 0:32]
    img = (128 + 80 * np.sin(x / 7.0) * np.cos(y / 5.0)).astype(np.uint8)
    qt = np.full(64, 16, dtype=np.int64)
    qt[0] = 8
    data = encode_jpeg_gray(img, qtable=qt)
    back = decode_jpeg_gray(data)
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 24
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in data, marker
    # every 0xFF inside the entropy segment is stuffed (or the EOI)
    sos = data.index(b"\xff\xda")
    entropy = data[sos + 2 + int.from_bytes(data[sos + 2 : sos + 4], "big") : -2]
    i = 0
    while i < len(entropy):
        if entropy[i] == 0xFF:
            assert entropy[i + 1] == 0x00, "unstuffed 0xFF in entropy data"
            i += 2
        else:
            i += 1
    # noise image under the same table: decoder never crashes, output in range
    noisy = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(noisy, qtable=qt))
    assert out.shape == (16, 16) and out.dtype == np.uint8


def test_jpeg_decode_image_dispatch_replicates_channels():
    from kafka_connect_bigquery_storage_write_spark.operators.imagecodec import decode_image, encode_jpeg_gray

    img = np.full((8, 8), 77, dtype=np.uint8)
    out = decode_image(encode_jpeg_gray(img, qtable=8))
    assert out.shape == (8, 8, 3)
    assert (out == 77).all()


def test_jpeg_rejects_malformed():
    import pytest

    from kafka_connect_bigquery_storage_write_spark.operators.imagecodec import decode_jpeg_gray, encode_jpeg_gray

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"\x00\x01")
    img = np.full((8, 8), 10, dtype=np.uint8)
    data = bytearray(encode_jpeg_gray(img, qtable=8))
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(data[:-2]))  # EOI gone
    with pytest.raises(ValueError, match="2-D uint8"):
        encode_jpeg_gray(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="1..255"):
        encode_jpeg_gray(img, qtable=0)


def test_box_downsample_matches_naive_blocks():
    from kafka_connect_bigquery_storage_write_spark.operators.imagecodec import box_downsample

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(12, 8, 3), dtype=np.uint8)
    for f in (1, 2, 4):
        out = box_downsample(img, f)
        assert out.shape == (12 // f, 8 // f, 3)
        for y in range(12 // f):
            for x in range(8 // f):
                for c in range(3):
                    block = img[y * f : (y + 1) * f, x * f : (x + 1) * f, c].astype(np.int64)
                    assert out[y, x, c] == int(block.sum()) // (f * f)


def test_box_downsample_grayscale_and_bad_factor():
    from kafka_connect_bigquery_storage_write_spark.operators.imagecodec import box_downsample

    g = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = box_downsample(g, 2)
    assert out.shape == (2, 3)
    assert out[0, 0] == (0 + 1 + 6 + 7) // 4
    with pytest.raises(ValueError):
        box_downsample(g, 5)
    with pytest.raises(ValueError):
        box_downsample(g, 0)


def test_equalize_hist_matches_naive_and_edges():
    from kafka_connect_bigquery_storage_write_spark.operators.imagecodec import equalize_hist

    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    out = equalize_hist(img)
    n = 70
    for c in range(3):
        chan = img[:, :, c].ravel()
        hist = np.bincount(chan, minlength=256)
        cdf = hist.cumsum()
        cdf_min = cdf[np.nonzero(hist)[0][0]]
        for px, o in zip(chan, out[:, :, c].ravel()):
            assert o == ((cdf[px] - cdf_min) * 255) // (n - cdf_min)

    # constant channel: N == cdf_min -> all zeros, no div-by-zero
    flat = np.full((4, 4), 123, dtype=np.uint8)
    assert (equalize_hist(flat) == 0).all()
    # grayscale input keeps 2-D shape
    assert equalize_hist(img[:, :, 0]).shape == (10, 7)
