"""Y4M codec exactness: pinned against a naive per-byte reference
decoder straight off the YUV4MPEG2 spec (the imagecodec/audiocodec
pattern, third modality)."""

from __future__ import annotations

import numpy as np
import pytest

from kafka_connect_bigquery_storage_write_spark.operators.videocodec import (
    decode_video,
    decode_y4m,
    encode_y4m,
    frame_luma_stats,
    frame_sample,
)


def _clip(n, w, h, seed=0):
    idx = np.arange(n * 3 * h * w, dtype=np.int64)
    flat = ((seed * 13 + idx * 7) % 256).astype(np.uint8).reshape(n, 3, h, w)
    return [{"y": f[0], "cb": f[1], "cr": f[2]} for f in flat]


def _ref_decode_y4m(data: bytes):
    """Naive scalar reference: header split, per-byte plane reads."""
    nl = data.index(b"\n")
    header = data[:nl].split()
    assert header[0] == b"YUV4MPEG2"
    params = {chr(t[0]): t[1:].decode() for t in header[1:]}
    w, h = int(params["W"]), int(params["H"])
    chroma = params.get("C", "420jpeg")
    wc, hc = (w, h) if chroma == "444" else (w // 2, h // 2)
    pos = nl + 1
    frames = []
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        assert data[pos:pos + 5] == b"FRAME"
        pos = fnl + 1
        planes = []
        for pw, ph in ((w, h), (wc, hc), (wc, hc)):
            out = np.zeros((ph, pw), dtype=np.uint8)
            for y in range(ph):
                for x in range(pw):
                    out[y, x] = data[pos + y * pw + x]
            planes.append(out)
            pos += pw * ph
        frames.append({"y": planes[0], "cb": planes[1], "cr": planes[2]})
    return frames, w, h, chroma


@pytest.mark.parametrize("chroma,w,h", [("444", 6, 4), ("420jpeg", 6, 4), ("444", 16, 12)])
def test_y4m_roundtrip_and_reference(chroma, w, h):
    frames = _clip(3, w, h, seed=9)
    if chroma != "444":  # subsample chroma planes for 420
        for f in frames:
            f["cb"] = f["cb"][: h // 2, : w // 2].copy()
            f["cr"] = f["cr"][: h // 2, : w // 2].copy()
    data = encode_y4m(frames, w, h, chroma=chroma)
    dec, dw, dh, dc = decode_y4m(data)
    assert (dw, dh, dc) == (w, h, chroma)
    ref, *_ = _ref_decode_y4m(data)
    assert len(dec) == len(ref) == 3
    for a, b, c in zip(dec, ref, frames):
        for plane in ("y", "cb", "cr"):
            assert np.array_equal(a[plane], c[plane])
            assert np.array_equal(a[plane], b[plane])


def test_frame_sample_and_luma_stats_exact():
    frames = _clip(7, 4, 4, seed=3)
    s = frame_sample(frames, every=3)
    assert [np.array_equal(a["y"], b["y"]) for a, b in zip(s, [frames[0], frames[3], frames[6]])] == [True] * 3
    stats = frame_luma_stats(s)
    for i, f in enumerate(s):
        y = f["y"].astype(np.int64)
        assert stats[i, 0] == y.sum() and stats[i, 1] == (y * y).sum()
    with pytest.raises(ValueError):
        frame_sample(frames, every=0)


def test_dispatch_and_corruption():
    frames = _clip(2, 4, 4)
    data = encode_y4m(frames, 4, 4, chroma="444")
    dec = decode_video(data)
    assert dec is not None and len(dec[0]) == 2
    assert decode_video(b"\x00\x00\x01\xba mpeg-ps-is-not-implemented") is None
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(data[:-5])
    with pytest.raises(ValueError, match="unsupported chroma"):
        encode_y4m(frames, 4, 4, chroma="422")
    with pytest.raises(ValueError, match="corrupt FRAME"):
        decode_y4m(data.replace(b"FRAME", b"FLAME", 1))
