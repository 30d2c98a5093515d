"""Pure-numpy Y4M (YUV4MPEG2) video codec — third real modality beside
operators/imagecodec.py (PPM/BMP/PNG) and operators/audiocodec.py (WAV),
same pattern: a PUBLIC container simple enough to implement exactly from
its spec, so the multimodal pipeline's video decode / frame-sample stage
is a real kernel while compressed codecs (h264/vp9/...) keep the opaque
stub path.

YUV4MPEG2 (the mjpegtools/ffmpeg uncompressed interchange format):

    "YUV4MPEG2" + space-separated tagged params (W<width> H<height>
    F<num>:<den> [Ip A1:1 C<chroma>]) terminated by '\\n', then per
    frame: "FRAME" [params] '\\n' + raw planar YUV bytes.

Supported chroma: C444 (full planes — w*h bytes each of Y, Cb, Cr) and
C420jpeg/C420 (Cb/Cr subsampled to (w/2)*(h/2)). Frames decode to
uint8 planar arrays; every feature is exact-integer so engines agree
bit-for-bit (the imagecodec/audiocodec rule).
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def _plane_sizes(w: int, h: int, chroma: str) -> tuple[int, int]:
    if chroma == "444":
        return w * h, w * h
    if chroma in ("420", "420jpeg", "420mpeg2", "420paldv"):
        if w % 2 or h % 2:
            raise ValueError("C420 requires even dimensions")
        return w * h, (w // 2) * (h // 2)
    raise ValueError(f"unsupported chroma C{chroma} (444/420 families only)")


def decode_y4m(data: bytes) -> tuple[list[dict], int, int, str]:
    """Decode a Y4M stream -> (frames, w, h, chroma); each frame is
    {"y": (h,w) uint8, "cb": (hc,wc) uint8, "cr": (hc,wc) uint8}."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    chroma = "420jpeg"  # spec default
    for tag in data[len(_MAGIC) : nl].split():
        t, v = chr(tag[0]), tag[1:].decode()
        if t == "W":
            w = int(v)
        elif t == "H":
            h = int(v)
        elif t == "C":
            chroma = v
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    y_sz, c_sz = _plane_sizes(w, h, chroma)
    wc = w if chroma == "444" else w // 2
    hc = h if chroma == "444" else h // 2
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt FRAME header")
        pos = fnl + 1
        if pos + y_sz + 2 * c_sz > len(data):
            raise ValueError("truncated frame payload")
        y = np.frombuffer(data, np.uint8, y_sz, pos).reshape(h, w)
        cb = np.frombuffer(data, np.uint8, c_sz, pos + y_sz).reshape(hc, wc)
        cr = np.frombuffer(data, np.uint8, c_sz, pos + y_sz + c_sz).reshape(hc, wc)
        frames.append({"y": y.copy(), "cb": cb.copy(), "cr": cr.copy()})
        pos += y_sz + 2 * c_sz
    return frames, w, h, chroma


def encode_y4m(frames: list[dict], w: int, h: int, chroma: str = "444", fps: tuple[int, int] = (25, 1)) -> bytes:
    """Encode planar frames as a spec-exact Y4M stream."""
    _plane_sizes(w, h, chroma)  # validate
    out = bytearray(b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n" % (w, h, fps[0], fps[1], chroma.encode()))
    for f in frames:
        out += b"FRAME\n"
        for plane in ("y", "cb", "cr"):
            out += np.ascontiguousarray(f[plane], dtype=np.uint8).tobytes()
    return bytes(out)


def decode_video(data: bytes):
    """Decode a supported container, or None for opaque payloads (the
    caller's stub path). Never raises on foreign magic bytes."""
    if data[: len(_MAGIC)] == _MAGIC:
        return decode_y4m(data)
    return None


def frame_sample(frames: list[dict], every: int) -> list[dict]:
    """Every ``every``-th frame starting at 0 — the decode-side sampling
    a video-training pipeline applies before feature extraction."""
    if every <= 0:
        raise ValueError("every must be positive")
    return frames[::every]


def frame_luma_stats(frames: list[dict]) -> np.ndarray:
    """(n_frames, 2) int64: per-frame Y-plane sum and sum-of-squares —
    the exact-integer brightness/contrast series scene-cut detection
    thresholds on."""
    out = np.zeros((len(frames), 2), dtype=np.int64)
    for i, f in enumerate(frames):
        y = f["y"].astype(np.int64)
        out[i, 0] = int(y.sum())
        out[i, 1] = int((y * y).sum())
    return out
