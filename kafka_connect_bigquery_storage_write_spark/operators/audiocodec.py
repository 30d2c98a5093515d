"""Pure-numpy WAV/PCM audio codec (VERDICT r6 #7) — second real modality
beside operators/imagecodec.py, same pattern: a PUBLIC container format
(RIFF/WAVE, Microsoft/IBM spec) implemented exactly from its spec so the
multimodal pipeline's audio decode stage is a real kernel, while opaque
codecs (mp3/aac/...) keep the labeled stub path.

Supported subset: canonical RIFF little-endian WAVE with an uncompressed
16-bit PCM ``fmt `` chunk (wFormatTag=1), any channel count and sample
rate, chunk-walked so extra chunks (LIST, fact, ...) are skipped like a
real reader must. Samples are interleaved frames, decoded to an
``np.ndarray`` of shape (n_frames, n_channels) dtype int16.

Features are exact-integer (int64 sums of squares / zero crossings) so
any engine computes bit-identical values — the same cross-engine rule as
imagecodec's integer luma.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode 16-bit PCM WAVE to ((n_frames, n_channels) int16, rate).

    Walks the RIFF chunk list honoring the spec's word alignment (chunks
    pad to even byte boundaries); unknown chunks are skipped. Raises on
    non-PCM or non-16-bit payloads — those are the stub path's job.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("WAVE missing fmt/data chunk")
    wformat, n_ch, rate, _byte_rate, _block_align, bits = fmt
    if wformat != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (format={wformat}, bits={bits})")
    n_samples = len(pcm) // 2
    frames = n_samples // n_ch
    samples = np.frombuffer(pcm, dtype="<i2", count=frames * n_ch).reshape(frames, n_ch)
    return samples.astype(np.int16, copy=True), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode (n_frames, n_channels) int16 as canonical 16-bit PCM WAVE."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, n_ch = samples.shape
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    block_align = n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block_align, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_audio(data: bytes) -> tuple[np.ndarray, int] | None:
    """Decode a supported container, or None for opaque payloads (the
    caller's stub path). Never raises on foreign magic bytes."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return decode_wav(data)
    return None


def frame_energies(samples: np.ndarray, frame_len: int = 256) -> np.ndarray:
    """Exact int64 energy (sum of squared samples over all channels) per
    non-overlapping frame; the trailing partial frame is kept. The raw
    material for VAD/silence trimming and loudness features; integer so
    every engine agrees bit-for-bit."""
    if samples.ndim == 1:
        samples = samples[:, None]
    x = samples.astype(np.int64)
    n = x.shape[0]
    out = []
    for start in range(0, n, frame_len):
        seg = x[start : start + frame_len]
        out.append(int((seg * seg).sum()))
    return np.array(out, dtype=np.int64)


def zero_crossings(samples: np.ndarray) -> int:
    """Count of sign changes along each channel, summed (zero counts as
    non-negative, the common convention: crossing = sign(x[i]) !=
    sign(x[i+1]) with sign(0) = +1). Exact integer."""
    if samples.ndim == 1:
        samples = samples[:, None]
    s = np.where(samples >= 0, 1, -1)
    return int((s[1:] != s[:-1]).sum())


def audio_features(samples: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """Deterministic feature vector: ``dim`` equal spans of the signal,
    integer mean-square energy per span scaled by the global peak,
    unit-normalized — decode-sensitive and reproducible, the audio twin
    of imagecodec.image_features. A real embedding model slots in above."""
    if samples.ndim == 1:
        samples = samples[:, None]
    x = samples.astype(np.int64)
    n = max(1, x.shape[0])
    span = -(-n // dim)  # ceil
    e = np.zeros(dim, dtype=np.float64)
    for i in range(dim):
        seg = x[i * span : (i + 1) * span]
        if seg.size:
            e[i] = float((seg * seg).sum()) / seg.size
    peak = e.max()
    if peak == 0.0:
        v = np.zeros(dim)
        v[0] = 1.0
        return v
    v = e / peak
    return v / np.linalg.norm(v)


def audio_fingerprint(samples: np.ndarray, n_frames: int = 16) -> tuple[int, np.ndarray]:
    """Perceptual audio signature (round 8): split the interleaved signal
    into ``n_frames`` equal frames, take exact int64 frame energies, and
    set bit f when frame f's energy exceeds the clip mean
    (``e_f * n_frames > total`` — pure integers, the aHash rule on the
    energy envelope). Returns (signature, energy vector); the energies are
    the ~128-byte digest a near-dup verify compares, so payloads never
    need to cross an exchange. Robust to small re-encode noise by
    construction: a dither that cannot move a frame across the loud/quiet
    energy gap cannot flip a bit."""
    flat = samples.reshape(-1).astype(np.int64)
    frame_len = max(1, flat.size // n_frames)
    e = np.array(
        [int((flat[f * frame_len : (f + 1) * frame_len] ** 2).sum()) for f in range(n_frames)],
        dtype=np.int64,
    )
    total = int(e.sum())
    sig = 0
    for f in range(n_frames):
        if int(e[f]) * n_frames > total:
            sig |= 1 << f
    return sig, e


def decimate(samples: np.ndarray, factor: int) -> np.ndarray:
    """Integer box decimation by an exact divisor along the frame axis —
    the sample-rate reduction step of an audio curation pipeline (16k ->
    8k before feature extraction), as int16-exact arithmetic: each group
    of ``factor`` frames collapses per channel to floor(mean), computed
    in shifted unsigned space (u = v + 32768; out = sum(u)//factor -
    32768) so the division is on non-negative integers — where floor and
    truncation agree — making the result bit-reproducible and
    SQL-expressible (the q200 oracle recomputes it from the planted
    sample formula). A real anti-aliasing decimator slots in above this;
    the box mean is the first-order version with the same data movement.
    """
    n = samples.shape[0]
    if factor <= 0 or n % factor:
        raise ValueError(f"factor {factor} must evenly divide {n} frames")
    ch = samples.shape[1] if samples.ndim == 2 else 1
    u = samples.reshape(n // factor, factor, ch).astype(np.int64) + 32768
    out = u.sum(axis=1) // factor - 32768
    out = out.astype(np.int16)
    return out if samples.ndim == 2 else out[:, 0]
