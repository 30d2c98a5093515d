"""WAV/PCM codec exactness (VERDICT r6 #7): pinned against a naive
handwritten reference decoder — the vectorized decode must be
sample-identical to the spec read off per byte in plain Python."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_bigquery_storage_write_spark.operators.audiocodec import (
    audio_features,
    decode_audio,
    decode_wav,
    encode_wav,
    frame_energies,
    zero_crossings,
)


def _signal(frames, ch, seed=0):
    idx = np.arange(frames * ch, dtype=np.int64)
    return ((seed * 31 + idx * 17) % 65536 - 32768).astype(np.int16).reshape(frames, ch)


# -- reference decoder: naive loops straight off the RIFF/WAVE spec -------


def _ref_decode_wav(data: bytes):
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + ln + (ln % 2)
    wformat, n_ch, rate, _, _, bits = fmt
    assert wformat == 1 and bits == 16
    frames = (len(pcm) // 2) // n_ch
    out = np.zeros((frames, n_ch), dtype=np.int16)
    for f in range(frames):
        for c in range(n_ch):
            off = (f * n_ch + c) * 2
            (v,) = struct.unpack_from("<h", pcm, off)
            out[f, c] = v
    return out, rate


@pytest.mark.parametrize("frames,ch", [(1, 1), (7, 2), (256, 1), (100, 4)])
def test_wav_roundtrip_and_reference_decode(frames, ch):
    sig = _signal(frames, ch, seed=frames * ch)
    data = encode_wav(sig, rate=44_100)
    dec, rate = decode_wav(data)
    assert rate == 44_100
    assert np.array_equal(dec, sig)
    ref, _ = _ref_decode_wav(data)
    assert np.array_equal(dec, ref)


def test_wav_chunk_walk_skips_unknown_and_honors_padding():
    """A real WAVE file interleaves LIST/fact/odd-length chunks; the
    walker must skip them and respect word alignment (odd chunk lengths
    pad one byte) to land on the true data chunk."""
    sig = _signal(16, 2, seed=3)
    pcm = np.ascontiguousarray(sig, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8_000, 8_000 * 4, 4, 16)
    odd = b"junk!"  # 5 bytes: forces the 1-byte pad
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", 4) + struct.pack("<I", 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    dec, rate = decode_wav(data)
    assert rate == 8_000 and np.array_equal(dec, sig)
    ref, _ = _ref_decode_wav(data)
    assert np.array_equal(dec, ref)


def test_wav_rejects_unsupported_and_dispatch():
    sig = _signal(4, 1)
    good = encode_wav(sig, rate=16_000)
    assert np.array_equal(decode_audio(good)[0], sig)
    assert decode_audio(b"ID3\x04 mp3-is-not-implemented") is None
    assert decode_audio(b"") is None
    # 8-bit / non-PCM fmt chunks must raise, not mis-decode
    bad_fmt = struct.pack("<HHIIHH", 1, 1, 8_000, 8_000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + bad_fmt + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    with pytest.raises(ValueError, match="16-bit PCM"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_frame_energies_and_zero_crossings_exact():
    sig = _signal(600, 2, seed=9)
    e = frame_energies(sig, frame_len=256)
    x = sig.astype(np.int64)
    # naive: 3 frames (256, 256, 88 — trailing partial kept)
    expect = [
        int((x[0:256] ** 2).sum()),
        int((x[256:512] ** 2).sum()),
        int((x[512:600] ** 2).sum()),
    ]
    assert e.tolist() == expect
    # zero crossings vs naive scalar count (sign(0) = +1 convention)
    naive = 0
    for c in range(2):
        for f in range(1, 600):
            s0 = 1 if sig[f - 1, c] >= 0 else -1
            s1 = 1 if sig[f, c] >= 0 else -1
            naive += s0 != s1
    assert zero_crossings(sig) == naive


def test_audio_features_unit_norm_and_decode_sensitivity():
    a = _signal(1000, 2, seed=1)
    b = _signal(1000, 2, seed=2)
    fa = audio_features(a, 16_000)
    fb = audio_features(b, 16_000)
    assert abs(np.linalg.norm(fa) - 1.0) < 1e-12
    assert not np.array_equal(fa, fb)
    # silence degenerates to the deterministic basis vector
    assert audio_features(np.zeros((100, 1), dtype=np.int16), 8_000)[0] == 1.0


@st.composite
def _signals(draw):
    frames = draw(st.integers(min_value=1, max_value=64))
    ch = draw(st.integers(min_value=1, max_value=4))
    n = frames * ch * 2
    data = draw(st.binary(min_size=n, max_size=n))
    return np.frombuffer(data, dtype="<i2").reshape(frames, ch).copy()


@settings(max_examples=60, deadline=None)
@given(_signals(), st.sampled_from([8_000, 16_000, 44_100]))
def test_wav_roundtrip_property(sig, rate):
    dec, r = decode_wav(encode_wav(sig, rate=rate))
    assert r == rate and np.array_equal(dec, sig)


def test_audio_fingerprint_recovers_planted_mask_and_survives_dither():
    """q166's foundation: with loud/quiet frames planted by a bit mask,
    the fingerprint equals the mask exactly (a loud frame beats the clip
    mean iff loud > quiet energy), for EVERY mask 1..40, and re-encode
    dither never flips a bit while staying inside the verify bound."""
    import numpy as np

    from kafka_connect_bigquery_storage_write_spark.operators.audiocodec import audio_fingerprint, decode_wav, encode_wav

    FRAMES, FRAME_LEN = 16, 128
    N = FRAMES * FRAME_LEN
    i = np.arange(N, dtype=np.int64)
    loud = ((i * 13) % 2048 - 1024) * 7
    quiet = (i * 11) % 128 - 64
    frame_of = i // FRAME_LEN
    sigs = set()
    for mask in range(1, 41):
        base = np.where(((mask >> frame_of) & 1) == 1, loud, quiet)
        envs = []
        for doc_id in (3, 44):  # two "re-encodes" of the same clip
            dither = (doc_id * 7 + i * 5) % 16 - 8
            clip = (base + dither).astype(np.int16)
            samples, rate = decode_wav(encode_wav(clip, rate=16_000))
            sig, e = audio_fingerprint(samples, n_frames=FRAMES)
            assert sig == mask, (mask, sig)
            envs.append(e)
        # verify-stage bound: dithered twins stay well under the 5e7 gate
        assert int(np.abs(envs[0] - envs[1]).max()) < 50_000_000
        sigs.add(mask)
    assert len(sigs) == 40


def test_q166_plan_digests_only(spark, sf_dir):
    """The WAV payload must never appear in the plan (it lives and dies
    inside the Arrow kernel); the bucket self-join broadcasts."""
    import contextlib
    import io

    from kafka_connect_bigquery_storage_write_spark.queries import QUERIES, load_all

    load_all()
    df = QUERIES["q166_audio_fingerprint_dups"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "payload" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_decimate_matches_naive_and_validates():
    import pytest as _pytest

    from kafka_connect_bigquery_storage_write_spark.operators.audiocodec import decimate

    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32768, size=(12, 2), dtype=np.int16)
    out = decimate(samples, 3)
    assert out.shape == (4, 2) and out.dtype == np.int16
    for j in range(4):
        for c in range(2):
            u = samples[3 * j : 3 * j + 3, c].astype(np.int64) + 32768
            assert out[j, c] == int(u.sum()) // 3 - 32768
    # mono 1-D input keeps its shape family
    mono = decimate(samples[:, 0], 2)
    assert mono.shape == (6,)
    with _pytest.raises(ValueError):
        decimate(samples, 5)
