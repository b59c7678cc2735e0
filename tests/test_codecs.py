"""Stdlib media codecs (datapipe/codecs.py): real BMP/WAV parse paths.

Pure-Python tests (no Spark) — the distributed plumbing around these is
covered by test_multimodal.py; here the parsers themselves are pinned:
round-trips, padding/stride handling, top-down rows, the closed-form
feature recipes the multimodal gate relies on, and rejection of garbage.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rayforce_spark.datapipe.codecs import (
    CodecError, decode_bmp, decode_wav, encode_bmp, encode_wav,
    media_features, resize_nearest, sniff)


@pytest.mark.parametrize("h,w", [(1, 1), (6, 4), (5, 3), (7, 5), (2, 9)])
def test_bmp_roundtrip(h, w):
    rng = np.random.default_rng(h * 100 + w)
    px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    back = decode_bmp(encode_bmp(px))
    assert back.shape == (h, w, 3)
    assert (back == px).all()


def test_bmp_row_padding_is_real():
    # w=3 -> 9-byte rows padded to 12: a stride bug would shear the image
    px = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    b = encode_bmp(px)
    stride = 12
    assert len(b) == 54 + stride * 3
    assert (decode_bmp(b) == px).all()


def test_bmp_top_down_rows():
    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    b = bytearray(encode_bmp(px))
    # flip the height sign -> top-down; rows must come back reversed
    struct.pack_into("<i", b, 14 + 8, -2)
    flipped = decode_bmp(bytes(b))
    assert (flipped == px[::-1]).all()


def test_bmp_rejects_garbage_and_unsupported():
    with pytest.raises(CodecError):
        decode_bmp(b"nope")
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    b = bytearray(encode_bmp(px))
    struct.pack_into("<H", b, 14 + 14, 8)  # bpp=8
    with pytest.raises(CodecError):
        decode_bmp(bytes(b))
    with pytest.raises(CodecError):
        decode_bmp(encode_bmp(px)[:-1])  # truncated pixels


@pytest.mark.parametrize("sampwidth", [1, 2])
def test_wav_roundtrip(sampwidth):
    rng = np.random.default_rng(sampwidth)
    hi = 255 if sampwidth == 1 else 30000
    s = rng.integers(0, hi, 100)
    rate, ch, back = decode_wav(encode_wav(s, rate=8000, sampwidth=sampwidth))
    assert (rate, ch) == (8000, 1)
    assert (back[:, 0] == s).all()


def test_wav_rejects_garbage():
    with pytest.raises(CodecError):
        decode_wav(b"RIFFxxxxWAVE")  # header without chunks


def test_sniff():
    px = np.zeros((1, 1, 3), dtype=np.uint8)
    assert sniff(encode_bmp(px)) == "bmp"
    assert sniff(encode_wav(np.zeros(4), sampwidth=1)) == "wav"
    assert sniff(b"\x89PNG") == "unknown"


def test_resize_nearest_identity_and_shape():
    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    assert (resize_nearest(px, 4, 6) == px).all()
    up = resize_nearest(px, 8, 12)
    assert up.shape == (12, 8, 3)
    # 2x upscale nearest: each source pixel becomes a 2x2 block
    assert (up[::2, ::2] == px).all() and (up[1::2, 1::2] == px).all()
    down = resize_nearest(px, 2, 3)
    assert down.shape == (3, 2, 3)
    assert (down == px[::2][:, ::2]).all()


def test_media_features_closed_forms():
    # these are EXACTLY the recipes the multimodal gate's oracle recomputes
    mid = 12345
    i = np.arange(4 * 6 * 3)
    px = ((mid * 7 + i) % 256).astype(np.uint8).reshape(6, 4, 3)
    f = media_features(encode_bmp(px), 9)
    assert f[:2] == [4.0, 6.0]
    assert f[2] == float(np.mean((mid * 7 + i) % 256))
    s = ((mid * 13 + np.arange(50)) % 256).astype(np.uint8)
    f = media_features(encode_wav(s, rate=8000, sampwidth=1), 7)
    assert f[:2] == [8000.0, 50.0]
    assert f[2] == float(np.mean((mid * 13 + np.arange(50)) % 256))
    with pytest.raises(CodecError):
        media_features(b"garbage", 4)


def test_media_features_pads_to_dim():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    f = media_features(encode_bmp(px), 16)
    assert len(f) == 16 and f[9:] == [0.0] * 7


# ---------------------------------------------------------- fuzz

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(1, 12), w=st.integers(1, 12),
        seed=st.integers(0, 2**31),
        wh=st.integers(1, 8), hh=st.integers(1, 8),
    )
    def test_bmp_roundtrip_and_resize_fuzz(h, w, seed, wh, hh):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all()
        r = resize_nearest(px, wh, hh)
        assert r.shape == (hh, wh, 3)
        # every output pixel must exist at its mapped source position
        yi = (np.arange(hh) * h) // hh
        xi = (np.arange(wh) * w) // wh
        assert (r == px[yi][:, xi]).all()
        # resized image re-encodes and re-decodes losslessly too
        assert (decode_bmp(encode_bmp(r)) == r).all()

    @settings(max_examples=40, deadline=None)
    @given(data=st.binary(max_size=200))
    def test_decoders_never_crash_on_garbage(data):
        # arbitrary bytes either parse or raise CodecError — nothing else
        for fn in (decode_bmp, decode_wav):
            try:
                fn(data)
            except CodecError:
                pass
except ImportError:  # hypothesis is expected in this env, but stay soft
    pass


def test_wav_truncated_chunk_raises_codec_error_not_runtimeerror():
    # stdlib wave leaks bare RuntimeError from Chunk.skip() on truncated
    # chunk data (r7 review repro) — the quarantine contract is "parse or
    # CodecError, nothing else", or one bad row kills a whole Spark task
    hostile = b"RIFF\x9a\x00\x00\x00WAVE" + b"\x01" * 50
    with pytest.raises(CodecError):
        decode_wav(hostile)
    with pytest.raises(CodecError):
        media_features(hostile, 4)
