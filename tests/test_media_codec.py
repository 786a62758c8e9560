"""Property-based round-trip guarantees for the stdlib media codecs —
the foundation the `ext_multimodal_decode` gate stands on."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_spark_realtime_spark.operators import media_codec as C


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(1, 40),
    height=st.integers(1, 32),
    channels=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_shape(width, height, channels, seed):
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height * channels, dtype=np.uint8)
    payload = C.png_encode(pixels.tobytes(), width, height, channels)
    w, h, ch, out = C.png_decode(payload)
    assert (w, h, ch) == (width, height, channels)
    assert out == pixels.tobytes()


def test_png_decode_handles_all_five_filters():
    """Our encoder emits filter 0 only; a spec decoder must handle 1-4
    too. Build a 3-scanline RGB image, filter each line by hand with a
    different filter type, and require exact pixel recovery."""
    width, height, ch = 4, 5, 3
    stride = width * ch
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(height, stride), dtype=np.uint8).astype(int)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    raw = bytearray()
    prev = [0] * stride
    for y, ftype in zip(range(height), (0, 1, 2, 3, 4)):
        line = list(img[y])
        enc = list(line)
        if ftype == 1:
            for i in range(ch, stride):
                enc[i] = (line[i] - line[i - ch]) % 256
        elif ftype == 2:
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) % 256
        elif ftype == 3:
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                enc[i] = (line[i] - ((left + prev[i]) >> 1)) % 256
        elif ftype == 4:
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                enc[i] = (line[i] - paeth(left, prev[i], ul)) % 256
        raw.append(ftype)
        raw.extend(enc)
        prev = line

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + C._chunk(b"IHDR", ihdr)
        + C._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + C._chunk(b"IEND", b"")
    )
    w, h, c_, out = C.png_decode(payload)
    assert (w, h, c_) == (width, height, ch)
    assert out == img.astype(np.uint8).tobytes()


def test_png_corrupt_crc_fails_loudly():
    payload = bytearray(C.png_encode(b"\x01\x02\x03", 1, 1, 3))
    # flip a byte inside the IDAT body (after sig+IHDR chunk)
    payload[len(payload) - 20] ^= 0xFF
    with pytest.raises(ValueError):
        C.png_decode(bytes(payload))


@settings(max_examples=20, deadline=None)
@given(
    n_channels=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 44100]),
    n_frames=st.integers(1, 500),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip(n_channels, rate, n_frames, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=n_frames * n_channels * 2, dtype=np.uint8)
    payload = C.wav_encode(frames.tobytes(), n_channels, 2, rate)
    ch, sw, fr, nf, out = C.wav_decode(payload)
    assert (ch, sw, fr, nf) == (n_channels, 2, rate, n_frames)
    assert out == frames.tobytes()


def test_resize_media_really_resamples(spark):
    """resize_media on a real PNG must produce the exact nearest-neighbor
    resample of the decoded pixels (not a hash thumbnail)."""
    from bigdata_spark_realtime_spark.operators.multimodal import resize_media

    rng = np.random.default_rng(3)
    w0, h0, ch = 10, 6, 3
    arr = rng.integers(0, 256, size=(h0, w0, ch), dtype=np.uint8)
    payload = C.png_encode(arr.tobytes(), w0, h0, ch)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload))], "media_id long, kind string, payload binary"
    )
    row = resize_media(media, width=4, height=4).collect()[0]
    assert (row.width, row.height) == (4, 4)
    rw, rh, rch, pixels = C.png_decode(bytes(row.payload))
    assert (rw, rh, rch) == (4, 4, ch)
    ys = (np.arange(4) * h0) // 4
    xs = (np.arange(4) * w0) // 4
    expected = arr[ys][:, xs]
    assert pixels == expected.tobytes()


def test_mjv_container_round_trip_and_corruption():
    """MJV frame container: encode/decode round trip is exact; any
    truncation or trailing garbage raises (corrupt shards must fail
    loudly, same contract as the PNG/WAV decoders)."""
    import pytest

    from bigdata_spark_realtime_spark.operators.media_codec import (
        is_mjv,
        mjv_decode,
        mjv_encode,
        png_encode,
    )

    frames = [
        png_encode(bytes([i] * (4 * 3 * 3)), 4, 3, 3) for i in range(5)
    ]
    payload = mjv_encode(frames)
    assert is_mjv(payload)
    assert mjv_decode(payload) == frames
    with pytest.raises(ValueError):
        mjv_decode(payload[:-3])  # truncated last frame
    with pytest.raises(ValueError):
        mjv_decode(payload + b"x")  # trailing bytes
    with pytest.raises(ValueError):
        mjv_decode(b"NOPE" + payload[4:])  # bad magic
