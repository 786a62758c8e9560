"""Real (pure-stdlib) media codecs for the multimodal operators.

PIL/libjpeg/ffmpeg are not in this container, but PNG and WAV are fully
decodable with the standard library alone: PNG is zlib-compressed
scanlines behind a chunked container (this module implements the five
scanline filters of the PNG spec), WAV is framed PCM via ``wave``. That
makes the multimodal decode path REAL — bytes in, pixels/samples out —
not a stub: the fixture generator encodes known arrays, the Spark-side
decoder must reproduce them bit-for-bit.

Scope (documented, asserted): PNG support is 8-bit RGB/RGBA/greyscale,
non-interlaced — exactly what the fixture generator emits and what a
deterministic test corpus needs. Anything else raises, loudly.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: color type → samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == _PNG_SIG


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


# ---------------------------------------------------------------------------
# PNG encode
# ---------------------------------------------------------------------------


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(pixels: bytes, width: int, height: int, channels: int = 3) -> bytes:
    """Raw 8-bit pixel bytes (row-major, ``channels`` samples/pixel) →
    a spec-valid non-interlaced PNG (filter 0 on every scanline)."""
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)}B != {width}x{height}x{channels}"
        )
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# PNG decode
# ---------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes → (width, height, channels, raw pixel bytes).

    Implements all five PNG scanline filters (None/Sub/Up/Average/
    Paeth); supports 8-bit depth, color types 0/2/4/6, non-interlaced.
    CRCs are verified — corrupt payloads fail loudly, they don't decode
    to garbage."""
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG: depth={depth} color={color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width < 0 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG decompressed size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    bpp = channels
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


# ---------------------------------------------------------------------------
# WAV encode / decode (stdlib `wave`)
# ---------------------------------------------------------------------------


def wav_encode(
    frames: bytes, n_channels: int, samp_width: int, frame_rate: int
) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(samp_width)
        w.setframerate(frame_rate)
        w.writeframes(frames)
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """WAV bytes → (n_channels, samp_width, frame_rate, n_frames, PCM
    frame bytes)."""
    if not is_wav(payload):
        raise ValueError("not a WAV payload")
    with wave.open(io.BytesIO(payload), "rb") as w:
        return (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
            w.readframes(w.getnframes()),
        )


# ---------------------------------------------------------------------------
# MJV: a minimal motion-frames container (video = sequence of PNG frames)
# ---------------------------------------------------------------------------

#: magic for the frame-sequence container: "MJV1" + u32 frame count +
#: per frame (u32 length + PNG payload). The shape every real container
#: (MP4/MKV) reduces to for a frame-sampling pipeline: indexed access
#: to independently-decodable frames.
MJV_MAGIC = b"MJV1"


def is_mjv(payload: bytes) -> bool:
    return payload[:4] == MJV_MAGIC


def mjv_encode(frames: list[bytes]) -> bytes:
    """Container-encode a list of (already PNG-encoded) frames."""
    out = bytearray(MJV_MAGIC)
    out += struct.pack("<I", len(frames))
    for f in frames:
        out += struct.pack("<I", len(f)) + f
    return bytes(out)


def mjv_decode(payload: bytes) -> list[bytes]:
    """Parse the container back into its PNG frame payloads; truncated
    or trailing bytes raise (corrupt shards must fail loudly)."""
    if not is_mjv(payload):
        raise ValueError("not an MJV container")
    (n,) = struct.unpack_from("<I", payload, 4)
    frames, off = [], 8
    for _ in range(n):
        if off + 4 > len(payload):
            raise ValueError("truncated MJV frame table")
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4
        if off + ln > len(payload):
            raise ValueError("truncated MJV frame payload")
        frames.append(payload[off : off + ln])
        off += ln
    if off != len(payload):
        raise ValueError("trailing bytes after MJV frames")
    return frames
