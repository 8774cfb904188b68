"""Pure-numpy / stdlib codecs for UNCOMPRESSED media formats.

The container has no PIL/librosa/opencv, but several real formats need
no codec library at all — these are complete, working decoders, not
stubs:

- BMP (24-bit uncompressed BI_RGB, the Windows classic)
- PPM (P6 binary, the netpbm classic)
- WAV (PCM16, via the stdlib ``wave`` module)
- RVID — this repo's documented raw-video layout for frame pipelines:
  ``b"RVID" | u16 n_frames | u16 height | u16 width | frames`` with
  each frame ``height*width*3`` RGB24 bytes, little-endian header.

- PNG (8-bit gray/RGB/RGBA, non-interlaced) — a COMPRESSED format
  that needs no external library: DEFLATE is stdlib ``zlib``, and the
  five scanline filters are spec-simple.  Decode handles every filter
  type (0-4, so real-world files work); the encoder emits filter 0.

Compressed codecs that genuinely require external libraries
(JPEG/MP3/H.264) stay gated behind ``NotImplementedError`` in
``ops.multimodal``.

Encoders exist so fixtures can synthesize REAL payloads
deterministically (no external data, SURVEY §2.9 posture).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP bytes."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    row_size = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    img_size = row_size * h
    # pixel data: bottom-up rows, BGR order
    bgr = arr[::-1, :, ::-1]
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


# ---------------------------------------------------------------------------
# PPM — P6 binary
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval separated by whitespace
    # (comments unsupported — fixtures never emit them)
    parts, pos, tokens = [], 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    return (
        np.frombuffer(payload, np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


# ---------------------------------------------------------------------------
# WAV — PCM16 via stdlib wave
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# PNG — 8-bit gray / RGB / RGBA, non-interlaced (stdlib zlib DEFLATE)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_COLOR_OF_CHANNELS = {1: 0, 3: 2, 4: 6}
_PNG_CHANNELS_OF_COLOR = {0: 1, 2: 3, 6: 4}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w[, c]) uint8 (gray / RGB / RGBA) → PNG bytes (8-bit,
    non-interlaced, filter 0 scanlines, stdlib-zlib DEFLATE)."""
    arr = np.ascontiguousarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _PNG_COLOR_OF_CHANNELS:
        raise ValueError(f"encode_png expects 1/3/4 channels, got {c}")
    rows = np.zeros((h, 1 + w * c), dtype=np.uint8)  # filter byte 0 + data
    rows[:, 1:] = arr.reshape(h, w * c)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_COLOR_OF_CHANNELS[c], 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(rows.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3|4) uint8 (RGB/RGBA) or (h, w) for gray.

    Supports the common web-corpus shape: 8-bit depth, color types
    0/2/6, non-interlaced, with ALL five scanline filters unfiltered
    (Sub via a vectorized per-lane cumulative sum; Up vectorized;
    Average/Paeth per-pixel, as their recurrences are sequential).
    Palette (3), 16-bit and interlaced images raise ValueError — real
    limitations stated, not silently wrong output."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if hdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = hdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS_OF_COLOR:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, "
            f"interlace={interlace}); this decoder handles 8-bit "
            "gray/RGB/RGBA non-interlaced"
        )
    c = _PNG_CHANNELS_OF_COLOR[color]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline data has wrong length")
    rows = np.frombuffer(raw, np.uint8).reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        cur = rows[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: per-channel-lane prefix sum (mod 256)
            rec = np.cumsum(cur.reshape(w, c), axis=0).reshape(stride) & 255
        elif f == 2:  # Up
            rec = (cur + prior) & 255
        elif f == 3:  # Average — sequential in x
            rec = cur
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                rec[x] = (rec[x] + ((left + prior[x]) >> 1)) & 255
        elif f == 4:  # Paeth — sequential in x
            rec = cur
            for x in range(stride):
                left = int(rec[x - c]) if x >= c else 0
                ul = int(prior[x - c]) if x >= c else 0
                rec[x] = (rec[x] + _paeth(left, int(prior[x]), ul)) & 255
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = rec
    img = out.reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float32/float64 mono samples in [-1, 1] → PCM16 WAV bytes."""
    pcm = np.clip(np.asarray(samples, np.float64), -1.0, 1.0)
    pcm16 = np.round(pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm16.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV bytes → (float32 mono samples in [-1, 1], sample_rate).
    Multi-channel input is downmixed by mean."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        nch, sw, sr, nframes = (
            f.getnchannels(),
            f.getsampwidth(),
            f.getframerate(),
            f.getnframes(),
        )
        raw = f.readframes(nframes)
    if sw != 2:
        raise ValueError(f"only PCM16 supported (sampwidth={sw})")
    x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


# ---------------------------------------------------------------------------
# RVID — raw-video layout (documented above)
# ---------------------------------------------------------------------------

_RVID_MAGIC = b"RVID"


def encode_rawvideo(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 RGB frames → RVID bytes."""
    n, h, w, c = frames.shape
    if c != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_rawvideo expects (n, h, w, 3) uint8")
    return _RVID_MAGIC + struct.pack("<HHH", n, h, w) + frames.tobytes()


def decode_rawvideo(payload: bytes) -> np.ndarray:
    if payload[:4] != _RVID_MAGIC:
        raise ValueError("not an RVID payload")
    n, h, w = struct.unpack_from("<HHH", payload, 4)
    return (
        np.frombuffer(payload, np.uint8, count=n * h * w * 3, offset=10)
        .reshape(n, h, w, 3)
        .copy()
    )


# ---------------------------------------------------------------------------
# feature kernels (pure numpy — used by the multimodal stages)
# ---------------------------------------------------------------------------


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index grids — vectorized, no loops."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def image_feature(img: np.ndarray, side: int = 8) -> np.ndarray:
    """Real image feature: nearest-resize to side×side, grayscale
    (Rec. 601 luma), scale to [0, 1] → side² float32 vector."""
    small = resize_nearest(img, side, side).astype(np.float32)
    gray = small @ np.array([0.299, 0.587, 0.114], np.float32)
    return (gray / 255.0).reshape(-1)


def logmel_energies(
    samples: np.ndarray,
    sample_rate: int,
    n_bands: int = 13,
    frame: int = 512,
) -> np.ndarray:
    """Real audio feature: average log-mel band energies.  Frames of
    ``frame`` samples (hann window, no overlap) → |rFFT|² → triangular
    mel filterbank → log → mean over frames.  numpy only."""
    n = (len(samples) // frame) * frame
    if n == 0:
        return np.zeros(n_bands, np.float32)
    frames = samples[:n].reshape(-1, frame) * np.hanning(frame)
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (t, frame//2+1)
    n_bins = power.shape[1]
    # mel filterbank: n_bands triangles between 0 and Nyquist
    def mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def imel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    edges = imel(np.linspace(mel(0.0), mel(sample_rate / 2.0), n_bands + 2))
    bins = np.floor((frame + 1) * edges / sample_rate).astype(int).clip(0, n_bins - 1)
    fb = np.zeros((n_bands, n_bins))
    for b in range(n_bands):
        lo, mid, hi = bins[b], bins[b + 1], bins[b + 2]
        if mid > lo:
            fb[b, lo:mid] = (np.arange(lo, mid) - lo) / (mid - lo)
        if hi > mid:
            fb[b, mid:hi] = (hi - np.arange(mid, hi)) / (hi - mid)
    mel_e = power @ fb.T  # (t, n_bands)
    return np.log1p(mel_e).mean(axis=0).astype(np.float32)


__all__ = [
    "encode_bmp",
    "decode_bmp",
    "encode_ppm",
    "decode_ppm",
    "encode_wav",
    "decode_wav",
    "encode_rawvideo",
    "decode_rawvideo",
    "resize_nearest",
    "image_feature",
    "logmel_energies",
]
