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

Compressed codecs (JPEG/PNG/MP3/H.264) genuinely require external
libraries and stay gated behind ``NotImplementedError`` in
``ops.multimodal``.

Encoders exist so fixtures can synthesize REAL payloads
deterministically (no external data, SURVEY §2.9 posture).
"""

from __future__ import annotations

import io
import struct
import wave

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
