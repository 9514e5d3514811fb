"""Vendored pure-stdlib media codecs: uncompressed 24-bit BMP and
PCM-16 WAV.

These are the dependency-free middle branch of the real-decoder path
(``VCSPARK_REAL_DECODERS=1``): the container ships neither pillow nor
soundfile, so without them the "real" branch of
``operators/multimodal.py`` could never execute anywhere — the decode
contract stayed a claim. BMP (BITMAPINFOHEADER, bottom-up BGR rows,
4-byte row padding — the 1990 public format) and RIFF/WAVE PCM-16 (via
the stdlib ``wave`` module) are simple enough to implement from the
public format descriptions in ~100 lines, giving CI a REAL binary image
and audio format that round-trips through the same (H, W, 3) uint8 /
1-D int16 array contracts the pillow/soundfile branches use.

Encoders exist so tests can build payloads without any library; the
engine itself only decodes.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

_BMP_FILE_HDR = "<2sIHHI"  # magic, fileSize, res1, res2, dataOffset
_BMP_INFO_HDR = "<IiiHHIIiiII"  # size, w, h, planes, bpp, comp, imgSize, xppm, yppm, clrUsed, clrImportant
_BMP_HDR_SIZE = struct.calcsize(_BMP_FILE_HDR) + struct.calcsize(_BMP_INFO_HDR)


def is_bmp(content: bytes) -> bool:
    return len(content) >= _BMP_HDR_SIZE and content[:2] == b"BM"


def is_wav(content: bytes) -> bool:
    return len(content) >= 12 and content[:4] == b"RIFF" and content[8:12] == b"WAVE"


def encode_bmp(img: "np.ndarray") -> bytes:
    """(H, W, 3) uint8 RGB -> uncompressed 24-bit BMP bytes (bottom-up
    BGR rows, rows padded to 4 bytes)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8 array, got {img.shape}")
    h, w = img.shape[0], img.shape[1]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    img_size = (row_bytes + pad) * h
    out = bytearray()
    out += struct.pack(
        _BMP_FILE_HDR, b"BM", _BMP_HDR_SIZE + img_size, 0, 0, _BMP_HDR_SIZE
    )
    out += struct.pack(
        _BMP_INFO_HDR, 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    bgr = img[:, :, ::-1]
    padding = b"\0" * pad
    for y in range(h - 1, -1, -1):  # bottom-up row order
        out += bgr[y].tobytes() + padding
    return bytes(out)


def decode_bmp(content: bytes) -> "np.ndarray":
    """Uncompressed 24-bit BMP bytes -> (H, W, 3) uint8 RGB array.
    Raises ValueError on anything but the plain 24-bit uncompressed
    layout (BI_RGB, BITMAPINFOHEADER, positive height)."""
    if not is_bmp(content):
        raise ValueError("not a BMP payload")
    magic, _fsize, _r1, _r2, data_offset = struct.unpack_from(_BMP_FILE_HDR, content, 0)
    (
        info_size,
        w,
        h,
        planes,
        bpp,
        compression,
        _img_size,
        _xppm,
        _yppm,
        _cu,
        _ci,
    ) = struct.unpack_from(_BMP_INFO_HDR, content, struct.calcsize(_BMP_FILE_HDR))
    if info_size < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size={info_size}, planes={planes})")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP: {bpp}-bit compression={compression} "
            "(24-bit uncompressed only)"
        )
    if h <= 0 or w <= 0:
        raise ValueError(f"unsupported BMP dimensions {w}x{h} (top-down not supported)")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = data_offset + stride * h
    if len(content) < need:
        raise ValueError(f"truncated BMP: {len(content)} bytes, need {need}")
    rows = np.frombuffer(
        content, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, :row_bytes]
    bgr = rows.reshape(h, w, 3)[::-1]  # bottom-up -> top-down
    return np.ascontiguousarray(bgr[:, :, ::-1])  # BGR -> RGB


def encode_wav_pcm16(samples: "np.ndarray", rate: int = 8000, channels: int = 1) -> bytes:
    """1-D (mono) or (N, channels) int16 samples -> RIFF/WAVE PCM-16
    bytes via the stdlib ``wave`` writer."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        interleaved = arr
    elif arr.ndim == 2 and arr.shape[1] == channels:
        interleaved = arr.reshape(-1)
    else:
        raise ValueError(f"expected 1-D or (N, {channels}) int16, got {arr.shape}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(interleaved.tobytes())
    return buf.getvalue()


def decode_wav_pcm16(content: bytes) -> tuple["np.ndarray", int]:
    """RIFF/WAVE PCM-16 bytes -> (1-D int16 samples, rate). Multi-channel
    audio is averaged to mono (the soundfile-branch contract). Raises on
    non-PCM-16 encodings."""
    if not is_wav(content):
        raise ValueError("not a WAV payload")
    with wave.open(io.BytesIO(content), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(
                f"unsupported WAV sample width {wf.getsampwidth()} (PCM-16 only)"
            )
        n = wf.getnframes()
        channels = wf.getnchannels()
        rate = wf.getframerate()
        data = np.frombuffer(wf.readframes(n), dtype=np.int16)
    if channels > 1:
        data = data.reshape(-1, channels).mean(axis=1).astype(np.int16)
    return data, rate


from variantcalling_spark._serde import register_module_by_value

register_module_by_value(__name__)
