"""Real pure-numpy codecs for the uncompressed media formats — PPM/PGM
(netpbm binary) images and RIFF/WAVE PCM audio. These need no external
library, so the multimodal actor stages run END-TO-END real on them;
compressed codecs (JPEG/PNG/MP3/…) remain pluggable ``decoder=`` hooks
(libraries absent in this environment).

Format references are public specs: netpbm P5/P6 (https://netpbm.
sourceforge.net/doc/ppm.html) and the RIFF/WAVE chunk layout (fmt /data
chunks, PCM integer samples).
"""

from __future__ import annotations

import struct

import numpy as np


class CodecError(ValueError):
    pass


# ---------------------------------------------------------------- netpbm ---


def _pnm_header(payload: bytes):
    """Parse 'P5'/'P6' + whitespace/comment-separated width height maxval;
    returns (magic, width, height, maxval, data_offset)."""
    if len(payload) < 2 or payload[:1] != b"P":
        raise CodecError("not a PNM payload")
    magic = payload[:2].decode("ascii", "replace")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and '#' comments
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise CodecError("unterminated PNM comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise CodecError("truncated PNM header")
        try:
            fields.append(int(payload[start:pos]))
        except ValueError as e:
            raise CodecError(f"bad PNM header field {payload[start:pos]!r}") from e
    # exactly one whitespace byte separates maxval from raster data
    return magic, fields[0], fields[1], fields[2], pos + 1


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6) -> (H, W, 3) uint8, or binary PGM (P5) ->
    (H, W, 3) uint8 with the gray channel replicated (so downstream image
    kernels see one layout). maxval must be <= 255."""
    magic, w, h, maxval, off = _pnm_header(payload)
    if magic not in ("P5", "P6"):
        raise CodecError(f"unsupported PNM magic {magic!r}")
    if maxval <= 0 or maxval > 255:
        raise CodecError(f"unsupported PNM maxval {maxval}")
    ch = 3 if magic == "P6" else 1
    n = w * h * ch
    raster = payload[off : off + n]
    if len(raster) < n:
        raise CodecError("truncated PNM raster")
    img = np.frombuffer(raster, dtype=np.uint8, count=n).reshape(h, w, ch)
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) or (H, W) uint8 -> binary PPM (P6) / PGM (P5) bytes."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        header = b"P5\n%d %d\n255\n" % (a.shape[1], a.shape[0])
        return header + a.tobytes()
    if a.ndim == 3 and a.shape[2] == 3:
        header = b"P6\n%d %d\n255\n" % (a.shape[1], a.shape[0])
        return header + a.tobytes()
    raise CodecError(f"expected (H,W) or (H,W,3) uint8, got shape {a.shape}")


# ------------------------------------------------------------- RIFF/WAVE ---


def decode_wav(payload: bytes) -> np.ndarray:
    """Decode RIFF/WAVE integer-PCM -> mono float32 waveform in [-1, 1]
    (channels averaged). Supports 8-bit unsigned and 16/32-bit signed PCM
    (format tag 1)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise CodecError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise CodecError("missing fmt/data chunk")
    tag, n_channels, _rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag != 1:
        raise CodecError(f"unsupported WAVE format tag {tag} (PCM only)")
    if bits == 8:
        wave = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    elif bits == 16:
        wave = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 32:
        wave = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise CodecError(f"unsupported PCM bit depth {bits}")
    if n_channels > 1:
        n = len(wave) - len(wave) % n_channels
        wave = wave[:n].reshape(-1, n_channels).mean(axis=1)
    return wave.astype(np.float32)


def wav_sample_rate(payload: bytes) -> int:
    """Sample rate from the fmt chunk (no full decode)."""
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            return struct.unpack_from("<I", payload, pos + 12)[0]
        pos += 8 + size + (size & 1)
    raise CodecError("missing fmt chunk")


def encode_wav(
    wave: np.ndarray, *, sample_rate: int = 16000
) -> bytes:
    """Mono float waveform in [-1, 1] -> 16-bit PCM RIFF/WAVE bytes."""
    w = np.clip(np.asarray(wave, dtype=np.float64), -1.0, 1.0)
    pcm = np.round(w * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
