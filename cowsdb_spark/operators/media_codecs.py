"""Pure-Python media codecs for the multimodal operators.

Decodes the container formats that need no external library:

- **BMP** (Windows bitmap, BITMAPINFOHEADER, uncompressed 24/32-bit,
  bottom-up or top-down) → HxWx3 uint8 numpy array.
- **PPM/PGM** (netpbm P6/P5 binary) → HxWx3 / HxW uint8 array.
- **WAV** (RIFF PCM, 8/16/32-bit int or 32-bit float) → mono float64
  array in [-1, 1] + sample rate.

JPEG/PNG decode is gated behind a try-import of PIL (absent in this
container); compressed video containers (mp4/mkv) have no pure-Python
decoder — callers fall back to the deterministic stub for those.
**Uncompressed video IS really decoded (r6)**: YUV4MPEG2 (`.y4m`,
the mjpegtools/ffmpeg raw interchange container — header
``YUV4MPEG2 W.. H.. F..:.. C444|Cmono`` + ``FRAME\\n`` + planar
frames) parses to real per-frame pixel arrays, so the frame-sampling
operator exercises genuine frames in at least one format everywhere
(policy documented in operators/multimodal.py).

Encoders (BMP, WAV, Y4M) exist so resize output and test fixtures are
themselves valid files the decoder round-trips.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

try:  # real deployments get JPEG/PNG via PIL; this container doesn't
    from PIL import Image as _PIL_Image  # type: ignore

    import io as _io
except Exception:  # noqa: BLE001
    _PIL_Image = None


# ----------------------------------------------------------------- BMP

def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) → 24-bit uncompressed BMP bytes."""
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    row_len = (w * 3 + 3) & ~3
    body = bytearray()
    pad = b"\x00" * (row_len - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].tobytes()  # RGB -> BGR
        body += row + pad
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return file_hdr + info + bytes(body)


def decode_bmp(data: bytes) -> Optional[np.ndarray]:
    """BMP bytes → HxWx3 uint8 RGB, or None if not decodable here."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    off, = struct.unpack_from("<I", data, 10)
    hdr_size, = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        return None
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    comp, = struct.unpack_from("<I", data, 30)
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    bypp = bpp // 8
    row_len = (w * bypp + 3) & ~3
    if off + row_len * h > len(data):
        return None
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        y = i if top_down else h - 1 - i
        row = np.frombuffer(data, dtype=np.uint8, count=w * bypp,
                            offset=off + i * row_len)
        px = row.reshape(w, bypp)
        # BGR(A) -> RGB: first 3 bytes per pixel, reversed
        out[y] = px[:, :3][:, ::-1]
    return out


# --------------------------------------------------------------- netpbm

def decode_netpbm(data: bytes) -> Optional[np.ndarray]:
    """P6 (RGB) / P5 (gray) binary netpbm → uint8 array."""
    if len(data) < 2 or data[0:1] != b"P" or data[1:2] not in (b"5", b"6"):
        return None
    rgb = data[1:2] == b"6"
    # header: magic, whitespace/comments, width, height, maxval, single ws
    pos = 2
    vals: list[int] = []
    while len(vals) < 3 and pos < len(data):
        c = data[pos:pos + 1]
        if c == b"#":
            while pos < len(data) and data[pos:pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(data) and not data[pos:pos + 1].isspace():
                pos += 1
            try:
                vals.append(int(data[start:pos]))
            except ValueError:
                return None
    if len(vals) < 3 or vals[2] > 255:
        return None
    pos += 1  # the single whitespace after maxval
    w, h = vals[0], vals[1]
    if w <= 0 or h <= 0:
        # negative header dims make n negative, and frombuffer with a
        # negative count reads the whole buffer — reject instead
        return None
    n = w * h * (3 if rgb else 1)
    if pos + n > len(data):
        return None
    arr = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape((h, w, 3) if rgb else (h, w))


# ------------------------------------------------------------------ WAV

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """mono float array in [-1, 1] → 16-bit PCM WAV bytes."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def decode_wav(data: bytes) -> Optional[tuple[np.ndarray, int]]:
    """RIFF PCM WAV → (mono float64 in [-1, 1], sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        sz, = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + sz]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        return None
    audio_format, channels, rate, _bps, block, bits = fmt
    if channels < 1 or rate < 1:
        return None
    if audio_format == 1 and bits == 16:
        arr = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_format == 1 and bits == 8:
        arr = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif audio_format == 1 and bits == 32:
        arr = np.frombuffer(pcm, dtype="<i4").astype(np.float64) / 2147483648.0
    elif audio_format == 3 and bits == 32:
        arr = np.frombuffer(pcm, dtype="<f4").astype(np.float64)
    else:
        return None
    if channels > 1:
        n = (len(arr) // channels) * channels
        arr = arr[:n].reshape(-1, channels).mean(axis=1)
    return arr, rate


# ----------------------------------------------------------------- Y4M
#
# YUV4MPEG2: the one video container with a spec simple enough for an
# exact pure-Python decoder (no entropy coding). Public format docs:
# the mjpegtools yuv4mpeg(5) man page / ffmpeg's yuv4mpegdec. Layout:
#   "YUV4MPEG2" SP params... "\n"  ("W<int> H<int> F<num>:<den>
#                                    I<p|t|b> A<n>:<d> C<tag>")
#   then per frame: "FRAME" [params] "\n" + planar samples.
# Supported colorspaces here: C444 (3 full planes, no subsampling)
# and Cmono (luma only) — both lossless containers for our fixtures.


def _rgb_to_yuv444(img: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 RGB → 3xHxW uint8 YUV (full-range BT.601/JFIF)."""
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    v = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.stack([y, u, v]), 0, 255).round().astype(np.uint8)


def _yuv444_to_rgb(yuv: np.ndarray) -> np.ndarray:
    """3xHxW uint8 YUV → HxWx3 uint8 RGB (inverse of the above)."""
    y = yuv[0].astype(np.float64)
    u = yuv[1].astype(np.float64) - 128.0
    v = yuv[2].astype(np.float64) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).round().astype(np.uint8)


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1), mono: bool = False
) -> bytes:
    """N×H×W(x3) uint8 frames → YUV4MPEG2 bytes (C444, or Cmono for
    2-D frames / mono=True — Cmono round-trips bit-exactly)."""
    if frames.ndim == 3:  # N,H,W grayscale
        mono = True
    n, h, w = frames.shape[:3]
    tag = "mono" if mono else "444"
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{tag}\n".encode()
    )
    for i in range(n):
        out += b"FRAME\n"
        if mono:
            fr = frames[i]
            if fr.ndim == 3:  # RGB asked to store as mono: use luma
                fr = _rgb_to_yuv444(fr)[0]
            out += fr.astype(np.uint8).tobytes()
        else:
            out += _rgb_to_yuv444(frames[i]).tobytes()
    return bytes(out)


def decode_y4m(data: bytes) -> Optional[tuple[np.ndarray, float]]:
    """YUV4MPEG2 bytes → (N×H×W×3 uint8 RGB frames, fps) or None."""
    if data is None or not data.startswith(b"YUV4MPEG2"):
        return None
    nl = data.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    fps = 25.0
    tag = "420"  # spec default when C is absent
    try:
        for p in data[9:nl].split():
            p = p.decode("ascii", "replace")
            if p.startswith("W"):
                w = int(p[1:])
            elif p.startswith("H"):
                h = int(p[1:])
            elif p.startswith("F"):
                num, _, den = p[1:].partition(":")
                fps = int(num) / max(1, int(den or 1))
            elif p.startswith("C"):
                tag = p[1:]
    except ValueError:
        # malformed header integer: undecodable blob, same contract as
        # every other parse failure here — None, never an exception
        # that would fail the whole Spark task
        return None
    if not w or not h:
        return None
    if tag.startswith("444"):
        planes, frame_bytes = 3, 3 * w * h
    elif tag == "mono":
        planes, frame_bytes = 1, w * h
    else:
        return None  # subsampled layouts: out of scope, honest None
    frames = []
    pos = nl + 1
    while pos < len(data):
        if not data.startswith(b"FRAME", pos):
            return None
        fnl = data.find(b"\n", pos)
        if fnl < 0 or len(data) < fnl + 1 + frame_bytes:
            return None
        raw = np.frombuffer(
            data, dtype=np.uint8, count=frame_bytes, offset=fnl + 1
        )
        if planes == 3:
            yuv = raw.reshape(3, h, w)
            frames.append(_yuv444_to_rgb(yuv))
        else:
            frames.append(np.stack([raw.reshape(h, w)] * 3, axis=-1))
        pos = fnl + 1 + frame_bytes
    if not frames:
        return None
    return np.stack(frames), fps


# ----------------------------------------------------------------- AVI
#
# RIFF-AVI (msdn AVI RIFF File Reference; public layout):
#   RIFF <size> 'AVI ' { LIST 'hdrl' { avih, LIST 'strl' {strh, strf} },
#                        LIST 'movi' { '00db'/'00dc' frame chunks },
#                        [idx1] }
# Two video stream flavors decode here:
# - **DIB / BI_RGB** ('00db', biCompression=0): each frame chunk is a
#   raw bottom-up BGR bitmap — pure-Python exact decode (the chunk plus
#   the stream's BITMAPINFOHEADER is literally a headerless BMP, so the
#   BMP decoder is reused verbatim).
# - **MJPEG** ('00dc', biCompression='MJPG'): each frame chunk is a
#   standalone JPEG — decoded via the PIL-gated image path; without PIL
#   the clip returns None and callers take their visible stub tier.


def encode_avi(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1), codec: str = "DIB"
) -> bytes:
    """N×H×W×3 uint8 RGB → AVI bytes ('DIB' raw frames, exact
    round-trip; 'MJPG' JPEG frames, requires PIL)."""
    n, h, w = frames.shape[:3]
    mjpg = codec.upper() == "MJPG"
    chunks = []
    for i in range(n):
        if mjpg:
            if _PIL_Image is None:
                raise RuntimeError("MJPG encoding needs PIL")
            buf = _io.BytesIO()
            _PIL_Image.fromarray(frames[i]).save(buf, format="JPEG", quality=95)
            chunks.append(buf.getvalue())
        else:
            row_len = (w * 3 + 3) & ~3
            pad = b"\x00" * (row_len - w * 3)
            body = bytearray()
            for y in range(h - 1, -1, -1):  # bottom-up BGR, like BMP
                body += frames[i][y, :, ::-1].tobytes() + pad
            chunks.append(bytes(body))
    max_chunk = max(len(c) for c in chunks) if chunks else 0

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    uspf = int(round(1_000_000 * fps[1] / fps[0]))
    avih = struct.pack(
        "<IIIIIIIIII4I", uspf, 0, 0, 0x10, n, 0, 1, max_chunk, w, h, 0, 0, 0, 0
    )
    comp = b"MJPG" if mjpg else b"\x00\x00\x00\x00"
    strh = (
        b"vids" + (b"MJPG" if mjpg else b"DIB ")
        + struct.pack("<IHHIIIIIIiI4h", 0, 0, 0, 0, fps[1], fps[0], 0, n,
                      max_chunk, -1, 0, 0, 0, w, h)
    )
    strf = struct.pack("<Iii HH", 40, w, h, 1, 24) + comp + struct.pack(
        "<IiiII", len(chunks[0]) if chunks else 0, 2835, 2835, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    fcc = b"00dc" if mjpg else b"00db"
    movi = lst(b"movi", b"".join(chunk(fcc, c) for c in chunks))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_avi(data: bytes) -> Optional[tuple[np.ndarray, float]]:
    """AVI bytes → (N×H×W×3 uint8 RGB frames, fps) or None (DIB
    exactly; MJPEG via PIL when present; other codecs → None)."""
    if (
        data is None or len(data) < 12
        or data[:4] != b"RIFF" or data[8:12] != b"AVI "
    ):
        return None
    fps = 25.0
    strf = None  # the video stream's BITMAPINFOHEADER bytes
    comp = None
    in_video_strl = False
    frame_chunks: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal fps, strf, comp, in_video_strl
        while pos + 8 <= end:
            cid = data[pos:pos + 4]
            sz, = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            body_end = min(body_start + sz, end)
            if cid == b"LIST":
                walk(body_start + 4, body_end)
            elif cid == b"strh" and sz >= 48:
                if data[body_start:body_start + 4] == b"vids":
                    in_video_strl = True
                    scale, rate = struct.unpack_from("<II", data, body_start + 20)
                    if scale and rate:
                        fps = rate / scale
                else:
                    in_video_strl = False
            elif cid == b"strf" and in_video_strl and sz >= 40 and strf is None:
                strf = data[body_start:body_start + 40]
                comp = strf[16:20]
            elif cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                frame_chunks.append(data[body_start:body_end])
            pos = body_end + (sz & 1)

    try:
        walk(12, len(data))
    except (struct.error, ValueError):
        return None
    if strf is None or not frame_chunks:
        return None
    frames = []
    for raw in frame_chunks:
        if comp == b"\x00\x00\x00\x00":
            # raw DIB: prepend a BMP file header + the stream's own
            # BITMAPINFOHEADER and reuse the exact BMP decoder
            hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raw), 0, 0, 54)
            img = decode_bmp(hdr + strf[:20]
                             + struct.pack("<I", len(raw)) + strf[24:40] + raw)
        else:  # MJPG and friends: per-frame image decode (PIL-gated)
            img = decode_image(raw)
        if img is None:
            return None  # one undecodable frame -> honest whole-clip None
        frames.append(img)
    if len({f.shape for f in frames}) != 1:
        return None
    return np.stack(frames), fps


def decode_video(data: bytes) -> Optional[tuple[np.ndarray, float]]:
    """Sniff + decode any supported video container → (frames, fps).

    y4m decodes always; AVI decodes for DIB streams always and MJPEG
    when PIL is importable; mp4/mkv have no pure-Python decoder and
    return None — callers take their visible stub tier.
    """
    if data is None or len(data) < 12:
        return None
    if data.startswith(b"YUV4MPEG2"):
        return decode_y4m(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return decode_avi(data)
    return None


# ---------------------------------------------------------------- image

def decode_image(data: bytes) -> Optional[np.ndarray]:
    """Sniff + decode any supported image container → HxWx3 uint8."""
    if data is None or len(data) < 2:
        return None
    img = decode_bmp(data)
    if img is None:
        img = decode_netpbm(data)
        if img is not None and img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
    if img is None and _PIL_Image is not None:
        try:
            img = np.asarray(
                _PIL_Image.open(_io.BytesIO(data)).convert("RGB")
            )
        except Exception:  # noqa: BLE001
            img = None
    return img


def resize_bilinear(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """HxWx3 uint8 → hxwx3 uint8, separable bilinear (numpy only)."""
    src_h, src_w = img.shape[:2]
    if src_h == h and src_w == w:
        return img
    # sample positions (align_corners=False convention)
    ys = (np.arange(h) + 0.5) * src_h / h - 0.5
    xs = (np.arange(w) + 0.5) * src_w / w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, src_h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, src_w - 1)
    y1 = np.clip(y0 + 1, 0, src_h - 1)
    x1 = np.clip(x0 + 1, 0, src_w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    f = img.astype(np.float64)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# -------------------------------------------------------------- features

def image_features(img: np.ndarray) -> list[float]:
    """8-float signature: w, h, channels, mean RGB, gray std, aspect."""
    h, w = img.shape[:2]
    f = img.astype(np.float64)
    means = f.reshape(-1, 3).mean(axis=0)
    gray = f @ np.array([0.299, 0.587, 0.114])
    return [
        float(w), float(h), 3.0,
        float(means[0]), float(means[1]), float(means[2]),
        float(gray.std()), float(w) / float(h),
    ]


def audio_features(samples: np.ndarray, rate: int) -> list[float]:
    """8-float signature: duration_ms, rate, rms, zcr, peak, mean_abs,
    n_samples, 0 (reserved)."""
    n = len(samples)
    if n == 0:
        return [0.0, float(rate), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    rms = float(np.sqrt(np.mean(samples ** 2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8)))))
    return [
        float(n) * 1000.0 / rate, float(rate), rms, zcr,
        float(np.max(np.abs(samples))), float(np.mean(np.abs(samples))),
        float(n), 0.0,
    ]
