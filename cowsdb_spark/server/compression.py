"""ClickHouse native-protocol compressed framing (SURVEY §3.2).

The reference treats the QUERY packet's compression flag as "the query
string itself is zlib-compressed" (main.py:505-512, 782-805).  Real
clients (clickhouse-client, clickhouse-driver) never do that: the query
text is always a plain varstr, and the flag means every DATA block in
BOTH directions is wrapped in CompressedStream frames:

    16 bytes  CityHash128 (v1.0.2) of (header + compressed payload)
     1 byte   method: 0x82 = LZ4, 0x90 = ZSTD, 0x02 = NONE
     4 bytes  LE compressed size (INCLUDING this 9-byte header)
     4 bytes  LE decompressed size
     N bytes  compressed payload

This module implements that framing in pure Python (the container has
no lz4/zstd/cityhash packages):

- CityHash128, the 2011 Google v1.0.2 algorithm ClickHouse pinned
  forever for wire checksums (public domain; constants and structure
  from the published city.cc 1.0.2).
- An LZ4 *block* decoder (full format: token, literal runs, 16-bit
  match offsets, overlapping copies) so compressed client INSERT data
  decodes, and a literals-only LZ4 encoder for server frames — a valid
  LZ4 stream that any decoder accepts, trading ratio for zero
  dependencies.
- zlib passthrough (method 0x02 NONE frames are also emitted/accepted).
"""

from __future__ import annotations

import struct

_M64 = (1 << 64) - 1

K0 = 0xC3A5C85C97CB3127
K1 = 0xB492B66FBE98F273
K2 = 0x9AE16A3B2F90404F
K3 = 0xC949D7C7509E6557
_KMUL = 0x9DDFEA08EB382D69

METHOD_NONE = 0x02
METHOD_LZ4 = 0x82
METHOD_ZSTD = 0x90

CHECKSUM_SIZE = 16
HEADER_SIZE = 9


def _rot(v: int, s: int) -> int:
    if s == 0:
        return v
    return ((v >> s) | (v << (64 - s))) & _M64


def _shift_mix(v: int) -> int:
    return (v ^ (v >> 47)) & _M64


def _fetch64(s: bytes, i: int = 0) -> int:
    return struct.unpack_from("<Q", s, i)[0]


def _fetch32(s: bytes, i: int = 0) -> int:
    return struct.unpack_from("<I", s, i)[0]


def _hash128to64(lo: int, hi: int) -> int:
    a = ((lo ^ hi) * _KMUL) & _M64
    a ^= a >> 47
    b = ((hi ^ a) * _KMUL) & _M64
    b ^= b >> 47
    return (b * _KMUL) & _M64


def _hash_len16(u: int, v: int) -> int:
    return _hash128to64(u, v)


def _hash_len0to16(s: bytes) -> int:
    n = len(s)
    if n > 8:
        a = _fetch64(s)
        b = _fetch64(s, n - 8)
        return (_hash_len16(a, _rot((b + n) & _M64, n & 63)) ^ b) & _M64
    if n >= 4:
        a = _fetch32(s)
        return _hash_len16((n + (a << 3)) & _M64, _fetch32(s, n - 4))
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & 0xFFFFFFFF
        z = (n + (c << 2)) & 0xFFFFFFFF
        return (_shift_mix((y * K2 ^ z * K3) & _M64) * K2) & _M64
    return K2


def _weak_hash_len32_with_seeds(s: bytes, i: int, a: int, b: int):
    w = _fetch64(s, i)
    x = _fetch64(s, i + 8)
    y = _fetch64(s, i + 16)
    z = _fetch64(s, i + 24)
    a = (a + w) & _M64
    b = _rot((b + a + z) & _M64, 21)
    c = a
    a = (a + x + y) & _M64
    b = (b + _rot(a, 44)) & _M64
    return (a + z) & _M64, (b + c) & _M64


def _city_murmur(s: bytes, seed_lo: int, seed_hi: int):
    a, b = seed_lo, seed_hi
    n = len(s)
    length = n - 16
    if length <= 0:
        c = (b * K1 + _hash_len0to16(s)) & _M64
        d = _rot((b + (_fetch64(s) if n >= 8 else c)) & _M64, 32)
    else:
        c = _hash_len16((_fetch64(s, n - 8) + K1) & _M64, a)
        d = _hash_len16((b + n) & _M64, (c + _fetch64(s, n - 16)) & _M64)
        a = (a + d) & _M64
        i = 0
        while True:
            a ^= (_shift_mix((_fetch64(s, i) * K1) & _M64) * K1) & _M64
            a = (a * K1) & _M64
            b ^= a
            c ^= (_shift_mix((_fetch64(s, i + 8) * K1) & _M64) * K1) & _M64
            c = (c * K1) & _M64
            d ^= c
            i += 16
            length -= 16
            if length <= 0:
                break
    a = _hash_len16(a, c)
    b = _hash_len16(d, b)
    return (a ^ b) & _M64, _hash_len16(b, a)


def _cityhash128_with_seed(s: bytes, seed_lo: int, seed_hi: int):
    n = len(s)
    if n < 128:
        return _city_murmur(s, seed_lo, seed_hi)
    x = seed_lo
    y = seed_hi
    z = (n * K1) & _M64
    v0 = (_rot((y ^ K1) & _M64, 49) * K1 + _fetch64(s)) & _M64
    v1 = (_rot(v0, 42) * K1 + _fetch64(s, 8)) & _M64
    w0 = (_rot((y + z) & _M64, 35) * K1 + x) & _M64
    w1 = (_rot((x + _fetch64(s, 88)) & _M64, 53) * K1) & _M64
    i = 0
    remaining = n
    while True:
        for _ in range(2):
            x = (_rot((x + y + v0 + _fetch64(s, i + 16)) & _M64, 37) * K1) & _M64
            y = (_rot((y + v1 + _fetch64(s, i + 48)) & _M64, 42) * K1) & _M64
            x ^= w1
            y ^= v0
            z = _rot((z ^ w0) & _M64, 33)
            v0, v1 = _weak_hash_len32_with_seeds(s, i, (v1 * K1) & _M64, (x + w0) & _M64)
            w0, w1 = _weak_hash_len32_with_seeds(s, i + 32, (z + w1) & _M64, y)
            z, x = x, z
            i += 64
        remaining -= 128
        if remaining < 128:
            break
    y = (y + _rot(w0, 37) * K0 + z) & _M64
    x = (x + _rot((v0 + z) & _M64, 49) * K0) & _M64
    tail_done = 0
    while tail_done < remaining:
        tail_done += 32
        y = (_rot((y - x) & _M64, 42) * K0 + v1) & _M64
        w0 = (w0 + _fetch64(s, i + remaining - tail_done + 16)) & _M64
        x = (_rot(x, 49) * K0 + w0) & _M64
        w0 = (w0 + v0) & _M64
        v0, v1 = _weak_hash_len32_with_seeds(s, i + remaining - tail_done, v0, v1)
    x = _hash_len16(x, v0)
    y = _hash_len16(y, w0)
    return (
        (_hash_len16((x + v1) & _M64, w1) + y) & _M64,
        _hash_len16((x + w1) & _M64, (y + v1) & _M64),
    )


def cityhash128(s: bytes) -> tuple[int, int]:
    """CityHash128 v1.0.2 → (low64, high64), the pair ClickHouse
    serializes low-first as the frame checksum."""
    if len(s) >= 16:
        return _cityhash128_with_seed(
            s[16:], (_fetch64(s) ^ K3) & _M64, _fetch64(s, 8)
        )
    return _cityhash128_with_seed(s, K0, K1)


# ---------------------------------------------------------------- LZ4 block


def lz4_decompress(src: bytes, dst_size: int) -> bytes:
    """Decode one LZ4 *block* (the raw format inside CH frames)."""
    dst = bytearray()
    i, n = 0, len(src)
    while i < n and len(dst) < dst_size:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        dst += src[i : i + lit]
        i += lit
        if i >= n:
            break  # last sequence: literals only
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("corrupt LZ4 block: zero match offset")
        mlen = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(dst) - offset
        if start < 0:
            raise ValueError("corrupt LZ4 block: offset past start")
        if offset >= mlen:
            dst += dst[start : start + mlen]
        else:  # overlapping copy — byte-at-a-time semantics
            for j in range(mlen):
                dst.append(dst[start + j])
    if len(dst) != dst_size:
        raise ValueError(
            f"LZ4 block decoded to {len(dst)} bytes, expected {dst_size}"
        )
    return bytes(dst)


def lz4_compress_literal(src: bytes) -> bytes:
    """Encode ``src`` as a single literals-only LZ4 sequence — valid
    LZ4 any decoder accepts, no match search (wire compatibility over
    ratio; the container has no lz4 bindings)."""
    n = len(src)
    out = bytearray()
    out.append((15 << 4) if n >= 15 else (n << 4))
    if n >= 15:
        rem = n - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += src
    return bytes(out)


# ---------------------------------------------------------------- framing


def compress_frame(payload: bytes, method: int = METHOD_LZ4) -> bytes:
    """Wrap ``payload`` in one CH CompressedStream frame."""
    if method == METHOD_LZ4:
        body = lz4_compress_literal(payload)
    elif method == METHOD_NONE:
        body = payload
    else:
        raise ValueError(f"unsupported compression method 0x{method:02x}")
    header = struct.pack("<BII", method, len(body) + HEADER_SIZE, len(payload))
    lo, hi = cityhash128(header + body)
    return struct.pack("<QQ", lo, hi) + header + body


def decompress_frame_body(header: bytes, body: bytes) -> bytes:
    """Decode payload given the 9-byte header and body (checksum
    already consumed/verified by the caller)."""
    method, comp_size, decomp_size = struct.unpack("<BII", header)
    if len(body) != comp_size - HEADER_SIZE:
        raise ValueError("frame body size mismatch")
    if method == METHOD_NONE:
        return body
    if method == METHOD_LZ4:
        return lz4_decompress(body, decomp_size)
    if method == METHOD_ZSTD:
        raise ValueError("ZSTD frames unsupported (no zstd bindings)")
    raise ValueError(f"unknown compression method 0x{method:02x}")


class FrameReader:
    """Presents the decompressed side of a compressed stream with the
    same primitive-reader interface as the socket ``_Reader`` (varint /
    binary_str / _need), pulling CH frames from the raw reader on
    demand — a block that spans frames still decodes."""

    def __init__(self, raw):
        self.raw = raw
        self.buf = b""
        self.pos = 0

    def _pull_frame(self):
        checksum = self.raw._need(CHECKSUM_SIZE)
        header = self.raw._need(HEADER_SIZE)
        comp_size = struct.unpack_from("<I", header, 1)[0]
        body = self.raw._need(comp_size - HEADER_SIZE)
        lo, hi = cityhash128(header + body)
        got_lo, got_hi = struct.unpack("<QQ", checksum)
        if (lo, hi) != (got_lo, got_hi):
            raise ValueError("compressed frame checksum mismatch")
        self.buf = self.buf[self.pos :] + decompress_frame_body(header, body)
        self.pos = 0

    def _need(self, n: int) -> bytes:
        while len(self.buf) - self.pos < n:
            self._pull_frame()
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def varint(self) -> int:
        shift = n = 0
        while True:
            b = self._need(1)[0]
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return n
            shift += 7

    def binary_str(self) -> str:
        ln = self.varint()
        return self._need(ln).decode("utf-8", "replace")
