"""Numpy-vectorized MD5 (RFC 1321) for SHORT messages — the
hash-sampling hot path.

``hash_sample`` keys a deterministic split on ``md5(str(key))`` so the
exact same predicate is expressible in DuckDB for the correctness
oracle. A per-row ``hashlib.md5`` call is C-speed per digest but pays
object construction + hex conversion per row; over 10^12 keys that is
real CPU. Keys stringify to <= 55 bytes (one padded MD5 block), so the
whole batch runs as 64 rounds of numpy uint32 ops over an (n, 16)
message matrix — one Python-level pass regardless of row count.
Longer keys fall back to hashlib per row (rare: a 55-char key).

Only the first 32 bits of the digest are produced (``md5_u32``) — all
this engine needs (both ``hash_sample`` and the SQL oracle use the
first 8 hex digits). Verified bit-identical to hashlib in
tests/test_new_ops.py.
"""

from __future__ import annotations

import numpy as np

_K = np.floor(np.abs(np.sin(np.arange(1, 65))) * (1 << 32)) \
    .astype(np.uint64).astype(np.uint32)
_S = np.array([7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
              + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
              dtype=np.uint32)
_G = np.concatenate([
    np.arange(16),
    (5 * np.arange(16, 32) + 1) % 16,
    (3 * np.arange(32, 48) + 5) % 16,
    (7 * np.arange(48, 64)) % 16,
]).astype(np.int64)

_A0 = np.uint32(0x67452301)
_B0 = np.uint32(0xEFCDAB89)
_C0 = np.uint32(0x98BADCFE)
_D0 = np.uint32(0x10325476)


def _rotl(x: np.ndarray, s: int) -> np.ndarray:
    s = np.uint32(s)
    return (x << s) | (x >> (np.uint32(32) - s))


def _md5_block_u32(m: np.ndarray) -> np.ndarray:
    """First 32 digest bits for each row of an (n, 16) uint32
    little-endian single-block message matrix."""
    a = np.full(m.shape[0], _A0, dtype=np.uint32)
    b = np.full(m.shape[0], _B0, dtype=np.uint32)
    c = np.full(m.shape[0], _C0, dtype=np.uint32)
    d = np.full(m.shape[0], _D0, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for i in range(64):
            if i < 16:
                f = (b & c) | (~b & d)
            elif i < 32:
                f = (d & b) | (~d & c)
            elif i < 48:
                f = b ^ c ^ d
            else:
                f = c ^ (b | ~d)
            f = f + a + _K[i] + m[:, _G[i]]
            a, d, c = d, c, b
            b = c + _rotl(f, int(_S[i]))
    # hexdigest()[:8] is the little-endian A word printed big-endian
    return (a + _A0).byteswap()


def md5_u32(keys: list) -> np.ndarray:
    """uint32 of the first 8 hex digits of md5(str(k)) per key —
    vectorized for keys that stringify to <= 55 bytes."""
    import hashlib

    msgs = [str(k).encode() for k in keys]
    n = len(msgs)
    out = np.zeros(n, dtype=np.uint32)
    if n == 0:
        return out
    lens = np.fromiter((len(s) for s in msgs), dtype=np.int64, count=n)
    short = lens <= 55
    idx_s = np.nonzero(short)[0]
    if len(idx_s):
        sm = [msgs[i] for i in idx_s]
        sl = lens[idx_s]
        block = np.zeros((len(idx_s), 64), dtype=np.uint8)
        flat = np.frombuffer(b"".join(sm), dtype=np.uint8)
        starts = np.concatenate([[0], np.cumsum(sl)[:-1]])
        rows = np.repeat(np.arange(len(idx_s)), sl)
        cols = np.arange(len(flat)) - np.repeat(starts, sl)
        block[rows, cols] = flat
        block[np.arange(len(idx_s)), sl] = 0x80
        bits = (sl * 8).astype("<u8")
        block[:, 56:64] = bits.view(np.uint8).reshape(-1, 8)
        m = block.view("<u4").reshape(len(idx_s), 16)
        out[idx_s] = _md5_block_u32(np.ascontiguousarray(m))
    for i in np.nonzero(~short)[0]:
        out[i] = int.from_bytes(hashlib.md5(msgs[i]).digest()[:4], "big")
    return out


def md5_u32_windows(data: bytes, k: int) -> np.ndarray:
    """uint32 md5 prefixes (first 8 hex digits) of EVERY k-byte
    sliding window of ``data`` — the winnowing-fingerprint hot path.
    One (chunked) numpy pass: windows come from a zero-copy
    stride-tricks view, padding/length fields are constant per call
    (k <= 55 so each window is one MD5 block).  Equals
    ``md5_u32([data[i:i+k] ...])`` bit-for-bit."""
    if not 0 < k <= 55:
        raise ValueError("k must be in 1..55")
    a = np.frombuffer(data, dtype=np.uint8)
    n = len(a) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint32)
    from numpy.lib.stride_tricks import sliding_window_view
    wins = sliding_window_view(a, k)
    out = np.empty(n, dtype=np.uint32)
    bits = np.array([k * 8], dtype="<u8").view(np.uint8)
    CHUNK = 1 << 16  # bound the 64-byte-per-window block matrix
    for s in range(0, n, CHUNK):
        e = min(n, s + CHUNK)
        block = np.zeros((e - s, 64), dtype=np.uint8)
        block[:, :k] = wins[s:e]
        block[:, k] = 0x80
        block[:, 56:64] = bits
        m = block.view("<u4").reshape(e - s, 16)
        out[s:e] = _md5_block_u32(np.ascontiguousarray(m))
    return out
