"""Gorilla-style compression codecs, vectorized numpy bit-packing.

Two codecs, per the north rule (BASELINE.json:6 — "Gorilla XOR +
delta-of-delta compression of rolled-up points implemented in vectorized
pandas/Arrow UDFs"):

- :func:`compress_ints` / :func:`decompress_ints` — delta-of-delta with
  zigzag encoding and **block-adaptive** bit width. Used for token arrays
  (``array<int32>``) and integer aggregate streams.
- :func:`compress_floats` / :func:`decompress_floats` — Gorilla XOR of
  consecutive float64 bit patterns with **block-adaptive**
  leading/meaningful-bit windows. Used for rolled-up values (means,
  feature series) inside tier blocks.

Documented deviation from the Facebook Gorilla paper (VLDB'15): the
canonical codec chooses leading/meaningful windows *per value* with a
2-bit control stream; that is inherently sequential. We choose one
(leading, width) window *per block* — computable in O(1) numpy reductions
over the whole XOR array — trading a few % compression ratio for fully
vectorized encode/decode (the "no per-row Python" requirement). The
round-trip is exact: ``decompress(compress(x))`` reproduces bit-identical
arrays, including NaN payloads. pytest enforces the token-array-equality
invariant (BASELINE.json:15).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC_INT = 0x11
_MAGIC_FLOAT = 0x12


def _pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack the low `width` bits of each uint64 into a contiguous bitstream."""
    if width == 0 or values.size == 0:
        return b""
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((values[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def _unpack_bits(buf: bytes, m: int, width: int) -> np.ndarray:
    if width == 0 or m == 0:
        return np.zeros(m, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=m * width)
    arr = bits.reshape(m, width).astype(np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (arr << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)).view(np.int64)) ^ -((u & np.uint64(1)).view(np.int64))


def compress_ints(x: np.ndarray) -> bytes:
    """Delta-of-delta + zigzag + block-adaptive bitwidth. Exact round-trip."""
    x = np.asarray(x, dtype=np.int64)
    n = x.size
    head = struct.pack("<BI", _MAGIC_INT, n)
    if n == 0:
        return head
    if n == 1:
        return head + struct.pack("<q", int(x[0]))
    d1 = np.diff(x)
    head += struct.pack("<qq", int(x[0]), int(d1[0]))
    if n == 2:
        return head
    d2 = np.diff(d1)
    zz = _zigzag(d2)
    width = int(zz.max()).bit_length() if zz.size else 0
    return head + struct.pack("<B", width) + _pack_bits(zz, width)


def decompress_ints(buf: bytes) -> np.ndarray:
    magic, n = struct.unpack_from("<BI", buf, 0)
    assert magic == _MAGIC_INT, "not an int block"
    off = 5
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        (x0,) = struct.unpack_from("<q", buf, off)
        return np.array([x0], dtype=np.int64)
    x0, d0 = struct.unpack_from("<qq", buf, off)
    off += 16
    if n == 2:
        # wrap-around int64 addition: the stored delta is np.diff's
        # two's-complement-wrapped value, so reconstruction must wrap
        # too (Python-int addition would overflow int64 for extreme
        # first values, e.g. [-2^63, 2^63-1])
        x1 = (x0 + d0) & 0xFFFFFFFFFFFFFFFF
        if x1 >= 1 << 63:
            x1 -= 1 << 64
        return np.array([x0, x1], dtype=np.int64)
    (width,) = struct.unpack_from("<B", buf, off)
    off += 1
    zz = _unpack_bits(buf[off:], n - 2, width)
    d2 = _unzigzag(zz)
    d1 = np.empty(n - 1, dtype=np.int64)
    d1[0] = d0
    d1[1:] = d0 + np.cumsum(d2)
    out = np.empty(n, dtype=np.int64)
    out[0] = x0
    out[1:] = x0 + np.cumsum(d1)
    return out


def compress_floats(x: np.ndarray) -> bytes:
    """Gorilla XOR with block-adaptive (leading, width) window. Bit-exact
    round-trip including NaN payloads."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    u = x.view(np.uint64)
    n = x.size
    head = struct.pack("<BI", _MAGIC_FLOAT, n)
    if n == 0:
        return head
    head += struct.pack("<Q", int(u[0]))
    if n == 1:
        return head
    xored = u[1:] ^ u[:-1]
    orall = int(np.bitwise_or.reduce(xored))
    if orall == 0:
        return head + struct.pack("<BB", 0, 0)
    lead = 64 - orall.bit_length()
    trail = (orall & -orall).bit_length() - 1
    width = 64 - lead - trail
    body = _pack_bits(xored >> np.uint64(trail), width)
    return head + struct.pack("<BB", trail, width) + body


def decompress_floats(buf: bytes) -> np.ndarray:
    magic, n = struct.unpack_from("<BI", buf, 0)
    assert magic == _MAGIC_FLOAT, "not a float block"
    off = 5
    if n == 0:
        return np.empty(0, dtype=np.float64)
    (u0,) = struct.unpack_from("<Q", buf, off)
    off += 8
    if n == 1:
        return np.array([u0], dtype=np.uint64).view(np.float64)
    trail, width = struct.unpack_from("<BB", buf, off)
    off += 2
    xored = _unpack_bits(buf[off:], n - 1, width) << np.uint64(trail)
    u = np.empty(n, dtype=np.uint64)
    u[0] = u0
    # XOR prefix-scan: u[i] = u0 ^ xored[0] ^ ... ^ xored[i-1]
    np.bitwise_xor.accumulate(xored, out=xored)
    u[1:] = np.uint64(u0) ^ xored
    return u.view(np.float64)


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (float log2 is unsafe >2^53)."""
    v = v.astype(np.uint64)
    bits = np.zeros(v.shape, dtype=np.int64)
    w = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = (w >> np.uint64(shift)) > 0
        bits += shift * m
        w = np.where(m, w >> np.uint64(shift), w)
    return bits + (w > 0)


def compress_float_rows(M: np.ndarray, counts: np.ndarray) -> list[bytes]:
    """Compress each row of a float64 matrix into its own self-contained
    Gorilla-XOR block (same wire format as :func:`compress_floats`, so
    :func:`decompress_floats` decodes any row independently).

    Fully vectorized across rows: rows are grouped by valid count, each
    group shares one (trail, width) window computed from the OR of all the
    group's XOR deltas, and the bit matrix for the whole group is packed
    with a single ``np.packbits``. Only final per-row byte slicing is a
    Python loop (no per-value Python).
    """
    M = np.ascontiguousarray(M, dtype=np.float64)
    counts = np.asarray(counts, dtype=np.int64)
    m = M.shape[0]
    out: list[bytes] = [b""] * m
    empty_head = struct.pack("<BI", _MAGIC_FLOAT, 0)
    for c in np.unique(counts):
        rows = np.nonzero(counts == c)[0]
        c = int(c)
        if c == 0:
            for r in rows:
                out[r] = empty_head
            continue
        U = M[rows, :c].view(np.uint64)
        if c == 1:
            for i, r in enumerate(rows):
                out[r] = struct.pack("<BIQ", _MAGIC_FLOAT, 1, int(U[i, 0]))
            continue
        xored = U[:, 1:] ^ U[:, :-1]
        orall = int(np.bitwise_or.reduce(xored, axis=None))
        if orall == 0:
            tw = struct.pack("<BB", 0, 0)
            for i, r in enumerate(rows):
                out[r] = struct.pack("<BIQ", _MAGIC_FLOAT, c, int(U[i, 0])) + tw
            continue
        trail = (orall & -orall).bit_length() - 1
        width = orall.bit_length() - trail
        # byte-aligned width (round up to whole bytes): for width = 8k the
        # bit-packed wire format is EXACTLY each value's big-endian low k
        # bytes, so packing becomes a direct byte view — no per-bit
        # expansion (the old (rows, c-1, width)-uint8 blow-up streamed
        # ~70 bytes of DRAM per stored byte and dominated the tier-0
        # block-encode stage). Costs <= 7 bits/value of ratio, in line
        # with the documented per-block-window deviation; decoders are
        # unchanged (width stays a plain bit count on the wire).
        wb = -(-width // 8)
        width = wb * 8
        vals = (xored >> np.uint64(trail)).astype(">u8")
        payload = vals.view(np.uint8).reshape(len(rows), c - 1, 8)[:, :, 8 - wb:]
        # assemble EVERY block of the group in one uint8 matrix (header
        # fields as vectorized views), then slice the single backing
        # buffer: a per-row struct.pack + bytes-concat loop costs ~10us
        # per block and dominated the encode at ~1M blocks
        blocklen = 15 + (c - 1) * wb
        buf = np.empty((len(rows), blocklen), dtype=np.uint8)
        buf[:, 0] = _MAGIC_FLOAT
        buf[:, 1:5] = np.frombuffer(struct.pack("<I", c), np.uint8)
        buf[:, 5:13] = U[:, 0].astype("<u8").view(np.uint8).reshape(-1, 8)
        buf[:, 13] = trail
        buf[:, 14] = width
        buf[:, 15:] = payload.reshape(len(rows), (c - 1) * wb)
        raw = buf.tobytes()
        for i, r in enumerate(rows):
            out[r] = raw[i * blocklen:(i + 1) * blocklen]
    return out


def decompress_float_rows(blocks: list[bytes]) -> list[np.ndarray]:
    """Batch-decompress many float blocks (inverse of
    :func:`compress_float_rows`, accepts any :func:`compress_floats`
    output).

    Per-block Python is one header parse; all bit-unpacking happens in a
    handful of numpy ops per (count, trail, width) group — the tier
    cascade decodes ~10 tiny blocks per parent window, so a per-block
    ``decompress_floats`` call would dominate the stage (measured ~30x
    slower at 1.5M blocks).
    """
    m = len(blocks)
    out: list = [None] * m
    groups: dict[tuple[int, int, int], list[int]] = {}
    u0s = np.empty(m, dtype=np.uint64)
    for i, b in enumerate(blocks):
        magic, n = struct.unpack_from("<BI", b, 0)
        assert magic == _MAGIC_FLOAT, "not a float block"
        if n == 0:
            out[i] = np.empty(0, dtype=np.float64)
            continue
        (u0s[i],) = struct.unpack_from("<Q", b, 5)
        if n == 1:
            out[i] = u0s[i:i + 1].view(np.float64).copy()
            continue
        trail, width = struct.unpack_from("<BB", b, 13)
        groups.setdefault((n, trail, width), []).append(i)
    for (n, trail, width), idx in groups.items():
        rows = np.asarray(idx)
        u = np.empty((len(idx), n), dtype=np.uint64)
        u[:, 0] = u0s[rows]
        if width == 0:
            u[:, 1:] = u[:, :1]
        else:
            nbytes = -(-(n - 1) * width // 8)
            payload = np.frombuffer(
                b"".join(blocks[i][15:15 + nbytes] for i in idx),
                dtype=np.uint8).reshape(len(idx), nbytes)
            if width % 8 == 0:
                # byte-aligned blocks (compress_float_rows): values are
                # whole big-endian bytes — assemble without per-bit work
                wb = width // 8
                by = payload.reshape(len(idx), n - 1, wb)
                xored = np.zeros((len(idx), n - 1), dtype=np.uint64)
                for k in range(wb):
                    xored = (xored << np.uint64(8)) | by[:, :, k]
            else:
                bits = np.unpackbits(payload, axis=1)[:, :(n - 1) * width]
                arr = bits.reshape(len(idx), n - 1, width).astype(np.uint64)
                shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
                xored = (arr << shifts[None, None, :]).sum(axis=2,
                                                           dtype=np.uint64)
            xored <<= np.uint64(trail)
            np.bitwise_xor.accumulate(xored, axis=1, out=xored)
            u[:, 1:] = u[:, :1] ^ xored
        f = u.view(np.float64)
        for j, i in enumerate(idx):
            out[i] = f[j]
    return out


# --- batch helpers for pandas UDF columns (one block per row) --------------

def compress_int_series(series) -> list[bytes]:
    return [compress_ints(np.asarray(v)) for v in series]


def decompress_int_series(series) -> list[np.ndarray]:
    return [decompress_ints(bytes(v)) for v in series]


def compress_float_series(series) -> list[bytes]:
    return [compress_floats(np.asarray(v, dtype=np.float64)) for v in series]


def decompress_float_series(series) -> list[np.ndarray]:
    return [decompress_floats(bytes(v)) for v in series]
