"""xxHash64 re-implemented in pure DuckDB SQL, so the PRODUCTION sketch
queries (minhash / simhash over Spark's built-in ``xxhash64``) can be
value-checked by the driver's DuckDB oracle instead of rows-only.

Spark's ``xxhash64(cols...)`` (catalyst XxHash64 over XXH64.java) starts
from seed 42 and folds each column through XXH64:

- long columns:   ``hash = XXH64.hashLong(value, hash)``
- int columns:    ``hash = XXH64.hashInt(value, hash)`` (different
  constants from the long path — seed+P5+4, ``(i & 0xFFFFFFFF) * P1``,
  rotl 23, ``* P2 + P3``)
- string columns: ``hash = XXH64.hashUnsafeBytes(utf8, hash)`` — the
  standard XXH64 algorithm over the raw UTF-8 bytes

All three are replayed here, bit-exactly (pytest-pinned against
``F.xxhash64`` in tests/test_pipeline_ops.py). Two constraints shape the
generated SQL:

- 64-bit wrap-around arithmetic does not exist in DuckDB (BIGINT
  overflow raises), so every step runs in HUGEINT with an explicit
  ``& (2^64-1)`` mask, and 64x64-bit multiplication is decomposed into
  32-bit limbs so no intermediate exceeds HUGEINT range.
- The oracle contract is ONE plain SELECT (no CREATE MACRO side
  statements — the driver runs each oracle on a shared connection), so
  the helpers are expanded Python-side. To keep that expansion linear,
  the algorithm is laid out as LAYERED SELECTs: each step is a named
  column referencing the previous layer's columns, never a nested copy
  of the whole expression.
"""

from __future__ import annotations

P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
MASK = (1 << 64) - 1


def _h(x: int) -> str:
    return f"{x % (1 << 64)}::HUGEINT"


# -- expression builders (python-side "macros"; args should be short
#    column refs / lambda vars — each may be referenced up to 3x) -------

def _u64(x: str) -> str:
    return f"(CAST({x} AS HUGEINT) & {_h(MASK)})"


def _mul(a: str, b: str) -> str:
    """(a * b) mod 2^64 via 32-bit limbs (no HUGEINT overflow)."""
    return _u64(f"({a} & 4294967295::HUGEINT) * ({b} & 4294967295::HUGEINT)"
                f" + ((({a} >> 32) * ({b} & 4294967295::HUGEINT)"
                f" + ({a} & 4294967295::HUGEINT) * ({b} >> 32)) << 32)")


def _rotl(x: str, r: int) -> str:
    return f"({_u64(f'{x} << {r}')} | ({x} >> {64 - r}))"


def _round(acc: str, lane: str) -> str:
    return _mul(_rotl(_u64(f"{acc} + {_mul(lane, _h(P2))}"), 31), _h(P1))


def _byte(hx: str, i: str) -> str:
    """Byte ``i`` (0-based) of the hex dump ``hx`` as HUGEINT (the hex
    alphabet string deliberately omits '0' so strpos is 0-based)."""
    return (f"CAST(strpos('123456789ABCDEF',"
            f" substr({hx}, CAST(2 * ({i}) + 1 AS BIGINT), 1)) * 16"
            f" + strpos('123456789ABCDEF',"
            f" substr({hx}, CAST(2 * ({i}) + 2 AS BIGINT), 1)) AS HUGEINT)")


def _le(hx: str, o: str, nbytes: int) -> str:
    """Little-endian ``nbytes``-byte load at byte offset ``o``."""
    return "(" + " | ".join(
        f"({_byte(hx, f'({o}) + {j}')} << {8 * j})"
        for j in range(nbytes)) + ")"


def _sig(h: str) -> str:
    """Unsigned HUGEINT -> two's-complement signed BIGINT (Spark's
    hash column type)."""
    return (f"CAST(CASE WHEN {h} >= 9223372036854775808::HUGEINT"
            f" THEN {h} - 18446744073709551616::HUGEINT"
            f" ELSE {h} END AS BIGINT)")


def _layers(sql: str, steps: list[tuple[str, str]]) -> str:
    """Wrap ``sql`` (any SELECT) in one SELECT per (name, expr) step,
    each new column free to reference all previous ones."""
    for name, expr in steps:
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    return sql


def _avalanche(t: str, src: str, out: str) -> list[tuple[str, str]]:
    return [
        (f"{t}fa", _mul(f"xor({src}, {src} >> 33)", _h(P2))),
        (f"{t}fb", _mul(f"xor({t}fa, {t}fa >> 29)", _h(P3))),
        (out, _sig(f"xor({t}fb, {t}fb >> 32)")),
    ]


def hash_long_layers(sql: str, lcol: str, seed: str, out: str,
                     tag: str) -> str:
    """Append layers computing ``out = XXH64.hashLong(lcol, seed)``.
    ``lcol``/``seed`` are SQL expressions over ``sql``'s columns (signed
    BIGINT or HUGEINT); intermediates are prefixed ``_{tag}``."""
    t = f"_{tag}"
    return _layers(sql, [
        (f"{t}a", _u64(f"{_u64(seed)} + {_h(P5 + 8)}")),
        (f"{t}k", _mul(_rotl(_mul(_u64(lcol), _h(P2)), 31), _h(P1))),
        (f"{t}b", _u64(f"{_mul(_rotl(f'xor({t}a, {t}k)', 27), _h(P1))}"
                       f" + {_h(P4)}")),
        *_avalanche(t, f"{t}b", out),
    ])


def hash_int_layers(sql: str, icol: str, seed: str, out: str,
                    tag: str) -> str:
    """Append layers computing ``out = XXH64.hashInt(icol, seed)`` — the
    4-byte path Spark uses for IntegerType columns (e.g. the
    ``F.lit(i)`` hash-index argument in minhash signatures)."""
    t = f"_{tag}"
    return _layers(sql, [
        (f"{t}a", _u64(f"{_u64(seed)} + {_h(P5 + 4)}")),
        (f"{t}k", _mul(f"({_u64(icol)} & 4294967295::HUGEINT)", _h(P1))),
        (f"{t}b", _u64(f"{_mul(_rotl(f'xor({t}a, {t}k)', 23), _h(P2))}"
                       f" + {_h(P3)}")),
        *_avalanche(t, f"{t}b", out),
    ])


def hash_bytes_layers(sql: str, strcol: str, out: str, tag: str,
                      seed: str = "42") -> str:
    """Append layers computing ``out = XXH64.hashUnsafeBytes(utf8(strcol),
    seed)`` — the full XXH64 over a varchar's UTF-8 bytes. The stripe
    loop and the byte tail run as ``list_reduce`` folds so any length is
    handled; for the short-shingle common case (n < 32) the stripe lists
    are empty and the folds return their seeds untouched."""
    t = f"_{tag}"
    inits = [(P1 + P2) % (1 << 64), P2, 0, (-P1) % (1 << 64)]
    steps: list[tuple[str, str]] = [
        (f"{t}hx", f"hex(encode({strcol}))"),
        (f"{t}n", f"CAST(octet_length(encode({strcol})) AS HUGEINT)"),
        (f"{t}m", f"CAST({t}n // 32 AS BIGINT)"),
        (f"{t}sd", _u64(seed)),
    ]
    for i in range(4):  # v1..v4 accumulators over the 32-byte stripes
        steps.append((
            f"{t}v{i + 1}",
            f"list_reduce(list_prepend({_u64(f'{t}sd + {_h(inits[i])}')}, "
            f"list_transform(range(0, {t}m), "
            f"zt -> {_le(f'{t}hx', f'32 * zt + {8 * i}', 8)})), "
            f"(zacc, zx) -> {_round('zacc', 'zx')})"))
    merge = _u64(f"{_rotl(f'{t}v1', 1)} + {_rotl(f'{t}v2', 7)}"
                 f" + {_rotl(f'{t}v3', 12)} + {_rotl(f'{t}v4', 18)}")
    steps.append((f"{t}h0", f"CASE WHEN {t}n >= 32 THEN {merge} "
                            f"ELSE {_u64(f'{t}sd + {_h(P5)}')} END"))
    h = f"{t}h0"
    for i in range(4):  # merge rounds (guarded: only on the >=32 branch)
        rnd = _round("0::HUGEINT", f"{t}v{i + 1}")
        body = _u64(_mul(f"xor({h}, {rnd})", _h(P1)) + f" + {_h(P4)}")
        steps.append((f"{t}g{i + 1}",
                      f"CASE WHEN {t}n >= 32 THEN {body} ELSE {h} END"))
        h = f"{t}g{i + 1}"
    rnd8 = _round("0::HUGEINT", "zx")
    fold8 = _u64(_mul(_rotl(f"xor(zacc, {rnd8})", 27), _h(P1))
                 + f" + {_h(P4)}")
    le4 = _mul(_le(f"{t}hx", f"{t}p1", 4), _h(P1))
    body4 = _u64(_mul(_rotl(f"xor({t}t8, {le4})", 23), _h(P2))
                 + f" + {_h(P3)}")
    steps += [
        (f"{t}p0", f"32 * {t}m"),
        (f"{t}hn", _u64(f"{h} + {t}n")),
        # 8-byte tail chunks
        (f"{t}t8", f"list_reduce(list_prepend({t}hn, "
                   f"list_transform(range(0, CAST(({t}n - {t}p0) // 8 "
                   f"AS BIGINT)), zt -> {_le(f'{t}hx', f'{t}p0 + 8 * zt', 8)})), "
                   f"(zacc, zx) -> {fold8})"),
        (f"{t}p1", f"{t}p0 + 8 * (({t}n - {t}p0) // 8)"),
        # one optional 4-byte chunk
        (f"{t}c4", f"CASE WHEN {t}n - {t}p1 >= 4 THEN {body4}"
                   f" ELSE {t}t8 END"),
        (f"{t}p2", f"{t}p1 + CASE WHEN {t}n - {t}p1 >= 4 "
                   f"THEN 4 ELSE 0 END"),
        # remaining single bytes
        (f"{t}t1", f"list_reduce(list_prepend({t}c4, "
                   f"list_transform(range(CAST({t}p2 AS BIGINT), "
                   f"CAST({t}n AS BIGINT)), zi -> {_byte(f'{t}hx', 'zi')})), "
                   f"(zacc, zx) -> "
                   + _mul(_rotl(f"xor(zacc, {_mul('zx', _h(P5))})", 11),
                          _h(P1)) + ")"),
        *_avalanche(t, f"{t}t1", out),
    ]
    return _layers(sql, steps)
