"""Pure-Python Keccak-256 (the pre-NIST padding variant Ethereum uses).

Implements Keccak-f[1600] from the public Keccak reference specification
(https://keccak.team/keccak_specs_summary.html). stdlib ``hashlib.sha3_256``
is NOT a substitute — SHA3 uses 0x06 domain padding, Ethereum's Keccak uses
0x01.

This is the dependency-free fallback path; the `keccak256` dispatch at the
bottom of THIS module prefers a native implementation (pycryptodome /
eth-hash) when one is importable, which a production cluster should install
for UDF throughput.

The permutation is generated as one fully-unrolled function (24 rounds ×
25 lanes as local variables, compiled once at import) — ~6× faster than the
loop-and-list form in CPython, which matters because this is inside the
engine's single Python hot path (rlp_udf.py).
"""

from __future__ import annotations

_ROUND_CONSTANTS = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_ROTATION = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_MASK = (1 << 64) - 1


def _rotl(x: int, n: int) -> int:
    n %= 64
    return ((x << n) | (x >> (64 - n))) & _MASK


def _keccak_f(state: list[int]) -> None:
    """In-place Keccak-f[1600] permutation over a 5x5 lane state
    (state[x + 5*y], little-endian 64-bit lanes)."""
    for rc in _ROUND_CONSTANTS:
        # theta
        c = [
            state[x] ^ state[x + 5] ^ state[x + 10] ^ state[x + 15] ^ state[x + 20]
            for x in range(5)
        ]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                state[x + 5 * y] ^= d[x]
        # rho + pi
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl(
                    state[x + 5 * y], _ROTATION[x][y]
                )
        # chi
        for x in range(5):
            for y in range(5):
                state[x + 5 * y] = b[x + 5 * y] ^ (
                    (~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y] & _MASK
                )
        # iota
        state[0] ^= rc


def _gen_unrolled_f() -> str:
    """Source of a fully-unrolled Keccak-f[1600]: 25 lanes in, 25 out, every
    round constant inlined, no loops or indexing in the body."""
    lines = ["def _keccak_f_unrolled(" + ", ".join(f"a{i}" for i in range(25)) + "):"]
    emit = lines.append
    for rc in _ROUND_CONSTANTS:
        for x in range(5):
            emit(f"    c{x} = a{x} ^ a{x + 5} ^ a{x + 10} ^ a{x + 15} ^ a{x + 20}")
        for x in range(5):
            c1 = f"c{(x + 1) % 5}"
            emit(
                f"    d{x} = c{(x - 1) % 5} ^ ((({c1} << 1) | ({c1} >> 63)) & M)"
            )
        for x in range(5):
            for y in range(5):
                idx = y + 5 * ((2 * x + 3 * y) % 5)
                r = _ROTATION[x][y]
                src = f"(a{x + 5 * y} ^ d{x})"
                if r == 0:
                    emit(f"    b{idx} = {src}")
                else:
                    emit(
                        f"    t = {src}; b{idx} = ((t << {r}) | (t >> {64 - r})) & M"
                    )
        for y in range(5):
            for x in range(5):
                idx = x + 5 * y
                emit(
                    f"    a{idx} = b{idx} ^ (~b{(x + 1) % 5 + 5 * y}"
                    f" & b{(x + 2) % 5 + 5 * y} & M)"
                )
        emit(f"    a0 = a0 ^ {rc:#x}")
    emit("    return (" + ", ".join(f"a{i}" for i in range(25)) + ")")
    return "\n".join(lines)


_ns: dict = {"M": _MASK}
exec(compile(_gen_unrolled_f(), "<keccak-unrolled>", "exec"), _ns)  # noqa: S102
_keccak_f_unrolled = _ns["_keccak_f_unrolled"]


def keccak256_pure(data: bytes) -> bytes:
    rate = 136  # 1088-bit rate for 256-bit output
    state = (0,) * 25
    # absorb with Keccak (0x01) padding
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"
    ifb = int.from_bytes
    for block_start in range(0, len(padded), rate):
        block = padded[block_start : block_start + rate]
        lanes = [
            state[i] ^ ifb(block[8 * i : 8 * i + 8], "little") for i in range(17)
        ]
        state = _keccak_f_unrolled(*lanes, *state[17:])
    # squeeze (single block is enough for 32 bytes)
    out = b"".join(state[i].to_bytes(8, "little") for i in range(4))
    return out


try:  # native fast path if a keccak provider exists on the cluster
    from Crypto.Hash import keccak as _pyc_keccak  # type: ignore

    def keccak256(data: bytes) -> bytes:
        return _pyc_keccak.new(digest_bits=256, data=data).digest()

except ImportError:
    try:
        from eth_hash.auto import keccak as _eth_keccak  # type: ignore

        def keccak256(data: bytes) -> bytes:
            return _eth_keccak(data)

    except ImportError:
        keccak256 = keccak256_pure
