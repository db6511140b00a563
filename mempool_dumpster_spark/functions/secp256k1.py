"""Pure-Python secp256k1 ECDSA public-key recovery (SEC 1 v2 §4.1.6).

Dependency-free fallback for Ethereum sender recovery; Jacobian-coordinate
scalar multiplication keeps it to ~2 modular inversions per recover. A
production cluster should install `coincurve` (libsecp256k1) — `recover`
auto-dispatches to it when importable, ~100× faster.
"""

from __future__ import annotations

# Curve parameters (secp256k1, SEC 2 §2.4.1)
P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8

_JPoint = tuple[int, int, int]  # Jacobian (X, Y, Z); Z=0 → infinity
_INF: _JPoint = (1, 1, 0)


def _jdouble(p: _JPoint) -> _JPoint:
    x, y, z = p
    if z == 0 or y == 0:
        return _INF
    s = (4 * x * y * y) % P
    m = (3 * x * x) % P  # a=0 for secp256k1
    x2 = (m * m - 2 * s) % P
    y2 = (m * (s - x2) - 8 * y * y * y * y) % P
    z2 = (2 * y * z) % P
    return x2, y2, z2


def _jadd(p: _JPoint, q: _JPoint) -> _JPoint:
    if p[2] == 0:
        return q
    if q[2] == 0:
        return p
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1z1 = z1 * z1 % P
    z2z2 = z2 * z2 % P
    u1 = x1 * z2z2 % P
    u2 = x2 * z1z1 % P
    s1 = y1 * z2 * z2z2 % P
    s2 = y2 * z1 * z1z1 % P
    if u1 == u2:
        if s1 != s2:
            return _INF
        return _jdouble(p)
    h = (u2 - u1) % P
    r = (s2 - s1) % P
    h2 = h * h % P
    h3 = h * h2 % P
    x3 = (r * r - h3 - 2 * u1 * h2) % P
    y3 = (r * (u1 * h2 - x3) - s1 * h3) % P
    z3 = h * z1 * z2 % P
    return x3, y3, z3


def _jadd_affine(p: _JPoint, q: tuple[int, int]) -> _JPoint:
    """Mixed Jacobian + affine addition (q.z == 1) — ~30% cheaper than the
    general add; used for the precomputed-table points."""
    if p[2] == 0:
        return (q[0], q[1], 1)
    x1, y1, z1 = p
    x2, y2 = q
    z1z1 = z1 * z1 % P
    u2 = x2 * z1z1 % P
    s2 = y2 * z1 * z1z1 % P
    if x1 == u2:
        if y1 != s2:
            return _INF
        return _jdouble(p)
    h = (u2 - x1) % P
    r = (s2 - y1) % P
    h2 = h * h % P
    h3 = h * h2 % P
    x3 = (r * r - h3 - 2 * x1 * h2) % P
    y3 = (r * (x1 * h2 - x3) - y1 * h3) % P
    z3 = h * z1 % P
    return x3, y3, z3


def _jmul(p: _JPoint, k: int) -> _JPoint:
    result = _INF
    addend = p
    while k:
        if k & 1:
            result = _jadd(result, addend)
        addend = _jdouble(addend)
        k >>= 1
    return result


def _jmul_wnaf(p: _JPoint, k: int, width: int = 4) -> _JPoint:
    """Width-4 wNAF scalar multiplication for a variable point: 8 precomputed
    odd multiples, then one add per ~(width+1) doubles — ~2.4× fewer adds
    than plain double-and-add."""
    if k == 0 or p[2] == 0:
        return _INF
    # odd multiples P, 3P, ..., 15P
    two_p = _jdouble(p)
    pre = [p]
    for _ in range((1 << (width - 1)) - 1):
        pre.append(_jadd(pre[-1], two_p))
    # wNAF digits, little-endian
    digits = []
    mod_mask = (1 << (width + 1)) - 1
    half = 1 << width
    while k:
        if k & 1:
            d = k & mod_mask
            if d > half:
                d -= mod_mask + 1
            digits.append(d)
            k -= d
        else:
            digits.append(0)
        k >>= 1
    acc = _INF
    for d in reversed(digits):
        acc = _jdouble(acc)
        if d:
            q = pre[(d if d > 0 else -d) >> 1]
            acc = _jadd(acc, q if d > 0 else (q[0], P - q[1], q[2]))
    return acc


def _batch_to_affine(points: list[_JPoint]) -> list[tuple[int, int]]:
    """Montgomery batch inversion: all z⁻¹ for ONE modular inversion."""
    zs = [pt[2] for pt in points]
    prefix = [1] * (len(zs) + 1)
    for i, z in enumerate(zs):
        prefix[i + 1] = prefix[i] * z % P
    inv_all = pow(prefix[-1], -1, P)
    out: list[tuple[int, int]] = [None] * len(points)  # type: ignore[list-item]
    for i in range(len(zs) - 1, -1, -1):
        zinv = inv_all * prefix[i] % P
        inv_all = inv_all * zs[i] % P
        x, y, _ = points[i]
        zinv2 = zinv * zinv % P
        out[i] = (x * zinv2 % P, y * zinv2 * zinv % P)
    return out


_G_TABLE: list[list[tuple[int, int]]] | None = None


def _g_table() -> list[list[tuple[int, int]]]:
    """Fixed-base comb for G: affine (j+1)·16ʷ·G for w ∈ [0,64), j ∈ [0,15).
    Built once per process (one batch inversion); turns u1·G into ≤64 mixed
    additions with zero doublings."""
    global _G_TABLE
    if _G_TABLE is None:
        jrows: list[_JPoint] = []
        base: _JPoint = (GX, GY, 1)
        for _ in range(64):
            cur = base
            for _ in range(15):
                jrows.append(cur)
                cur = _jadd(cur, base)
            for _ in range(4):  # base ← 16·base
                base = _jdouble(base)
        flat = _batch_to_affine(jrows)
        _G_TABLE = [flat[w * 15 : w * 15 + 15] for w in range(64)]
    return _G_TABLE


def _mul_g(k: int) -> _JPoint:
    """k·G via the fixed-base table (k already reduced mod N)."""
    table = _g_table()
    acc = _INF
    w = 0
    while k:
        d = k & 15
        if d:
            acc = _jadd_affine(acc, table[w][d - 1])
        k >>= 4
        w += 1
    return acc


def _to_affine(p: _JPoint) -> tuple[int, int]:
    x, y, z = p
    if z == 0:
        raise ValueError("point at infinity")
    zinv = pow(z, -1, P)
    zinv2 = zinv * zinv % P
    return x * zinv2 % P, y * zinv2 * zinv % P


def recover_pubkey_pure(msg_hash: bytes, r: int, s: int, recovery_id: int) -> bytes:
    """Recover the uncompressed public key (64 bytes, x||y) from an ECDSA
    signature. recovery_id ∈ {0,1,2,3}; {2,3} add N to r (vanishingly rare).
    Raises ValueError on any invalid signature.
    """
    if not (1 <= r < N and 1 <= s < N and 0 <= recovery_id <= 3):
        raise ValueError("signature values out of range")
    x = r + (recovery_id >> 1) * N
    if x >= P:
        raise ValueError("r+jN out of field")
    # lift x: y^2 = x^3 + 7
    y_sq = (pow(x, 3, P) + 7) % P
    y = pow(y_sq, (P + 1) // 4, P)
    if y * y % P != y_sq:
        raise ValueError("point not on curve")
    if (y & 1) != (recovery_id & 1):
        y = P - y
    # Q = r^-1 (s*R - z*G)
    z = int.from_bytes(msg_hash, "big") % N
    r_inv = pow(r, -1, N)
    u1 = (-z * r_inv) % N
    u2 = (s * r_inv) % N
    # u1·G via the fixed-base comb (no doublings), u2·R via width-4 wNAF —
    # together ~2.5× fewer curve ops than two plain double-and-add ladders.
    q = _jadd(_mul_g(u1), _jmul_wnaf((x, y, 1), u2))
    qx, qy = _to_affine(q)
    return qx.to_bytes(32, "big") + qy.to_bytes(32, "big")


try:  # native fast path
    from coincurve import PublicKey as _CCPublicKey  # type: ignore

    def recover_pubkey(msg_hash: bytes, r: int, s: int, recovery_id: int) -> bytes:
        sig = r.to_bytes(32, "big") + s.to_bytes(32, "big") + bytes([recovery_id])
        return _CCPublicKey.from_signature_and_message(
            sig, msg_hash, hasher=None
        ).format(compressed=False)[1:]

except ImportError:
    recover_pubkey = recover_pubkey_pure
