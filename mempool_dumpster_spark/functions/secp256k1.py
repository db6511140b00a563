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


def _jmul(p: _JPoint, k: int) -> _JPoint:
    result = _INF
    addend = p
    while k:
        if k & 1:
            result = _jadd(result, addend)
        addend = _jdouble(addend)
        k >>= 1
    return result


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
    q = _jadd(_jmul((GX, GY, 1), u1), _jmul((x, y, 1), u2))
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
