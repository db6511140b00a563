"""Deterministic signed-transaction generator for fixtures.

Builds valid RLP-encoded Ethereum txs of all four types, signed on
secp256k1 with deterministic nonces, so merge-pipeline tests exercise the
real parse/recover path without any external library or fixed vectors.
"""

from __future__ import annotations

from mempool_dumpster_spark.functions import rlp_codec as rlp
from mempool_dumpster_spark.functions.keccak import keccak256
from mempool_dumpster_spark.functions.secp256k1 import N, _mul_g, _to_affine


def _priv_to_pub(priv: int) -> bytes:
    x, y = _to_affine(_mul_g(priv))
    return x.to_bytes(32, "big") + y.to_bytes(32, "big")


def priv_to_address(priv: int) -> str:
    return "0x" + keccak256(_priv_to_pub(priv))[12:].hex()


def _sign(sig_hash: bytes, priv: int) -> tuple[int, int, int]:
    """Deterministic ECDSA sign returning (r, s, recovery_id), low-s."""
    z = int.from_bytes(sig_hash, "big") % N
    k = int.from_bytes(keccak256(priv.to_bytes(32, "big") + sig_hash), "big") % N
    assert k != 0
    rx, ry = _to_affine(_mul_g(k))
    r = rx % N
    assert r != 0 and rx < N  # deterministic fixtures never hit the rare cases
    s = pow(k, -1, N) * (z + r * priv) % N
    rec_id = ry & 1
    if s > N // 2:
        s = N - s
        rec_id ^= 1
    return r, s, rec_id


def make_tx(
    priv: int = 0xA11CE,
    tx_type: int = 2,
    chain_id: int = 1,
    nonce: int = 0,
    gas: int = 21000,
    gas_price: int = 30_000_000_000,
    tip: int = 1_000_000_000,
    fee: int = 30_000_000_000,
    to: str | None = "0x" + "11" * 20,
    value: int = 10**18,
    data: bytes = b"",
    blob_sidecar: bool = True,
) -> str:
    """Returns the canonical 0x-hex raw transaction."""
    to_b = b"" if to is None else bytes.fromhex(to[2:])
    cid = rlp.from_int(chain_id)
    if tx_type == 0:
        unsigned = [
            rlp.from_int(nonce), rlp.from_int(gas_price), rlp.from_int(gas),
            to_b, rlp.from_int(value), data,
        ]
        sig_hash = keccak256(rlp.encode(unsigned + [cid, b"", b""]))
        r, s, rec = _sign(sig_hash, priv)
        v = chain_id * 2 + 35 + rec
        raw = rlp.encode(
            unsigned + [rlp.from_int(v), rlp.from_int(r), rlp.from_int(s)]
        )
        return "0x" + raw.hex()
    if tx_type == 1:
        base = [
            cid, rlp.from_int(nonce), rlp.from_int(gas_price), rlp.from_int(gas),
            to_b, rlp.from_int(value), data, [],
        ]
    elif tx_type == 2:
        base = [
            cid, rlp.from_int(nonce), rlp.from_int(tip), rlp.from_int(fee),
            rlp.from_int(gas), to_b, rlp.from_int(value), data, [],
        ]
    elif tx_type == 3:
        base = [
            cid, rlp.from_int(nonce), rlp.from_int(tip), rlp.from_int(fee),
            rlp.from_int(gas), to_b, rlp.from_int(value), data, [],
            rlp.from_int(1), [b"\x01" + b"\x00" * 31],
        ]
    else:
        raise ValueError(tx_type)
    sig_hash = keccak256(bytes([tx_type]) + rlp.encode(base))
    r, s, rec = _sign(sig_hash, priv)
    signed = base + [rlp.from_int(rec), rlp.from_int(r), rlp.from_int(s)]
    if tx_type == 3 and blob_sidecar:
        wrapped = [signed, [b"\x00" * 32], [b"\x01" * 48], [b"\x02" * 48]]
        return "0x" + (bytes([3]) + rlp.encode(wrapped)).hex()
    return "0x" + (bytes([tx_type]) + rlp.encode(signed)).hex()


def tx_hash_of(raw_hex: str) -> str:
    from mempool_dumpster_spark.functions.ethtx import parse_tx

    return parse_tx(raw_hex).hash
