"""Ethereum transaction parsing: raw RLP → the 14 TxSummary metadata columns
plus validation verdict — the engine's one genuinely custom projection
(SURVEY.md P1/P2/F4; reference common/txsfile.go:150-209, common/utils.go:69-95,
collector/tx_processor.go:355-416).

Handles all four EIP-2718 tx types (legacy, 2930, 1559, 4844), the
wrapped-legacy/wrapped-typed canonicalization quirk (reference
common/rlp_test.go:24-29: an RLP *string* wrapping a typed payload is
unwrapped and re-encoded canonically), blob sidecar detection, and
ECDSA sender recovery.

Everything is pure Python on bytes — no Spark imports here; `rlp_udf.py`
wraps this for the DataFrame layer via Arrow-batched pandas UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

from mempool_dumpster_spark.functions import rlp_codec as rlp
from mempool_dumpster_spark.functions.keccak import keccak256
from mempool_dumpster_spark.functions.secp256k1 import N as _SECP_N
from mempool_dumpster_spark.functions.secp256k1 import recover_pubkey

_UINT256_MAX = (1 << 256) - 1
_SECP_N_HALF = _SECP_N >> 1  # EIP-2 low-s bound (geth crypto.ValidateSignatureValues)

#: geth's zero-value Address — what TxSummaryEntry.From holds when sender
#: recovery fails (reference common/txsfile.go:165-169: the error is ignored
#: and the zero address is formatted).
ZERO_ADDRESS = "0x" + "00" * 20

# Trash reasons — exact strings from reference collector/tx_processor.go:327-353
# (writeInvalidTx) so trash CSVs join/compare cleanly against reference data.
REASON_SIGNATURE_ERROR = "signature-error"  # common/consts.go:17
REASON_CHAINID_NOT_SET = "chainId not set"
REASON_NEGATIVE_VALUE = "negative value"
REASON_GASFEE_TOO_BIG = "extremely large gasFeeCap"
REASON_GASTIP_TOO_BIG = "extremely large gasTipCap"
REASON_FEECAP_LT_TIPCAP = "gasFeeCap lower than gasTipCap"
REASON_BLOB_NO_SIDECAR = "invalid blob transaction"
REASON_DECODE_ERROR = "rlp-decode-error"


class TxDecodeError(ValueError):
    pass


@dataclass
class ParsedTx:
    hash: str  # 0x + 64 hex
    chain_id: str  # decimal string
    tx_type: int
    sender: str  # 0x + 40 hex ('' if signature invalid)
    to: str  # '' for contract creation
    value: str  # uint256 decimal string
    nonce: str
    gas: str
    gas_price: str
    gas_tip_cap: str
    gas_fee_cap: str
    data_size: int
    data_4bytes: str  # '' if calldata < 4 bytes
    raw_canonical: bytes  # EIP-2718 canonical encoding
    valid: bool
    reason: str  # '' when valid


def _hex_to_bytes(raw: str | bytes) -> bytes:
    if isinstance(raw, bytes):
        return raw
    s = raw[2:] if raw.startswith("0x") else raw
    return bytes.fromhex(s)


def _addr(b) -> str:
    # type-check BEFORE touching the value: a garbage payload can decode
    # to a nested list in the `to` slot, and a 20-item list passes the
    # length check only to blow up in .hex() with AttributeError — which
    # would escape the UDF's (TxDecodeError, ValueError) guard and kill
    # the whole ingest job on one row instead of routing it to rejects
    if not isinstance(b, bytes):
        raise TxDecodeError("address field is not a scalar")
    if b == b"":
        return ""
    if len(b) != 20:
        raise TxDecodeError(f"bad address length {len(b)}")
    return "0x" + b.hex()


def _data(b) -> bytes:
    if not isinstance(b, bytes):
        raise TxDecodeError("data field is not a scalar")
    return b


def parse_tx(raw: str | bytes) -> ParsedTx:
    """Decode a raw transaction (hex string or bytes) into its metadata.

    Raises TxDecodeError for undecodable payloads (the reference drops those
    rows with an error log, common/txsfile.go:131-136); recoverable semantic
    problems (bad signature, fee inversions) come back as valid=False with
    the reference's trash reason instead.
    """
    data = _hex_to_bytes(raw)
    if len(data) == 0:
        raise TxDecodeError("empty payload")

    # Unwrap: an RLP string wrapping a full tx payload (wrapped-legacy quirk)
    if 0x80 <= data[0] < 0xC0:
        try:
            inner = rlp.decode(data)
        except rlp.RLPError as e:
            raise TxDecodeError(str(e)) from e
        if not isinstance(inner, bytes) or len(inner) == 0:
            raise TxDecodeError("wrapped payload is not a string")
        data = inner

    if data[0] >= 0xC0:
        return _parse_legacy(data)
    if data[0] in (0x01, 0x02, 0x03):
        return _parse_typed(data)
    raise TxDecodeError(f"unknown tx type byte {data[0]:#x}")


def _ints(fields: list, idxs: list[int]) -> list[int]:
    out = []
    for i in idxs:
        f = fields[i]
        if not isinstance(f, bytes):
            raise TxDecodeError(f"field {i} is not a scalar")
        out.append(rlp.to_int(f))
    return out


def _parse_legacy(data: bytes) -> ParsedTx:
    try:
        fields = rlp.decode(data)
    except rlp.RLPError as e:
        raise TxDecodeError(str(e)) from e
    if not isinstance(fields, list) or len(fields) != 9:
        raise TxDecodeError("legacy tx must be a 9-item list")
    nonce, gas_price, gas, value, v, r, s = _ints(fields, [0, 1, 2, 4, 6, 7, 8])
    to = _addr(fields[3])
    calldata = _data(fields[5])
    # EIP-155: v = chain_id*2 + 35 + parity; pre-155: v ∈ {27, 28}, chain 0
    if v >= 35:
        chain_id = (v - 35) // 2
        rec_id = (v - 35) & 1
        sig_payload = rlp.encode(
            fields[:6] + [rlp.from_int(chain_id), b"", b""]
        )
    elif v in (27, 28):
        chain_id = 0
        rec_id = v - 27
        sig_payload = rlp.encode(fields[:6])
    else:
        raise TxDecodeError(f"invalid legacy v={v}")
    canonical = rlp.encode(fields)
    tx_hash = "0x" + keccak256(canonical).hex()
    return _finish(
        tx_hash=tx_hash,
        chain_id=chain_id,
        tx_type=0,
        sig_hash=keccak256(sig_payload),
        r=r,
        s=s,
        rec_id=rec_id,
        to=to,
        value=value,
        nonce=nonce,
        gas=gas,
        gas_price=gas_price,
        gas_tip_cap=gas_price,  # legacy: tip == fee == gasPrice
        gas_fee_cap=gas_price,
        calldata=calldata,
        raw_canonical=canonical,
        has_sidecar=False,
    )


def _parse_typed(data: bytes) -> ParsedTx:
    tx_type = data[0]
    try:
        payload = rlp.decode(data[1:])
    except rlp.RLPError as e:
        raise TxDecodeError(str(e)) from e
    if not isinstance(payload, list):
        raise TxDecodeError("typed tx payload must be a list")

    has_sidecar = False
    if tx_type == 0x03 and len(payload) == 4 and isinstance(payload[0], list):
        # EIP-4844 network wrapper: [tx_payload, blobs, commitments, proofs]
        payload = payload[0]
        has_sidecar = True

    if tx_type == 0x01:
        if len(payload) != 11:
            raise TxDecodeError("type-1 tx must have 11 fields")
        chain_id, nonce, gas_price, gas, value, y, r, s = _ints(
            payload, [0, 1, 2, 3, 5, 8, 9, 10]
        )
        to = _addr(payload[4])
        calldata = _data(payload[6])
        tip = fee = gas_price
        n_unsigned = 8
    elif tx_type == 0x02:
        if len(payload) != 12:
            raise TxDecodeError("type-2 tx must have 12 fields")
        chain_id, nonce, tip, fee, gas, value, y, r, s = _ints(
            payload, [0, 1, 2, 3, 4, 6, 9, 10, 11]
        )
        to = _addr(payload[5])
        calldata = _data(payload[7])
        gas_price = fee  # dynamic-fee: GasPrice() == GasFeeCap
        n_unsigned = 9
    elif tx_type == 0x03:
        if len(payload) != 14:
            raise TxDecodeError("type-3 tx must have 14 fields")
        chain_id, nonce, tip, fee, gas, value, y, r, s = _ints(
            payload, [0, 1, 2, 3, 4, 6, 11, 12, 13]
        )
        to = _addr(payload[5])
        if to == "":
            raise TxDecodeError("blob tx without to address")
        calldata = _data(payload[7])
        gas_price = fee
        n_unsigned = 11
    else:
        raise TxDecodeError(f"unsupported tx type {tx_type}")

    if y > 1:
        raise TxDecodeError(f"invalid yParity {y}")
    # canonical (minimal) encoding excludes the blob sidecar
    canonical = bytes([tx_type]) + rlp.encode(payload)
    tx_hash = "0x" + keccak256(canonical).hex()
    sig_payload = bytes([tx_type]) + rlp.encode(payload[:n_unsigned])
    return _finish(
        tx_hash=tx_hash,
        chain_id=chain_id,
        tx_type=tx_type,
        sig_hash=keccak256(sig_payload),
        r=r,
        s=s,
        rec_id=y,
        to=to,
        value=value,
        nonce=nonce,
        gas=gas,
        gas_price=gas_price,
        gas_tip_cap=tip,
        gas_fee_cap=fee,
        calldata=calldata,
        raw_canonical=canonical,
        has_sidecar=has_sidecar,
    )


def _finish(
    *,
    tx_hash: str,
    chain_id: int,
    tx_type: int,
    sig_hash: bytes,
    r: int,
    s: int,
    rec_id: int,
    to: str,
    value: int,
    nonce: int,
    gas: int,
    gas_price: int,
    gas_tip_cap: int,
    gas_fee_cap: int,
    calldata: bytes,
    raw_canonical: bytes,
    has_sidecar: bool,
) -> ParsedTx:
    # Sender recovery with geth's signature rules (crypto.ValidateSignatureValues,
    # homestead=true): r,s ∈ [1,N), s ≤ N/2 (EIP-2 — malleated high-s signatures
    # are rejected, not recovered), v ∈ {0,1}. On failure the sender is geth's
    # zero-value Address (reference common/txsfile.go:165-169).
    sender = ZERO_ADDRESS
    sig_ok = (
        1 <= r < _SECP_N and 1 <= s <= _SECP_N_HALF and 0 <= rec_id <= 1
    )
    if sig_ok:
        try:
            pubkey = recover_pubkey(sig_hash, r, s, rec_id)
            sender = "0x" + keccak256(pubkey)[12:].hex()
        except ValueError:
            sig_ok = False

    # Validation cascade (F4) in the reference's order: chainId FIRST, then
    # signature, then txpool sanity checks (collector/tx_processor.go:355-416)
    valid = True
    reason = ""
    if valid and chain_id <= 0:
        valid, reason = False, REASON_CHAINID_NOT_SET
    if valid and not sig_ok:
        valid, reason = False, REASON_SIGNATURE_ERROR
    if valid and value < 0:
        valid, reason = False, REASON_NEGATIVE_VALUE
    if valid and gas_fee_cap > _UINT256_MAX:
        valid, reason = False, REASON_GASFEE_TOO_BIG
    if valid and gas_tip_cap > _UINT256_MAX:
        valid, reason = False, REASON_GASTIP_TOO_BIG
    if valid and gas_fee_cap < gas_tip_cap:
        valid, reason = False, REASON_FEECAP_LT_TIPCAP
    if valid and tx_type == 0x03 and not has_sidecar:
        valid, reason = False, REASON_BLOB_NO_SIDECAR

    return ParsedTx(
        hash=tx_hash,
        chain_id=str(chain_id),
        tx_type=tx_type,
        sender=sender,
        to=to,
        value=str(value),
        nonce=str(nonce),
        gas=str(gas),
        gas_price=str(gas_price),
        gas_tip_cap=str(gas_tip_cap),
        gas_fee_cap=str(gas_fee_cap),
        data_size=len(calldata),
        data_4bytes="0x" + calldata[:4].hex() if len(calldata) >= 4 else "",
        raw_canonical=raw_canonical,
        valid=valid,
        reason=reason,
    )


def tx_hash_only(raw: str | bytes) -> str:
    """Just the canonical tx hash — RLP decode + canonicalize + keccak, NO
    ECDSA recovery (~10× cheaper than parse_tx). Used by the streaming
    collector's sourcelog branch and as the pre-dedup key, so the expensive
    sender recovery runs once per unique tx, not once per receipt — the
    reference's economy (collector/tx_processor.go:229-247: sourcelog writes
    and the knownTxs dedup happen before validation)."""
    data = _hex_to_bytes(raw)
    if len(data) == 0:
        raise TxDecodeError("empty payload")
    if 0x80 <= data[0] < 0xC0:
        try:
            inner = rlp.decode(data)
        except rlp.RLPError as e:
            raise TxDecodeError(str(e)) from e
        if not isinstance(inner, bytes) or len(inner) == 0:
            raise TxDecodeError("wrapped payload is not a string")
        data = inner
    try:
        if data[0] >= 0xC0:
            fields = rlp.decode(data)
            if not isinstance(fields, list) or len(fields) != 9:
                raise TxDecodeError("legacy tx must be a 9-item list")
            canonical = rlp.encode(fields)
        elif data[0] in (0x01, 0x02, 0x03):
            payload = rlp.decode(data[1:])
            if not isinstance(payload, list):
                raise TxDecodeError("typed tx payload must be a list")
            if data[0] == 0x03 and len(payload) == 4 and isinstance(payload[0], list):
                payload = payload[0]  # strip the EIP-4844 network wrapper
            canonical = bytes([data[0]]) + rlp.encode(payload)
        else:
            raise TxDecodeError(f"unknown tx type byte {data[0]:#x}")
    except rlp.RLPError as e:
        raise TxDecodeError(str(e)) from e
    return "0x" + keccak256(canonical).hex()


def tx_to_hex(tx: ParsedTx) -> str:
    """P3: canonical 0x-hex of the re-encoded tx (reference
    common/txsummary.go:76-78)."""
    return "0x" + tx.raw_canonical.hex()
