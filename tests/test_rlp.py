"""P1/P2/F4 unit tests: keccak vectors, RLP codec roundtrip, the reference's
golden tx vectors (data from reference common/common_test.go:15-21 and
common/rlp_test.go:13-40), generated txs of all types, and the validation
cascade."""

from __future__ import annotations

import pytest

from mempool_dumpster_spark.functions import rlp_codec as rlp
from mempool_dumpster_spark.functions.ethtx import (
    REASON_BLOB_NO_SIDECAR,
    REASON_FEECAP_LT_TIPCAP,
    REASON_SIGNATURE_ERROR,
    TxDecodeError,
    parse_tx,
    tx_to_hex,
)
from mempool_dumpster_spark.functions.keccak import keccak256_pure
from txgen import make_tx, priv_to_address

TEST1_HASH = "0xbb59e550e4730da43af01b7ae6e1d05b1df501baa4119b8ab6a3427d9b3635b1"
TEST1_RLP = "0x02f873018305643b840f2c19f08503f8bfbbb2832ab980940ed1bcc400acd34593451e76f854992198995f52808498e5b12ac080a051eb99ae13fd1ace55dd93a4b36eefa5d34e115cd7b9fd5d0ffac07300cbaeb2a0782d9ad12490b45af932d8c98cb3c2fd8c02cdd6317edb36bde2df7556fa9132"
TEST1_FROM = "0xd8aa8f3be2fb0c790d3579dcf68a04701c1e33db"

TEST2_HASH = "0xdd00ae95e4dc13fdf92682137223d697e346852a61c268faa8806b59a8cb2c9b"
TEST2_RLP_INCORRECT = "0xb87502f8720101841dcd65008502540be40082520894b2d513b9a54a999912a57b705bcadf7e71ed595c8701bf330f70d20080c001a090f9ab3c4bed558ce05b50b28a92f39d98c8974977dd0ed925d2b5f1c77a2c40a008ea8be2f31edf3467e2553c1fbabff563a4af458716434c354c771501a6168a"
TEST2_RLP_CORRECT = "0x" + TEST2_RLP_INCORRECT[6:]

WRAPPED_LEGACY_HASH = "0x470273031fc9ed469bf820795fc7528b9f698a5d33a055eab640637880b66c08"
WRAPPED_LEGACY_IN = "0xb87802f875018201088459682f00850a3cc5ac918252089404be5b8576fc23164b9ee69577fe7857dd6be1988802c346682d9a485880c080a08679e43c770c07395663fbb7fa0d2a8ca9b9535e598c25b9794c50e664c5098ca0366a741acdb68a37df66547001cf31e0c630477f78482d3b7a5778f30c6fbfe1"


def test_keccak_known_vectors():
    assert (
        keccak256_pure(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256_pure(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_rlp_roundtrip():
    items = [b"", b"\x01", b"hello", [b"a", [b"b", b""]], b"x" * 100, b"y" * 60000]
    for item in items:
        assert rlp.decode(rlp.encode(item)) == item


def test_rlp_rejects_garbage():
    with pytest.raises(rlp.RLPError):
        rlp.decode(b"\xb9\x01")  # truncated long string
    with pytest.raises(rlp.RLPError):
        rlp.decode(b"\xc2\x01")  # list payload shorter than declared


def test_golden_vector_1():
    t = parse_tx(TEST1_RLP)
    assert t.hash == TEST1_HASH
    assert t.sender == TEST1_FROM
    assert t.tx_type == 2
    assert t.chain_id == "1"
    assert tx_to_hex(t) == TEST1_RLP  # re-encode roundtrip
    assert t.valid


def test_golden_vector_2_wrapped_canonicalization():
    t = parse_tx(TEST2_RLP_INCORRECT)
    assert t.hash == TEST2_HASH
    assert tx_to_hex(t) == TEST2_RLP_CORRECT


def test_golden_vector_wrapped_legacy():
    t = parse_tx(WRAPPED_LEGACY_IN)
    assert t.hash == WRAPPED_LEGACY_HASH
    assert tx_to_hex(t) == "0x" + WRAPPED_LEGACY_IN[6:]


@pytest.mark.parametrize("tx_type", [0, 1, 2, 3])
def test_generated_all_types(tx_type):
    raw = make_tx(tx_type=tx_type, nonce=7)
    t = parse_tx(raw)
    assert t.valid, t.reason
    assert t.tx_type == tx_type
    assert t.sender == priv_to_address(0xA11CE)
    assert t.nonce == "7"
    # parse of the canonical re-encode is a fixpoint
    t2 = parse_tx(tx_to_hex(t))
    assert t2.hash == t.hash


def test_selector_and_datasize():
    raw = make_tx(data=bytes.fromhex("a9059cbb" + "00" * 64))
    t = parse_tx(raw)
    assert t.data_4bytes == "0xa9059cbb"
    assert t.data_size == 4 + 64
    short = parse_tx(make_tx(data=b"\x01\x02"))
    assert short.data_4bytes == ""
    assert short.data_size == 2


def test_validation_cascade():
    assert parse_tx(make_tx(tx_type=2, tip=5, fee=1)).reason == REASON_FEECAP_LT_TIPCAP
    assert (
        parse_tx(make_tx(tx_type=3, blob_sidecar=False)).reason
        == REASON_BLOB_NO_SIDECAR
    )
    # force an invalid signature: replace s with the curve order N (out of
    # range per SEC 1 §4.1.6) and re-encode
    from mempool_dumpster_spark.functions.secp256k1 import N

    raw = bytes.fromhex(make_tx(tx_type=2)[2:])
    fields = rlp.decode(raw[1:])
    fields[-1] = rlp.from_int(N)
    t = parse_tx(bytes([2]) + rlp.encode(fields))
    assert not t.valid
    assert t.reason == REASON_SIGNATURE_ERROR


def test_decode_errors_raise():
    with pytest.raises(TxDecodeError):
        parse_tx("0x")
    with pytest.raises(TxDecodeError):
        parse_tx("0xdeadbeef")
    with pytest.raises(TxDecodeError):
        parse_tx("0x05ffff")  # unknown type byte


def test_list_in_scalar_slot_raises_decode_error_not_attributeerror():
    """A decodable garbage payload with a LIST in the `to` or `data` slot
    must raise TxDecodeError (→ reject lane), never AttributeError —
    which would escape the UDF's (TxDecodeError, ValueError) guard and
    kill the whole ingest job on one untrusted mempool row. The 20-item
    list in the `to` slot even passes the len()==20 check before .hex()
    blew up in the old code."""
    from mempool_dumpster_spark.functions import rlp_codec as rlp

    to_is_list = rlp.encode(
        [b"", b"\x01", b"\x01", [b"\x01"] * 20, b"", b"", b"\x1b", b"\x01", b"\x01"]
    )
    with pytest.raises(TxDecodeError):
        parse_tx(to_is_list)
    data_is_list = rlp.encode(
        [b"", b"\x01", b"\x01", b"", b"", [b"\x01"], b"\x1b", b"\x01", b"\x01"]
    )
    with pytest.raises(TxDecodeError):
        parse_tx(data_is_list)


def test_high_s_rejected_eip2():
    """Geth ValidateSignatureValues(homestead=true) rejects s > N/2: a
    malleated high-s signature must come back signature-error with the zero
    address, not a recovered sender."""
    from mempool_dumpster_spark.functions.ethtx import ZERO_ADDRESS
    from mempool_dumpster_spark.functions.secp256k1 import N

    raw = bytes.fromhex(make_tx(tx_type=2)[2:])
    fields = rlp.decode(raw[1:])
    s = rlp.to_int(fields[-1])
    y = rlp.to_int(fields[-2])
    fields[-1] = rlp.from_int(N - s)  # malleate: (r, N-s) verifies w/ flipped parity
    fields[-2] = rlp.from_int(y ^ 1)
    t = parse_tx(bytes([2]) + rlp.encode(fields))
    assert not t.valid
    assert t.reason == REASON_SIGNATURE_ERROR
    assert t.sender == ZERO_ADDRESS


def test_chainid_not_set_priority_and_zero_from():
    """chainId<=0 outranks signature validity (reference validateTx order);
    failed recovery emits the zero address like TxSummaryEntry.From."""
    from mempool_dumpster_spark.functions.ethtx import (
        REASON_CHAINID_NOT_SET,
        ZERO_ADDRESS,
    )

    t = parse_tx(make_tx(tx_type=2, chain_id=0))
    assert not t.valid
    assert t.reason == REASON_CHAINID_NOT_SET

    # valid chainId + corrupt signature → signature-error + zero address
    raw = bytes.fromhex(make_tx(tx_type=2)[2:])
    fields = rlp.decode(raw[1:])
    fields[-2] = rlp.from_int(rlp.to_int(fields[-2]) ^ 1)  # flip yParity
    t2 = parse_tx(bytes([2]) + rlp.encode(fields))
    assert t2.reason == REASON_SIGNATURE_ERROR or t2.sender != ZERO_ADDRESS


def test_reference_reason_strings():
    """Trash reasons are byte-identical to writeInvalidTx
    (reference collector/tx_processor.go:327-353)."""
    from mempool_dumpster_spark.functions import ethtx

    assert ethtx.REASON_GASFEE_TOO_BIG == "extremely large gasFeeCap"
    assert ethtx.REASON_GASTIP_TOO_BIG == "extremely large gasTipCap"
    assert ethtx.REASON_BLOB_NO_SIDECAR == "invalid blob transaction"
    assert ethtx.REASON_CHAINID_NOT_SET == "chainId not set"
    assert ethtx.REASON_SIGNATURE_ERROR == "signature-error"


def test_rlp_non_canonical_long_form_rejected():
    """A 0xB8/0xF8 prefix encoding a length < 56 is 'non-canonical size' in
    geth's strict decoder and must be rejected."""
    with pytest.raises(rlp.RLPError):
        rlp.decode(bytes([0xB8, 3]) + b"abc")  # short string in long form
    with pytest.raises(rlp.RLPError):
        rlp.decode(bytes([0xF8, 3, 0x01, 0x02, 0x03]))  # short list in long form
    # genuine long forms still decode
    assert rlp.decode(bytes([0xB8, 56]) + b"a" * 56) == b"a" * 56
