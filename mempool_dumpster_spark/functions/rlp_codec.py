"""Minimal RLP encode/decode (Ethereum's Recursive Length Prefix encoding),
implemented from the public spec (https://ethereum.org/en/developers/docs/
data-structures-and-encoding/rlp/). Items are ``bytes`` or nested lists.
"""

from __future__ import annotations

RLPItem = bytes | list


class RLPError(ValueError):
    pass


def encode(item: RLPItem) -> bytes:
    if isinstance(item, bytes):
        if len(item) == 1 and item[0] < 0x80:
            return item
        return _encode_length(len(item), 0x80) + item
    if isinstance(item, list):
        payload = b"".join(encode(i) for i in item)
        return _encode_length(len(payload), 0xC0) + payload
    raise RLPError(f"cannot RLP-encode {type(item)}")


def _encode_length(n: int, offset: int) -> bytes:
    if n < 56:
        return bytes([offset + n])
    n_bytes = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([offset + 55 + len(n_bytes)]) + n_bytes


def decode(data: bytes) -> RLPItem:
    item, consumed = _decode_at(data, 0)
    if consumed != len(data):
        raise RLPError(f"trailing bytes: consumed {consumed} of {len(data)}")
    return item


def _decode_at(data: bytes, pos: int) -> tuple[RLPItem, int]:
    if pos >= len(data):
        raise RLPError("out of bounds")
    prefix = data[pos]
    if prefix < 0x80:  # single byte
        return bytes([prefix]), pos + 1
    if prefix < 0xB8:  # short string
        length = prefix - 0x80
        end = pos + 1 + length
        _check(data, end)
        if length == 1 and data[pos + 1] < 0x80:
            raise RLPError("non-canonical single byte")
        return data[pos + 1 : end], end
    if prefix < 0xC0:  # long string
        len_len = prefix - 0xB7
        length = _read_length(data, pos + 1, len_len)
        if length < 56:
            # geth rejects a long-form prefix encoding a short length as
            # "non-canonical size" — such payloads must use the short form
            raise RLPError("non-canonical size (long form for length < 56)")
        end = pos + 1 + len_len + length
        _check(data, end)
        return data[pos + 1 + len_len : end], end
    if prefix < 0xF8:  # short list
        length = prefix - 0xC0
        return _decode_list(data, pos + 1, length)
    # long list
    len_len = prefix - 0xF7
    length = _read_length(data, pos + 1, len_len)
    if length < 56:
        raise RLPError("non-canonical size (long form for length < 56)")
    return _decode_list(data, pos + 1 + len_len, length)


def _decode_list(data: bytes, start: int, length: int) -> tuple[list, int]:
    end = start + length
    _check(data, end)
    items = []
    pos = start
    while pos < end:
        item, pos = _decode_at(data, pos)
        if pos > end:
            raise RLPError("list item overruns list payload")
        items.append(item)
    return items, end


def _read_length(data: bytes, pos: int, len_len: int) -> int:
    _check(data, pos + len_len)
    if len_len == 0 or (len_len > 0 and data[pos] == 0):
        raise RLPError("non-canonical length")
    return int.from_bytes(data[pos : pos + len_len], "big")


def _check(data: bytes, end: int) -> None:
    if end > len(data):
        raise RLPError("truncated RLP")


# -- integer helpers (Ethereum's canonical big-endian, no leading zeros) ----

def to_int(b: bytes) -> int:
    if len(b) > 1 and b[0] == 0:
        raise RLPError("non-canonical integer (leading zero)")
    return int.from_bytes(b, "big")


def from_int(n: int) -> bytes:
    if n == 0:
        return b""
    return n.to_bytes((n.bit_length() + 7) // 8, "big")
