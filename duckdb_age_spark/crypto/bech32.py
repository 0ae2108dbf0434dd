"""Bech32 codec (BIP-173) for age key strings.

age public keys are bech32 with HRP ``age`` (lowercase); identities use HRP
``AGE-SECRET-KEY-`` and are conventionally uppercase.  The reference encodes
these in Rust via the ``age`` crate (reference: rust/src/lib.rs:28-37); we
implement the public BIP-173 spec directly — no bech32m variant is needed
(age uses classic bech32).
"""

from __future__ import annotations

CHARSET = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
_CHARSET_REV = {c: i for i, c in enumerate(CHARSET)}

_GEN = (0x3B6A57B2, 0x26508E6D, 0x1EA119FA, 0x3D4233DD, 0x2A1462B3)


def _polymod(values: list[int]) -> int:
    chk = 1
    for v in values:
        b = chk >> 25
        chk = (chk & 0x1FFFFFF) << 5 ^ v
        for i in range(5):
            chk ^= _GEN[i] if ((b >> i) & 1) else 0
    return chk


def _hrp_expand(hrp: str) -> list[int]:
    return [ord(x) >> 5 for x in hrp] + [0] + [ord(x) & 31 for x in hrp]


def _create_checksum(hrp: str, data: list[int]) -> list[int]:
    values = _hrp_expand(hrp) + data
    polymod = _polymod(values + [0, 0, 0, 0, 0, 0]) ^ 1
    return [(polymod >> 5 * (5 - i)) & 31 for i in range(6)]


def _verify_checksum(hrp: str, data: list[int]) -> bool:
    return _polymod(_hrp_expand(hrp) + data) == 1


def convertbits(data: bytes | list[int], frombits: int, tobits: int, pad: bool = True) -> list[int]:
    """General power-of-2 base conversion (BIP-173 reference algorithm)."""
    acc = 0
    bits = 0
    ret: list[int] = []
    maxv = (1 << tobits) - 1
    max_acc = (1 << (frombits + tobits - 1)) - 1
    for value in data:
        if value < 0 or (value >> frombits):
            raise ValueError("invalid value for base conversion")
        acc = ((acc << frombits) | value) & max_acc
        bits += frombits
        while bits >= tobits:
            bits -= tobits
            ret.append((acc >> bits) & maxv)
    if pad:
        if bits:
            ret.append((acc << (tobits - bits)) & maxv)
    elif bits >= frombits or ((acc << (tobits - bits)) & maxv):
        raise ValueError("invalid padding in base conversion")
    return ret


def encode(hrp: str, data: bytes) -> str:
    """Encode ``data`` bytes with human-readable prefix ``hrp``."""
    values = convertbits(data, 8, 5)
    combined = values + _create_checksum(hrp.lower(), values)
    return hrp + "1" + "".join(CHARSET[d] for d in combined)


def decode(expected_hrp: str, s: str) -> bytes:
    """Decode a bech32 string, verifying HRP and checksum.

    Raises ValueError on any malformation (mixed case, bad charset, bad
    checksum, wrong HRP).
    """
    if any(ord(x) < 33 or ord(x) > 126 for x in s):
        raise ValueError("invalid bech32 character")
    lowered = s.lower()
    if s != lowered and s != s.upper():
        raise ValueError("mixed-case bech32 string")
    s = lowered
    pos = s.rfind("1")
    if pos < 1 or pos + 7 > len(s) or len(s) > 1023:
        raise ValueError("invalid bech32 separator position")
    hrp, data_part = s[:pos], s[pos + 1 :]
    if hrp != expected_hrp.lower():
        raise ValueError(f"unexpected bech32 prefix: {hrp}")
    try:
        data = [_CHARSET_REV[c] for c in data_part]
    except KeyError as e:
        raise ValueError(f"invalid bech32 data character: {e}") from None
    if not _verify_checksum(hrp, data):
        raise ValueError("invalid bech32 checksum")
    return bytes(convertbits(data[:-6], 5, 8, pad=False))
