"""age X25519 key generation, parsing, and validation.

Parity target: the reference's keygen surface (reference:
src/age_extension.cpp:165-217, rust/src/lib.rs:28-37,307-359).

Two deliberate, documented divergences from the reference (SURVEY.md §2a):

* ``keygen`` generates a fresh pair **per row** (the reference computes one
  pair per 2048-row chunk via a constant vector — an acknowledged quirk that
  contradicts its own docs, reference: src/age_extension.cpp:167-183 vs
  FUNCTIONS.md:65-70).
* ``keygen_from_seed`` is **actually deterministic**: SHA-256(seed) → X25519
  scalar.  The reference body seeds an RNG and then discards it, generating a
  random key with an explicit TODO (reference: rust/src/lib.rs:345-351,
  FUNCTIONS.md:504,510).  We implement the documented intent.
"""

from __future__ import annotations

import hashlib
import os
from typing import NamedTuple

from cryptography.hazmat.primitives import serialization
from cryptography.hazmat.primitives.asymmetric.x25519 import (
    X25519PrivateKey,
    X25519PublicKey,
)

from . import bech32

PUBLIC_HRP = "age"
SECRET_HRP = "age-secret-key-"

PUBLIC_PREFIX = "age1"
SECRET_PREFIX = "AGE-SECRET-KEY-1"


class KeyPair(NamedTuple):
    public_key: str
    private_key: str


def _raw_private_bytes(key: X25519PrivateKey) -> bytes:
    return key.private_bytes(
        serialization.Encoding.Raw,
        serialization.PrivateFormat.Raw,
        serialization.NoEncryption(),
    )


def _raw_public_bytes(key: X25519PublicKey) -> bytes:
    return key.public_bytes(serialization.Encoding.Raw, serialization.PublicFormat.Raw)


def encode_public_key(raw: bytes) -> str:
    return bech32.encode(PUBLIC_HRP, raw)


def encode_private_key(raw: bytes) -> str:
    return bech32.encode(SECRET_HRP, raw).upper()


def pair_from_private_raw(raw: bytes) -> KeyPair:
    sk = X25519PrivateKey.from_private_bytes(raw)
    return KeyPair(
        public_key=encode_public_key(_raw_public_bytes(sk.public_key())),
        private_key=encode_private_key(raw),
    )


def keygen() -> KeyPair:
    """Fresh random X25519 key pair (per call — see module docstring)."""
    return pair_from_private_raw(os.urandom(32))


def keygen_from_seed(seed: bytes) -> KeyPair:
    """Deterministic key pair: SHA-256(seed) → X25519 private scalar."""
    return pair_from_private_raw(hashlib.sha256(seed).digest())


def parse_recipient(key: str) -> bytes:
    """``age1...`` string → 32 raw public-key bytes.  ValueError if invalid."""
    raw = bech32.decode(PUBLIC_HRP, key)
    if len(raw) != 32:
        raise ValueError("invalid X25519 public key length")
    return raw


def parse_identity(key: str) -> bytes:
    """``AGE-SECRET-KEY-1...`` string → 32 raw private-key bytes."""
    raw = bech32.decode(SECRET_HRP, key)
    if len(raw) != 32:
        raise ValueError("invalid X25519 private key length")
    return raw


def is_recipient_format(key: str) -> bool:
    """The reference's dispatch test: public key iff it starts ``age1``
    (reference: src/age_extension.cpp:228-229)."""
    return key.startswith(PUBLIC_PREFIX)


def is_identity_format(key: str) -> bool:
    """Identity iff it starts ``AGE-SECRET-KEY-1`` (reference:
    src/age_extension.cpp:292-293)."""
    return key.startswith(SECRET_PREFIX)
