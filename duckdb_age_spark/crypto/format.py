"""age-encryption.org/v1 file format: encrypt/decrypt, X25519 recipients.

From-scratch implementation of the public age v1 spec
(https://age-encryption.org/v1, C2SP/age) on ``cryptography`` primitives —
X25519 + HKDF-SHA256 + HMAC-SHA256 + ChaCha20-Poly1305.  Behavior parity
target is the reference's Rust path (reference: rust/src/lib.rs:40-304 via
the ``age`` crate), including multi-recipient files where any one identity
decrypts (reference: test/sql/age.test:98-111).

Format summary (spec section numbers omitted; all public):

* header:  ``age-encryption.org/v1\n`` then one ``-> X25519 <share>\n<body>\n``
  stanza per recipient, then ``--- <MAC>\n``.
* per-stanza: ephemeral X25519 share; body = ChaCha20-Poly1305(zero nonce,
  key=HKDF(shared, salt=share||recipient, info="age-encryption.org/v1/X25519"))
  wrapping the 16-byte file key.
* header MAC = HMAC-SHA256(key=HKDF(file key, salt="", info="header")) over the
  header through ``---``.
* payload: 16-byte nonce, then 64 KiB plaintext chunks sealed with
  ChaCha20-Poly1305(key=HKDF(file key, salt=nonce, info="payload"),
  nonce=11-byte BE counter || is-final byte).
"""

from __future__ import annotations

import base64
import hmac as hmac_mod
import os
from functools import lru_cache
from hashlib import sha256

from cryptography.hazmat.primitives.asymmetric.x25519 import (
    X25519PrivateKey,
    X25519PublicKey,
)
from cryptography.hazmat.primitives.ciphers.aead import ChaCha20Poly1305

VERSION_LINE = b"age-encryption.org/v1"
X25519_LABEL = b"age-encryption.org/v1/X25519"
CHUNK_SIZE = 64 * 1024
TAG_SIZE = 16
FILE_KEY_SIZE = 16
NONCE_SIZE = 16


class DecryptError(ValueError):
    """Raised for any failure while reading an age file (maps to the
    reference's ``Decryption failed: <cause>`` message, rust/src/lib.rs:188)."""


def _b64(data: bytes) -> bytes:
    """Canonical unpadded standard base64 (spec requires no padding)."""
    return base64.b64encode(data).rstrip(b"=")


def _b64_decode(data: bytes) -> bytes:
    if data.endswith(b"="):
        raise DecryptError("base64 padding not allowed in age header")
    pad = -len(data) % 4
    try:
        out = base64.b64decode(data + b"=" * pad, validate=True)
    except Exception:
        raise DecryptError("invalid base64 in age header") from None
    # reject non-canonical encodings (trailing bits)
    if _b64(out) != data:
        raise DecryptError("non-canonical base64 in age header")
    return out


def _hkdf(ikm: bytes, salt: bytes, info: bytes) -> bytes:
    """HKDF-SHA256, 32-byte output (RFC 5869, inlined as two one-shot HMACs).

    Every derivation in the age v1 format is exactly one SHA-256 block of
    output, so expand is a single ``T(1) = HMAC(PRK, info || 0x01)``.  The
    one-shot :func:`hmac.digest` C fast path replaces the per-call ``HKDF``
    object construction that dominated the per-row profile (~11 µs → ~2 µs
    per derivation; 6 derivations per encrypt/decrypt round trip).  An empty
    salt is equivalent to RFC 5869's default HashLen zero bytes because HMAC
    zero-pads short keys to the block size.
    """
    prk = hmac_mod.digest(salt, ikm, sha256)
    return hmac_mod.digest(prk, info + b"\x01", sha256)


@lru_cache(maxsize=256)
def _recipient_pub(recipient_raw: bytes) -> X25519PublicKey:
    """Memoized raw→object recipient key (hot path encrypts many rows to the
    same recipient; object construction is ~7 µs/row otherwise)."""
    return X25519PublicKey.from_public_bytes(recipient_raw)


@lru_cache(maxsize=64)
def _identity_sk(identity_raw: bytes) -> tuple[X25519PrivateKey, bytes]:
    """Memoized identity private-key object + its public share (the
    ``from_private_bytes`` + ``public_key()`` pair is ~50 µs/row).

    Security trade-off, deliberate: the cache retains up to 64 private-key
    objects (and their raw bytes as keys) for the process lifetime, unlike
    the reference, which constructs and drops the key per operation
    (rust/src/lib.rs).  In this engine the executor process already holds
    the full secrets snapshot in the UDF closure, so cache residency adds no
    new exposure class; call ``_identity_sk.cache_clear()`` to drop the
    objects early if reusing this module outside that model."""
    sk = X25519PrivateKey.from_private_bytes(identity_raw)
    return sk, sk.public_key().public_bytes_raw()


def _wrap_body(b64_body: bytes) -> bytes:
    """Wrap stanza body at 64 columns; final line strictly shorter than 64."""
    lines = [b64_body[i : i + 64] for i in range(0, len(b64_body), 64)]
    if not lines or len(lines[-1]) == 64:
        lines.append(b"")
    return b"\n".join(lines)


def _x25519_stanza(file_key: bytes, recipient_raw: bytes) -> bytes:
    # Fresh ephemeral per file is required by the spec (and matches the age
    # crate) — only the recipient-key object construction is hoisted.
    eph_secret = X25519PrivateKey.generate()
    eph_share = eph_secret.public_key().public_bytes_raw()
    try:
        shared = eph_secret.exchange(_recipient_pub(recipient_raw))
    except ValueError:
        # the cryptography lib raises its own ValueError for an all-zero
        # (low-order) result before our explicit check can run
        raise ValueError("invalid recipient: low-order point") from None
    if shared == bytes(32):
        raise ValueError("invalid recipient: low-order point")
    wrap_key = _hkdf(shared, salt=eph_share + recipient_raw, info=X25519_LABEL)
    body = ChaCha20Poly1305(wrap_key).encrypt(bytes(12), file_key, None)
    return b"-> X25519 " + _b64(eph_share) + b"\n" + _wrap_body(_b64(body))


def encrypt(plaintext: bytes, recipients_raw: list[bytes]) -> bytes:
    """Encrypt ``plaintext`` to one or more raw X25519 public keys."""
    if not recipients_raw:
        raise ValueError("no recipients")
    file_key = os.urandom(FILE_KEY_SIZE)

    header = VERSION_LINE + b"\n"
    for raw in recipients_raw:
        header += _x25519_stanza(file_key, raw) + b"\n"
    header += b"---"
    mac_key = _hkdf(file_key, salt=b"", info=b"header")
    mac = hmac_mod.digest(mac_key, header, sha256)
    header += b" " + _b64(mac) + b"\n"

    nonce = os.urandom(NONCE_SIZE)
    payload_key = _hkdf(file_key, salt=nonce, info=b"payload")
    return header + nonce + _seal_payload(payload_key, plaintext)


def _chunk_nonce(counter: int, final: bool) -> bytes:
    return counter.to_bytes(11, "big") + (b"\x01" if final else b"\x00")


_FINAL_NONCE_0 = _chunk_nonce(0, True)


def _seal_payload(payload_key: bytes, plaintext: bytes) -> bytes:
    aead = ChaCha20Poly1305(payload_key)
    n_chunks = max(1, -(-len(plaintext) // CHUNK_SIZE))  # empty payload → 1 empty chunk
    if n_chunks == 1:  # dominant per-row case: no bytearray round trip
        return aead.encrypt(_FINAL_NONCE_0, plaintext, None)
    out = bytearray()
    for i in range(n_chunks):
        chunk = plaintext[i * CHUNK_SIZE : (i + 1) * CHUNK_SIZE]
        out += aead.encrypt(_chunk_nonce(i, i == n_chunks - 1), chunk, None)
    return bytes(out)


def ciphertext_length(plaintext_len: int, n_recipients: int) -> int:
    """Deterministic ciphertext size — used by oracle-checked contract queries
    (SURVEY.md §7.4).  Header: version(22) + per-recipient stanza
    (10+43+1 + 43+1 = 98) + MAC line (4+43+1 = 48); payload: 16-byte nonce +
    per-chunk 16-byte tag."""
    n_chunks = max(1, -(-plaintext_len // CHUNK_SIZE))
    header = 22 + 98 * n_recipients + 48
    return header + NONCE_SIZE + plaintext_len + TAG_SIZE * n_chunks


def _read_line(buf: bytes, pos: int) -> tuple[bytes, int]:
    nl = buf.find(b"\n", pos)
    if nl < 0:
        raise DecryptError("truncated age header")
    return buf[pos:nl], nl + 1


def decrypt(ciphertext: bytes, identity_raw: bytes) -> bytes:
    """Decrypt an age file with one raw X25519 private key."""
    line, pos = _read_line(ciphertext, 0)
    if line != VERSION_LINE:
        raise DecryptError("not an age file (bad version line)")

    sk, our_pub = _identity_sk(identity_raw)

    file_key: bytes | None = None
    while True:
        line, pos = _read_line(ciphertext, pos)
        if line.startswith(b"--- ") or line == b"---":
            mac_end = pos
            break
        if not line.startswith(b"-> "):
            raise DecryptError("malformed age header stanza")
        args = line[3:].split(b" ")
        # read body lines: wrapped at 64 cols, last line < 64
        body = b""
        while True:
            bline, pos = _read_line(ciphertext, pos)
            body += bline
            if len(bline) < 64:
                break
        if args[0] != b"X25519":
            continue  # unknown stanza type: skip but keep MACing over it
        if len(args) != 2 or file_key is not None:
            if len(args) != 2:
                raise DecryptError("malformed X25519 stanza")
            continue
        eph_share = _b64_decode(args[1])
        if len(eph_share) != 32:
            raise DecryptError("malformed X25519 ephemeral share")
        try:
            shared = sk.exchange(X25519PublicKey.from_public_bytes(eph_share))
        except ValueError:
            # cryptography raises a bare ValueError for low-order shares;
            # fold it into the DecryptError taxonomy so a crafted header
            # can never escape the "Decryption failed:" dispatch (found by
            # the adversarial header sweep in tests/test_crypto.py)
            raise DecryptError("low-order X25519 share") from None
        if shared == bytes(32):
            raise DecryptError("low-order X25519 share")
        wrap_key = _hkdf(shared, salt=eph_share + our_pub, info=X25519_LABEL)
        try:
            unwrapped = ChaCha20Poly1305(wrap_key).decrypt(bytes(12), _b64_decode(body), None)
        except Exception:
            continue  # not for this identity; keep scanning stanzas
        if len(unwrapped) != FILE_KEY_SIZE:
            raise DecryptError("invalid file key size")
        file_key = unwrapped

    if file_key is None:
        raise DecryptError("no matching key found")

    # verify header MAC over bytes up to and including "---"
    header_no_mac = ciphertext[: ciphertext.find(b"---", 0, mac_end) + 3]
    mac_b64 = line[4:] if line.startswith(b"--- ") else b""
    mac_key = _hkdf(file_key, salt=b"", info=b"header")
    expected = hmac_mod.digest(mac_key, header_no_mac, sha256)
    if not hmac_mod.compare_digest(_b64_decode(mac_b64), expected):
        raise DecryptError("header MAC mismatch")

    nonce = ciphertext[mac_end : mac_end + NONCE_SIZE]
    if len(nonce) != NONCE_SIZE:
        raise DecryptError("truncated payload nonce")
    payload_key = _hkdf(file_key, salt=nonce, info=b"payload")
    return _open_payload(payload_key, ciphertext[mac_end + NONCE_SIZE :])


def _open_payload(payload_key: bytes, sealed: bytes) -> bytes:
    aead = ChaCha20Poly1305(payload_key)
    sealed_chunk = CHUNK_SIZE + TAG_SIZE
    if len(sealed) < TAG_SIZE:
        raise DecryptError("truncated payload")
    if len(sealed) <= sealed_chunk:  # dominant per-row case
        try:
            return aead.decrypt(_FINAL_NONCE_0, sealed, None)
        except Exception:
            raise DecryptError("payload authentication failed") from None
    n_chunks = max(1, -(-len(sealed) // sealed_chunk))
    out = bytearray()
    for i in range(n_chunks):
        chunk = sealed[i * sealed_chunk : (i + 1) * sealed_chunk]
        final = i == n_chunks - 1
        if not final and len(chunk) != sealed_chunk:
            raise DecryptError("short non-final payload chunk")
        if final and len(chunk) == TAG_SIZE and i > 0:
            raise DecryptError("empty final chunk in non-empty payload")
        try:
            out += aead.decrypt(_chunk_nonce(i, final), chunk, None)
        except Exception:
            raise DecryptError("payload authentication failed") from None
    return bytes(out)
