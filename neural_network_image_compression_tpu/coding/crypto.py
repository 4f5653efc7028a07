"""Optional bitstream encryption.

The reference README advertises "autoencoder based lossy image compression +
encryption" (reference README.md:2) but contains no encryption code anywhere
(SURVEY.md section 2a defect list) — the closest it gets is the visually
scrambled packed-latent PNG. This module supplies the claimed capability for
real: the container's stream payload is encrypted with a SHA-256-based CTR
keystream (key derived from a passphrase via PBKDF2-HMAC-SHA256, per-stream
random nonce), with an HMAC-SHA256 tag for integrity.

Uses only the standard library (hashlib/hmac/os). This is a textbook
stream-cipher construction, suitable for keeping latents confidential at
rest; it has not been through formal review — use a vetted library where
that matters.
"""
from __future__ import annotations

import hashlib
import hmac
import os
import struct

_MAGIC = b"NICE"  # encrypted-payload marker
_PBKDF2_ITERS = 100_000
_NONCE_LEN = 16
_TAG_LEN = 32


def derive_key(password: str, salt: bytes) -> bytes:
    return hashlib.pbkdf2_hmac("sha256", password.encode(), salt, _PBKDF2_ITERS)


def _keystream(key: bytes, nonce: bytes, n: int) -> bytes:
    out = bytearray()
    counter = 0
    while len(out) < n:
        out += hashlib.sha256(key + nonce + struct.pack("<Q", counter)).digest()
        counter += 1
    return bytes(out[:n])


def encrypt(payload: bytes, password: str) -> bytes:
    """payload -> MAGIC | salt | nonce | ciphertext | hmac_tag."""
    salt = os.urandom(16)
    nonce = os.urandom(_NONCE_LEN)
    key = derive_key(password, salt)
    cipher = bytes(a ^ b for a, b in zip(payload, _keystream(key, nonce, len(payload))))
    tag = hmac.new(key, nonce + cipher, hashlib.sha256).digest()
    return _MAGIC + salt + nonce + cipher + tag


def decrypt(blob: bytes, password: str) -> bytes:
    """Inverse of :func:`encrypt`; raises ValueError on wrong password or
    tampering (HMAC mismatch)."""
    if blob[:4] != _MAGIC:
        raise ValueError("not an encrypted container")
    salt = blob[4:20]
    nonce = blob[20 : 20 + _NONCE_LEN]
    cipher = blob[20 + _NONCE_LEN : -_TAG_LEN]
    tag = blob[-_TAG_LEN:]
    key = derive_key(password, salt)
    expect = hmac.new(key, nonce + cipher, hashlib.sha256).digest()
    if not hmac.compare_digest(tag, expect):
        raise ValueError("authentication failed (wrong password or corrupted data)")
    return bytes(
        a ^ b for a, b in zip(cipher, _keystream(key, nonce, len(cipher)))
    )


def is_encrypted(blob: bytes) -> bool:
    return blob[:4] == _MAGIC
