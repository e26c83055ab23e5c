"""Base62 uid generation and version-suffix increment.

Same id scheme as the reference (``base/uids.py``; versioned uid =
16-char stem + 4-char version, ``_is_versioned.py:21``): ids are
generated driver-side at ingest — never inside queries — so the engine
stays UDF-free (SURVEY §2.15).
"""

from __future__ import annotations

import secrets
import string

# digit-value order is 0-9, a-z, A-Z (string.ascii_letters puts
# lowercase first) — NOT the 0-9A-Za-z convention some systems use.
# The engine is self-consistent (next_version_uid maxes by
# decode_base62, never by string sort); external consumers comparing
# version suffixes must decode with THIS alphabet, not sort
# lexicographically (ASCII sort puts 'A' < 'a', the opposite order).
BASE62 = string.digits + string.ascii_letters
_ALPHABET = string.ascii_lowercase + string.ascii_uppercase + string.digits


def base62(n_char: int) -> str:
    """Random base62 string of length ``n_char``."""
    return "".join(secrets.choice(_ALPHABET) for _ in range(n_char))


def encode_base62(num: int, pad: int = 0) -> str:
    if num == 0:
        s = "0"
    else:
        digits = []
        while num:
            num, rem = divmod(num, 62)
            digits.append(BASE62[rem])
        s = "".join(reversed(digits))
    return s.rjust(pad, "0")


def decode_base62(s: str) -> int:
    num = 0
    for ch in s:
        num = num * 62 + BASE62.index(ch)
    return num


def increment_suffix(suffix: str) -> str:
    """Base62-increment a fixed-width version suffix ("0000" → "0001",
    "0009" → "000a", "000z" → "000A", "000Z" → "0010" — per the
    module's digits-lowercase-uppercase alphabet above); mirrors the
    reference's version bump."""
    return encode_base62(decode_base62(suffix) + 1, pad=len(suffix))


def generate_uid(n_char: int = 20, stem: str | None = None, version: str = "0000") -> str:
    """Versioned uid: 16-char random stem + 4-char version suffix for
    20-char registries; plain random otherwise."""
    if n_char == 20:
        return (stem or base62(16)) + version
    return base62(n_char)
