"""Secret redaction for tracked source code and run params.

Reference behavior (``lamindb/_secret_redaction.py`` applied at
``core/_context.py:424`` for params and ``:454`` for source code):
hardcoded credential literals must never land in the transform/run
registries — they would replicate into every lakehouse copy, export,
and transfer. Only QUOTED literal values assigned to sensitive keys
are redacted; environment lookups (``os.getenv("X")``,
``os.environ["X"]``) are left intact because they are re-runnable
references, not embedded secrets, and unquoted right-hand sides
(type annotations, variable forwarding) never match.
"""

from __future__ import annotations

import re

REDACTED = "***REDACTED***"

# single sensitive words, matched as whole segments of a snake_cased key
_SENSITIVE_WORDS = frozenset({"secret", "token", "password", "passwd"})
# two-segment sensitive phrases (api_key, apikey handled via single too)
_SENSITIVE_PAIRS = frozenset(
    {("api", "key"), ("access", "key"), ("private", "key"), ("client", "secret")}
)
_SINGLE_JOINED = frozenset({"apikey"})  # 'apikey' without a separator


def _segments(key: str) -> list[str]:
    """snake_case the key (camelCase/PascalCase aware) and split on
    the separator characters keys use (``_ - .``)."""
    s = re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", key)
    s = re.sub(r"(?<=[A-Z])(?=[A-Z][a-z])", "_", s)
    return [p for p in re.split(r"[_\-.]+", s.lower()) if p]


def is_sensitive_key(key: str) -> bool:
    parts = _segments(key)
    if any(p in _SENSITIVE_WORDS or p in _SINGLE_JOINED for p in parts):
        return True
    return any(pair in _SENSITIVE_PAIRS for pair in zip(parts, parts[1:]))


# a URL carrying inline credentials is a secret whatever its key is
_CREDENTIALED_URL = re.compile(
    r"^\s*postgres(ql)?://[^\s/@:]+:[^\s/@]+@\S+$", re.IGNORECASE
)


def is_secret_value(value: object) -> bool:
    return isinstance(value, str) and bool(_CREDENTIALED_URL.match(value))


# Assignment shapes whose RHS is a QUOTED literal. Each pattern binds
# `lead` (everything before the literal), `key`, and the quoted
# literal via `q`/`val`. Triple quotes come first in the alternation
# so '"""secret"""' redacts whole instead of matching the empty string
# between its first two quotes (review finding).
_QUOTED = r"(?P<q>'''|\"\"\"|['\"`])(?P<val>(?s:.*?))(?P=q)"
_SHAPES = [
    # os.environ["API_KEY"] = "value"
    re.compile(
        r"(?P<lead>os\.environ\[\s*(?P<kq>['\"])(?P<key>[^'\"]+)(?P=kq)\s*\]\s*=\s*)"
        + _QUOTED
    ),
    # annotated assignment: password: str = "value" (the generic shape
    # below can't reach past the annotation; review finding)
    re.compile(
        r"(?P<lead>(?P<key>[A-Za-z_][\w.\-]*)\s*:\s*[A-Za-z_][\w.\[\], ]*?\s*=\s*)"
        + _QUOTED
    ),
    # api_key = "value" | api_key: "value" | api_key := "value"
    re.compile(
        r"(?P<lead>(?P<key>[A-Za-z_][\w.\-]*)\s*(:=|=|:)\s*)" + _QUOTED
    ),
    # {"client_secret": "value"}
    re.compile(
        r"(?P<lead>(?P<kq>['\"])(?P<key>[^'\"]+)(?P=kq)\s*:\s*)" + _QUOTED
    ),
]


def redact_source(source_code: str) -> tuple[str, int]:
    """(redacted source, n redactions): every quoted literal assigned
    to a sensitive key — or that is itself a credentialed URL — is
    replaced with ``***REDACTED***`` (quotes kept)."""
    count = 0

    def sub(m: re.Match) -> str:
        nonlocal count
        if not (is_sensitive_key(m.group("key")) or is_secret_value(m.group("val"))):
            return m.group(0)
        count += 1
        q = m.group("q")
        return f"{m.group('lead')}{q}{REDACTED}{q}"

    out = source_code
    for pat in _SHAPES:
        out = pat.sub(sub, out)
    return out, count


def redact_params(params: dict) -> dict:
    """Run-params twin (reference ``core/_context.py:424``): sensitive
    keys and credentialed-URL values are replaced wholesale — and the
    walk RECURSES through nested dicts/lists, because callers naturally
    pass structured config as params (review finding)."""

    def walk(v):
        if isinstance(v, dict):
            return {
                k: REDACTED if is_sensitive_key(str(k)) else walk(x)
                for k, x in v.items()
            }
        if isinstance(v, (list, tuple)):
            return [walk(x) for x in v]
        return REDACTED if is_secret_value(v) else v

    return walk(params)
