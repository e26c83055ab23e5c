from .ids import base62, encode_base62, generate_uid, increment_suffix  # noqa: F401
