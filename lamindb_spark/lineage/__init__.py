from .context import Context, track, finish  # noqa: F401
