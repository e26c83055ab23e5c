from .context import Context, track, finish, view_lineage  # noqa: F401
