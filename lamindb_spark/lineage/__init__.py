from .context import (  # noqa: F401
    Context,
    track,
    finish,
    flow,
    step,
    tracked,
    view_lineage,
    transform_from_path,
    latest_run,
)
