"""Exceptions — the engine's error surface in one importable module
(reference ``lamindb/errors.py``: users catch ``ln.errors.X``).

The concrete classes live next to the code that raises them; this
module aggregates them so user code has a single stable import path,
exactly like the reference. Engine-specific errors the reference does
not have (commit-log conflicts, schema pins) are exported alongside —
they are part of this engine's contract.
"""

from .catalog.commitlog import CommitConflictError, SchemaMismatchError  # noqa: F401
from .catalog.schemas import FieldValidationError  # noqa: F401
from .catalog.query import DoesNotExist, MultipleResultsFound  # noqa: F401
from .curation.curator import CurationError  # noqa: F401
from .curation.dtype import DtypeError  # noqa: F401

# reference errors.py:53 — raised when curation/validation fails
ValidationError = CurationError

__all__ = [
    "CommitConflictError",
    "FieldValidationError",
    "CurationError",
    "DoesNotExist",
    "DtypeError",
    "MultipleResultsFound",
    "SchemaMismatchError",
    "ValidationError",
]
