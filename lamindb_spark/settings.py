"""Instance settings — the engine's surface for the reference's
``ln.settings`` object (``core/_settings.py:53`` ``Settings``,
``core/subsettings/_creation_settings.py``,
``core/subsettings/_annotation_settings.py``).

Only the knobs with REAL engine semantics are carried; the reference's
hub/cloud settings (``_using_key``, storage registration against the
hub, cache dir) have no analogue in a Spark-catalog engine and stay
out. What IS here changes behavior:

- ``creation.search_names`` — ``from_values`` get-or-create skips the
  existing-name lookup when off (the reference's "speed up creating
  records" escape hatch; duplicates become the caller's problem, as
  documented there);
- ``creation.artifact_skip_size_hash`` — ``register_artifact`` skips
  content hashing and therefore hash-dedup (the reference bypasses
  size+hash queries against object stores; hashing IS the slow step
  for a terabyte payload);
- ``creation.artifact_silence_missing_run_warning`` — silences the
  no-active-run warning at artifact creation;
- ``annotation.n_max_records`` — automated annotation (slot curators)
  caps the per-feature distinct-value count; beyond it the column is
  skipped with a warning instead of flooding the annotation table;
- ``verbosity`` — the engine logger's level, with the reference's
  string names.

``Settings`` is per-:class:`~lamindb_spark.catalog.lakehouse.Lakehouse`
(``lh.settings``), not a module global: two lakehouses in one process
must not share behavior toggles. The ONE exception is ``verbosity``:
it sets the level of the process-wide ``lamindb_spark`` Python logger
(Python logging is process-scoped; every module logs to that name), so
the last setter wins across lakehouses — exactly like the reference,
whose verbosity drives the process-global loguru logger. ``lh.track_run_inputs`` (r12) remains the
run-input knob and is mirrored here as a property for reference-shaped
access (``settings.track_run_inputs``).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

logger = logging.getLogger("lamindb_spark")

_VERBOSITY_TO_LEVEL = {
    "error": logging.ERROR,
    "warning": logging.WARNING,
    "success": logging.INFO,
    "info": logging.INFO,
    "hint": logging.DEBUG,
    "debug": logging.DEBUG,
}


@dataclass
class CreationSettings:
    """Reference ``CreationSettings`` (subsettings/_creation_settings.py)."""

    search_names: bool = True
    artifact_skip_size_hash: bool = False
    artifact_silence_missing_run_warning: bool = False


@dataclass
class AnnotationSettings:
    """Reference ``AnnotationSettings`` (subsettings/_annotation_settings.py)."""

    n_max_records: int = 1000


@dataclass
class Settings:
    creation: CreationSettings = field(default_factory=CreationSettings)
    annotation: AnnotationSettings = field(default_factory=AnnotationSettings)
    _lakehouse: object = None
    _verbosity: str = "warning"

    @property
    def verbosity(self) -> str:
        """Logger verbosity (reference ``Settings.verbosity``,
        ``_settings.py:289``): one of error/warning/success/info/hint/
        debug, mapped onto the engine logger's level. PROCESS-GLOBAL:
        the setter levels the shared ``lamindb_spark`` Python logger,
        so the last write wins across lakehouses in one process (the
        reference's verbosity drives the global loguru logger the same
        way)."""
        return self._verbosity

    @verbosity.setter
    def verbosity(self, value: str) -> None:
        if value not in _VERBOSITY_TO_LEVEL:
            raise ValueError(
                f"verbosity must be one of {sorted(_VERBOSITY_TO_LEVEL)}, "
                f"not {value!r}"
            )
        self._verbosity = value
        logger.setLevel(_VERBOSITY_TO_LEVEL[value])

    @property
    def track_run_inputs(self) -> bool:
        """Mirror of ``Lakehouse.track_run_inputs`` (reference
        ``settings.track_run_inputs``, ``_settings.py:116``)."""
        return self._lakehouse.track_run_inputs

    @track_run_inputs.setter
    def track_run_inputs(self, value: bool) -> None:
        self._lakehouse.track_run_inputs = bool(value)
