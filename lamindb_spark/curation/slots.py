"""Slot-based curation of array payloads — the reference's
``SlotsCurator`` family (``curators/core.py:487-1434``): one
validation schema PER SLOT of a composite dataset (AnnData ``obs`` /
``var`` / ``uns``, MuData ``<modality>:obs``, SpatialData
``tables:<key>:obs``), each slot curated by the engine's
:class:`~.curator.DataFrameCurator`.

The Spark mapping is direct because the engine's array payloads are
ALREADY relational: an ``AnnDataLong`` slot IS a DataFrame, so a slot
curator is a dict of DataFrameCurators — no accessor layer. Reference
parity points:

- ``validate()`` runs every slot's schema/dtype/categorical pass
  (``core.py:525-549`` iterates ``self._slots``);
- ``standardize()`` maps synonyms / fills defaults per slot and
  REBUILDS the dataset with the standardized frames (the reference
  mutates the in-memory AnnData; the immutable-DataFrame equivalent
  is a new ``*Long`` carrying the new frames);
- ``save_artifact()`` persists the dataset and annotates the artifact
  with every slot's categorical values, merged LAST-WINS per column
  name across slots exactly like the reference's ``cat_vectors``
  merge (``core.py:596-599``).

Scale shape: every categorical check is a distinct + broadcast
anti-join against the registry domain (the slot frame is never
shuffled); :meth:`SlotsCurator.verdict_frame` exposes the invalid
values as one lazy unioned DataFrame so a 100-TB validation verdict
can be written to a table instead of collected.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger("lamindb_spark")

from .curator import CategoricalSpec, CurationError, DataFrameCurator
from .schema_check import SchemaSpec
from .validate import synonym_map


@dataclass
class SlotSpec:
    """One slot's validation constraints — the engine analogue of a
    per-slot reference ``Schema`` (``schema.slots[slot]``)."""

    spec: SchemaSpec
    categoricals: dict[str, CategoricalSpec] = field(default_factory=dict)
    defaults: dict[str, object] = field(default_factory=dict)


def _require_active_session(what: str):
    """Resolve the active SparkSession or fail with a message naming
    the caller — ``getActiveSession()`` returning None otherwise
    surfaces as an opaque AttributeError inside ``_dict_frame``."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"{what} needs an active SparkSession to build the dict "
            "slot's one-row DataFrame; start one (or pass spark=) first"
        )
    return spark


def _dict_frame(spark, d: dict, name: str) -> DataFrame:
    """A dict slot (AnnData ``uns``, SpatialData ``attrs``) as a
    single-row DataFrame — the reference's ``_handle_dict_slots``
    (``core.py:1085-1152``) does exactly this with pandas."""
    if not isinstance(d, dict):
        raise KeyError(f"slot {name!r}: expected a dict, got {type(d).__name__}")
    row = {k: v if isinstance(v, (str, int, float, bool)) else repr(v) for k, v in d.items()}
    return spark.createDataFrame([row])


def _resolve_dict_path(d: dict, parts: list[str], slot: str) -> dict:
    for p in parts:
        if not isinstance(d, dict) or p not in d:
            raise KeyError(f"slot {slot!r}: key {p!r} not found")
        d = d[p]
    if not isinstance(d, dict):
        raise KeyError(f"slot {slot!r}: path does not resolve to a dict")
    return d


# --------------------------------------------------- registry-backed schemas
#
# The reference's SlotsCurator takes a SAVED Schema entity whose
# ``slots`` map to per-slot component schemas (``Schema(slots={"obs":
# obs_schema, ...})``, models/schema.py:1392-1410, persisted through
# the SchemaComponent link table :1573-1581). The engine equivalents:
# flat schemas live in the ``schema`` + ``schema_features`` registries
# (already used by sheets), composites in ``schema_components``.


def save_feature_schema(
    lh,
    name: str,
    features: dict[str, str],
    optional: set[str] | None = None,
    itype: str = "Feature",
    minimal_set: bool = True,
    maximal_set: bool = False,
    ordered_set: bool = False,
) -> dict:
    """Persist a FLAT schema: get-or-create its features by name
    (``feature`` registry, dtype in the reference's dtype-string
    vocabulary — 'str'/'int'/'float'/'cat[...]'), one ``schema`` row
    with the column-set flags, one ``schema_features`` link per
    member. Returns the schema row."""
    from .validate import from_values

    feats = from_values(
        lh, "feature", list(features), field="name"
    ).select("id", "name").collect()
    fid = {r["name"]: r["id"] for r in feats}
    row = lh.save(
        "schema",
        [{
            "name": name,
            "itype": itype,
            "n_members": len(features),
            "minimal_set": minimal_set,
            "maximal_set": maximal_set,
            "ordered_set": ordered_set,
        }],
    )[0]
    # stamp dtypes on the member features (idempotent re-save by uid)
    feat_rows = {
        r["name"]: r.asDict()
        for r in lh.read_raw("feature").filter(F.col("name").isin(list(features))).collect()
    }
    lh.save(
        "feature",
        [
            {**feat_rows[n], "dtype_str": dt}
            for n, dt in features.items()
            if feat_rows[n].get("dtype_str") != dt
        ],
    )
    lh._append(
        "schema_features",
        [
            {
                "schema_id": row["id"],
                "feature_id": fid[n],
                "optional": n in (optional or set()),
            }
            for n in features
        ],
    )
    return row


def save_composite_schema(
    lh, name: str, slots: dict[str, int], otype: str = "AnnData"
) -> dict:
    """Persist a COMPOSITE schema: one ``schema`` row (itype =
    ``otype``, the reference's composite marker) plus one
    ``schema_components`` link per (slot, component schema id)."""
    from ..catalog.lakehouse import _now

    row = lh.save(
        "schema", [{"name": name, "itype": otype, "n_members": len(slots)}]
    )[0]
    lh._append(
        "schema_components",
        [
            {
                "composite_id": row["id"],
                "component_id": sid,
                "slot": slot,
                "created_at": _now(),
            }
            for slot, sid in slots.items()
        ],
    )
    return row


def slotspec_from_schema(lh, schema_id: int, categoricals=None) -> SlotSpec:
    """Rehydrate one flat schema row + its feature links into a
    :class:`SlotSpec` (dtype strings map through the same table the
    sheets renderer uses). ``categoricals`` attach registry domains —
    they are DataFrames, so they stay call-time arguments like the
    reference's field-attr lookups."""
    from ..catalog.sheets import schema_feature_specs

    srow = lh.read_raw("schema").filter(F.col("id") == schema_id).first()
    if srow is None:
        raise KeyError(f"no schema with id {schema_id}")
    specs = schema_feature_specs(lh, schema_id)
    bridge = (
        lh.read_raw("schema_features")
        .filter(F.col("schema_id") == schema_id)
        .select("feature_id", "optional")
    )
    feats = lh.read_raw("feature").select(
        F.col("id").alias("feature_id"), "name"
    )
    opt = {
        r["name"]
        for r in bridge.join(feats, "feature_id").filter(F.col("optional")).collect()
    }
    return SlotSpec(
        spec=SchemaSpec(
            features=dict(specs),
            minimal_set=bool(srow["minimal_set"]) if srow["minimal_set"] is not None else True,
            maximal_set=bool(srow["maximal_set"] or False),
            ordered_set=bool(srow["ordered_set"] or False),
            optional=opt,
        ),
        categoricals=categoricals or {},
    )


def curator_from_schema(lh, dataset, composite_schema_id: int, categoricals=None, **kwargs):
    """The reference entry point: ``SlotsCurator(dataset, schema)``
    with a SAVED composite schema — resolve its slot links, rehydrate
    each component into a SlotSpec, and dispatch on the composite's
    otype (AnnData/MuData/SpatialData). ``categoricals`` maps slot →
    {column: CategoricalSpec} for registry-domain checks."""
    srow = lh.read_raw("schema").filter(F.col("id") == composite_schema_id).first()
    if srow is None:
        raise KeyError(f"no schema with id {composite_schema_id}")
    links = (
        lh.read_raw("schema_components")
        .filter(F.col("composite_id") == composite_schema_id)
        .select("slot", "component_id")
        .collect()
    )
    if not links:
        raise ValueError(
            f"schema {srow['name']!r} has no slot components — flat "
            "schemas curate via DataFrameCurator"
        )
    slot_specs = {
        r["slot"]: slotspec_from_schema(
            lh, r["component_id"], (categoricals or {}).get(r["slot"])
        )
        for r in links
    }
    cls = {
        "AnnData": AnnDataCurator,
        "MuData": MuDataCurator,
        "SpatialData": SpatialDataCurator,
        "tiledbsoma": TiledbsomaExperimentCurator,
    }.get(srow["itype"])
    if cls is None:
        raise ValueError(
            f"composite otype {srow['itype']!r} has no slot curator "
            "(expected AnnData/MuData/SpatialData/tiledbsoma)"
        )
    return cls(dataset, slot_specs, **kwargs)


class DictCurator(DataFrameCurator):
    """Curator for a plain ``dict`` (reference
    ``ExperimentalDictCurator``, ``curators/core.py:1034-1055``): the
    dict becomes a one-row DataFrame via the same conversion the dict
    SLOTS use (``_dict_frame`` — complex values stringified, exactly
    the reference's ``convert_dict_to_dataframe_for_validation`` in
    spirit), then every DataFrameCurator capability applies —
    schema/dtype checks, categorical domains, standardize, defaults."""

    def __init__(
        self,
        dataset: dict,
        spec,
        categoricals: dict | None = None,
        defaults: dict | None = None,
        spark=None,
    ):
        if not isinstance(dataset, dict):
            raise TypeError(
                f"DictCurator curates a dict, not {type(dataset).__name__}"
            )
        spark = spark or _require_active_session("DictCurator")
        self.source_dict = dict(dataset)
        super().__init__(
            _dict_frame(spark, dataset, "dict"), spec, categoricals, defaults
        )


class SlotsCurator:
    """Base slot curator: subclasses resolve slot names to DataFrames
    (``_resolve_slot``) and rebuild their dataset from standardized
    frames (``_rebuild``).

    The reserved ``__external__`` slot (reference ``core.py:528-544``)
    validates dataset-EXTERNAL features — a plain dict the caller
    supplies (``external_features=``) describing context the payload
    itself cannot carry (assay, organism, batch ids). Declaring the
    slot without providing the dict raises, like the reference's
    ValidationError; on save the dict lands as artifact annotation
    rows alongside the categorical values."""

    def __init__(
        self,
        dataset,
        slots: dict[str, SlotSpec],
        external_features: dict | None = None,
    ):
        self._dataset = dataset
        self._slot_specs = dict(slots)
        self._external = external_features
        self._slots: dict[str, DataFrameCurator] = {}
        for slot, sspec in self._slot_specs.items():
            if slot == "__external__":
                if external_features is None:
                    raise CurationError(
                        "the '__external__' slot is declared but no "
                        "external_features dict was provided"
                    )
                spark = _require_active_session("the '__external__' slot")
                df = _dict_frame(spark, external_features, slot)
            else:
                df = self._resolve_slot(slot)
            self._slots[slot] = DataFrameCurator(
                df, sspec.spec, sspec.categoricals, sspec.defaults
            )

    # -- subclass surface ------------------------------------------------

    def _resolve_slot(self, slot: str) -> DataFrame:
        raise NotImplementedError

    def _rebuild(self, frames: dict[str, DataFrame]):
        """New dataset with the given slots' frames replaced."""
        raise NotImplementedError

    def _write_payload(self, lakehouse, key: str) -> tuple[str, str]:
        """Persist the dataset under the lakehouse storage root;
        returns (payload path, otype)."""
        raise NotImplementedError

    # -- reference API ----------------------------------------------------

    @property
    def slots(self) -> dict[str, DataFrameCurator]:
        """Per-slot curators (reference ``SlotsCurator.slots``)."""
        return self._slots

    def validate(self) -> dict:
        """Every slot's report + aggregate ``is_valid`` (reference
        ``core.py:525-549``; the engine returns the report dict
        instead of raising — raising is ``save_artifact``'s job)."""
        reports = {slot: cur.validate() for slot, cur in self._slots.items()}
        return {
            "slots": reports,
            "is_valid": all(r["is_valid"] for r in reports.values()),
        }

    def verdict_frame(self) -> DataFrame:
        """All categorical violations as ONE lazy DataFrame
        ``(slot, column, invalid_value)`` — the distributed form of
        ``validate()``'s collected lists. Nothing collects; at scale
        the verdict lands in a table.

        Shape (r15): every (slot, column) probe is tagged with its
        literal (slot, column) pair and unioned BEFORE the dedup and
        the anti-join, so the whole verdict is ONE distinct exchange
        and ONE broadcast anti-join against the union of the tagged
        registry domains (synonyms included) — instead of a distinct +
        domain-distinct + broadcast build PER pair. Same rows (the
        literal tags partition the key space, so per-pair distinct ==
        tagged-union distinct, and an anti-join only checks
        membership); measured 9 → 8 scheduled jobs and ~2× faster
        execution (1.2–1.4 → 0.5–0.7 s noop-sink) on the two-slot
        verdict at sf0.1."""
        probes: list[DataFrame] = []
        domains: list[DataFrame] = []
        for slot, cur in self._slots.items():
            for col, cspec in cur.categoricals.items():
                if col not in cur.df.columns:
                    continue
                # both sides cast to string so a non-string registry
                # field still joins against the stringified probe
                domain = cspec.registry.select(
                    F.col(cspec.field).cast("string").alias("__v")
                )
                if cspec.synonyms_field:
                    domain = domain.unionByName(
                        synonym_map(
                            cspec.registry, cspec.field, cspec.synonyms_field
                        ).select(F.col("__syn").cast("string").alias("__v"))
                    )
                tag = [F.lit(slot).alias("slot"), F.lit(col).alias("column")]
                domains.append(domain.select(*tag, "__v"))
                probes.append(
                    cur.df.select(F.col(col).cast("string").alias("__v"))
                    .filter(F.col("__v").isNotNull())
                    .select(*tag, "__v")
                )
        if not probes:
            spark = next(iter(self._slots.values())).df.sparkSession
            return spark.createDataFrame(
                [], "slot string, column string, invalid_value string"
            )
        probe = probes[0]
        for p in probes[1:]:
            probe = probe.unionByName(p)
        domain = domains[0]
        for d in domains[1:]:
            domain = domain.unionByName(d)
        return (
            probe.distinct()
            .join(
                F.broadcast(domain.distinct()),
                ["slot", "column", "__v"],
                "left_anti",
            )
            .select("slot", "column", F.col("__v").alias("invalid_value"))
        )

    def standardize(self) -> "SlotsCurator":
        """Per-slot standardize (synonym mapping + default fill),
        rebuilt into a new curator over the standardized dataset
        (reference ``Curator.standardize`` applied slot-wise)."""
        frames = {
            slot: cur.standardize().df
            for slot, cur in self._slots.items()
            if slot != "__external__"
        }
        return type(self)(
            self._rebuild(frames),
            self._slot_specs,
            external_features=self._external,
        )

    def save_artifact(self, lakehouse, key: str, description: str | None = None):
        """Validate; on success persist the payload and annotate the
        artifact with each slot's categorical values — canonical
        names, merged last-wins per column across slots (reference
        ``core.py:551-608``)."""
        report = self.validate()
        if not report["is_valid"]:
            raise CurationError(f"not valid: {report}")
        path, otype = self._write_payload(lakehouse, key)
        art = lakehouse.register_artifact(path, key=key, description=description, otype=otype)
        merged: dict[str, list] = {}
        cap = lakehouse.settings.annotation.n_max_records
        for cur in self._slots.values():  # slot order; later slots win
            for col, cspec in cur.categoricals.items():
                if col not in cur.df.columns:
                    continue
                # settings.annotation.n_max_records (reference
                # AnnotationSettings): a cap+1-limited collect bounds
                # driver memory even on a pathological column; beyond
                # the cap the column is skipped with a warning instead
                # of flooding the annotation table
                head = (
                    cur.df.select(col)
                    .filter(F.col(col).isNotNull())
                    .distinct()
                    .limit(cap + 1)
                    .collect()
                )
                if len(head) > cap:
                    logger.warning(
                        "column %r exceeds annotation.n_max_records=%d "
                        "distinct values; skipping its automated annotation",
                        col,
                        cap,
                    )
                    continue
                vals = sorted(r[0] for r in head)
                if cspec.synonyms_field:
                    m = {
                        r["__syn"]: r["__name"]
                        for r in synonym_map(
                            cspec.registry, cspec.field, cspec.synonyms_field
                        ).collect()
                    }
                    vals = sorted({m.get(v, v) for v in vals})
                merged[col] = vals
        for col, vals in merged.items():
            lakehouse.annotate("artifact", art["id"], {col: vals}, explode_lists=True)
        if "__external__" in self._slots and self._external:
            # external features are scalar context values, one row each
            # (reference: artifact._external_features, core.py:601-602)
            lakehouse.annotate("artifact", art["id"], dict(self._external))
        return art


class AnnDataCurator(SlotsCurator):
    """Curator for the long-form AnnData (reference ``AnnDataCurator``,
    ``curators/core.py:1155-1254``). Slots: ``obs``, ``var``, and
    ``uns`` / ``uns:key:...`` (dict slots validated as a one-row
    frame, like the reference's ``_handle_dict_slots``). The
    reference's ``var.T`` transposition does not exist here — long
    ``var`` is already one row per variable, so an itype-style check
    of the var index is just a categorical on ``var_id``."""

    def __init__(
        self,
        dataset,
        slots: dict[str, SlotSpec],
        uns: dict | None = None,
        external_features: dict | None = None,
    ):
        self._uns = uns or {}
        for slot in slots:
            if (
                slot not in ("obs", "var", "__external__")
                and not slot.startswith("uns")
            ):
                raise ValueError(
                    "AnnDataCurator supports the slots 'obs', 'var', "
                    f"'uns[:key]' and '__external__', not {slot!r} "
                    "(long-form var needs no 'var.T' — validate "
                    "'var_id' as a categorical instead)"
                )
        super().__init__(dataset, slots, external_features=external_features)

    def _resolve_slot(self, slot: str) -> DataFrame:
        if slot in ("obs", "var"):
            return getattr(self._dataset, slot)
        spark = self._dataset.obs.sparkSession
        parts = slot.split(":")
        d = self._uns if len(parts) == 1 else _resolve_dict_path(
            self._uns, parts[1:], slot
        )
        return _dict_frame(spark, d, slot)

    def _rebuild(self, frames: dict[str, DataFrame]):
        from ..sources.anndata_long import AnnDataLong

        return AnnDataLong(
            obs=frames.get("obs", self._dataset.obs),
            var=frames.get("var", self._dataset.var),
            x=self._dataset.x,
        )

    def standardize(self) -> "AnnDataCurator":
        frames = {
            slot: cur.standardize().df
            for slot, cur in self._slots.items()
            if slot in ("obs", "var")
        }
        return AnnDataCurator(
            self._rebuild(frames),
            self._slot_specs,
            self._uns,
            external_features=self._external,
        )

    def _write_payload(self, lakehouse, key: str) -> tuple[str, str]:
        from ..sources.anndata_long import write_anndata_long_parquet

        _sid, root = lakehouse._resolve_storage_root()
        target = f"{root}/{key}"
        write_anndata_long_parquet(self._dataset, target)
        return target, "AnnDataLong"


class MuDataCurator(SlotsCurator):
    """Curator for the long-form MuData (reference ``MuDataCurator``,
    ``curators/core.py:1255-1337``). Slots: ``obs`` (the global
    observation table), ``<modality>:obs`` and ``<modality>:var``."""

    def _resolve_slot(self, slot: str) -> DataFrame:
        if slot == "obs":
            if self._dataset.obs is None:
                raise KeyError("MuData store has no global obs table")
            return self._dataset.obs
        parts = slot.split(":")
        if len(parts) != 2 or parts[1] not in ("obs", "var"):
            raise ValueError(
                f"MuDataCurator slots are 'obs', '<modality>:obs' or "
                f"'<modality>:var', not {slot!r}"
            )
        mod, attr = parts
        if mod not in self._dataset.modalities:
            raise KeyError(f"modality {mod!r} not in MuData (have {self._dataset.mod_names})")
        return getattr(self._dataset.modalities[mod], attr)

    def _rebuild(self, frames: dict[str, DataFrame]):
        from ..sources.anndata_long import AnnDataLong
        from ..sources.mudata_io import MuDataLong

        mods = {}
        for name, ad in self._dataset.modalities.items():
            mods[name] = AnnDataLong(
                obs=frames.get(f"{name}:obs", ad.obs),
                var=frames.get(f"{name}:var", ad.var),
                x=ad.x,
            )
        return MuDataLong(
            modalities=mods, obs=frames.get("obs", self._dataset.obs)
        )

    def _write_payload(self, lakehouse, key: str) -> tuple[str, str]:
        from ..sources.mudata_io import write_mudata_long_parquet

        _sid, root = lakehouse._resolve_storage_root()
        target = f"{root}/{key}"
        write_mudata_long_parquet(self._dataset, target)
        return target, "MuDataLong"


class TiledbsomaExperimentCurator(SlotsCurator):
    """Curator for a SOMA experiment in the engine's relational long
    form (reference ``TiledbsomaExperimentCurator``,
    ``curators/core.py:1434-1503``). Slots:

    - ``obs`` — the experiment-GLOBAL observation table (SOMA keeps
      obs on the Experiment, not per measurement);
    - ``ms:<measurement>`` — that measurement's ``var`` frame (the
      reference's shorthand: its ``ms:RNA`` slot reads
      ``exp.ms["RNA"].var``);
    - ``ms:<measurement>:var`` — the same, spelled explicitly.

    ``ms:<measurement>:obs`` is rejected with guidance: a SOMA
    measurement has no own obs — validate the global ``obs`` slot.
    The reference's ``var.T`` transposition does not exist here for
    the same reason as :class:`AnnDataCurator`: long-form var is
    already one row per variable.

    The dataset is a :class:`~lamindb_spark.sources.soma_io.
    SomaExperimentLong`; :meth:`from_store` opens a real
    ``.tiledbsoma`` store through the import-gated bridge
    (``read_tiledbsoma_experiment``). Standardizing ``obs`` rebuilds
    every measurement over the one standardized global table.
    """

    def __init__(self, dataset, slots, external_features=None):
        from ..sources.soma_io import SomaExperimentLong

        if not isinstance(dataset, SomaExperimentLong):
            raise TypeError(
                "TiledbsomaExperimentCurator curates a SomaExperimentLong "
                "(open a .tiledbsoma store with "
                "TiledbsomaExperimentCurator.from_store, or build one via "
                "soma_experiment_to_long)"
            )
        super().__init__(dataset, slots, external_features=external_features)

    @classmethod
    def from_store(cls, spark, path: str, slots, **kwargs):
        from ..sources.soma_io import read_tiledbsoma_experiment

        return cls(read_tiledbsoma_experiment(spark, path), slots, **kwargs)

    def _resolve_slot(self, slot: str) -> DataFrame:
        if slot == "obs":
            return self._dataset.obs
        parts = slot.split(":")
        if parts[0] == "ms" and len(parts) in (2, 3):
            if len(parts) == 3 and parts[2] == "obs":
                raise ValueError(
                    f"slot {slot!r}: a SOMA measurement has no own obs "
                    "table — the observation frame is experiment-global; "
                    "declare the 'obs' slot instead"
                )
            if len(parts) == 3 and parts[2] != "var":
                raise ValueError(
                    "TiledbsomaExperimentCurator slots are 'obs', "
                    f"'ms:<measurement>' or 'ms:<measurement>:var', not {slot!r}"
                )
            mname = parts[1]
            if mname not in self._dataset.measurements:
                raise KeyError(
                    f"measurement {mname!r} not in the experiment "
                    f"(have {self._dataset.ms_names})"
                )
            return self._dataset.measurements[mname].var
        raise ValueError(
            "TiledbsomaExperimentCurator slots are 'obs', "
            f"'ms:<measurement>[:var]' or '__external__', not {slot!r}"
        )

    def _rebuild(self, frames: dict[str, DataFrame]):
        from ..sources.anndata_long import AnnDataLong
        from ..sources.soma_io import SomaExperimentLong

        obs = frames.get("obs", self._dataset.obs)
        ms = {}
        for name, ad in self._dataset.measurements.items():
            var = frames.get(f"ms:{name}:var", frames.get(f"ms:{name}", ad.var))
            ms[name] = AnnDataLong(obs=obs, var=var, x=ad.x)
        return SomaExperimentLong(obs=obs, measurements=ms)

    def _write_payload(self, lakehouse, key: str) -> tuple[str, str]:
        from ..sources.soma_io import write_soma_long_parquet

        _sid, root = lakehouse._resolve_storage_root()
        target = f"{root}/{key}"
        write_soma_long_parquet(self._dataset, target)
        return target, "SomaExperimentLong"


class SpatialDataCurator(SlotsCurator):
    """Curator for a SpatialData store (reference
    ``SpatialDataCurator``, ``curators/core.py:1338-1433``). Slots:
    ``tables:<key>:obs`` / ``tables:<key>:var``, plus the engine's
    native element frames ``points:<name>`` and ``shapes:<name>``
    (real DataFrames in ``SpatialDataLong`` — the reference validates
    only tables/attrs; curating point/shape metadata is the same
    broadcast anti-join so it comes for free here). The store is
    path-backed (lazy pixels), so ``save_artifact`` registers the
    existing store in place rather than rewriting rasters."""

    def _resolve_slot(self, slot: str) -> DataFrame:
        parts = slot.split(":")
        if len(parts) == 3 and parts[0] == "tables" and parts[2] in ("obs", "var"):
            _t, tkey, attr = parts
            if tkey not in self._dataset.tables:
                raise KeyError(f"table {tkey!r} not in sdata.tables")
            return getattr(self._dataset.tables[tkey], attr)
        if len(parts) == 2 and parts[0] in ("points", "shapes"):
            coll = getattr(self._dataset, parts[0])
            if parts[1] not in coll:
                raise KeyError(f"{parts[0]} element {parts[1]!r} not found")
            return coll[parts[1]]
        raise ValueError(
            "SpatialDataCurator slots are 'tables:<key>:obs|var', "
            f"'points:<name>' or 'shapes:<name>', not {slot!r}"
        )

    def _rebuild(self, frames: dict[str, DataFrame]):
        from ..sources.anndata_long import AnnDataLong
        from ..sources.spatialdata_io import SpatialDataLong

        tables = {}
        for tkey, ad in self._dataset.tables.items():
            tables[tkey] = AnnDataLong(
                obs=frames.get(f"tables:{tkey}:obs", ad.obs),
                var=frames.get(f"tables:{tkey}:var", ad.var),
                x=ad.x,
            )
        points = {
            n: frames.get(f"points:{n}", df)
            for n, df in self._dataset.points.items()
        }
        shapes = {
            n: frames.get(f"shapes:{n}", df)
            for n, df in self._dataset.shapes.items()
        }
        return SpatialDataLong(
            path=self._dataset.path,
            tables=tables,
            points=points,
            shapes=shapes,
            images=self._dataset.images,
            labels=self._dataset.labels,
        )

    def _write_payload(self, lakehouse, key: str) -> tuple[str, str]:
        # path-backed store: reference the zarr in place (rasters are
        # lazy; rewriting them to "save" a metadata curation would be
        # pure waste). Annotations land on the registered artifact.
        return self._dataset.path, "SpatialData"
