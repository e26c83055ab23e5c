"""Annotated-matrix (AnnData-style) payloads as Spark DataFrames.

The reference ingests AnnData/MuData arrays (``artifact.py:2374-2697``)
and streams them via lazy accessors (``_anndata_accessor.py:727``).
Spark has no native n-d array type, so the honest distributed mapping
(SURVEY §1.2, §7.4) is the *long/coordinate form* — the standard way
sparse expression matrices are represented relationally:

- ``obs``  — one row per observation (cell): ``(obs_id, ...metadata)``
- ``var``  — one row per variable (gene): ``(var_id, ...metadata)``
- ``X``    — non-zero matrix entries: ``(obs_id, var_id, value)``

Every AnnData access pattern then compiles to stock relational ops
that shard cleanly at any scale: slicing = semi-joins, pseudobulk =
groupBy, densification = pivot. X is hash-partitioned on ``obs_id`` so
per-cell operations (normalization, slicing by obs) never shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class AnnDataLong:
    """An annotated matrix in long form: obs × var with sparse X."""

    obs: DataFrame
    var: DataFrame
    x: DataFrame  # (obs_id, var_id, value)

    def slice(self, obs_filter=None, var_filter=None) -> "AnnDataLong":
        """Lazy submatrix: filter obs/var, semi-join X on the survivors
        (reference: AnnDataAccessor lazy slicing). No data moves until
        an action; the semi-joins broadcast when the id sets are small."""
        obs = self.obs.filter(obs_filter) if obs_filter is not None else self.obs
        var = self.var.filter(var_filter) if var_filter is not None else self.var
        x = self.x
        if obs_filter is not None:
            x = x.join(obs.select("obs_id"), "obs_id", "left_semi")
        if var_filter is not None:
            x = x.join(var.select("var_id"), "var_id", "left_semi")
        return AnnDataLong(obs, var, x)

    def pseudobulk(self, obs_group_col: str) -> DataFrame:
        """Sum X per (obs-group, var) — the standard pseudobulk
        aggregation; one shuffle on the (group, var) key with map-side
        partial aggregation."""
        groups = self.obs.select("obs_id", obs_group_col)
        return (
            self.x.join(groups, "obs_id")
            .groupBy(obs_group_col, "var_id")
            .agg(
                F.sum("value").alias("sum_value"),
                F.count(F.lit(1)).alias("n_obs"),
            )
        )

    def to_dense(self, var_ids: list | None = None) -> DataFrame:
        """Wide matrix via pivot — one column per var. Only for
        bounded var sets (pivot materializes the column list); pass
        ``var_ids`` explicitly to keep the plan deterministic and skip
        the distinct-scan Spark otherwise needs."""
        if var_ids is None:
            var_ids = [r[0] for r in self.var.select("var_id").distinct().collect()]
        return (
            self.x.groupBy("obs_id")
            .pivot("var_id", var_ids)
            .agg(F.first("value"))
            .na.fill(0.0)
        )

    def normalize_per_obs(self, target: float = 1e4) -> "AnnDataLong":
        """Library-size normalization: value * target / sum(value per
        obs) — a window sum partitioned on obs_id; with X partitioned on
        obs_id this is shuffle-free."""
        from pyspark.sql import Window

        w = Window.partitionBy("obs_id")
        x = self.x.withColumn(
            "value", F.col("value") * target / F.sum("value").over(w)
        )
        return AnnDataLong(self.obs, self.var, x)


# ------------------------------------------------------- long-form store
#
# The DISTRIBUTED persistence of an annotated matrix: a directory with
# three parquet datasets (obs/, var/, X/). This is the shape the module
# docstring promises for scale — at 100 TB the zarr bridge is an ingest
# device (driver-side, once per file), while the long store is what
# every downstream op scans: X is just a parquet table, so slicing /
# pseudobulk / curation all run as pruned distributed scans. The slot
# curators' save_artifact writes this store (the reference's
# Artifact.from_anndata writes h5ad/zarr, artifact.py:2374-2444; the
# Spark-native equivalent keeps the relational form).


def write_anndata_long_parquet(ad: AnnDataLong, path: str) -> None:
    """Persist an :class:`AnnDataLong` as a parquet directory store
    (``obs/``, ``var/``, ``X/``). X is written sorted within
    partitions on ``obs_id`` so per-cell reads cluster row-groups (and
    a cluster deployment can ZORDER/bucket the same layout without an
    API change)."""
    ad.obs.write.mode("overwrite").parquet(f"{path}/obs")
    ad.var.write.mode("overwrite").parquet(f"{path}/var")
    ad.x.sortWithinPartitions("obs_id").write.mode("overwrite").parquet(
        f"{path}/X"
    )


def read_anndata_long_parquet(spark, path: str) -> AnnDataLong:
    """Open a long-form parquet store written by
    :func:`write_anndata_long_parquet` — three lazy scans, no data
    moves."""
    return AnnDataLong(
        obs=spark.read.parquet(f"{path}/obs"),
        var=spark.read.parquet(f"{path}/var"),
        x=spark.read.parquet(f"{path}/X"),
    )


def is_anndata_long_store(path: str) -> bool:
    """Sniff: a directory with obs/var/X parquet subdirectories."""
    import os

    return all(os.path.isdir(os.path.join(path, d)) for d in ("obs", "var", "X"))


def from_dense(df: DataFrame, obs_id_col: str, var_cols: list[str]) -> AnnDataLong:
    """Build the long form from a wide frame (one column per var):
    unpivot via ``stack``, dropping zeros to keep X sparse."""
    x = (
        df.select(
            F.col(obs_id_col).alias("obs_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(c).alias("var_id"), F.col(c).cast("double").alias("value"))
                        for c in var_cols
                    ]
                )
            ).alias("e"),
        )
        .select("obs_id", "e.var_id", "e.value")
        .filter(F.col("value") != 0.0)
    )
    obs = df.select(F.col(obs_id_col).alias("obs_id")).distinct()
    spark = df.sparkSession
    var = spark.createDataFrame([(c,) for c in var_cols], "var_id string")
    return AnnDataLong(obs, var, x)
