"""Join patterns: FK path traversal, semi/anti, fanout-safe annotate.

The reference never spells "join" — joins arise from ``__``-path
traversal over FK/M2M relations compiled by its ORM (SURVEY §2.3).
Here relations are declared explicitly and compiled to equi-joins.
Registry/dimension tables are small relative to fact/payload tables, so
FK joins broadcast the dimension side (no shuffle of the big side).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Relation:
    """A named FK or M2M edge from one table to another.

    FK:   local_key on the source equals remote_key on the target.
    M2M:  through a bridge DataFrame with (through_local, through_remote).
    """

    name: str
    target: str  # target table name in the relation graph
    local_key: str
    remote_key: str
    through: str | None = None  # bridge table name for M2M
    through_local: str | None = None
    through_remote: str | None = None


def fk_join(
    left: DataFrame,
    right: DataFrame,
    local_key: str,
    remote_key: str,
    prefix: str,
    how: str = "inner",
    broadcast_right: bool = True,
) -> DataFrame:
    """N:1 join; right columns come back prefixed ``{prefix}__col``.

    Broadcasting the dimension side keeps the fact side un-shuffled —
    at 100 TB the fact scan stays pipeline-parallel with zero exchange.
    """
    r = right.select([F.col(c).alias(f"{prefix}__{c}") for c in right.columns])
    if broadcast_right:
        r = F.broadcast(r)
    return left.join(r, left[local_key] == r[f"{prefix}__{remote_key}"], how)


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """Rows of left with a match in right (reference
    ``id__in=Subquery(...)``, ``query_set.py:1226-1230``)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """Rows of left without a match in right (reference
    ``exclude(id__in=Subquery(...))``, ``_feature_manager.py:989``)."""
    return left.join(right, on, "left_anti")


def fanout_safe_annotate(
    base: DataFrame,
    annotations: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Join 1:N annotations without multiplying base rows on multiple
    relations: compute the distinct key set first, join annotations to
    it, then attach (reference join-fanout avoidance,
    ``query_set.py:1226-1240``). Caller is expected to have pre-grouped
    ``annotations`` to one row per key (e.g. via pivot/collect_list).
    """
    return base.join(annotations, key, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed (left) side's key into
    ``n_salts`` sub-keys and replicate the right side once per salt, so
    a hot key's rows spread over ``n_salts`` reducers instead of one.

    Complements AQE's skew-join splitting (which handles skewed
    *partitions* after the fact): explicit salting is the tool when one
    *key* dominates — e.g. a null-ish default FK or a mega-user — and
    works for aggregations-after-join too. The right side must be the
    smaller side (it is replicated ×n_salts).

    Only ``inner``/``left`` joins are valid: the right side is
    replicated, so right/full-outer would emit every UNMATCHED right
    row once per salt replica (review finding) — guarded below.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only (got {how!r}): "
            "the right side is replicated per salt, so right/full outer "
            "joins would duplicate unmatched right rows n_salts times"
        )
    salted_l = left.withColumn(
        "__salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    salted_r = right.withColumn("__salt", salts)
    out = salted_l.join(salted_r, [key, "__salt"], how)
    return out.drop("__salt")


def filtered_left_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    extra_cond,
) -> DataFrame:
    """LEFT JOIN with an extra ON-condition (reference
    ``FilteredRelation(path, condition=Q(...))``, ``query_set.py:679-691``;
    J5): rows of ``left`` always survive; ``right`` columns attach only
    where BOTH the key matches AND the extra condition holds — unlike a
    post-join WHERE, which would drop left rows."""
    return left.join(
        right, (left[left_key] == right[right_key]) & extra_cond, "left"
    )
