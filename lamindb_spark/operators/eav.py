"""EAV feature filtering — entity selection by annotation predicates.

Mirrors the reference's feature-name keyword filters
(``Artifact.filter(experiment="E1", temperature__gt=21)`` → JSON-value /
link-table subqueries, ``_feature_manager.py:842-1089``): each feature
predicate becomes a semi-join of the entity table against the matching
slice of the long annotation table; negations / isnull become
anti-joins (``_feature_manager.py:985-989, 855-877``).

The annotation table shape is ``(entity_id, feature, value...)``; the
predicate runs on the value column(s), then entities are filtered with
``left_semi`` — never a fanout join, so entity rows are not multiplied
(reference's join-fanout avoidance, ``query_set.py:1226-1240``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def entities_with_feature(
    entities: DataFrame,
    annotations: DataFrame,
    entity_key: str,
    predicate: Column,
    negate: bool = False,
) -> DataFrame:
    """Keep entities having (or lacking, with ``negate``) an annotation
    row satisfying ``predicate``."""
    matching = annotations.filter(predicate).select(entity_key).distinct()
    how = "left_anti" if negate else "left_semi"
    return entities.join(matching, entity_key, how)


def feature_isnull(
    entities: DataFrame,
    annotations: DataFrame,
    entity_key: str,
    feature_predicate: Column,
    isnull: bool = True,
) -> DataFrame:
    """Presence/absence of any annotation for a feature (reference
    ``_feature_manager.py:855-877``)."""
    return entities_with_feature(
        entities, annotations, entity_key, feature_predicate, negate=isnull
    )
