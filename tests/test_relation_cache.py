"""The session-scoped relation cache in `sources.readers.load_table`:
a cache hit must be pure metadata reuse (identical results, no stale
schema), and any rewrite of the underlying file must invalidate via
the stat fingerprint — the same contract as the model cache in
`pipeline.similarity`.
"""

from __future__ import annotations

import os
import time

import pandas as pd

from lamindb_spark.sources import readers
from lamindb_spark.sources.readers import _RELATION_CACHE, load_table


def test_relation_cache_hits_and_invalidates(spark, tmp_path):
    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "widgets.parquet")
    pd.DataFrame({"a": [1, 2, 3]}).to_parquet(path)

    df1 = load_table(spark, sf_dir, "widgets")
    assert df1.columns == ["a"]
    df2 = load_table(spark, sf_dir, "widgets")
    # same fingerprint -> the very same analyzed DataFrame object
    assert df2 is df1

    # rewrite with a DIFFERENT schema; ensure mtime_ns moves even on
    # coarse-granularity filesystems
    time.sleep(0.01)
    pd.DataFrame({"a": [4, 5], "b": ["x", "y"]}).to_parquet(path)
    os.utime(path)
    df3 = load_table(spark, sf_dir, "widgets")
    assert df3 is not df1
    assert df3.columns == ["a", "b"]
    assert df3.count() == 2
    # the old relation was not mutated
    assert df1.columns == ["a"]


def test_relation_cache_bounded(spark, tmp_path):
    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "t.parquet")
    pd.DataFrame({"a": [1]}).to_parquet(path)
    old_max = readers._RELATION_CACHE_MAX
    readers._RELATION_CACHE_MAX = 4
    try:
        _RELATION_CACHE.clear()
        for i in range(10):
            time.sleep(0.002)
            os.utime(path)  # new fingerprint each round
            load_table(spark, sf_dir, "t")
        assert len(_RELATION_CACHE) <= 4
    finally:
        readers._RELATION_CACHE_MAX = old_max
