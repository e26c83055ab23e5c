"""Recall@k evidence for the ANN tiers (VERDICT r7 #4 / r8 #5).

The full sweep lives in ``scripts/ann_recall.py`` (sf0.1 numbers in
SCALE.md). These tests pin the STRUCTURAL recall invariants — the
properties that must hold regardless of fixture noise:

- IVF recall is monotone in nprobe and EXACTLY 1.0 at nprobe=n_cells
  (probing every cell degenerates to the exact cosine scan);
- IVF-PQ at full probe returns the identical id set as flat PQ over
  all codes (same candidate set, same integer ADC scoring);
- SQ8 (8 bits/dim) is near-exact;
- quantized-tier recall is far above the random-guess baseline;
- residual IVF-PQ beats raw IVF-PQ in the regime the technique
  targets — CLUSTERED data, where residuals concentrate around the
  origin (Jégou et al. 2011 §III). On the driver's structureless
  synthetic embeddings the two measure equal within noise (see
  SCALE.md), which is itself the theoretically expected outcome, so
  the superiority floor is pinned on a constructed clustered corpus.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lamindb_spark.sources.readers import load_table

SF = "/root/testdata/sf0.01"
K = 10
N_CELLS = 8
QUERY_IDS = (100, 101, 102, 103, 104)


def _ids(df):
    return [int(r[0]) for r in df.collect()]


def _recall(approx, exact):
    return len(set(approx) & set(exact)) / len(exact)


@pytest.fixture(scope="module")
def corpus(spark):
    from lamindb_spark.pipeline.similarity import kmeans_fit

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    emb = emb.localCheckpoint(eager=True)
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id").isin(list(QUERY_IDS))).collect()
    ]
    cents = kmeans_fit(emb, k=N_CELLS, iters=2)
    return emb, queries, cents


def test_ivf_recall_monotone_and_exact_at_full_probe(spark, corpus, tmp_path):
    from lamindb_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_build_index,
        ivf_topk,
    )

    emb, queries, cents = corpus
    path = str(tmp_path / "ivf")
    ivf_build_index(emb, cents, path)
    exact = {q: _ids(brute_force_topk(emb, v, K)) for q, v in queries}

    def mean_recall(nprobe):
        return sum(
            _recall(_ids(ivf_topk(spark, path, cents, v, K, nprobe=nprobe)), exact[q])
            for q, v in queries
        ) / len(queries)

    r1, r4, r8 = mean_recall(1), mean_recall(4), mean_recall(8)
    assert r1 <= r4 <= r8, (r1, r4, r8)
    # nprobe = n_cells probes EVERYTHING: the "approximation" is the
    # exact cosine scan and recall must be exactly 1
    assert r8 == 1.0, r8
    assert r1 > 0.1  # probing the query's own cell finds real neighbors


def test_ivfpq_full_probe_equals_flat_pq(spark, corpus, tmp_path):
    from lamindb_spark.pipeline.similarity import (
        ivfpq_build_index,
        ivfpq_topk,
        pq_adc_topk,
        pq_distance_table,
        pq_encode,
        pq_train,
    )

    emb, queries, cents = corpus
    books = pq_train(emb, dim=64, m=8, k=16, iters=2)
    enc = pq_encode(emb, books, dim=64)
    path = str(tmp_path / "ivfpq")
    ivfpq_build_index(emb, cents, books, path, dim=64)
    for q, v in queries[:3]:
        flat = _ids(pq_adc_topk(enc, pq_distance_table(books, v), K))
        full = _ids(ivfpq_topk(spark, path, cents, books, v, K, nprobe=N_CELLS))
        assert flat == full, (q, flat, full)


def test_sq8_is_near_exact(spark, corpus):
    from lamindb_spark.pipeline.similarity import (
        brute_force_topk,
        sq8_topk,
        sq8_train,
    )

    emb, queries, _ = corpus
    bounds = sq8_train(emb)
    rs = [
        _recall(
            _ids(sq8_topk(emb, bounds, v, K)),
            _ids(brute_force_topk(emb, v, K, metric="l2")),
        )
        for q, v in queries
    ]
    # 8 bits/dim on bounded components: measured 0.98 at sf0.1 (20
    # queries) — pin a wide floor so host-independent
    assert sum(rs) / len(rs) >= 0.85, rs


def test_pq_recall_far_above_random_baseline(spark, corpus):
    from lamindb_spark.pipeline.similarity import (
        brute_force_topk,
        pq_adc_topk,
        pq_distance_table,
        pq_encode,
        pq_train,
    )

    emb, queries, _ = corpus
    n = emb.count()
    books = pq_train(emb, dim=64, m=8, k=16, iters=2)
    enc = pq_encode(emb, books, dim=64).localCheckpoint(eager=True)
    rs = [
        _recall(
            _ids(pq_adc_topk(enc, pq_distance_table(books, v), K)),
            _ids(brute_force_topk(emb, v, K, metric="l2")),
        )
        for q, v in queries
    ]
    random_baseline = K / n
    assert sum(rs) / len(rs) > 10 * random_baseline, (rs, random_baseline)


def test_residual_beats_raw_pq_on_clustered_data(spark, tmp_path):
    """The floor VERDICT r8 asks for, pinned where the theory holds:
    8 well-separated clusters with small within-cluster noise. The
    residual codebooks see only the concentrated noise distribution
    (spread ~0.15 per dim) while the raw codebooks must cover the
    whole space (spread ~2.0 per dim) with the same bit budget — the
    exact mechanism of Jégou et al. 2011 §III."""
    from lamindb_spark.pipeline.similarity import (
        brute_force_topk,
        ivfpq_build_index,
        ivfpq_residual_build_index,
        ivfpq_residual_topk,
        ivfpq_topk,
        kmeans_fit,
        pq_train,
    )

    rng = np.random.default_rng(7)
    dim, n_clusters, per = 16, 8, 40
    centers = rng.normal(0.0, 2.0, (n_clusters, dim))
    rows = []
    vid = 0
    for ci in range(n_clusters):
        for _ in range(per):
            v = centers[ci] + rng.normal(0.0, 0.15, dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).localCheckpoint(
        eager=True
    )
    cents = kmeans_fit(emb, k=n_clusters, iters=4)
    queries = rows[::37][:6]  # spread across clusters

    raw_path, res_path = str(tmp_path / "raw"), str(tmp_path / "res")
    books = pq_train(emb, dim=dim, m=4, k=16, iters=3)
    ivfpq_build_index(emb, cents, books, raw_path, dim=dim)
    rbooks = ivfpq_residual_build_index(
        emb, cents, res_path, dim=dim, m=4, k=16, iters=3
    )

    def mean_recall(topk_fn):
        rs = []
        for q, v in queries:
            exact = _ids(brute_force_topk(emb, v, K, metric="l2"))
            rs.append(_recall(_ids(topk_fn(v)), exact))
        return sum(rs) / len(rs)

    raw = mean_recall(
        lambda v: ivfpq_topk(spark, raw_path, cents, books, v, K, nprobe=2)
    )
    res = mean_recall(
        lambda v: ivfpq_residual_topk(spark, res_path, cents, rbooks, v, K, nprobe=2)
    )
    assert res >= raw, (res, raw)
    assert res >= 0.5, res  # concentrated residuals must quantize well

def test_refine_with_all_candidates_recovers_exact_topk(spark, corpus):
    """Refine correctness identity: with the candidate set = the whole
    corpus the first pass prunes nothing, so the refined top-k IS the
    exact L2 top-k (id-list equality, not just recall — the integer
    micro-quantized distance preserves the double-L2 ordering at this
    fixture's value scale)."""
    from lamindb_spark.pipeline.similarity import brute_force_topk, refine_topk

    emb, queries, _ = corpus
    all_ids = emb.select("vec_id")
    for q, v in queries[:3]:
        refined = _ids(refine_topk(all_ids, emb, v, K))
        exact = _ids(brute_force_topk(emb, v, K, metric="l2"))
        assert refined == exact, (q, refined, exact)


def test_refine_dominates_first_pass_and_stays_in_candidates(spark, corpus):
    """The production two-stage contract: (a) refined top-k recall is
    >= the raw PQ top-k recall for EVERY query (the refine re-ranks a
    superset of what PQ would have returned, by the true distance);
    (b) the refined ids are a subset of the candidate set (refine
    never resurrects a pruned row); (c) at candidate budget c = 10*K
    the mean refined recall clears a floor far above PQ's ~0.22
    first-pass recall (measured 0.72 on this sf0.01 fixture — the
    structureless-Gaussian corpus is PQ's worst case, same reason the
    residual tier ties raw here; on sf0.1 see SCALE.md)."""
    from lamindb_spark.pipeline.similarity import (
        brute_force_topk,
        pq_adc_topk,
        pq_distance_table,
        pq_encode,
        pq_train,
        refine_topk,
    )

    emb, queries, _ = corpus
    books = pq_train(emb, dim=64, m=8, k=16, iters=2)
    enc = pq_encode(emb, books, dim=64).localCheckpoint(eager=True)
    refined_recalls, raw_recalls = [], []
    for q, v in queries:
        exact = _ids(brute_force_topk(emb, v, K, metric="l2"))
        table = pq_distance_table(books, v)
        raw = _ids(pq_adc_topk(enc, table, K))
        cand = pq_adc_topk(enc, table, 10 * K)
        cand_ids = set(_ids(cand))
        refined = _ids(refine_topk(cand, emb, v, K))
        assert set(refined) <= cand_ids, (q, refined)
        r_raw, r_ref = _recall(raw, exact), _recall(refined, exact)
        assert r_ref >= r_raw, (q, r_ref, r_raw)
        refined_recalls.append(r_ref)
        raw_recalls.append(r_raw)
    mean_ref = sum(refined_recalls) / len(refined_recalls)
    mean_raw = sum(raw_recalls) / len(raw_recalls)
    assert mean_ref >= 0.6, refined_recalls
    assert mean_ref > mean_raw, (mean_ref, mean_raw)

def test_refine_distance_bit_replays_in_numpy(spark, corpus):
    """Exactness pin (the repo's bit-replay convention): refine_topk's
    int64 micro-quantized L2 must equal an independent numpy fold over
    the same candidates — same distances, same id order."""
    from lamindb_spark.pipeline.similarity import refine_topk

    emb, queries, _ = corpus
    q, v = queries[0]
    cand_ids = [int(r[0]) for r in emb.select("vec_id").limit(60).collect()]
    cand = emb.filter(F.col("vec_id").isin(cand_ids)).select("vec_id")
    got = [
        (int(r["vec_id"]), int(r["exact_d2"]))
        for r in refine_topk(cand, emb, v, k=10).collect()
    ]

    def quant(x):
        import math

        return int(math.copysign(math.floor(abs(x) * 1_000_000 + 0.5), x))

    qv = np.array([quant(x) for x in v], dtype=np.int64)
    rows = {
        int(r["vec_id"]): np.array(
            [quant(float(x)) for x in r["embedding"]], dtype=np.int64
        )
        for r in emb.filter(F.col("vec_id").isin(cand_ids)).collect()
    }
    expected = sorted(
        ((int((rows[i] - qv) @ (rows[i] - qv)), i) for i in cand_ids)
    )[:10]
    assert got == [(i, d) for d, i in expected]


def test_full_production_read_path_prune_rank_refine(spark, corpus, tmp_path):
    """The composed serving path at 100 TB: IVF cell prune (file-level
    on the persisted layout) → integer ADC rank of the compressed
    codes → exact refine of the top-c candidates. Pins: the refined
    ids come only from probed cells, and the refined top-k recall is
    >= the unrefined ADC top-k recall under exact L2."""
    from lamindb_spark.pipeline.similarity import (
        _argmin_cell,
        brute_force_topk,
        ivfpq_build_index,
        ivfpq_topk,
        pq_train,
        probe_cells,
        refine_topk,
    )

    emb, queries, cents = corpus
    books = pq_train(emb, dim=64, m=8, k=16, iters=2)
    path = str(tmp_path / "ivfpq")
    ivfpq_build_index(emb, cents, books, path, dim=64)
    q, v = queries[0]
    nprobe = 4
    probes = set(probe_cells(cents, v, nprobe))
    member_ids = {
        int(r["vec_id"])
        for r in emb.filter(
            _argmin_cell("embedding", cents).isin([int(p) for p in probes])
        )
        .select("vec_id")
        .collect()
    }
    exact = _ids(brute_force_topk(emb, v, K, metric="l2"))

    ranked = ivfpq_topk(spark, path, cents, books, v, k=K, nprobe=nprobe)
    cand = ivfpq_topk(spark, path, cents, books, v, k=10 * K, nprobe=nprobe)
    refined = _ids(refine_topk(cand, emb, v, K))

    assert set(refined) <= member_ids  # refine never leaves the probe set
    assert _recall(refined, exact) >= _recall(_ids(ranked), exact)
