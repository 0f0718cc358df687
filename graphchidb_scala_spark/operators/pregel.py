"""Vertex-centric computation — the reference's GraphChi engine surface
(VertexCentricComputation.scala:37-54, runGraphChiComputation
GraphChiDatabase.scala:2125-2255) as Pregel-style DataFrame loops.

One iteration = messages (edges ⋈ state, groupBy(dst).agg) + state update
(state ⋈ messages). The reference's BitSetScheduler (Scheduler.scala:31-83,
only changed vertices rerun) maps to an *active-set* DataFrame that gates the
message join. Lineage is cut every iteration with localCheckpoint — the
equivalent of the reference's in-place column updates; without it the plan
tree grows exponentially (SURVEY.md §7.4).

Scale: each iteration is two shuffles (messages, update-join) over data
partitioned by vertex id; the same hash partitioning is reused across
iterations so exchange reuse kicks in. Lineage cuts go through
``checkpoint.cut_lineage``: set ``spark.sparkContext.setCheckpointDir`` on a
cluster and every superstep persists to the fault-tolerant FS instead of
executor-local blocks (which cannot survive executor loss on a 100-iteration
job at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphchidb_scala_spark.checkpoint import cut_lineage
from graphchidb_scala_spark.db import GraphDB


def _checkpoint(df: DataFrame) -> DataFrame:
    return cut_lineage(df)


# --------------------------------------------------------------------- PageRank

def pagerank(
    db: GraphDB,
    iterations: int = 10,
    damping: float = 0.85,
    etype: int | None = None,
    tol: float | None = None,
    checkpoint_every: int | None = 5,
    initial: DataFrame | None = None,
) -> DataFrame:
    """PageRank, non-normalized accumulator formulation of the reference
    (Pagerank.scala:34-61): rank = 0.15 + 0.85 * Σ_in rank(u)/outdeg(u),
    rank0 = 1.0 over all vertices. Fixed ``iterations`` (set ``tol`` for
    convergence-stop instead). Returns DF(id, rank).

    The out-degree table is computed once and re-joined per iteration
    (map-side combine; one shuffle), exactly the degree column the reference
    maintains incrementally (GraphChiDatabase.scala:1777-1833).

    Shuffle structure: ONE exchange per iteration — the groupBy(id) message
    shuffle, which is the floor for a message-passing step. Vertices with no
    in-edges are kept in the state not by left-joining the static vertex set
    (that join re-exchanged + sorted V rows every iteration) but by unioning
    a zero-contribution row per vertex into the groupBy input: the union is
    exchange-free, the zero rows collapse in the map-side partial aggregate,
    and ``sum(c) + 0.0`` is bit-exact, so results are unchanged. The
    edge+degree table is checkpointed once; the per-iteration rank side
    broadcasts while it fits and degrades to a co-partitioned shuffle join
    at scale.

    Universe semantics: edge endpoints absent from the vertex table still
    participate in propagation (their mass accumulates and flows onward —
    the Pregel universe is edge endpoints ∪ vertices), but the OUTPUT is
    restricted to the vertex table with one final semi-join, so the result
    schema/row-set is stable however dirty the edge set is."""
    e = db._typed(etype).select("src", "dst")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_deg = _checkpoint(e.join(deg, "src").repartition("src"))
    vstatic = _checkpoint(db.vertices.select("id").repartition("id"))
    if initial is not None:
        # warm start — the reference's continuous-computation story
        # (SURVEY §2.12: recompute after online appends without starting
        # over): seed from the previous converged ranks; vertices new to
        # the graph (appended edges) enter at the cold-start 1.0. The
        # fixpoint is the same (the iteration is a contraction for
        # damping < 1); a warm start just arrives in a few iterations.
        ranks = _checkpoint(
            vstatic.join(initial.select("id", "rank"), "id", "left").select(
                "id", F.coalesce(F.col("rank"), F.lit(1.0)).alias("rank")
            )
        )
    else:
        ranks = vstatic.withColumn("rank", F.lit(1.0))
    zeros = vstatic.select("id", F.lit(0.0).alias("c"))

    for i in range(1, iterations + 1):
        msgs = (
            edges_deg.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .unionAll(zeros)
        )
        new_ranks = msgs.groupBy("id").agg(
            (F.lit(1.0 - damping) + F.lit(damping) * F.sum("c")).alias("rank")
        )
        if tol is not None:
            new_ranks = _checkpoint(new_ranks)
            delta = (
                new_ranks.join(ranks.select("id", F.col("rank").alias("old_rank")), "id")
                .agg(F.max(F.abs(F.col("rank") - F.col("old_rank"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
            # checkpoint_every=None keeps the plan un-collapsed (plan audits)
            if checkpoint_every and (i % checkpoint_every == 0 or i == iterations):
                ranks = _checkpoint(ranks)
    # one final (not per-iteration) semi-join: drop rank rows the message
    # union grew for edge endpoints outside the vertex table
    return ranks.join(vstatic, "id", "semi")


def personalized_pagerank(
    db: GraphDB,
    source: int,
    iterations: int = 10,
    damping: float = 0.85,
    etype: int | None = None,
    checkpoint_every: int | None = 5,
) -> DataFrame:
    """Personalized PageRank: the reset mass returns to ``source`` instead
    of spreading uniformly — rank = (1−d)·[id = source] + d·Σ_in rank/outdeg,
    rank0 = [id = source]. The relevance-to-a-seed score behind
    recommend-from-here queries (same role as the reference's FoF
    recommendation ranking, but walk-based). Returns DF(id, rank); mass not
    absorbed by the seed's reachable set decays to ~0, so scores order the
    seed's neighborhood.

    Identical shuffle structure to :func:`pagerank` (ONE exchange per
    iteration; zero-contribution union instead of a per-iteration V-join;
    edges+degrees checkpointed once); only the reset term differs — a
    projection, not a join."""
    e = db._typed(etype).select("src", "dst")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_deg = _checkpoint(e.join(deg, "src").repartition("src"))
    vstatic = _checkpoint(db.vertices.select("id").repartition("id"))
    is_src = F.when(F.col("id") == int(source), F.lit(1.0)).otherwise(F.lit(0.0))
    ranks = vstatic.withColumn("rank", is_src)
    zeros = vstatic.select("id", F.lit(0.0).alias("c"))

    for i in range(1, iterations + 1):
        msgs = (
            edges_deg.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .unionAll(zeros)
        )
        ranks = msgs.groupBy("id").agg(
            (F.lit(1.0 - damping) * is_src + F.lit(damping) * F.sum("c")).alias("rank")
        )
        if checkpoint_every and (i % checkpoint_every == 0 or i == iterations):
            ranks = _checkpoint(ranks)
    return ranks.join(vstatic, "id", "semi")


# ---------------------------------------------------------- connected components

def connected_components_star(
    db: GraphDB,
    etype: int | None = None,
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components by alternating large-star / small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
    O(log n)-round formulation that replaces O(diameter)-round label
    propagation at scale. Produces the same result as converged min-label
    propagation: cc = min vertex id of the component. Returns DF(id, cc).

    Per round: two groupBy+join+distinct passes over the (shrinking) edge
    set; convergence when the edge multiset is stable (checked with a cheap
    count+sum aggregate on the already-checkpointed set)."""
    # build the symmetric closure from canonical (min, max) pairs: the
    # distinct then runs over half the rows undirected_edges would feed it,
    # and the swap union after it is shuffle-free
    e0 = db._typed(etype)
    canon = (
        e0.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    L = _checkpoint(canon.unionAll(canon.select(F.col("b").alias("a"), F.col("a").alias("b"))))
    prev = None
    for _ in range(max_iterations):
        # large-star: attach strictly-larger neighbors of u to m(u) = min(N(u) ∪ {u})
        m = L.groupBy("a").agg(F.min("b").alias("_mn")).select(
            "a", F.least(F.col("_mn"), F.col("a")).alias("m")
        )
        # no distinct here: duplicate (b, m) pairs are absorbed by the
        # min-aggregation in m2 and the final distinct on small — skipping
        # the dedupe drops a full shuffle of the round's largest set
        # (measured ~13% per-run win at sf0.1, identical round count)
        large = (
            L.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        # small-star input: orient so a = max endpoint
        o = large.select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        m2 = o.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            o.join(m2, "a")
            .select(F.col("b").alias("v"), F.col("m"))
            .unionAll(m2.select(F.col("a").alias("v"), F.col("m")))
            .filter(F.col("v") != F.col("m"))
            .distinct()
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        # re-symmetrize for the next large-star
        L = _checkpoint(
            small.select("a", "b").unionAll(small.select(F.col("b"), F.col("a")))
        )
        # collision-resistant fingerprint of the edge multiset: count plus a
        # sum of 64-bit hashes — a changed set that preserves count AND the
        # hash-sum is astronomically unlikely (a plain endpoint-sum is not:
        # swapping (1,4),(2,3) for (1,3),(2,4) preserves it)
        metric = L.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("s"),
        ).collect()[0]
        cur = (metric["n"], metric["s"])
        if cur == prev:
            break
        prev = cur
    # at convergence L holds symmetric star edges (v ↔ center); center = min
    stars = L.groupBy(F.col("a").alias("id")).agg(F.min("b").alias("c"))
    return (
        db.vertices.select("id")
        .join(stars, "id", "left")
        .select("id", F.least(F.coalesce(F.col("c"), F.col("id")), F.col("id")).alias("cc"))
    )


def connected_components(
    db: GraphDB,
    etype: int | None = None,
    max_iterations: int = 50,
    fixed_iterations: int | None = None,
    check_every: int = 3,
) -> DataFrame:
    """Min-label propagation over the undirected graph — reference
    ConnectedComponentsLabelProp.scala:38-85 (label init = own id; iterate
    lbl(v) = min(lbl(v), min_{u~v} lbl(u))). With ``fixed_iterations`` runs
    exactly that many rounds (deterministic partial result, used for oracle
    parity); otherwise runs to fixpoint with an early-stop changed-count check
    (the Scheduler's "no new tasks" break, GraphChiDatabase.scala:2247-2252).
    Returns DF(id, cc).

    Scale note: plain label-prop needs O(diameter) rounds, so the fixpoint
    mode delegates to :func:`connected_components_star` (O(log n) rounds,
    same converged result). The label-prop loop below is the
    ``fixed_iterations`` parity form — exactly what the reference computes
    after k rounds."""
    if fixed_iterations is None:
        return connected_components_star(db, etype, max_iterations)
    und = _checkpoint(db.undirected_edges(etype))
    labels = _checkpoint(db.vertices.select("id").withColumn("lbl", F.col("id")))
    for i in range(fixed_iterations):
        # lbl(v) ← min(lbl(v), min neighbor lbl) folded into ONE aggregation:
        # own label unions into the message set, so the round is a single
        # groupBy shuffle — no per-round state join (exchange+sort of V rows)
        nbr = und.join(
            labels.withColumnRenamed("id", "b").withColumnRenamed("lbl", "nlbl"), "b"
        ).select(F.col("a").alias("id"), F.col("nlbl").alias("lbl"))
        labels = nbr.unionAll(labels).groupBy("id").agg(F.min("lbl").alias("lbl"))
        if (i + 1) % check_every == 0:
            labels = _checkpoint(labels)
    # edge endpoints outside the vertex table act as label conduits during
    # the rounds (Pregel universe = endpoints ∪ vertices) but are dropped
    # from the output — one final semi-join, not a per-round state join
    labels = labels.join(db.vertices.select("id"), "id", "semi")
    return labels.select("id", F.col("lbl").alias("cc"))


def cc_stats(cc: DataFrame, k: int = 20) -> DataFrame:
    """Component size top-k — reference ``printStats``
    (ConnectedComponentsLabelProp.scala:66-84). Returns DF(cc, size)."""
    return (
        cc.groupBy("cc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("size"))
        .orderBy(F.desc("size"), F.asc("cc"))
        .limit(k)
    )


# ------------------------------------------------------ generic vertex program

def run_vertex_program(
    db: GraphDB,
    initial: DataFrame,
    msg_fn,
    agg_fn,
    combine_fn,
    max_iterations: int = 30,
    etype: int | None = None,
    initial_active: DataFrame | None = None,
) -> DataFrame:
    """Generic vertex-centric computation with selective scheduling — the
    reference's ``VertexCentricComputation.update`` plug-in point
    (VertexCentricComputation.scala:37-54) plus ``BitSetScheduler`` semantics
    (Scheduler.scala:31-83: only vertices whose value changed send messages
    next round; terminate when no vertex changed).

    - ``initial``: DF(id, val) starting state (val may be NULL = unset)
    - ``msg_fn(src_val) -> Column``: message each out-edge carries
    - ``agg_fn``: message combiner (F.min / F.max / F.sum / ...)
    - ``combine_fn(old_val, msg) -> Column``: vertex update rule
    - ``initial_active``: DF(id) of initially-scheduled vertices (default all)

    The active-set semi-join gates message generation exactly like the
    bitset gate in the reference's interval loop
    (GraphChiDatabase.scala:2131-2252). Each superstep is two shuffles
    (messages, update); state is checkpointed every round; one count job on
    the checkpointed state drives termination. Returns DF(id, val)."""
    e = _checkpoint(db._typed(etype).select("src", "dst"))
    state = _checkpoint(initial.select("id", "val"))
    active = (initial_active if initial_active is not None else state).select("id")
    for _ in range(max_iterations):
        src_state = state.select(F.col("id").alias("src"), F.col("val").alias("src_val"))
        msgs = (
            e.join(active.select(F.col("id").alias("src")), "src", "semi")
            .join(src_state, "src")
            .select(F.col("dst").alias("id"), msg_fn(F.col("src_val")).alias("m"))
            .groupBy("id")
            .agg(agg_fn(F.col("m")).alias("m"))
        )
        new_state = _checkpoint(
            state.join(msgs, "id", "left")
            .select("id", "val", combine_fn(F.col("val"), F.col("m")).alias("new_val"))
        )
        # one changed-set over the checkpointed state drives both the next
        # frontier and the termination probe (single extra job per superstep)
        active = new_state.filter(~F.col("new_val").eqNullSafe(F.col("val"))).select("id")
        state = new_state.select("id", F.col("new_val").alias("val"))
        if active.limit(1).count() == 0:
            break
    return state


def gather_apply(
    db: GraphDB,
    initial: DataFrame,
    gather_fn,
    sum_fn,
    apply_fn,
    iterations: int = 1,
    etype: int | None = None,
) -> DataFrame:
    """Gather-Sum-Apply — the reference's second compute abstraction
    (compute/GatherApplyComputation.scala: ``gather`` over in-edges, a
    commutative ``sum``, ``apply`` at the vertex), beside
    :func:`run_vertex_program`'s update/scheduler surface.

    - ``initial``: DF(id, val)
    - ``gather_fn(src_val) -> Column``: per-in-edge gathered value; the
      expression may also reference edge property columns (e.g.
      ``F.col("weight")``) — they are in scope at the gather join.
    - ``sum_fn``: the gather combiner (F.sum / F.min / ...)
    - ``apply_fn(old_val, acc) -> Column``: vertex update (``acc`` is NULL
      for vertices that gathered nothing).

    Each iteration is the canonical two-shuffle GAS step (gather groupBy +
    apply join) over pre-partitioned, checkpointed edges — same scale shape
    as :func:`pagerank` (which is this pattern specialized). Returns
    DF(id, val)."""
    e = _checkpoint(db._typed(etype).repartition("src"))
    state = _checkpoint(initial.select("id", "val"))
    for i in range(iterations):
        gathered = (
            e.join(state.select(F.col("id").alias("src"), F.col("val").alias("src_val")), "src")
            .select(F.col("dst").alias("id"), gather_fn(F.col("src_val")).alias("g"))
            .groupBy("id")
            .agg(sum_fn(F.col("g")).alias("acc"))
        )
        state = state.join(gathered, "id", "left").select(
            "id", apply_fn(F.col("val"), F.col("acc")).alias("val")
        )
        if (i + 1) % 3 == 0 or (i + 1) == iterations:
            state = _checkpoint(state)
    return state


def bfs_via_vertex_program(
    db: GraphDB, source: int, max_depth: int, etype: int | None = None
) -> DataFrame:
    """BFS expressed on the generic vertex program (parity demonstration of
    the reference's MultiBFS-as-computation form, MultiBFS.scala:37-157).
    Returns DF(id, level) for reached vertices."""
    init = db.vertices.select(
        "id",
        F.when(F.col("id") == int(source), F.lit(0).cast("bigint")).alias("val"),
    )
    src_only = db.spark.createDataFrame([(int(source),)], "id bigint")
    out = run_vertex_program(
        db,
        init,
        msg_fn=lambda sv: sv + F.lit(1),
        agg_fn=F.min,
        combine_fn=lambda old, m: F.least(old, m),
        max_iterations=max_depth,
        etype=etype,
        initial_active=src_only,
    )
    return out.filter(F.col("val").isNotNull()).select("id", F.col("val").alias("level"))


# ------------------------------------------------------------- label propagation

def propagate_labels(
    db: GraphDB,
    initial: DataFrame,
    iterations: int,
    etype: int | None = None,
    agg: str = "min",
    restrict_to_initial: bool = False,
) -> DataFrame:
    """Generic directed label propagation (building block mirroring the
    reference's update-function plug-in point,
    VertexCentricComputation.scala:37-54): state DF(id, lbl) evolves by
    lbl(v) ← agg(lbl(v), agg_{u→v} lbl(u)).

    For all three aggs the vertex's own label is just one more message
    (min/max absorb it; sum adds it), so each round is ONE groupBy shuffle
    over messages ∪ state — no per-round state join.

    Universe semantics: the state GROWS to message recipients — a vertex
    absent from ``initial`` that receives a label holds it and forwards it
    in later rounds (Pregel-style: the graph defines the universe). That is
    usually what seeded propagation wants (labels reach the rest of the
    graph). The OUTPUT is always restricted to the graph's vertex universe
    (one final semi-join against ``db.vertices`` ids, the same pattern as
    pagerank's universe restore above): edge endpoints outside an explicit
    vertices table act as conduits mid-run but never gain output rows.
    ``restrict_to_initial=True`` additionally semi-joins the output back to
    the initial id set."""
    agg_fn = {"min": F.min, "max": F.max, "sum": F.sum}[agg]
    e = _checkpoint(db._typed(etype).select("src", "dst"))
    init = _checkpoint(initial.select("id", "lbl"))
    labels = init
    for i in range(iterations):
        msgs = e.join(labels.withColumnRenamed("id", "src"), "src").select(
            F.col("dst").alias("id"), "lbl"
        )
        labels = msgs.unionAll(labels).groupBy("id").agg(agg_fn("lbl").alias("lbl"))
        if (i + 1) % 3 == 0:
            labels = _checkpoint(labels)
    # final (not per-iteration) universe restore, as in pagerank: with no
    # explicit vertices table db.vertices derives from edge endpoints and
    # this is a no-op; with one, phantom endpoints are dropped
    labels = labels.join(db.vertices.select("id"), "id", "semi")
    if restrict_to_initial:
        labels = labels.join(init.select("id"), "id", "semi")
    return labels


def pagerank_weighted(
    db: GraphDB,
    iterations: int = 10,
    damping: float = 0.85,
    etype: int | None = None,
    weight_col: str = "weight",
    checkpoint_every: int | None = 5,
) -> DataFrame:
    """Edge-value-weighted PageRank: rank = 0.15 + 0.85 · Σ_in rank(u) ·
    w(u→v)/W_out(u) — the GraphChi-idiomatic variant where the propagated
    mass follows the edge VALUE column, not the uniform 1/outdeg
    (Pagerank.scala:34-61 reads edge values through the same update; the
    reference's whole point is computation over property edges,
    GraphChiDatabase.scala columns). DF(id, rank).

    Identical shuffle structure to :func:`pagerank` — the weight-sum table
    replaces the out-degree table, computed once (one map-side-combined
    agg) and checkpointed with the edges; ONE exchange per iteration via
    the zero-union formulation; final semi-join restricts the universe to
    the vertex table. NULL/zero-weight edges are dropped up front (they
    carry no mass; keeping them would divide by their W_out share of 0)."""
    e = db._typed(etype).select(
        "src", "dst", F.col(weight_col).cast("double").alias("w")
    ).filter(F.col("w").isNotNull() & (F.col("w") != 0.0))
    wout = e.groupBy("src").agg(F.sum("w").alias("wout"))
    edges_w = _checkpoint(e.join(wout, "src").repartition("src"))
    vstatic = _checkpoint(db.vertices.select("id").repartition("id"))
    ranks = vstatic.withColumn("rank", F.lit(1.0))
    zeros = vstatic.select("id", F.lit(0.0).alias("c"))
    for i in range(1, iterations + 1):
        msgs = (
            edges_w.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") * F.col("w") / F.col("wout")).alias("c"),
            )
            .unionAll(zeros)
        )
        ranks = msgs.groupBy("id").agg(
            (F.lit(1.0 - damping) + F.lit(damping) * F.sum("c")).alias("rank")
        )
        if checkpoint_every and (i % checkpoint_every == 0 or i == iterations):
            ranks = _checkpoint(ranks)
    return ranks.join(vstatic, "id", "semi")


def katz_centrality(
    db: GraphDB,
    iterations: int = 5,
    alpha: float = 0.1,
    etype: int | None = None,
    checkpoint_every: int | None = 5,
) -> DataFrame:
    """Katz centrality, truncated series: after T iterations
    x(v) = Σ_{k=1..T} α^k · (#paths of length k ending at v) — attenuated
    path-count influence, the centrality that sees beyond direct in-degree
    without PageRank's degree normalization. Iteration:
    x ← α · Σ_{u→v} (x(u) + 1), x₀ = 0. DF(id, katz).

    Same one-exchange-per-iteration zero-union shape as :func:`pagerank`;
    α must be below 1/λ_max for the untruncated series to converge — with
    a truncated run any α works, the bound is only a quality note."""
    e = _checkpoint(db._typed(etype).select("src", "dst").repartition("src"))
    vstatic = _checkpoint(db.vertices.select("id").repartition("id"))
    x = vstatic.withColumn("katz", F.lit(0.0))
    zeros = vstatic.select("id", F.lit(0.0).alias("c"))
    for i in range(1, iterations + 1):
        msgs = (
            e.join(x.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), (F.col("katz") + F.lit(1.0)).alias("c"))
            .unionAll(zeros)
        )
        x = msgs.groupBy("id").agg(
            (F.lit(alpha) * F.sum("c")).alias("katz")
        )
        if checkpoint_every and (i % checkpoint_every == 0 or i == iterations):
            x = _checkpoint(x)
    return x.join(vstatic, "id", "semi")


def dag_layers(
    db: GraphDB,
    iterations: int,
    etype: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Topological layering of a DAG: layer(v) = length of the longest path
    ending at v (sources at 0) — the dependency-depth / scheduling-level
    query (Kahn's algorithm's level sets, computed by fixpoint instead of
    queue). DF(id, layer). Converges in longest-path-length rounds; run
    with ``iterations`` ≥ that bound (on the layered c→o→p→s graph, 3).
    On a graph WITH cycles the bounded run returns the capped partial
    layering (a diagnostic: any vertex still rising at the bound sits on
    or downstream of a cycle).

    Iteration shape: the pagerank zero-union pattern with max instead of
    sum — one map-side-combined exchange per round, no per-round state
    join."""
    e = _checkpoint(db._typed(etype).select("src", "dst").repartition("src"))
    vstatic = _checkpoint(db.vertices.select("id").repartition("id"))
    layers = vstatic.withColumn("layer", F.lit(0).cast("bigint"))
    for i in range(1, iterations + 1):
        msgs = (
            e.join(layers.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), (F.col("layer") + F.lit(1)).alias("layer"))
            .unionAll(layers)
        )
        layers = msgs.groupBy("id").agg(F.max("layer").alias("layer"))
        # checkpoint=False keeps the plan un-collapsed (plan audits)
        if checkpoint and (i % 5 == 0 or i == iterations):
            layers = _checkpoint(layers)
    return layers.join(vstatic, "id", "semi")


def personalized_pagerank_multi(
    db: GraphDB,
    sources,
    iterations: int = 3,
    damping: float = 0.85,
    etype: int | None = None,
    checkpoint_every: int | None = 5,
) -> DataFrame:
    """Personalized PageRank for MANY seeds at once: DF(seed, id, rank) —
    the batch-recommendation shape (score every user's neighborhood in one
    job instead of a per-user loop), the PPR analogue of multi-BFS
    (MultiBFS.scala:51). All seeds advance in ONE edge join per iteration;
    rows are (seed, vertex) pairs, parallel in both.

    Sparse state: a vertex holds a row for a seed only if it carries mass
    (reset row ∪ message recipients) — vertices outside the seed's
    reachable set never materialize, so state is Σ|reachable≤k|, not
    |seeds|·|V|. rank = (1−d)·[v=seed] + d·Σ_in rank/outdeg, rank₀ =
    [v=seed] — identical per-seed values to :func:`personalized_pagerank`
    over the reachable set."""
    e = db._typed(etype).select("src", "dst")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_deg = _checkpoint(e.join(deg, "src").repartition("src"))
    spark = db.spark
    seed_df = _checkpoint(
        spark.createDataFrame([(int(s),) for s in sources], "seed bigint")
    )
    reset = seed_df.select(
        "seed", F.col("seed").alias("id"), F.lit(1.0 - damping).alias("c")
    )
    ranks = seed_df.select("seed", F.col("seed").alias("id"), F.lit(1.0).alias("rank"))
    for i in range(1, iterations + 1):
        msgs = (
            edges_deg.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                "seed",
                F.col("dst").alias("id"),
                (F.lit(damping) * F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .unionAll(reset)
        )
        ranks = msgs.groupBy("seed", "id").agg(F.sum("c").alias("rank"))
        if checkpoint_every and (i % checkpoint_every == 0 or i == iterations):
            ranks = _checkpoint(ranks)
    return ranks
