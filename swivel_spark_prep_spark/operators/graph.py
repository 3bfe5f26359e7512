"""Distributed graph analytics over edge relations: PageRank, triangle
census, k-core decomposition.

PageRank (Page et al. 1999, public) is the canonical link-quality
signal of web-scale corpus curation — Common-Crawl-style pipelines use
it (or a harmonic-centrality cousin) to rank domains before sampling.
The input is the plain relational form a 100 TB pipeline already has:
an edge DataFrame ``(src, dst)``.

Scale design (the join-based formulation, not a graph library):

- Each iteration is exactly two shuffles: ``edges ⋈ ranks`` hashed on
  ``src``, then ``groupBy(dst)`` for the incoming mass. The edge
  relation is augmented with out-degrees ONCE and persisted — the
  per-iteration work never re-derives degrees.
- Dangling nodes (no out-edges) are handled by the standard uniform
  redistribution: their total rank is a 1-row aggregate per iteration,
  broadcast back via ``crossJoin`` — no driver materialization beyond
  that single double.
- The iteration count is a fixed small constant supplied by the caller
  (power iteration converges geometrically at rate ``damping``); each
  iteration's ranks are eagerly localCheckpoint-ed, which materializes
  the step AND truncates the logical plan — the rank relation feeds the
  next iteration twice (dangling mass + contributions), so an uncut
  plan tree doubles per iteration and kills the optimizer itself.
- Determinism: all arithmetic is double-precision sums of
  ``rank/outdeg`` terms; result magnitudes are Θ(1/N), so rounding at
  8 decimals in callers is stable across summation orders.

Connected components / fuzzy-dedup clustering live in
``operators/dedup.py`` (large-star/small-star); this module holds the
weighted/iterative algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swivel_spark_prep_spark.cache import checkpoint_truncate, track_persist


def degree_stats(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Per-node (out_degree, in_degree) from one union + one aggregate.

    NULL endpoints are dropped (an edge with an unknown endpoint is not
    an edge). Output: (node, out_degree, in_degree)."""
    e = edges.filter(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())
    sides = e.select(
        F.col(src_col).alias("node"), F.lit(1).alias("o"), F.lit(0).alias("i")
    ).unionAll(
        e.select(F.col(dst_col).alias("node"), F.lit(0).alias("o"), F.lit(1).alias("i"))
    )
    return sides.groupBy("node").agg(
        F.sum("o").alias("out_degree"), F.sum("i").alias("in_degree")
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    dedup_edges: bool = True,
    seeds: list | None = None,
) -> DataFrame:
    """Power-iteration PageRank over an edge relation — uniform or
    PERSONALIZED (Haveliwala 2002): with ``seeds``, the teleport (and
    dangling-mass) distribution concentrates on the seed nodes instead
    of being uniform, so ranks measure proximity TO THE SEED SET — the
    similarity/recommendation reading of PageRank.

    Returns (node, pagerank) for every node appearing as a source or
    destination. ``dedup_edges=True`` (default) collapses multi-edges
    first, matching the unweighted formulation; pass False to let
    repeated edges act as weights.

    Update rule per iteration (teleport distribution t: uniform 1/N, or
    1/|seeds| on seeds and 0 elsewhere)::

        r'(v) = (1-d)·t(v) + d * ( Σ_{u→v} r(u)/outdeg(u)  +  D·t(v) )

    where ``D`` is the total rank mass on dangling nodes. Mass is
    conserved: Σ r'(v) = 1 at every step. ``seeds`` is a bounded
    personalization set (node ids, cast to string) folded in as a
    broadcast literal membership; every seed must exist in the graph —
    an absent seed's teleport share would leak mass.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    e = edges.select(
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if dedup_edges:
        e = e.distinct()

    # out-degrees joined into the edge relation ONCE, pre-partitioned on
    # src and persisted: the cached relation keeps its hash partitioning,
    # so the per-iteration edges ⋈ ranks join re-shuffles only the small
    # rank side, never the edges.
    outdeg = e.groupBy("src").agg(F.count("*").cast("double").alias("outdeg"))
    ew = track_persist(e.join(outdeg, "src").repartition("src"))

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = track_persist(nodes)
    n_nodes = float(nodes.count())  # bounded: one long on the driver
    if n_nodes == 0:
        raise ValueError("edge relation is empty (no non-NULL edges)")

    # nodes annotated with "has out-edges" once — the dangling-mass
    # aggregate per iteration is a filter + sum, not a join.
    node_flags = nodes.join(
        outdeg.select(F.col("src").alias("node"), F.lit(True).alias("__has_out")),
        "node",
        "left",
    )
    if seeds is not None:
        seed_set = sorted({str(x) for x in seeds})
        if not seed_set:
            raise ValueError("seeds must be non-empty when given")
        # validate membership NOW (bounded count): an absent seed would
        # silently leak its teleport share — all-absent returns all-zero
        # ranks with no error otherwise
        n_found = nodes.filter(F.col("node").isin(seed_set)).count()
        if n_found != len(seed_set):
            raise ValueError(
                f"{len(seed_set) - n_found} seed(s) not present in the graph"
            )
        tele = F.when(
            F.col("node").isin(seed_set), F.lit(1.0 / len(seed_set))
        ).otherwise(F.lit(0.0))
    else:
        tele = F.lit(1.0 / n_nodes)
    node_flags = node_flags.select("node", "__has_out", tele.alias("__t"))
    node_flags = track_persist(node_flags)

    ranks = node_flags.select("node", "__has_out", F.col("__t").alias("rank"))

    for _ in range(iterations):
        dangling = ranks.filter(F.col("__has_out").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        contrib = (
            ew.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("__mass"))
        )
        new_ranks = (
            node_flags.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "__has_out",
                (
                    F.lit(1.0 - damping) * F.col("__t")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__mass"), F.lit(0.0))
                        + F.col("__dm") * F.col("__t")
                    )
                ).alias("rank"),
            )
        )
        # checkpoint_truncate BOTH materializes the iteration and
        # truncates the logical plan — ranks feeds the next iteration
        # twice (dangling + contrib), so without the cut the plan tree
        # doubles per iteration and the optimizer itself OOMs long
        # before the data does. On a multi-executor cluster swap for
        # reliable checkpoint() if executor loss must be survivable.
        # (checkpoint_truncate additionally resets inherited size stats:
        # ranks feeds two joins per round, so the estimate would square
        # per iteration and hang Catalyst in BigInteger arithmetic at
        # high iteration counts — see cache.checkpoint_truncate)
        ranks = checkpoint_truncate(new_ranks)

    return ranks.select("node", F.col("rank").alias("pagerank"))


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 5,
    damping: float = 0.85,
    round_to: int = 8,
    seeds: list | None = None,
) -> str:
    """DuckDB twin of :func:`pagerank`: the identical update rule
    unrolled into one CTE chain per iteration, generated from the same
    (iterations, damping) parameters — parity pins the algorithm, not a
    fixture by-product. ``edges_sql`` must yield (src, dst), already
    deduplicated if the engine side deduplicates."""
    d = damping
    parts = [
        f"WITH edges AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "meta AS (SELECT (SELECT COUNT(*) FROM nodes)::DOUBLE AS nn)",
        "outdeg AS (SELECT src, COUNT(*)::DOUBLE AS od FROM edges GROUP BY 1)",
    ]
    if seeds is not None:
        # dedupe before sizing the teleport mass — pagerank() normalizes
        # by the DISTINCT seed count, so a duplicated seed list must not
        # make the oracle's teleport distribution sum past 1
        seed_set = sorted({str(x) for x in seeds})
        lits = ", ".join("'" + s.replace("'", "''") + "'" for s in seed_set)
        parts.append(
            f"tele AS (SELECT node, CASE WHEN node IN ({lits}) "
            f"THEN 1.0/{len(seed_set)} ELSE 0.0 END AS t FROM nodes)"
        )
    else:
        parts.append(
            "tele AS (SELECT node, 1.0/(SELECT nn FROM meta) AS t FROM nodes)"
        )
    parts.append("r0 AS (SELECT node, t AS rank FROM tele)")
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(r.rank), 0) AS dm FROM r{p} r "
            f"LEFT JOIN outdeg o ON r.node = o.src WHERE o.src IS NULL)"
        )
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, SUM(r.rank / o.od) AS mass "
            f"FROM edges e JOIN r{p} r ON e.src = r.node "
            f"JOIN outdeg o ON o.src = e.src GROUP BY 1)"
        )
        parts.append(
            f"r{i} AS (SELECT n.node, (1 - {d}) * n.t "
            f"+ {d} * (COALESCE(c.mass, 0) + (SELECT dm FROM d{i}) * n.t) AS rank "
            f"FROM tele n LEFT JOIN c{i} c ON n.node = c.node)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, ROUND(rank, {round_to}) AS pagerank "
        f"FROM r{iterations} ORDER BY node;"
    )


def canonical_edges(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Undirected canonical form: self-loops and NULL endpoints dropped,
    endpoints sorted (``u < v``), duplicates collapsed. Output (u, v)."""
    e = edges.filter(
        F.col(src_col).isNotNull()
        & F.col(dst_col).isNotNull()
        & (F.col(src_col) != F.col(dst_col))
    )
    return e.select(
        F.least(src_col, dst_col).alias("u"),
        F.greatest(src_col, dst_col).alias("v"),
    ).distinct()


def triangle_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Global triangle census of the undirected graph: one row with
    ``n_nodes, n_edges, n_wedges`` (open two-paths Σ C(deg,2)),
    ``n_triangles``, and the global (transitivity) clustering
    coefficient ``3·T / wedges``.

    Scale design — the degree-ordered orientation (Cohen 2009, "Graph
    twiddling in a MapReduce world"; also Suri & Vassilvitskii 2011):
    orient every canonical edge from its (degree, node)-smaller endpoint
    to the larger. Every node's OUT-degree in the oriented graph is
    O(√m), so the wedge relation built by the self-join on the oriented
    source is O(m^1.5) worst-case instead of Σ C(deg,2) — on a
    power-law web graph the difference between feasible and not. Each
    triangle {a,b,c} appears exactly once as a→b, a→c, b→c (the
    orientation is acyclic and total). Plan: two hash joins + one
    aggregate; degrees are one groupBy; no BNLJ anywhere.
    """
    ce = track_persist(canonical_edges(edges, src_col, dst_col))
    deg = ce.select(F.col("u").alias("n")).unionAll(
        ce.select(F.col("v").alias("n"))
    ).groupBy("n").agg(F.count("*").alias("d"))
    deg = track_persist(deg)

    # orient by (degree, node): src is the smaller endpoint under the
    # total order — broadcast is wrong here (deg is node-cardinality),
    # both joins hash-shuffle on the node key
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    oriented = (
        ce.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
    )
    oriented = track_persist(oriented)

    # wedges anchored at the oriented source; the t1 < t2 guard keeps
    # each unordered out-pair once (out-neighborhoods are O(√m))
    w1 = oriented.select(F.col("s").alias("a"), F.col("t").alias("t1"))
    w2 = oriented.select(F.col("s").alias("a"), F.col("t").alias("t2"))
    wedges = w1.join(w2, "a").filter(F.col("t1") < F.col("t2"))
    closing = oriented.select(
        F.least("s", "t").alias("t1"), F.greatest("s", "t").alias("t2")
    )
    tri = wedges.join(closing, ["t1", "t2"]).agg(
        F.count("*").alias("n_triangles")
    )

    stats = deg.agg(
        F.count("*").alias("n_nodes"),
        (F.sum("d") / 2).cast("long").alias("n_edges"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
    )
    return stats.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("transitivity"),
    )


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 30,
) -> DataFrame:
    """Nodes of the k-core — the maximal subgraph where every node has
    degree ≥ k (Seidman 1983) — by iterative peeling: drop nodes of
    degree < k, drop edges touching them, repeat to fixpoint. Output
    (node, core_degree) with the node's degree INSIDE the core.

    Each round is one degree aggregate + one semi-join pass over the
    surviving edges; the edge relation shrinks monotonically and is
    localCheckpoint-ed per round to cut lineage (the iterative-plan
    discipline pagerank established). Peeling converges in at most
    O(peel depth) rounds — ``max_iterations`` is the runaway bound and
    a non-converged exit raises rather than returning a non-core.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    ce = checkpoint_truncate(canonical_edges(edges, src_col, dst_col))
    for _ in range(max_iterations):
        deg = (
            ce.select(F.col("u").alias("n"))
            .unionAll(ce.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
        )
        weak = deg.filter(F.col("d") < k).select("n")
        n_weak = weak.count()  # bounded: one long per round
        if n_weak == 0:
            return (
                ce.select(F.col("u").alias("node"))
                .unionAll(ce.select(F.col("v").alias("node")))
                .groupBy("node")
                .agg(F.count("*").cast("long").alias("core_degree"))
            )
        ce = (
            ce.join(weak.withColumnRenamed("n", "u"), "u", "left_anti")
            .join(weak.withColumnRenamed("n", "v"), "v", "left_anti")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        if ce.isEmpty():
            return ce.sparkSession.createDataFrame([], "node string, core_degree long")
    raise RuntimeError(f"k_core did not converge in {max_iterations} rounds")


def k_core_oracle_sql(edges_sql: str, k: int, rounds: int) -> str:
    """DuckDB twin of :func:`k_core` with the peel UNROLLED ``rounds``
    times (the pagerank_oracle_sql idiom: a fixed-depth CTE chain
    replaying the exact update rule — parity additionally proves the
    Spark side reached its fixpoint within ``rounds``). ``edges_sql``
    must yield columns (src, dst)."""
    # MATERIALIZED per round: without it DuckDB re-expands each CTE at
    # every reference and the unrolled chain grows exponentially (the
    # first run exhausted the process fd limit re-opening the parquet)
    sql = f"""WITH e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM ({edges_sql}) WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst)"""
    prev = "e0"
    for i in range(1, rounds + 1):
        sql += f""",
d{i} AS MATERIALIZED (SELECT n, COUNT(*) AS d FROM (
    SELECT u AS n FROM {prev} UNION ALL SELECT v AS n FROM {prev}) GROUP BY 1),
w{i} AS (SELECT n FROM d{i} WHERE d < {k}),
e{i} AS MATERIALIZED (SELECT u, v FROM {prev}
  WHERE u NOT IN (SELECT n FROM w{i}) AND v NOT IN (SELECT n FROM w{i}))"""
        prev = f"e{i}"
    sql += f"""
SELECT node, COUNT(*)::BIGINT AS core_degree FROM (
  SELECT u AS node FROM {prev} UNION ALL SELECT v AS node FROM {prev})
GROUP BY 1 ORDER BY 1;"""
    return sql


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Semi-supervised label propagation (Raghavan et al. 2007, the
    synchronous clamped-seed variant): spread ``seeds`` (node, label)
    over the UNDIRECTED graph for a fixed number of rounds. Each round,
    every non-seed node takes the most frequent label among its labeled
    neighbors — ties break to the SMALLEST label (the determinism the
    asynchronous textbook variant lacks); seed nodes stay clamped to
    their given label; nodes with no labeled neighbor stay unlabeled.

    Per round: one hash join (edges ⋈ labels on the neighbor end) and
    two bounded aggregates — (node, label) counts, then max-count /
    min-label winner selection. The symmetrized edge relation is
    persisted once, pre-partitioned on the join key, so each round
    re-shuffles only the label frontier (≤ #nodes rows), never the
    edges — the pagerank shuffle discipline. Per-round eager
    localCheckpoint cuts the doubling plan lineage exactly as pagerank
    does; the fixed round count is the caller's convergence budget (the
    oracle unrolls the identical rounds, so parity also proves the
    update rule, not just the fixpoint).

    Returns (node, label) for every node labeled after ``rounds``.
    Duplicate seed nodes must agree (conflicting labels for one node
    raise); seed nodes need not appear in the edge relation.
    """
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    e = edges.select(
        F.col(src_col).cast("string").alias("u"),
        F.col(dst_col).cast("string").alias("v"),
    ).filter(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
    sym = track_persist(
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .repartition("u")
    )
    s = seeds.select(
        F.col(node_col).cast("string").alias("node"),
        F.col(label_col).cast("string").alias("lbl"),
    ).filter(F.col("node").isNotNull() & F.col("lbl").isNotNull()).distinct()
    s = track_persist(s)
    # bounded control check: one count — a node with two seed labels has
    # no well-defined clamp and would silently flap between rounds
    if s.groupBy("node").count().filter(F.col("count") > 1).limit(1).count() > 0:
        raise ValueError("conflicting seed labels for at least one node")

    labels = s
    for _ in range(rounds):
        cnts = (
            sym.join(labels.select(F.col("node").alias("u"), "lbl"), "u")
            .groupBy(F.col("v").alias("node"), "lbl")
            .agg(F.count("*").alias("c"))
        )
        # winner per node: max count, tie -> smallest label. min_by over
        # the (−count, label) struct is one aggregate and replays in SQL
        # as the max-count + min-label two-step (pinned equivalent).
        winners = cnts.groupBy("node").agg(
            F.min_by("lbl", F.struct((-F.col("c")).alias("nc"), F.col("lbl"))).alias(
                "lbl"
            )
        )
        new_labels = s.unionByName(
            winners.join(s.select("node"), "node", "left_anti")
        )
        labels = checkpoint_truncate(new_labels)
    return labels.select("node", F.col("lbl").alias(label_col))


def label_propagation_oracle_sql(
    edges_sql: str, seeds_sql: str, rounds: int
) -> str:
    """DuckDB twin of :func:`label_propagation` with the rounds
    UNROLLED (the pagerank_oracle_sql idiom). ``edges_sql`` yields
    (src, dst); ``seeds_sql`` yields (node, label). The min_by-over-
    (−count, label) winner is replayed as QUALIFY row_number ordered by
    count DESC, label ASC — the same total order."""
    sql = f"""WITH eraw AS (SELECT src::VARCHAR AS u, dst::VARCHAR AS v FROM ({edges_sql})
  WHERE src IS NOT NULL AND dst IS NOT NULL AND src::VARCHAR <> dst::VARCHAR),
sym AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (SELECT u, v FROM eraw UNION ALL SELECT v, u FROM eraw)),
seeds AS MATERIALIZED (
  SELECT DISTINCT node::VARCHAR AS node, label::VARCHAR AS lbl FROM ({seeds_sql})
  WHERE node IS NOT NULL AND label IS NOT NULL),
l0 AS (SELECT node, lbl FROM seeds)"""
    prev = "l0"
    for i in range(1, rounds + 1):
        sql += f""",
c{i} AS MATERIALIZED (
  SELECT s.v AS node, l.lbl, COUNT(*) AS c
  FROM sym s JOIN {prev} l ON s.u = l.node GROUP BY 1, 2),
w{i} AS (SELECT node, lbl FROM c{i}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) = 1),
l{i} AS MATERIALIZED (
  SELECT node, lbl FROM seeds
  UNION ALL
  SELECT node, lbl FROM w{i} WHERE node NOT IN (SELECT node FROM seeds))"""
        prev = f"l{i}"
    sql += f"""
SELECT node, lbl AS label FROM {prev} ORDER BY node;"""
    return sql
