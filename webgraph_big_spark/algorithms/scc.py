"""Strongly connected components via bounded transitive closure.

Reference: ``algo/StronglyConnectedComponents.java:225`` — a sequential
iterative Tarjan variant (inherently DFS-ordered, not data-parallel).
The Spark-native reformulation here computes the t-bounded reachability
relation by **join doubling** (reach_{2t} = reach_t ∘ reach_t, so t=2^k
needs k self-joins) and labels x with min{y : x⇝y ∧ y⇝x} — exact
whenever t ≥ the graph's diameter.

Scale notes: closure pairs are O(Σ|ball|) — fine on sparse/banded
graphs and on pruned subgraphs, quadratic on dense cores.  For web-scale
SCC the standard trick composes this with trimming (degree-0 peeling)
and the giant-SCC FW-BW split from one pivot; ``trim`` implements the
peeling.  The reference's "buckets" (terminal non-dangling components,
``StronglyConnectedComponents``) derive from the same labels + the
quotient DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from webgraph_big_spark.graph import Graph, co_partitioned


def bounded_closure(g: Graph, t: int) -> DataFrame:
    """(x, y) pairs with a directed path x⇝y of length ≤ t (incl. x=x),
    by join doubling — ceil(log2 t) shuffle rounds."""
    edges = g.edges.select("src", "dst").distinct()
    reach = (
        g.nodes()
        .select(F.col("id").alias("x"), F.col("id").alias("y"))
        .union(edges.select(F.col("src").alias("x"), F.col("dst").alias("y")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    span = 1
    while span < t:
        nxt = (
            reach.alias("a")
            .join(reach.alias("b"), F.col("a.y") == F.col("b.x"))
            .select(F.col("a.x").alias("x"), F.col("b.y").alias("y"))
            .union(reach)
            .distinct()
            .localCheckpoint(eager=True)
        )
        reach = nxt
        span *= 2
    return reach


def strongly_connected_components(g: Graph, t: int = 32) -> DataFrame:
    """(id, comp): comp = min id in the SCC; exact when t ≥ diameter."""
    reach = bounded_closure(g, t)
    back = reach.select(F.col("y").alias("x"), F.col("x").alias("y"))
    mutual = reach.intersect(back)
    return mutual.groupBy(F.col("x").alias("id")).agg(F.min("y").alias("comp"))


# ---------------------------------------------------------------------------
# FW-BW + coloring: the linear-state scale path
# ---------------------------------------------------------------------------


def _reach(edges: DataFrame, seeds: DataFrame, forward: bool = True) -> DataFrame:
    """Frontier-loop reachability: ids reachable from ``seeds(id)`` along
    ``edges`` (or against them when ``forward=False``).  O(diameter)
    rounds, O(|reached|) state — never materializes pairs."""
    s, d = ("src", "dst") if forward else ("dst", "src")
    # pin the edge table hash-partitioned by the expansion key for the
    # loop's lifetime: per round only the frontier moves
    pinned = co_partitioned(edges, s)
    visited = seeds.select("id").distinct().localCheckpoint(eager=True)
    frontier = visited
    try:
        while True:
            nxt = (
                pinned.join(
                    frontier.withColumnRenamed("id", s).hint("shuffle_hash"), s
                )
                .select(F.col(d).alias("id"))
                .distinct()
                .join(visited, "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                return visited
            visited = visited.union(nxt).localCheckpoint(eager=True)
            frontier = nxt
    finally:
        pinned.unpersist()


def _peel_trivial(edges: DataFrame, nodes: DataFrame, max_rounds: int = 64):
    """Iteratively peel nodes with in- or out-degree 0 inside the current
    node set — each is a singleton SCC.  Returns (remaining_edges,
    remaining_nodes, peeled_nodes)."""
    spark = edges.sparkSession
    peeled = spark.createDataFrame([], "id long")
    for _ in range(max_rounds):
        srcs = edges.select(F.col("src").alias("id")).distinct()
        dsts = edges.select(F.col("dst").alias("id")).distinct()
        core = srcs.join(dsts, "id").localCheckpoint(eager=True)
        gone = nodes.join(core, "id", "left_anti").localCheckpoint(eager=True)
        if gone.isEmpty():
            break
        peeled = peeled.union(gone).localCheckpoint(eager=True)
        nodes = core
        edges = (
            edges.join(core.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(core.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    return edges, nodes, peeled


def strongly_connected_components_fwbw(
    g: Graph, max_outer: int = 64, giant_pivots: int = 1, progress=None
) -> DataFrame:
    """(id, comp) with comp = min id of the SCC — the linear-state scale
    path (vs :func:`strongly_connected_components`'s pair-materializing
    closure, which is quadratic on graphs with a large SCC).

    Hybrid of the standard parallel SCC recipe (Slota et al. / Orzan;
    the reference's own SCC, ``algo/StronglyConnectedComponents.java:225``,
    is sequential Tarjan and has no parallel analogue):

    1. **trim** — peel in/out-degree-0 nodes iteratively (singleton SCCs);
    2. **FW-BW pivot** — forward ∩ backward reachability from the minimum
       remaining node captures the (giant) SCC containing it in
       O(diameter of that SCC) frontier rounds, O(n) state;
    3. **coloring** — for the remainder: propagate ``color = max id``
       forward to fixpoint; backward-reach from each color root *within
       its color class* yields every root's SCC simultaneously; assign,
       remove, repeat.  Many SCCs resolve per outer round.

    All phases are frontier loops: state never exceeds O(n) rows.

    The loop runs until every node is assigned (each coloring round
    resolves at least the color roots' SCCs, so outer rounds are bounded
    by #SCCs — pathological on a chain of cycles with ids decreasing
    along it).  ``max_outer`` is a safety bound: exceeding it RAISES
    rather than returning a silent partial labelling.

    ``progress`` (optional callable str → None) receives one line per
    phase transition — long-running full-graph runs are otherwise opaque
    from outside the Spark UI.
    """
    say = progress or (lambda msg: None)
    spark = g.edges.sparkSession
    edges = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    nodes = g.nodes()
    done = spark.createDataFrame([], "id long, comp long")
    edges = edges.localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)

    outer = -1
    while True:
        outer += 1
        say(f"outer {outer}: peeling")
        edges, nodes, peeled = _peel_trivial(edges, nodes)
        if not peeled.isEmpty():
            done = done.union(peeled.select("id", F.col("id").alias("comp")))
        if nodes.isEmpty():
            break
        if outer >= max_outer:
            raise RuntimeError(
                f"FW-BW SCC: {nodes.count()} nodes unassigned after "
                f"max_outer={max_outer} outer rounds — raise max_outer "
                "(bounded by the number of SCCs in the worst case)"
            )

        if outer < giant_pivots:
            # FW-BW from the deterministic pivot (min id) — catches the
            # giant SCC in O(diam) rounds without touching the rest.
            pivot = nodes.agg(F.min("id")).first()[0]
            say(f"outer {outer}: FW-BW pivot {pivot}")
            seed = spark.createDataFrame([(int(pivot),)], "id long")
            fw = _reach(edges, seed, forward=True)
            bw = _reach(edges, seed, forward=False)
            scc = fw.join(bw, "id").localCheckpoint(eager=True)
            comp = scc.agg(F.min("id")).first()[0]
            done = done.union(scc.select("id", F.lit(int(comp)).alias("comp")))
            nodes = nodes.join(scc, "id", "left_anti").localCheckpoint(eager=True)
            edges = (
                edges.join(scc.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(scc.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .localCheckpoint(eager=True)
            )
            continue

        # coloring phase: forward max-propagation to fixpoint — edges
        # pinned by the round's join key so only color rows move
        say(f"outer {outer}: coloring")
        fwd = co_partitioned(edges, "src")
        color = nodes.select("id", F.col("id").alias("color")).localCheckpoint(eager=True)
        while True:
            msgs = (
                fwd.join(
                    color.select(F.col("id").alias("src"), "color").hint(
                        "shuffle_hash"
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max("color").alias("mx"))
            )
            new_color = (
                color.join(msgs, "id", "left")
                .select("id", F.greatest("color", F.coalesce("mx", "color")).alias("color"))
                .localCheckpoint(eager=True)
            )
            n_changed = (
                new_color.join(color.withColumnRenamed("color", "old"), "id")
                .filter(F.col("color") != F.col("old"))
                .count()
            )
            color = new_color
            if n_changed == 0:
                break
        fwd.unpersist()
        # multi-source backward reach from every color root, within class
        bwd = co_partitioned(edges, "dst")
        roots = color.filter(F.col("id") == F.col("color")).select("id", "color")
        member = roots.localCheckpoint(eager=True)
        frontier = member
        while True:
            nxt = (
                bwd.join(
                    frontier.select(F.col("id").alias("dst"), "color").hint(
                        "shuffle_hash"
                    ),
                    "dst",
                )
                .select(F.col("src").alias("id"), "color")
                .distinct()
                .join(color.withColumnRenamed("color", "c2"), "id")
                .filter(F.col("color") == F.col("c2"))
                .select("id", "color")
                .join(member.select("id"), "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            member = member.union(nxt).localCheckpoint(eager=True)
            frontier = nxt
        bwd.unpersist()
        # comp label = min id within each discovered SCC (root's class)
        say(f"outer {outer}: assigning color-root SCCs")
        comp_of = member.groupBy("color").agg(F.min("id").alias("comp"))
        assigned = member.join(comp_of, "color").select("id", "comp").localCheckpoint(eager=True)
        done = done.union(assigned)
        nodes = nodes.join(assigned.select("id"), "id", "left_anti").localCheckpoint(eager=True)
        edges = (
            edges.join(assigned.select(F.col("id").alias("src")), "src", "left_anti")
            .join(assigned.select(F.col("id").alias("dst")), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nodes.isEmpty():
            break
    return done


def scc_buckets(g: Graph, components: DataFrame) -> DataFrame:
    """(comp): the *buckets* — terminal non-dangling components, i.e.
    components of the quotient DAG with no arc to a different component
    whose members have at least one outgoing arc (the reference's buckets
    output, ``algo/StronglyConnectedComponents.java`` ``buckets`` bit
    vector: nodes belonging to a bucket = terminal nonterminal-free SCC).
    """
    e = g.edges.select("src", "dst")
    cmap_s = components.select(F.col("id").alias("src"), F.col("comp").alias("c_src"))
    cmap_d = components.select(F.col("id").alias("dst"), F.col("comp").alias("c_dst"))
    arcs = e.join(cmap_s, "src").join(cmap_d, "dst")
    # components with an outgoing inter-component arc are NOT terminal
    outward = (
        arcs.filter(F.col("c_src") != F.col("c_dst"))
        .select(F.col("c_src").alias("comp"))
        .distinct()
    )
    # dangling components: no member has any outgoing arc at all
    has_out = arcs.select(F.col("c_src").alias("comp")).distinct()
    return (
        has_out.join(outward, "comp", "left_anti")
        .select("comp")
    )


def trim(g: Graph, rounds: int = 3) -> Graph:
    """Iteratively peel nodes with in- or out-degree 0 — they are
    singleton SCCs; the standard preprocessing that shrinks real graphs
    drastically before closure/FW-BW."""
    edges = g.edges.select("src", "dst")
    for _ in range(rounds):
        srcs = edges.select(F.col("src").alias("id")).distinct()
        dsts = edges.select(F.col("dst").alias("id")).distinct()
        core = srcs.join(dsts, "id", "inner")
        edges = (
            edges.join(core.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(core.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )
    return Graph(edges, dense=False)
