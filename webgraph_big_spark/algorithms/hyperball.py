"""Neighbourhood function: exact (small graphs) and HyperBall
(HyperLogLog registers, the scale path), plus HLL-derived centralities.

Reference: ``algo/HyperBall.java:217`` — per-node HLL counters of
ball(x, t); iteration t does a register-wise max-merge over successors'
counters (``algo/HyperBall.java:812``), in *systolic* mode only nodes
with a changed successor counter recompute (``algo/HyperBall.java:124-135``),
and the per-node ball-size deltas accumulate into the neighbourhood
function and the geometric centralities (``algo/HyperBall.java:245``:
harmonic / closeness / Lin / reachable).

Spark design (production path — 100% JVM in the hot loop):

- state(id, r0..r63: int, est: double): the 2^b registers are COLUMNS,
  not a packed blob, so the per-round merge is 64 built-in ``F.max``
  aggregates.  That buys the two properties a packed-binary +
  ``collect_list`` + Arrow-UDF merge cannot have:
  * **map-side combine** — a 10⁸-in-degree hub receives one partial row
    per upstream task, never 10⁸ rows in one group (no OOM, no salting);
  * **zero Python** — merge, changed-detection, and the HLL estimator
    (Σ 2^-r, zero count, small-range correction) are all codegen'd
    column expressions.
- messages flow only from nodes whose counter changed last round
  (systolic); termination is ``changed = ∅`` (the natural fixpoint).
- NF / centrality updates are *incremental*: only touched nodes
  contribute (est − old_est) deltas each round.

The register hash is the engine-portable md5-prefix hash
(``functions.stable_long_hash``), so the full register state after t
rounds is bit-reproducible in ANSI SQL — the driver gate compares the
merged registers themselves (integers, no float tolerance), and the
unrolled DuckDB oracle below is a 1:1 mirror of the Spark plan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from webgraph_big_spark.functions import stable_long_hash
from webgraph_big_spark.graph import Graph


def neighbourhood_function_exact(g: Graph, t_max: int) -> DataFrame:
    """(t, nf): #ordered pairs (x,y) with directed dist(x,y) ≤ t, incl.
    x=y, for t = 0..t_max — the exact function HyperBall approximates."""
    spark = g.edges.sparkSession
    edges = g.edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    reach = (
        g.nodes()
        .select(F.col("id").alias("x"), F.col("id").alias("y"))
        .localCheckpoint(eager=True)
    )
    counts = [(0, reach.count())]
    for t in range(1, t_max + 1):
        expanded = (
            reach.join(edges, reach.y == edges.src)
            .select("x", F.col("dst").alias("y"))
            .union(reach)
            .distinct()
            .localCheckpoint(eager=True)
        )
        counts.append((t, expanded.count()))
        reach = expanded
    return spark.createDataFrame(counts, "t long, nf long")


# ---------------------------------------------------------------------------
# HyperBall (approximate, HLL registers)
# ---------------------------------------------------------------------------

LOG2M = 6
P = 1 << LOG2M  # registers → rel. std dev ≈ 1.04/sqrt(64) ≈ 13%
_ALPHA_64 = 0.709  # HLL bias constant for m=64
HASH_BITS = 48  # md5-prefix hash width (functions.stable_long_hash)
W_BITS = HASH_BITS - LOG2M  # 42 pattern bits → rho ∈ [1, 43]

_RCOLS = [f"r{k}" for k in range(P)]


def init_register_cols():
    """(j, rho) Columns for a node id — pure JVM expressions, mirrored
    exactly by :func:`register_init_sql` for the DuckDB oracle.

    h = 48-bit md5-prefix hash of the *decimal string* of the id;
    j = h & (P-1);  w = h >> log2m;  rho = (W_BITS - bitlen(w)) + 1
    (bitlen via the binary-string length — exact, no float log)."""
    h = stable_long_hash(F.col("id").cast("string"), bits=HASH_BITS)
    j = h.bitwiseAND(F.lit(P - 1))
    w = F.shiftrightunsigned(h, LOG2M)
    rho = F.when(w == 0, F.lit(W_BITS + 1)).otherwise(
        F.lit(W_BITS) - F.length(F.bin(w)) + 1
    )
    return j.alias("j"), rho.cast("int").alias("rho")


# NB: all multi-register expressions below are built as SQL STRINGS and
# evaluated with one selectExpr/F.expr call.  Building 64-column trees
# through the Column API costs one py4j round-trip per operator (~5 ms
# each ⇒ seconds of pure driver overhead per loop round); a string is
# ONE call and parses JVM-side.

_LN2 = math.log(2.0)
_ZSUM = " + ".join(f"exp({-_LN2} * r{k})" for k in range(P))
_ZEROS = " + ".join(f"(CASE WHEN r{k} = 0 THEN 1 ELSE 0 END)" for k in range(P))
_EST_EXPR = (
    f"CASE WHEN ({_ALPHA_64 * P * P} / _z) <= {2.5 * P} AND _zeros > 0 "
    f"THEN {float(P)} * ln({float(P)} / CAST(_zeros AS DOUBLE)) "
    f"ELSE ({_ALPHA_64 * P * P} / _z) END"
)


def _with_est(df: DataFrame) -> DataFrame:
    """Append the HLL estimate column (α·m²/Σ2^-r with small-range
    correction) — pure codegen'd SQL expressions."""
    keep = [c for c in df.columns]
    return df.selectExpr(
        *keep, f"({_ZSUM}) AS _z", f"({_ZEROS}) AS _zeros"
    ).selectExpr(*keep, f"{_EST_EXPR} AS est")


def _init_state(g: Graph) -> DataFrame:
    """state(id, r0..r63): each node's counter containing just {id}."""
    jrho = g.nodes().select("id", *init_register_cols())
    return jrho.selectExpr(
        "id", *[f"CASE WHEN j = {k} THEN rho ELSE 0 END AS r{k}" for k in range(P)]
    )


def _hyperball_loop(g: Graph, t_max: int | None, on_round):
    """Shared systolic driver.  ``on_round(t, state, touched,
    new_changed)`` is called after each merge; the loop ends when no
    counter changed or t_max is hit.  Everything here is built-in
    column expressions — max-merge with map-side combine, greatest()
    against the old state, 64-way inequality for change detection."""
    edges = g.edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    state = _with_est(_init_state(g)).localCheckpoint(eager=True)
    changed = state.select("id")  # round 0: everything is new
    t = 0
    # changed ⇔ some incoming max exceeds the old register
    chg_expr = " OR ".join(f"coalesce(m{k}, 0) > o{k}" for k in range(P))
    merged_exprs = [
        f"greatest(o{k}, coalesce(m{k}, 0)) AS r{k}" for k in range(P)
    ]
    while t_max is None or t < t_max:
        t += 1
        # systolic: only counters that changed last round are propagated;
        # regs travel dst→src (x absorbs its successors' balls).  The
        # groupBy-max gets partial aggregation: hub fan-in collapses
        # map-side, one partial row per task reaches the reducer.
        msgs = (
            edges.join(changed.withColumnRenamed("id", "dst"), "dst")
            .join(
                state.selectExpr("id AS dst", *_RCOLS),
                "dst",
            )
            .selectExpr("src AS id", *_RCOLS)
        )
        gathered = msgs.groupBy("id").agg(
            *[F.expr(f"max(r{k})").alias(f"m{k}") for k in range(P)]
        )
        old_named = state.selectExpr(
            "id", *[f"r{k} AS o{k}" for k in range(P)], "est AS old_est"
        )
        touched = gathered.join(old_named, "id").selectExpr(
            "id", *merged_exprs, "old_est", f"({chg_expr}) AS _chg"
        )
        touched = _with_est(touched).localCheckpoint(eager=True)
        new_changed = touched.filter(F.col("_chg")).select("id")
        state = (
            state.join(touched.select("id"), "id", "left_anti")
            .select("id", *_RCOLS, "est")
            .unionByName(touched.select("id", *_RCOLS, "est"))
            .localCheckpoint(eager=True)
        )
        n_changed = on_round(t, state, touched, new_changed)
        if n_changed == 0:
            break
        changed = new_changed
    return state, t


def hyperball(g: Graph, t_max: int) -> DataFrame:
    """(t, nf_estimate) for t = 0..t_max: approximate neighbourhood
    function.  NF updates are incremental sums of touched-node estimate
    deltas — untouched nodes cost nothing per round."""
    spark = g.edges.sparkSession
    results: list[tuple[int, float]] = []
    nf = [0.0]

    def on_round(t, state, touched, new_changed):
        if t == 1:
            # NF(0) from the same materialized state the loop built;
            # subtract this round's deltas back out of the current sums.
            row0 = state.agg(F.coalesce(F.sum("est"), F.lit(0.0)).alias("s")).first()
            drow = touched.agg(
                F.coalesce(F.sum(F.col("est") - F.col("old_est")), F.lit(0.0)).alias("d")
            ).first()
            nf[0] = float(row0["s"]) - float(drow["d"])
            results.append((0, nf[0]))
            nf[0] += float(drow["d"])
            results.append((1, nf[0]))
            return new_changed.count()
        row = touched.agg(
            F.coalesce(F.sum(F.col("est") - F.col("old_est")), F.lit(0.0)).alias("d"),
        ).first()
        n_changed = new_changed.count()
        nf[0] += float(row["d"])
        results.append((t, nf[0]))
        return n_changed

    if t_max == 0:
        state0 = _with_est(_init_state(g))
        nf0 = float(state0.agg(F.coalesce(F.sum("est"), F.lit(0.0))).first()[0])
        return spark.createDataFrame([(0, nf0)], "t long, nf double")
    _hyperball_loop(g, t_max, on_round)
    if not results:  # graph with no arcs: loop did one no-op round
        state0 = _with_est(_init_state(g))
        nf[0] = float(state0.agg(F.coalesce(F.sum("est"), F.lit(0.0))).first()[0])
        results.append((0, nf[0]))
    # pad to t_max if the systolic loop converged early (NF is constant)
    while len(results) <= t_max:
        results.append((len(results), nf[0]))
    return spark.createDataFrame(results, "t long, nf double")


def hyperball_registers(g: Graph, t_max: int) -> DataFrame:
    """(id, regs_csv): the raw merged register vectors after ``t_max``
    rounds, serialized as comma-joined decimal values.  Integers only —
    the exactly-reproducible core the driver gate hashes against the
    unrolled SQL oracle (:func:`hyperball_registers_sql`)."""

    def on_round(t, state, touched, new_changed):
        return new_changed.count()

    state, _ = _hyperball_loop(g, t_max, on_round)
    return state.select(
        "id", F.concat_ws(",", *[F.col(c).cast("string") for c in _RCOLS]).alias("regs_csv")
    )


def hyperball_centralities(
    g: Graph, t_max: int | None = None, discount=None
) -> DataFrame:
    """(id, reachable, harmonic, closeness, lin[, discounted]):
    HLL-estimated geometric centralities — ``algo/HyperBall.java:245``'s
    discounted sums.

    Counters run over the TRANSPOSE internally (centrality of x counts
    nodes that *reach* x, ``LinearGeometricCentrality.java:66-76``), so
    pass the graph itself, not its transpose.  Per round t, each touched
    node's ball grew by (est − old_est); harmonic adds that mass / t,
    the closeness denominator adds mass · t.  ``discount`` is the
    reference's pluggable discount-function extension point
    (``HyperBall.java:245`` discountFunction): a Python callable
    t → weight evaluated driver-side per round (t is a small integer),
    accumulating mass · discount(t) into a ``discounted`` column.
    Runs to the systolic fixpoint when ``t_max`` is None.
    """
    gt = Graph(
        g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        g._num_nodes,
        dense=g.dense,
    )
    acc = [None]  # (id, harmonic, sumdist, discounted) accumulator

    def on_round(t, state, touched, new_changed):
        n_changed = new_changed.count()
        dmass = F.col("est") - F.col("old_est")
        deltas = touched.select(
            "id",
            (dmass / F.lit(float(t))).alias("dh"),
            (dmass * F.lit(float(t))).alias("dd"),
            (dmass * F.lit(float(discount(t)) if discount else 0.0)).alias("dc"),
        )
        if acc[0] is None:
            acc[0] = deltas.select(
                "id",
                F.col("dh").alias("harmonic"),
                F.col("dd").alias("sumdist"),
                F.col("dc").alias("discounted"),
            ).localCheckpoint(eager=True)
        else:
            acc[0] = (
                acc[0]
                .join(deltas, "id", "full")
                .select(
                    "id",
                    (F.coalesce("harmonic", F.lit(0.0)) + F.coalesce("dh", F.lit(0.0))).alias("harmonic"),
                    (F.coalesce("sumdist", F.lit(0.0)) + F.coalesce("dd", F.lit(0.0))).alias("sumdist"),
                    (F.coalesce("discounted", F.lit(0.0)) + F.coalesce("dc", F.lit(0.0))).alias("discounted"),
                )
                .localCheckpoint(eager=True)
            )
        return n_changed

    state, _ = _hyperball_loop(gt, t_max, on_round)
    base = state.select("id", F.col("est").alias("reachable"))
    extra = [F.lit(0.0).alias("discounted")] if discount else []
    a = acc[0]
    if a is None:
        return base.select(
            "id",
            "reachable",
            F.lit(0.0).alias("harmonic"),
            F.lit(0.0).alias("closeness"),
            F.lit(0.0).alias("lin"),
            *extra,
        )
    extra = (
        [F.coalesce("discounted", F.lit(0.0)).alias("discounted")] if discount else []
    )
    return (
        base.join(a, "id", "left")
        .select(
            "id",
            "reachable",
            F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
            F.when(
                F.coalesce("sumdist", F.lit(0.0)) > 0,
                F.lit(1.0) / F.col("sumdist"),
            )
            .otherwise(F.lit(0.0))
            .alias("closeness"),
            # Lin: |ball|² / Σ dist (1 for nodes reaching only themselves)
            F.when(
                F.coalesce("sumdist", F.lit(0.0)) > 0,
                F.col("reachable") * F.col("reachable") / F.col("sumdist"),
            )
            .otherwise(F.lit(1.0))
            .alias("lin"),
            *extra,
        )
    )


# ---------------------------------------------------------------------------
# SQL oracle generator for the register gate
# ---------------------------------------------------------------------------


def register_init_sql(nodes_cte: str) -> str:
    """DuckDB fragment computing (id, j, rho) — the exact mirror of
    :func:`init_register_cols` (same md5-prefix hash, same binary-string
    bit length)."""
    h = "('0x' || substr(md5(id::VARCHAR), 1, 12))::BIGINT"
    return (
        f"_h AS MATERIALIZED (SELECT id, {h} AS h FROM {nodes_cte}), "
        f"_jr AS MATERIALIZED (SELECT id, h & {P - 1} AS j, "
        f"CASE WHEN (h // {P}) = 0 THEN {W_BITS + 1} "
        f"ELSE {W_BITS} - length(bin(h // {P})) + 1 END AS rho FROM _h)"
    )


def hyperball_registers_sql(edge_sql: str, t_max: int) -> str:
    """Unrolled DuckDB SQL reproducing ``hyperball_registers`` exactly:
    64 per-register max-merge columns, t_max rounds, csv output — the
    same shape as the Spark plan (64 max aggregates + greatest)."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edge_sql}))",
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e))",
        register_init_sql("nodes"),
        "s0 AS MATERIALIZED (SELECT id, "
        + ", ".join(f"CASE WHEN j = {k} THEN rho ELSE 0 END AS r{k}" for k in range(P))
        + " FROM _jr)",
    ]
    for t in range(1, t_max + 1):
        maxes = ", ".join(f"max(ss.r{k}) AS r{k}" for k in range(P))
        merged = ", ".join(
            f"greatest(s.r{k}, coalesce(m.r{k}, 0)) AS r{k}" for k in range(P)
        )
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT s.id, {merged} FROM s{t-1} s "
            f"LEFT JOIN (SELECT e.src AS id, {maxes} FROM e "
            f"JOIN s{t-1} ss ON e.dst = ss.id GROUP BY e.src) m ON m.id = s.id)"
        )
    # concat_ws keeps the expression tree flat (a 64-term || chain blows
    # DuckDB's binder recursion limit)
    csv = "concat_ws(','" + "".join(f", r{k}::VARCHAR" for k in range(P)) + ")"
    return ", ".join(parts) + f" SELECT id, {csv} AS regs_csv FROM s{t_max}"
