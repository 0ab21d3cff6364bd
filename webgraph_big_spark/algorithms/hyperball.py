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

- state(id, r0..r{m-1}: int, est: double): the 2^log2m registers are
  COLUMNS, not a packed blob, so the per-round merge is m built-in
  ``F.max`` aggregates.  That buys the two properties a packed-binary +
  ``collect_list`` + Arrow-UDF merge cannot have:
  * **map-side combine** — a 10⁸-in-degree hub receives one partial row
    per upstream task, never 10⁸ rows in one group (no OOM, no salting);
  * **zero Python** — merge, changed-detection, and the HLL estimator
    (Σ 2^-r, zero count, small-range correction) are all codegen'd
    column expressions.
- ``log2m`` is the reference ctor's precision knob
  (``algo/HyperBall.java:217``): rel. std ≈ 1.04/sqrt(m).  The plan is
  O(m) columns wide — the measured driver/plan-build cost per m is in
  BENCH.md; the default m=64 keeps plans cheap (~13% rel. std, the
  reference's own small-precision regime).
- the edge table is hash-partitioned by ``dst`` ONCE and cache()d
  (InMemoryRelation preserves outputPartitioning; localCheckpoint's
  LogicalRDD would not) so the two per-round joins on ``dst`` exchange
  ONLY the changed-frontier and state rows — the m-arc edge table never
  reshuffles inside the loop (same recipe as pagerank.py's
  co-partitioned path).
- messages flow only from nodes whose counter changed last round
  (systolic); termination is ``changed = ∅`` (the natural fixpoint).
- NF / centrality updates are *incremental*: only touched nodes
  contribute (est − old_est) deltas each round.

The register hash is the engine-portable md5-prefix hash
(``functions.stable_long_hash``), so the full register state after t
rounds is bit-reproducible in ANSI SQL — the driver gate compares the
merged registers themselves (integers, no float tolerance), and the
unrolled DuckDB oracles below are 1:1 mirrors of the Spark plan
(:func:`hyperball_registers_sql` for the raw registers,
:func:`hyperball_centralities_sql` for the estimator + per-round
harmonic/closeness delta sums — the same float expressions in the same
association order, so 3-dp-rounded outputs hash-match).
"""

from __future__ import annotations

import functools
import math
from types import SimpleNamespace

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


def effective_diameter_value(nf: list[float], alpha: float = 0.9) -> float:
    """Interpolated effective diameter — smallest (fractional) d with
    NF(d) ≥ alpha·NF(last).  The reference's
    ``NeighbourhoodFunction.effectiveDiameter`` definition (the class
    its slow tests drive: ``EstimateEffectiveDiameterSlowTest.java:38``
    asserts a HyperBall estimate of this against the exact value)."""
    target = alpha * nf[-1]
    d = 0
    while nf[d] < target:
        d += 1
    if d == 0:
        return 0.0
    return (d - 1) + (target - nf[d - 1]) / (nf[d] - nf[d - 1])


def distance_stats(nf_df: DataFrame, alpha: float = 0.9) -> DataFrame:
    """One row ``(reachable_pairs, avg_distance, eff_diameter,
    median_distance, spid)`` from a ``(t, nf)`` neighbourhood function —
    the distance-distribution statistics the reference's
    ``NeighbourhoodFunction`` utility class derives (effectiveDiameter /
    averageDistance / medianDistance / spid, the index-of-dispersion
    web-vs-social discriminator of Boldi & Vigna's HyperANF work).
    ``median_distance`` is the smallest INTEGER t with NF(t) ≥ ½·NF(last)
    (the reference's definition — not interpolated, unlike the
    effective diameter).  If ``nf_df`` is truncated at some t_max
    short of the diameter, the statistics describe the distance
    distribution restricted to d ≤ t_max (both this and the DuckDB
    oracle in ``__spark_entry__`` apply the same truncation, so gate
    values agree at any scale factor).

    The NF table has at most diameter+1 rows, so the unpartitioned
    ordering window here is a deliberate tiny-data exception to the
    no-global-window rule (cf. ``sort_by_size``'s global_rank)."""
    from pyspark.sql import Window

    w = Window.orderBy("t")
    d = nf_df.select(
        "t",
        F.col("nf").cast("double").alias("nf"),
        (F.col("nf") - F.coalesce(F.lag("nf").over(w), F.lit(0)))
        .cast("double")
        .alias("cnt"),
        F.coalesce(F.lag("nf").over(w), F.lit(0)).cast("double").alias("pnf"),
    )
    tot = d.agg(F.max("nf")).first()[0]
    target = alpha * tot
    moments = d.agg(
        F.max("nf").cast("long").alias("reachable_pairs"),
        F.round((F.sum(F.col("t") * F.col("cnt")) / tot), 6).alias("avg_distance"),
        (F.sum(F.col("t") * F.col("t") * F.col("cnt")) / tot).alias("_m2"),
    )
    # interpolated effective diameter: the unique t whose [pnf, nf)
    # straddles the target (t=0 row has pnf=0; target ≤ nf(0) → 0.0)
    ed = d.select(
        F.when(
            (F.col("t") == 0) & (F.col("nf") >= F.lit(target)), F.lit(0.0)
        )
        .when(
            (F.col("t") > 0)
            & (F.col("nf") >= F.lit(target))
            & (F.col("pnf") < F.lit(target)),
            F.col("t") - 1 + (F.lit(target) - F.col("pnf")) / (F.col("nf") - F.col("pnf")),
        )
        .alias("_ed"),
        F.when(F.col("nf") >= F.lit(0.5 * tot), F.col("t")).alias("_md"),
    ).agg(F.min("_ed").alias("_ed"), F.min("_md").cast("long").alias("median_distance"))
    return (
        moments.crossJoin(ed)
        .select(
            "reachable_pairs",
            "avg_distance",
            F.round("_ed", 6).alias("eff_diameter"),
            "median_distance",
            F.round(
                F.when(
                    F.col("avg_distance") > 0,
                    (F.col("_m2") - F.col("avg_distance") * F.col("avg_distance"))
                    / F.col("avg_distance"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("spid"),
        )
    )


# ---------------------------------------------------------------------------
# HyperBall (approximate, HLL registers)
# ---------------------------------------------------------------------------

LOG2M = 6  # default precision: m=64 registers → rel. std ≈ 13%
HASH_BITS = 48  # md5-prefix hash width (functions.stable_long_hash)
_LN2 = math.log(2.0)


def _alpha(m: int) -> float:
    """HLL bias-correction constant (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _balanced_sum(terms: list[str]) -> str:
    """Sum of terms with BALANCED parenthesisation — expression depth
    log2(m), not m.  Both Spark's SQL parser and DuckDB's binder are
    recursion-depth-bound (a flat 1024-term ``+`` chain throws
    FAILED_TO_PARSE_TOO_COMPLEX), so the wide-register expressions nest
    as a tree.  The SAME tree is emitted for both engines, so the float
    association order — and therefore the gate hashes — stay identical."""
    return _balanced_expr(terms, "+")


def _balanced_expr(terms: list[str], op: str) -> str:
    if len(terms) == 1:
        return terms[0]
    mid = len(terms) // 2
    return (
        f"({_balanced_expr(terms[:mid], op)} {op} {_balanced_expr(terms[mid:], op)})"
    )


@functools.lru_cache(maxsize=None)
def _cfg(log2m: int) -> SimpleNamespace:
    """Per-precision expression bundle.  All multi-register expressions
    are SQL STRINGS evaluated with one selectExpr/F.expr call: building
    m-column trees through the Column API costs one py4j round-trip per
    operator (~5 ms each ⇒ seconds of pure driver overhead per loop
    round); a string is ONE call and parses JVM-side."""
    if not 4 <= log2m <= 12:
        raise ValueError(f"log2m must be in [4, 12], got {log2m}")
    p = 1 << log2m
    a = _alpha(p)
    return SimpleNamespace(
        log2m=log2m,
        p=p,
        w_bits=HASH_BITS - log2m,
        rcols=[f"r{k}" for k in range(p)],
        zsum=_balanced_sum([f"exp({-_LN2} * r{k})" for k in range(p)]),
        zeros=_balanced_sum(
            [f"(CASE WHEN r{k} = 0 THEN 1 ELSE 0 END)" for k in range(p)]
        ),
        est_expr=(
            f"CASE WHEN ({a * p * p} / _z) <= {2.5 * p} AND _zeros > 0 "
            f"THEN {float(p)} * ln({float(p)} / CAST(_zeros AS DOUBLE)) "
            f"ELSE ({a * p * p} / _z) END"
        ),
    )


# back-compat module constants (the m=64 default; tests/tools import these)
P = _cfg(LOG2M).p
W_BITS = _cfg(LOG2M).w_bits
_ALPHA_64 = _alpha(64)
_RCOLS = _cfg(LOG2M).rcols
_ZSUM = _cfg(LOG2M).zsum
_ZEROS = _cfg(LOG2M).zeros
_EST_EXPR = _cfg(LOG2M).est_expr


def init_register_cols(log2m: int = LOG2M):
    """(j, rho) Columns for a node id — pure JVM expressions, mirrored
    exactly by :func:`register_init_sql` for the DuckDB oracle.

    h = 48-bit md5-prefix hash of the *decimal string* of the id;
    j = h & (m-1);  w = h >> log2m;  rho = (w_bits - bitlen(w)) + 1
    (bitlen via the binary-string length — exact, no float log).

    Deliberately does NOT go through ``_cfg`` (whose log2m ≤ 12 cap is a
    COLUMN-design plan-width limit): the packed-register path
    (``hyperball_packed.py``) shares this init at higher precisions."""
    if not 3 <= log2m <= 20:
        raise ValueError(f"log2m must be in [3, 20], got {log2m}")
    p = 1 << log2m
    w_bits = HASH_BITS - log2m
    h = stable_long_hash(F.col("id").cast("string"), bits=HASH_BITS)
    j = h.bitwiseAND(F.lit(p - 1))
    w = F.shiftrightunsigned(h, log2m)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits) - F.length(F.bin(w)) + 1
    )
    return j.alias("j"), rho.cast("int").alias("rho")


def _with_est(df: DataFrame, c: SimpleNamespace) -> DataFrame:
    """Append the HLL estimate column (α·m²/Σ2^-r with small-range
    correction) — pure codegen'd SQL expressions."""
    keep = [col for col in df.columns]
    return df.selectExpr(
        *keep, f"({c.zsum}) AS _z", f"({c.zeros}) AS _zeros"
    ).selectExpr(*keep, f"{c.est_expr} AS est")


def _init_state(g: Graph, log2m: int = LOG2M) -> DataFrame:
    """state(id, r0..r{m-1}): each node's counter containing just {id}."""
    c = _cfg(log2m)
    jrho = g.nodes().select("id", *init_register_cols(log2m))
    return jrho.selectExpr(
        "id", *[f"CASE WHEN j = {k} THEN rho ELSE 0 END AS r{k}" for k in range(c.p)]
    )


def _hyperball_loop(g: Graph, t_max: int | None, on_round, log2m: int = LOG2M):
    """Shared systolic driver.  ``on_round(t, state, touched,
    new_changed)`` is called after each merge; the loop ends when no
    counter changed or t_max is hit.  Everything here is built-in
    column expressions — max-merge with map-side combine, greatest()
    against the old state, m-way inequality for change detection.

    The edge table is partitioned by ``dst`` once and cached so the
    per-round joins never re-exchange it (see module docstring)."""
    c = _cfg(log2m)
    spark = g.edges.sparkSession
    from webgraph_big_spark.graph import co_partitioned

    # no ``distinct()`` before the pin: register max-merge is idempotent,
    # so duplicate arcs cannot change any merged register — the dedup
    # shuffle ahead of the repartition was pure setup cost (guide §2.4)
    edges = co_partitioned(g.edges.select("src", "dst"), "dst")
    # scope whole-stage codegen OFF for the column loop only: its m-wide
    # projections (init CASEs, m greatest's, 2m est terms) fuse into
    # generated methods past the JIT's compilable-size limits at ANY
    # data scale, so whole-stage here buys compile time + interpreted
    # bytecode instead of speed (A/B at sf0.1: warm round 6.5 → 4.3 s).
    # Expression-level codegen still applies; the packed engine (O(1)
    # plan width) keeps whole-stage fusion.
    prev_wsc = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try:
        state = _with_est(_init_state(g, log2m), c).localCheckpoint(eager=True)
        changed = state.select("id")  # round 0: everything is new
        t = 0
        # changed ⇔ some incoming max exceeds the old register (balanced
        # OR tree: parser depth log2(m), supports large register counts)
        chg_expr = _balanced_expr(
            [f"coalesce(m{k}, 0) > o{k}" for k in range(c.p)], "OR"
        )
        merged_exprs = [
            f"greatest(o{k}, coalesce(m{k}, 0)) AS r{k}" for k in range(c.p)
        ]
        while t_max is None or t < t_max:
            t += 1
            # systolic: only counters that changed last round are propagated;
            # regs travel dst→src (x absorbs its successors' balls).  The
            # groupBy-max gets partial aggregation: hub fan-in collapses
            # map-side, one partial row per task reaches the reducer.  Both
            # joins key on dst: the cached edge partitioning satisfies the
            # distribution requirement, so only the (thin) frontier and the
            # state rows are exchanged; shuffle_hash avoids re-sorting the
            # cached relation every round.
            msgs = (
                edges.join(
                    changed.withColumnRenamed("id", "dst").hint("shuffle_hash"),
                    "dst",
                )
                .join(
                    state.selectExpr("id AS dst", *c.rcols).hint("shuffle_hash"),
                    "dst",
                )
                .selectExpr("src AS id", *c.rcols)
            )
            gathered = msgs.groupBy("id").agg(
                *[F.expr(f"max(r{k})").alias(f"m{k}") for k in range(c.p)]
            )
            old_named = state.selectExpr(
                "id", *[f"r{k} AS o{k}" for k in range(c.p)], "est AS old_est"
            )
            # ONE left join replaces the old inner-join + anti-join +
            # union state rebuild: rows without messages keep their
            # registers (coalesce(m,0) is absent → greatest(o,0)=o) and
            # recompute the SAME est bits from the same registers, so
            # their (est - old_est) delta is exactly +0.0 — an IEEE
            # no-op in every accumulator downstream.  The full state is
            # materialized once per round instead of twice.
            touched = (
                old_named.join(gathered.hint("shuffle_hash"), "id", "left")
                .selectExpr("id", *merged_exprs, "old_est", f"({chg_expr}) AS _chg")
            )
            touched = _with_est(touched, c).localCheckpoint(eager=True)
            new_changed = touched.filter(F.col("_chg")).select("id")
            state = touched.select("id", *c.rcols, "est")
            n_changed = on_round(t, state, touched, new_changed)
            if n_changed == 0:
                break
            changed = new_changed
        return state, t
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", prev_wsc)
        edges.unpersist()


def hyperball(g: Graph, t_max: int | None, log2m: int = LOG2M) -> DataFrame:
    """(t, nf_estimate) for t = 0..t_max: approximate neighbourhood
    function.

    Delegates to the packed-register engine
    (:func:`webgraph_big_spark.algorithms.hyperball_packed.hyperball_packed`):
    identical register values (both layouts hash-gate against the same
    unrolled oracle), but plan width O(1) in m instead of O(m) — measured
    2x faster warm and substantially cheaper to codegen-compile cold
    (OPTIMIZATION_r06.md).  NF estimates agree with the column engine to
    float round-off (different partial-sum association order).  The
    column loop below (`_hyperball_loop`) remains the engine for the
    register/centrality gates, whose oracles mirror its exact float
    expression order."""
    from webgraph_big_spark.algorithms.hyperball_packed import hyperball_packed

    return hyperball_packed(g, t_max, log2m)


def _hyperball_column_nf(g: Graph, t_max: int, log2m: int = LOG2M) -> DataFrame:
    """The original column-layout NF estimator (kept for parity tests
    and as the reference implementation of the incremental-delta NF
    accumulation)."""
    spark = g.edges.sparkSession
    c = _cfg(log2m)
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
        state0 = _with_est(_init_state(g, log2m), c)
        nf0 = float(state0.agg(F.coalesce(F.sum("est"), F.lit(0.0))).first()[0])
        return spark.createDataFrame([(0, nf0)], "t long, nf double")
    _hyperball_loop(g, t_max, on_round, log2m)
    if not results:  # graph with no arcs: loop did one no-op round
        state0 = _with_est(_init_state(g, log2m), c)
        nf[0] = float(state0.agg(F.coalesce(F.sum("est"), F.lit(0.0))).first()[0])
        results.append((0, nf[0]))
    # pad to t_max if the systolic loop converged early (NF is constant);
    # t_max=None (run to the fixpoint) needs no padding — guard like
    # hyperball_packed does, so a converged t_max=None run returns
    # instead of raising TypeError after the whole computation
    while t_max is not None and len(results) <= t_max:
        results.append((len(results), nf[0]))
    return spark.createDataFrame(results, "t long, nf double")


def hyperball_registers(g: Graph, t_max: int, log2m: int = LOG2M) -> DataFrame:
    """(id, regs_csv): the raw merged register vectors after ``t_max``
    rounds, serialized as comma-joined decimal values.  Integers only —
    the exactly-reproducible core the driver gate hashes against the
    unrolled SQL oracle (:func:`hyperball_registers_sql`)."""
    c = _cfg(log2m)

    def on_round(t, state, touched, new_changed):
        return new_changed.count()

    state, _ = _hyperball_loop(g, t_max, on_round, log2m)
    return state.select(
        "id",
        F.concat_ws(",", *[F.col(col).cast("string") for col in c.rcols]).alias(
            "regs_csv"
        ),
    )


def hyperball_centralities(
    g: Graph, t_max: int | None = None, discount=None, log2m: int = LOG2M
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

    SQL-oracle mirror: :func:`hyperball_centralities_sql` (same
    expressions, same left-to-right accumulation order).

    Delegates to the packed-register engine
    (:func:`~webgraph_big_spark.algorithms.hyperball_packed.hyperball_centralities_packed`),
    whose output is BIT-IDENTICAL: registers evolve identically in both
    layouts (both gated against the same oracle), per-node estimates are
    computed by the same expression tree over the same register values
    in the same association order, and the delta accumulation replicates
    this column engine term for term — `tests/test_round6.py` asserts
    exact equality.  The column implementation below
    (`_hyperball_centralities_column`) remains the reference form the
    SQL oracle mirrors."""
    from webgraph_big_spark.algorithms.hyperball_packed import (
        hyperball_centralities_packed,
    )

    return hyperball_centralities_packed(g, t_max=t_max, discount=discount, log2m=log2m)


def _hyperball_centralities_column(
    g: Graph, t_max: int | None = None, discount=None, log2m: int = LOG2M
) -> DataFrame:
    """The original column-engine centralities (the form the SQL oracle
    mirrors expression for expression) — kept as the parity reference."""
    from webgraph_big_spark.transforms import BidirectionalGraph

    gt = BidirectionalGraph(g).backward
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
        # accumulate LAZILY: `deltas` is a cheap projection of the
        # round's already-checkpointed state, so the running join chain
        # costs nothing per round and is truncated every 4 rounds — the
        # old per-round full-join + localCheckpoint was one extra O(n)
        # job every round.  The left-associative (acc + delta_t) float
        # order the SQL oracle mirrors is preserved exactly.
        if acc[0] is None:
            acc[0] = deltas.select(
                "id",
                F.col("dh").alias("harmonic"),
                F.col("dd").alias("sumdist"),
                F.col("dc").alias("discounted"),
            )
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
            )
        if t % 4 == 0:
            acc[0] = acc[0].localCheckpoint(eager=True)
        return n_changed

    state, _ = _hyperball_loop(gt, t_max, on_round, log2m)
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
# SQL oracle generators for the register / centrality gates
# ---------------------------------------------------------------------------


def register_init_sql(nodes_cte: str, log2m: int = LOG2M) -> str:
    """DuckDB fragment computing (id, j, rho) — the exact mirror of
    :func:`init_register_cols` (same md5-prefix hash, same binary-string
    bit length)."""
    c = _cfg(log2m)
    h = "('0x' || substr(md5(id::VARCHAR), 1, 12))::BIGINT"
    return (
        f"_h AS MATERIALIZED (SELECT id, {h} AS h FROM {nodes_cte}), "
        f"_jr AS MATERIALIZED (SELECT id, h & {c.p - 1} AS j, "
        f"CASE WHEN (h // {c.p}) = 0 THEN {c.w_bits + 1} "
        f"ELSE {c.w_bits} - length(bin(h // {c.p})) + 1 END AS rho FROM _h)"
    )


def _register_rounds_sql(edge_sql: str, t_max: int, c: SimpleNamespace) -> list[str]:
    """Shared CTE chain: e, nodes, _h/_jr, s0..s{t_max} — the unrolled
    register recursion (m per-register max-merge columns per round, the
    same shape as the Spark plan: m max aggregates + greatest)."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edge_sql}))",
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e))",
        register_init_sql("nodes", c.log2m),
        "s0 AS MATERIALIZED (SELECT id, "
        + ", ".join(f"CASE WHEN j = {k} THEN rho ELSE 0 END AS r{k}" for k in range(c.p))
        + " FROM _jr)",
    ]
    for t in range(1, t_max + 1):
        maxes = ", ".join(f"max(ss.r{k}) AS r{k}" for k in range(c.p))
        merged = ", ".join(
            f"greatest(s.r{k}, coalesce(m.r{k}, 0)) AS r{k}" for k in range(c.p)
        )
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT s.id, {merged} FROM s{t-1} s "
            f"LEFT JOIN (SELECT e.src AS id, {maxes} FROM e "
            f"JOIN s{t-1} ss ON e.dst = ss.id GROUP BY e.src) m ON m.id = s.id)"
        )
    return parts


def hyperball_registers_sql(edge_sql: str, t_max: int, log2m: int = LOG2M) -> str:
    """Unrolled DuckDB SQL reproducing ``hyperball_registers`` exactly:
    m per-register max-merge columns, t_max rounds, csv output."""
    c = _cfg(log2m)
    parts = _register_rounds_sql(edge_sql, t_max, c)
    # concat_ws keeps the expression tree flat (a 64-term || chain blows
    # DuckDB's binder recursion limit)
    csv = "concat_ws(','" + "".join(f", r{k}::VARCHAR" for k in range(c.p)) + ")"
    return ", ".join(parts) + f" SELECT id, {csv} AS regs_csv FROM s{t_max}"


def hyperball_nf_sql(
    edge_sql: str, t_max: int, log2m: int = LOG2M, round_dp: int = 3
) -> str:
    """Unrolled DuckDB SQL for the register-estimated neighbourhood
    function (t, nf): the same forward register recursion as
    ``hyperball_registers_sql``, then per round nf_t = Σ_id est(s_t)
    rounded at ``round_dp``.  The rounding absorbs float association
    differences: the packed Spark path (``hyperball_packed.py``) folds
    per-row partials while this oracle (and the column design) folds a
    balanced per-node tree — registers are integer-exact either way, so
    the sums agree to ~1e-11 relative, far inside the rounding."""
    c = _cfg(log2m)
    parts = _register_rounds_sql(edge_sql, t_max, c)
    for t in range(t_max + 1):
        parts.append(
            f"z{t} AS MATERIALIZED (SELECT id, ({c.zsum}) AS _z, "
            f"({c.zeros}) AS _zeros FROM s{t})"
        )
        parts.append(
            f"e{t} AS MATERIALIZED (SELECT id, {c.est_expr} AS est FROM z{t})"
        )
    selects = " UNION ALL ".join(
        f"SELECT {t}::BIGINT AS t, round((SELECT sum(est) FROM e{t}), {round_dp}) AS nf"
        for t in range(t_max + 1)
    )
    return ", ".join(parts) + " " + selects


def hyperball_centralities_sql(
    edge_sql: str,
    t_max: int,
    log2m: int = LOG2M,
    round_dp: int = 3,
    full: bool = False,
    discount_weights: list[float] | None = None,
    full_dp: int = 2,
) -> str:
    """Unrolled DuckDB SQL reproducing ``hyperball_centralities(g,
    t_max)`` rounded per column.

    Mirrors the Spark computation term for term: the register recursion
    runs over the TRANSPOSE (swap src/dst); per round t the per-node
    estimate est_t is the same ``est_expr`` string evaluated on s_t's
    registers; harmonic = Σ_t (est_t − est_{t−1})/t accumulated LEFT
    ASSOCIATIVELY in increasing t (the exact order the incremental
    Spark accumulator adds them — untouched rounds contribute exactly
    +0.0, which is an IEEE no-op, so summing over all nodes/rounds here
    equals Spark's touched-only sums bit for bit); reachable = est_T.

    ``full=True`` adds closeness (1/Σ dist·Δmass), lin (|ball|²/Σ dist)
    and — when ``discount_weights`` gives the per-round weights
    w_t = discount(t), t = 1..t_max — the discounted centrality
    (``algo/HyperBall.java:245``'s discountFunction).  The derived
    float columns round at ``full_dp`` (coarser than the 3-dp
    reachable/harmonic columns: ratios of estimates amplify libm ULP
    divergence between engines, so the hash gate quantizes them one
    digit coarser)."""
    if discount_weights is not None and len(discount_weights) != t_max:
        # a short list would IndexError below; a LONGER one would
        # silently ignore the tail while the Spark side's discount
        # callable covers all rounds — diverging the gate undiagnosed
        raise ValueError(
            f"discount_weights has {len(discount_weights)} entries but "
            f"t_max={t_max} requires exactly one weight per round 1..t_max"
        )
    c = _cfg(log2m)
    transposed = f"SELECT dst AS src, src AS dst FROM ({edge_sql})"
    parts = _register_rounds_sql(transposed, t_max, c)
    for t in range(t_max + 1):
        parts.append(
            f"z{t} AS MATERIALIZED (SELECT id, ({c.zsum}) AS _z, "
            f"({c.zeros}) AS _zeros FROM s{t})"
        )
        parts.append(
            f"e{t} AS MATERIALIZED (SELECT id, {c.est_expr} AS est FROM z{t})"
        )
    if t_max == 0:
        harmonic, sumdist, discounted = "0.0", "0.0", "0.0"
    else:
        harmonic = " + ".join(
            f"((e{t}.est - e{t-1}.est) / {float(t)})" for t in range(1, t_max + 1)
        )
        sumdist = " + ".join(
            f"((e{t}.est - e{t-1}.est) * {float(t)})" for t in range(1, t_max + 1)
        )
        if discount_weights is not None:
            discounted = " + ".join(
                f"((e{t}.est - e{t-1}.est) * {float(discount_weights[t - 1])})"
                for t in range(1, t_max + 1)
            )
        else:
            discounted = "0.0"
    joins = "e0" + "".join(
        f" JOIN e{t} ON e{t}.id = e0.id" for t in range(1, t_max + 1)
    )
    last = f"e{t_max}"
    cols = (
        f"e0.id AS id, round({last}.est, {round_dp}) AS reachable, "
        f"round({harmonic}, {round_dp}) AS harmonic"
    )
    if full:
        cols += (
            f", round(CASE WHEN ({sumdist}) > 0 THEN CAST(1.0 AS DOUBLE) / ({sumdist}) "
            f"ELSE 0.0 END, {full_dp}) AS closeness"
            f", round(CASE WHEN ({sumdist}) > 0 THEN ({last}.est * {last}.est) / ({sumdist}) "
            f"ELSE CAST(1.0 AS DOUBLE) END, {full_dp}) AS lin"
        )
        if discount_weights is not None:
            cols += f", round({discounted}, {full_dp}) AS discounted"
    return ", ".join(parts) + f" SELECT {cols} FROM {joins}"
