"""Packed-register HyperBall: 8 six-bit registers per long, bit-sliced
max-merge — the high-precision scale path.

The column design (``hyperball.py``: one INT column per register) buys
map-side combine and zero Python, but couples HLL precision to PLAN
WIDTH: m = 2^log2m columns means O(m)-wide expression trees per round,
and the measured plan-build cost caps ``log2m`` at 12.  The reference
has no such coupling — ``algo/HyperBall.java:217`` sizes its register
array freely and merges with word-wise ops (``HyperBall.java:812``).

This module restores that freedom by making registers ROWS, not columns:

- state(id, slot, packed): slot = register_index >> 3; ``packed`` holds
  registers ``slot*8 .. slot*8+7`` in 6-bit fields (48 bits used; rho
  ≤ HASH_BITS − log2m + 1 = 46 at the minimum allowed log2m=3, and
  46 < 63 always fits).  Rows are SPARSE — an absent (id, slot) row
  means eight zero registers, so a fresh counter is ONE row regardless
  of m.
- merge = 8 shift/mask ``max`` aggregates + one repack per slot: plan
  width and parser cost are O(1) in m; precision costs rows (data),
  not plan.  Map-side combine still collapses hub fan-in — the field
  maxes are algebraic aggregates, exactly like the column design.
- systolic at SLOT granularity: only (id, slot) rows whose packed value
  changed last round emit messages — finer than the column design's
  whole-node frontier.

Register VALUES are identical to the column implementation (same
md5-prefix hash, same j/rho mapping — ``init_register_cols``), so
:func:`hyperball_registers_packed` hash-gates against the SAME unrolled
DuckDB oracle (``hyperball_registers_sql``).  The NF estimator sums
per-row partials (association order differs from the column design's
balanced tree, so estimates agree to float round-off, not bit-exactly —
registers, the gated core, are exact integers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from webgraph_big_spark.algorithms.hyperball import (
    LOG2M,
    _alpha,
    _balanced_sum,
    init_register_cols,
)
from webgraph_big_spark.graph import Graph, co_partitioned

K = 8  # registers per long (8 divides every m = 2^log2m ≥ 8)
BITS = 6  # bits per register: rho ≤ HASH_BITS - log2m + 1 = 46 (log2m ≥ 3) < 63
MASK = (1 << BITS) - 1


def _field(expr: str, j: int) -> str:
    return f"(shiftright({expr}, {BITS * j}) & {MASK})"


def _repack(fields: list[str]) -> str:
    return _balanced_sum(
        [f"shiftleft({f}, {BITS * j})" for j, f in enumerate(fields)]
    )


def _greatest_packed(a: str, b: str) -> str:
    """Field-wise max of two packed longs — the bit-sliced merge."""
    return _repack(
        [f"greatest({_field(a, j)}, {_field(b, j)})" for j in range(K)]
    )


def _packed_init(g: Graph, log2m: int) -> DataFrame:
    """One row per node: the slot holding its own-hash register.
    init_register_cols validates log2m (3..20 — no column-width cap)."""
    return g.nodes().select("id", *init_register_cols(log2m)).selectExpr(
        "id",
        f"CAST((j div {K}) AS INT) AS slot",
        f"shiftleft(CAST(rho AS BIGINT), CAST((j % {K}) * {BITS} AS INT)) AS packed",
    )


def _packed_loop(g: Graph, t_max: int | None, log2m: int, on_round=None):
    """Systolic driver over sparse (id, slot, packed) rows.  Returns the
    converged state.  Hot path: two joins + one (id, slot) groupBy with
    8 algebraic max aggregates — all codegen'd, O(1) plan width in m."""
    spark = g.edges.sparkSession
    # no ``distinct()`` before the pin: the field-wise max merge is
    # idempotent, duplicate arcs cannot change any register (guide §2.4)
    edges = co_partitioned(g.edges.select("src", "dst"), "dst")
    try:
        state = _packed_init(g, log2m).localCheckpoint(eager=True)
        changed = state  # round 0: every row is new
        t = 0
        max_aggs = [
            F.expr(f"max({_field('packed', j)})").alias(f"_f{j}") for j in range(K)
        ]
        while t_max is None or t < t_max:
            t += 1
            msgs = (
                edges.join(
                    changed.withColumnRenamed("id", "dst").hint("shuffle_hash"),
                    "dst",
                )
                .groupBy(F.col("src").alias("id"), "slot")
                .agg(*max_aggs)
                .selectExpr(
                    "id",
                    "slot",
                    f"{_repack([f'_f{j}' for j in range(K)])} AS mpacked",
                )
            )
            merged = (
                state.join(msgs.hint("shuffle_hash"), ["id", "slot"], "full")
                .selectExpr(
                    "id",
                    "slot",
                    "coalesce(packed, CAST(0 AS BIGINT)) AS old_packed",
                    f"{_greatest_packed('coalesce(packed, CAST(0 AS BIGINT))', 'coalesce(mpacked, CAST(0 AS BIGINT))')} AS packed",
                )
                .localCheckpoint(eager=True)
            )
            changed = merged.filter(F.col("packed") != F.col("old_packed")).select(
                "id", "slot", "packed"
            )
            state = merged.select("id", "slot", "packed")
            if on_round is not None:
                on_round(t, state)
            if changed.isEmpty():
                break
        return state
    finally:
        edges.unpersist()


def hyperball_registers_packed(
    g: Graph, t_max: int, log2m: int = LOG2M
) -> DataFrame:
    """(id, regs_csv) after ``t_max`` rounds — same output contract (and
    same register values, slot-major r0..r{m-1} order) as the column
    implementation's ``hyperball_registers``, hash-gated against the
    same ``hyperball_registers_sql`` DuckDB oracle."""
    p = 1 << log2m
    nslots = p // K
    state = _packed_loop(g, t_max, log2m)
    dense = g.nodes().join(
        state.groupBy("id").agg(
            F.map_from_entries(
                F.collect_list(F.struct("slot", "packed"))
            ).alias("_mp")
        ),
        "id",
        "left",
    )
    return dense.selectExpr(
        "id",
        "concat_ws(',', flatten(transform(sequence(0, {last}), "
        "s -> transform(sequence(0, {kk}), "
        "j -> CAST(shiftright(coalesce(element_at(_mp, s), CAST(0 AS BIGINT)), j * {bits}) & {mask} AS STRING)"
        ")))) AS regs_csv".format(
            last=nslots - 1, kk=K - 1, bits=BITS, mask=MASK
        ),
    )


def hyperball_packed(
    g: Graph, t_max: int | None, log2m: int = LOG2M
) -> DataFrame:
    """(t, nf): the neighbourhood function from packed registers.  The
    per-round estimate aggregates per-row partials (Σ 2^-field and
    zero-field counts) plus the absent-slot correction — absent rows are
    eight zero registers each.  ``t_max=None`` runs to the register
    fixpoint (no packed word changed — the reference slow tests'
    convergence criterion, ``HyperBallSlowTest.java:46-76``)."""
    spark = g.edges.sparkSession
    p = 1 << log2m
    a = _alpha(p)
    zsum_row = _balanced_sum([f"exp({-0.6931471805599453} * {_field('packed', j)})" for j in range(K)])
    zeros_row = _balanced_sum(
        [f"(CASE WHEN {_field('packed', j)} = 0 THEN 1 ELSE 0 END)" for j in range(K)]
    )
    results: list[tuple[int, float]] = []

    def estimate(state: DataFrame) -> float:
        per_node = (
            state.selectExpr("id", f"({zsum_row}) AS _zr", f"({zeros_row}) AS _kr")
            .groupBy("id")
            .agg(
                F.expr(f"sum(_zr) + ({p} - count(*) * {K}) * 1.0").alias("_z"),
                F.expr(f"sum(_kr) + ({p} - count(*) * {K})").alias("_zeros"),
            )
        )
        est = per_node.selectExpr(
            f"CASE WHEN ({a * p * p} / _z) <= {2.5 * p} AND _zeros > 0 "
            f"THEN {float(p)} * ln({float(p)} / CAST(_zeros AS DOUBLE)) "
            f"ELSE ({a * p * p} / _z) END AS est"
        )
        return float(est.agg(F.coalesce(F.sum("est"), F.lit(0.0))).first()[0])

    # evaluate NF(t) from the full state after each round (one extra
    # aggregation per round; the packed path's gated core is the
    # registers — NF here is for parity checks and the nf() surface)
    results.append((0, estimate(_packed_init(g, log2m))))
    _packed_loop(
        g, t_max, log2m, on_round=lambda t, state: results.append((t, estimate(state)))
    )
    # pad if the systolic loop converged early (NF is constant from there)
    while t_max is not None and len(results) <= t_max:
        results.append((len(results), results[-1][1]))
    return spark.createDataFrame(results, "t long, nf double")


# ---------------------------------------------------------------------------
# packed-engine centralities: bit-exact per-node estimates
# ---------------------------------------------------------------------------


def _node_est(state: DataFrame, log2m: int) -> DataFrame:
    """(id, est) from sparse packed state rows, BIT-EXACT with the
    column engine's estimate.

    ``hyperball._cfg``'s m-term balanced summation tree splits at
    midpoints, so for m = 2^log2m it decomposes into m/8 CONTIGUOUS
    8-term subtrees — one per slot — combined by a balanced tree over
    the slot partials.  Each state row therefore computes its own
    8-term subtree (register k extracted in index order; ``exp(0)=1.0``
    exactly, so an ABSENT slot's partial is the compile-time constant
    8.0 / zero-count 8), and the per-node combine folds the ≤ m/8
    partials in slot order through the SAME upper tree.  Identical
    doubles in identical association order ⇒ identical estimate bits —
    which is what lets the centralities gate (whose DuckDB oracle
    mirrors the column engine's float expressions) run on this engine.
    Generated code is O(m/8) per expression instead of O(m), cutting
    the cold janino-compile cost ~an order of magnitude."""
    import importlib

    _hb = importlib.import_module("webgraph_big_spark.algorithms.hyperball")
    c = _hb._cfg(log2m)
    nslots = c.p // K
    zr = _hb._balanced_sum(
        [f"exp({-_hb._LN2} * {_field('packed', j)})" for j in range(K)]
    )
    kr = _hb._balanced_sum(
        [f"(CASE WHEN {_field('packed', j)} = 0 THEN 1 ELSE 0 END)" for j in range(K)]
    )
    rows = state.selectExpr("id", "slot", f"({zr}) AS _zr", f"({kr}) AS _kr")
    dense = rows.groupBy("id").agg(
        F.map_from_entries(F.collect_list(F.struct("slot", "_zr"))).alias("_zm"),
        F.map_from_entries(F.collect_list(F.struct("slot", "_kr"))).alias("_km"),
    )
    zsum = _hb._balanced_sum(
        [
            f"coalesce(element_at(_zm, {s}), CAST(8.0 AS DOUBLE))"
            for s in range(nslots)
        ]
    )
    zeros = _hb._balanced_sum(
        [f"coalesce(element_at(_km, {s}), 8)" for s in range(nslots)]
    )
    return dense.selectExpr(
        "id", f"({zsum}) AS _z", f"({zeros}) AS _zeros"
    ).selectExpr("id", f"{c.est_expr} AS est")


def hyperball_centralities_packed(
    g: Graph, t_max: int | None = None, discount=None, log2m: int = LOG2M
) -> DataFrame:
    """Packed-engine implementation behind
    :func:`webgraph_big_spark.algorithms.hyperball.hyperball_centralities`
    — identical output BITS (see `_est_from_map_sql`; registers are
    engine-identical per round, per-node estimates are expression-
    identical, and the delta accumulation replicates the column engine's
    expressions and left-associative order term for term), at O(1) plan
    width in the merge loop instead of O(m)."""
    from webgraph_big_spark.transforms import BidirectionalGraph

    gt = BidirectionalGraph(g).backward
    prev = [None]
    acc = [None]

    def on_round(t, state):
        cur = _node_est(state, log2m).localCheckpoint(eager=True)
        dmass = F.col("est") - F.col("old_est")
        deltas = cur.join(
            prev[0].withColumnRenamed("est", "old_est").hint("shuffle_hash"), "id"
        ).select(
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
        prev[0] = cur

    prev[0] = _node_est(_packed_init(gt, log2m), log2m).localCheckpoint(eager=True)
    _packed_loop(gt, t_max, log2m, on_round=on_round)
    base = prev[0].select("id", F.col("est").alias("reachable"))
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
            F.when(
                F.coalesce("sumdist", F.lit(0.0)) > 0,
                F.col("reachable") * F.col("reachable") / F.col("sumdist"),
            )
            .otherwise(F.lit(1.0))
            .alias("lin"),
            *extra,
        )
    )
