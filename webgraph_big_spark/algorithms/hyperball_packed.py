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
