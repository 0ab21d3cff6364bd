"""Neighbourhood function: exact (small graphs) and HyperBall
(HyperLogLog registers, the scale path), plus HLL-derived centralities.

Reference: ``algo/HyperBall.java:217`` — per-node HLL counters of
ball(x, t); iteration t does a register-wise max-merge over successors'
counters (``algo/HyperBall.java:812``), in *systolic* mode only nodes
with a changed successor counter recompute (``algo/HyperBall.java:124-135``),
and the per-node ball-size deltas accumulate into the neighbourhood
function and the geometric centralities (``algo/HyperBall.java:245``:
harmonic / closeness / Lin / reachable).

Spark design (production path):

- state(id, regs: binary, est: double) — one 2^b-byte register vector
  per node, estimate cached so per-round NF/centrality updates are
  *incremental* (only touched nodes contribute deltas).
- per round, messages flow only from nodes whose counter changed last
  round (systolic): ``edges ⨝ changed(dst)`` → (src, regs); the merge is
  ``groupBy(src).agg(collect_list(regs))`` (JVM-side) followed by ONE
  scalar Arrow UDF that max-merges each row's list with
  ``np.maximum.reduceat`` over the concatenated buffer — one Python call
  per Arrow batch, zero per-row Python loops.
- untouched nodes are carried over with no Python at all; termination is
  ``changed = ∅`` (the natural systolic fixpoint).

The register hash is the engine-portable md5-prefix hash
(``functions.stable_long_hash``), so the full register state after t
rounds is bit-reproducible in ANSI SQL — the driver gate compares the
merged registers themselves (integers, no float tolerance needed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

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


def _estimate_batch(arr: np.ndarray) -> np.ndarray:
    """Vectorized HLL estimator with small-range correction.

    ``arr`` is (rows, P) uint8; returns (rows,) float64."""
    z = 1.0 / np.sum(np.exp2(-arr.astype(np.float64)), axis=1)
    e = _ALPHA_64 * P * P * z
    zeros = np.sum(arr == 0, axis=1)
    small = (e <= 2.5 * P) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = P * np.log(P / np.maximum(zeros, 1))
    return np.where(small, lin, e)


@F.pandas_udf(T.DoubleType())
def _est_udf(regs: pd.Series) -> pd.Series:
    arr = np.frombuffer(b"".join(regs), dtype=np.uint8).reshape(-1, P)
    return pd.Series(_estimate_batch(arr))


_MERGE_SCHEMA = T.BinaryType()


@F.pandas_udf(_MERGE_SCHEMA)
def _merge_udf(reg_lists: pd.Series) -> pd.Series:
    """list<binary> → binary: element-wise max over each row's register
    vectors.  One ``np.maximum.reduceat`` per Arrow batch — the
    vectorized analogue of the reference's broadword ``max``
    (``algo/HyperBall.java:108``)."""
    if len(reg_lists) == 0:
        return pd.Series([], dtype=object)
    lens = np.fromiter((len(l) for l in reg_lists), dtype=np.int64, count=len(reg_lists))
    flat = np.frombuffer(
        b"".join(bytes(b) for lst in reg_lists for b in lst), dtype=np.uint8
    ).reshape(-1, P)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    merged = np.maximum.reduceat(flat, starts, axis=0)
    return pd.Series([row.tobytes() for row in merged])


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


def _init_state(g: Graph) -> DataFrame:
    """state(id, regs): each node's counter containing just {id}.

    The register vector is built JVM-side as an array (one slot set to
    rho) and packed to binary by a single vectorized UDF pass."""
    jrho = g.nodes().select("id", *init_register_cols())

    @F.pandas_udf(T.BinaryType())
    def pack(j: pd.Series, rho: pd.Series) -> pd.Series:
        n = len(j)
        arr = np.zeros((n, P), dtype=np.uint8)
        arr[np.arange(n), j.to_numpy()] = rho.to_numpy()
        return pd.Series([row.tobytes() for row in arr])

    return jrho.select("id", pack("j", "rho").alias("regs"))


def _hyperball_loop(g: Graph, t_max: int | None, on_round, salt: int | None = None):
    """Shared systolic driver.  ``on_round(t, state, touched)`` is called
    after each merge with the full new state and the touched-delta frame
    (id, est, old_est); returns when no counter changed or t_max hit.

    ``salt``: optional two-phase merge for mega-hub indegrees — phase 1
    max-merges within ``salt`` deterministic sub-groups per node (caps
    any collect_list at ~indeg/salt), phase 2 merges the ≤ salt partials
    (the register-merge analogue of skew.salted_sum)."""
    edges = g.edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    state = (
        _init_state(g)
        .withColumn("est", _est_udf("regs"))
        .localCheckpoint(eager=True)
    )
    changed = state.select("id")  # round 0: everything is new
    t = 0
    while t_max is None or t < t_max:
        t += 1
        # systolic: only counters that changed last round are propagated;
        # regs travel dst→src (x absorbs its successors' balls).
        msgs = (
            edges.join(changed.withColumnRenamed("id", "dst"), "dst")
            .join(
                state.select(F.col("id").alias("dst"), F.col("regs").alias("mregs")),
                "dst",
            )
            .select(F.col("src").alias("id"), F.col("mregs").alias("regs"))
        )
        if salt:
            partial = (
                msgs.withColumn("_s", F.pmod(F.xxhash64("regs"), F.lit(salt)))
                .groupBy("id", "_s")
                .agg(F.collect_list("regs").alias("rl"))
                .select("id", _merge_udf("rl").alias("regs"))
            )
            gathered = partial.groupBy("id").agg(F.collect_list("regs").alias("rl"))
        else:
            gathered = msgs.groupBy("id").agg(F.collect_list("regs").alias("rl"))
        touched = (
            gathered.join(
                state.select("id", F.col("regs").alias("old"), F.col("est").alias("old_est")),
                "id",
            )
            .select(
                "id",
                _merge_udf(F.concat(F.col("rl"), F.array(F.col("old")))).alias("regs"),
                "old",
                "old_est",
            )
            .withColumn("est", _est_udf("regs"))
            .localCheckpoint(eager=True)
        )
        new_changed = touched.filter(F.col("regs") != F.col("old")).select("id")
        state = (
            state.join(touched.select("id"), "id", "left_anti")
            .select("id", "regs", "est")
            .unionByName(touched.select("id", "regs", "est"))
            .localCheckpoint(eager=True)
        )
        n_changed = on_round(t, state, touched, new_changed)
        if n_changed == 0:
            break
        changed = new_changed
    return state, t


def hyperball(g: Graph, t_max: int, salt: int | None = None) -> DataFrame:
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
        state0 = _init_state(g).withColumn("est", _est_udf("regs"))
        nf0 = float(state0.agg(F.coalesce(F.sum("est"), F.lit(0.0))).first()[0])
        return spark.createDataFrame([(0, nf0)], "t long, nf double")
    _hyperball_loop(g, t_max, on_round, salt=salt)
    if not results:  # graph with no arcs: loop did one no-op round
        state0 = _init_state(g).withColumn("est", _est_udf("regs"))
        nf[0] = float(state0.agg(F.coalesce(F.sum("est"), F.lit(0.0))).first()[0])
        results.append((0, nf[0]))
    # pad to t_max if the systolic loop converged early (NF is constant)
    while len(results) <= t_max:
        results.append((len(results), nf[0]))
    return spark.createDataFrame(results, "t long, nf double")


def hyperball_registers(g: Graph, t_max: int, salt: int | None = None) -> DataFrame:
    """(id, regs_csv): the raw merged register vectors after ``t_max``
    rounds, serialized as comma-joined decimal bytes.  Integers only —
    the exactly-reproducible core the driver gate hashes against the
    unrolled SQL oracle (:func:`hyperball_registers_sql`)."""

    def on_round(t, state, touched, new_changed):
        return new_changed.count()

    state, _ = _hyperball_loop(g, t_max, on_round, salt=salt)

    @F.pandas_udf(T.StringType())
    def to_csv(regs: pd.Series) -> pd.Series:
        arr = np.frombuffer(b"".join(regs), dtype=np.uint8).reshape(-1, P)
        return pd.Series([",".join(map(str, row)) for row in arr])

    return state.select("id", to_csv("regs").alias("regs_csv"))


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
    spark = g.edges.sparkSession
    acc = [None]  # (id, harmonic, sumdist) accumulator DataFrame

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
    64 per-register max-merge columns, t_max rounds, csv output."""
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
