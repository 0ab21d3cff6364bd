"""Driver contract for the spark-graft builder (PySpark target).

Queries below exercise the webgraph_big_spark engine over graphs derived
from the driver's TPC-H-ish parquet tables:

- **G1** — the customer→supplier purchase graph (bipartite, *hubby*:
  suppliers are ~100× rarer than customers — the skew fixture);
- **G2** — the per-nation "band" graph over customers (each customer
  linked to the next 5 customers of its nation in custkey order): a
  bounded-degree, high-diameter graph with a known triangle structure.

Every iterative algorithm is gated in *fixed-round* form so the DuckDB
oracle (unrolled CTE chain, generated programmatically below) computes
the identical trajectory; converged forms are exercised in pytest
against NumPy oracles.  Float outputs are rounded to 9 decimals on both
sides (well above both engines' ulp noise, well below any semantic
difference).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from webgraph_big_spark.graph import Graph
from webgraph_big_spark import transforms as tr
from webgraph_big_spark import functions as wf
from webgraph_big_spark.algorithms.pagerank import pagerank
from webgraph_big_spark.algorithms.components import connected_components
from webgraph_big_spark.algorithms.labelprop import label_propagation
from webgraph_big_spark.algorithms.triangles import triangle_edges
from webgraph_big_spark.algorithms.bfs import bfs_distances
from webgraph_big_spark.algorithms.stats import degree_histogram
from webgraph_big_spark.algorithms.hyperball import neighbourhood_function_exact

ALPHA = 0.85
PR_ITERS = 12
WCC_ITERS = 16
LP_ROUNDS = 4
BFS_ROUNDS = 6
BAND = 5
NF_T = 3
RND = 9  # float rounding decimals (both engines)


# ---------------------------------------------------------------------------
# graph derivations (Spark side)
# ---------------------------------------------------------------------------

def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_g1(spark: SparkSession, sf_dir: str) -> Graph:
    """Bipartite purchase graph: customer → 100000+supplier, distinct."""
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.lit(100000) + F.col("l_suppkey")).cast("long").alias("dst"),
        )
        .distinct()
    )
    return Graph(e, dense=False)


G1_SQL = (
    "SELECT DISTINCT o_custkey AS src, 100000 + l_suppkey AS dst "
    "FROM orders JOIN lineitem ON l_orderkey = o_orderkey"
)


def load_g2(spark: SparkSession, sf_dir: str) -> Graph:
    """Per-nation band graph (window + range self-join, DataFrame API)."""
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    rk = cust.select(
        F.col("c_custkey").cast("long").alias("ck"),
        "c_nationkey",
        F.row_number().over(w).alias("rk"),
    )
    a, b = rk.alias("a"), rk.alias("b")
    e = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("b.rk") > F.col("a.rk"))
        & (F.col("b.rk") <= F.col("a.rk") + BAND),
    ).select(F.col("a.ck").alias("src"), F.col("b.ck").alias("dst"))
    return Graph(e, dense=False)


G2_SQL = (
    "WITH _rk AS (SELECT c_custkey AS ck, c_nationkey, "
    "row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rk FROM customer) "
    "SELECT a.ck AS src, b.ck AS dst FROM _rk a JOIN _rk b "
    f"ON a.c_nationkey = b.c_nationkey AND b.rk > a.rk AND b.rk <= a.rk + {BAND}"
)


def load_g1_weighted(spark: SparkSession, sf_dir: str, half: int) -> Graph:
    """customer→supplier with w = #lineitems, split by order date."""
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cond = (
        F.col("o_orderdate") < "1995-06-01"
        if half == 0
        else F.col("o_orderdate") >= "1995-06-01"
    )
    e = (
        orders.filter(cond)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").cast("long").alias("src"),
            (F.lit(100000) + F.col("l_suppkey")).cast("long").alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )
    return Graph(e, dense=False)


def _g1w_sql(half: int) -> str:
    op = "<" if half == 0 else ">="
    return (
        "SELECT o_custkey AS src, 100000 + l_suppkey AS dst, COUNT(*)::BIGINT AS w "
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
        f"WHERE o_orderdate {op} TIMESTAMP '1995-06-01' GROUP BY 1, 2"
    )


# ---------------------------------------------------------------------------
# oracle SQL generators (unrolled iterative CTE chains for DuckDB)
# ---------------------------------------------------------------------------

def _sym_cte(edge_sql: str) -> str:
    return (
        f"_e0 AS MATERIALIZED ({edge_sql}), "
        "e AS MATERIALIZED (SELECT src, dst FROM _e0 UNION SELECT dst AS src, src AS dst FROM _e0), "
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM e)"
    )


def _pagerank_sql(edge_sql: str, iters: int, alpha: float) -> str:
    parts = [
        f"WITH e AS MATERIALIZED ({edge_sql})",
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e))",
        "meta AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM meta) AS rank FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT n.id, "
            f"(1 - {alpha}) / m.n + {alpha} * (COALESCE(inf.inflow, 0) + (1 - t.tot) / m.n) AS rank "
            "FROM nodes n CROSS JOIN meta m "
            f"LEFT JOIN (SELECT e.dst AS id, sum(r.rank / d.outdeg) AS inflow "
            f"FROM e JOIN r{k-1} r ON e.src = r.id JOIN deg d ON d.src = e.src GROUP BY e.dst) inf "
            "ON inf.id = n.id "
            f"CROSS JOIN (SELECT COALESCE(sum(r.rank / d.outdeg), 0) AS tot "
            f"FROM e JOIN r{k-1} r ON e.src = r.id JOIN deg d ON d.src = e.src) t)"
        )
    return ", ".join(parts) + f" SELECT id, ROUND(rank, {RND}) AS rank FROM r{iters}"


def _wcc_sql(edge_sql: str, iters: int) -> str:
    parts = [
        "WITH " + _sym_cte(edge_sql),
        "c0 AS MATERIALIZED (SELECT id, id AS comp FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT c.id, LEAST(c.comp, COALESCE(m.mn, c.comp)) AS comp "
            f"FROM c{k-1} c LEFT JOIN (SELECT e.dst AS id, min(cc.comp) AS mn "
            f"FROM e JOIN c{k-1} cc ON e.src = cc.id GROUP BY e.dst) m ON m.id = c.id)"
        )
    return ", ".join(parts) + f" SELECT id, comp FROM c{iters}"


def _lp_sql(edge_sql: str, rounds: int) -> str:
    parts = [
        "WITH " + _sym_cte(edge_sql),
        "l0 AS MATERIALIZED (SELECT id, id AS label FROM nodes)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT l.id, COALESCE(w.lab, l.label) AS label FROM l{k-1} l "
            "LEFT JOIN (SELECT id, lab FROM ("
            "SELECT e.dst AS id, ll.label AS lab, count(*) AS cnt, "
            "row_number() OVER (PARTITION BY e.dst ORDER BY count(*) DESC, ll.label ASC) AS rn "
            f"FROM e JOIN l{k-1} ll ON e.src = ll.id GROUP BY e.dst, ll.label) x "
            "WHERE rn = 1) w ON w.id = l.id)"
        )
    return ", ".join(parts) + f" SELECT id, label FROM l{rounds}"


def _bfs_sql(edge_sql: str, rounds: int) -> str:
    parts = [
        "WITH " + _sym_cte(edge_sql),
        "d0 AS MATERIALIZED (SELECT (SELECT min(id) FROM nodes) AS id, 0 AS dist)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT id, min(dist) AS dist FROM ("
            f"SELECT id, dist FROM d{k-1} UNION ALL "
            f"SELECT e.dst AS id, d.dist + 1 AS dist FROM e JOIN d{k-1} d ON e.src = d.id) u "
            "GROUP BY id)"
        )
    return ", ".join(parts) + f" SELECT id, dist::INT AS dist FROM d{rounds}"


def _nf_sql(edge_sql: str, t_max: int) -> str:
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edge_sql}))",
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e))",
        "b0 AS MATERIALIZED (SELECT id AS x, id AS y FROM nodes)",
    ]
    for k in range(1, t_max + 1):
        parts.append(
            f"b{k} AS MATERIALIZED (SELECT DISTINCT x, y FROM ("
            f"SELECT b.x, e.dst AS y FROM b{k-1} b JOIN e ON b.y = e.src "
            f"UNION ALL SELECT x, y FROM b{k-1}) u)"
        )
    selects = " UNION ALL ".join(
        f"SELECT {t}::BIGINT AS t, (SELECT count(*) FROM b{t})::BIGINT AS nf"
        for t in range(t_max + 1)
    )
    return ", ".join(parts) + " " + selects


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: converged PageRank on the sf0.001 purchase graph."""
    g = load_g1(spark, "/root/testdata/sf0.001")
    ranks = pagerank(g, alpha=ALPHA, tol=1e-9, max_iterations=60, check_every=5)
    return ranks.select("id", F.round("rank", RND).alias("rank"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- whole-graph algorithms (fixed-round forms) ----
    q["pagerank_g1"] = lambda spark, sf: pagerank(
        load_g1(spark, sf), alpha=ALPHA, fixed_iterations=PR_ITERS
    ).select("id", F.round("rank", RND).alias("rank"))

    q["wcc_g2"] = lambda spark, sf: connected_components(
        load_g2(spark, sf), fixed_iterations=WCC_ITERS
    ).select("id", "comp")

    q["labelprop_g2"] = lambda spark, sf: label_propagation(
        load_g2(spark, sf), rounds=LP_ROUNDS
    ).select("id", "label")

    q["bfs_g2"] = lambda spark, sf: _bfs_query(spark, sf)

    q["triangles_g2"] = lambda spark, sf: (
        triangle_edges(load_g2(spark, sf))
        .agg(F.coalesce(F.sum("tri"), F.lit(0)).cast("long").alias("n_triangles"))
    )

    q["neighbourhood_fn_g1"] = lambda spark, sf: neighbourhood_function_exact(
        load_g1(spark, sf), NF_T
    )

    # ---- transforms ----
    q["transpose_g1"] = lambda spark, sf: tr.transpose(load_g1(spark, sf)).edges

    q["symmetrize_g2"] = lambda spark, sf: tr.symmetrize(load_g2(spark, sf)).edges

    q["simplify_g2"] = lambda spark, sf: tr.simplify(load_g2(spark, sf)).edges

    q["compose_g2_g2"] = lambda spark, sf: tr.compose(
        load_g2(spark, sf), load_g2(spark, sf)
    ).edges

    q["compose_minplus_g2"] = lambda spark, sf: _compose_minplus(spark, sf)

    q["filter_arcs_g2"] = lambda spark, sf: tr.filter_arcs(
        load_g2(spark, sf),
        (F.col("src") % 2 == 0) & (F.col("dst") - F.col("src") <= 7),
    ).edges

    q["quotient_nation_g1"] = lambda spark, sf: _quotient_nation(spark, sf)

    q["subgraph_building_g1"] = lambda spark, sf: _subgraph_building(spark, sf)

    q["union_weighted_g1"] = lambda spark, sf: tr.union_labelled(
        load_g1_weighted(spark, sf, 0),
        load_g1_weighted(spark, sf, 1),
        merge={"w": F.sum("w").cast("long").alias("w")},
    ).edges

    # ---- aggregations / stats / scalar kernels ----
    q["degree_hist_g1"] = lambda spark, sf: degree_histogram(
        load_g1(spark, sf), "out", include_zero=True
    ).select(F.col("deg").cast("long").alias("deg"), F.col("n_nodes").cast("long"))

    q["graph_stats_g1"] = lambda spark, sf: _graph_stats_df(spark, sf)

    q["typed_pack"] = lambda spark, sf: _typed_pack(spark, sf)

    return q


def _bfs_query(spark: SparkSession, sf: str) -> DataFrame:
    g = load_g2(spark, sf)
    source = g.touched_nodes().agg(F.min("id")).first()[0]
    return bfs_distances(g, [int(source)], fixed_rounds=BFS_ROUNDS).select(
        "id", F.col("dist").cast("int").alias("dist")
    )


def _compose_minplus(spark: SparkSession, sf: str) -> DataFrame:
    g = load_g2(spark, sf)
    gw = Graph(g.edges.withColumn("w", (F.col("dst") - F.col("src")).cast("long")), dense=False)
    return tr.compose_semiring(gw, gw, label_col="w").edges


def _quotient_nation(spark: SparkSession, sf: str) -> DataFrame:
    g1 = load_g1(spark, sf)
    cust = _read(spark, sf, "customer").select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_nationkey").cast("long").alias("to"),
    )
    supp = _read(spark, sf, "supplier").select(
        (F.lit(100000) + F.col("s_suppkey")).cast("long").alias("id"),
        (F.lit(100000) + F.col("s_nationkey")).cast("long").alias("to"),
    )
    return tr.quotient_graph(g1, cust.union(supp), weight=True).edges.select(
        "src", "dst", F.col("weight").cast("long").alias("weight")
    )


def _subgraph_building(spark: SparkSession, sf: str) -> DataFrame:
    g1 = load_g1(spark, sf)
    cust = _read(spark, sf, "customer")
    sub = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").cast("long").alias("id"))
        .union(
            _read(spark, sf, "supplier").select(
                (F.lit(100000) + F.col("s_suppkey")).cast("long").alias("id")
            )
        )
    )
    return tr.induced_subgraph(g1, sub, renumber=True).edges


def _graph_stats_df(spark: SparkSession, sf: str) -> DataFrame:
    """Single-row stats over G1, kept as one declarative plan."""
    g = load_g1(spark, sf)
    edges = g.edges
    nodes = g.touched_nodes()
    outdeg = nodes.join(
        edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d")), "id", "left"
    ).select(F.coalesce("d", F.lit(0)).alias("d"))
    indeg = nodes.join(
        edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("d")), "id", "left"
    ).select(F.coalesce("d", F.lit(0)).alias("d"))
    a = edges.agg(
        F.count("*").cast("long").alias("arcs"),
        F.sum(F.when(F.col("src") == F.col("dst"), 1).otherwise(0)).cast("long").alias("loops"),
    )
    b = nodes.agg(F.count("*").cast("long").alias("nodes"))
    c = outdeg.agg(
        F.max("d").cast("long").alias("max_outdeg"),
        F.sum(F.when(F.col("d") == 0, 1).otherwise(0)).cast("long").alias("dangling"),
    )
    d = indeg.agg(F.max("d").cast("long").alias("max_indeg"))
    return a.crossJoin(b).crossJoin(c).crossJoin(d).select(
        "nodes", "arcs", "loops", "dangling", "max_outdeg", "max_indeg"
    )


def _typed_pack(spark: SparkSession, sf: str) -> DataFrame:
    cust = _read(spark, sf, "customer").select(
        F.col("c_custkey").cast("long").alias("id"), F.lit(0).cast("long").alias("typ")
    )
    supp = _read(spark, sf, "supplier").select(
        F.col("s_suppkey").cast("long").alias("id"), F.lit(1).cast("long").alias("typ")
    )
    u = cust.union(supp)
    packed = u.select("id", "typ", wf.pack_node(F.col("typ"), F.col("id")).alias("packed"))
    return packed.select(
        "id",
        "typ",
        "packed",
        wf.node_type(F.col("packed")).alias("typ_check"),
        wf.node_id(F.col("packed")).alias("id_check"),
    )


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["pagerank_g1"] = _pagerank_sql(G1_SQL, PR_ITERS, ALPHA)
    o["wcc_g2"] = _wcc_sql(G2_SQL, WCC_ITERS)
    o["labelprop_g2"] = _lp_sql(G2_SQL, LP_ROUNDS)
    o["bfs_g2"] = _bfs_sql(G2_SQL, BFS_ROUNDS)
    o["triangles_g2"] = (
        f"WITH e AS ({G2_SQL}) "
        "SELECT count(*)::BIGINT AS n_triangles FROM e e1 "
        "JOIN e e2 ON e2.src = e1.dst JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst"
    )
    o["neighbourhood_fn_g1"] = _nf_sql(G1_SQL, NF_T)

    o["transpose_g1"] = f"SELECT dst AS src, src AS dst FROM ({G1_SQL})"
    o["symmetrize_g2"] = (
        f"WITH _e0 AS ({G2_SQL}) "
        "SELECT src, dst FROM _e0 UNION SELECT dst AS src, src AS dst FROM _e0"
    )
    o["simplify_g2"] = (
        f"WITH _e0 AS ({G2_SQL}), u AS "
        "(SELECT src, dst FROM _e0 UNION SELECT dst AS src, src AS dst FROM _e0) "
        "SELECT src, dst FROM u WHERE src <> dst"
    )
    o["compose_g2_g2"] = (
        f"WITH e AS ({G2_SQL}) "
        "SELECT DISTINCT a.src, b.dst FROM e a JOIN e b ON a.dst = b.src"
    )
    o["compose_minplus_g2"] = (
        f"WITH e AS (SELECT src, dst, (dst - src)::BIGINT AS w FROM ({G2_SQL})) "
        "SELECT a.src, b.dst, min(a.w + b.w)::BIGINT AS w FROM e a JOIN e b ON a.dst = b.src "
        "GROUP BY a.src, b.dst"
    )
    o["filter_arcs_g2"] = (
        f"SELECT src, dst FROM ({G2_SQL}) WHERE src % 2 = 0 AND dst - src <= 7"
    )
    o["quotient_nation_g1"] = (
        f"WITH g AS ({G1_SQL}) "
        "SELECT c.c_nationkey::BIGINT AS src, (100000 + s.s_nationkey)::BIGINT AS dst, "
        "count(*)::BIGINT AS weight "
        "FROM g JOIN customer c ON g.src = c.c_custkey "
        "JOIN supplier s ON g.dst - 100000 = s.s_suppkey GROUP BY 1, 2"
    )
    o["subgraph_building_g1"] = (
        f"WITH g AS ({G1_SQL}), "
        "sub AS (SELECT c_custkey AS id FROM customer WHERE c_mktsegment = 'BUILDING' "
        "UNION SELECT 100000 + s_suppkey FROM supplier), "
        "remap AS (SELECT id, row_number() OVER (ORDER BY id) - 1 AS t FROM sub) "
        "SELECT DISTINCT rs.t AS src, rd.t AS dst "
        "FROM g JOIN remap rs ON g.src = rs.id JOIN remap rd ON g.dst = rd.id"
    )
    o["union_weighted_g1"] = (
        f"WITH a AS ({_g1w_sql(0)}), b AS ({_g1w_sql(1)}), "
        "u AS (SELECT * FROM a UNION ALL SELECT * FROM b) "
        "SELECT src, dst, sum(w)::BIGINT AS w FROM u GROUP BY src, dst"
    )

    o["degree_hist_g1"] = (
        f"WITH g AS ({G1_SQL}), "
        "nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM g UNION ALL SELECT dst FROM g)), "
        "deg AS (SELECT n.id, COALESCE(d.c, 0) AS deg FROM nodes n "
        "LEFT JOIN (SELECT src, count(*) AS c FROM g GROUP BY src) d ON d.src = n.id) "
        "SELECT deg::BIGINT AS deg, count(*)::BIGINT AS n_nodes FROM deg GROUP BY 1"
    )
    o["graph_stats_g1"] = (
        f"WITH g AS ({G1_SQL}), "
        "nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM g UNION ALL SELECT dst FROM g)), "
        "od AS (SELECT n.id, COALESCE(d.c, 0) AS d FROM nodes n "
        "LEFT JOIN (SELECT src, count(*) AS c FROM g GROUP BY src) d ON d.src = n.id), "
        "idg AS (SELECT n.id, COALESCE(d.c, 0) AS d FROM nodes n "
        "LEFT JOIN (SELECT dst, count(*) AS c FROM g GROUP BY dst) d ON d.dst = n.id) "
        "SELECT (SELECT count(*) FROM nodes)::BIGINT AS nodes, "
        "(SELECT count(*) FROM g)::BIGINT AS arcs, "
        "(SELECT count(*) FROM g WHERE src = dst)::BIGINT AS loops, "
        "(SELECT count(*) FROM od WHERE d = 0)::BIGINT AS dangling, "
        "(SELECT max(d) FROM od)::BIGINT AS max_outdeg, "
        "(SELECT max(d) FROM idg)::BIGINT AS max_indeg"
    )
    o["typed_pack"] = (
        "WITH u AS (SELECT c_custkey::BIGINT AS id, 0::BIGINT AS typ FROM customer "
        "UNION ALL SELECT s_suppkey::BIGINT, 1::BIGINT FROM supplier) "
        "SELECT id, typ, (typ * 281474976710656 + id)::BIGINT AS packed, "
        "((typ * 281474976710656 + id) // 281474976710656)::BIGINT AS typ_check, "
        "((typ * 281474976710656 + id) % 281474976710656)::BIGINT AS id_check FROM u"
    )
    return o
