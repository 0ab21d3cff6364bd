"""Scalar function surface (SURVEY.md §2.7) — all JVM-side expressions.

The reference's scalar kernels are numeric/bit-level; each maps to a
built-in Spark SQL expression (whole-stage codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# TypedGraph bit packing (typed/TypedGraph.java:48-62): a node is a
# 16-bit type ⊕ 48-bit per-type id packed into one long.
_ID_BITS = 48
_ID_MASK = (1 << _ID_BITS) - 1


def pack_node(typ: Column, node_id: Column) -> Column:
    """``TypedGraph.node(type, id)`` — type<<48 | id."""
    return (
        F.shiftleft(typ.cast("long"), _ID_BITS)
        + node_id.cast("long").bitwiseAND(F.lit(_ID_MASK))
    ).cast("long")


def node_type(packed: Column) -> Column:
    """``TypedGraph.type(node)`` — top 16 bits."""
    return F.shiftrightunsigned(packed.cast("long"), _ID_BITS).cast("long")


def node_id(packed: Column) -> Column:
    """``TypedGraph.id(node)`` — low 48 bits."""
    return packed.cast("long").bitwiseAND(F.lit(_ID_MASK)).cast("long")


def stable_long_hash(col: Column, bits: int = 48) -> Column:
    """Deterministic, engine-portable string → non-negative long hash:
    the first ``bits/4`` hex chars of md5.  Identical in DuckDB as
    ``('0x' || substr(md5(x), 1, k))::BIGINT`` — the cross-engine hashing
    primitive for minhash/simhash/fingerprints (replaces the reference's
    CRC64, ``webbase/CRC64.java:13``, with a portable equivalent)."""
    k = bits // 4
    return F.conv(F.substring(F.md5(col), 1, k), 16, 10).cast("long")


def url_host(url: Column) -> Column:
    """URL → host — the ``BuildHostMap`` key (``BuildHostMap.java:75-96``).
    ``parse_url`` is JVM-side; top-private-domain reduction would need a
    public-suffix table joined afterwards."""
    return F.parse_url(url, F.lit("HOST"))
