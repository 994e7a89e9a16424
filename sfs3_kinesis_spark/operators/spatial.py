"""Spatial grid-join operators: radius self-join and bounded kNN on
integer coordinates.

The scalable shape for "find nearby points" without a spatial index:
bucket the plane into square cells of side >= radius, and a point's
neighbors provably live in its 3x3 cell neighborhood (Chebyshev
distance <= radius < 2 * cell implies |cell delta| <= 1 when
cell >= radius).  The left side explodes to its 9 candidate cells and
equi-joins the right side's HOME cell, so each candidate pair arises
EXACTLY once — no dedup pass — and O(n^2) collapses to
sum-of-cell-products.  Distances are exact int64 Chebyshev; the
corpus queries verify against DuckDB brute force, and the property
test verifies against a Python brute force on arbitrary points.

At 100 TB: one shuffle on the cell key per side; skewed cells (hot
spots) fall under AQE skew-join handling or the salted-join rescue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _floor_div(col: str, cell: int) -> str:
    """Exact integer FLOOR division (toward -inf).  Spark's DIV
    truncates toward zero, which makes cell 0 span (-cell, +cell) —
    nearly double width — for negative coordinates, degrading the
    3x3 pruning around the origin and breaking the uniform-width
    assumption of the coverage proof (r02 ADVICE).  The pmod
    adjustment keeps it pure int64 (no double round-trip)."""
    return f"(({col} - ((({col} % {cell}) + {cell}) % {cell})) DIV {cell})"


def _celled(points: DataFrame, x: str, y: str, cell: int) -> DataFrame:
    return points.withColumn("_cx", F.expr(_floor_div(x, cell))).withColumn(
        "_cy", F.expr(_floor_div(y, cell))
    )


def _exploded_left(p: DataFrame, id_col: str, x: str, y: str) -> DataFrame:
    return (
        p.select(
            F.col(id_col).alias("_a_id"),
            F.col(x).alias("_ax"),
            F.col(y).alias("_ay"),
            "_cx",
            "_cy",
            F.explode(F.expr("array(-1, 0, 1)")).alias("_dx"),
        )
        .select(
            "_a_id",
            "_ax",
            "_ay",
            (F.col("_cx") + F.col("_dx")).alias("_jx"),
            "_cy",
            F.explode(F.expr("array(-1, 0, 1)")).alias("_dy"),
        )
        .select("_a_id", "_ax", "_ay", "_jx", (F.col("_cy") + F.col("_dy")).alias("_jy"))
    )


def grid_radius_pairs(
    points: DataFrame,
    *,
    id_col: str,
    x: str,
    y: str,
    radius: int,
    cell: int | None = None,
    directed: bool = False,
) -> DataFrame:
    """All point pairs within Chebyshev ``radius``.

    Returns (a_id, b_id, d).  Undirected by default (each unordered
    pair once, ``a_id < b_id``); ``directed=True`` emits both
    orientations (the kNN candidate form).  ``cell`` defaults to the
    radius — any cell >= radius preserves the 3x3 coverage proof.
    """
    cell = cell or radius
    if cell < radius:
        raise ValueError("cell must be >= radius for 3x3 coverage")
    p = _celled(points, x, y, cell)
    left = _exploded_left(p, id_col, x, y)
    right = p.select(
        F.col(id_col).alias("_b_id"),
        F.col(x).alias("_bx"),
        F.col(y).alias("_by"),
        F.col("_cx").alias("_jx"),
        F.col("_cy").alias("_jy"),
    )
    cheb = F.greatest(F.abs(F.col("_ax") - F.col("_bx")), F.abs(F.col("_ay") - F.col("_by")))
    id_pred = (
        (F.col("_a_id") != F.col("_b_id"))
        if directed
        else (F.col("_a_id") < F.col("_b_id"))
    )
    return (
        left.join(right, ["_jx", "_jy"])
        .filter(id_pred & (cheb <= radius))
        .select(
            F.col("_a_id").alias("a_id"),
            F.col("_b_id").alias("b_id"),
            cheb.cast("long").alias("d"),
        )
    )


def grid_knn(
    points: DataFrame,
    *,
    id_col: str,
    x: str,
    y: str,
    radius: int,
    k: int,
    cell: int | None = None,
) -> DataFrame:
    """Bounded k-nearest-neighbors: each point's ``k`` closest
    neighbors within Chebyshev ``radius``, ranked by (distance, id).
    The radius bound is what keeps grid kNN exact — an unbounded kNN
    needs expanding rings.  Returns (a_id, rk, b_id, d)."""
    cand = grid_radius_pairs(
        points, id_col=id_col, x=x, y=y, radius=radius, cell=cell, directed=True
    )
    w = W.partitionBy("a_id").orderBy("d", "b_id")
    return (
        cand.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("a_id", "rk", "b_id", "d")
    )
