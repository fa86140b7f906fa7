"""Mergeable frequency sketches — count-min over token streams.

North-star extension (no reference counterpart): corpus-scale token
frequency estimation without retaining the vocabulary. A count-min
sketch (Cormode & Muthukrishnan 2005) is a ``depth × width`` grid of
counters; every occurrence increments one counter per row (chosen by a
per-row hash), and a point estimate is the **min** over the rows —
always an over-estimate, within ``εN`` with probability ``1-δ`` for
``width = e/ε``, ``depth = ln(1/δ)``.

Why this is the scale-correct shape in Spark: the sketch is a
commutative monoid, so ``groupBy(row, col).count()`` builds it with
map-side combine — every task reduces its partition to at most
``depth × width`` cells before the shuffle, and the Exchange carries a
**constant** number of rows per partition regardless of corpus size or
vocabulary. That is the whole point of sketching: a 100 TB corpus with
a 10⁹-token vocabulary shuffles the same few thousand cells as a 1 GB
one. (The exact ``groupBy(token)`` twin shuffles the live vocabulary —
fine when Zipf keeps it small, unbounded when it doesn't.)

Determinism: cell choice is ``md5_hash64(row || ':' || token) %
width`` — the engine's standard cross-engine hash (functions/
hashing.py), so the DuckDB oracle builds the *bit-identical* sketch
and the estimates are hash-exact, not just statistically similar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from diagnosisextraction_ml_spark.functions.hashing import md5_hash64
from diagnosisextraction_ml_spark.operators.textstats import ws_tokens

DEPTH = 4
WIDTH = 8192


def cms_cell(token: Column, row: int, width: int = WIDTH) -> Column:
    """Column index of ``token`` in sketch row ``row``."""
    return md5_hash64(F.concat(F.lit(f"{row}:"), token)) % F.lit(width)


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Build the sketch: one row per non-empty cell.

    Plan: tokenize once → explode tokens → explode ``depth`` (row, col)
    cells per occurrence → ``groupBy(row, col).count()``. The doubled
    explode costs ``depth×`` map-side rows but zero extra shuffle:
    partial aggregation collapses each task to ≤ depth·width cells
    before the Exchange.

    Output: (cms_row int, cms_col long, cnt long).
    """
    tok = F.explode(ws_tokens(F.col(text_col))).alias("token")
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("cms_row"),
                    cms_cell(F.col("token"), r, width).alias("cms_col"),
                )
                for r in range(depth)
            ]
        )
    ).alias("cell")
    return (
        df.select(tok)
        .select(cells)
        .groupBy(
            F.col("cell.cms_row").alias("cms_row"),
            F.col("cell.cms_col").alias("cms_col"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    token_col: str = "token",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Point-estimate counts for ``candidates`` from a built sketch.

    Each candidate expands to its ``depth`` cells, equi-joins the
    sketch on (row, col), and takes the min. The candidate side is the
    small one (a top-k list, a watchlist); the sketch is ≤ depth·width
    rows, so Spark broadcasts whichever side is smaller — either way
    no large shuffle. A cell no candidate hashed into simply never
    joins; a candidate whose cell is absent from the sketch has true
    count 0 and keeps estimate 0 via the left join + coalesce.

    Output: candidates' columns + ``cms_est`` (long, ≥ true count).
    """
    cand_cells = candidates.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("cms_row"),
                        cms_cell(F.col(token_col), r, width).alias("cms_col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("*", F.col("cell.cms_row").alias("cms_row"), F.col("cell.cms_col").alias("cms_col")).drop("cell")
    joined = cand_cells.join(sketch, ["cms_row", "cms_col"], "left")
    others = [c for c in candidates.columns]
    return (
        joined.groupBy(*others)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
