"""Temporal joins (north-star extension — no reference counterpart).

Training-data pipelines constantly need "attach the latest X as of
this row's timestamp" (feature snapshots, model versions, account
state). Spark has no native as-of join; the scale-correct composition
is the union-and-carry pattern below — NOT a range cross-join:

    tag sides → unionByName → one window partitioned by key ordered by
    (ts, side) → last(value, ignorenulls) carries the right side's
    attributes forward → keep left rows.

Cost: exactly one shuffle (the window partitioning), state O(1) per
row during the sort — the same shape as sessionization. A range
condition expressed as a join predicate would instead make Catalyst
fall back to a broadcast-nested-loop/cartesian product over each key's
rows; this stays a single Exchange at any key cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    value_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    out_prefix: str = "asof_",
) -> DataFrame:
    """Backward (inclusive) as-of join.

    For every ``left`` row, attach ``value_cols`` from the *latest*
    ``right`` row of the same ``on`` key with
    ``right_ts <= left_ts`` — i.e. DuckDB's
    ``l ASOF LEFT JOIN r ON l.key = r.key AND l.ts >= r.ts``
    (the ``asof_events_value`` driver oracle states exactly that).
    Left rows with no prior right row get nulls.

    Determinism: at equal (key, ts) the right row sorts before the
    left row (inclusive match), and duplicate right rows at the same
    (key, ts) are tie-broken by their value columns so the carried
    value never depends on partition layout. Callers who care which
    duplicate wins should pre-dedup the right side.

    Output: every left column plus ``{out_prefix}{v}`` per value col.
    """
    on = list(on)
    value_cols = list(value_cols)
    carried = [f"__r_{v}" for v in value_cols]

    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    for v, c in zip(value_cols, carried):
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(right.schema[v].dataType))

    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(c) for v, c in zip(value_cols, carried)],
    )
    for col_name in l_tagged.columns:
        if col_name not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(
                col_name, F.lit(None).cast(dict(l_tagged.dtypes)[col_name])
            )

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), *[F.col(c).asc() for c in carried])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for v, c in zip(value_cols, carried):
        out = out.withColumn(f"{out_prefix}{v}", F.last(F.col(c), ignorenulls=True).over(w))
    return (
        out.filter(F.col("__side") == 1)
        .drop("__ts", "__side", *carried)
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Range join: point rows matched to [start, end) interval rows.

    Naively this is a non-equi predicate, which Catalyst can only run
    as a broadcast-nested-loop / cartesian per key. The scale shape is
    *bucketization*: every interval explodes to the time buckets it
    covers (⌈len/width⌉+1 rows — bounded fan-out when
    ``bucket_width`` is chosen near the typical interval length), each
    point maps to exactly one bucket, and the match becomes a hash
    equi-join on (key..., bucket) + a residual predicate. Same trick
    production range-join optimizers apply under the hood.

    ``point_ts``/``start_col``/``end_col`` must be numeric (epoch
    seconds); intervals require ``end >= start``. Output: all columns
    of both inputs (point columns first), one row per matching pair.
    """
    on = list(on)
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                F.floor(F.col(end_col) / bucket_width),
            )
        ),
    )
    pt = points.withColumn("__b", F.floor(F.col(point_ts) / bucket_width))
    return (
        pt.join(iv, on=[*on, "__b"])
        .filter(
            (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
        )
        .drop("__b")
    )


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str],
    prefix_len: int = 0,
    max_dist: int = 1,
    max_block: int = 200,
) -> DataFrame:
    """Entity-resolution candidate pairs: blocking + edit-distance verify.

    The standard record-linkage shape: a cheap *blocking key* (exact
    columns plus an optional name prefix) restricts the quadratic
    comparison to within-block pairs, then Levenshtein distance (a JVM
    builtin — no Python in the loop) verifies candidates. Pairs are
    emitted once (id_a < id_b) with their distance.

    Blocking is a recall/cost trade like every canopy method: a pair
    whose names differ inside the prefix lands in different blocks and
    is missed — production runs union several block passes (different
    prefixes / phonetic keys), each a rerun of this operator.

    Scale design (mirrors the LSH-bucket discipline in dedup.py):

    - one groupBy(block) collects each block's (id, name) structs with
      map-side combine; only ids and names shuffle;
    - pair expansion happens inside a block via the same in-bucket
      expansion as LSH banding — there is NO self-join re-deriving the
      input per side and no cartesian anywhere;
    - ``max_block`` caps pathological blocks (a boilerplate name shared
      by millions of records would otherwise make one task quadratic) —
      dropped blocks are observable: they surface as a ``blocked_out``
      marker row count in the companion audit (filter on
      ``block_size > max_block`` before the cap to see them).
    """
    block_cols = list(block_cols)
    key = [*block_cols]
    tagged = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        *[F.col(c) for c in block_cols],
    )
    if prefix_len > 0:
        tagged = tagged.withColumn("__pfx", F.substring("name", 1, prefix_len))
        key.append("__pfx")
    grouped = tagged.groupBy(*key).agg(
        F.array_sort(F.collect_list(F.struct("id", "name"))).alias("members")
    )
    capped = grouped.filter(F.size("members").between(2, max_block))
    pairs = capped.select(*key, F.explode("members").alias("a"), "members")
    pairs = pairs.select(
        *key,
        "a",
        F.explode(F.filter("members", lambda m: m.id > F.col("a.id"))).alias("b"),
    )
    out = pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.levenshtein("a.name", "b.name").alias("dist"),
    ).filter(F.col("dist") <= max_dist)
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt_expr: Column,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with manual key salting — the big⋈big skew tool for
    when AQE's skew-join splitting isn't available (non-shuffle-join
    plans, stateful streaming joins) or a single key exceeds what one
    split can hold.

    Mechanics: the skewed LEFT side scatters each row into one of
    ``salts`` sub-keys via ``salt_expr`` (any per-row expression — a
    hash of a high-cardinality column; correctness never depends on
    it, only balance does); the RIGHT side replicates each row into
    ALL ``salts`` sub-keys (one ``explode(sequence(...))``, a salts×
    fan-out — so keep the right side the smaller one). The join then
    runs on (key, salt), splitting a hot key's rows across ``salts``
    tasks instead of one straggler.

    Result is EXACTLY the plain equi-join (test-pinned): every left
    row meets every matching right row exactly once. Only inner and
    left joins are supported — for right/full joins the replicated
    side would multiply unmatched-row NULLs.

    At 100 TB: the left side shuffles once on (key, salt) exactly as it
    would on key; the right side's shuffle grows salts×, which is the
    explicit price of de-skewing — pick ``salts`` ≈ hot-key rows /
    healthy-partition rows.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join: how={how!r} (only inner/left)")
    for df, col in ((left, "__salt"), (right, "__rsalt")):
        if col in df.columns:
            raise ValueError(f"salted_join: input already has a {col} column")
    # NULL salt_expr would make the (key, salt) condition never match,
    # silently dropping rows whose keys DO match — coalesce to bucket 0
    # so nullable salt sources stay correct (only balance degrades).
    lf = left.withColumn(
        "__salt",
        F.coalesce(F.pmod(salt_expr, F.lit(salts)), F.lit(0)).cast("int"),
    )
    rt = right.withColumn(
        "__rsalt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    cond = (lf[left_key] == rt[right_key]) & (lf["__salt"] == rt["__rsalt"])
    return lf.join(rt, cond, how).drop("__salt", "__rsalt")
