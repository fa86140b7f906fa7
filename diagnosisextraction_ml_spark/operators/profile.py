"""Data-quality profiling — per-column stats and expectation checks.

North-star extension (no reference counterpart): before a 100 TB
corpus is trusted, a pipeline profiles it — null rates, distinct
cardinalities, ranges — and gates on expectations ("ship only if
null_frac(text) < 0.1%"). Both passes below are single-scan
aggregations, the cheapest possible shape:

- :func:`profile_columns` computes every column's stats in ONE
  aggregate over ONE scan (all measures are algebraic, so map-side
  combine reduces each task to a single row before the 1-row
  Exchange). Exact ``count_distinct`` over many high-cardinality
  columns widens the partial state; callers profiling wide fact
  tables at full scale can flip ``approx=True`` to HyperLogLog++
  state (constant size, Spark's `approx_count_distinct`) — the
  default stays exact because exact is oracle-checkable.
- :func:`check_expectations` evaluates boolean rules as
  ``sum(case when ...)`` counters in the same single-scan shape and
  returns one row per rule — composing a CI gate is a ``filter`` on
  the violation count.

Output is long-form (one row per column / rule), not wide-form: long
survives schema evolution (a new column is a new row, not a new
output column) and keeps the result a stable driver-size relation.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """One row per column: count, nulls, distincts, min/max (as strings).

    min/max are cast to string so heterogeneous column types fit one
    long-form schema; numeric consumers re-cast. All counters are
    exact 64-bit ints (``approx=False``) so the relation is
    engine-reproducible. ``cols`` must be simple top-level names (they
    are reused as struct-field aliases).
    """
    cols = list(cols)
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs: list[Column] = []
    for c in cols:
        aggs.append(
            F.struct(
                F.count(F.lit(1)).alias("n_rows"),
                F.count(F.col(c)).alias("n_nonnull"),
                distinct(c).alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_val"),
                F.max(F.col(c)).cast("string").alias("max_val"),
            ).alias(c)
        )
    row = df.agg(*aggs)
    # one row -> one row per column, via an explode of literal structs
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("column"), F.col(c).alias("s"))
            for c in cols
        ]
    )
    return (
        row.select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.column").alias("column"),
            F.col("p.s.n_rows").alias("n_rows"),
            F.col("p.s.n_nonnull").alias("n_nonnull"),
            (F.col("p.s.n_rows") - F.col("p.s.n_nonnull")).alias("n_null"),
            F.col("p.s.n_distinct").alias("n_distinct"),
            F.col("p.s.min_val").alias("min_val"),
            F.col("p.s.max_val").alias("max_val"),
        )
    )


def check_expectations(
    df: DataFrame, rules: Mapping[str, Column]
) -> DataFrame:
    """Evaluate named boolean rules in one scan.

    ``rules`` maps rule name → boolean Column that should hold for
    every row. Output: (rule, n_rows, n_violations, pass) — a rule
    with null predicate result counts as a violation (nulls are
    exactly the rows one forgot to think about). Rule names become
    intermediate column aliases, so the output-schema names are
    reserved.
    """
    names = list(rules)
    reserved = {"__n", "rule", "n_rows", "n_violations", "pass"}
    bad = reserved.intersection(names)
    if bad:
        raise ValueError(f"reserved rule names: {sorted(bad)}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name in names:
        ok = F.coalesce(rules[name].cast("boolean"), F.lit(False))
        aggs.append(
            F.sum(F.when(~ok, 1).otherwise(0)).cast("long").alias(name)
        )
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"), F.col(name).alias("n_violations")
            )
            for name in names
        ]
    )
    return row.select(F.col("__n").alias("n_rows"), F.explode(pairs).alias("p")).select(
        F.col("p.rule").alias("rule"),
        F.col("n_rows"),
        F.col("p.n_violations").alias("n_violations"),
        (F.col("p.n_violations") == 0).alias("pass"),
    )


def table_checksum(
    df: DataFrame,
    table_name: str,
    row_hash: Column,
) -> DataFrame:
    """Order-independent table fingerprint: (table, n_rows, xor-checksum).

    ``row_hash`` is a deterministic per-row BIGINT (e.g.
    ``md5_hash64(concat_ws('|', <canonical column renderings>))``); the
    table checksum is the bitwise XOR of all row hashes plus the row
    count. XOR is a commutative, associative, carry-free monoid, so:

    - the checksum is identical at any partitioning / parallelism and
      never overflows (unlike a sum of hashes at 10¹² rows);
    - two tables are byte-equal iff (barring a 2⁻⁶⁰ collision) their
      fingerprints match — the cheap cross-replica / cross-engine
      integrity check before and after a 100 TB migration;
    - it is *incrementally maintainable*: XOR the fingerprint of an
      appended batch in, or a deleted batch out, without rescanning
      history (the same day-2 story as the rollup/upsert operators).

    Caller is responsible for rendering floats/timestamps canonically
    in ``row_hash`` (e.g. price → cents BIGINT, ts → epoch micros):
    engine-native float→string casts are NOT cross-engine stable.
    """
    agg = df.select(row_hash.alias("__h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("coalesce(bit_xor(__h), 0L)").alias("xor_checksum"),
    )
    return agg.select(
        F.lit(table_name).alias("table_name"), "n_rows", "xor_checksum"
    )


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    k: int = 10,
) -> DataFrame:
    """Hot-key skew report for a prospective join/partition key.

    The planning companion to the engine's skew defenses (salted
    group-concat, LSH ``max_bucket``, AQE skew-join): BEFORE running a
    big join, profile the key — top-k hottest values plus the global
    skew ratio max/mean (micro-unit integer: (10⁶·max·n_keys) div
    n_rows). A ratio near 10⁶ means uniform; orders of magnitude above
    means salt or cap.

    One groupBy(key) with map-side combine; the single-row global
    summary re-aggregates the per-key counts and attaches by broadcast.
    Top-k is TakeOrderedAndProject with a (count desc, key asc) total
    order.

    Output: k rows of (key, cnt, n_rows, n_keys, skew_micro).
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint()  # consumed twice (summary + top-k): one input scan
    summary = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("__max"),
    ).select(
        "n_rows",
        "n_keys",
        F.expr("1000000 * __max * n_keys div n_rows").alias("skew_micro"),
    )
    return (
        counts.crossJoin(F.broadcast(summary))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(k)
    )


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two snapshots of a metric —
    the standard "did this feature's distribution move" QC gate
    (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).

    PSI = Σ_bins (pᵢ − qᵢ)·ln(pᵢ/qᵢ) over shared equal-width bins on
    [lo, hi] with under/overflow clamped into the edge bins; add-1
    count smoothing keeps empty bins finite (the conventional
    treatment). Each side is one map-side-combined groupBy to
    ≤ n_bins rows; the PSI terms are computed per bin from EXACT
    integer counts — the one float op (ln of an exact-integer rational)
    is rounded to micro-nats PER BIN before the final integer sum, the
    engine's standard discipline for hash-stable float paths.

    Output: one row per bin (bin, n_base, n_curr, psi_term_micro) plus
    the corpus gate reads ``sum(psi_term_micro)`` — emitted as a
    companion scalar by :func:`psi_total`.
    """
    if n_bins < 2 or not hi > lo:
        raise ValueError("psi_drift needs n_bins >= 2 and hi > lo")
    width = (hi - lo) / n_bins

    def binned(df, out):
        b = F.least(
            F.greatest(
                F.floor((F.col(value_col).cast("double") - lo) / width).cast("int"),
                F.lit(0),
            ),
            F.lit(n_bins - 1),
        )
        return df.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(out)
        )

    bins = F.broadcast(
        base.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    )
    joined = (
        bins.join(binned(base, "n_base"), "bin", "left")
        .join(binned(current, "n_curr"), "bin", "left")
        .na.fill({"n_base": 0, "n_curr": 0})
    )
    # add-1 smoothing; totals via window over the ≤n_bins rows
    from pyspark.sql import Window

    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    staged = joined.select(
        "bin",
        "n_base",
        "n_curr",
        (F.col("n_base") + 1).alias("a"),
        (F.col("n_curr") + 1).alias("b"),
        F.sum(F.col("n_base") + 1).over(w).alias("ta"),
        F.sum(F.col("n_curr") + 1).over(w).alias("tb"),
    )
    # (p - q) * ln(p/q), p = a/ta, q = b/tb; ln of exact-int rational
    p_minus_q = F.col("a") / F.col("ta") - F.col("b") / F.col("tb")
    ln_ratio = (
        F.log(F.col("a").cast("double"))
        - F.log(F.col("ta").cast("double"))
        - F.log(F.col("b").cast("double"))
        + F.log(F.col("tb").cast("double"))
    )
    term = F.round(p_minus_q * ln_ratio * 1_000_000, 0).cast("long")
    return staged.select("bin", "n_base", "n_curr", term.alias("psi_term_micro"))


def psi_total(bins: DataFrame) -> DataFrame:
    """Scalar PSI in micro-nats from :func:`psi_drift` output."""
    return bins.agg(F.sum("psi_term_micro").alias("psi_micro"))


def ks_distance(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    value_range: tuple[float, float],
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance — the
    nonparametric companion to :func:`psi_drift` (no binning choice:
    D = max |F̂_base(v) − F̂_curr(v)| over the merged empirical CDFs).

    Exactness + scale: one union-and-count to per-distinct-value
    (cₐ, c_b) rows, then the curve engine's two-level bucketed cumsum
    (evaluate._bucketed_cumsum — no global window, no single-partition
    Exchange) provides both running counts and grand totals in one
    pass. The sup statistic compares |cₐ·n_b − c_b·nₐ| — exact
    DECIMAL(38,0) cross-multiplication, no float CDF — and the
    micro-unit D with its arg-sup value comes out of one
    TakeOrdered(1). ``value_range`` only balances the cumsum buckets
    (approximate bounds are fine — out-of-range values clamp into the
    edge buckets, order preserved).

    Output: 1 row (n_base, n_curr, ks_micro, at_value) — at_value is
    the smallest value attaining the sup (deterministic tie-break).
    """
    lo, hi = value_range
    if not hi > lo or n_buckets < 1:
        raise ValueError("ks_distance needs value_range hi > lo and n_buckets >= 1")
    from diagnosisextraction_ml_spark.operators.evaluate import _bucketed_cumsum

    tagged = base.select(
        F.col(value_col).cast("double").alias("v"),
        F.lit(1).alias("a"),
        F.lit(0).alias("b"),
    ).unionByName(
        current.select(
            F.col(value_col).cast("double").alias("v"),
            F.lit(0).alias("a"),
            F.lit(1).alias("b"),
        )
    )
    per = tagged.groupBy("v").agg(
        F.sum("a").cast("double").alias("ca"),
        F.sum("b").cast("double").alias("cb"),
    )
    cum = _bucketed_cumsum(
        per,
        "v",
        {"ca": "cum_a", "cb": "cum_b"},
        descending=False,
        n_buckets=n_buckets,
        score_range=value_range,
    )
    na = F.col("__tot_ca").cast("long").cast("decimal(38,0)")
    nb = F.col("__tot_cb").cast("long").cast("decimal(38,0)")
    d = F.abs(
        F.col("cum_a").cast("long").cast("decimal(38,0)") * nb
        - F.col("cum_b").cast("long").cast("decimal(38,0)") * na
    )
    staged = cum.select(
        F.col("__tot_ca").cast("long").alias("n_base"),
        F.col("__tot_cb").cast("long").alias("n_curr"),
        F.expr("CAST(1000000 AS DECIMAL(38,0))").alias("__m"),
        d.alias("__d"),
        na.alias("__na"),
        nb.alias("__nb"),
        F.col("v"),
    ).select(
        "n_base",
        "n_curr",
        F.expr("CAST(__m * __d div (__na * __nb) AS BIGINT)").alias("ks_micro"),
        F.col("v").alias("at_value"),
    )
    return staged.orderBy(F.desc("ks_micro"), F.asc("at_value")).limit(1)


def woe_iv(
    df: DataFrame,
    value_col: str,
    label_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Weight-of-evidence binning + information-value terms — the
    classic feature-screening table (IV < 0.02 useless, 0.1-0.3
    medium, > 0.5 suspicious).

    Same shared-equal-width-bin/add-1 discipline as :func:`psi_drift`,
    with the two distributions being the positives and negatives of
    ONE frame (a single scan with conditional counts — the IV term is
    exactly the PSI term with p = positive mass, q = negative mass,
    and WOE is its ln factor alone). All counts exact integers; the
    single ln per bin is rounded to micro-nats before any summation.

    Output: (bin, n_pos, n_neg, woe_micro, iv_term_micro); total IV =
    sum(iv_term_micro).
    """
    if n_bins < 2 or not hi > lo:
        raise ValueError("woe_iv needs n_bins >= 2 and hi > lo")
    width = (hi - lo) / n_bins
    b = F.least(
        F.greatest(
            F.floor((F.col(value_col).cast("double") - lo) / width).cast("int"),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )
    y = F.col(label_col).cast("long")
    per = df.select(b.alias("bin"), y.alias("y")).groupBy("bin").agg(
        F.sum("y").alias("n_pos"),
        F.sum(F.lit(1) - F.col("y")).alias("n_neg"),
    )
    bins = F.broadcast(
        df.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    )
    joined = bins.join(per, "bin", "left").na.fill({"n_pos": 0, "n_neg": 0})
    from pyspark.sql import Window

    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    staged = joined.select(
        "bin",
        "n_pos",
        "n_neg",
        (F.col("n_pos") + 1).alias("a"),
        (F.col("n_neg") + 1).alias("c"),
        F.sum(F.col("n_pos") + 1).over(w).alias("ta"),
        F.sum(F.col("n_neg") + 1).over(w).alias("tc"),
    )
    ln_ratio = (
        F.log(F.col("a").cast("double"))
        - F.log(F.col("ta").cast("double"))
        - F.log(F.col("c").cast("double"))
        + F.log(F.col("tc").cast("double"))
    )
    p_minus_q = F.col("a") / F.col("ta") - F.col("c") / F.col("tc")
    return staged.select(
        "bin",
        "n_pos",
        "n_neg",
        F.round(ln_ratio * 1_000_000, 0).cast("long").alias("woe_micro"),
        F.round(p_minus_q * ln_ratio * 1_000_000, 0).cast("long").alias("iv_term_micro"),
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    value_range: tuple[float, float],
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact Gini coefficient of a non-negative value distribution —
    the standard concentration/inequality QC (is 1% of customers 90%
    of revenue? is one source 95% of the corpus?).

    With values sorted ascending and rank i = 1..n:
    G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n. Ties collapse exactly: a value v
    with count c entering at inclusive cum-count ``cum`` occupies ranks
    (cum−c, cum], so Σ i over them is c·(cum−c) + c(c+1)/2 — all
    integers. Values are quantized to micro-units up front, the rank
    cumsum runs on the two-level bucketed engine (no global window),
    and the final statistic is one DECIMAL(38,0) integral division:
    gini_micro = (2·S₁ − (n+1)·Σx) div (n·Σx) in micro-units, exact on
    any partitioning and in the SQL twin.

    Requires x ≥ 0 (the classic definition); ``value_range`` only
    balances cumsum buckets. Output: 1 row (n, sum_micro, gini_micro).
    """
    lo, hi = value_range
    if not hi > lo or n_buckets < 1:
        raise ValueError("gini_coefficient needs value_range hi > lo, n_buckets >= 1")
    from diagnosisextraction_ml_spark.operators.evaluate import _bucketed_cumsum

    vm = F.round(F.col(value_col).cast("double") * 1_000_000, 0).cast("long")
    per = (
        df.select(vm.alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .select(F.col("v").cast("double").alias("vk"), "c", F.col("v"))
    )
    cum = _bucketed_cumsum(
        per, "vk", {"c": "cum"}, descending=False,
        n_buckets=n_buckets, score_range=(lo * 1e6, hi * 1e6),
    )
    c = F.col("c").cast("long").cast("decimal(38,0)")
    cumd = F.col("cum").cast("long").cast("decimal(38,0)")
    v = F.col("v").cast("decimal(38,0)")
    s1_term = v * (c * (cumd - c) + c * (c + F.lit(1).cast("decimal(38,0)")) / 2)
    staged = cum.select(
        s1_term.cast("decimal(38,0)").alias("__s1"),
        (v * c).cast("decimal(38,0)").alias("__vx"),
        F.col("__tot_c").cast("long").alias("__n"),
    )
    agg = staged.groupBy("__n").agg(
        F.sum("__s1").alias("s1"), F.sum("__vx").alias("sx")
    )
    # sum_micro final is BIGINT (internal math stays DECIMAL(38,0)):
    # DECIMAL finals hash differently across engines' pandas round-trips
    # (Spark object-Decimal vs DuckDB float64) — round-8 driver finding.
    return agg.select(
        F.col("__n").alias("n"),
        F.col("sx").cast("long").alias("sum_micro"),
        F.expr(
            "CAST(CASE WHEN sx > 0 THEN"
            " (CAST(2000000 AS DECIMAL(38,0)) * s1"
            "  - CAST(1000000 AS DECIMAL(38,0)) * (__n + 1) * sx)"
            " div (CAST(__n AS DECIMAL(38,0)) * sx)"
            " ELSE NULL END AS BIGINT)"
        ).alias("gini_micro"),
    )


def corr_matrix(
    df: DataFrame,
    cols: list[str],
) -> DataFrame:
    """Exact Pearson correlation for every column pair, ONE scan.

    The textbook sufficient statistics — n, Σx, Σx², Σx·y per pair —
    as a single aggregate over one projection (no per-pair passes, no
    `df.stat.corr` loop, which scans once PER PAIR). Sums go through
    DECIMAL(38,12) so they are exact and order-independent; the final
    r = (nΣxy − ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) is a fixed-order
    double expression on those exact sums, rounded to 6 dp (sqrt is
    correctly rounded IEEE — both engines agree at 6 dp).

    At 100 TB this is the only correlation plan that works: k(k+1)/2
    aggregate expressions ride the same partial-aggregate scan, the
    exchange carries one row per map task. Degenerate (zero-variance)
    columns yield NULL r (guarded division), not an error.

    Null contract: columns must be null-free (gate with the QC
    expectations upstream) — n is the ROW count, so a null would
    silently skew r rather than trigger pairwise-complete handling.

    Output: (col_a, col_b, n, r) for a < b, unpivoted to rows.
    """
    dec = "decimal(38,12)"
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(dec)).alias(f"s_{c}"))
        aggs.append(F.sum((F.col(c) * F.col(c)).cast(dec)).alias(f"q_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        aggs.append(F.sum((F.col(a) * F.col(b)).cast(dec)).alias(f"p_{a}_{b}"))
    stats = df.select(*cols).agg(*aggs)

    def r_expr(a: str, b: str):
        n = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        qa, qb = F.col(f"q_{a}").cast("double"), F.col(f"q_{b}").cast("double")
        p = F.col(f"p_{a}_{b}").cast("double")
        cov = n * p - sa * sb
        va = n * qa - sa * sa
        vb = n * qb - sb * sb
        return F.when(
            (va > 0) & (vb > 0), F.round(cov / F.sqrt(va * vb), 6)
        ).otherwise(F.lit(None).cast("double"))

    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("n").alias("n"),
                r_expr(a, b).alias("r"),
            )
            for a, b in pairs
        ]
    )
    return stats.select(F.explode(rows).alias("x")).select(
        "x.col_a", "x.col_b", "x.n", "x.r"
    )


def quantile_normalize_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group percentile rank (strictly-below convention) WITHOUT a
    per-group row window.

    The repo's two-level cumsum doctrine (cf. evaluate.curve_by_
    threshold): aggregate to (group, value) counts — vocabulary-sized —
    cumsum over the ordered DISTINCT values inside each group, then
    join back. The only row-level shuffles are one groupBy and one
    join on (group, value); no `row_number() OVER (PARTITION BY
    group)` that would serialize each group through one task at 100 TB
    (group cardinality is small by construction — that's why you
    normalize per group).

    percentile_micro = 1e6 · |{y in group : y < x}| div (n_group − 1),
    an exact integer; single-row groups yield NULL (guarded). Rows
    with a NULL value drop (the join-back key never matches) — same
    convention as SQL rank functions over a NULLS-excluded domain.
    """
    per_val = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_val.select(
        group_col,
        value_col,
        F.coalesce(F.sum("__c").over(w), F.lit(0)).alias("__below"),
        F.sum("__c").over(Window.partitionBy(group_col)).alias("__n"),
    )
    return df.select(id_col, group_col, value_col).join(
        cum, [group_col, value_col]
    ).select(
        id_col,
        group_col,
        value_col,
        F.when(
            F.col("__n") > 1,
            F.expr("1000000 * __below div (__n - 1)"),
        )
        .otherwise(F.lit(None).cast("long"))
        .alias("pct_micro"),
    )


def observe_qc(
    df: DataFrame,
    rules: Mapping[str, Column],
    name: str = "qc",
):
    """Attach single-pass QC counters to ``df`` via ``Dataset.observe``
    — metrics that ride an action the pipeline ALREADY performs (the
    sink write, a downstream aggregate) instead of a second scan.

    :func:`check_expectations` is the right tool when profiling IS the
    job; this is the right tool when profiling must be free: at 100 TB
    a dedicated expectation pass re-reads the corpus, while an
    observation folds the same ``sum(case when …)`` counters into the
    task metrics of whatever job materializes ``df`` — zero extra
    scans, zero extra shuffles, exact counts.

    ``rules`` maps metric name → boolean Column counting VIOLATIONS
    (same convention as :func:`check_expectations`). Returns
    ``(observed_df, observation)``: run any action on ``observed_df``,
    then ``observation.get`` yields ``{"rows": n, <rule>: violations,
    …}``. The metrics describe the rows that actually flowed through
    the observe node — a gate that also certifies delivered volume.

    KNOWN Spark 4.1.2 interaction (repro'd, test-pinned): once any
    Observation has registered in a session, that session's
    ``ObservationManager`` is reachable from closures that later
    RDD-boundary jobs serialize — an MLlib ``fit`` in the SAME session
    afterwards dies with ``NotSerializableException:
    ObservationManager`` (plain DataFrame jobs are unaffected). The
    manager is per-session and has no public unregister, so when a
    pipeline both observes and trains, run the observation under
    ``spark.newSession()`` (shares the SparkContext; isolates session
    state) — verified to keep the training session clean.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    counters = [F.count(F.lit(1)).alias("rows")] + [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(metric)
        for metric, cond in rules.items()
    ]
    return df.observe(obs, *counters), obs
