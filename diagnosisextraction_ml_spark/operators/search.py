"""BM25 full-text retrieval — an inverted index as relational algebra.

North-star extension (no reference counterpart — the reference's only
retrieval is the word-match regex, src/TextClassification.py:57-75):
corpus search is a first-class need of a training-data pipeline
(querying for contamination, curating topical subsets, building
retrieval-augmented eval sets). Okapi BM25 with the Lucene idf variant
is the standard ranking function, and it decomposes cleanly into
DataFrame algebra:

- **Index build** (one corpus pass, two shuffles): ``postings(term,
  doc_id, tf)`` from an explode + groupBy; document length ``dl`` is
  recovered from the postings themselves (Σ tf per doc — no second
  tokenization) and joined back so scoring never touches a per-doc
  side table; ``dfreq(term, df)`` is a vocabulary-sized aggregate.
- **Scoring** (per query batch): query terms are a tiny literal
  relation — the ``postings ⋈ query_terms`` broadcast join prunes the
  index to the query vocabulary *before* anything wide happens, so
  score work is proportional to the matched postings, not the corpus.
  Corpus scalars (N, Σdl) ride along as a 1-row broadcast — Catalyst
  folds the constant-key join to a BroadcastNestedLoopJoin whose build
  side is a single row, the same plan scalar subqueries get: constant
  append per row, nothing cartesian about it.
- **Determinism**: idf is quantized to integer micro-nats the moment
  it leaves ``ln`` (the engine's standard dodge for libm's last ulp);
  each term's partial score is one exactly-rounded double
  multiply-divide chain — written in the same association order in the
  DuckDB oracle — rounded back to integer micro-units, and the per-doc
  sum is then integer arithmetic, exact in any accumulation order.
  Top-k carries the (score desc, doc_id asc) total order.

At 100 TB: the index build is the same shape as word-count (Zipf-small
vocabulary aggregate + postings shuffle partitioned by (term, doc));
a query batch touches only the posting lists of its terms. Nothing is
ever collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diagnosisextraction_ml_spark.operators.textstats import ws_tokens

BM25_K1 = 1.2
BM25_B = 0.75


def build_bm25_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(postings, dfreq, stats) — the three index relations.

    postings: (id, term, tf, dl) — dl denormalized in so scoring is
    self-contained; dfreq: (term, df); stats: 1 row (n_docs, total_dl).
    """
    tok = docs.select(
        F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("term")
    )
    postings = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    postings = postings.join(dl, [id_col])
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    return postings, dfreq, stats


def bm25_topk(
    docs: DataFrame,
    query_terms: list[tuple[str, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents per query: (query_id, rank, id, score_micro).

    ``query_terms`` is [(query_id, term), ...] — already-tokenized
    queries (a retrieval batch is metadata-sized by definition).
    Scores are integer micro-nat-scaled BM25; ties break on id asc.
    """
    spark = docs.sparkSession
    postings, dfreq, stats = build_bm25_index(docs, text_col, id_col)
    qt = spark.createDataFrame(query_terms, "query_id string, term string")

    one = F.lit(1).alias("j")
    st = stats.select(one, "n_docs", "total_dl")
    # idf per (query, term), micro-nat integer from the start
    idf = (
        qt.join(F.broadcast(dfreq), ["term"])
        .select("query_id", "term", "df", one)
        .join(F.broadcast(st), ["j"])
        .select(
            "query_id",
            "term",
            F.round(
                F.lit(1_000_000.0)
                * F.log(
                    (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
                    / (F.col("df").cast("double") + F.lit(0.5))
                    + F.lit(1.0)
                ),
                0,
            )
            .cast("long")
            .alias("idf_micro"),
        )
    )
    matched = (
        postings.join(F.broadcast(idf), ["term"])
        .select("query_id", id_col, "tf", "dl", "idf_micro", one)
        .join(F.broadcast(st), ["j"])
    )
    tf_d = F.col("tf").cast("double")
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    term_score = (
        F.round(
            (F.col("idf_micro").cast("double") * (tf_d * F.lit(1.0 + BM25_K1)))
            / (
                tf_d
                + F.lit(BM25_K1)
                * (
                    F.lit(1.0 - BM25_B)
                    + F.lit(BM25_B) * (F.col("dl").cast("double") / avgdl)
                )
            ),
            0,
        )
        .cast("long")
        .alias("s")
    )
    per_doc = (
        matched.select("query_id", id_col, term_score)
        .groupBy("query_id", id_col)
        .agg(F.sum("s").alias("score_micro"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc(id_col)
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "score_micro")
    )


QLD_MU = 1000


def qld_topk(
    docs: DataFrame,
    query_terms: list[tuple[str, str]],
    k: int = 10,
    mu: int = QLD_MU,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing — the second
    classical ranking model next to :func:`bm25_topk` (Zhai & Lafferty
    2004; QL wins on verbose queries where BM25's saturation hurts).

    score(q, d) = Σ_{t∈q} ln((tf + μ·cf_t/|C|) / (|d| + μ)), computed
    through the standard rank-equivalent split so only MATCHED postings
    do term work:

        Σ_{t∈q∩d} ln(1 + tf·|C| / (μ·cf_t))  +  |q| · ln(μ / (|d|+μ))

    — the first part joins the query-pruned postings (broadcast of the
    tiny query relation, same shape as BM25), the second is a per-doc
    constant folded in at the aggregation. Both ln results are
    quantized to integer micro-nats immediately (same discipline as
    the idf path), so the per-doc sum is exact integer arithmetic and
    the ranking is bit-identical across engines/partitionings.

    Output: (query_id, rank, id, score_micro), ties on id asc.
    """
    spark = docs.sparkSession
    postings, _dfreq, stats = build_bm25_index(docs, text_col, id_col)
    cfreq = postings.groupBy("term").agg(F.sum("tf").alias("cf"))
    qt = spark.createDataFrame(query_terms, "query_id string, term string")
    nq = qt.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_q"))

    one = F.lit(1).alias("j")
    st = stats.select(one, "total_dl")
    qterms = (
        qt.join(F.broadcast(cfreq), ["term"])
        .select("query_id", "term", "cf", one)
        .join(F.broadcast(st), ["j"])
        .select("query_id", "term", "cf", "total_dl")
    )
    matched = postings.join(F.broadcast(qterms), ["term"])
    part = (
        F.round(
            F.lit(1_000_000.0)
            * F.log(
                F.lit(1.0)
                + (F.col("tf").cast("double") * F.col("total_dl").cast("double"))
                / (F.lit(float(mu)) * F.col("cf").cast("double"))
            ),
            0,
        )
        .cast("long")
        .alias("s")
    )
    per_doc = (
        matched.select("query_id", id_col, "dl", part)
        .groupBy("query_id", id_col)
        .agg(F.sum("s").alias("s_matched"), F.min("dl").alias("dl"))
    )
    dl_term = F.round(
        F.lit(1_000_000.0)
        * F.log(F.lit(float(mu)) / (F.col("dl").cast("double") + F.lit(float(mu)))),
        0,
    ).cast("long")
    scored = per_doc.join(F.broadcast(nq), ["query_id"]).select(
        "query_id",
        id_col,
        (F.col("s_matched") + F.col("n_q") * dl_term).alias("score_micro"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score_micro"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "score_micro")
    )


RRF_K = 60


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of ranker outputs (Cormack et al. 2009) —
    the standard way to combine BM25 + QL (+ dense) lists without
    score calibration: fused(d) = Σ_r 1/(rrf_k + rank_r(d)).

    Each input carries (query_id, rank, id) from a ``*_topk`` call.
    The contribution is quantized to exact micro-units per (ranker,
    doc) — round(10⁶/(rrf_k+rank)) — so the fused sum is integer
    arithmetic: deterministic ties, engine-identical hashes. Union +
    one groupBy; the inputs are already top-k-sized per query.

    Output: (query_id, rank, id, rrf_micro).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contrib = None
    for r in rankings:
        c = r.select(
            "query_id",
            F.col(id_col),
            F.round(F.lit(1_000_000.0) / (F.lit(float(rrf_k)) + F.col("rank")), 0)
            .cast("long")
            .alias("c"),
        )
        contrib = c if contrib is None else contrib.unionByName(c)
    fused = contrib.groupBy("query_id", id_col).agg(
        F.sum("c").alias("rrf_micro")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_micro"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "rrf_micro")
    )
