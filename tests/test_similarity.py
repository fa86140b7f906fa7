"""Similarity-search tests — exact top-k correctness, ANN recall vs the
exact path, and no-cartesian plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from diagnosisextraction_ml_spark.operators import similarity
from diagnosisextraction_ml_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
    pairwise_topk_join,
)


def test_brute_force_topk_tiny(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
        (4, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [r["vec_id"] for r in brute_force_topk(df, [1.0, 0.0], k=3).collect()]
    assert got == [1, 2, 3]


def test_lsh_topk_recall_vs_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(v) for v in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_bucketed_topk(emb, q, k=10).collect()]
    # multiprobe hamming-1 over 8 planes: expect to recover most of the
    # true top-10 (including the query itself at rank 1)
    assert approx[0] == 0
    assert len(set(exact) & set(approx)) >= 5


def test_pairwise_topk_no_cartesian_and_sane(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    out = pairwise_topk_join(queries, emb, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, nbrs in by_q.items():
        assert len(nbrs) <= 3
        assert all(n["neighbor_id"] != qid for n in nbrs)
        ranks = sorted(n["rank"] for n in nbrs)
        assert ranks == list(range(1, len(nbrs) + 1))


def test_pairwise_topk_exact_mode_matches_bruteforce(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    rows += [(10 + i, [0.5, 0.5, float(i), 0.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    got = {
        (r["neighbor_id"], r["rank"])
        for r in pairwise_topk_join(q, df, k=2, exact=True).collect()
    }
    exact = brute_force_topk(df.filter(F.col("vec_id") != 0), [1.0, 0.0, 0.0, 0.0], k=2)
    want = {(r["vec_id"], i + 1) for i, r in enumerate(exact.collect())}
    assert got == want


def test_bucketed_corpus_partition_pruning(spark, sf_dir, tmp_path):
    from diagnosisextraction_ml_spark.operators.similarity import (
        _bucket_of,
        bucketed_topk_pruned,
        lsh_bucket_expr,
        write_bucketed_corpus,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "bucketed")
    write_bucketed_corpus(emb, path, n_planes=4)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]

    # driver-side bucket equals the Spark expression's bucket
    spark_bucket = (
        emb.filter(F.col("vec_id") == 0)
        .select(lsh_bucket_expr(F.col("embedding"), 4).alias("b"))
        .collect()[0]["b"]
    )
    assert _bucket_of(q, 4) == spark_bucket

    out = bucketed_topk_pruned(spark, path, q, k=5, n_planes=4)
    rows = out.collect()
    assert rows[0]["vec_id"] == 0  # the query itself
    # partition pruning visible in the scan: 5 probes of 16 buckets
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    # agrees with the in-memory LSH path on the same probes
    from diagnosisextraction_ml_spark.operators.similarity import lsh_bucketed_topk

    mem = [r["vec_id"] for r in lsh_bucketed_topk(emb, q, k=5, n_planes=4).collect()]
    assert [r["vec_id"] for r in rows] == mem


def test_kmeans_ivf_corpus(spark, sf_dir, tmp_path):
    from diagnosisextraction_ml_spark.operators.similarity import (
        ivf_topk_pruned,
        kmeans_centroids,
        nearest_centroid_expr,
        write_ivf_corpus,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_centroids(emb, k=8, iters=2)
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    # deterministic under repartitioning (hash init + decimal means)
    again = kmeans_centroids(emb.repartition(7), k=8, iters=2)
    assert cents == again

    # assignment covers all rows, 0-based cluster ids
    assigned = emb.select(nearest_centroid_expr(F.col("embedding"), cents).alias("c"))
    vals = {r["c"] for r in assigned.distinct().collect()}
    assert vals <= set(range(8)) and len(vals) >= 2

    path = str(tmp_path / "ivf")
    write_ivf_corpus(emb, path, cents)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    out = ivf_topk_pruned(spark, path, q, cents, k=5, n_probe=2)
    rows = out.collect()
    assert rows[0]["vec_id"] == 0  # query's own cluster is probed first
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan


def test_int8_quantization_round_trip_and_bounds(spark, sf_dir):
    import pyspark.sql.functions as F

    from diagnosisextraction_ml_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings_int8,
    )
    from diagnosisextraction_ml_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    q = quantize_embeddings_int8(emb)
    rows = q.join(emb, "vec_id").collect()
    for r in rows:
        assert all(-127 <= v <= 127 for v in r["q"])
        assert len(r["q"]) == len(r["embedding"])
        # per-element reconstruction error ≤ scale/2
        for orig, qv in zip(r["embedding"], r["q"]):
            assert abs(qv * r["scale"] - float(orig)) <= r["scale"] / 2 + 1e-12
    # dequantized cosine stays close to the original (< 0.5% drift)
    deq = dequantize_embeddings(q).join(emb, "vec_id")
    from diagnosisextraction_ml_spark.operators.similarity import cosine_expr

    drift = deq.select(
        F.abs(
            cosine_expr(
                F.transform(F.col("embedding"), lambda x: x.cast("double")),
                F.col("embedding_deq"),
            )
            - 1.0
        ).alias("d")
    ).agg(F.max("d")).collect()[0][0]
    assert drift < 0.005


def test_int8_quantization_zero_vector_safe(spark):
    from diagnosisextraction_ml_spark.operators.similarity import quantize_embeddings_int8

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings_int8(df).collect()}
    assert rows[1]["scale"] == 0.0 and rows[1]["q"] == [0, 0, 0]
    assert rows[2]["q"][1] == -127  # max-magnitude element hits the rail


# ---------------------------------------------------------------------------
# SRP text featurizer
# ---------------------------------------------------------------------------


def test_srp_identical_texts_identical_vectors(spark):
    df = spark.createDataFrame(
        [(1, "spark join hash"), (2, "spark join hash"), (3, "totally other words")],
        "doc_id long, text string",
    )
    vecs = {r.doc_id: r.embedding for r in similarity.srp_embed_text(df).collect()}
    assert vecs[1] == vecs[2]
    assert vecs[1] != vecs[3]
    assert len(vecs[1]) == 16


def test_srp_cosine_tracks_text_similarity(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely unrelated vocabulary entirely disjoint tokens"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import math

    vecs = {r.doc_id: r.embedding for r in similarity.srp_embed_text(df).collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(sum(x * x for x in a) * sum(x * x for x in b))

    assert cos(vecs[1], vecs[2]) > cos(vecs[1], vecs[3])


def test_srp_empty_docs_drop(spark):
    df = spark.createDataFrame(
        [(1, "some text"), (2, ""), (3, None)], "doc_id long, text string"
    )
    got = {r.doc_id for r in similarity.srp_embed_text(df).collect()}
    assert got == {1}


def test_srp_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} shared word") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(
        (r.doc_id, tuple(r.embedding))
        for r in similarity.srp_embed_text(df.repartition(8)).collect()
    )
    b = sorted(
        (r.doc_id, tuple(r.embedding))
        for r in similarity.srp_embed_text(df.coalesce(1)).collect()
    )
    assert a == b


def test_srp_feeds_semantic_dedup_end_to_end(spark):
    from diagnosisextraction_ml_spark.operators import dedup

    rows = [(i, f"unique document number {i} with words w{i} x{i}") for i in range(20)]
    rows += [(100 + i, rows[i][1]) for i in range(5)]  # 5 exact copies
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = similarity.srp_embed_text(df).withColumnRenamed("doc_id", "vec_id")
    out = {r.vec_id: r.is_dup for r in
           dedup.semantic_dedup(emb, k=4, iters=2, tau=0.99).collect()}
    for i in range(5):
        assert out[100 + i] is True   # copy flagged
        assert out[i] is False        # original kept


def test_gram_matrix_vs_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 5).astype(np.float32)
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["i"], r["j"]): r["sum_prod"]
        for r in similarity.gram_matrix_quantized(df, quant=1000).collect()
    }
    q = np.round(vecs.astype(np.float64) * 1000.0)
    want = q.T @ q
    assert len(got) == 5 * 6 // 2
    for (i, j), v in got.items():
        assert j >= i
        assert v == int(want[i, j])
    # partition invariance (exact integers — any accumulation order)
    got1 = sorted(map(tuple, similarity.gram_matrix_quantized(df.coalesce(1), quant=1000).collect()))
    got5 = sorted(map(tuple, similarity.gram_matrix_quantized(df.repartition(5), quant=1000).collect()))
    assert got1 == got5


def test_pca_project_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    # anisotropic cloud so the principal directions are well-separated
    base = rng.randn(60, 4) * np.array([10.0, 3.0, 1.0, 0.3])
    vecs = base.astype(np.float32)
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    projected, eigvals = similarity.pca_project(df, k=2)
    got = {r["vec_id"]: (r["pc0"], r["pc1"]) for r in projected.collect()}

    x = vecs.astype(np.float64)
    w, v = np.linalg.eigh(x.T @ x)
    order = np.argsort(w)[::-1][:2]
    comps = []
    for idx in order:
        c = v[:, idx]
        a = int(np.argmax(np.abs(c)))
        comps.append(-c if c[a] < 0 else c)
    want = x @ np.stack(comps, axis=1)
    # quantization at 1e-6 per element + 6dp rounding → loose-ish gate
    for i in range(60):
        assert abs(got[i][0] - want[i, 0]) < 1e-3
        assert abs(got[i][1] - want[i, 1]) < 1e-3
    assert eigvals[0] > eigvals[1] > 0
    # top eigenvalue ≈ numpy's (Gram quantization noise only)
    assert abs(eigvals[0] - w[order[0]]) / w[order[0]] < 1e-4


def test_pca_project_validates_k(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        similarity.pca_project(df, k=3)


# ---------------------------------------------------------------------------
# numpy BLAS argmin assignment vs the expression path (the oracle's
# witness): these pins are what license serving assign="numpy" against
# the expression-replay DuckDB twins (sim_ivf_assign, dedup_semantic,
# pipeline_text_semdedup).
# ---------------------------------------------------------------------------


def test_assign_numpy_matches_expr_real_embeddings(spark, sf_dir):
    from diagnosisextraction_ml_spark.operators.similarity import (
        assign_nearest_centroid_numpy,
        kmeans_centroids,
        nearest_centroid_expr,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # identical centroids from both assignment engines (argmin flips
    # would perturb the per-cluster means)
    c_np = kmeans_centroids(emb, k=8, iters=2, assign="numpy")
    c_ex = kmeans_centroids(emb, k=8, iters=2, assign="expr")
    assert c_np == c_ex
    want = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id", nearest_centroid_expr(F.col("embedding"), c_ex).alias("c")
        ).collect()
    }
    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_nearest_centroid_numpy(
            emb.select("vec_id", "embedding"), c_np
        ).collect()
    }
    assert got == want


@pytest.mark.slow
def test_assign_numpy_matches_expr_srp_corpus(spark, sf_dir):
    """Parity at pipeline_text_semdedup's registered params (k=32,
    iters=2, dim=16) over the SRP projection of the real documents —
    the exact integer-component vectors the registry query assigns."""
    from diagnosisextraction_ml_spark.operators.similarity import (
        assign_nearest_centroid_numpy,
        kmeans_centroids,
        nearest_centroid_expr,
        srp_embed_text,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = srp_embed_text(docs, dim=16).withColumnRenamed(
        "doc_id", "vec_id"
    ).localCheckpoint()
    c_np = kmeans_centroids(emb, k=32, iters=2, assign="numpy")
    c_ex = kmeans_centroids(emb, k=32, iters=2, assign="expr")
    assert c_np == c_ex
    want = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id", nearest_centroid_expr(F.col("embedding"), c_ex).alias("c")
        ).collect()
    }
    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_nearest_centroid_numpy(
            emb.select("vec_id", "embedding"), c_np
        ).collect()
    }
    assert got == want


def test_assign_numpy_tie_and_zero_norm_semantics(spark):
    """Exact ties -> lowest centroid index (first-match argmin), and
    zero-norm vectors/centroids RAISE on both paths (ANSI
    DIVIDE_BY_ZERO on the expression side)."""
    import pytest as _pytest

    from diagnosisextraction_ml_spark.operators.similarity import (
        assign_nearest_centroid_numpy,
        nearest_centroid_expr,
    )

    rows = [
        (1, [1.0, 0.0]),   # exact tie between colinear centroids 0/1
        (3, [0.0, 1.0]),
    ]
    cents = [[2.0, 0.0], [4.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = {
        r["vec_id"]: r["c"]
        for r in df.select(
            "vec_id", nearest_centroid_expr(F.col("embedding"), cents).alias("c")
        ).collect()
    }
    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_nearest_centroid_numpy(df, cents).collect()
    }
    assert got == want == {1: 0, 3: 2}

    zero_vec = spark.createDataFrame(
        [(2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        zero_vec.select(
            nearest_centroid_expr(F.col("embedding"), cents).alias("c")
        ).collect()
    with _pytest.raises(Exception, match="zero-norm"):
        assign_nearest_centroid_numpy(zero_vec, cents).collect()
    with _pytest.raises(ArithmeticError, match="zero-norm centroid"):
        assign_nearest_centroid_numpy(df, [[0.0, 0.0], [1.0, 0.0]])


def test_frozen_pca_components_match_live_trainer(spark, sf_dir):
    """FIXED_PCA_COMPONENTS_Q must equal the live pca_project trainer's
    sign-canonicalized eigenvectors on the sf0.001 embeddings,
    quantized the same way — catches frozen-artifact drift if the
    testdata generator or the trainer changes."""
    import numpy as np

    from diagnosisextraction_ml_spark.plans.frozen_artifacts import (
        FIXED_PCA_COMPONENTS_Q,
    )

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, _ = similarity.pca_project(df, k=8)  # validates inputs
    # replicate the trainer driver-side (int64-exact Gram -> eigh)
    E = np.array(
        [r["embedding"] for r in df.orderBy("vec_id").collect()], dtype=np.float64
    )
    q = np.round(E * 1e6).astype(np.int64)
    gram = (q.T @ q) / 1e12
    eigvals, eigvecs = np.linalg.eigh(gram)
    comps = []
    for idx in np.argsort(eigvals)[::-1][:8]:
        v = eigvecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append([int(x) for x in np.round(v * 1e6).astype(np.int64)])
    assert comps == FIXED_PCA_COMPONENTS_Q


def test_pca_project_frozen_exact_integer_dot(spark):
    """pca_project_frozen must equal the exact integer replay: for each
    row, pc_j = round(Σ round(x·1e6)·qc_j / 1e12, 6)."""
    import numpy as np

    rows = [
        (0, [0.5, -0.25, 0.125]),
        (1, [1.0, 0.0, -1.0]),
        (2, [0.3333333, 0.6666667, -0.0000005]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    comps = [[1_000_000, 0, 0], [-707_107, 707_107, 0], [333_333, 333_333, 333_334]]
    got = {
        r["vec_id"]: (r["pc0"], r["pc1"], r["pc2"])
        for r in similarity.pca_project_frozen(df, comps).collect()
    }
    for vid, emb in rows:
        qe = np.round(np.array(emb) * 1e6).astype(np.int64)
        want = tuple(
            float(np.round(int(np.dot(qe, np.array(c, dtype=np.int64))) / 1e12, 6))
            for c in comps
        )
        assert got[vid] == want, vid


def test_pca_project_frozen_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    plan = (
        similarity.pca_project_frozen(df, [[1_000_000, 0]])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pipeline_text_semdedup_materializes_featurization_once(spark, sf_dir):
    """Plan-shape pin for the registered pipeline_text_semdedup: the
    SRP featurization must be localCheckpoint-materialized exactly once
    — every downstream consumer (k-means iterations ran eagerly inside
    the call; the returned assignment+pair-scan plan) reads the
    checkpointed RDD, never re-deriving from the documents parquet.
    Guards the 3× within-session A/B win recorded in PERF.md round 10
    against a silent recomposition."""
    from diagnosisextraction_ml_spark.plans.queries import queries

    out = queries()["pipeline_text_semdedup"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the returned plan consumes the checkpoint ...
    assert "ExistingRDD" in plan
    # ... and nothing re-runs the featurization from the source table
    assert "FileScan" not in plan


def test_hard_negative_topk_excludes_same_label(spark):
    """Hard negatives: nearest WRONG-label rows win; same-label
    near-dups never appear even at cosine 1.0; rank counts negatives."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], "a"),   # query
        (1, [1.0, 0.0, 0.0, 0.0], "a"),   # same-label exact dup — excluded
        (2, [0.99, 0.1, 0.0, 0.0], "b"),  # hardest negative
        (3, [0.5, 0.5, 0.0, 0.0], "b"),
        (4, [0.0, 1.0, 0.0, 0.0], "c"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = similarity.hard_negative_topk(
        df.filter(F.col("vec_id") == 0), df, k=2
    ).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got[0] == (2, 1)
    assert all(r["neighbor_label"] != "a" for r in out)
    assert 1 not in {r["neighbor_id"] for r in out}
    # no cartesian in the plan
    plan = (
        similarity.hard_negative_topk(df.filter(F.col("vec_id") == 0), df, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_assign_pruned_full_probe_identical_to_exact(spark, sf_dir):
    """probe = m (all meta-cells probed) covers every centroid, so the
    pruned path must return the exact path's assignment bit-for-bit —
    the invariant that licenses calling smaller probes 'the same
    argmin over fewer candidates'."""
    import numpy as np

    from diagnosisextraction_ml_spark.operators.similarity import (
        assign_nearest_centroid_numpy,
        assign_nearest_centroid_pruned,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_centroids(emb, k=25, iters=1, assign="numpy")
    m = int(np.ceil(np.sqrt(25)))
    exact = {
        r["vec_id"]: r["cluster"]
        for r in assign_nearest_centroid_numpy(
            emb.select("vec_id", "embedding"), cents
        ).collect()
    }
    pruned = {
        r["vec_id"]: r["cluster"]
        for r in assign_nearest_centroid_pruned(
            emb.select("vec_id", "embedding"), cents, probe=m
        ).collect()
    }
    assert pruned == exact


def test_assign_pruned_small_probe_agreement_and_regret(spark, sf_dir):
    """At small probe the pruned argmin is approximate: pin BOTH the
    agreement rate (the overwhelming majority of rows keep their exact
    centroid) and the cosine regret of every disagreement (the chosen
    candidate is nearly as close as the true argmin — a boundary-row
    reshuffle, never a wild miss). Measured on the SRP document
    projections — the actual SemDeDup input; structureless
    uniform-random vectors (the embeddings fixture) defeat any
    inverted-file index by construction and are NOT a fair probe
    corpus. Deterministic end-to-end (hash init, no RNG): sf0.001
    measured 98.8% agreement / 0.041 regret at probe=3 of m=5; pinned
    with headroom."""
    import numpy as np

    from diagnosisextraction_ml_spark.operators.similarity import (
        assign_nearest_centroid_numpy,
        assign_nearest_centroid_pruned,
        kmeans_centroids,
        srp_embed_text,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = srp_embed_text(docs, dim=16).withColumnRenamed(
        "doc_id", "vec_id"
    ).localCheckpoint()
    cents = kmeans_centroids(emb, k=25, iters=2, assign="numpy")
    C = np.asarray(cents)
    C_hat = C / np.sqrt((C * C).sum(axis=1))[:, None]
    exact = {
        r["vec_id"]: r["cluster"]
        for r in assign_nearest_centroid_numpy(
            emb.select("vec_id", "embedding"), cents
        ).collect()
    }
    rows = assign_nearest_centroid_pruned(
        emb.select("vec_id", "embedding"), cents, probe=3
    ).collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    pruned = {r["vec_id"]: r["cluster"] for r in rows}
    n = len(exact)
    agree = sum(1 for i in exact if pruned[i] == exact[i])
    assert agree / n >= 0.95, f"agreement {agree}/{n}"
    worst = 0.0
    for i in exact:
        if pruned[i] == exact[i]:
            continue
        x = vecs[i] / np.sqrt((vecs[i] * vecs[i]).sum())
        worst = max(worst, float(x @ C_hat[exact[i]] - x @ C_hat[pruned[i]]))
    assert worst <= 0.10, f"cosine regret {worst}"


def test_assign_pruned_zero_norm_raises(spark):
    import pytest

    from diagnosisextraction_ml_spark.operators.similarity import (
        assign_nearest_centroid_pruned,
    )

    ok = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0])], ["vec_id", "embedding"]
    )
    cents = [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5], [-1.0, 0.0]]
    with pytest.raises(Exception, match="zero-norm"):
        assign_nearest_centroid_pruned(ok, cents, probe=1).collect()
    with pytest.raises(Exception, match="zero-norm centroid"):
        assign_nearest_centroid_pruned(
            ok.filter("vec_id = 1"), [[0.0, 0.0], [1.0, 0.0]], probe=1
        )


def test_semantic_dedup_probe_knob_end_to_end(spark, sf_dir):
    """assign_probe routes training AND final assignment through the
    pruned path; exact duplicates project identically so they land in
    the same cluster under ANY assignment and must still come back
    is_dup — the dedup property survives the approximation."""
    import pyspark.sql.functions as F

    from diagnosisextraction_ml_spark.operators.dedup import semantic_dedup
    from diagnosisextraction_ml_spark.operators.similarity import srp_embed_text

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(400)
    )
    dup = docs.limit(25).withColumn("doc_id", F.col("doc_id") + 10_000_000)
    emb = srp_embed_text(docs.unionByName(dup), dim=16).withColumnRenamed(
        "doc_id", "vec_id"
    ).localCheckpoint()
    out = semantic_dedup(emb, k=16, iters=1, tau=0.99, assign_probe=2)
    flagged = {r["vec_id"] for r in out.filter("is_dup").collect()}
    # every injected twin pair has one member flagged (the higher id)
    assert {r["vec_id"] for r in dup.select(
        F.col("doc_id").alias("vec_id")).collect()} <= flagged
    assert out.count() == emb.count()


def test_assign_pruned_empty_probed_cells_fall_back_to_exact(spark, monkeypatch):
    """Lloyd can leave a meta-cell memberless; a row whose probed cells
    are ALL empty must fall back to the exact argmin instead of
    silently landing on centroid 0."""
    import numpy as np

    import diagnosisextraction_ml_spark.operators.similarity as sim

    # meta layout forced: cell 0 is EMPTY (every centroid lives in
    # cell 1); a row pointing at (1, 0) top-1-probes cell 0
    def forced_meta(C_hat, m, iters=10):
        M = np.asarray([[1.0, 0.0], [0.0, 1.0]])
        return M, np.asarray([1, 1, 1])

    monkeypatch.setattr(sim, "_meta_cluster_centroids", forced_meta)
    cents = [[0.0, 1.0], [0.1, 0.9], [0.9, 0.1]]
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in sim.assign_nearest_centroid_pruned(df, cents, probe=1).collect()
    }
    assert got[1] == 2  # fallback found the true nearest, not index 0
    assert got[2] == 0


def test_semantic_dedup_rejects_probe_on_expr_path(spark):
    """ADVICE r14: assign_probe with method='expr' used to be silently
    ignored (exact assignment, no warning) — now a loud ValueError."""
    import pytest as _pytest

    from diagnosisextraction_ml_spark.operators.dedup import semantic_dedup

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="assign_probe requires"):
        semantic_dedup(emb, k=2, iters=1, method="expr", assign_probe=2)


def test_semantic_dedup_auto_k_applies_advisor_rule(spark):
    """k='auto' sizes the clustering by the advisor's measured rule
    (k = max(32, n/2000); exact assignment below the n·k wall) and is
    bit-identical to spelling that configuration out by hand."""
    from diagnosisextraction_ml_spark.operators.dedup import semantic_dedup
    from diagnosisextraction_ml_spark.sources.advisor import advise_semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    advice = advise_semdedup(n)
    assert advice.k == 32 and advice.assign_probe is None  # below the wall

    auto = sorted(
        map(tuple, semantic_dedup(emb, k="auto", iters=1, tau=0.99).collect())
    )
    manual = sorted(
        map(tuple, semantic_dedup(emb, k=advice.k, iters=1, tau=0.99).collect())
    )
    assert auto == manual and len(auto) == n


def test_semantic_dedup_rejects_non_int_k(spark):
    import pytest as _pytest

    from diagnosisextraction_ml_spark.operators.dedup import semantic_dedup

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="int or 'auto'"):
        semantic_dedup(emb, k="all")
