"""Wave-9 contracts: the IVF literal/join strategy boundary, index
compaction, and the streaming epoch-manifest sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from variant_load_pipeline_spark import queries as Q

SF = "/root/testdata/sf0.01"


def _probe_rows(spark, path, anchors, strategy, nprobe=3):
    from variant_load_pipeline_spark.operators.clustering import (
        ivf_probe_batch,
    )

    return sorted(
        (r["qid"], r["list_id"])
        for r in ivf_probe_batch(
            spark, path, anchors, nprobe=nprobe, strategy=strategy
        ).collect()
    )


def test_ivf_strategy_auto_boundary_golden(spark, tmp_path):
    """Pins the literal->join auto switch AT the k*dim boundary: exactly
    IVF_LITERAL_MAX_TERMS scalar literals stays literal (the bound is
    inclusive), one list over routes to the broadcast-join argmin, and
    on BOTH sides of the boundary the two strategies produce identical
    probe rows — the 100-TB promise that the route flip is invisible to
    results (the fasta auto-boundary template)."""
    from variant_load_pipeline_spark.operators.clustering import (
        IVF_LITERAL_MAX_TERMS,
        _choose_ivf_strategy,
        write_ivf_index,
    )

    e = Q.load(spark, SF, "embeddings")
    dim = len(e.select("embedding").first()["embedding"])
    k_at = IVF_LITERAL_MAX_TERMS // dim          # k*dim == threshold
    assert k_at * dim == IVF_LITERAL_MAX_TERMS, "fixture dim must divide"
    anchors = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )

    for n_lists, expected in [(k_at, "literal"), (k_at + 1, "join")]:
        path = str(tmp_path / f"ivf_{n_lists}")
        write_ivf_index(
            e.withColumn("label", F.col("vec_id") % n_lists), path
        )
        assert _choose_ivf_strategy(spark, path)[0] == expected, n_lists
        lit = _probe_rows(spark, path, anchors, "literal")
        jn = _probe_rows(spark, path, anchors, "join")
        auto = _probe_rows(spark, path, anchors, "auto")
        assert lit == jn == auto and lit, n_lists
        # every anchor got exactly nprobe probes on both routes
        per_q = {}
        for qid, _ in lit:
            per_q[qid] = per_q.get(qid, 0) + 1
        assert set(per_q.values()) == {3}


def test_ivf_probe_topk_join_strategy_identical(spark, tmp_path):
    """Single-query probe: the Spark-side centroid ranking ('join', the
    production-k path that never collects the centroid table) must
    return exactly the driver-Python ranking's rows."""
    from variant_load_pipeline_spark.operators.clustering import (
        ivf_probe_topk,
        write_ivf_index,
    )

    e = Q.load(spark, SF, "embeddings")
    path = str(tmp_path / "ivf")
    write_ivf_index(e, path)
    qv = [float(x) for x in e.select("embedding").first()["embedding"]]
    rows = lambda s: [
        tuple(r)
        for r in ivf_probe_topk(
            spark, path, qv, nprobe=2, k=7, strategy=s
        ).collect()
    ]
    assert rows("literal") == rows("join") and rows("literal")


def test_ivf_assign_batch_join_strategy_identical(spark, tmp_path):
    """Ingest assignment at production k: broadcast-join argmin equals
    the literal-compiled choice vector-for-vector (ties included)."""
    from variant_load_pipeline_spark.operators.clustering import (
        ivf_assign_batch,
        write_ivf_index,
    )

    e = Q.load(spark, SF, "embeddings")
    path = str(tmp_path / "ivf")
    write_ivf_index(e.filter(F.col("vec_id") % 4 != 3), path)
    batch = e.filter(F.col("vec_id") % 4 == 3).select("vec_id", "embedding")
    asg = lambda s: sorted(
        (r["vec_id"], r["list_id"])
        for r in ivf_assign_batch(spark, path, batch, strategy=s).collect()
    )
    assert asg("literal") == asg("join") and asg("literal")


def test_assign_clusters_join_strategy_identical(spark):
    """k-means assignment: the broadcast-join min(struct) argmin equals
    the literal argmin on real vectors AND breaks exact-distance ties to
    the smaller cluster id like the literal path does."""
    from variant_load_pipeline_spark.operators.clustering import (
        assign_clusters,
        fit_centroids,
        int_vectors,
    )

    e = Q.load(spark, SF, "embeddings").limit(200)
    base = e.select(
        "vec_id", int_vectors(F.col("embedding")).alias("qv")
    ).persist()
    cents = fit_centroids(base, k=8, iters=1)
    rows = lambda s: sorted(
        (r["vec_id"], r["cluster"], r["dist_sq"])
        for r in assign_clusters(base, cents, strategy=s).collect()
    )
    assert rows("literal") == rows("join") and rows("literal")
    # tie case: two centroids at the same point -> smaller id wins on
    # both strategies
    q = base.sparkSession.createDataFrame([(1, [5, 5])], "vec_id int, qv array<bigint>")
    tied_cents = [(3, [0, 0]), (7, [0, 0])]
    for s in ("literal", "join"):
        [r] = assign_clusters(q, tied_cents, strategy=s).collect()
        assert r["cluster"] == 3, s
    base.unpersist()
