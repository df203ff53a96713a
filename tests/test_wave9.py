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


def _topk(spark, path, qv, k=8):
    from variant_load_pipeline_spark.operators.clustering import (
        ivf_probe_topk,
    )

    return [
        tuple(r)
        for r in ivf_probe_topk(spark, path, qv, nprobe=2, k=k).collect()
    ]


def _build_appended_index(spark, tmp_path, name="ivf"):
    from variant_load_pipeline_spark.operators.clustering import (
        append_ivf_batch,
        write_ivf_index,
    )

    e = Q.load(spark, SF, "embeddings")
    path = str(tmp_path / name)
    write_ivf_index(e.filter(F.col("vec_id") % 4 != 3), path)
    append_ivf_batch(e.filter(F.col("vec_id") % 4 == 3), path, batch_id=1)
    qv = [float(x) for x in e.select("embedding").first()["embedding"]]
    return e, path, qv


def test_ivf_compact_probe_identical_and_uncommitted_kept(spark, tmp_path):
    """Folding committed deltas must be invisible to probes, and a delta
    batch ABOVE the commit watermark must stay in place (uncommitted
    batches are not safe to fold)."""
    import os

    from variant_load_pipeline_spark.operators.clustering import (
        append_ivf_batch,
        compact_ivf_index,
        read_ivf_lists,
        write_ivf_index,
    )

    e = Q.load(spark, SF, "embeddings")
    path = str(tmp_path / "ivf")
    write_ivf_index(e.filter(F.col("vec_id") % 8 < 5), path)
    append_ivf_batch(e.filter(F.col("vec_id") % 8 == 5), path, batch_id=1)
    append_ivf_batch(e.filter(F.col("vec_id") % 8 == 6), path, batch_id=2)
    append_ivf_batch(e.filter(F.col("vec_id") % 8 == 7), path, batch_id=3)
    qv = [float(x) for x in e.select("embedding").first()["embedding"]]
    before = _topk(spark, path, qv)
    # fold batches 1-2 only; batch 3 is past the commit watermark
    assert compact_ivf_index(spark, path, upto_batch_id=2) == 2
    assert sorted(os.listdir(f"{path}/lists_delta")) == ["batch_id=3"]
    assert _topk(spark, path, qv) == before
    n_all = e.count()
    assert read_ivf_lists(spark, path).count() == n_all
    # second fold takes the last batch and removes the delta store
    assert compact_ivf_index(spark, path, upto_batch_id=3) == 1
    assert not os.path.exists(f"{path}/lists_delta")
    assert _topk(spark, path, qv) == before
    assert spark.read.parquet(f"{path}/lists").count() == n_all


def test_ivf_compact_mid_crash_recovery(spark, tmp_path):
    """Crash BETWEEN the two swap renames (lists renamed away, new
    lists not yet in place): the next compact call must restore the
    pre-fold store and then complete the fold — probes identical."""
    import os
    import shutil

    from variant_load_pipeline_spark.operators.clustering import (
        compact_ivf_index,
    )

    e, path, qv = _build_appended_index(spark, tmp_path)
    before = _topk(spark, path, qv)
    # simulate the torn swap: lists moved aside, temp leftover on disk
    shutil.move(f"{path}/lists", f"{path}/.lists_old")
    (tmp_path / "ivf" / ".lists_tmp").mkdir()
    assert not os.path.exists(f"{path}/lists")
    assert compact_ivf_index(spark, path, upto_batch_id=1) >= 1
    assert os.path.exists(f"{path}/lists")
    assert not os.path.exists(f"{path}/.lists_old")
    assert _topk(spark, path, qv) == before


def test_ivf_compact_stale_old_copy_recovery(spark, tmp_path):
    """Crash AFTER the swap but before .lists_old's delete (both dirs
    present): the next compact removes the stale copy and proceeds —
    no rename-onto-existing failure, probes identical."""
    import os
    import shutil

    from variant_load_pipeline_spark.operators.clustering import (
        append_ivf_batch,
        compact_ivf_index,
    )

    e, path, qv = _build_appended_index(spark, tmp_path)
    before = _topk(spark, path, qv)
    compact_ivf_index(spark, path, upto_batch_id=1)
    # simulate the leftover stale copy + a fresh committed delta
    shutil.copytree(f"{path}/lists", f"{path}/.lists_old")
    append_ivf_batch(e.limit(3), path, batch_id=2)
    assert compact_ivf_index(spark, path, upto_batch_id=2) == 1
    assert not os.path.exists(f"{path}/.lists_old")
    assert _topk(spark, path, qv) == before


def test_ivf_compact_delete_crash_is_idempotent(spark, tmp_path):
    """Crash DURING the delete phase (deltas already folded into lists
    but their partitions still on disk): re-running the fold dedups on
    vec_id, so the store converges to exactly-once rows."""
    import shutil

    from variant_load_pipeline_spark.operators.clustering import (
        compact_ivf_index,
        read_ivf_lists,
    )

    e, path, qv = _build_appended_index(spark, tmp_path)
    n_all = e.count()
    before = _topk(spark, path, qv)
    compact_ivf_index(spark, path, upto_batch_id=1)
    # simulate the crash leftovers: re-append the SAME batch rows as a
    # stale delta partition (now duplicating folded lists rows)
    from variant_load_pipeline_spark.operators.clustering import (
        append_ivf_batch,
    )

    append_ivf_batch(
        e.filter(F.col("vec_id") % 4 == 3), path, batch_id=1
    )
    assert read_ivf_lists(spark, path).count() == n_all + (
        e.filter(F.col("vec_id") % 4 == 3).count()
    )
    compact_ivf_index(spark, path, upto_batch_id=1)
    assert read_ivf_lists(spark, path).count() == n_all
    assert _topk(spark, path, qv) == before


def test_ivf_retrain_resets_drift(spark, tmp_path):
    """After compact(retrain_centroids=True), every list's centroid IS
    the milli floor-of-mean of its members — recomputing the drift
    statistic yields 0 for every list (the monitor's reset state)."""
    from variant_load_pipeline_spark.operators.clustering import (
        compact_ivf_index,
        int_vectors,
    )

    e, path, qv = _build_appended_index(spark, tmp_path)
    compact_ivf_index(spark, path, upto_batch_id=1, retrain_centroids=True)
    members = spark.read.parquet(f"{path}/lists").select(
        F.col("list_id").cast("long").alias("list_id"),
        F.posexplode(int_vectors(F.col("embedding"))).alias("dim", "val"),
    )
    md = members.groupBy("list_id", "dim").agg(
        F.floor(F.sum("val") / F.count(F.lit(1))).cast("long").alias("mval")
    )
    cq = spark.read.parquet(f"{path}/centroids").select(
        F.col("list_id").cast("long").alias("list_id"),
        F.posexplode(int_vectors(F.col("centroid"))).alias("dim", "cval"),
    )
    drift = (
        md.join(cq, ["list_id", "dim"])
        .groupBy("list_id")
        .agg(
            F.sum(
                (F.col("mval") - F.col("cval"))
                * (F.col("mval") - F.col("cval"))
            ).alias("d2")
        )
    )
    rows = drift.collect()
    assert rows and all(r["d2"] == 0 for r in rows)


def test_cli_corpus_compact_ivf_and_retrain(spark, tmp_path):
    """CorpusCompact --ivf folds the delta store; CorpusRetrain folds
    AND retrains, and requires --batch-id."""
    import os

    import pytest

    from variant_load_pipeline_spark.cli import main

    e, path, qv = _build_appended_index(spark, tmp_path)
    before = _topk(spark, path, qv)
    out = str(tmp_path / "report")
    main(
        ["--tool", "CorpusCompact", "--ivf", path, "--batch-id", "1",
         "--out", out],
        spark,
    )
    assert {
        (r["store"], r["folded"])
        for r in spark.read.parquet(out).collect()
    } == {("ivf", 1)}
    assert not os.path.exists(f"{path}/lists_delta")
    assert _topk(spark, path, qv) == before
    with pytest.raises(SystemExit):
        main(
            ["--tool", "CorpusRetrain", "--ivf", path, "--out", out], spark
        )
    main(
        ["--tool", "CorpusRetrain", "--ivf", path, "--batch-id", "1",
         "--out", out],
        spark,
    )
    # retrained centroid table readable and one row per list
    cents = spark.read.parquet(f"{path}/centroids")
    n_lists = spark.read.parquet(f"{path}/lists").select(
        "list_id"
    ).distinct().count()
    assert cents.count() == n_lists


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
