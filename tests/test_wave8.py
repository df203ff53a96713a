"""Wave-8 contracts: epoch-manifest file order, epoch re-seeding, and
the batch IVF probe operator."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from variant_load_pipeline_spark import queries as Q

SF = "/root/testdata/sf0.01"


def test_epoch_manifest_file_order_is_training_order(spark, tmp_path):
    """The layout contract of write_epoch_manifest: each (epoch, shard)
    directory holds ONE file whose physical row order equals the
    training order (hv, doc_id) — readers stream it without re-sorting.
    Verified with pyarrow, which preserves parquet row order exactly."""
    import pyarrow.parquet as pq

    from variant_load_pipeline_spark.plans.export import (
        write_epoch_manifest,
    )

    docs = Q.load(spark, SF, "documents").select("doc_id")
    path = str(tmp_path / "manifest")
    write_epoch_manifest(docs, path, epochs=2, shards=4)

    n_docs = docs.count()
    seen = 0
    for epoch_dir in sorted(os.listdir(path)):
        if not epoch_dir.startswith("epoch="):
            continue
        for shard_dir in sorted(os.listdir(f"{path}/{epoch_dir}")):
            if not shard_dir.startswith("shard="):
                continue
            files = [
                f
                for f in os.listdir(f"{path}/{epoch_dir}/{shard_dir}")
                if f.endswith(".parquet")
            ]
            # one task per (epoch, shard) group -> one file per dir
            assert len(files) == 1, (epoch_dir, shard_dir, files)
            tbl = pq.read_table(
                f"{path}/{epoch_dir}/{shard_dir}/{files[0]}"
            )
            rows = list(
                zip(tbl.column("hv").to_pylist(),
                    tbl.column("doc_id").to_pylist())
            )
            assert rows == sorted(rows), (epoch_dir, shard_dir)
            seen += len(rows)
    # every doc appears exactly once per epoch
    assert seen == 2 * n_docs


def test_epoch_manifest_reseeds_per_epoch(spark, tmp_path):
    """Different epochs must train in different orders (the per-epoch
    seed), while the same epoch re-exported is bit-identical
    (resumability)."""
    from variant_load_pipeline_spark.plans.export import (
        read_epoch_manifest,
        write_epoch_manifest,
    )

    docs = Q.load(spark, SF, "documents").select("doc_id")
    path = str(tmp_path / "manifest")
    write_epoch_manifest(docs, path, epochs=2, shards=4)
    m = read_epoch_manifest(spark, path)

    def order(epoch):
        return [
            (r["shard"], r["hv"], r["doc_id"])
            for r in m.filter(F.col("epoch") == epoch)
            .orderBy("shard", "hv", "doc_id")
            .collect()
        ]

    o1, o2 = order(1), order(2)
    assert [t[2] for t in o1] != [t[2] for t in o2]  # reshuffled
    # re-export reproduces epoch 1 exactly
    path2 = str(tmp_path / "manifest2")
    write_epoch_manifest(docs, path2, epochs=1, shards=4)
    m2 = read_epoch_manifest(spark, path2)
    o1b = [
        (r["shard"], r["hv"], r["doc_id"])
        for r in m2.filter(F.col("epoch") == 1)
        .orderBy("shard", "hv", "doc_id")
        .collect()
    ]
    assert o1 == o1b


def test_ivf_probe_batch_matches_bruteforce(spark, tmp_path):
    """ivf_probe_batch's codegen probe choice must equal the brute-force
    nearest-nprobe centroid ranking (cos DESC, list_id ASC, 6dp)."""
    from variant_load_pipeline_spark.operators.clustering import (
        ivf_probe_batch,
        write_ivf_index,
    )

    e = Q.load(spark, SF, "embeddings")
    path = str(tmp_path / "ivf")
    write_ivf_index(e, path)
    anchors = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    got = {
        (r["qid"], r["list_id"])
        for r in ivf_probe_batch(spark, path, anchors, nprobe=3).collect()
    }

    import math

    cents = {
        int(r["list_id"]): [float(x) for x in r["centroid"]]
        for r in spark.read.parquet(f"{path}/centroids").collect()
    }

    def cos(u, v):
        d = sum(a * b for a, b in zip(u, v))
        nu = math.sqrt(sum(a * a for a in u))
        nv = math.sqrt(sum(b * b for b in v))
        return round(d / (nu * nv), 6) if nu and nv else 0.0

    expected = set()
    for r in anchors.collect():
        ranked = sorted(
            cents, key=lambda lid: (-cos(cents[lid], list(r["qv"])), lid)
        )
        for lid in ranked[:3]:
            expected.add((r["qid"], lid))
    assert got == expected and got


def test_epoch_manifest_custom_id_col(spark, tmp_path):
    """id_col is normalized to doc_id before hashing, so a non-default
    id column must produce the SAME manifest as the default (regression:
    the hash once referenced the pre-alias name and raised)."""
    from variant_load_pipeline_spark.plans.export import (
        read_epoch_manifest,
        write_epoch_manifest,
    )

    docs = Q.load(spark, SF, "documents").select("doc_id").limit(50)
    p1 = str(tmp_path / "m_default")
    p2 = str(tmp_path / "m_custom")
    write_epoch_manifest(docs, p1, epochs=1, shards=2)
    write_epoch_manifest(
        docs.withColumnRenamed("doc_id", "my_id"),
        p2,
        epochs=1,
        shards=2,
        id_col="my_id",
    )
    rows = lambda p: sorted(
        (r["epoch"], r["shard"], r["hv"], r["doc_id"])
        for r in read_epoch_manifest(spark, p).collect()
    )
    assert rows(p1) == rows(p2) and rows(p1)


def test_read_ivf_lists_merges_delta(spark, tmp_path):
    """Batch-probe candidate fetch (read_ivf_lists) must see vectors
    appended after the seed write — the store CorpusSearch's
    ivf_probe_topk already merges (regression: miners once read only
    the seed lists)."""
    from variant_load_pipeline_spark.operators.clustering import (
        append_ivf_batch,
        read_ivf_lists,
        write_ivf_index,
    )

    e = Q.load(spark, SF, "embeddings")
    seed = e.filter(F.col("vec_id") % 4 != 3)
    delta = e.filter(F.col("vec_id") % 4 == 3)
    path = str(tmp_path / "ivf")
    write_ivf_index(seed, path)
    assert read_ivf_lists(spark, path).count() == seed.count()
    append_ivf_batch(delta, path, batch_id=1)
    got = {r["vec_id"] for r in read_ivf_lists(spark, path).collect()}
    assert got == {r["vec_id"] for r in e.collect()}


def test_corpus_compact_requires_batch_id(spark, tmp_path):
    """CorpusCompact without --batch-id must refuse (a silent default
    could fold an uncommitted batch and duplicate docs on redelivery)."""
    import pytest

    from variant_load_pipeline_spark.cli import main

    with pytest.raises(SystemExit):
        main(
            [
                "--tool", "CorpusCompact",
                "--kept", str(tmp_path / "kept"),
                "--out", str(tmp_path / "out"),
            ],
            spark,
        )


def test_data_fingerprint_tracks_files(spark, tmp_path):
    """The write-if-missing cache salt's data fingerprint: stable across
    calls on unchanged data, different across datasets, and changed by
    an in-place rewrite (mtime/size digest)."""
    import shutil
    import time

    from variant_load_pipeline_spark.queries_ext import _data_fingerprint

    f1 = _data_fingerprint(spark, SF, "documents")
    assert f1 == _data_fingerprint(spark, SF, "documents")
    assert f1 != _data_fingerprint(spark, "/root/testdata/sf0.001", "documents")
    # copy to a tmp sf_dir, rewrite in place -> fingerprint changes
    sf2 = tmp_path / "sf"
    sf2.mkdir()
    src = "/root/testdata/sf0.001/documents.parquet"
    dst = str(sf2 / "documents.parquet")
    (shutil.copy if os.path.isfile(src) else shutil.copytree)(src, dst)
    g1 = _data_fingerprint(spark, str(sf2), "documents")
    time.sleep(1.1)  # mtime granularity
    Q.load(spark, str(sf2), "documents").limit(5).write.mode(
        "overwrite"
    ).parquet(dst + ".tmp")
    (os.remove if os.path.isfile(dst) else shutil.rmtree)(dst)
    shutil.move(dst + ".tmp", dst)
    assert _data_fingerprint(spark, str(sf2), "documents") != g1


def test_edit_distance_occupancy_guard_contracts(spark):
    """The two-tier occupancy guard: (a) when no bucket crosses the
    cutoff the guard is a no-op (guarded == unguarded on the test
    corpus); (b) when the cutoff is forced below real occupancy, every
    surviving candidate bucket is within the cap and reported pairs are
    a SUBSET of the unguarded pairs (the documented recall trade, never
    new false pairs)."""
    import variant_load_pipeline_spark.queries_corpus as qc

    sf = "/root/testdata/sf0.01"

    def run():
        return {
            (r["id_a"], r["id_b"], r["edit_dist"])
            for r in qc.edit_distance_dup_pairs_q(spark, sf).collect()
        }

    # (a) no-op at the shipped cutoff (max sf0.01 occupancy is ~23)
    baseline = run()
    assert baseline
    old_cut = qc._ED_BUCKET_CUTOFF
    try:
        qc._ED_BUCKET_CUTOFF = 10 ** 9  # effectively unguarded
        assert run() == baseline
        # (b) cutoff below the hottest bucket: recall trade only —
        # a subset of the unguarded pairs, never new false pairs
        qc._ED_BUCKET_CUTOFF = 10
        assert run() <= baseline
        # (c) cutoff 1: every >=2-doc bucket drops through both tiers,
        # so no candidate pair survives — the hard cap really caps
        qc._ED_BUCKET_CUTOFF = 1
        assert run() == set()
    finally:
        qc._ED_BUCKET_CUTOFF = old_cut
