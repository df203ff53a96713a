"""Wave-10 contracts: the INCREMENTAL IVF fold (O(delta) maintenance —
untouched invlist partitions stay byte-identical on disk), deterministic
dedup precedence inside the fold, and the assign_clusters column-collision
guard."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from variant_load_pipeline_spark import queries as Q

SF = "/root/testdata/sf0.01"


def _file_md5s(root: str) -> dict[str, str]:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.md5(
                    fh.read()
                ).hexdigest()
    return out


def test_ivf_compact_is_incremental_per_partition(spark, tmp_path):
    """The round-10 maintenance contract: a fold whose committed deltas
    touch only lists {0, 1} must leave every OTHER invlist partition's
    files byte-for-byte identical (same names, same bytes) — the
    O(delta)-not-O(index) promise — while the touched partitions absorb
    the delta rows and the delta store disappears."""
    from variant_load_pipeline_spark.operators.clustering import (
        append_ivf_batch,
        compact_ivf_index,
        read_ivf_lists,
        write_ivf_index,
    )

    e = Q.load(spark, SF, "embeddings")
    path = str(tmp_path / "ivf")
    write_ivf_index(e, path)
    # new ids (disjoint from the seed's), landing ONLY in lists 0 and 1
    delta = e.filter(F.col("label").isin(0, 1) & (F.col("vec_id") % 5 == 0)).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        "embedding",
        "label",
    )
    n_delta = delta.count()
    assert n_delta > 0
    append_ivf_batch(delta, path, batch_id=1)

    labels = sorted(
        r["label"] for r in e.select("label").distinct().collect()
    )
    untouched = [l for l in labels if l not in (0, 1)]
    assert untouched, "fixture must have lists beyond 0/1"
    before = {
        l: _file_md5s(f"{path}/lists/list_id={l}") for l in untouched
    }
    touched_before = {
        l: _file_md5s(f"{path}/lists/list_id={l}") for l in (0, 1)
    }

    assert compact_ivf_index(spark, path, upto_batch_id=1) == 1
    assert not os.path.exists(f"{path}/lists_delta")
    assert not os.path.exists(f"{path}/.lists_old")
    assert not os.path.exists(f"{path}/.lists_tmp")

    for l in untouched:
        assert _file_md5s(f"{path}/lists/list_id={l}") == before[l], l
    for l in (0, 1):
        assert _file_md5s(f"{path}/lists/list_id={l}") != touched_before[l], l
    # every row (seed + delta) present exactly once
    assert read_ivf_lists(spark, path).count() == e.count() + n_delta


def test_ivf_compact_dedup_winner_is_deterministic(spark, tmp_path):
    """Id collisions inside the fold resolve by source precedence: a
    delta row beats the seed row, and a later batch beats an earlier
    one — the surviving vector is the SAME across re-runs (the
    dropDuplicates-nondeterminism fix)."""
    from variant_load_pipeline_spark.operators.clustering import (
        append_ivf_batch,
        compact_ivf_index,
        write_ivf_index,
    )

    seed = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    path = str(tmp_path / "ivf")
    write_ivf_index(seed, path)
    # batch 1 re-ingests id 1 with a NEW vector; batch 2 re-ingests it
    # again with yet another vector — the batch-2 row must win
    append_ivf_batch(
        spark.createDataFrame(
            [(1, [2.0, 0.0], 0)],
            "vec_id long, embedding array<double>, label int",
        ),
        path,
        batch_id=1,
    )
    append_ivf_batch(
        spark.createDataFrame(
            [(1, [3.0, 0.0], 0)],
            "vec_id long, embedding array<double>, label int",
        ),
        path,
        batch_id=2,
    )
    assert compact_ivf_index(spark, path, upto_batch_id=2) == 2
    rows = {
        r["vec_id"]: list(r["embedding"])
        for r in spark.read.parquet(f"{path}/lists").collect()
    }
    assert rows == {1: [3.0, 0.0], 2: [0.0, 1.0]}


def test_ivf_compact_mid_partition_swap_recovery(spark, tmp_path):
    """Crash with ONE partition moved out (.lists_old/list_id=L present,
    live partition missing) while the rest of the store is intact: the
    next compact call restores exactly that partition and completes —
    probes identical, no other partition disturbed."""
    import shutil

    from variant_load_pipeline_spark.operators.clustering import (
        append_ivf_batch,
        compact_ivf_index,
        ivf_probe_topk,
        write_ivf_index,
    )

    e = Q.load(spark, SF, "embeddings")
    path = str(tmp_path / "ivf")
    write_ivf_index(e, path)
    qv = [float(x) for x in e.select("embedding").first()["embedding"]]
    topk = lambda: [
        tuple(r)
        for r in ivf_probe_topk(spark, path, qv, nprobe=2, k=8).collect()
    ]
    before = topk()
    # simulate the torn per-partition swap on list 3
    os.makedirs(f"{path}/.lists_old", exist_ok=True)
    shutil.move(
        f"{path}/lists/list_id=3", f"{path}/.lists_old/list_id=3"
    )
    append_ivf_batch(
        e.filter(F.col("label") == 0).limit(3).select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            "embedding",
            "label",
        ),
        path,
        batch_id=1,
    )
    assert compact_ivf_index(spark, path, upto_batch_id=1) == 1
    assert os.path.exists(f"{path}/lists/list_id=3")
    assert not os.path.exists(f"{path}/.lists_old")
    assert topk() == before


def test_assign_clusters_tolerates_preexisting_columns(spark):
    """A frame already carrying cluster / dist_sq (re-assignment after a
    retrain) must not break either strategy or make them diverge: both
    REPLACE the columns (the join path used to error on the collision
    while the literal path silently overwrote)."""
    from variant_load_pipeline_spark.operators.clustering import (
        assign_clusters,
    )

    q = spark.createDataFrame(
        [(1, [5, 5], 99, 12345), (2, [0, 1], 98, 54321)],
        "vec_id int, qv array<bigint>, cluster int, dist_sq long",
    )
    cents = [(0, [0, 0]), (1, [6, 6])]
    rows = lambda s: sorted(
        (r["vec_id"], r["cluster"], r["dist_sq"])
        for r in assign_clusters(q, cents, strategy=s).collect()
    )
    assert rows("literal") == rows("join") == [(1, 1, 2), (2, 0, 1)]
