"""Wave-8 serving/curation operators: the remaining scale-path twins and
training-side artifacts, each with a DuckDB oracle.

  contrastive_triplets_ivf  the SCALE path of contrastive_triplets: per
                        anchor, hardest positive / hardest negative mined
                        from the PERSISTED IVF index's probed lists only
                        (ivf_probe_batch) — candidate cost O(anchors x
                        probed-list size) instead of anchors x corpus,
                        the ann_hard_negatives <-> ann_ivf_persisted_topk
                        split applied to triplet mining
  epoch_shard_manifest  per-epoch data-order export: deterministic
                        shuffled shard manifests seeded per epoch
                        (write_epoch_manifest), aggregated from the
                        read-back so a hash match proves the persisted
                        order round-trips
  ann_hard_negatives_ivf  ann_hard_negatives' scale path: top-5
                        different-label neighbors per anchor from the
                        persisted IVF probe instead of the full corpus
  rerank_batch_topk     the serving chain at batch width: many queries
                        retrieve from the persisted index in one plan;
                        each DISTINCT candidate doc meets the expensive
                        classifier exactly once
  ivf_centroid_drift_report  maintenance monitor #2: exact integer
                        squared distance between each list's stored
                        centroid and its CURRENT (seed+delta) member
                        mean — the retrain trigger occupancy can't see
  lsh_match_probe_only  the per-batch steady-state dedup cost: probe
                        the pre-persisted LSH index (write-if-missing,
                        source-salted path) without the one-time build
                        lsh_incremental_match's row includes
  ivf_assign_ingest     streaming vector ingestion's batch body:
                        nearest-centroid assignment (vectors arrive
                        with no list key) + idempotent delta append,
                        read back from disk for the hash
  cluster_balanced_sample  diversity-preserving selection: each k-means
                        cluster contributes a fixed quota in seeded-hash
                        order — the balancing step after semantic dedup

Float discipline follows the repo-wide micro-unit idiom (floor(x*1e6+0.5)
to BIGINT before any sum / ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .queries import load, register, spread
from .queries_wave7 import _COS6

# ===========================================================================
# Triplet mining from the persisted IVF probe (scale path)
# ===========================================================================
_TRIPLET_NPROBE = 2


@register(
    "contrastive_triplets_ivf",
    f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qv, label AS qlabel
        FROM embeddings WHERE vec_id % 50 = 0
    ),
    cent AS (
        SELECT e.label AS list_id, e.embedding AS cv
        FROM embeddings e
        JOIN (SELECT label, MIN(vec_id) AS mv FROM embeddings GROUP BY label) m
          ON e.label = m.label AND e.vec_id = m.mv
    ),
    probe AS (
        SELECT qid, list_id FROM (
            SELECT q.qid, cent.list_id,
                   ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                       {_COS6.format(a='cent.cv', b='q.qv')} DESC,
                       cent.list_id) AS rk
            FROM q CROSS JOIN cent
        ) WHERE rk <= {_TRIPLET_NPROBE}
        UNION
        SELECT qid, qlabel AS list_id FROM q
    ),
    sims AS (
        SELECT q.qid, q.qlabel, e.vec_id AS nid, e.label AS nlabel,
               {_COS6.format(a='e.embedding', b='q.qv')} AS sim
        FROM q JOIN probe p ON p.qid = q.qid
        JOIN embeddings e ON e.label = p.list_id
        WHERE e.vec_id <> q.qid
    ),
    pos AS (
        SELECT qid, nid AS pos_id, sim AS pos_cos FROM (
            SELECT qid, nid, sim,
                   ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY sim DESC, nid) AS rk
            FROM sims WHERE nlabel = qlabel
        ) WHERE rk = 1
    ),
    neg AS (
        SELECT qid, nid AS neg_id, sim AS neg_cos FROM (
            SELECT qid, nid, sim,
                   ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY sim DESC, nid) AS rk
            FROM sims WHERE nlabel <> qlabel
        ) WHERE rk = 1
    )
    SELECT p.qid AS anchor_id, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos,
           CAST(FLOOR((p.pos_cos - n.neg_cos) * 1e6 + 0.5) AS BIGINT)
               AS margin_micro
    FROM pos p JOIN neg n ON p.qid = n.qid
    """,
    doc="contrastive_triplets' SCALE path: the same (anchor, hardest "
    "positive, hardest negative, margin) rows, but candidates come from "
    f"the PERSISTED IVF index's {_TRIPLET_NPROBE} probed lists per "
    "anchor instead of the whole corpus — the ann_hard_negatives <-> "
    "ann_ivf_persisted_topk exact/approximate split applied to triplet "
    "mining.  Probe selection is ivf_probe_batch: the centroid table "
    "(model state, one row per list) collects once and each anchor's "
    "nearest-nprobe choice compiles into whole-stage-codegen array "
    "algebra — NO nested-loop join is planned; candidate fetch is one "
    "equi-join on list_id (broadcast anchor block), which dynamic "
    "partition pruning narrows to the probed lists' files on the "
    "partitioned store.  The probe set always unions the anchor's OWN "
    "list (its label — the positive source is known, so a miner never "
    "lets a representative-centroid ranking starve the positives).  "
    "Recall trade vs the exact miner: an anchor whose true hardest "
    "negative lives outside its probed lists gets the hardest IN-probe "
    "negative (standard ANN-mining behavior).  "
    "The oracle replays centroid pick (min-id member per list), probe "
    "ranking, and in-probe mining CTE-by-CTE; eager-construct: the "
    "index write runs inside the query (production persists it once).",
)
def contrastive_triplets_ivf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil

    from .operators.clustering import (
        ivf_probe_batch,
        read_ivf_lists,
        write_ivf_index,
    )
    from .operators.similarity import cosine
    from .queries_ext import _scan_path

    e = load(spark, sf_dir, "embeddings")
    path = _scan_path(sf_dir, "ivf_index_triplets")
    shutil.rmtree(path, ignore_errors=True)
    write_ivf_index(e, path)
    # everything below sees ONLY the on-disk index
    anchors = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    # probe set = nearest-nprobe lists UNION the anchor's own list: the
    # positive source is known from the anchor's label, so a production
    # miner always unions it in (otherwise a representative-centroid
    # ranking can starve the positive side entirely)
    probe = (
        ivf_probe_batch(spark, path, anchors, nprobe=_TRIPLET_NPROBE)
        .unionByName(
            anchors.withColumn(
                "list_id", F.col("qlabel").cast("int")
            )
        )
        .dropDuplicates(["qid", "list_id"])
    )
    # candidate fetch reads seed + any ingest delta (read_ivf_lists), so
    # a miner over an appended index sees what CorpusSearch sees; at this
    # call site the index is freshly written (no delta) — results equal
    lists = read_ivf_lists(spark, path).select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").cast("array<double>").alias("nv"),
        F.col("list_id").cast("int").alias("list_id"),
    )
    # anchor block is bounded (a mining batch); broadcasting it keeps
    # the lists side shuffle-free and lets DPP prune to probed lists
    sims = (
        lists.join(F.broadcast(probe), "list_id")
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "nid",
            F.col("list_id").alias("nlabel"),
            F.round(cosine(F.col("nv"), F.col("qv")), 6).alias("sim"),
        )
    )
    wnd = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    pos = (
        sims.filter(F.col("nlabel") == F.col("qlabel"))
        .withColumn("rk", F.row_number().over(wnd))
        .filter(F.col("rk") == 1)
        .select(
            "qid", F.col("nid").alias("pos_id"), F.col("sim").alias("pos_cos")
        )
    )
    neg = (
        sims.filter(F.col("nlabel") != F.col("qlabel"))
        .withColumn("rk", F.row_number().over(wnd))
        .filter(F.col("rk") == 1)
        .select(
            "qid", F.col("nid").alias("neg_id"), F.col("sim").alias("neg_cos")
        )
    )
    return pos.join(neg, "qid").select(
        F.col("qid").alias("anchor_id"),
        "pos_id", "pos_cos", "neg_id", "neg_cos",
        F.floor((F.col("pos_cos") - F.col("neg_cos")) * 1e6 + 0.5)
        .cast("long")
        .alias("margin_micro"),
    )


# ===========================================================================
# Per-epoch data-order export: the shard manifests a training run reads
# ===========================================================================
_MANIFEST_EPOCHS = 3
_MANIFEST_SHARDS = 8
_MANIFEST_CHUNK = 1024  # order-audit md5 chain granularity


@register(
    "epoch_shard_manifest",
    f"""
    WITH ep AS (
        SELECT doc_id, CAST(u.e AS BIGINT) AS epoch
        FROM documents, UNNEST(range(1, {_MANIFEST_EPOCHS + 1})) AS u(e)
    ),
    h AS (
        SELECT epoch, doc_id,
               ('0x' || substr(md5('epoch' || CAST(epoch AS VARCHAR) || '_'
                    || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hv
        FROM ep
    ),
    h2 AS (
        SELECT epoch, CAST(hv % {_MANIFEST_SHARDS} AS BIGINT) AS shard,
               hv, doc_id,
               ROW_NUMBER() OVER (PARTITION BY epoch,
                                  hv % {_MANIFEST_SHARDS}
                                  ORDER BY hv, doc_id) AS pos
        FROM h
    ),
    ck AS (
        SELECT epoch, shard, (pos - 1) // {_MANIFEST_CHUNK} AS chunk,
               COUNT(*) AS cnt,
               (list(doc_id ORDER BY hv, doc_id))[1] AS cfirst,
               md5(string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY hv, doc_id)) AS cmd5
        FROM h2 GROUP BY epoch, shard, (pos - 1) // {_MANIFEST_CHUNK}
    )
    SELECT epoch, shard,
           CAST(SUM(cnt) AS BIGINT) AS n_docs,
           CAST((list(cfirst ORDER BY chunk))[1] AS BIGINT) AS first_doc,
           md5(string_agg(cmd5, ',' ORDER BY chunk)) AS order_md5
    FROM ck GROUP BY epoch, shard
    """,
    doc="Per-epoch data-order export — the one training-side artifact "
    "the shard sink didn't yet emit: for each of "
    f"{_MANIFEST_EPOCHS} epochs every doc gets a deterministic "
    "(shard, position) from an epoch-seeded portable hash "
    "(training_shard_assignment's pseudo-shuffle re-seeded per epoch, "
    "so each epoch trains in a different order yet any worker can "
    "recompute its slice from the corpus alone — resumable loading "
    "with no coordinator).  The query WRITES the manifest via "
    "write_epoch_manifest (parquet partitioned by (epoch, shard), "
    "rows pre-sorted so file order IS training order) and aggregates "
    "the READ-BACK: per (epoch, shard) the doc count, the first doc, "
    "and a CHAINED order md5 — ids md5 per "
    f"{_MANIFEST_CHUNK}-doc chunk of the training order, then one md5 "
    "over the chunk digests in chunk order — a hash match proves the "
    "persisted manifest round-trips the exact order while no task ever "
    "materializes more than a chunk of ids (the flat variant "
    "concentrated n/shards ids into one array per task — a multi-GB "
    "aggregate at 100x).  Eager-construct: the write runs inside.",
)
def epoch_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from .plans.export import read_epoch_manifest, write_epoch_manifest
    from .queries_ext import _scan_path

    d = load(spark, sf_dir, "documents")
    path = _scan_path(sf_dir, "epoch_manifest")
    shutil.rmtree(path, ignore_errors=True)
    write_epoch_manifest(
        d, path, epochs=_MANIFEST_EPOCHS, shards=_MANIFEST_SHARDS
    )
    # everything below sees ONLY the on-disk manifest
    m = read_epoch_manifest(spark, path).select(
        F.col("epoch").cast("long").alias("epoch"),
        F.col("shard").cast("long").alias("shard"),
        "hv",
        "doc_id",
    )
    # training position -> chunk id: the sort-based window streams and
    # spills; only chunk-sized arrays are ever materialized below
    wnd = W.partitionBy("epoch", "shard").orderBy("hv", "doc_id")
    pos = m.withColumn(
        "chunk",
        F.floor((F.row_number().over(wnd) - 1) / _MANIFEST_CHUNK).cast(
            "long"
        ),
    )
    ck = (
        pos.groupBy("epoch", "shard", "chunk")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.array_sort(F.collect_list(F.struct("hv", "doc_id"))).alias(
                "__ord"
            ),
        )
        .select(
            "epoch",
            "shard",
            "chunk",
            "cnt",
            F.element_at("__ord", 1).getField("doc_id").alias("cfirst"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        "__ord",
                        lambda x: x.getField("doc_id").cast("string"),
                    ),
                )
            ).alias("cmd5"),
        )
    )
    return ck.groupBy("epoch", "shard").agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.min(F.struct("chunk", "cfirst"))
        .getField("cfirst")
        .alias("first_doc"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk", "cmd5"))),
                    lambda x: x.getField("cmd5"),
                ),
            )
        ).alias("order_md5"),
    )


# ===========================================================================
# Hard-negative mining from the persisted IVF probe (scale path)
# ===========================================================================
_HN_NPROBE = 3


@register(
    "ann_hard_negatives_ivf",
    f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qv, label AS qlabel
        FROM embeddings WHERE vec_id % 50 = 0
    ),
    cent AS (
        SELECT e.label AS list_id, e.embedding AS cv
        FROM embeddings e
        JOIN (SELECT label, MIN(vec_id) AS mv FROM embeddings GROUP BY label) m
          ON e.label = m.label AND e.vec_id = m.mv
    ),
    probe AS (
        SELECT qid, list_id FROM (
            SELECT q.qid, cent.list_id,
                   ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                       {_COS6.format(a='cent.cv', b='q.qv')} DESC,
                       cent.list_id) AS rk
            FROM q CROSS JOIN cent
        ) WHERE rk <= {_HN_NPROBE}
    ),
    sims AS (
        SELECT q.qid, e.vec_id AS nid,
               {_COS6.format(a='e.embedding', b='q.qv')} AS sim
        FROM q JOIN probe p ON p.qid = q.qid
        JOIN embeddings e ON e.label = p.list_id
        WHERE e.label <> q.qlabel
    )
    SELECT qid, nid, CAST(rk AS BIGINT) AS rk FROM (
        SELECT qid, nid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sim DESC, nid) AS rk
        FROM sims
    ) WHERE rk <= 5
    """,
    doc="ann_hard_negatives' SCALE path: per anchor, the top-5 most-"
    "similar DIFFERENT-label vectors drawn from the PERSISTED IVF "
    f"index's {_HN_NPROBE} probed lists instead of the whole corpus — "
    "the twin the exact miner's doc promises.  Probe selection is "
    "ivf_probe_batch (codegen array algebra over the collected "
    "centroid table — no nested-loop join); candidate fetch is one "
    "broadcast equi-join on list_id over the partition-pruned invlist "
    "store.  Same-label probed lists drop out by definition of a "
    "negative (the anchor's own list contributes nothing), so the "
    "effective candidate pool is the opposite-label portion of the "
    "probes.  Recall trade: a true hardest negative outside the probed "
    "lists is replaced by the hardest in-probe one — standard ANN "
    "mining.  Eager-construct: the index write runs inside the query.",
)
def ann_hard_negatives_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from .operators.clustering import (
        ivf_probe_batch,
        read_ivf_lists,
        write_ivf_index,
    )
    from .operators.similarity import cosine
    from .queries_ext import _scan_path

    e = load(spark, sf_dir, "embeddings")
    path = _scan_path(sf_dir, "ivf_index_hardneg")
    shutil.rmtree(path, ignore_errors=True)
    write_ivf_index(e, path)
    # everything below sees ONLY the on-disk index
    anchors = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    probe = ivf_probe_batch(spark, path, anchors, nprobe=_HN_NPROBE)
    lists = read_ivf_lists(spark, path).select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").cast("array<double>").alias("nv"),
        F.col("list_id").cast("int").alias("list_id"),
    )
    sims = (
        lists.join(F.broadcast(probe), "list_id")
        .filter(F.col("list_id") != F.col("qlabel"))
        .select(
            "qid",
            "nid",
            F.round(cosine(F.col("nv"), F.col("qv")), 6).alias("sim"),
        )
    )
    wnd = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        sims.withColumn("rk", F.row_number().over(wnd))
        .filter(F.col("rk") <= 5)
        .select("qid", "nid", F.col("rk").cast("long").alias("rk"))
    )


# ===========================================================================
# Batch retrieve -> rerank: many queries through the persisted index
# ===========================================================================
from .queries_wave6 import _BUCKET_SQL, _lr_chain_sql  # noqa: E402

_RERANK_BATCH_SQL = (
    _lr_chain_sql("WHERE doc_id < 200")
    + f"""
    , cent AS (
        SELECT e.label AS list_id, e.embedding AS cv
        FROM embeddings e
        JOIN (SELECT label, MIN(vec_id) AS mv FROM embeddings GROUP BY label) m
          ON e.label = m.label AND e.vec_id = m.mv
    ),
    q AS (
        SELECT vec_id AS qid, embedding AS qv
        FROM embeddings WHERE vec_id % 100 = 0
    ),
    probe AS (
        SELECT qid, list_id FROM (
            SELECT q.qid, cent.list_id,
                   ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                       {_COS6.format(a='cent.cv', b='q.qv')} DESC,
                       cent.list_id) AS rk
            FROM q CROSS JOIN cent
        ) WHERE rk <= 2
    ),
    cand AS (
        SELECT qid, doc_id, cos_sim, rk AS retrieval_rank FROM (
            SELECT p.qid, e.vec_id AS doc_id,
                   {_COS6.format(a='e.embedding', b='q.qv')} AS cos_sim,
                   ROW_NUMBER() OVER (PARTITION BY p.qid ORDER BY
                       {_COS6.format(a='e.embedding', b='q.qv')} DESC,
                       e.vec_id) AS rk
            FROM q JOIN probe p ON p.qid = q.qid
            JOIN embeddings e ON e.label = p.list_id
            WHERE e.vec_id <> q.qid
        ) WHERE rk <= 10
    ),
    ctoks AS (
        SELECT wc.doc_id, {_BUCKET_SQL} % 64 AS bucket
        FROM (SELECT w.doc_id, w.ws FROM w
              JOIN (SELECT DISTINCT doc_id FROM cand) cd
                ON w.doc_id = cd.doc_id) wc,
             UNNEST(wc.ws) AS u(w)
    ),
    xc AS (
        SELECT doc_id, bucket, COUNT(*) AS cnt
        FROM ctoks GROUP BY doc_id, bucket
    ),
    zf AS (
        SELECT xc.doc_id, SUM(CAST(w3.wm AS DOUBLE) * xc.cnt) / 1e6 AS z
        FROM xc JOIN w3 ON xc.bucket = w3.bucket
        GROUP BY xc.doc_id
    )
    SELECT c.qid, c.doc_id, c.cos_sim,
           CAST(c.retrieval_rank AS BIGINT) AS retrieval_rank,
           CAST(FLOOR(1e6 / (1.0 + EXP(-zf.z)) + 0.5) AS BIGINT)
               AS score_micro,
           CAST(ROW_NUMBER() OVER (PARTITION BY c.qid ORDER BY
               FLOOR(1e6 / (1.0 + EXP(-zf.z)) + 0.5) DESC,
               c.cos_sim DESC, c.doc_id) AS BIGINT) AS rerank_rank
    FROM cand c JOIN zf ON c.doc_id = zf.doc_id
    """
)


@register(
    "rerank_batch_topk",
    _RERANK_BATCH_SQL,
    doc="rerank_quality_topk at SERVING scale: a BATCH of queries "
    "(vec_id % 100 = 0) through the same two-stage chain in ONE plan — "
    "stage 1 answers every query's top-10 from the persisted IVF index "
    "via ivf_probe_batch (codegen probe choice, one broadcast equi-join "
    "on list_id, per-query window rank instead of a global sort), "
    "stage 2 scores each DISTINCT candidate doc exactly once with the "
    "labeled-subset classifier and joins scores back — a doc retrieved "
    "by several queries never re-pays the model.  Per-query final "
    "order = (classifier score, retrieval cosine, id).  At 100 TB the "
    "query batch amortizes the index scan and the model cost is "
    "O(distinct candidates), not O(queries x k).  Eager-construct: "
    "index write + labeled fit run inside the query.",
)
def rerank_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from .operators.clustering import (
        ivf_probe_batch,
        read_ivf_lists,
        write_ivf_index,
    )
    from .operators.quality import hashed_features, lr_score, lr_train
    from .operators.similarity import cosine
    from .queries_ext import _scan_path

    e = load(spark, sf_dir, "embeddings")
    path = _scan_path(sf_dir, "ivf_index_rerank_batch")
    shutil.rmtree(path, ignore_errors=True)
    write_ivf_index(e, path)
    # stage 1: per-query candidates from the on-disk index only
    anchors = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    probe = ivf_probe_batch(spark, path, anchors, nprobe=2)
    lists = read_ivf_lists(spark, path).select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("nv"),
        F.col("list_id").cast("int").alias("list_id"),
    )
    wr = W.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("doc_id")
    )
    cand = (
        lists.join(F.broadcast(probe), "list_id")
        .filter(F.col("doc_id") != F.col("qid"))
        .select(
            "qid",
            "doc_id",
            F.round(cosine(F.col("nv"), F.col("qv")), 6).alias("cos_sim"),
        )
        .withColumn("retrieval_rank", F.row_number().over(wr))
        .filter(F.col("retrieval_rank") <= 10)
    )
    # stage 2: each DISTINCT candidate doc meets the model exactly once
    d = load(spark, sf_dir, "documents")
    wts = lr_train(d.filter(F.col("doc_id") < 200), iters=3, lr=0.1)
    docs_c = d.join(
        F.broadcast(cand.select("doc_id").distinct()), "doc_id"
    )
    x = hashed_features(docs_c, label=F.lit(0))
    s = lr_score(x, wts).select("doc_id", "score_micro")
    out = cand.join(F.broadcast(s), "doc_id")
    wf = W.partitionBy("qid").orderBy(
        F.col("score_micro").desc(), F.col("cos_sim").desc(), F.col("doc_id")
    )
    return out.select(
        "qid",
        "doc_id",
        "cos_sim",
        F.col("retrieval_rank").cast("long").alias("retrieval_rank"),
        "score_micro",
        F.row_number().over(wf).cast("long").alias("rerank_rank"),
    )


# ===========================================================================
# IVF centroid-drift monitor: the retrain trigger for assignment QUALITY
# ===========================================================================
_DRIFT_DIM = 64
_DRIFT_SCALE = 1000


@register(
    "ivf_centroid_drift_report",
    f"""
    WITH seed AS (SELECT * FROM embeddings WHERE vec_id % 4 <> 3),
    cent AS (
        SELECT e.label AS list_id, e.embedding AS cv
        FROM seed e
        JOIN (SELECT label, MIN(vec_id) AS mv FROM seed GROUP BY label) m
          ON e.label = m.label AND e.vec_id = m.mv
    ),
    cq AS (
        SELECT list_id, dim,
               CAST(floor(CAST(cv[dim+1] AS DOUBLE)*{_DRIFT_SCALE})
                    AS BIGINT) AS cval
        FROM (SELECT list_id, unnest(range(0, {_DRIFT_DIM})) AS dim, cv
              FROM cent)
    ),
    mq AS (
        SELECT label AS list_id, vec_id, dim,
               CAST(floor(CAST(embedding[dim+1] AS DOUBLE)*{_DRIFT_SCALE})
                    AS BIGINT) AS val
        FROM (SELECT label, vec_id,
                     unnest(range(0, {_DRIFT_DIM})) AS dim, embedding
              FROM embeddings)
    ),
    md AS (
        SELECT list_id, dim,
               CAST(floor(SUM(val)::DOUBLE / COUNT(*)) AS BIGINT) AS mval,
               COUNT(*) AS n
        FROM mq GROUP BY list_id, dim
    ),
    dd AS (
        SELECT md.list_id,
               SUM((md.mval - cq.cval) * (md.mval - cq.cval))
                   AS drift_dist2,
               MAX(md.n) AS n_members
        FROM md JOIN cq ON md.list_id = cq.list_id AND md.dim = cq.dim
        GROUP BY md.list_id
    ),
    nd AS (
        SELECT label AS list_id, COUNT(*) AS n_delta
        FROM embeddings WHERE vec_id % 4 = 3 GROUP BY label
    )
    SELECT CAST(dd.list_id AS BIGINT) AS list_id,
           CAST(dd.n_members AS BIGINT) AS n_members,
           CAST(COALESCE(nd.n_delta, 0) AS BIGINT) AS n_delta,
           CAST(dd.drift_dist2 AS BIGINT) AS drift_dist2
    FROM dd LEFT JOIN nd ON dd.list_id = nd.list_id
    """,
    doc="IVF index maintenance monitor #2 — centroid DRIFT, the retrain "
    "trigger ivf_list_skew_report's occupancy signal can't see: append-"
    "only ingest (append_ivf_batch) leaves the stored representative "
    "centroids frozen at seed time, so as deltas accumulate, each "
    "list's member mean walks away from its centroid and probe recall "
    "decays even while occupancy stays balanced.  Per list: member "
    "count, delta count, and the exact integer squared distance "
    "between the stored centroid and the CURRENT member mean (seed + "
    "delta read back from the persisted index), in milli-unit "
    "quantization — floor-of-mean per dimension, so the number is "
    "bit-reproducible and comparable across runs.  Plan: one union of "
    "the partitioned stores, one (list,dim) partial agg, a broadcast "
    "join against the posexploded centroid table, one final list agg — "
    "no collects beyond the model-sized centroid table.  Eager-"
    "construct: seed write + delta append run inside the query.",
)
def ivf_centroid_drift_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil

    from .operators.clustering import (
        append_ivf_batch,
        int_vectors,
        write_ivf_index,
    )
    from .queries_ext import _scan_path

    e = load(spark, sf_dir, "embeddings")
    seed = e.filter(F.col("vec_id") % 4 != 3)
    batch = e.filter(F.col("vec_id") % 4 == 3)
    path = _scan_path(sf_dir, "ivf_drift")
    shutil.rmtree(path, ignore_errors=True)
    write_ivf_index(seed, path)
    append_ivf_batch(batch, path, batch_id=1)
    # everything below sees ONLY the on-disk index (seed + delta)
    lists = spark.read.parquet(f"{path}/lists").select(
        F.col("list_id").cast("long").alias("list_id"),
        int_vectors(F.col("embedding"), _DRIFT_SCALE).alias("qv"),
    )
    delta = spark.read.parquet(f"{path}/lists_delta").select(
        F.col("list_id").cast("long").alias("list_id"),
        int_vectors(F.col("embedding"), _DRIFT_SCALE).alias("qv"),
    )
    members = lists.unionByName(delta)
    dims = members.select(
        "list_id", F.posexplode("qv").alias("dim", "val")
    )
    md = dims.groupBy("list_id", "dim").agg(
        F.floor(F.sum("val") / F.count(F.lit(1))).cast("long").alias("mval"),
        F.count(F.lit(1)).alias("n"),
    )
    cq = (
        spark.read.parquet(f"{path}/centroids")
        .select(
            F.col("list_id").cast("long").alias("list_id"),
            F.posexplode(
                int_vectors(F.col("centroid"), _DRIFT_SCALE)
            ).alias("dim", "cval"),
        )
    )
    dd = (
        md.join(F.broadcast(cq), ["list_id", "dim"])
        .groupBy("list_id")
        .agg(
            F.sum(
                (F.col("mval") - F.col("cval"))
                * (F.col("mval") - F.col("cval"))
            ).alias("drift_dist2"),
            F.max("n").alias("n_members"),
        )
    )
    nd = delta.groupBy("list_id").agg(
        F.count(F.lit(1)).alias("n_delta")
    )
    return dd.join(nd, "list_id", "left").select(
        "list_id",
        F.col("n_members").cast("long").alias("n_members"),
        F.coalesce(F.col("n_delta"), F.lit(0))
        .cast("long")
        .alias("n_delta"),
        F.col("drift_dist2").cast("long").alias("drift_dist2"),
    )


# ===========================================================================
# LSH incremental match, PROBE-ONLY form: the index pre-persists OUTSIDE
# the timed path
# ===========================================================================
from .queries_corpus import _lsh_incremental_sql  # noqa: E402


@register(
    "lsh_match_probe_only",
    _lsh_incremental_sql(),
    doc="The probe half of lsh_incremental_match measured on its own: "
    "the corpus LSH index persists ONLY if absent (write-if-missing, "
    "path salted with the md5 of the dedup chain's source so a code "
    "change can never serve a stale index), so after the first run the "
    "timed path is purely what per-batch ingest pays at steady state — "
    "band-hash the batch, equi-join the persisted band table, exact-"
    "Jaccard verify against the persisted shingle table.  This is the "
    "row that shows the per-batch serving cost WITHOUT the one-time "
    "index build lsh_incremental_match's row includes (the build-once/"
    "query-many economics made measurable, the keeplist_delta_refresh_"
    "only treatment applied to the dedup index).  Same oracle as "
    "lsh_incremental_match.",
)
def lsh_match_probe_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import inspect

    from .operators import dedup as dd
    from .operators.dedup import match_lsh_index, write_lsh_index
    from .queries_ext import _data_fingerprint, _scan_path

    d = load(spark, sf_dir, "documents")
    # salt = code source + params + a DATA fingerprint (file size/mtime
    # digest): regenerating the sf_dir parquet in place invalidates the
    # cached index instead of silently serving stale matches
    salt = hashlib.md5(
        (
            inspect.getsource(dd)
            + "|mod10|t=0.6|"
            + _data_fingerprint(spark, sf_dir, "documents")
        ).encode()
    ).hexdigest()[:10]
    path = _scan_path(sf_dir, f"lsh_index_ro_{salt}")
    marker = spark._jvm.org.apache.hadoop.fs.Path(
        f"{path}/shingles/_SUCCESS"
    )
    fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(marker):
        write_lsh_index(d.filter(F.col("doc_id") % 10 != 0), path)
    # the timed path: the batch probes ONLY the on-disk index
    out = match_lsh_index(
        spark,
        path,
        d.filter(F.col("doc_id") % 10 == 0),
        threshold=0.6,
    )
    return out.select(
        F.col("batch_id").cast("long").alias("batch_id"),
        F.col("corpus_id").cast("long").alias("corpus_id"),
        "jaccard",
    )


# ===========================================================================
# Streaming vector ingestion: nearest-centroid assignment + delta append
# ===========================================================================
@register(
    "ivf_assign_ingest",
    f"""
    WITH seed AS (SELECT * FROM embeddings WHERE vec_id % 4 <> 3),
    cent AS (
        SELECT e.label AS list_id, e.embedding AS cv
        FROM seed e
        JOIN (SELECT label, MIN(vec_id) AS mv FROM seed GROUP BY label) m
          ON e.label = m.label AND e.vec_id = m.mv
    ),
    batch AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 = 3
    ),
    asg AS (
        SELECT vec_id, list_id FROM (
            SELECT b.vec_id, cent.list_id,
                   ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
                       {_COS6.format(a='cent.cv', b='b.embedding')} DESC,
                       cent.list_id) AS rk
            FROM batch b CROSS JOIN cent
        ) WHERE rk = 1
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(list_id AS BIGINT) AS list_id
    FROM asg
    """,
    doc="The ingestion half of streaming vector indexing: arriving "
    "vectors carry NO list key, so each is assigned to its nearest "
    "inverted list by 6-dp cosine against the persisted centroid table "
    "(ties to the smaller list_id) and appended as a delta partition — "
    "ivf_assign_batch + append_ivf_batch, the foreachBatch body of "
    "streaming/ingest.ivf_ingest_sink.  Assignment compiles into "
    "whole-stage-codegen array algebra over the collected centroids "
    "(ivf_probe_batch with nprobe=1 — no join planned); the returned "
    "rows are the DELTA STORE READ BACK from disk, so a hash match "
    "proves assignment AND persistence round-trip together.  The "
    "oracle replays the min-id-representative centroid pick and the "
    "argmax-cosine assignment CTE-by-CTE.  Eager-construct: seed index "
    "write + assignment + delta append run inside the query.",
)
def ivf_assign_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from .operators.clustering import (
        append_ivf_batch,
        ivf_assign_batch,
        write_ivf_index,
    )
    from .queries_ext import _scan_path

    e = load(spark, sf_dir, "embeddings")
    seed = e.filter(F.col("vec_id") % 4 != 3)
    batch = e.filter(F.col("vec_id") % 4 == 3).select(
        "vec_id", "embedding"
    )
    path = _scan_path(sf_dir, "ivf_assign")
    shutil.rmtree(path, ignore_errors=True)
    write_ivf_index(seed, path)
    assigned = ivf_assign_batch(spark, path, batch)
    append_ivf_batch(
        assigned, path, batch_id=1, list_col="list_id"
    )
    # everything below sees ONLY the on-disk delta store
    d = spark.read.parquet(f"{path}/lists_delta")
    return d.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("list_id").cast("long").alias("list_id"),
    )


# ===========================================================================
# Cluster-balanced sampling: diversity-preserving data selection
# ===========================================================================
from .queries_corpus import _km_chain_sql, _KM_K, _KM_ITERS, _KM_SCALE  # noqa: E402

_CBS_QUOTA = 20


@register(
    "cluster_balanced_sample",
    f"""
    WITH {_km_chain_sql()},
    h AS (
        SELECT vec_id, cluster,
               ('0x' || substr(md5('cbs_' || CAST(vec_id AS VARCHAR)),
                1, 8))::BIGINT AS hv
        FROM aF
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(cluster AS INT) AS cluster,
           CAST(pick_rank AS BIGINT) AS pick_rank
    FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY cluster
                   ORDER BY hv, vec_id) AS pick_rank
        FROM h
    ) WHERE pick_rank <= {_CBS_QUOTA}
    """,
    doc="Cluster-balanced data selection: the k-means clustering of the "
    "embedding space (the kmeans_embeddings fit, bit-identical) becomes "
    f"a diversity quota — each cluster contributes its first "
    f"{_CBS_QUOTA} members in deterministic seeded-hash order, so the "
    "sample covers every region of embedding space instead of letting "
    "the head cluster dominate (the balancing step semantic-dedup "
    "pipelines run after SemDeDup pruning; quota-per-cluster is the "
    "public recipe).  Per-cluster rank is a cluster-partitioned window "
    "(never global); the hash order makes the sample reproducible and "
    "refresh-stable — re-running on the same corpus picks the same "
    "rows.  Oracle replays the full k-means chain plus the quota "
    "window CTE-by-CTE.",
)
def cluster_balanced_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .functions.text import shingle_hash
    from .operators.clustering import kmeans_fit_assign

    e = load(spark, sf_dir, "embeddings").transform(spread)
    asg = kmeans_fit_assign(
        e, k=_KM_K, iters=_KM_ITERS, scale=_KM_SCALE
    ).select(
        "vec_id",
        "cluster",
        shingle_hash(
            F.concat(F.lit("cbs_"), F.col("vec_id").cast("string"))
        ).alias("hv"),
    )
    wnd = W.partitionBy("cluster").orderBy("hv", "vec_id")
    return (
        asg.withColumn("pick_rank", F.row_number().over(wnd))
        .filter(F.col("pick_rank") <= _CBS_QUOTA)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("cluster").cast("int").alias("cluster"),
            F.col("pick_rank").cast("long").alias("pick_rank"),
        )
    )
