"""Wave-7 serving/curation operators: compositions that close the
retrieve -> rerank loop and the remaining production lifecycles over the
`documents` / `embeddings` tables, each with a DuckDB oracle.

  rerank_quality_topk   the standard two-stage serving chain: candidate
                        retrieval from the PERSISTED IVF index (partition-
                        pruned probe), then cross-encoder-style exact
                        re-scoring of ONLY the candidates with the
                        hashed-feature quality model trained on a labeled
                        subset — recall from the cheap stage, precision
                        from the expensive one applied to k rows
  ivf_nprobe_recall_sweep  the index-tuning audit: recall@10 vs the
                        exact baseline for nprobe = 1..4 in ONE plan
                        (each candidate explodes into every nprobe tier
                        that would scan it)
  contrastive_triplets  (anchor, positive, negative) mining for metric
                        learning: nearest same-label + nearest
                        different-label per anchor, with the margin
  curriculum_schedule   competence-based curriculum (Platanios et al.
                        2019): docs ranked by corpus-LM surprisal,
                        epochs admit the easiest floor(N*sqrt(e/E))
                        prefix — per-epoch admission counts
  ccnet_perplexity_buckets  CCNet-style head/middle/tail partition
                        (Wenzek et al. 2020): per-language NTILE(3) over
                        per-token LM surprisal

Float discipline follows the repo-wide micro-unit idiom (floor(x*1e6+0.5)
to BIGINT before any sum / ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .queries import load, register
from .queries_wave6 import _BUCKET_SQL, _lr_chain_sql


# ===========================================================================
# Retrieve -> rerank: persisted-ANN candidates re-scored by the classifier
# ===========================================================================
_RERANK_SQL = (
    _lr_chain_sql("WHERE doc_id < 200")
    + f"""
    , cent AS (
        SELECT e.label, e.embedding AS cv
        FROM embeddings e
        JOIN (SELECT label, MIN(vec_id) AS mv FROM embeddings GROUP BY label) m
          ON e.label = m.label AND e.vec_id = m.mv
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
    probe AS (
        SELECT label FROM (
            SELECT cent.label,
                   ROW_NUMBER() OVER (ORDER BY
                       ROUND(list_cosine_similarity(
                           cent.cv::DOUBLE[], q.qv::DOUBLE[])::DOUBLE, 6)
                           DESC, cent.label) AS rk
            FROM cent CROSS JOIN q
        ) WHERE rk <= 2
    ),
    cand AS (
        SELECT vec_id AS doc_id, cos_sim, rk AS retrieval_rank FROM (
            SELECT e.vec_id,
                   ROUND(list_cosine_similarity(
                       e.embedding::DOUBLE[], q.qv::DOUBLE[])::DOUBLE, 6)
                       AS cos_sim,
                   ROW_NUMBER() OVER (ORDER BY
                       ROUND(list_cosine_similarity(
                           e.embedding::DOUBLE[], q.qv::DOUBLE[])::DOUBLE, 6)
                           DESC, e.vec_id) AS rk
            FROM embeddings e
            JOIN probe ON e.label = probe.label
            CROSS JOIN q
            WHERE e.vec_id <> 1
        ) WHERE rk <= 20
    ),
    ctoks AS (
        SELECT wc.doc_id, {_BUCKET_SQL} % 64 AS bucket
        FROM (SELECT w.doc_id, w.ws FROM w
              JOIN cand ON w.doc_id = cand.doc_id) wc,
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
    SELECT c.doc_id, c.cos_sim,
           CAST(c.retrieval_rank AS BIGINT) AS retrieval_rank,
           CAST(FLOOR(1e6 / (1.0 + EXP(-zf.z)) + 0.5) AS BIGINT)
               AS score_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY
               FLOOR(1e6 / (1.0 + EXP(-zf.z)) + 0.5) DESC,
               c.cos_sim DESC, c.doc_id) AS BIGINT) AS rerank_rank
    FROM cand c JOIN zf ON c.doc_id = zf.doc_id
    """
)


@register(
    "rerank_quality_topk",
    _RERANK_SQL,
    doc="The standard two-stage serving chain, retrieve -> rerank: "
    "stage 1 answers top-20 candidates from the PERSISTED IVF index "
    "(write_ivf_index + partition-pruned probe, the ann_ivf_persisted "
    "lifecycle), stage 2 joins the 20 candidates back to their full "
    "text and re-scores them with the hashed-feature quality classifier "
    "trained on the labeled doc_id<200 subset (operators/quality "
    "lr_train / lr_score) — the cross-encoder slot, where the expensive "
    "exact model touches only k rows.  Final order = (classifier score, "
    "retrieval cosine, id); both ranks emitted so the movement is "
    "auditable.  At 100 TB stage 1 reads only the probed partitions and "
    "stage 2 is O(k): the corpus never meets the expensive model.  "
    "Eager-construct: index write + labeled-subset fit run inside the "
    "query (production persists both — write_ivf_index / "
    "write_quality_model).",
)
def rerank_quality_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from .operators.clustering import ivf_probe_topk, write_ivf_index
    from .operators.quality import hashed_features, lr_score, lr_train
    from .queries_ext import _scan_path

    e = load(spark, sf_dir, "embeddings")
    path = _scan_path(sf_dir, "ivf_index_rerank")
    shutil.rmtree(path, ignore_errors=True)
    write_ivf_index(e, path)
    # stage 1: candidates from the on-disk index only
    qrow = e.filter(F.col("vec_id") == 1).select("embedding").first()
    cand = ivf_probe_topk(
        spark,
        path,
        [float(x) for x in qrow["embedding"]],
        nprobe=2,
        k=20,
        exclude_id=1,
    ).select(
        F.col("vec_id").alias("doc_id"),
        "cos_sim",
        F.col("rk").alias("retrieval_rank"),
    )
    # stage 2: exact model over ONLY the k candidates' text
    d = load(spark, sf_dir, "documents")
    w = lr_train(d.filter(F.col("doc_id") < 200), iters=3, lr=0.1)
    docs_c = d.join(F.broadcast(cand), "doc_id")
    x = hashed_features(docs_c, label=F.lit(0))
    s = lr_score(x, w).select("doc_id", "score_micro")
    out = s.join(F.broadcast(cand), "doc_id")
    wr = W.partitionBy(F.col("score_micro") * F.lit(0)).orderBy(
        F.col("score_micro").desc(), F.col("cos_sim").desc(), F.col("doc_id")
    )
    return out.select(
        "doc_id",
        "cos_sim",
        F.col("retrieval_rank").cast("long").alias("retrieval_rank"),
        "score_micro",
        F.row_number().over(wr).cast("long").alias("rerank_rank"),
    )


# ===========================================================================
# IVF nprobe sweep: the recall-vs-cost curve an index deployment tunes
# ===========================================================================
_COS6 = (
    "ROUND(list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])::DOUBLE, 6)"
)


@register(
    "ivf_nprobe_recall_sweep",
    f"""
    WITH base AS (SELECT vec_id, label, embedding FROM embeddings),
    q AS (SELECT embedding AS qv FROM base WHERE vec_id = 1),
    cent AS (
        SELECT b.label, b.embedding AS cv
        FROM base b
        JOIN (SELECT label, MIN(vec_id) AS mv FROM base GROUP BY label) m
          ON b.label = m.label AND b.vec_id = m.mv
    ),
    crank AS (
        SELECT cent.label,
               ROW_NUMBER() OVER (ORDER BY
                   {_COS6.format(a='cent.cv', b='q.qv')} DESC, cent.label)
                   AS crk
        FROM cent CROSS JOIN q
    ),
    scored AS (
        SELECT b.vec_id, b.label,
               {_COS6.format(a='b.embedding', b='q.qv')} AS cos_sim
        FROM base b CROSS JOIN q WHERE b.vec_id <> 1
    ),
    exact AS (
        SELECT vec_id FROM (
            SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos_sim DESC,
                vec_id) AS rk FROM scored
        ) WHERE rk <= 10
    ),
    pool AS (
        SELECT s.vec_id, s.cos_sim, CAST(u.np AS INTEGER) AS nprobe
        FROM scored s
        JOIN crank c ON s.label = c.label AND c.crk <= 4,
        UNNEST(range(c.crk, 5)) AS u(np)
    ),
    approx AS (
        SELECT nprobe, vec_id FROM (
            SELECT nprobe, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY nprobe
                       ORDER BY cos_sim DESC, vec_id) AS rk
            FROM pool
        ) WHERE rk <= 10
    ),
    hits AS (
        SELECT a.nprobe, COUNT(*) AS h
        FROM approx a JOIN exact e ON a.vec_id = e.vec_id
        GROUP BY a.nprobe
    )
    SELECT CAST(p.nprobe AS BIGINT) AS nprobe,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(COALESCE(MAX(h.h), 0) AS BIGINT) AS hits,
           CAST(FLOOR(COALESCE(MAX(h.h), 0) * 1e6 / 10 + 0.5) AS BIGINT)
               AS recall_at10_micro
    FROM pool p LEFT JOIN hits h ON p.nprobe = h.nprobe
    GROUP BY p.nprobe
    """,
    doc="The IVF tuning curve: recall@10 against the exact baseline for "
    "nprobe = 1..4, plus the candidate-pool size each tier scans — the "
    "cost/recall trade a 100-TB ANN deployment picks its operating "
    "point from.  One plan, no per-tier re-scan: a candidate in the "
    "list ranked crk-nearest explodes into every nprobe >= crk "
    "(sequence(crk, 4) guarded by crk <= 4 — Spark's sequence DESCENDS "
    "when start > stop), so the corpus is scored once and each tier's "
    "top-10 is a partitioned window.  The exact-baseline block is the "
    "allowlisted bounded broadcast; recall is integer micro-units.",
)
def ivf_nprobe_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine

    e = load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    base = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = base.filter(F.col("vec_id") == 1).select(F.col("v").alias("qv"))
    reps = base.groupBy("label").agg(F.min("vec_id").alias("mv")).select(
        F.col("label").alias("rlabel"), "mv"
    )
    cent = base.join(
        reps,
        (F.col("label") == F.col("rlabel")) & (F.col("vec_id") == F.col("mv")),
    ).select(F.col("label").alias("clabel"), F.col("v").alias("cv"))
    wc = W.partitionBy(F.col("csim") * F.lit(0.0)).orderBy(
        F.col("csim").desc(), F.col("clabel")
    )
    crank = (
        cent.crossJoin(F.broadcast(q))
        .select(
            "clabel",
            F.round(cosine(F.col("cv"), F.col("qv")), 6).alias("csim"),
        )
        .select(
            F.col("clabel").alias("label"),
            F.row_number().over(wc).alias("crk"),
        )
    )
    scored = (
        base.filter(F.col("vec_id") != 1)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
    )
    exact = (
        scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id")
    )
    pool = (
        scored.join(F.broadcast(crank.filter(F.col("crk") <= 4)), "label")
        .select(
            "vec_id",
            "cos_sim",
            F.explode(F.sequence(F.col("crk"), F.lit(4))).alias("np0"),
        )
        .select("vec_id", "cos_sim", F.col("np0").cast("int").alias("nprobe"))
    )
    wa = W.partitionBy("nprobe").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    approx = (
        pool.withColumn("rk", F.row_number().over(wa))
        .filter(F.col("rk") <= 10)
        .select("nprobe", "vec_id")
    )
    hits = approx.join(F.broadcast(exact), "vec_id").groupBy("nprobe").agg(
        F.count(F.lit(1)).alias("h")
    )
    return (
        pool.groupBy("nprobe")
        .agg(F.count(F.lit(1)).alias("n_candidates"))
        .join(F.broadcast(hits), "nprobe", "left")
        .select(
            F.col("nprobe").cast("long").alias("nprobe"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hits"),
            F.floor(F.coalesce(F.col("h"), F.lit(0)) * 1e6 / 10 + 0.5)
            .cast("long")
            .alias("recall_at10_micro"),
        )
    )


# ===========================================================================
# Contrastive triplet mining: (anchor, positive, negative) with margin
# ===========================================================================
@register(
    "contrastive_triplets",
    f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qv, label AS qlabel
        FROM embeddings WHERE vec_id % 50 = 0
    ),
    sims AS (
        SELECT q.qid, q.qlabel, e.vec_id AS nid, e.label AS nlabel,
               {_COS6.format(a='q.qv', b='e.embedding')} AS sim
        FROM q CROSS JOIN embeddings e
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
    doc="Triplet mining for metric learning: per anchor, the hardest "
    "positive substitute (nearest SAME-label neighbor) and the hardest "
    "negative (nearest DIFFERENT-label neighbor) with the cosine margin "
    "between them — the rows a triplet-loss trainer consumes, and the "
    "margin histogram an embedding-quality audit reads.  Same bounded "
    "broadcast-anchor-block exact scorer as ann_hard_negatives "
    "(allowlisted); at scale the candidate side comes from the bucketed "
    "ANN index.  Cosines double-cast on both engines; margin in exact "
    "micro-units of the 6-dp-rounded cosines.",
)
def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine

    e = load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    ed = F.col("embedding").cast("array<double>")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        ed.alias("qv"),
        F.col("label").alias("qlabel"),
    )
    cand = e.select(
        F.col("vec_id").alias("nid"), ed.alias("nv"),
        F.col("label").alias("nlabel"),
    )
    sims = (
        F.broadcast(q)
        .crossJoin(cand)
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid", "qlabel", "nid", "nlabel",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("sim"),
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
# Competence-based curriculum schedule (Platanios et al. 2019)
# ===========================================================================
# per-doc corpus-LM surprisal CTE chain, shared by the curriculum and
# CCNet-bucket oracles (identical to the unigram_surprisal oracle)
from .queries import _NORM_SQL  # noqa: E402

_SURPRISAL_DOC_SQL = f"""
    toks AS (
        SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
        FROM documents
    ),
    t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM t
           GROUP BY doc_id, term),
    vocab AS (SELECT term, count(*) AS cw FROM t GROUP BY term),
    consts AS (SELECT SUM(cw) AS nn, count(*) AS vv FROM vocab),
    scored AS (
        SELECT tf.doc_id,
               CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
               CAST(SUM(tf.tf * CAST(floor(
                   -ln((v.cw + 1.0) / (c.nn + c.vv)) * 1e6 + 0.5)
                   AS BIGINT)) AS BIGINT) AS surprisal_micro
        FROM tf JOIN vocab v ON tf.term = v.term CROSS JOIN consts c
        GROUP BY tf.doc_id
    )
"""

# sqrt(e/E) competence literals, injected identically into both engines
_CURR_C = {1: 0.5, 2: 0.7071067811865476, 3: 0.8660254037844386}


@register(
    "curriculum_schedule",
    f"""
    WITH {_SURPRISAL_DOC_SQL},
    ranked AS (
        SELECT doc_id, surprisal_micro,
               ROW_NUMBER() OVER (ORDER BY surprisal_micro, doc_id) AS r,
               COUNT(*) OVER () AS n
        FROM scored
    ),
    tagged AS (
        SELECT surprisal_micro,
               CASE WHEN r <= FLOOR(n * {_CURR_C[1]} + 0.5) THEN 1
                    WHEN r <= FLOOR(n * {_CURR_C[2]} + 0.5) THEN 2
                    WHEN r <= FLOOR(n * {_CURR_C[3]} + 0.5) THEN 3
                    ELSE 4 END AS e_min
        FROM ranked
    ),
    avail AS (
        SELECT surprisal_micro, e_min, CAST(u.e AS BIGINT) AS epoch
        FROM tagged, UNNEST(range(e_min, 5)) AS u(e)
    )
    SELECT epoch,
           CAST(COUNT(*) AS BIGINT) AS n_available,
           CAST(SUM(CASE WHEN e_min = epoch THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(MAX(surprisal_micro) AS BIGINT) AS max_difficulty_micro
    FROM avail GROUP BY epoch
    """,
    doc="Competence-based curriculum (Platanios et al. 2019 — public "
    "technique): documents ranked easiest-first by total corpus-LM "
    "surprisal (the length x rarity difficulty axis; pure-BIGINT sort "
    "key, no float ordering), and training epoch e of 4 admits the "
    "easiest floor(N*sqrt(e/4)+0.5) prefix — the sqrt competence "
    "pacing.  Emits per epoch: cumulative pool size, newly admitted "
    "docs, and the difficulty ceiling.  The global rank is the one "
    "single-partition window (rank of ~billions of docs at 100 TB "
    "would instead range-partition on the difficulty key, the "
    "w1-export pattern); everything after is a 4-row frame.",
)
def curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import unigram_surprisal

    d = load(spark, sf_dir, "documents")
    s = unigram_surprisal(d).select("doc_id", "surprisal_micro")
    zero = F.lit(0) * F.col("surprisal_micro")
    wr = W.partitionBy(zero).orderBy("surprisal_micro", "doc_id")
    wn = W.partitionBy(zero)
    ranked = s.select(
        "surprisal_micro",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    n = F.col("n")
    tagged = ranked.select(
        "surprisal_micro",
        F.when(F.col("r") <= F.floor(n * _CURR_C[1] + 0.5), 1)
        .when(F.col("r") <= F.floor(n * _CURR_C[2] + 0.5), 2)
        .when(F.col("r") <= F.floor(n * _CURR_C[3] + 0.5), 3)
        .otherwise(4)
        .alias("e_min"),
    )
    # a doc admitted at e_min is available in every epoch e >= e_min, so
    # each doc explodes into its availability range and ONE groupBy yields
    # the cumulative pool, the per-epoch admissions, and the difficulty
    # ceiling — no 4-row window (whose 0*epoch partition key Spark folds
    # away: range ids are non-nullable), no left join
    avail = tagged.select(
        "surprisal_micro",
        "e_min",
        F.explode(F.sequence(F.col("e_min"), F.lit(4))).alias("epoch"),
    )
    return (
        avail.groupBy("epoch")
        .agg(
            F.count(F.lit(1)).alias("n_available"),
            F.sum(F.when(F.col("e_min") == F.col("epoch"), 1).otherwise(0))
            .alias("n_new"),
            F.max("surprisal_micro").alias("max_difficulty_micro"),
        )
        .select(
            F.col("epoch").cast("long").alias("epoch"),
            F.col("n_available").cast("long").alias("n_available"),
            F.col("n_new").cast("long").alias("n_new"),
            F.col("max_difficulty_micro").cast("long")
            .alias("max_difficulty_micro"),
        )
    )


# ===========================================================================
# CCNet head/middle/tail perplexity partition (Wenzek et al. 2020)
# ===========================================================================
@register(
    "ccnet_perplexity_buckets",
    f"""
    WITH {_SURPRISAL_DOC_SQL},
    b AS (
        SELECT d.lang, s.doc_id, s.n_tokens, s.surprisal_micro,
               NTILE(3) OVER (PARTITION BY d.lang
                   ORDER BY CAST(s.surprisal_micro AS DOUBLE) / s.n_tokens,
                            s.doc_id) AS bucket
        FROM scored s JOIN documents d ON s.doc_id = d.doc_id
    )
    SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket_name,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(FLOOR(CAST(SUM(surprisal_micro) AS DOUBLE) / SUM(n_tokens)
               + 0.5) AS BIGINT) AS mean_token_surprisal_micro
    FROM b GROUP BY lang, bucket
    """,
    doc="CCNet-style corpus partition (Wenzek et al. 2020 — public "
    "technique): per language, documents split into head/middle/tail "
    "terciles of per-token LM surprisal (NTILE(3) over the per-lang "
    "perplexity order; the head tercile is what CCNet keeps for "
    "training).  Per-token surprisal ordering is a double division of "
    "two exact BIGINTs — IEEE-identical across engines — with doc_id "
    "tiebreak.  One tokenize feeds the whole chain; per-lang windows "
    "partition naturally at scale.",
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import unigram_surprisal

    d = load(spark, sf_dir, "documents")
    s = unigram_surprisal(d).select("doc_id", "n_tokens", "surprisal_micro")
    b = s.join(d.select("doc_id", "lang"), "doc_id").select(
        "lang", "doc_id", "n_tokens", "surprisal_micro",
        F.ntile(3)
        .over(
            W.partitionBy("lang").orderBy(
                F.col("surprisal_micro").cast("double") / F.col("n_tokens"),
                "doc_id",
            )
        )
        .alias("bucket"),
    )
    return b.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.floor(
            F.sum("surprisal_micro").cast("double") / F.sum("n_tokens") + 0.5
        ).cast("long").alias("mean_token_surprisal_micro"),
    ).select(
        "lang",
        F.col("bucket").cast("long").alias("bucket"),
        F.when(F.col("bucket") == 1, "head")
        .when(F.col("bucket") == 2, "middle")
        .otherwise("tail")
        .alias("bucket_name"),
        "n_docs", "n_tokens", "mean_token_surprisal_micro",
    )
