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

from .queries import load, register, spread
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

    e = load(spark, sf_dir, "embeddings").transform(spread)
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
    "(allowlisted); the scale twin mining from the persisted IVF probe "
    "is contrastive_triplets_ivf (queries_wave8.py).  Cosines double-"
    "cast on both engines; margin in exact micro-units of the 6-dp-"
    "rounded cosines.",
)
def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine

    e = load(spark, sf_dir, "embeddings").transform(spread)
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


# ===========================================================================
# LSH band-configuration sweep: the dedup twin of the nprobe recall curve
# ===========================================================================
_BS_CONFIGS = [(16, 1), (8, 2), (4, 4), (2, 8)]  # (bands, rows_per_band)
_BS_T = 0.6


def _band_sweep_sql() -> str:
    from .queries import _SHINGLES_SQL, _minhash_sig_sql

    band_selects = []
    for bands, rows in _BS_CONFIGS:
        for b in range(bands):
            cols = ", ".join(
                f"CAST(sig_{i} AS VARCHAR)"
                for i in range(b * rows, (b + 1) * rows)
            )
            band_selects.append(
                f"SELECT {bands} AS bands, doc_id, {b} AS band_idx, "
                f"md5(concat_ws('_', {cols})) AS band_hash FROM sig"
            )
        # one UNION ALL chain over every (config, band)
    banded = "\n UNION ALL\n".join(band_selects)
    shingles_sub = _SHINGLES_SQL.replace("FROM documents", "")
    return f"""
    WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
    sig AS ({_minhash_sig_sql(16, 'sub')}),
    banded AS ({banded}),
    cand AS (
        SELECT DISTINCT a.bands, a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.bands = b.bands AND a.band_idx = b.band_idx
         AND a.band_hash = b.band_hash
        WHERE a.doc_id < b.doc_id
    ),
    sh AS (SELECT doc_id, list_distinct(list_transform({shingles_sub},
               s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT))) AS sh
           FROM sub),
    truth AS (
        SELECT sa.doc_id AS id_a, sb.doc_id AS id_b
        FROM sh sa JOIN sh sb ON sa.doc_id < sb.doc_id
        WHERE CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
              THEN len(list_intersect(sa.sh, sb.sh))::DOUBLE
                   / len(list_distinct(list_concat(sa.sh, sb.sh)))
              ELSE 0 END >= {_BS_T}
    ),
    tot AS (SELECT COUNT(*) AS truth_total FROM truth),
    per AS (
        SELECT c.bands, COUNT(*) AS n_candidates,
               SUM(CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END) AS tp
        FROM cand c LEFT JOIN truth t
          ON c.id_a = t.id_a AND c.id_b = t.id_b
        GROUP BY c.bands
    )
    SELECT CAST(p.bands AS BIGINT) AS bands,
           CAST(16 / p.bands AS BIGINT) AS rows_per_band,
           CAST(p.n_candidates AS BIGINT) AS n_candidates,
           CAST(p.tp AS BIGINT) AS true_pos,
           CAST(t.truth_total AS BIGINT) AS truth_total,
           CAST(CASE WHEN t.truth_total > 0
                THEN FLOOR(p.tp * 1e6 / t.truth_total + 0.5)
                ELSE 0 END AS BIGINT) AS recall_micro,
           CAST(FLOOR(p.tp * 1e6 / p.n_candidates + 0.5) AS BIGINT)
               AS precision_micro
    FROM per p CROSS JOIN tot t
    """


@register(
    "lsh_band_sweep",
    _band_sweep_sql(),
    doc="The LSH tuning curve, dedup twin of ivf_nprobe_recall_sweep: "
    "candidate recall AND precision against exact shingle-Jaccard truth "
    "(threshold 0.6) for four band configs of one 16-hash MinHash "
    "signature — 16x1, 8x2, 4x4, 2x8.  Signatures are computed ONCE; "
    "each config re-bands the same columns, so the sweep costs one "
    "shingle pass plus banded equi-joins.  Config candidate sets are "
    "provably nested (a 2r-row band collision implies both r-row "
    "collisions), so recall/candidates are monotone in bands — the "
    "property test asserts it.  Truth is the labeled exact all-pairs "
    "baseline on a FIXED 250-doc sample (allowlisted; constant cost "
    "at any corpus size); truth_total rides "
    "a 1-row broadcast.  This is the audit a 100-TB dedup run does on a "
    "sample BEFORE committing to a band config.",
)
def lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import shingle_hash, shingles
    from .operators.dedup import minhash_signatures

    # FIXED 250-doc tuning sample (ids are stable under corpus growth):
    # the band-config audit runs on a constant-size sample no matter how
    # big the corpus is — its cost does not scale with the data
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    sig = minhash_signatures(d, n_hashes=16)
    # ONE signature pass, ONE explode: all 30 (config, band) hashes ride a
    # single generated array — a union of per-config branches would rescan
    # and re-sign the sample once per config
    band_structs = []
    for bands, rows in _BS_CONFIGS:
        for b in range(bands):
            parts = [
                F.col(f"sig_{i}").cast("string")
                for i in range(b * rows, (b + 1) * rows)
            ]
            band_structs.append(
                F.struct(
                    F.lit(bands).alias("bands"),
                    F.lit(b).alias("band_idx"),
                    F.md5(F.concat_ws("_", *parts)).alias("band_hash"),
                )
            )
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bd")
    ).select("doc_id", "bd.bands", "bd.band_idx", "bd.band_hash")
    a = banded.select(
        "bands", "band_idx", "band_hash", F.col("doc_id").alias("id_a")
    )
    b2 = banded.select(
        "bands", "band_idx", "band_hash", F.col("doc_id").alias("id_b")
    )
    cand = (
        a.join(b2, ["bands", "band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("bands", "id_a", "id_b")
        .distinct()
    )
    sh = d.select(
        "doc_id",
        F.array_distinct(
            F.transform(shingles(F.col("text"), 3), shingle_hash)
        ).alias("sh"),
    )
    pa = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sha"))
    pb = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    un = F.size(F.array_union("sha", "shb"))
    jac = F.when(un > 0, inter.cast("double") / un).otherwise(F.lit(0.0))
    truth = (
        pa.join(pb, F.col("id_a") < F.col("id_b"))
        .filter(jac >= _BS_T)
        .select("id_a", "id_b", F.lit(1).alias("is_t"))
    )
    per = (
        cand.join(truth, ["id_a", "id_b"], "left")
        .groupBy("bands")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.coalesce(F.col("is_t"), F.lit(0))).alias("tp"),
        )
    )
    tot = truth.agg(F.count(F.lit(1)).alias("truth_total"))
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("bands").cast("long").alias("bands"),
        (F.lit(16) / F.col("bands")).cast("long").alias("rows_per_band"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("tp").cast("long").alias("true_pos"),
        F.col("truth_total").cast("long").alias("truth_total"),
        F.when(
            F.col("truth_total") > 0,
            F.floor(F.col("tp") * 1e6 / F.col("truth_total") + 0.5),
        )
        .otherwise(0)
        .cast("long")
        .alias("recall_micro"),
        F.floor(F.col("tp") * 1e6 / F.col("n_candidates") + 0.5)
        .cast("long")
        .alias("precision_micro"),
    )


# ===========================================================================
# DoReMi-style domain weights from excess LM loss (Xie et al. 2023)
# ===========================================================================
@register(
    "doremi_domain_weights",
    f"""
    WITH toks AS (
        SELECT doc_id, source,
               unnest(string_split({_NORM_SQL}, ' ')) AS term
        FROM documents
    ),
    t AS (SELECT doc_id, source, term FROM toks WHERE term <> ''),
    gv AS (SELECT term, count(*) AS cw FROM t GROUP BY term),
    gc AS (SELECT SUM(cw) AS nn, count(*) AS vv FROM gv),
    sv AS (SELECT source, term, count(*) AS cs FROM t
           GROUP BY source, term),
    scons AS (SELECT source, SUM(cs) AS ns, count(*) AS vs FROM sv
              GROUP BY source),
    per_src AS (
        SELECT sv.source,
               CAST(SUM(sv.cs) AS BIGINT) AS n_tokens,
               CAST(SUM(sv.cs * CAST(floor(
                   -ln((gv.cw + 1.0) / (g.nn + g.vv)) * 1e6 + 0.5)
                   AS BIGINT)) AS BIGINT) AS ref_micro,
               CAST(SUM(sv.cs * CAST(floor(
                   -ln((sv.cs + 1.0) / (sc.ns + sc.vs)) * 1e6 + 0.5)
                   AS BIGINT)) AS BIGINT) AS own_micro
        FROM sv
        JOIN gv ON sv.term = gv.term
        JOIN scons sc ON sv.source = sc.source
        CROSS JOIN gc g
        GROUP BY sv.source
    ),
    ex AS (
        SELECT source, n_tokens, ref_micro, own_micro,
               GREATEST(CAST(FLOOR((ref_micro - own_micro) * 1e6
                   / n_tokens + 0.5) AS BIGINT), 0) AS excess_micro
        FROM per_src
    ),
    z AS (SELECT SUM(excess_micro) AS tot FROM ex)
    SELECT ex.source, ex.n_tokens, ex.ref_micro, ex.own_micro,
           ex.excess_micro,
           CAST(CASE WHEN z.tot > 0
                THEN FLOOR(ex.excess_micro * 1e6 / z.tot + 0.5)
                ELSE 0 END AS BIGINT) AS weight_micro
    FROM ex CROSS JOIN z
    """,
    doc="DoReMi-flavored domain reweighting (Xie et al. 2023 — public "
    "technique, unigram-LM proxy): per source, excess loss = mean "
    "per-token surprisal under the REFERENCE model (corpus-wide add-1 "
    "unigram LM) minus under the domain's OWN LM — domains the shared "
    "model explains much worse than a specialist get up-weighted; "
    "weights = clipped excess normalized to micro.  Both scoring passes "
    "ride the same (source, term) count matrix, so the whole thing is "
    "one tokenize + two bounded joins; per-term micro-rounding before "
    "every sum keeps the arithmetic engine-exact.  1-row corpus "
    "constants and the normalizer are allowlisted scalar broadcasts.",
)
def doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import normalize_text

    t = (
        load(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(
                F.split(normalize_text(F.coalesce(F.col("text"), F.lit(""))), " ")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    sv = t.groupBy("source", "term").agg(F.count(F.lit(1)).alias("cs"))
    gv = sv.groupBy("term").agg(F.sum("cs").alias("cw"))
    gc = gv.agg(F.sum("cw").alias("nn"), F.count(F.lit(1)).alias("vv"))
    scons = sv.groupBy("source").agg(
        F.sum("cs").alias("ns"), F.count(F.lit(1)).alias("vs")
    )
    ref_term = F.floor(
        -F.log((F.col("cw") + 1.0) / (F.col("nn") + F.col("vv"))) * 1e6 + 0.5
    ).cast("long")
    own_term = F.floor(
        -F.log((F.col("cs") + 1.0) / (F.col("ns") + F.col("vs"))) * 1e6 + 0.5
    ).cast("long")
    per_src = (
        sv.join(gv, "term")
        .join(scons, "source")
        .crossJoin(F.broadcast(gc))
        .groupBy("source")
        .agg(
            F.sum("cs").cast("long").alias("n_tokens"),
            F.sum(F.col("cs") * ref_term).cast("long").alias("ref_micro"),
            F.sum(F.col("cs") * own_term).cast("long").alias("own_micro"),
        )
    )
    ex = per_src.select(
        "source", "n_tokens", "ref_micro", "own_micro",
        F.greatest(
            F.floor(
                (F.col("ref_micro") - F.col("own_micro"))
                * 1e6
                / F.col("n_tokens")
                + 0.5
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("excess_micro"),
    )
    z = ex.agg(F.sum("excess_micro").alias("tot"))
    return ex.crossJoin(F.broadcast(z)).select(
        "source", "n_tokens", "ref_micro", "own_micro", "excess_micro",
        F.when(
            F.col("tot") > 0,
            F.floor(F.col("excess_micro") * 1e6 / F.col("tot") + 0.5),
        )
        .otherwise(0)
        .cast("long")
        .alias("weight_micro"),
    )


# ===========================================================================
# NDCG@10 of the IVF probe vs the exact ranking (graded retrieval eval)
# ===========================================================================
@register(
    "ann_ndcg_eval",
    f"""
    WITH base AS (SELECT vec_id, label, embedding FROM embeddings),
    q AS (SELECT embedding AS qv FROM base WHERE vec_id = 1),
    cent AS (
        SELECT b.label, b.embedding AS cv
        FROM base b
        JOIN (SELECT label, MIN(vec_id) AS mv FROM base GROUP BY label) m
          ON b.label = m.label AND b.vec_id = m.mv
    ),
    probe AS (
        SELECT label FROM (
            SELECT cent.label,
                   ROW_NUMBER() OVER (ORDER BY
                       {_COS6.format(a='cent.cv', b='q.qv')} DESC,
                       cent.label) AS rk
            FROM cent CROSS JOIN q
        ) WHERE rk <= 2
    ),
    scored AS (
        SELECT b.vec_id, b.label,
               {_COS6.format(a='b.embedding', b='q.qv')} AS cos_sim
        FROM base b CROSS JOIN q WHERE b.vec_id <> 1
    ),
    exact AS (
        SELECT vec_id, rk AS exact_rank FROM (
            SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos_sim DESC,
                vec_id) AS rk FROM scored
        ) WHERE rk <= 10
    ),
    approx AS (
        SELECT vec_id, rk AS approx_rank FROM (
            SELECT s.vec_id,
                   ROW_NUMBER() OVER (ORDER BY s.cos_sim DESC, s.vec_id)
                       AS rk
            FROM scored s JOIN probe p ON s.label = p.label
        ) WHERE rk <= 10
    ),
    dcg AS (
        SELECT COALESCE(SUM(CAST(FLOOR(
                   (11 - e.exact_rank) * 1e6 / (ln(a.approx_rank + 1)
                       / ln(2)) + 0.5) AS BIGINT)), 0) AS dcg_micro
        FROM approx a JOIN exact e ON a.vec_id = e.vec_id
    ),
    idcg AS (
        SELECT SUM(CAST(FLOOR((11 - exact_rank) * 1e6
                   / (ln(exact_rank + 1) / ln(2)) + 0.5) AS BIGINT))
               AS idcg_micro
        FROM exact
    )
    SELECT CAST(2 AS BIGINT) AS nprobe,
           CAST(d.dcg_micro AS BIGINT) AS dcg_micro,
           CAST(i.idcg_micro AS BIGINT) AS idcg_micro,
           CAST(FLOOR(d.dcg_micro * 1e6 / i.idcg_micro + 0.5) AS BIGINT)
               AS ndcg_micro
    FROM dcg d CROSS JOIN idcg i
    """,
    doc="Graded retrieval quality of the IVF probe (nprobe=2) against "
    "the exact ranking: relevance of a result = 11 - exact_rank (top "
    "exact hit worth 10, outside the exact top-10 worth 0), discounted "
    "by log2(position+1) at the position the PROBE ranked it — "
    "NDCG@10, the metric that penalizes the index for burying the best "
    "hits, where recall@k only counts membership.  Complements "
    "ivf_nprobe_recall_sweep the way NDCG complements recall in any IR "
    "eval.  Per-position terms round to micro BEFORE the sum; the "
    "exact-baseline block and the two 1-row DCG frames are the "
    "allowlisted broadcast shapes.",
)
def ann_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine

    e = load(spark, sf_dir, "embeddings").transform(spread)
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
    probe = (
        cent.crossJoin(F.broadcast(q))
        .select(
            "clabel",
            F.round(cosine(F.col("cv"), F.col("qv")), 6).alias("csim"),
        )
        .select(
            F.col("clabel").alias("label"),
            F.row_number().over(wc).alias("crk"),
        )
        .filter(F.col("crk") <= 2)
        .select("label")
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
    we = W.partitionBy(F.col("cos_sim") * F.lit(0.0)).orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    exact = (
        scored.withColumn("rk", F.row_number().over(we))
        .filter(F.col("rk") <= 10)
        .select("vec_id", F.col("rk").alias("exact_rank"))
    )
    approx = (
        scored.join(F.broadcast(probe), "label")
        .withColumn("rk", F.row_number().over(we))
        .filter(F.col("rk") <= 10)
        .select("vec_id", F.col("rk").alias("approx_rank"))
    )
    gain = (11 - F.col("exact_rank")) * 1e6
    dcg = approx.join(F.broadcast(exact), "vec_id").agg(
        F.coalesce(
            F.sum(
                F.floor(
                    gain / (F.log(F.col("approx_rank") + 1) / F.log(F.lit(2.0)))
                    + 0.5
                ).cast("long")
            ),
            F.lit(0).cast("long"),
        ).alias("dcg_micro")
    )
    idcg = exact.agg(
        F.sum(
            F.floor(
                gain / (F.log(F.col("exact_rank") + 1) / F.log(F.lit(2.0)))
                + 0.5
            ).cast("long")
        ).alias("idcg_micro")
    )
    return dcg.crossJoin(F.broadcast(idcg)).select(
        F.lit(2).cast("long").alias("nprobe"),
        "dcg_micro",
        "idcg_micro",
        F.floor(F.col("dcg_micro") * 1e6 / F.col("idcg_micro") + 0.5)
        .cast("long")
        .alias("ndcg_micro"),
    )


# ===========================================================================
# IVF ingest-append: index grows without a rebuild, probe merges the delta
# ===========================================================================
@register(
    "ivf_ingest_append",
    f"""
    WITH seed AS (SELECT * FROM embeddings WHERE vec_id % 4 <> 3),
    cent AS (
        SELECT s.label, s.embedding AS cv
        FROM seed s
        JOIN (SELECT label, MIN(vec_id) AS mv FROM seed GROUP BY label) m
          ON s.label = m.label AND s.vec_id = m.mv
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
    probe AS (
        SELECT label FROM (
            SELECT cent.label,
                   ROW_NUMBER() OVER (ORDER BY
                       {_COS6.format(a='cent.cv', b='q.qv')} DESC,
                       cent.label) AS rk
            FROM cent CROSS JOIN q
        ) WHERE rk <= 2
    )
    SELECT vec_id, label, cos_sim, CAST(rk AS BIGINT) AS rk FROM (
        SELECT e.vec_id, e.label,
               {_COS6.format(a='e.embedding', b='q.qv')} AS cos_sim,
               ROW_NUMBER() OVER (ORDER BY
                   {_COS6.format(a='e.embedding', b='q.qv')} DESC,
                   e.vec_id) AS rk
        FROM embeddings e
        JOIN probe ON e.label = probe.label
        CROSS JOIN q
        WHERE e.vec_id <> 1
    ) WHERE rk <= 10
    """,
    doc="IVF index INGESTION lifecycle: the index is built once from the "
    "seed corpus (3/4 of the vectors), a later batch (the remaining "
    "1/4) is appended via append_ivf_batch — delta partitions under the "
    "same list keys, seed generation untouched, idempotent under "
    "redelivery (dynamic partition overwrite of the batch's own "
    "partition) — and the probe answers from seed+delta under ONE "
    "list_id partition-pruned scan pair, centroids still the seed's "
    "(FAISS add-without-retrain; drift handled by periodic rebuild, "
    "like the LSH ingest/compaction pair).  Oracle = the probe chain "
    "with seed-defined centroids over the FULL vector set, so a hash "
    "match proves the appended index answers exactly like a logical "
    "union — nothing lost, nothing duplicated.",
)
def ivf_ingest_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from .operators.clustering import (
        append_ivf_batch,
        ivf_probe_topk,
        write_ivf_index,
    )
    from .queries_ext import _scan_path

    e = load(spark, sf_dir, "embeddings")
    seed = e.filter(F.col("vec_id") % 4 != 3)
    batch = e.filter(F.col("vec_id") % 4 == 3)
    path = _scan_path(sf_dir, "ivf_append")
    shutil.rmtree(path, ignore_errors=True)
    write_ivf_index(seed, path)
    append_ivf_batch(batch, path, batch_id=1)
    # everything below sees ONLY the on-disk index (seed + delta)
    qrow = e.filter(F.col("vec_id") == 1).select("embedding").first()
    return ivf_probe_topk(
        spark,
        path,
        [float(x) for x in qrow["embedding"]],
        nprobe=2,
        k=10,
        exclude_id=1,
    )


# ===========================================================================
# Calibration audit of the quality classifier (reliability buckets / ECE)
# ===========================================================================
_CAL_SQL = (
    _lr_chain_sql()
    + """
    , zf AS (
        SELECT x.doc_id, x.y,
               SUM(CAST(w3.wm AS DOUBLE) * x.cnt) / 1e6 AS z
        FROM x JOIN w3 ON x.bucket = w3.bucket
        GROUP BY x.doc_id, x.y
    ),
    sc AS (
        SELECT doc_id, y,
               CAST(FLOOR(1e6 / (1.0 + EXP(-z)) + 0.5) AS BIGINT)
                   AS score_micro
        FROM zf
    ),
    bk AS (
        SELECT LEAST(CAST(FLOOR(score_micro / 100000) AS BIGINT), 9) AS bucket,
               score_micro, y
        FROM sc
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(FLOOR(CAST(SUM(score_micro) AS DOUBLE) / COUNT(*) + 0.5)
               AS BIGINT) AS mean_score_micro,
           CAST(FLOOR(CAST(SUM(y) AS DOUBLE) * 1e6 / COUNT(*) + 0.5)
               AS BIGINT) AS pos_rate_micro,
           CAST(ABS(FLOOR(CAST(SUM(score_micro) AS DOUBLE) / COUNT(*) + 0.5)
               - FLOOR(CAST(SUM(y) AS DOUBLE) * 1e6 / COUNT(*) + 0.5))
               AS BIGINT) AS abs_gap_micro
    FROM bk GROUP BY bucket
    """
)


@register(
    "quality_calibration_ece",
    _CAL_SQL,
    doc="Reliability audit of the trained quality classifier: documents "
    "bucketed into score deciles, each bucket reporting mean predicted "
    "probability vs observed positive rate and the absolute gap — the "
    "reliability diagram whose doc-weighted gap sum is Expected "
    "Calibration Error, the check a curation pipeline runs before "
    "treating classifier scores as keep-probabilities (miscalibrated "
    "scores silently skew source mix).  Reuses the exact 3-step GD "
    "chain (bit-identical in both engines); one extra groupBy over the "
    "scored frame.",
)
def quality_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.quality import lr_features, lr_fit, lr_score

    d = load(spark, sf_dir, "documents")
    # doc_id-partitioned checkpoint: fit + score run exchange-free on
    # their doc_id-keyed steps (r14, guide §2.4)
    x = lr_features(d)
    w = lr_fit(x, iters=3, lr=0.1)
    s = lr_score(x, w)
    bk = s.select(
        F.least(
            (F.col("score_micro") / 100000).cast("long"), F.lit(9).cast("long")
        ).alias("bucket"),
        "score_micro",
        F.col("label").alias("y"),
    )
    mean_sc = F.floor(
        F.sum("score_micro").cast("double") / F.count(F.lit(1)) + 0.5
    ).cast("long")
    pos_rate = F.floor(
        F.sum("y").cast("double") * 1e6 / F.count(F.lit(1)) + 0.5
    ).cast("long")
    return bk.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        mean_sc.alias("mean_score_micro"),
        pos_rate.alias("pos_rate_micro"),
        F.abs(mean_sc - pos_rate).alias("abs_gap_micro"),
    )


# ===========================================================================
# ORC storage roundtrip with partition pruning (second columnar format)
# ===========================================================================
@register(
    "orc_roundtrip_scan",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_id,
           CAST(SUM(length(text)) AS BIGINT) AS total_text_len
    FROM documents WHERE lang = 'en'
    GROUP BY source
    """,
    doc="Second-columnar-format storage lifecycle: the documents table is "
    "written to ORC PARTITIONED BY language, read back, and aggregated "
    "under a lang='en' filter — the filter lands in the reloaded scan's "
    "PartitionFilters, so ORC partition pruning is exercised alongside "
    "the parquet stores.  The oracle aggregates the ORIGINAL parquet: a "
    "hash match proves the ORC roundtrip is lossless (ids, counts, and "
    "full text bytes survive).  Eager-construct (the ORC write runs "
    "inside the query).",
)
def orc_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from .queries_ext import _scan_path

    d = load(spark, sf_dir, "documents")
    path = _scan_path(sf_dir, "orc_store")
    shutil.rmtree(path, ignore_errors=True)
    d.write.mode("overwrite").partitionBy("lang").orc(path)
    back = spark.read.orc(path).filter(F.col("lang") == "en")
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").cast("long").alias("min_id"),
        F.max("doc_id").cast("long").alias("max_id"),
        F.sum(F.length("text")).cast("long").alias("total_text_len"),
    )


# ===========================================================================
# Exact rolling median over a bounded window frame (per-user event stream)
# ===========================================================================
@register(
    "events_rolling_median",
    """
    SELECT event_id, user_id,
           CAST(ROUND(median(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS DOUBLE)
               AS med5
    FROM events
    """,
    doc="EXACT rolling median of the last 5 events per user — the robust "
    "rolling statistic (outlier-resistant, unlike events_moving_avg's "
    "mean).  Spark has no exact median window function, so the frame is "
    "collected per row (ROWS BETWEEN 4 PRECEDING AND CURRENT ROW — "
    "bounded, tiny), sorted, and the ANSI median (mean of the two "
    "middles on even counts) is computed by element arithmetic — a "
    "bounded-frame window that partitions by user at any scale.  "
    "Deterministic frame order via the (ts, event_id) composite.",
)
def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries import load_events

    ev = load_events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, W.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid = F.element_at(arr, (n / 2 + 1).cast("int"))
    lo = F.element_at(arr, (n / 2).cast("int"))
    med = F.when(n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))) \
        .otherwise((lo + mid) / 2.0)
    return ev.select(
        "event_id", "user_id", F.round(med, 6).alias("med5")
    )


# ===========================================================================
# Exact-substring span REMOVAL (the rewrite half of Lee et al. 2022)
# ===========================================================================
def _span_removal_sql() -> str:
    from .queries import _NORM_SQL
    from .queries_corpus import _SPAN_H64_SQL

    h64 = _SPAN_H64_SQL.replace("md5(gram)", "md5(g.gram)")
    return f"""
    WITH t AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    occ AS (
        SELECT g.doc_id, g.i, {h64} AS h
        FROM (
            SELECT t.doc_id, CAST(u.i AS INT) AS i,
                   array_to_string(t.w[u.i + 1:u.i + 5], ' ') AS gram
            FROM t, UNNEST(range(0, GREATEST(len(t.w) - 4, 0))) AS u(i)
        ) g
    ),
    freq AS (
        SELECT h, COUNT(DISTINCT doc_id) AS nd, MIN(doc_id) AS keeper
        FROM occ GROUP BY h
    ),
    dup AS (
        SELECT o.doc_id, o.i FROM occ o JOIN freq f ON o.h = f.h
        WHERE f.nd > 1 AND o.doc_id <> f.keeper
    ),
    cov AS (
        SELECT DISTINCT doc_id, CAST(u.p AS INT) AS pos
        FROM dup, UNNEST(range(i, i + 5)) AS u(p)
    ),
    words AS (
        SELECT t.doc_id, CAST(u.p AS INT) AS pos, t.w[u.p + 1] AS word,
               len(t.w) AS n_words
        FROM t, UNNEST(range(0, len(t.w))) AS u(p)
    ),
    kept AS (
        SELECT w.doc_id, w.pos, w.word, w.n_words
        FROM words w LEFT JOIN cov c
          ON w.doc_id = c.doc_id AND w.pos = c.pos
        WHERE c.pos IS NULL
    )
    SELECT t.doc_id,
           CAST(len(t.w) AS BIGINT) AS n_words,
           CAST(len(t.w) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(k.cleaned_md5, md5('')) AS cleaned_md5
    FROM t LEFT JOIN (
        SELECT doc_id, COUNT(*) AS n_kept,
               md5(string_agg(word, ' ' ORDER BY pos)) AS cleaned_md5
        FROM kept GROUP BY doc_id
    ) k ON t.doc_id = k.doc_id
    """


@register(
    "dup_span_removal",
    _span_removal_sql(),
    doc="The REWRITE half of exact-substring training-data dedup [Lee et "
    "al. 2022 — public technique; dup_span_detect is the detect half]: "
    "for every word 5-gram occurring in >= 2 documents, the min-id "
    "document keeps its text and every OTHER document drops the word "
    "positions its occurrences cover; the cleaned document is the "
    "surviving words in order.  Emits per doc the original/removed word "
    "counts and md5(cleaned text) — the rewrite is hash-verified without "
    "shipping full text through the compare.  All stages are groupBys/"
    "joins on 8-byte gram hashes or (doc, pos) keys — the distributed "
    "reformulation of the paper's suffix-array pass, rewrite included.",
)
def dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import normalize_text, shingle_hash64

    d = load(spark, sf_dir, "documents").transform(spread)
    t = d.select(
        "doc_id",
        F.split(
            normalize_text(F.coalesce(F.col("text"), F.lit(""))), " "
        ).alias("w"),
    )
    grams = F.when(
        F.size("w") >= 5,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - 5),
            lambda i: F.array_join(F.slice(F.col("w"), i + 1, 5), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = t.select(
        "doc_id", F.posexplode(grams).alias("i", "gram")
    ).select("doc_id", "i", shingle_hash64(F.col("gram")).alias("h"))
    freq = occ.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd"),
        F.min("doc_id").alias("keeper"),
    )
    dup = occ.join(freq.filter(F.col("nd") > 1), "h").filter(
        F.col("doc_id") != F.col("keeper")
    )
    cov = dup.select(
        "doc_id", F.explode(F.sequence(F.col("i"), F.col("i") + 4)).alias("pos")
    ).distinct()
    words = t.select(
        "doc_id", F.size("w").alias("n_words"),
        F.posexplode("w").alias("pos", "word"),
    )
    kept = words.join(cov, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "word"))
                    ),
                    lambda s: s["word"],
                ),
                " ",
            )
        ).alias("cleaned_md5"),
    )
    base = t.select("doc_id", F.size("w").alias("n_words"))
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        (F.col("n_words") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("cleaned_md5"), F.md5(F.lit(""))).alias(
            "cleaned_md5"
        ),
    )


# ===========================================================================
# Quality model: train-free APPLY from the persisted weight table
# ===========================================================================
from .queries_wave6 import _lr_sql  # noqa: E402

_LR_APPLY_SQL = _lr_sql().replace(
    """
    SELECT CAST(bucket AS BIGINT) AS bucket, CAST(wm AS BIGINT) AS w_micro
    FROM w3
    """,
    """
    , zf AS (
        SELECT x.doc_id, x.y,
               SUM(CAST(w3.wm AS DOUBLE) * x.cnt) / 1e6 AS z
        FROM x JOIN w3 ON x.bucket = w3.bucket
        GROUP BY x.doc_id, x.y
    )
    SELECT doc_id,
           CAST(FLOOR(1e6 / (1.0 + EXP(-z)) + 0.5) AS BIGINT) AS score_micro,
           CASE WHEN 1.0 / (1.0 + EXP(-z)) >= 0.5 THEN 1 ELSE 0 END AS pred,
           CAST(y AS INTEGER) AS label
    FROM zf
    """,
)


@register(
    "quality_lr_apply_persisted",
    _LR_APPLY_SQL,
    doc="Train-free scoring from the PERSISTED quality model: the weight "
    "table is written once (write_quality_model), reloaded, and applied "
    "— the serving shape where scoring runs never carry the training "
    "chain (lm_persisted_surprisal's lifecycle, classifier edition; the "
    "streaming ingest gate reloads the same artifact).  Oracle identical "
    "to quality_lr_score's, so a hash match PROVES the weight round-trip "
    "is bit-lossless.  Eager-construct: fit + model write inside the "
    "query.",
)
def quality_lr_apply_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from .operators.quality import (
        lr_features,
        lr_fit,
        lr_score,
        read_quality_model,
        write_quality_model,
    )
    from .queries_ext import _scan_path

    d = load(spark, sf_dir, "documents")
    # doc_id-partitioned checkpoint (r14, guide §2.4)
    x = lr_features(d)
    path = _scan_path(sf_dir, "quality_model_apply")
    shutil.rmtree(path, ignore_errors=True)
    write_quality_model(lr_fit(x, iters=3, lr=0.1), path)
    # scoring sees ONLY the on-disk model
    w = read_quality_model(spark, path)
    return lr_score(x, w)


# ===========================================================================
# Count-Min sketch: sublinear-memory frequency estimation with error audit
# ===========================================================================
_CMS_W, _CMS_D = 64, 4  # width x depth


@register(
    "countmin_heavy_hitters",
    f"""
    WITH toks AS (
        SELECT unnest(string_split({_NORM_SQL}, ' ')) AS term
        FROM documents
    ),
    t AS (SELECT term FROM toks WHERE term <> ''),
    occ AS (
        SELECT t.term, CAST(u.d AS INT) AS d,
               (('0x' || substr(md5(t.term || '#' || CAST(u.d AS VARCHAR)),
                   1, 8))::BIGINT % {_CMS_W}) AS bucket
        FROM t, UNNEST(range(0, {_CMS_D})) AS u(d)
    ),
    cms AS (
        SELECT d, bucket, COUNT(*) AS cnt FROM occ GROUP BY d, bucket
    ),
    exact AS (
        SELECT term, COUNT(*) AS exact_n FROM t GROUP BY term
    ),
    top AS (
        SELECT term, exact_n FROM (
            SELECT term, exact_n,
                   ROW_NUMBER() OVER (ORDER BY exact_n DESC, term) AS rk
            FROM exact
        ) WHERE rk <= 20
    ),
    est AS (
        SELECT q.term, MIN(c.cnt) AS est_n
        FROM (
            SELECT top.term, CAST(u.d AS INT) AS d,
                   (('0x' || substr(md5(top.term || '#'
                       || CAST(u.d AS VARCHAR)), 1, 8))::BIGINT
                       % {_CMS_W}) AS bucket
            FROM top, UNNEST(range(0, {_CMS_D})) AS u(d)
        ) q
        JOIN cms c ON q.d = c.d AND q.bucket = c.bucket
        GROUP BY q.term
    )
    SELECT t.term, CAST(t.exact_n AS BIGINT) AS exact_n,
           CAST(e.est_n AS BIGINT) AS est_n,
           CAST(e.est_n - t.exact_n AS BIGINT) AS over_n
    FROM top t JOIN est e ON t.term = e.term
    """,
    doc="Count-Min sketch frequency estimation (Cormode & Muthukrishnan "
    f"2005 — public technique): a {_CMS_D}x{_CMS_W} counter table built "
    "in one tokenize pass (each occurrence increments one bucket per "
    "depth row via independent md5-salted hashes — a groupBy on (d, "
    "bucket), i.e. 256 cells of state for an unbounded term universe), "
    "then the top-20 exact heavy hitters are re-estimated from the "
    "sketch as min-over-depths and audited against truth: over_n >= 0 "
    "ALWAYS (CMS never underestimates — the property test asserts it), "
    "and the overestimate quantifies the collision error at this "
    "width.  The sketch is the streaming/merge-friendly shape: counter "
    "tables from shards add cell-wise, like the HLL registers "
    "hll_distinct_merge already covers for distinct counts.",
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import normalize_text, shingle_hash

    t = (
        load(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.split(
                    normalize_text(F.coalesce(F.col("text"), F.lit(""))), " "
                )
            ).alias("term")
        )
        .filter(F.col("term") != "")
    )

    def bucket(term_col, d):
        return shingle_hash(
            F.concat(term_col, F.lit("#"), F.lit(str(d)))
        ) % _CMS_W

    occ = t.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), bucket(F.col("term"), d).alias("bucket")
                    )
                    for d in range(_CMS_D)
                ]
            )
        ).alias("db"),
    ).select("term", "db.d", "db.bucket")
    cms = occ.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    exact = t.groupBy("term").agg(F.count(F.lit(1)).alias("exact_n"))
    top = (
        exact.orderBy(F.col("exact_n").desc(), "term")
        .limit(20)
    )
    q = top.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), bucket(F.col("term"), d).alias("bucket")
                    )
                    for d in range(_CMS_D)
                ]
            )
        ).alias("db"),
    ).select("term", "db.d", "db.bucket")
    est = (
        q.join(F.broadcast(cms), ["d", "bucket"])
        .groupBy("term")
        .agg(F.min("cnt").alias("est_n"))
    )
    return top.join(est, "term").select(
        "term",
        F.col("exact_n").cast("long").alias("exact_n"),
        F.col("est_n").cast("long").alias("est_n"),
        (F.col("est_n") - F.col("exact_n")).cast("long").alias("over_n"),
    )


# ===========================================================================
# IVF list-occupancy skew report: the rebuild trigger for the index loop
# ===========================================================================
@register(
    "ivf_list_skew_report",
    """
    WITH occ AS (
        SELECT label AS list_id, COUNT(*) AS n_vectors
        FROM embeddings GROUP BY label
    ),
    tot AS (
        SELECT SUM(n_vectors) AS n_total, COUNT(*) AS n_lists,
               MAX(n_vectors) AS mx
        FROM occ
    )
    SELECT CAST(o.list_id AS BIGINT) AS list_id,
           CAST(o.n_vectors AS BIGINT) AS n_vectors,
           CAST(FLOOR(o.n_vectors * 1e6 * t.n_lists / t.n_total + 0.5)
               AS BIGINT) AS load_factor_micro,
           CASE WHEN o.n_vectors * t.n_lists * 10 > t.n_total * 15
                THEN 'T' ELSE 'F' END AS oversized,
           CAST(FLOOR(t.mx * 1e6 / (t.n_total / t.n_lists) + 0.5)
               AS BIGINT) AS max_load_micro
    FROM occ o CROSS JOIN tot t
    """,
    doc="IVF index maintenance monitor: per-inverted-list occupancy, the "
    "load factor vs the balanced ideal (n_total/n_lists), an oversized "
    "flag at 1.5x ideal (integer cross-multiplication, no float "
    "threshold), and the global max load — the signal that schedules "
    "the write_ivf_index rebuild after enough append_ivf_batch ingests "
    "skew the lists (probe latency follows the hottest probed list).  "
    "Completes the index loop: build -> append -> MONITOR -> rebuild.  "
    "One groupBy + a 1-row totals broadcast.",
)
def ivf_list_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    occ = e.groupBy(F.col("label").alias("list_id")).agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    tot = occ.agg(
        F.sum("n_vectors").alias("n_total"),
        F.count(F.lit(1)).alias("n_lists"),
        F.max("n_vectors").alias("mx"),
    )
    return occ.crossJoin(F.broadcast(tot)).select(
        F.col("list_id").cast("long").alias("list_id"),
        F.col("n_vectors").cast("long").alias("n_vectors"),
        F.floor(
            F.col("n_vectors") * 1e6 * F.col("n_lists") / F.col("n_total")
            + 0.5
        ).cast("long").alias("load_factor_micro"),
        F.when(
            F.col("n_vectors") * F.col("n_lists") * 10
            > F.col("n_total") * 15,
            F.lit("T"),
        ).otherwise(F.lit("F")).alias("oversized"),
        F.floor(
            F.col("mx") * 1e6 / (F.col("n_total") / F.col("n_lists")) + 0.5
        ).cast("long").alias("max_load_micro"),
    )
