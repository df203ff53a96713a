"""Persisted lexical (BM25) retrieval index — the LEXICAL twin of the
IVF vector lifecycle (clustering.write_ivf_index / append_ivf_batch /
ivf_probe_*), completing the hybrid-retrieval story whose fusion row is
rrf_hybrid_topk: build the inverted index once, append document batches
without a rebuild, answer ranked queries from the store.

Store layout (``<path>/``):

* ``postings/term_bucket=<b>/``  (term, doc_id, tf) — the inverted
  lists, partitioned by ``term_bucket = shingle_hash(term) % N_BUCKETS``
  so a query's terms prune the scan to their buckets (PartitionFilters)
  and the term IN-list pushes into the parquet reader (PushedFilters) —
  the posting-list seek of a search engine, expressed as partition
  pruning + predicate pushdown exactly like the IVF invlist seek.
* ``doclen/``  (doc_id, dl) — per-document token counts (BM25's length
  normalization needs dl for MATCHED docs only; the probe joins it on
  doc_id after the postings prune).
* ``stats/``  (n_docs, sum_dl, batch_id) — ADDITIVE corpus constants,
  one row per generation/batch: readers SUM the rows, so an appended
  batch's contribution rides a 1-row append, never a read-modify-write
  (the quality/drift count-store recipe applied to IDF constants).

Append (``append_bm25_batch``) lands a new batch's postings/doclen under
``batch_id=<n>`` partitions with dynamic overwrite — idempotent under
redelivery, invisible to no reader (df_t and stats are derived at probe
time from seed + delta), no rebuild.  IDF drift under heavy append is
the lexical analog of IVF centroid drift: fold with a fresh
``write_bm25_index`` when the monitors say so.

BM25 math is ``functions.text.bm25_scores``'s, expression-for-
expression (per-term scores floor to integer micro-units BEFORE the
cross-term sum — exact BIGINT doc scores, replayable in the oracle);
the persisted-index probe is oracle-gated by the SAME SQL as the
direct-computation row, so any write/read asymmetry hash-mismatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 64


def _postings(docs: DataFrame, text_col: str, id_col: str):
    from ..functions.text import normalize_text, shingle_hash

    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.split(
                normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "
            )
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    post = tf.withColumn(
        "term_bucket", (shingle_hash(F.col("term")) % N_BUCKETS).cast("int")
    )
    return post, dl


def write_bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Build the persisted BM25 index from scratch (the seed
    generation, batch_id = -1 in the stats store)."""
    post, dl = _postings(docs, text_col, id_col)
    post.write.mode("overwrite").partitionBy("term_bucket").parquet(
        f"{path}/postings"
    )
    dl.write.mode("overwrite").parquet(f"{path}/doclen")
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        F.lit(-1).alias("batch_id"),
    )
    stats.repartition(1).write.mode("overwrite").parquet(f"{path}/stats")


def append_bm25_batch(
    batch: DataFrame,
    path: str,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Ingest a document batch into the persisted index WITHOUT a
    rebuild: postings/doclen land under ``batch_id=<n>`` partitions and
    the stats store gains the batch's additive (n_docs, sum_dl) row.
    Idempotent under redelivery: every write overwrites ONLY its own
    batch_id partition (dynamic overwrite — append_ivf_batch's recipe),
    so a replayed batch cannot double postings, lengths, or stats."""
    spark = batch.sparkSession
    post, dl = _postings(batch, text_col, id_col)
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        post.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).partitionBy("batch_id", "term_bucket").parquet(
            f"{path}/postings_delta"
        )
        dl.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).partitionBy("batch_id").parquet(f"{path}/doclen_delta")
        dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
            F.lit(batch_id).alias("batch_id"),
        ).withColumn("bpart", F.col("batch_id")).write.mode(
            "overwrite"
        ).partitionBy("bpart").parquet(f"{path}/stats_delta")
    finally:
        if old is not None:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", old
            )
        else:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")


def _maybe_union(spark, base: DataFrame, delta_dir: str, cols: list[str]):
    hpath = spark._jvm.org.apache.hadoop.fs.Path(delta_dir)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath) and any(
        st.getPath().getName().startswith(("batch_id=", "bpart="))
        for st in fs.listStatus(hpath)
    ):
        return base.unionByName(
            spark.read.parquet(delta_dir).select(*cols)
        )
    return base


def bm25_probe_topk(
    spark,
    path: str,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Answer a BM25 top-k query from the persisted index (seed + any
    appended deltas): the postings scan prunes to the query terms'
    buckets (PartitionFilters) with the term IN-list pushed down
    (PushedFilters); df_t aggregates over only those postings; doclen
    joins on the matched doc ids; the additive stats rows SUM to the
    corpus constants.  Scoring is bm25_scores' expression verbatim —
    per-term micro floors before the exact BIGINT doc sum — so the
    probe hash-matches the direct-computation oracle."""
    import hashlib

    # the query terms' buckets, computed driver-side with the same
    # md5-prefix hash shingle_hash evaluates on executors (the terms
    # are a handful of literals — no job needed to plan the prune)
    buckets = sorted(
        {
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % N_BUCKETS
            for t in terms
        }
    )
    post = spark.read.parquet(f"{path}/postings").select(
        id_col, "term", "tf", "term_bucket"
    )
    post = _maybe_union(
        spark,
        post,
        f"{path}/postings_delta",
        [id_col, "term", "tf", "term_bucket"],
    )
    tf = post.filter(
        F.col("term_bucket").isin(buckets)
        & F.col("term").isin(list(terms))
    ).select(id_col, "term", "tf")
    dl = spark.read.parquet(f"{path}/doclen").select(id_col, "dl")
    dl = _maybe_union(spark, dl, f"{path}/doclen_delta", [id_col, "dl"])
    st = spark.read.parquet(f"{path}/stats").select("n_docs", "sum_dl")
    st = _maybe_union(
        spark, st, f"{path}/stats_delta", ["n_docs", "sum_dl"]
    )
    stats = st.agg(
        F.sum("n_docs").alias("n_docs"), F.sum("sum_dl").alias("sum_dl")
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
    )
    per_term = (
        tf.join(F.broadcast(dft), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.floor(
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / avgdl)
                )
                * 1e6
                + 0.5
            )
            .cast("long")
            .alias("micro"),
        )
    )
    scored = per_term.groupBy(id_col).agg(
        F.sum("micro").alias("bm25_micro")
    )
    from pyspark.sql.window import Window as W

    top = scored.orderBy(F.col("bm25_micro").desc(), F.col(id_col)).limit(
        k
    )
    w = W.partitionBy(F.col("bm25_micro") * F.lit(0)).orderBy(
        F.col("bm25_micro").desc(), F.col(id_col)
    )
    return top.withColumn(
        "rk", F.row_number().over(w).cast("long")
    ).select(
        F.col(id_col).cast("long").alias(id_col), "bm25_micro", "rk"
    )
