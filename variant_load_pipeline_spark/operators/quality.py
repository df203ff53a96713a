"""Quality-classifier training/scoring as reusable operators: hashed-
unigram logistic regression fit by full-batch gradient descent, entirely
in DataFrame algebra (no mllib, no Python UDF).

The math contract (shared with the queries_wave6 oracle and the pure-
python test recompute): 64 md5-hash buckets of lowercase word counts,
double sigmoid, every per-term float micro-rounded to BIGINT BEFORE
aggregation, weight update w += floor(lr * grad_sum / n_docs + 0.5) in
micro units.  This makes the fit bit-identical across engines AND across
partitionings — a trained model is a reproducible artifact.

Scale shape: one GD step = a broadcast 64-row weight join + per-doc sum
(shuffle on doc_id) and a gradient re-join aggregated per bucket (shuffle
on bucket), both bounded by the nonzero feature count; the feature matrix
is localCheckpointed once per fit.  Persisted-model lifecycle mirrors the
ANN indexes: write_quality_model / read_quality_model round-trip the
weight vector through parquet so scoring runs are train-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

N_BUCKETS = 64
CURATED_SOURCES = ("src0", "src1", "src2")


def hashed_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label: F.Column | None = None,
) -> DataFrame:
    """(doc_id, y, bucket, cnt) hashed bag-of-words count matrix."""
    y = (
        label
        if label is not None
        else F.when(F.col("source").isin(*CURATED_SOURCES), 1).otherwise(0)
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        y.alias("y"),
        F.explode(T.words(F.col(text_col))).alias("word"),
    ).select(
        "doc_id", "y",
        (T.shingle_hash(F.col("word")) % 256 % N_BUCKETS).alias("bucket"),
    )
    return toks.groupBy("doc_id", "y", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def lr_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label: F.Column | None = None,
) -> DataFrame:
    """hashed_features, doc_id-partitioned and persisted — the frame
    shape the GD loop wants: every step's per-doc sum (groupBy(doc_id,
    y)) and gradient re-join (on doc_id) then run EXCHANGE-FREE against
    the cached partitioning, leaving one 64-key bucket aggregation as
    the only shuffle per step instead of three data-sized ones (guide
    §2.4 — operations keyed the same way share one exchange).  persist,
    NOT localCheckpoint: an InMemoryRelation preserves its child's
    outputPartitioning while a checkpointed RDD scan reports
    UnknownPartitioning (measured r14 — the checkpoint form re-shuffled
    every step).  The cache entry is dropped by the ContextCleaner once
    the frame is garbage collected, same contract as the fused near-dup
    pipeline's persists.  Use for any matrix consumed more than once
    (fit loops, fit+score); the math is partitioning-independent (exact
    integer-valued partial sums), so results are bit-identical."""
    from pyspark.storagelevel import StorageLevel

    return (
        hashed_features(docs, text_col=text_col, id_col=id_col, label=label)
        .repartition("doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def lr_fit(x: DataFrame, iters: int = 3, lr: float = 0.1) -> DataFrame:
    """Gradient-descent fit over a hashed_features matrix -> (bucket, wm).

    The feature matrix is referenced twice per step across `iters` steps:
    callers should pass a localCheckpointed frame (lr_train does;
    lr_features is the doc_id-partitioned form the loop joins against
    without reshuffling)."""
    # ONE model-sized driver action for the doc count: the old 1-row
    # `n` frame was re-derived inside every step's update (no subtree
    # reuse), costing iters extra countDistinct passes over x
    nd = x.agg(F.countDistinct("doc_id")).collect()[0][0]
    w = x.select("bucket").distinct().select(
        "bucket", F.lit(0).cast("long").alias("wm")
    )
    for _ in range(iters):
        wk = w.withColumnRenamed("bucket", "wbk")
        z = (
            x.join(F.broadcast(wk), F.col("bucket") == F.col("wbk"))
            .groupBy("doc_id", "y")
            .agg(
                (F.sum(F.col("wm").cast("double") * F.col("cnt")) / 1e6)
                .alias("z")
            )
        )
        dd = z.select(
            "doc_id",
            (F.col("y") - 1.0 / (1.0 + F.exp(-F.col("z")))).alias("delta"),
        )
        g = (
            x.join(dd, "doc_id")
            .groupBy("bucket")
            .agg(
                F.sum(
                    F.floor(
                        F.col("delta") * F.col("cnt") * 1e6 + 0.5
                    ).cast("long")
                ).alias("gm")
            )
        )
        gk = g.withColumnRenamed("bucket", "gbk")
        w = (
            w.join(F.broadcast(gk), F.col("bucket") == F.col("gbk"))
            .select(
                "bucket",
                (
                    F.col("wm")
                    + F.floor(lr * F.col("gm") / F.lit(nd) + 0.5)
                    .cast("long")
                ).alias("wm"),
            )
            # materialize the model-sized weight vector each step: w
            # feeds the NEXT step twice (forward pass + update), and
            # without a checkpoint the final plan re-executes ~2^iters
            # copies of the whole chain (no subtree reuse across
            # branches).  One tiny job per step instead.
            .localCheckpoint(eager=True)
        )
    return w


def lr_train(docs: DataFrame, iters: int = 3, lr: float = 0.1) -> DataFrame:
    """Fit on a document frame -> (bucket, wm) weight vector."""
    return lr_fit(lr_features(docs), iters=iters, lr=lr)


def lr_score(x: DataFrame, weights: DataFrame) -> DataFrame:
    """Score a hashed_features matrix with a weight vector ->
    (doc_id, score_micro, pred, label)."""
    wk = weights.withColumnRenamed("bucket", "wbk")
    zf = (
        x.join(F.broadcast(wk), F.col("bucket") == F.col("wbk"))
        .groupBy("doc_id", "y")
        .agg(
            (F.sum(F.col("wm").cast("double") * F.col("cnt")) / 1e6)
            .alias("z")
        )
    )
    p = 1.0 / (1.0 + F.exp(-F.col("z")))
    return zf.select(
        "doc_id",
        F.floor(p * 1e6 + 0.5).cast("long").alias("score_micro"),
        F.when(p >= 0.5, 1).otherwise(0).alias("pred"),
        F.col("y").cast("int").alias("label"),
    )


def write_quality_model(weights: DataFrame, path: str) -> None:
    """Persist the weight vector as a named model table (overwrite)."""
    weights.write.mode("overwrite").parquet(path)


def read_quality_model(spark, path: str) -> DataFrame:
    return spark.read.parquet(path).select("bucket", "wm")
