"""Ordered-semantics operators (SURVEY.md §2.6): first-match-wins,
consume-first-match pairing, deterministic dedup — hand-rolled sorted-stream
state in the reference, window functions here (no manual state, fully
parallel by partition key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def first_match_wins(
    df: DataFrame, partition_keys: list[str], order_keys: list[str]
) -> DataFrame:
    """W6/J11: keep the first row per key under an explicit deterministic
    order (dbSNP rsId first-match semantics, CommonFormat2Writer.java:150-153).
    """
    w = W.partitionBy(*partition_keys).orderBy(*order_keys)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def keep_last(
    df: DataFrame, partition_keys: list[str], order_keys: list[str]
) -> DataFrame:
    """W5: deterministic dedup keeping the row that sorts LAST (the
    VariantTranscriptBatch TreeSet uses descending order)."""
    w = W.partitionBy(*partition_keys).orderBy(
        *[F.col(k).desc() for k in order_keys]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def consume_first_match_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_order: list[str],
    right_order: list[str],
) -> DataFrame:
    """J16: pair rank-n left rows with rank-n right rows per key — the
    relational form of the reference's consume-first-match loop
    (PolyphenLoader.java:321-343), where each matched info row is removed
    from the pool so duplicates pair positionally.
    """
    lw = W.partitionBy(*keys).orderBy(*left_order)
    rw = W.partitionBy(*keys).orderBy(*right_order)
    l = left.withColumn("__rank", F.row_number().over(lw))
    r = right.withColumn("__rank", F.row_number().over(rw))
    return l.join(r, keys + ["__rank"]).drop("__rank")
