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


def bucketed_row_number(
    df: DataFrame,
    order_keys: list[str],
    bucket: str,
    out_col: str = "__rank",
) -> DataFrame:
    """Deterministic 1-based global rank by ``(bucket, *order_keys)`` without
    a single-partition sort.

    Two-phase: row_number within each bucket partition, plus cumulative
    bucket offsets computed on the bucket-count table (|buckets| rows — the
    only thing that ever passes through a non-partitioned window).  Ranks
    equal a global ``row_number over (orderBy(bucket, *order_keys))`` but the
    data-sized sort is hash-partitioned on the bucket — the id-allocation
    plan that survives 100 TB (reference analog: the Oracle sequence at
    VariantLoad3.java:550; determinism note in SURVEY.md §7.4).
    """
    wn = W.partitionBy(bucket).orderBy(*order_keys)
    ranked = df.withColumn("__rn", F.row_number().over(wn))
    # Cumulative bucket offsets via a theta self-join on the |buckets|-row
    # count table (strictly-smaller buckets sum into the offset).  O(B^2) on
    # a bounded dimension — and, unlike a non-partitioned running-sum
    # window, it never creates a single-partition WindowExec.
    counts = df.groupBy(bucket).agg(F.count(F.lit(1)).alias("__cnt"))
    a = counts.select(F.col(bucket), F.col("__cnt"))
    b = counts.select(
        F.col(bucket).alias("__b_bucket"), F.col("__cnt").alias("__b_cnt")
    )
    offsets = (
        a.join(F.broadcast(b), F.col("__b_bucket") < F.col(bucket), "left")
        .groupBy(bucket)
        .agg(F.coalesce(F.sum("__b_cnt"), F.lit(0)).alias("__off"))
    )
    return (
        ranked.join(F.broadcast(offsets), bucket)
        .withColumn(out_col, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__rn", "__off")
    )


def salted_join(
    left,
    right,
    on: list[str] | str,
    salt: int = 8,
    how: str = "inner",
    salt_source=None,
):
    """Skew-salted equi-join: the explicit form of AQE's skew-join split,
    for when a handful of hot keys (the chr1 >> chrMT case, SURVEY §7.4;
    stopword terms; null-ish default keys) would funnel into one reducer.

    The big/skewed ``left`` side gets a deterministic salt in [0, salt)
    derived from ``salt_source`` (default: a hash of all left columns, so
    rows of the SAME hot key spread across ``salt`` partitions); the
    small ``right`` side is replicated ``salt`` times via explode —
    ``salt``× more right rows shuffled, in exchange for the hot key's
    probe work splitting across ``salt`` reducers.  Join keys become
    (key..., salt); the result is EXACTLY the plain equi-join's (the salt
    never changes which rows match, only where they meet).

    Use when the build side is small enough to replicate but too big (or
    too many distinct keys) to broadcast outright, and the probe side is
    skewed.  With AQE on, prefer AQE first; salting is the portable,
    planner-independent fallback and the form that also works inside
    streaming joins where AQE cannot re-plan.
    """
    from pyspark.sql import functions as F

    keys = [on] if isinstance(on, str) else list(on)
    if salt < 1:
        raise ValueError("salt must be >= 1")
    src = (
        salt_source
        if salt_source is not None
        else F.xxhash64(*[F.col(c) for c in left.columns])
    )
    l_s = left.withColumn("__salt", F.pmod(src, F.lit(salt)).cast("int"))
    r_s = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")),
    )
    return l_s.join(r_s, [*keys, "__salt"], how).drop("__salt")


def zorder_index(cols, bits: int = 12):
    """Z-order (Morton) index over n integer columns: bit b of column j
    lands at output bit ``b*n + j`` — the space-filling-curve key behind
    multi-dimension data CLUSTERING at rest (Delta/Iceberg OPTIMIZE
    ZORDER).  Sort or range-partition 100 TB by this key and each output
    file covers a small hyper-rectangle of the column space, so min/max
    file statistics prune scans on ANY indexed column, not just the
    leading sort key.

    Inputs must already be non-negative and < 2^bits (mask/mod upstream
    — keeping the reduction explicit keeps the expression oracle-
    replayable).  Pure integer shift/mask arithmetic, identical in any
    engine; output fits a BIGINT for n*bits <= 63.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns")
    if n * bits > 63:
        raise ValueError("n*bits must fit a signed 64-bit int")
    out = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            out = out + F.shiftleft(
                F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
                b * n + j,
            ).cast("long")
    return out
