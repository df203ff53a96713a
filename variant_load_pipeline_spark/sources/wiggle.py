"""Wiggle fixedStep source (SURVEY.md §2.1 S7).

Reference semantics (ConservationScoreLoader.java:100-140): a
``fixedStep chrom=chr1 start=3462 step=1`` line sets running state; each
following data line emits (chr, pos, score) and advances pos by step.
Only the 'chr' prefix is stripped (substring, not normalize); data lines
under a contig whose name is >2 chars are counted but skipped — and STILL
advance the position counter.

Spark restatement: zipWithIndex for global line order; the declaration
table (one row per ``fixedStep`` header — thousands of rows for a whole
genome) is broadcast with each declaration's [idx, next-declaration idx)
line range, data lines equi-range-join to their governing declaration, then
``pos = start + step * (rank within declaration group)`` — running state
becomes a broadcast join + partitioned window.  No global single-partition
window anywhere: the only global ordering touches the tiny declaration
table, so the scan stays fully parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def read_wiggle(spark: SparkSession, path: str) -> DataFrame:
    """Parse fixedStep wiggle -> (chr, position, score)."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(rdd, ["line", "idx"])

    is_decl = F.col("line").startswith("fixedStep")
    # declaration table: one row per fixedStep header (tiny even for a
    # whole-genome file).  The successor index comes from a broadcast theta
    # self-join (min following declaration) — no partition-less lead()
    # window anywhere, matching the repo-wide plan invariant.
    d0 = df.filter(is_decl).select(
        F.col("idx").alias("decl_idx"),
        F.regexp_extract("line", r"chrom=(\S+)", 1).alias("chrom_raw"),
        F.regexp_extract("line", r"start=(\d+)", 1).cast("long").alias("start"),
        F.coalesce(
            F.nullif(F.regexp_extract("line", r"step=(\d+)", 1), F.lit(""))
            .cast("long"),
            F.lit(1),
        ).alias("step"),
    )
    nxt = d0.select(F.col("decl_idx").alias("__b_idx"))
    decl = (
        d0.join(F.broadcast(nxt), F.col("__b_idx") > F.col("decl_idx"), "left")
        .groupBy("decl_idx", "chrom_raw", "start", "step")
        .agg(F.min("__b_idx").alias("next_idx"))
    )

    data = df.filter(~is_decl & (F.trim("line") != ""))
    filled = data.join(
        F.broadcast(decl),
        (data.idx > decl.decl_idx)
        & (decl.next_idx.isNull() | (data.idx < decl.next_idx)),
    ).select("line", "idx", "decl_idx", "chrom_raw", "start", "step")

    wd = W.partitionBy("decl_idx").orderBy("idx")
    out = filled.withColumn(
        "position",
        F.col("start") + F.col("step") * (F.row_number().over(wd) - 1),
    ).withColumn(
        "chr", F.regexp_replace("chrom_raw", "^chr", "")
    )
    # unmapped contigs (len>2) are skipped AFTER position accounting — the
    # running pos advances through them in the reference too, which the
    # per-declaration row_number already reproduces (each declaration has
    # one chrom, so skipped groups simply drop wholesale)
    return (
        out.filter(F.length("chr") <= 2)
        .select(
            "chr",
            F.col("position").cast("long").alias("position"),
            F.col("line").cast("double").alias("score"),
        )
    )
