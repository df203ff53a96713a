"""Wiggle fixedStep source (SURVEY.md §2.1 S7).

Reference semantics (ConservationScoreLoader.java:100-140): a
``fixedStep chrom=chr1 start=3462 step=1`` line sets running state; each
following data line emits (chr, pos, score) and advances pos by step.
Only the 'chr' prefix is stripped (substring, not normalize); data lines
under a contig whose name is >2 chars are counted but skipped — and STILL
advance the position counter.

Spark restatement: zipWithIndex for global line order, last-non-null window
to attach each data line to its declaration, then
``pos = start + step * (rank within declaration group)`` — running state
becomes a window expression; no sorted-stream loop.
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
    decl = df.withColumn(
        "__decl_idx", F.when(is_decl, F.col("idx"))
    ).withColumn(
        "__chrom_raw",
        F.when(is_decl, F.regexp_extract("line", r"chrom=(\S+)", 1)),
    ).withColumn(
        "__start", F.when(is_decl, F.regexp_extract("line", r"start=(\d+)", 1).cast("long"))
    ).withColumn(
        "__step",
        F.when(
            is_decl,
            F.coalesce(
                F.nullif(F.regexp_extract("line", r"step=(\d+)", 1), F.lit("")).cast(
                    "long"
                ),
                F.lit(1),
            ),
        ),
    )

    w = W.orderBy("idx").rowsBetween(W.unboundedPreceding, W.currentRow)
    filled = decl.select(
        "line",
        "idx",
        F.last("__decl_idx", ignorenulls=True).over(w).alias("decl_idx"),
        F.last("__chrom_raw", ignorenulls=True).over(w).alias("chrom_raw"),
        F.last("__start", ignorenulls=True).over(w).alias("start"),
        F.last("__step", ignorenulls=True).over(w).alias("step"),
    ).filter(~is_decl & (F.trim("line") != "") & F.col("decl_idx").isNotNull())

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
