"""FASTA source (SURVEY.md §2.1 S6).

The reference flattens each per-chromosome .fa.gz to a headerless byte file
and mmaps random positions (ChrFastaFile.java:48-86).  Spark-first: parse
once into a ``(chromosome, seq)`` DataFrame; point lookups become
``substring`` against the (broadcastable) sequence table — the memo caches
of VariantPostProcessing.java:1286-1307 collapse into the join itself.

Line grouping uses RDD ``zipWithIndex`` (deterministic global line order)
+ a last-non-null window to assign each sequence line to its preceding
header — the same pattern as the wiggle scan (S7).

Scale note: per-chromosome strings up to ~250 MB broadcast fine; the
100 TB-safe variant is ``chunked_fasta`` below — fixed-size (chromosome,
bucket, seq) chunks joinable by position bucket, no giant row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _lines_with_index(spark: SparkSession, path: str) -> DataFrame:
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    return spark.createDataFrame(rdd, ["line", "idx"])


def read_fasta(
    spark: SparkSession, path: str, strip_chr_prefix: bool = True
) -> DataFrame:
    """Parse FASTA (.fa/.fa.gz) -> (chromosome, seq).

    Header '>name ...' starts a new sequence; name is the first token,
    optionally 'chr'-stripped.  Sequence lines are upper-cased and
    concatenated in line order.
    """
    df = _lines_with_index(spark, path)
    # header table (one row per '>' line — per-chromosome, tiny): broadcast
    # each header's [idx, next header idx) line range and equi-range-join the
    # sequence lines to it.  next_hidx comes from a theta self-join on the
    # |headers|-row table (min following header) instead of a lead() window,
    # so nothing in this scan — not even the tiny side — creates a
    # partition-less WindowExec; sequence lines never funnel through a
    # single partition.
    hdr = df.filter(F.col("line").startswith(">")).select(
        F.col("idx").alias("hidx"),
        F.regexp_extract(F.col("line"), r">\s*(\S+)", 1).alias("chromosome"),
    )
    nxt = hdr.select(F.col("hidx").alias("__b_hidx"))
    headers = (
        hdr.join(F.broadcast(nxt), F.col("__b_hidx") > F.col("hidx"), "left")
        .groupBy("hidx", "chromosome")
        .agg(F.min("__b_hidx").alias("next_hidx"))
    )
    body = df.filter(
        ~F.col("line").startswith(">") & (F.trim(F.col("line")) != "")
    )
    with_chr = body.join(
        F.broadcast(headers),
        (body.idx > headers.hidx)
        & (headers.next_hidx.isNull() | (body.idx < headers.next_hidx)),
    )
    seqs = (
        with_chr
        .groupBy("chromosome")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("idx", "line")))["line"]
            ).alias("seq")
        )
        .select("chromosome", F.upper(F.col("seq")).alias("seq"))
    )
    if strip_chr_prefix:
        seqs = seqs.withColumn(
            "chromosome", F.regexp_replace("chromosome", "^chr", "")
        )
    return seqs


def chunked_fasta(fasta: DataFrame, chunk_size: int = 1_000_000) -> DataFrame:
    """Split (chromosome, seq) into (chromosome, bucket, chunk_start, seq)
    rows of ``chunk_size`` bases — the scale path for position-bucketed
    range joins against variant tables (no row exceeds chunk_size)."""
    n_chunks = F.ceil(F.length("seq") / chunk_size).cast("int")
    return (
        fasta.select(
            "chromosome",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.substring(
                        F.col("seq"), (i * chunk_size + 1).cast("int"), chunk_size
                    ),
                )
            ).alias("bucket", "seq"),
        )
        .withColumn("chunk_start", F.col("bucket").cast("long") * chunk_size + 1)
    )


def dna_chunk(seq_col, start, stop):
    """1-based inclusive [start, stop] slice — ChrFastaFile.getDnaChunk
    semantics (ChrFastaFile.java:96-102)."""
    return F.substring(seq_col, start, (stop - start + 1))


def write_fasta(df: DataFrame, path: str, acc_col: str = "acc_id",
                seq_col: str = "seq", wrap: int = 70) -> None:
    """K6: FASTA sink with 70-char line wrap (Polyphen.java:357-372)."""
    wrapped = F.regexp_replace(
        F.col(seq_col), "(.{" + str(wrap) + "})", "$1\n"
    )
    out = df.select(
        F.concat(F.lit(">"), F.col(acc_col), F.lit("\n"), wrapped).alias("value")
    )
    out.write.mode("overwrite").text(path)
