"""VCF export plan — the ClinVar2Vcf / DbSnp2Vcf / GwasCat2Vcf family
(reference: ClinVar2Vcf.java:132-262, GwasCat2Vcf.java:103-138).

DB rows -> VCF 4.x text: render each variant as a tab-joined data line (C21),
sort by (chromosome lexicographic, position numeric, case-insensitive id)
with `##` header lines first (W1/K2), optionally gzip.

Scale note: the reference sorts the whole file in driver memory and rewrites
it (ClinVar2Vcf.java:132-186).  Here `orderBy` is a range-partitioned
distributed sort; the single output file (VCF is consumed as one file) is
produced by coalesce(1) AFTER the sort — only the final write funnels through
one task, the sort itself is parallel.  For multi-file consumers drop the
coalesce and keep the sorted partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VCF_HEADER = [
    "##fileformat=VCFv4.2",
    '##INFO=<ID=DP,Number=1,Type=Integer,Description="Total Depth">',
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
]


def render_vcf_lines(variants: DataFrame) -> DataFrame:
    """C21: one VCF data line per variant row.

    Input columns: chromosome, position, id, ref, alt, depth (nullable).
    Output: (chromosome, position, id, line).
    """
    dp = F.coalesce(F.col("depth").cast("string"), F.lit("."))
    return variants.select(
        "chromosome",
        "position",
        "id",
        F.concat_ws(
            "\t",
            F.col("chromosome"),
            F.col("position").cast("string"),
            F.coalesce(F.col("id"), F.lit(".")),
            F.col("ref"),
            F.col("alt"),
            F.lit("."),
            F.lit("."),
            F.concat(F.lit("DP="), dp),
        ).alias("line"),
    )


def export_vcf(
    variants: DataFrame,
    path: str,
    compress: bool = False,
    single_file: bool = True,
) -> None:
    """K2 + W1: sorted VCF sink.

    Sort order replicates ClinVar2Vcf: chromosome lexicographic asc, position
    numeric asc, id case-insensitive asc (ClinVar2Vcf.java:150-163); header
    lines precede all data lines via a sort-key prefix so the engine's sort
    produces the final byte order in one pass.
    """
    spark = variants.sparkSession
    rendered = render_vcf_lines(variants).select(
        F.lit(1).alias("hdr_rank"),
        F.col("chromosome").alias("k1"),
        F.col("position").cast("long").alias("k2"),
        F.lower(F.col("id")).alias("k3"),
        "line",
    )
    header = spark.createDataFrame(
        [(0, "", int(i), h) for i, h in enumerate(VCF_HEADER)],
        "hdr_rank int, k1 string, k2 long, line string",
    ).select("hdr_rank", "k1", "k2", F.lit("").alias("k3"), "line")
    out = header.unionByName(rendered).orderBy("hdr_rank", "k1", "k2", "k3")
    if single_file:
        out = out.coalesce(1)
    writer = out.select("line").write.mode("overwrite")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.text(path)


def write_epoch_manifest(
    docs: DataFrame,
    path: str,
    epochs: int = 3,
    shards: int = 8,
    id_col: str = "doc_id",
) -> None:
    """Per-epoch data-order export: the shard manifests a training run
    reads — for every epoch, every doc gets a deterministic (shard, pos)
    from an epoch-seeded portable hash (training_shard_assignment's
    pseudo-shuffle, re-seeded per epoch so each epoch sees a different
    order while staying bit-reproducible from the corpus alone).

    Layout contract: parquet partitioned by (epoch, shard); each
    (epoch, shard) directory holds its docs in EXACT training order —
    the groups are hash-repartitioned so each lands in one task, then
    sorted within the task on the order key, so the file's row order IS
    the manifest order (readers stream it; no re-sort at load time).
    """
    (
        epoch_manifest_rows(docs, epochs, shards, id_col)
        .repartition("epoch", "shard")
        .sortWithinPartitions("epoch", "shard", "hv", "doc_id")
        .write.mode("overwrite")
        .partitionBy("epoch", "shard")
        .parquet(path)
    )


def epoch_manifest_rows(
    docs: DataFrame, epochs: int, shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """The per-doc manifest derivation shared by the batch writer and
    the streaming sink: (epoch, shard, hv, doc_id) for every (doc,
    epoch), shard and order hash from the epoch-seeded portable hash."""
    h = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.sequence(F.lit(1), F.lit(epochs))).alias("epoch"),
    ).select(
        "doc_id",
        F.col("epoch").cast("long").alias("epoch"),
        # the first select already normalized id_col to "doc_id"; hashing
        # must reference the alias or any non-default id_col raises
        _epoch_hash(F.col("epoch"), F.col("doc_id")).alias("hv"),
    )
    return h.select(
        "epoch",
        (F.col("hv") % shards).cast("long").alias("shard"),
        "hv",
        "doc_id",
    )


def _epoch_hash(epoch, doc_id) -> F.Column:
    """Epoch-seeded portable order hash; DuckDB twin:
    ('0x' || substr(md5('epoch' || epoch || '_' || doc_id), 1, 8))::BIGINT
    """
    from ..functions.text import shingle_hash

    return shingle_hash(
        F.concat(
            F.lit("epoch"),
            epoch.cast("string"),
            F.lit("_"),
            doc_id.cast("string"),
        )
    )


def read_epoch_manifest(spark, path: str) -> DataFrame:
    """Load a persisted epoch manifest (partition discovery restores
    epoch/shard; in-file row order is the training order)."""
    return spark.read.option("basePath", path).parquet(path)
