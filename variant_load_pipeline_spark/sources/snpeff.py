"""SnpEff-annotated VCF source (SURVEY.md §2.1 S10, C18, E4, J13).

Parity: SnpEffLoader.java:69-163 — skip '#'/empty lines, require >= 8 tab
columns, extract the ``ANN=`` block from INFO (terminated by ';' or EOL),
one output row per comma-separated annotation, 16 pipe-separated fields
with empty -> NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import SNPEFF_ANN_FIELDS


def read_snpeff_vcf(spark: SparkSession, path: str) -> DataFrame:
    """-> one row per (vcf line, ANN annotation) with the 16 SnpEff fields."""
    lines = spark.read.text(path).filter(
        ~F.col("value").startswith("#") & (F.col("value") != "")
    )
    cols = F.split(F.col("value"), "\t", -1)
    df = (
        lines.select(
            F.try_element_at(cols, F.lit(1)).alias("chr"),
            F.try_element_at(cols, F.lit(2)).cast("long").alias("pos"),
            F.try_element_at(cols, F.lit(4)).alias("ref_nuc"),
            F.try_element_at(cols, F.lit(5)).alias("var_nuc"),
            F.try_element_at(cols, F.lit(8)).alias("info"),
            F.size(cols).alias("__n"),
        )
        .filter(F.col("__n") >= 8)
        .drop("__n")
    )
    ann_block = F.regexp_extract(F.col("info"), r"ANN=([^;]*)", 1)
    exploded = df.withColumn("ann_block", ann_block).filter(
        F.col("ann_block") != ""
    ).withColumn("annot", F.explode(F.split(F.col("ann_block"), ",")))
    fields = F.split(F.col("annot"), r"\|", -1)
    out_cols = [
        F.nullif(F.try_element_at(fields, F.lit(i + 1)), F.lit("")).alias(name)
        for i, name in enumerate(SNPEFF_ANN_FIELDS)
    ]
    return exploded.select("chr", "pos", "ref_nuc", "var_nuc", *out_cols)


def match_variants(
    snpeff: DataFrame, variants: DataFrame, sample_id: int | None = None
) -> DataFrame:
    """J13: attach variant ids by (chr, pos) then exact ref/var equality
    (SnpEffLoader.java:117-128).  ``variants`` needs columns
    (rgd_id, chromosome, start_pos, ref_nuc, var_nuc [, sample_id])."""
    v = variants
    if sample_id is not None:
        v = v.filter(F.col("sample_id") == sample_id)
    v = v.select(
        F.col("rgd_id").alias("variant_id"),
        F.col("chromosome").alias("v_chr"),
        F.col("start_pos").alias("v_pos"),
        F.col("ref_nuc").alias("v_ref"),
        F.col("var_nuc").alias("v_var"),
    )
    return snpeff.join(
        v,
        (F.col("chr") == F.col("v_chr"))
        & (F.col("pos") == F.col("v_pos"))
        & (F.col("ref_nuc") == F.col("v_ref"))
        & (F.col("var_nuc") == F.col("v_var")),
    ).drop("v_chr", "v_pos", "v_ref", "v_var")
