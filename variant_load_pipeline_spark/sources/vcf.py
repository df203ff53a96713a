"""VCF sources (SURVEY.md §2.1 S2/S3/S4).

* ``read_vcf_multisample`` — multi-sample VCF 4.x: strain names come from
  the ``#CHROM`` header line (cols 9+, VcfToCommonFormat2Converter.java:
  126-135); data rows are split JVM-side and sample columns are exploded to
  (strain, sample_value) rows via posexplode over the strain-name array.
  The header is read on the driver (first lines only); data parsing is fully
  distributed — at 100 TB the header cost is constant.
* ``read_vcf8col`` — 8-column single-strain VCF whose INFO carries depths
  (``END=...;DP=16;AC=9,7`` -> ``str_to_map``; Vcf8ColToCommonFormat2
  Converter.java:154-164).
"""

from __future__ import annotations

import gzip
import io

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VCF_FIXED_COLS = [
    "chrom",
    "pos",
    "id",
    "ref",
    "alt",
    "qual",
    "filter",
    "info",
    "format",
]


def read_vcf_header(path: str) -> list[str]:
    """Driver-side scan of the leading '##'/'#CHROM' lines -> column names.
    Works for .gz; stops at the first data line."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as fh:
        for raw in io.TextIOWrapper(fh, encoding="utf-8"):
            if raw.startswith("##"):
                continue
            if raw.startswith("#CHROM") or raw.startswith("#chrom"):
                return raw.rstrip("\n").split("\t")
            break
    raise ValueError(f"no #CHROM header line found in {path}")


def strain_names(path: str) -> list[str]:
    header = read_vcf_header(path)
    return header[9:]


def read_vcf_multisample(spark: SparkSession, path: str) -> DataFrame:
    """One row per (data line, strain): fixed VCF columns + strain +
    sample_value (the GT:AD:DP:... cell).  '##'/'#' lines are dropped.
    """
    strains = strain_names(path)
    lines = spark.read.text(path).filter(~F.col("value").startswith("#"))
    cols = F.split(F.col("value"), "\t")
    fixed = [
        F.try_element_at(cols, F.lit(i + 1)).alias(name)
        for i, name in enumerate(VCF_FIXED_COLS)
    ]
    df = lines.select(*fixed, cols.alias("__cols"))
    strain_arr = F.array(*[F.lit(s) for s in strains])
    out = df.select(
        *VCF_FIXED_COLS,
        F.col("__cols"),
        F.posexplode(strain_arr).alias("__i", "strain"),
    ).select(
        *VCF_FIXED_COLS,
        "strain",
        F.try_element_at(F.col("__cols"), F.col("__i") + 10).alias("sample_value"),
    )
    return out.withColumn("pos", F.col("pos").cast("long"))


def format_index(fmt: Column, key: str) -> Column:
    """S3: 1-based position of `key` inside 'GT:AD:DP:...' (0 when absent).
    AD may appear as CLCAD2 in some callers — handled by the caller passing
    both keys (VcfToCommonFormat2Converter.java:329-357)."""
    return F.array_position(F.split(fmt, ":"), key)


def sample_field(sample_value: Column, idx: Column) -> Column:
    """Field of a sample cell at 1-based idx; NULL when idx==0/out of range."""
    parts = F.split(sample_value, ":")
    return F.when(idx > 0, F.try_element_at(parts, idx.cast("int"))).otherwise(
        F.lit(None).cast("string")
    )


def read_vcf8col(spark: SparkSession, path: str) -> DataFrame:
    """8-column VCF: CHROM POS ID REF ALT QUAL FILTER INFO with the INFO
    key/value block parsed into a map column ``info_map``."""
    lines = spark.read.text(path).filter(~F.col("value").startswith("#"))
    cols = F.split(F.col("value"), "\t")
    fixed = [
        F.try_element_at(cols, F.lit(i + 1)).alias(name)
        for i, name in enumerate(VCF_FIXED_COLS[:8])
    ]
    df = lines.select(*fixed)
    return df.withColumn("pos", F.col("pos").cast("long")).withColumn(
        "info_map", F.str_to_map(F.col("info"), F.lit(";"), F.lit("="))
    )


def genotype_is_called(gt: Column) -> Column:
    """F6: drop './.', '.', '0/0', '0' genotypes (hom-ref/missing;
    VcfToCommonFormat2Converter.java:377-391)."""
    return ~gt.isin("./.", ".", "0/0", "0")
