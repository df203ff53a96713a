"""CommonFormat2 source/sink (SURVEY.md §2.1 S1/S5, K1).

16-column TSV, one allele per row, '#'-prefixed header, optional gzip
(transparent to Spark's text/csv readers).  Column order and the
empty-as-0 int policy follow CommonFormat2Line.java:8-33 and
VariantLoad3.java:379-386 (parseInt of ''/null -> 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# raw read schema: everything string so empty-vs-0 policy is applied by us,
# not by the csv parser's null handling
_RAW_FIELDS = [
    "chr",
    "position",
    "ref_nuc",
    "var_nuc",
    "rs_id",
    "count_a",
    "count_c",
    "count_g",
    "count_t",
    "total_depth",
    "hgvs_name",
    "rgd_id",
    "allele_depth",
    "allele_count",
    "read_depth",
    "padding_base",
]
_INT_COLS = {
    "count_a",
    "count_c",
    "count_g",
    "count_t",
    "total_depth",
    "allele_depth",
    "allele_count",
    "read_depth",
}

CF2_HEADER = (
    "#chr\tposition\tref nuc\tvar nuc\trsId\tA reads\tC reads\tG reads"
    "\tT reads\ttotal depth\thgvs name\trgd id\tallele depth\tallele count"
    "\tread depth\tpadding base"
)


def read_cf2(spark: SparkSession, path: str) -> DataFrame:
    """Read CF2 TSV (plain or .gz) into the typed schema.

    Empty int cells parse to 0 (VariantLoad3.java:379-386); empty string
    cells stay '' (the reference distinguishes '' from missing nowhere).
    """
    raw_schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in _RAW_FIELDS]
    )
    df = (
        spark.read.option("sep", "\t")
        .option("comment", "#")
        .option("mode", "PERMISSIVE")
        .schema(raw_schema)
        .csv(path)
    )
    cols = []
    for c in _RAW_FIELDS:
        col = F.coalesce(F.col(c), F.lit(""))
        if c in _INT_COLS:
            # try_cast: '' -> NULL -> 0 (parseInt-of-empty policy), and stays
            # ANSI-safe on malformed cells
            cols.append(F.coalesce(col.try_cast("int"), F.lit(0)).alias(c))
        elif c in ("position", "rgd_id"):
            cols.append(col.try_cast("long").alias(c))
        else:
            cols.append(col.alias(c))
    return df.select(*cols)


def write_cf2(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    compress: bool = False,
) -> None:
    """K1: per-strain partitioned TSV sink with optional gzip.

    ``partition_by`` (e.g. 'strain') maps the reference's one-file-per-strain
    writer cache (VcfToCommonFormat2Converter.java:393-405) to
    ``write.partitionBy`` — each strain becomes a directory, each task a
    file; no driver-side writer map, no lazily-opened handles.
    """
    out = df
    # emptyValue: write empty cells bare (reference writes '' for null int
    # columns, never a quoted "")
    writer = (
        out.write.mode("overwrite")
        .option("sep", "\t")
        .option("emptyValue", "")
    )
    if compress:
        writer = writer.option("compression", "gzip")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.csv(path)
