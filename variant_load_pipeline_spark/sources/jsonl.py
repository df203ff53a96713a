"""JSONL (newline-delimited JSON) corpus source — the wire format LLM
training corpora actually ship in (one JSON document per line, possibly
gzip-compressed, possibly containing malformed lines from upstream
crawlers).

Spark-first: ``spark.read.json`` with an EXPLICIT schema (never inferred
— inference is a full extra pass over 100 TB and freezes whatever the
first sample happened to contain) plus the PERMISSIVE corrupt-record
channel, so malformed lines surface as data instead of killing the job
or silently vanishing.  Gzip is transparent to the reader, and the scan
parallelizes per file/split exactly like the text sources (reference
analog: the gzip-aware line readers, VariantLoad3.java:193-198 — same
contract, JSON instead of TSV).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    mode: str = "PERMISSIVE",
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read newline-delimited JSON with a fixed schema.

    mode='PERMISSIVE' (default) adds ``corrupt_col`` holding the raw
    line for rows that fail to parse (all declared fields NULL);
    'DROPMALFORMED' silently drops them; 'FAILFAST' raises.  The corrupt
    column is appended to the declared schema — callers select it like
    any other column (Spark requires at least one non-corrupt column to
    also be referenced, which every real projection does).
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if mode == "PERMISSIVE":
        schema = T.StructType(
            [*schema.fields, T.StructField(corrupt_col, T.StringType())]
        )
    reader = (
        spark.read.option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(schema)
    )
    return reader.json(path)
