"""Table-maintenance plans: small-file compaction and write audits.

At 100 TB the silent killer is file-count explosion — thousands of
micro-batch appends or over-partitioned writes leave millions of sub-MB
parquet files, and every downstream scan pays per-file open/footer cost.
Compaction is the standing maintenance job: read the fragmented table,
coalesce to size-targeted files, atomically swap.

These helpers run on any Hadoop-visible path; file enumeration uses the
JVM FileSystem API (not os.listdir), so the same code works on HDFS/S3A
in cluster mode.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class FragmentStats:
    n_files: int
    total_bytes: int
    n_rows: int

    @property
    def avg_file_bytes(self) -> float:
        return self.total_bytes / self.n_files if self.n_files else 0.0


def _list_parquet_files(spark: SparkSession, path: str):
    """(path, length) for every data file under `path`, via the Hadoop
    FileSystem API (portable to HDFS/S3A, unlike os.walk)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            out.append((st.getPath().toString(), st.getLen()))
    return out


def fragment_stats(spark: SparkSession, path: str) -> FragmentStats:
    files = _list_parquet_files(spark, path)
    n_rows = spark.read.parquet(path).count()
    return FragmentStats(
        n_files=len(files),
        total_bytes=sum(b for _, b in files),
        n_rows=n_rows,
    )


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> FragmentStats:
    """Rewrite `src_path` into `dst_path` with size-targeted files.

    File count = ceil(current total bytes / target) — computed from the
    source's ACTUAL on-disk size, so compression ratio carries over
    without guessing rows-per-byte.  One shuffle-free coalesce when
    shrinking file count (the common case); repartition only if the
    source has too FEW partitions to hit the target (rare for
    compaction).  Content is preserved row-for-row; callers verify with
    `fragment_stats` (row counts) before swapping paths — the audit half
    of the job.
    """
    before = fragment_stats(spark, src_path)
    n_out = max(1, math.ceil(before.total_bytes / target_file_bytes))
    df: DataFrame = spark.read.parquet(src_path)
    cur = df.rdd.getNumPartitions()
    shaped = df.coalesce(n_out) if cur >= n_out else df.repartition(n_out)
    shaped.write.mode("overwrite").parquet(dst_path)
    return fragment_stats(spark, dst_path)
