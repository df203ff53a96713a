"""Deterministic sampling operators for training-data curation.

`df.sample()` is seed-dependent on PARTITIONING (Bernoulli per partition
with a per-partition XORShift stream), so the same seed gives different
rows after a repartition, a scale-up, or an engine change — useless for
reproducible corpus splits.  These operators derive the sampling decision
from a HASH OF THE ROW KEY instead: any engine, any partitioning, any
cluster size selects the identical rows, and the decision is a pure
projection (no shuffle).

* ``hash_uniform`` — md5-derived uniform [0, 1) per key (engine-portable:
  DuckDB replays the identical arithmetic, see functions/text.shingle_hash).
* ``hash_sample`` — keep rows with u < fraction: a deterministic
  Bernoulli(fraction) split.  Different ``salt`` values give independent
  splits (train/val/test from one corpus without coordination).
* ``stratified_sample`` — per-stratum cap: rank rows inside each stratum
  by the hash and keep the first ``per_stratum``.  Bounds any stratum
  (language, domain, source) to a budget regardless of its raw frequency
  — the balancing step of corpus curation.  One shuffle on the stratum
  key; skewed strata are exactly the rows the cap discards, so the
  window's heavy partitions shrink as they rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) from the first 8 md5 hex chars of
    (key || salt).  DuckDB twin:
    ``('0x' || substr(md5(key || salt), 1, 8))::BIGINT / 4294967296.0``."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8),
        16,
        10,
    ).cast("long")
    return h.cast("double") / F.lit(float(1 << 32))


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose key-hash uniform is below ``fraction`` — a
    reproducible Bernoulli split, stable under repartitioning and engine
    changes.  A pure filter: pushes down, no shuffle."""
    return df.filter(hash_uniform(F.col(key_col), salt) < fraction)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    per_stratum: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum cap: rows ranked inside each stratum by
    (hash, key) — the key tiebreak keeps the rank total even for
    colliding hashes — and the first ``per_stratum`` survive."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy(strata_col).orderBy(
        hash_uniform(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= per_stratum)
        .drop("__rk")
    )


def temperature_mixing_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    target_frac: float = 0.5,
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Temperature-based source mixing [the multilingual sampling rule of
    Conneau & Lample 2019 / Arivazhagan et al. 2019 — public]: sample
    sources at p_s ∝ n_s^alpha (alpha < 1 up-weights small sources),
    sized so the expected kept corpus is ``target_frac`` of the input.
    Per-row keep probability: rate_s = min(1, T·p_s / n_s) with
    T = target_frac·N; the decision is the deterministic key-hash
    Bernoulli (stable under repartitioning / engine change).

    Adds (keep_prob, keep) without filtering, so callers can audit both
    verdicts.  Plan: one groupBy for the per-stratum counts (stratum
    cardinality = #sources, tiny), broadcast back — the corpus-sized side
    stays a map-side projection, no shuffle.

    Oracle portability: rates are ROUNDED to 6 decimals before the
    compare, and alpha=0.5 goes through sqrt (correctly rounded in both
    engines) — other alphas use pow, whose last-ulp behavior is not
    oracle-guaranteed.
    """
    n = F.col("__n").cast("double")
    pw = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(alpha))
    counts = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__pw", pw)
    )
    totals = counts.agg(
        F.sum("__n").alias("__n_tot"), F.sum("__pw").alias("__z")
    )
    rates = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            stratum_col,
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(target_frac)
                    * F.col("__n_tot")
                    * (F.col("__pw") / F.col("__z"))
                    / F.col("__n"),
                ),
                6,
            ).alias("keep_prob"),
        )
    )
    u = hash_uniform(F.col(key_col), salt)
    return (
        df.join(F.broadcast(rates), stratum_col)
        .withColumn(
            "keep",
            F.when(u < F.col("keep_prob"), F.lit("T")).otherwise(
                F.lit("F")
            ),
        )
    )


def shard_assignments(
    docs: DataFrame, n_shards: int = 8, salt: str = "shard"
) -> DataFrame:
    """(doc_id, shard, pos): the deterministic training pseudo-shuffle
    (the training_shard_assignment query's operator form).  Shard = seeded
    portable hash mod n_shards; pos = dense 1..k within the shard in hash
    order — reproducible epoch order without a global sort."""
    from pyspark.sql.window import Window as W

    from ..functions.text import shingle_hash

    h = docs.select(
        "doc_id",
        shingle_hash(
            F.concat(F.lit(salt + "_"), F.col("doc_id").cast("string"))
        ).alias("hv"),
    )
    wnd = W.partitionBy(F.col("hv") % n_shards).orderBy("hv", "doc_id")
    return h.select(
        "doc_id",
        (F.col("hv") % n_shards).cast("long").alias("shard"),
        F.row_number().over(wnd).cast("long").alias("pos"),
    )


def write_training_shards(
    docs: DataFrame, path: str, n_shards: int = 8, salt: str = "shard"
) -> None:
    """Materialize the training product: documents written as
    ``path/shard=<s>/`` parquet, each shard's rows physically ordered by
    the deterministic position — a data loader streams shard files
    sequentially and replays the exact epoch order with zero runtime
    shuffling.  One shuffle (repartition on shard) + in-partition sort;
    no global sort at any scale."""
    a = shard_assignments(docs, n_shards=n_shards, salt=salt)
    (
        docs.join(a, "doc_id")
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def read_training_shard(spark, path: str, shard: int) -> DataFrame:
    """One shard, in stored (pos) order — the loader-side contract."""
    return (
        spark.read.option("basePath", path)
        .parquet(f"{path}/shard={shard}")
        .orderBy("pos")
    )
