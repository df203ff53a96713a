"""Dedup-upsert operators (SURVEY.md §2.4 J4/J5, §2.1 K4/K5) and
deterministic id allocation.

The reference matches incoming variants against the store on the 6-key
(start_pos, end_pos, chromosome, ref_nuc, variant_type, var_nuc) with
case-insensitive allele compare (VariantLoad3.java:519-534), reusing the
existing RGD_ID or drawing a fresh one from an Oracle sequence (:550).
Spark-first: a left join on the normalized key + window-based id allocation
(deterministic across runs — the correctness comparisons are on natural
keys, never allocated ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VARIANT_6KEY = [
    "start_pos",
    "end_pos",
    "chromosome",
    "ref_nuc",
    "variant_type",
    "var_nuc",
]
# alleles compare case-insensitively (VariantLoad3.java:526-533)
_CASE_INSENSITIVE = {"ref_nuc", "var_nuc"}


def dedup_upsert(
    incoming: DataFrame,
    existing: DataFrame,
    keys: list[str] | None = None,
    id_col: str = "rgd_id",
    id_offset: int | None = None,
    case_insensitive: set[str] | None = None,
) -> DataFrame:
    """Assign ids: reuse the existing id on 6-key match, else allocate a new
    deterministic id ``offset + row_number`` ordered by the natural key.

    ``existing`` must carry ``id_col``; ``id_offset`` defaults to
    max(existing id) so new ids never collide (the Oracle-sequence analog).
    Null-safe equality (``eqNullSafe``) mirrors the reference's null-tolerant
    compare in the ClinVar variant (VariantRatLoaderFromDb.java:220-250).
    """
    keys = keys or VARIANT_6KEY
    ci = _CASE_INSENSITIVE if case_insensitive is None else case_insensitive

    if id_offset is None:
        id_offset_row = existing.agg(F.max(id_col)).collect()[0][0]
        id_offset = (id_offset_row or 0) + 1

    e = existing.select(
        *[F.col(k).alias(f"__e_{k}") for k in keys],
        F.col(id_col).alias("__existing_id"),
    ).dropDuplicates([f"__e_{k}" for k in keys])

    cond = None
    for k in keys:
        l, r = F.col(k), F.col(f"__e_{k}")
        if k in ci:
            l, r = F.upper(l), F.upper(r)
        c = l.eqNullSafe(r)
        cond = c if cond is None else (cond & c)

    from .windows import bucketed_row_number

    # lazy localCheckpoint, not persist(): both id branches reuse the join
    # result, and the checkpoint's RDD blocks are reference-tracked — the
    # ContextCleaner reclaims them when this DataFrame is GC'd, so a
    # long-lived driver session never accumulates leaked cache entries
    # (persist() pins a CacheManager entry until an explicit unpersist the
    # lazy API has no good place for).  Tradeoff: checkpointed partitions
    # are not recomputable on executor loss; the load plan materializes its
    # outputs immediately after, keeping the exposure window small.
    matched = incoming.join(e, cond, "left").localCheckpoint(eager=False)
    reused = matched.filter(F.col("__existing_id").isNotNull()).withColumn(
        id_col, F.col("__existing_id").cast("long")
    ).withColumn("id_source", F.lit("reused"))
    # new ids: deterministic chromosome-major rank — the per-chromosome
    # row_number + tiny cumulative-offset table replaces a global sort
    # (allocation order is (chromosome, *keys); ids stay arbitrary-but-
    # deterministic, correctness always compares natural keys)
    fresh = bucketed_row_number(
        matched.filter(F.col("__existing_id").isNull()),
        order_keys=keys,
        bucket="chromosome",
    )
    fresh = fresh.withColumn(
        id_col, (F.lit(id_offset) + F.col("__rank") - 1).cast("long")
    ).withColumn("id_source", F.lit("new")).drop("__rank")
    out = reused.unionByName(fresh)
    return out.drop("__existing_id", *[f"__e_{k}" for k in keys])


def insert_if_not_exists(
    incoming: DataFrame, existing: DataFrame, keys: list[str]
) -> DataFrame:
    """K4: rows of ``incoming`` whose key is absent from ``existing``
    (INSERT ... WHERE NOT EXISTS -> left_anti)."""
    return incoming.join(existing.select(*keys).dropDuplicates(keys), keys, "left_anti")


def merge_update(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    set_cols: list[str],
) -> DataFrame:
    """K5: batched UPDATE as a join + column overwrite (plain-Spark MERGE
    WHEN MATCHED).  Update rows must be unique per key."""
    u = updates.select(
        *keys, *[F.col(c).alias(f"__u_{c}") for c in set_cols]
    ).dropDuplicates(keys)
    joined = target.join(u, keys, "left")
    out = joined
    for c in set_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__u_{c}"), F.col(c)))
    return out.drop(*[f"__u_{c}" for c in set_cols])
