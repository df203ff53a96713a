"""Query registry: every SURVEY.md §2 operator exposed as a (spark_fn,
oracle_sql) pair over the driver's test tables.

Each entry is a named query: ``spark(spark, sf_dir) -> DataFrame`` and an
equivalent ANSI-SQL string DuckDB runs on the same parquet (views: region
nation customer supplier part orders lineitem events documents embeddings).
The driver hash-compares both sides at sf0.01 — so every column is aliased
identically on both sides, aggregate ints are cast to BIGINT, doubles are
rounded to 6 decimals, and timestamps are rendered as strings.

Where a query synthesizes variant-domain columns (ref/var alleles, read
counts, chromosomes) from the star schema, the SAME deterministic derivation
is written in both dialects; the point is to exercise the operator kernels
(zygosity, interval join, dedup-upsert, ...) under oracle checking.

Scale notes (the 100 TB stance, verified via .explain on each):
* dimension sides of joins are broadcast (genes/intervals, lookup maps);
* window functions partition on the natural key — no global sorts;
* aggregations are partial (map-side) by construction — no distinct-heavy
  plans; `two-level` count-distincts avoided;
* every scan projects only needed columns (check ReadSchema) and pushes
  filters (check PushedFilters).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .functions import scalar, text
from .functions import zygosity as Z

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame) -> DataFrame:
    """Scale-adaptive parallelism fix-up (guide §2.4/§2.5): round-robin
    repartition ONLY when the scan under-parallelizes the session.

    The single-file local fixtures scan as 1 task, so CPU-heavy derivations
    (shingling, hashing, per-row media decode) previously forced an
    unconditional ``repartition(defaultParallelism)`` — which on a real
    corpus is a full-payload shuffle of bytes that are ALREADY spread over
    thousands of scan partitions, plus the local sort every keyless
    repartition pays (sortBeforeRepartition).  Checking the actual scan
    partition count makes the fix-up a no-op exactly where it would hurt:
    at scale the Exchange disappears from the plan, on the 1-file fixtures
    behavior is byte-identical.  Results never depend on partitioning
    (every registry query is oracle-hash-gated deterministic).
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet's ts encoding has varied across testdata generations:
    TIMESTAMP(NANOS) (unsupported by Spark's reader — read as long via the
    nanosAsLong conf and convert) or TIMESTAMP(MICROS) (arrives as
    TIMESTAMP_NTZ — cast to session-TZ timestamp).  Session TZ pinned UTC so
    both paths render identically to DuckDB's naive timestamps.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type == "bigint":  # nanos-as-long
        return ev.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(name, fn, oracle, doc)
        return fn

    return deco


def registry() -> dict[str, Query]:
    return dict(_REGISTRY)


# ===========================================================================
# Synthesized variant-domain derivations, shared Spark/SQL.
#
# chrom: 1..20,X,Y from l_orderkey; pos from l_partkey; ACGT counts from
# numeric columns; gender from suppkey. Same formulas verbatim in SQL.
# ===========================================================================
_BASES = ["A", "C", "G", "T"]


def _variant_cols(li: DataFrame) -> DataFrame:
    base = F.array(*[F.lit(b) for b in _BASES])
    chrom_idx = (F.col("l_orderkey") % 22).cast("int")
    chrom = (
        F.when(chrom_idx == 20, F.lit("X"))
        .when(chrom_idx == 21, F.lit("Y"))
        .otherwise((chrom_idx + 1).cast("string"))
    )
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lnum"),
        chrom.alias("chrom"),
        ((F.col("l_partkey") * 1487) % 3000000).alias("pos"),
        F.element_at(base, ((F.col("l_partkey") % 4) + 1).cast("int")).alias("ref"),
        F.element_at(base, ((F.col("l_suppkey") % 4) + 1).cast("int")).alias("var"),
        # FLOOR before casting: Spark double->int casts truncate while DuckDB
        # rounds, so an explicit floor keeps both engines identical
        (F.floor("l_quantity").cast("int") % 60).alias("cnt_a"),
        (F.floor("l_extendedprice").cast("int") % 50).alias("cnt_c"),
        (F.col("l_linenumber") * 3).alias("cnt_g"),
        ((F.col("l_suppkey") % 40)).cast("int").alias("cnt_t"),
        F.when((F.col("l_suppkey") % 3) == 0, F.lit("M"))
        .when((F.col("l_suppkey") % 3) == 1, F.lit("F"))
        .otherwise(F.lit("P"))
        .alias("gender"),
    )


_VARIANT_SQL = """
    SELECT
        l_orderkey AS okey,
        l_linenumber AS lnum,
        CASE WHEN l_orderkey % 22 = 20 THEN 'X'
             WHEN l_orderkey % 22 = 21 THEN 'Y'
             ELSE CAST(l_orderkey % 22 + 1 AS VARCHAR) END AS chrom,
        (l_partkey * 1487) % 3000000 AS pos,
        ['A','C','G','T'][CAST(l_partkey % 4 + 1 AS INT)] AS ref,
        ['A','C','G','T'][CAST(l_suppkey % 4 + 1 AS INT)] AS var,
        CAST(FLOOR(l_quantity) AS INT) % 60 AS cnt_a,
        CAST(FLOOR(l_extendedprice) AS INT) % 50 AS cnt_c,
        l_linenumber * 3 AS cnt_g,
        CAST(l_suppkey % 40 AS INT) AS cnt_t,
        CASE WHEN l_suppkey % 3 = 0 THEN 'M'
             WHEN l_suppkey % 3 = 1 THEN 'F' ELSE 'P' END AS gender
    FROM lineitem
"""

# gene intervals synthesized from part; small table -> broadcast side
def _gene_cols(part: DataFrame) -> DataFrame:
    chrom_idx = (F.col("p_partkey") % 22).cast("int")
    chrom = (
        F.when(chrom_idx == 20, F.lit("X"))
        .when(chrom_idx == 21, F.lit("Y"))
        .otherwise((chrom_idx + 1).cast("string"))
    )
    start = (F.col("p_partkey") * 2111) % 3000000
    return part.select(
        F.col("p_partkey").alias("gene_id"),
        chrom.alias("chrom"),
        start.alias("gstart"),
        (start + (F.col("p_size") * 997) % 80000 + 200).alias("gstop"),
    )


_GENE_SQL = """
    SELECT
        p_partkey AS gene_id,
        CASE WHEN p_partkey % 22 = 20 THEN 'X'
             WHEN p_partkey % 22 = 21 THEN 'Y'
             ELSE CAST(p_partkey % 22 + 1 AS VARCHAR) END AS chrom,
        (p_partkey * 2111) % 3000000 AS gstart,
        (p_partkey * 2111) % 3000000 + (p_size * 997) % 80000 + 200 AS gstop
    FROM part
"""


# ===========================================================================
# Core analytics (A1-A3, J3/J14-style chained joins, sorts)
# ===========================================================================
@register(
    "q1_pricing_summary",
    """
    -- money sums in DECIMAL: double summation order differs across engines
    -- and exceeds 6-dp rounding at large row counts; decimal sums are exact
    -- and order-independent (per-row double->decimal cast is deterministic)
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) AS DOUBLE) AS sum_qty,
           CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS avg_qty,
           CAST(ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: partial aggregation, pushed filter (A1/A7 analog)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # money sums aggregate in DECIMAL (exact, order-independent) so results
    # are reproducible across partitionings AND engines — double partial
    # sums reassociate differently per run/engine and drift past 6-dp
    # rounding at 100 TB row counts
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    qty = F.sum(dec(F.col("l_quantity")))
    disc = F.sum(dec(F.col("l_discount")))
    base = F.sum(dec(F.col("l_extendedprice")))
    disc_price = F.sum(
        dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    )
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(qty.cast("double"), 6).alias("sum_qty"),
            F.round(base.cast("double"), 6).alias("sum_base_price"),
            F.round(disc_price.cast("double"), 6).alias("sum_disc_price"),
            F.round(qty.cast("double") / n, 6).alias("avg_qty"),
            F.round(disc.cast("double") / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "q5_region_revenue",
    """
    SELECT n_name,
           CAST(ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-style 6-way chained equi join (J14 analog); dims broadcast",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            # DECIMAL sum: order-independent across partitionings/engines
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ).cast("double"),
                4,
            ).alias("revenue")
        )
    )


@register(
    "a2_counts_two_granularities",
    """
    SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    doc="A2: counts at multiple granularities via CUBE (grouping sets)",
)
def a2_counts_two_granularities(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


# ===========================================================================
# Interval joins (J1/J2) — the genomic range-join kernel
# ===========================================================================
@register(
    "j1_interval_overlap",
    f"""
    WITH v AS ({_VARIANT_SQL}), g AS ({_GENE_SQL})
    SELECT g.gene_id, CAST(COUNT(*) AS BIGINT) AS n_variants
    FROM v JOIN g ON v.chrom = g.chrom
       AND v.pos <= g.gstop AND v.pos + 1 >= g.gstart
    GROUP BY g.gene_id
    """,
    doc="J1: variant-interval x gene-interval overlap join; gene side broadcast",
)
def j1_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.interval_join import interval_overlap_join

    # Test fixtures are single-row-group parquet (= one scan task no matter
    # the split size); spread the probe side across all cores before the
    # per-row candidate checks.  Properly sized files make this a no-op.
    v = _variant_cols(load(spark, sf_dir, "lineitem")).transform(spread).withColumn(
        "vend", F.col("pos") + 1
    )
    g = _gene_cols(load(spark, sf_dir, "part")).withColumnRenamed("chrom", "gchrom")
    joined = interval_overlap_join(
        v,
        g,
        p_chrom="chrom",
        p_start="pos",
        p_end="vend",
        i_chrom="gchrom",
        i_start="gstart",
        i_end="gstop",
        strategy="binned",
        max_left_span=1,  # vend = pos + 1 by construction
    )
    return joined.groupBy("gene_id").agg(F.count(F.lit(1)).alias("n_variants"))


@register(
    "j2_genic_status",
    f"""
    WITH v AS ({_VARIANT_SQL}), g AS ({_GENE_SQL})
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT CASE WHEN EXISTS (
            SELECT 1 FROM g WHERE g.chrom = v.chrom
              AND v.pos BETWEEN g.gstart AND g.gstop
        ) THEN 'GENIC' ELSE 'INTERGENIC' END AS status
        FROM v
    ) GROUP BY status
    """,
    doc="J2: point-in-interval genic status via left semi probe (GeneCache analog)",
)
def j2_genic_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.interval_join import point_in_interval_join

    v = _variant_cols(load(spark, sf_dir, "lineitem")).transform(spread)
    g = _gene_cols(load(spark, sf_dir, "part")).withColumnRenamed("chrom", "gchrom")
    kw = dict(
        point_chrom="chrom",
        point_pos="pos",
        ivl_chrom="gchrom",
        ivl_start="gstart",
        ivl_end="gstop",
        strategy="binned",
    )
    hit = point_in_interval_join(v, g, how="left_semi", **kw).select(
        F.lit("GENIC").alias("status")
    )
    miss = point_in_interval_join(v, g, how="left_anti", **kw).select(
        F.lit("INTERGENIC").alias("status")
    )
    return hit.unionByName(miss).groupBy("status").agg(F.count(F.lit(1)).alias("n"))


# ===========================================================================
# Dedup / upsert joins (J4, J9, W5, W6, J16, J18)
# ===========================================================================
@register(
    "j4_dedup_upsert_ids",
    f"""
    WITH v AS ({_VARIANT_SQL}),
    incoming AS (
        SELECT DISTINCT chrom, pos, ref, var FROM v
    ),
    existing AS (
        SELECT chrom, pos, ref, var,
               1000000 + ROW_NUMBER() OVER (ORDER BY chrom, pos, ref, var) AS rgd_id
        FROM incoming WHERE pos % 5 = 0
    ),
    matched AS (
        SELECT i.chrom, i.pos, i.ref, i.var, e.rgd_id AS existing_id
        FROM incoming i LEFT JOIN existing e
          ON i.chrom = e.chrom AND i.pos = e.pos
         AND UPPER(i.ref) = UPPER(e.ref) AND UPPER(i.var) = UPPER(e.var)
    )
    SELECT chrom, pos, ref, var,
           CAST(COALESCE(existing_id,
                2000000 + ROW_NUMBER() OVER (
                    PARTITION BY (existing_id IS NULL)
                    ORDER BY chrom, pos, ref, var)) AS BIGINT) AS rgd_id,
           CASE WHEN existing_id IS NULL THEN 'new' ELSE 'reused' END AS id_source
    FROM matched
    """,
    doc="J4: 6-key case-insensitive dedup-upsert with deterministic id allocation "
    "(replaces the Oracle sequence, VariantLoad3.java:519-562)",
)
def j4_dedup_upsert_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.windows import bucketed_row_number

    v = _variant_cols(load(spark, sf_dir, "lineitem"))
    # r14 (VERDICT "Next round" #1): the corpus-sized scan+distinct feeds
    # FOUR consumers inside the checkpointed subtree (join left side,
    # per-chromosome rank window, the rank's bucket-count table, and —
    # via AQE replans — their re-finalizations), and this environment
    # performs no subtree reuse, so at 100 TB the full-corpus distinct
    # replayed 4x per load.  One eager localCheckpoint materializes it
    # once; every consumer reads the checkpointed blocks.  Local-mode
    # cost of the checkpoint write is accepted — the plan shape is the
    # scale story (guide §1.2-1, §5).
    incoming = (
        v.select("chrom", "pos", "ref", "var")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # id allocation via per-chromosome rank + tiny cumulative offsets:
    # identical ids to a global ROW_NUMBER ordered by (chrom,pos,ref,var)
    # (chrom is the leading sort key) but the data-sized sort is hash
    # partitioned on chrom — no single-partition WindowExec at 100 TB.
    existing = bucketed_row_number(
        incoming.filter(F.col("pos") % 5 == 0),
        order_keys=["pos", "ref", "var"],
        bucket="chrom",
    )
    existing = existing.withColumn(
        "rgd_id", F.lit(1000000) + F.col("__rank")
    ).drop("__rank")
    e = existing.select(
        F.col("chrom").alias("e_chrom"),
        F.col("pos").alias("e_pos"),
        F.col("ref").alias("e_ref"),
        F.col("var").alias("e_var"),
        F.col("rgd_id").alias("existing_id"),
    )
    matched = incoming.join(
        e,
        (F.col("chrom") == F.col("e_chrom"))
        & (F.col("pos") == F.col("e_pos"))
        & (F.upper(F.col("ref")) == F.upper(F.col("e_ref")))
        & (F.upper(F.col("var")) == F.upper(F.col("e_var"))),
        "left",
    ).select("chrom", "pos", "ref", "var", "existing_id")
    # matched feeds both branches; lazy localCheckpoint materializes the
    # join once and its blocks are GC-reclaimed (no unpersist bookkeeping).
    matched = matched.localCheckpoint(eager=False)
    reused = (
        matched.filter(F.col("existing_id").isNotNull())
        .withColumn("rgd_id", F.col("existing_id").cast("long"))
        .withColumn("id_source", F.lit("reused"))
    )
    fresh = bucketed_row_number(
        matched.filter(F.col("existing_id").isNull()),
        order_keys=["pos", "ref", "var"],
        bucket="chrom",
    )
    fresh = (
        fresh.withColumn(
            "rgd_id", (F.lit(2000000) + F.col("__rank")).cast("long")
        )
        .drop("__rank")
        .withColumn("id_source", F.lit("new"))
    )
    return reused.unionByName(fresh).select(
        "chrom", "pos", "ref", "var", "rgd_id", "id_source"
    )


@register(
    "j9_anti_join_pairs",
    """
    SELECT CAST(l_orderkey AS BIGINT) AS okey, CAST(l_partkey AS BIGINT) AS pkey
    FROM lineitem
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_orderkey = l_orderkey AND o_orderkey % 7 = 0
    )
    """,
    doc="J9/K4: anti join drops already-present pairs (NOT EXISTS -> left_anti)",
)
def j9_anti_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
    )


@register(
    "w6_first_match_wins",
    """
    SELECT okey, lnum, pkey FROM (
        SELECT l_orderkey AS okey, l_linenumber AS lnum, l_partkey AS pkey,
               ROW_NUMBER() OVER (
                   PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
               ) AS rn
        FROM lineitem
    ) WHERE rn = 1
    """,
    doc="W6/J11: first-match-wins via row_number over a deterministic order "
    "(dbSNP rsId lookup semantics, CommonFormat2Writer.java:150-153)",
)
def w6_first_match_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").alias("lnum"),
            F.col("l_partkey").alias("pkey"),
        )
    )


@register(
    "j16_consume_first_match",
    """
    WITH a AS (
        SELECT l_orderkey AS okey, l_partkey AS pkey,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber, l_partkey) AS rn
        FROM lineitem WHERE l_linestatus = 'F'
    ), b AS (
        SELECT l_orderkey AS okey, l_suppkey AS skey,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber, l_suppkey) AS rn
        FROM lineitem WHERE l_linestatus = 'O'
    )
    SELECT a.okey AS okey, a.pkey AS pkey, b.skey AS skey, CAST(a.rn AS BIGINT) AS pair_rank
    FROM a JOIN b ON a.okey = b.okey AND a.rn = b.rn
    """,
    doc="J16: consume-first-match pairing — rank-n matches rank-n "
    "(PolyphenLoader.java:321-343 semantics, no mutable pool)",
)
def j16_consume_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = (
        li.filter(F.col("l_linestatus") == "F")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
            ),
        )
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_partkey").alias("pkey"),
            "rn",
        )
    )
    b = (
        li.filter(F.col("l_linestatus") == "O")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_suppkey")
            ),
        )
        .select(
            F.col("l_orderkey").alias("b_okey"),
            F.col("l_suppkey").alias("skey"),
            F.col("rn").alias("b_rn"),
        )
    )
    return a.join(
        b, (a.okey == b.b_okey) & (a.rn == b.b_rn)
    ).select("okey", "pkey", "skey", F.col("rn").cast("long").alias("pair_rank"))


@register(
    "j18_union_semi_active",
    """
    WITH unioned AS (
        SELECT o_orderkey AS okey, o_custkey AS ckey, 'primary' AS src
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey AS okey, o_custkey AS ckey, 'ext' AS src
        FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT src, CAST(COUNT(*) AS BIGINT) AS n
    FROM unioned
    WHERE EXISTS (SELECT 1 FROM customer
                  WHERE c_custkey = ckey AND c_acctbal > 0)
    GROUP BY src
    """,
    doc="J18: UNION ALL of variant ∪ variant_ext + ACTIVE semi join",
)
def j18_union_semi_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    u = (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_custkey").alias("ckey"),
            F.lit("primary").alias("src"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 2 == 1).select(
                F.col("o_orderkey").alias("okey"),
                F.col("o_custkey").alias("ckey"),
                F.lit("ext").alias("src"),
            )
        )
    )
    return (
        u.join(c, u.ckey == c.c_custkey, "left_semi")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "w5_dedup_deterministic",
    """
    SELECT okey, pkey, lnum FROM (
        SELECT l_orderkey AS okey, l_partkey AS pkey, l_linenumber AS lnum,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey
                                  ORDER BY l_linenumber DESC) AS rn
        FROM lineitem
    ) WHERE rn = 1
    """,
    doc="W5: within-batch dedup with deterministic survivor "
    "(VariantTranscriptBatch TreeSet desc-order semantics)",
)
def w5_dedup_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey", "l_partkey").orderBy(F.col("l_linenumber").desc())
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_partkey").alias("pkey"),
            F.col("l_linenumber").alias("lnum"),
        )
    )


# ===========================================================================
# Window aggregation (A5/W4) & explode (E1/E2)
# ===========================================================================
@register(
    "a5_alleles_per_position",
    f"""
    WITH v AS ({_VARIANT_SQL})
    SELECT okey, lnum, chrom, pos,
           CAST(COUNT(*) OVER (PARTITION BY chrom, pos) AS BIGINT) AS num_alleles,
           CASE WHEN MAX(CASE WHEN ref = var THEN 1 ELSE 0 END)
                     OVER (PARTITION BY chrom, pos) = 1
                THEN 'Y' ELSE 'N' END AS any_ref_allele
    FROM v
    """,
    doc="A5/W4: per-position allele window count + ref-seen flag "
    "(NumAllelesFixUp without manual sorted-stream state)",
)
def a5_alleles_per_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _variant_cols(load(spark, sf_dir, "lineitem"))
    w = W.partitionBy("chrom", "pos")
    return v.select(
        "okey",
        "lnum",
        "chrom",
        "pos",
        F.count(F.lit(1)).over(w).alias("num_alleles"),
        F.when(
            F.max(F.when(F.col("ref") == F.col("var"), 1).otherwise(0)).over(w) == 1,
            F.lit("Y"),
        )
        .otherwise(F.lit("N"))
        .alias("any_ref_allele"),
    )


@register(
    "e2_explode_alleles",
    """
    SELECT p_partkey AS pkey, UNNEST(string_split(p_name, ' ')) AS token
    FROM part
    """,
    doc="E1/E2: comma/space-packed multi-values exploded to rows",
)
def e2_explode_alleles(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("pkey"),
        F.explode(F.split(F.col("p_name"), " ")).alias("token"),
    )


# ===========================================================================
# Variant-domain scalar derivations under oracle (C1-C4, C12, C14, C15)
# ===========================================================================
@register(
    "c_scalar_derivations",
    f"""
    WITH v AS ({_VARIANT_SQL})
    SELECT okey, lnum, chrom, pos, ref, var,
           CASE WHEN ref = '' THEN 'insertion'
                WHEN var = '' THEN 'deletion' ELSE 'snv' END AS vtype,
           CAST(pos + 1 AS BIGINT) AS end_pos,
           CAST(CASE WHEN cnt_a + cnt_c + cnt_g + cnt_t > 0
                THEN (100 * cnt_a + (cnt_a + cnt_c + cnt_g + cnt_t) // 2)
                     // (cnt_a + cnt_c + cnt_g + cnt_t)
                ELSE 0 END AS INT) AS quality,
           reverse(translate(upper(ref || var), 'ACGT', 'TGCA')) AS revcomp,
           CASE WHEN ref = var THEN 'synonymous' ELSE 'nonsynonymous' END AS syn,
           CASE WHEN abs(length(ref) - length(var)) % 3 <> 0
                THEN 'T' ELSE 'F' END AS fshift
    FROM v
    """,
    doc="C1/C2/C3/C12/C14/C15 scalar chain under oracle checking",
)
def c_scalar_derivations(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _variant_cols(load(spark, sf_dir, "lineitem"))
    total = (
        F.col("cnt_a") + F.col("cnt_c") + F.col("cnt_g") + F.col("cnt_t")
    )
    return v.select(
        "okey",
        "lnum",
        "chrom",
        "pos",
        "ref",
        "var",
        scalar.variant_type(F.col("ref"), F.col("var")).alias("vtype"),
        scalar.end_pos(
            F.col("pos"),
            F.col("ref"),
            scalar.variant_type(F.col("ref"), F.col("var")),
        )
        .cast("long")
        .alias("end_pos"),
        scalar.quality_score(F.col("cnt_a"), total).alias("quality"),
        scalar.reverse_complement(F.concat(F.col("ref"), F.col("var"))).alias(
            "revcomp"
        ),
        scalar.syn_status(F.col("ref"), F.col("var")).alias("syn"),
        scalar.frameshift(F.col("ref"), F.col("var")).alias("fshift"),
    )


# ===========================================================================
# Zygosity under oracle (C10)
# ===========================================================================
_ZYG_PCT = """
    CASE var WHEN 'A' THEN ((cnt_a * 100)::DOUBLE / total::DOUBLE)::FLOAT
             WHEN 'C' THEN ((cnt_c * 100)::DOUBLE / total::DOUBLE)::FLOAT
             WHEN 'G' THEN ((cnt_g * 100)::DOUBLE / total::DOUBLE)::FLOAT
             WHEN 'T' THEN ((cnt_t * 100)::DOUBLE / total::DOUBLE)::FLOAT
             ELSE 0.0::FLOAT END
"""

_PAR_SQL = """
    ((chrom = 'X' AND ((pos BETWEEN 1 AND 2709520)
                    OR (pos BETWEEN 154584238 AND 154913754)))
     OR (chrom = 'Y' AND ((pos BETWEEN 1 AND 2709520)
                       OR (pos BETWEEN 57443438 AND 57772954))))
"""

@register(
    "zygosity_snv",
    f"""
    WITH v0 AS ({_VARIANT_SQL}),
    v AS (
        SELECT *, cnt_a + cnt_c + cnt_g + cnt_t AS total FROM v0
        WHERE cnt_a + cnt_c + cnt_g + cnt_t > 0
    ),
    p AS (
        SELECT okey, lnum, chrom, pos, ref, var, gender,
               cnt_a, cnt_c, cnt_g, cnt_t, total,
               {_ZYG_PCT} AS pct,
               CASE ref WHEN 'A' THEN ((cnt_a * 100)::DOUBLE / total::DOUBLE)::FLOAT
                        WHEN 'C' THEN ((cnt_c * 100)::DOUBLE / total::DOUBLE)::FLOAT
                        WHEN 'G' THEN ((cnt_g * 100)::DOUBLE / total::DOUBLE)::FLOAT
                        WHEN 'T' THEN ((cnt_t * 100)::DOUBLE / total::DOUBLE)::FLOAT
                        ELSE 0.0::FLOAT END AS ref_pct,
               CASE var WHEN 'A' THEN cnt_a WHEN 'C' THEN cnt_c
                        WHEN 'G' THEN cnt_g WHEN 'T' THEN cnt_t
                        ELSE 0 END AS score,
               {_PAR_SQL} AS par
        FROM v
    )
    SELECT okey, lnum, chrom, pos, ref, var,
           CASE WHEN gender IN ('M','P') AND chrom IN ('X','Y') AND NOT par THEN
                CASE WHEN pct = 100 THEN 'hemizygous'
                     WHEN pct >= 85 THEN 'probably hemizygous'
                     ELSE 'possibly hemizygous' END
           ELSE CASE WHEN pct = 100 THEN 'homozygous'
                     WHEN pct >= 85 THEN 'possibly homozygous'
                     ELSE 'heterozygous' END
           END AS zygosity_status,
           CAST(FLOOR(pct::DOUBLE + 0.5) AS INT) AS zygosity_percent_read,
           CASE WHEN pct <= 15 THEN 'Y' ELSE 'N' END AS zygosity_poss_error,
           CASE WHEN ref_pct > 0 THEN 'Y' ELSE 'N' END AS zygosity_ref_allele,
           CAST((CASE WHEN ((cnt_a*100)::DOUBLE/total::DOUBLE)::FLOAT > 0 THEN 1 ELSE 0 END
              + CASE WHEN ((cnt_c*100)::DOUBLE/total::DOUBLE)::FLOAT > 0 THEN 1 ELSE 0 END
              + CASE WHEN ((cnt_g*100)::DOUBLE/total::DOUBLE)::FLOAT > 0 THEN 1 ELSE 0 END
              + CASE WHEN ((cnt_t*100)::DOUBLE/total::DOUBLE)::FLOAT > 0 THEN 1 ELSE 0 END)
             AS INT) AS zygosity_num_allele,
           CASE WHEN gender IN ('M','P') AND chrom IN ('X','Y') AND par
                THEN 'Y' ELSE 'N' END AS zygosity_in_pseudo,
           CAST(score AS INT) AS score
    FROM p WHERE score > 0
    """,
    doc="C10: the full SNV zygosity suite under DuckDB-oracle checking "
    "(float32 pct, PAR build 36, zero-called filter F8)",
)
def zygosity_snv(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _variant_cols(load(spark, sf_dir, "lineitem"))
    v = v.filter(
        (F.col("cnt_a") + F.col("cnt_c") + F.col("cnt_g") + F.col("cnt_t")) > 0
    )
    cols = Z.snv_zygosity_columns(
        F.col("cnt_a"),
        F.col("cnt_c"),
        F.col("cnt_g"),
        F.col("cnt_t"),
        F.col("ref"),
        F.col("var"),
        F.col("chrom"),
        F.col("pos"),
        F.col("gender"),
    )
    out = v.select(
        "okey",
        "lnum",
        "chrom",
        "pos",
        "ref",
        "var",
        *[c.alias(k) for k, c in cols.items() if k != "score"],
        cols["score"].cast("int").alias("score"),
    )
    return out.filter(F.col("score") > 0)


# ===========================================================================
# Text analysis / dedup over documents (training-data ops)
# ===========================================================================
@register(
    "dedup_exact",
    """
    SELECT fp,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM (
        SELECT doc_id,
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
    )
    GROUP BY fp
    """,
    doc="Exact dedup: hash-groupBy on normalized-text fingerprint; "
    "min-id canonical survivor",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("doc_id"), text.fingerprint(F.col("text")).alias("fp")
        )
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "text_quality",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT)
               AS n_tokens,
           CAST(ROUND(length(text)::DOUBLE / GREATEST(
                CASE WHEN trim(text) = '' THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\\s+')) END, 1),
                6) AS DOUBLE) AS mean_token_len,
           CAST(ROUND((length(text) - length(regexp_replace(text,
                '[!-/:-@\\[-`{{-~]', '', 'g')))::DOUBLE
                / GREATEST(length(text), 1), 6) AS DOUBLE) AS punct_ratio,
           CAST(ROUND((length(text) - length(regexp_replace(text,
                '[0-9]', '', 'g')))::DOUBLE
                / GREATEST(length(text), 1), 6) AS DOUBLE) AS digit_ratio
    FROM documents
    """.replace("{{", "{").replace("}}", "}"),
    doc="Text quality scoring: length/token/punct/digit features (JVM-only exprs)",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    q = text.quality_columns(F.col("text"))
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        q["n_tokens"].cast("int").alias("n_tokens"),
        q["mean_token_len"].alias("mean_token_len"),
        q["punct_ratio"].alias("punct_ratio"),
        q["digit_ratio"].alias("digit_ratio"),
    )


@register(
    "token_count_total",
    """
    SELECT lang,
           CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT)
               AS total_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
    """,
    doc="Token counting rollup per language partition",
)
def token_count_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(text.token_count(F.col("text"))).cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# ===========================================================================
# Similarity search over embeddings
# ===========================================================================
@register(
    "ann_cosine_topk",
    """
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qv FROM embeddings
        WHERE vec_id % 50 = 0
    ),
    sims AS (
        SELECT q.qid, e.vec_id AS nid,
               ROUND(list_cosine_similarity(q.qv, e.embedding)::DOUBLE, 6) AS sim
        FROM q CROSS JOIN embeddings e
        WHERE q.qid <> e.vec_id
    )
    SELECT qid, nid, CAST(rk AS BIGINT) AS rk FROM (
        SELECT qid, nid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sim DESC, nid) AS rk
        FROM sims
    ) WHERE rk <= 5
    """,
    doc="Brute-force cosine top-k over embeddings: the exact baseline ANN path "
    "(query side broadcast; JVM-side float math via F.aggregate/zip_with)",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import dot

    # Expression form: per-row norms precomputed, one JVM-side fold per
    # pair.  The numpy-matmul alternative (cosine_topk_pandas) wins for
    # high-dimensional/large corpora but pays Python-worker + Arrow startup
    # that dominates at this corpus size — measured, not guessed.
    e = load(spark, sf_dir, "embeddings").transform(spread)
    nrm = F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        nrm.alias("qn"),
    )
    joined = F.broadcast(q).crossJoin(
        e.select(
            F.col("vec_id").alias("nid"),
            F.col("embedding").alias("nv"),
            nrm.alias("nn"),
        )
    ).filter(F.col("qid") != F.col("nid"))
    sims = joined.select(
        "qid",
        "nid",
        F.round(
            dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6
        ).alias("sim"),
    )
    w = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("qid", "nid", F.col("rk").cast("long").alias("rk"))
    )


# ===========================================================================
# Events (streaming-shaped batch analytics)
# ===========================================================================
@register(
    "events_hourly_rollup",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(value), 6) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Windowed event rollup (batch twin of the Structured Streaming path)",
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


# ===========================================================================
# MinHash / LSH / SimHash dedup under oracle (training-data dedup family)
# ===========================================================================
from .operators import dedup as _dedup  # noqa: E402

_NORM_SQL = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_SHINGLES_SQL = f"""
    CASE WHEN len(string_split({_NORM_SQL}, ' ')) >= 3
         THEN list_sort(list_distinct(list_transform(
              range(0, len(string_split({_NORM_SQL}, ' ')) - 2),
              i -> array_to_string((string_split({_NORM_SQL}, ' '))[i+1:i+3], ' '))))
         ELSE [array_to_string(string_split({_NORM_SQL}, ' '), ' ')] END
"""
_HASHES_SQL = f"""
    list_transform({_SHINGLES_SQL},
                   s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT))
"""


def _minhash_sig_sql(n_hashes: int, source: str = "documents") -> str:
    p = _dedup.MINHASH_PRIME
    sig_exprs = ",\n".join(
        f"CAST(list_min(list_transform(hashes, "
        f"h -> ((h % {p}) * {a} + {b}) % {p})) AS BIGINT) AS sig_{i}"
        for i, (a, b) in enumerate(_dedup._perm_params(n_hashes))
    )
    return f"""
    WITH sh AS (
        SELECT doc_id, {_HASHES_SQL} AS hashes FROM {source}
    )
    SELECT doc_id, {sig_exprs} FROM sh
    """


@register(
    "minhash_signatures",
    _minhash_sig_sql(16),
    doc="MinHash(16) signatures over 3-word shingles; portable md5-derived "
    "hashes so the oracle replays the permutations exactly",
)
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import minhash_signatures

    d = load(spark, sf_dir, "documents")
    out = minhash_signatures(d, n_hashes=16)
    return out.select(
        "doc_id", *[F.col(f"sig_{i}").cast("long").alias(f"sig_{i}") for i in range(16)]
    )


def _near_dup_sql(
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.6,
    hot: int = 1000,
    source: str = "documents",
) -> str:
    rows = n_hashes // bands
    band_selects = "\n UNION ALL\n".join(
        f"SELECT doc_id, {b} AS band_idx, md5(concat_ws('_', "
        + ", ".join(f"CAST(sig_{i} AS VARCHAR)" for i in range(b * rows, (b + 1) * rows))
        + ")) AS band_hash FROM sig"
        for b in range(bands)
    )
    return f"""
    WITH sig AS ({_minhash_sig_sql(n_hashes, source)}),
    banded AS ({band_selects}),
    stats AS (
        SELECT band_idx, band_hash, count(*) AS n, min(doc_id) AS rep
        FROM banded GROUP BY band_idx, band_hash
    ),
    bs AS (
        SELECT b.doc_id, b.band_idx, b.band_hash, s.n, s.rep
        FROM banded b JOIN stats s
          ON b.band_idx = s.band_idx AND b.band_hash = s.band_hash
    ),
    -- hot-band guard (mirrors operators.dedup.near_dup_pairs): buckets
    -- over the threshold pair members with the min-id representative
    -- only (star), cold buckets stay all-pairs
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bs a JOIN bs b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
        WHERE a.doc_id < b.doc_id AND a.n <= {hot}
        UNION
        SELECT rep AS id_a, doc_id AS id_b FROM bs
        WHERE n > {hot} AND doc_id <> rep
    ),
    sh AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM {source})
    SELECT id_a, id_b,
           CAST(ROUND(CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
                THEN len(list_intersect(sa.sh, sb.sh))::DOUBLE
                     / len(list_distinct(list_concat(sa.sh, sb.sh)))
                ELSE 0 END, 6) AS DOUBLE) AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    WHERE CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
          THEN len(list_intersect(sa.sh, sb.sh))::DOUBLE
               / len(list_distinct(list_concat(sa.sh, sb.sh)))
          ELSE 0 END >= {threshold}
    """


@register(
    "near_dup_pairs",
    _near_dup_sql(),
    doc="MinHash-LSH banding (16 hashes, 4 bands) -> candidate pairs -> "
    "exact shingle-Jaccard verification at 0.6",
)
def near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import near_dup_pairs

    # single-row-group fixture: spread docs across cores before the
    # shingle+minhash fold (the CPU-dominant stage of the pipeline)
    d = load(spark, sf_dir, "documents").transform(spread)
    return near_dup_pairs(d, n_hashes=16, bands=4, threshold=0.6)


@register(
    "tfidf_top_terms",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks
        WHERE term <> '' GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS dft FROM tf GROUP BY term),
    n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.tf * ln((nd + 1.0) / (dft + 1.0)), 6) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    rk AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term) AS r
        FROM scored
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, term,
           CAST(tfidf AS DOUBLE) AS tfidf
    FROM rk WHERE r <= 3
    """,
    doc="Top-3 characteristic terms per document by smoothed TF-IDF "
    "(idf = ln((N+1)/(df+1))): token explode -> (doc, term) counts -> "
    "per-term doc frequency -> broadcast corpus count -> per-doc top-k "
    "window; rounded-score + term tiebreak ordering replays identically "
    "in the oracle",
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import tfidf_top_terms

    d = load(spark, sf_dir, "documents")
    return tfidf_top_terms(d, k=3).select(
        F.col("doc_id").cast("long").alias("doc_id"), "term", "tfidf"
    )


def _near_dup_components_sql() -> str:
    """Components over the verified near-dup pairs via a recursive CTE:
    reach(id, comp) holds every (node, id-that-reaches-it); min(comp) per
    node is the component representative — the same min-reachable-id
    contract as operators.dedup.connected_components."""
    return f"""
    WITH RECURSIVE p AS (
        SELECT id_a, id_b FROM ({_near_dup_sql()})
    ),
    e AS (
        SELECT id_a AS src, id_b AS dst FROM p
        UNION
        SELECT id_b AS src, id_a AS dst FROM p
    ),
    reach(id, comp) AS (
        SELECT src, src FROM e
        UNION
        SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id
    )
    SELECT CAST(id AS BIGINT) AS doc_id,
           CAST(min(comp) AS BIGINT) AS component
    FROM reach GROUP BY id
    """


@register(
    "near_dup_components",
    _near_dup_components_sql(),
    doc="Dedup GROUPS from near-dup PAIRS: connected components over the "
    "verified MinHash-LSH pair graph by iterative min-label propagation "
    "(one shuffle join per round, localCheckpoint-bounded lineage, "
    "converges in O(component diameter)); component id = min doc_id, so "
    "keep-one-per-component is deterministic.  The oracle recomputes the "
    "same components with a recursive CTE",
)
def near_dup_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import connected_components, near_dup_pairs

    d = load(spark, sf_dir, "documents").transform(spread)
    pairs = near_dup_pairs(d, n_hashes=16, bands=4, threshold=0.6)
    return connected_components(pairs).select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("comp").cast("long").alias("component"),
    )


@register(
    "corpus_dedup_keeplist",
    f"""
    WITH RECURSIVE fps AS (
        SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents
    ),
    canon AS (SELECT fp, min(doc_id) AS exact_canon FROM fps GROUP BY fp),
    m AS (
        SELECT f.doc_id, c.exact_canon
        FROM fps f JOIN canon c ON f.fp = c.fp
    ),
    exact_kept AS (
        SELECT d.* FROM documents d
        JOIN m ON d.doc_id = m.doc_id AND m.doc_id = m.exact_canon
    ),
    p AS (
        SELECT id_a, id_b
        FROM ({_near_dup_sql(threshold=0.8, source="exact_kept")})
    ),
    e AS (
        SELECT id_a AS src, id_b AS dst FROM p
        UNION
        SELECT id_b AS src, id_a AS dst FROM p
    ),
    reach(id, comp) AS (
        SELECT src, src FROM e
        UNION
        SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id
    ),
    cc AS (
        SELECT id AS exact_canon, min(comp) AS near_canon
        FROM reach GROUP BY id
    )
    SELECT CAST(m.doc_id AS BIGINT) AS doc_id,
           CAST(coalesce(cc.near_canon, m.exact_canon) AS BIGINT)
               AS canonical_id,
           CASE WHEN m.doc_id = coalesce(cc.near_canon, m.exact_canon)
                THEN 'T' ELSE 'F' END AS keep
    FROM m LEFT JOIN cc ON m.exact_canon = cc.exact_canon
    """,
    doc="The CorpusDedup CLI's composed keep-list, end-to-end: exact "
    "dedup on the normalized-text fingerprint, MinHash-LSH near-dup "
    "pairs (threshold 0.8) over the exact SURVIVORS only, connected "
    "components, then chain resolution doc -> exact_canon -> component "
    "min — the subtle step: a byte-duplicate's canon may itself have "
    "merged into a component, so resolution must go through the canon, "
    "not the doc.  The oracle replays the whole chain (recursive-CTE "
    "components) and gates every doc's canonical_id and keep flag",
)
def corpus_dedup_keeplist_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import corpus_keeplist

    d = load(spark, sf_dir, "documents").transform(spread)
    return corpus_keeplist(d, threshold=0.8).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("canonical_id").cast("long").alias("canonical_id"),
        "keep",
    )


@register(
    "near_dup_components_star",
    _near_dup_components_sql(),
    doc="Same dedup-group contract as near_dup_components, computed by "
    "the alternating large-star/small-star algorithm [Kiveris et al., "
    "SoCC'14] — O(log d) rounds instead of O(diameter), the scale path "
    "for long-chain pair graphs; identical recursive-CTE oracle, so the "
    "two algorithms are hash-checked against each other through it",
)
def near_dup_components_star_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import connected_components_star, near_dup_pairs

    d = load(spark, sf_dir, "documents").transform(spread)
    pairs = near_dup_pairs(d, n_hashes=16, bands=4, threshold=0.6)
    return connected_components_star(pairs).select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("comp").cast("long").alias("component"),
    )


_SIMHASH_BITSUM_SQL = ",\n".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(32)
)
_SIMHASH_RECON_SQL = " + ".join(
    f"CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
    for b in range(32)
)

# 64-bit twins (functions.text.shingle_hash64 / simhash(bits=64)): the word
# hash is (hi << 32) | lo over two md5-derived 32-bit halves; DuckDB builds
# the same bit pattern through HUGEINT and wraps to signed BIGINT.  Bit 63
# is the sign bit, so reconstruction adds LONG_MIN for it (exact: the other
# 63 terms sum below 2^63).
_H64_SQL = """CAST(
    CAST(('0x'||substr(md5(word),9,8))::BIGINT AS HUGEINT) * 4294967296
    + ('0x'||substr(md5(word),1,8))::BIGINT
    - CASE WHEN ('0x'||substr(md5(word),9,8))::BIGINT >= 2147483648
           THEN CAST('18446744073709551616' AS HUGEINT)
           ELSE CAST(0 AS HUGEINT) END
    AS BIGINT)"""
_SIMHASH64_BITSUM_SQL = ",\n".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(64)
)
_SIMHASH64_RECON_SQL = (
    " + ".join(
        f"CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(63)
    )
    + f" + CASE WHEN b63 > 0 THEN CAST({-(1 << 63)} AS BIGINT) ELSE 0 END"
)


_DECON_K = 4
_DECON_GRAMS_SQL = f"""
    CASE WHEN len(w) >= {_DECON_K} THEN
        list_transform(range(0, len(w) - {_DECON_K - 1}),
            i -> array_to_string(w[i+1:i+{_DECON_K}], ' '))
    ELSE [] END
"""


@register(
    "decontaminate",
    f"""
    WITH t AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    g AS (
        SELECT doc_id, unnest({_DECON_GRAMS_SQL}) AS gram FROM t
    ),
    bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
    tg AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 50 <> 0),
    hits AS (
        SELECT tg.doc_id, count(*) AS n_shared
        FROM tg JOIN bg ON tg.gram = bg.gram
        GROUP BY tg.doc_id
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(COALESCE(h.n_shared, 0) AS INT) AS n_shared_grams,
           CASE WHEN COALESCE(h.n_shared, 0) > 0 THEN 'T' ELSE 'F' END
               AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
    LEFT JOIN hits h ON h.doc_id = d.doc_id
    """,
    doc=f"Benchmark decontamination: training docs sharing any word "
    f"{_DECON_K}-gram with the held-out benchmark set (doc_id %% 50 = 0 "
    f"here) are flagged with their shared-gram count — the eval-leakage "
    f"filter of corpus curation.  Plan: benchmark grams dedup to a small "
    f"set that BROADCASTS; training grams meet it in a map-side semi "
    f"join BEFORE any shuffle, so only the (rare) contaminated grams "
    f"ever hit the per-doc distinct — the corpus-sized gram table is "
    f"never shuffled, persisted, or deduped wholesale",
)
def decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import word_ngrams

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    # benchmark side: grams of the held-out 2% only — re-scanning that
    # sliver beats materializing a corpus-sized gram cache (a real
    # benchmark set is its own small table; the modulo split is the
    # fixture's stand-in)
    bench = (
        d.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode(word_ngrams(F.col("text"), _DECON_K)).alias("gram"))
        .distinct()
    )
    train = d.filter(F.col("doc_id") % 50 != 0)
    # training side: explode -> broadcast semi join FIRST (map-side, no
    # shuffle of the full gram table), THEN distinct the survivors —
    # semi-join-on-gram and distinct-on-(doc,gram) commute, and only
    # contaminated grams (a tiny fraction by construction) reach the
    # shuffle
    hits = (
        train.select(
            "doc_id",
            F.explode(word_ngrams(F.col("text"), _DECON_K)).alias("gram"),
        )
        .join(F.broadcast(bench), "gram", "left_semi")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return train.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared", F.lit(0)).cast("int").alias("n_shared_grams"),
        F.when(F.coalesce("n_shared", F.lit(0)) > 0, F.lit("T"))
        .otherwise(F.lit("F"))
        .alias("contaminated"),
    )


@register(
    "dup_ngram_ratio",
    f"""
    WITH t AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    g AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3 THEN
                   list_transform(range(0, len(w) - 2),
                       i -> array_to_string(w[i+1:i+3], ' '))
               ELSE [] END AS grams
        FROM t
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
        CAST(len(grams) AS INT) AS n_grams,
        CAST(ROUND(CASE WHEN len(grams) > 0
             THEN 1.0 - len(list_distinct(grams))::DOUBLE / len(grams)
             ELSE 0.0 END, 6) AS DOUBLE) AS dup_ngram_ratio
    FROM g
    """,
    doc="Within-document repetition: duplicate word-trigram fraction "
    "(1 - distinct/total 3-grams, the Gopher-style repetition filter "
    "that catches boilerplate loops line-level signals miss); one "
    "tokenize + transform, all JVM-side, oracle replays the gram walk",
)
def dup_ngram_ratio_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import normalize_text, word_ngrams_from_words

    d = load(spark, sf_dir, "documents")
    # hoist tokenization AND the O(n*k) gram transform behind projection
    # barriers: the gram array is referenced 3x below (size, distinct,
    # ratio) and CollapseProject would otherwise inline the whole
    # transform per reference (measured 3.5s -> the gram walk ran
    # three times per row)
    g = (
        d.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .withColumn(
            "_w",
            F.split(normalize_text(F.coalesce(F.col("text"), F.lit(""))), " "),
        )
        .withColumn("grams", word_ngrams_from_words(F.col("_w"), 3))
    )
    n = F.size("grams")
    return g.select(
        "doc_id",
        n.cast("int").alias("n_grams"),
        F.round(
            F.when(
                n > 0,
                1.0 - F.size(F.array_distinct("grams")).cast("double") / n,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_ngram_ratio"),
    )


# chunking window parameters shared by the doc_chunking and
# sequence_packing queries (Spark call sites AND both oracles — edit here
# only, or the pair desynchronizes into a confusing parity failure)
CHUNK_MAX_TOKENS = 64
CHUNK_OVERLAP = 16
_CHUNK_STRIDE = CHUNK_MAX_TOKENS - CHUNK_OVERLAP
# CTEs t/n/c/w: documents -> (doc_id, chunk_idx, win) token windows.
# Empty text tokenizes to [] (not ['']), mirroring chunk_documents: the
# single emitted chunk reports n_chunk_tokens = 0.
_CHUNK_SQL = f"""
    t AS (
        SELECT doc_id,
               CASE WHEN {_NORM_SQL} = '' THEN []
                    ELSE string_split({_NORM_SQL}, ' ') END AS toks
        FROM documents
    ),
    n AS (SELECT doc_id, toks, len(toks) AS nt FROM t),
    c AS (
        SELECT doc_id, toks,
               unnest(range(0, CAST(1 + ceil(greatest(nt -
                   {CHUNK_MAX_TOKENS}, 0) / {_CHUNK_STRIDE}.0)
                   AS BIGINT))) AS chunk_idx
        FROM n
    ),
    w AS (
        SELECT doc_id, chunk_idx,
               list_slice(toks,
                   CAST(chunk_idx * {_CHUNK_STRIDE} + 1 AS BIGINT),
                   CAST(chunk_idx * {_CHUNK_STRIDE} + {CHUNK_MAX_TOKENS}
                        AS BIGINT)) AS win
        FROM c
    )
"""


@register(
    "sequence_packing",
    f"""
    WITH {_CHUNK_SQL},
    ch AS (
        SELECT doc_id, chunk_idx, len(win) AS n_chunk_tokens,
               doc_id % 8 AS shard
        FROM w
    ),
    st AS (
        SELECT doc_id, chunk_idx, n_chunk_tokens, shard,
            CAST(floor(COALESCE(SUM(n_chunk_tokens) OVER (
                PARTITION BY shard ORDER BY doc_id, chunk_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / 256.0) AS INT) AS bin_id,
            ROW_NUMBER() OVER (
                PARTITION BY shard ORDER BY doc_id, chunk_idx) AS rn
        FROM ch
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(n_chunk_tokens AS INT) AS n_chunk_tokens,
           CAST(shard AS BIGINT) AS shard,
           bin_id,
           CAST(rn - MIN(rn) OVER (PARTITION BY shard, bin_id) + 1 AS INT)
               AS bin_pos
    FROM st
    """,
    doc="Greedy sequence packing: document chunks assigned to fixed-256-"
    "token training bins by exclusive running token count within hash "
    "shards (bin_id = floor(cumsum_excl/budget); last chunk of a bin may "
    "overflow — the standard trade against splitting chunks).  Per-shard "
    "windows, no global sort; the oracle replays cumsum, binning, and "
    "in-bin position exactly",
)
def sequence_packing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import chunk_documents, pack_chunks

    d = load(spark, sf_dir, "documents")
    chunks = chunk_documents(
        d, max_tokens=CHUNK_MAX_TOKENS, overlap=CHUNK_OVERLAP
    ).select("doc_id", "chunk_idx", "n_chunk_tokens")
    out = pack_chunks(
        chunks.withColumn("shard", F.col("doc_id") % 8),
        token_budget=256,
        shard_col="shard",
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("n_chunk_tokens").cast("int").alias("n_chunk_tokens"),
        F.col("shard").cast("long").alias("shard"),
        "bin_id",
        "bin_pos",
    )


@register(
    "doc_chunking",
    f"""
    WITH {_CHUNK_SQL}
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(win) AS INT) AS n_chunk_tokens,
           md5(array_to_string(win, ' ')) AS chunk_fp
    FROM w
    """,
    doc="Document chunking into token-budget windows (64 tokens, overlap "
    "16 -> stride 48) — the context-length packing step of training-data "
    "prep: one tokenize, sequence+explode window index, slice per window, "
    "all JVM-side; the oracle replays windowing and gates the md5 of "
    "every chunk's text",
)
def doc_chunking_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import chunk_documents

    d = load(spark, sf_dir, "documents")
    out = chunk_documents(
        d, max_tokens=CHUNK_MAX_TOKENS, overlap=CHUNK_OVERLAP
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("n_chunk_tokens").cast("int").alias("n_chunk_tokens"),
        F.md5("chunk_text").alias("chunk_fp"),
    )


@register(
    "simhash_near_dup",
    f"""
    WITH w AS (
        SELECT doc_id,
               unnest(list_distinct(string_split({_NORM_SQL}, ' '))) AS word
        FROM documents
    ),
    h AS (
        SELECT doc_id, CAST('0x' || substr(md5(word), 1, 8) AS BIGINT) AS h
        FROM w
    ),
    bits AS (SELECT doc_id, {_SIMHASH_BITSUM_SQL} FROM h GROUP BY doc_id),
    sh AS (
        SELECT doc_id, CAST({_SIMHASH_RECON_SQL} AS BIGINT) AS simhash
        FROM bits
    ),
    b AS (
        SELECT doc_id, simhash, bi, (simhash >> (8 * bi)) & 255 AS bv
        FROM sh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS bi)
    ),
    stats AS (
        SELECT bi, bv, count(*) AS n, min(doc_id) AS rep
        FROM b GROUP BY bi, bv
    ),
    bs AS (
        SELECT b.doc_id, b.bi, b.bv, s.n, s.rep
        FROM b JOIN stats s ON b.bi = s.bi AND b.bv = s.bv
    ),
    -- hot-slice guard mirror (operators.dedup.simhash_near_dup): slices
    -- over the threshold star-pair around the min-id member
    cand AS (
        SELECT a.doc_id AS id_a, c.doc_id AS id_b
        FROM bs a JOIN bs c ON a.bi = c.bi AND a.bv = c.bv
        WHERE a.doc_id < c.doc_id AND a.n <= 1000
        UNION
        SELECT rep AS id_a, doc_id AS id_b FROM bs
        WHERE n > 1000 AND doc_id <> rep
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
    FROM cand
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
    """,
    doc="SimHash near-dup by multi-index hashing: 32-bit hash split into "
    "4 x 8-bit slices, candidates share any slice (equi-join on bounded "
    "keys), hamming <= 3 verify — EXACT for the bound by pigeonhole, not "
    "probabilistic; the short-document complement to MinHash banding",
)
def simhash_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import simhash_near_dup

    d = load(spark, sf_dir, "documents")
    return simhash_near_dup(d).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )


@register(
    "corpus_source_stats",
    f"""
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)
                AS BIGINT) AS n_tokens,
           CAST(ROUND(AVG(length(text)), 6) AS DOUBLE) AS avg_chars,
           CAST(ROUND(1.0 - count(DISTINCT md5({_NORM_SQL}))::DOUBLE
                / count(*), 6) AS DOUBLE) AS dup_ratio
    FROM documents
    GROUP BY source, lang
    """,
    doc="Per-(source, lang) corpus curation rollup over the documents "
    "metadata columns: doc count, whitespace-token total, mean length, "
    "and exact-duplicate ratio (1 - distinct normalized fingerprints / "
    "docs) — the per-provenance dashboard a curation pipeline slices "
    "before choosing mixing weights.  One scan, one groupBy on the "
    "natural low-cardinality key",
)
def corpus_source_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import fingerprint, token_count

    d = load(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("long").alias("n_tokens"),
        F.round(F.avg(F.length("text")), 6).alias("avg_chars"),
        F.round(
            1.0
            - F.count_distinct(fingerprint(F.col("text"))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("dup_ratio"),
    )


# BM25 parameters shared by the Spark query and the oracle — edit together
_BM25_TERMS = ["hash", "join", "vector", "spark", "window"]
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "bm25_topk",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
        FROM documents
    ),
    t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM t
        WHERE term IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
        GROUP BY doc_id, term
    ),
    dft AS (SELECT term, count(*) AS dft FROM tf GROUP BY term),
    per_term AS (
        SELECT tf.doc_id,
               CAST(floor(
                   ln(1.0 + (s.n_docs - d.dft + 0.5) / (d.dft + 0.5))
                   * (tf.tf * ({_BM25_K1} + 1.0))
                   / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                      + {_BM25_B} * dl.dl
                        / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
                   * 1e6 + 0.5) AS BIGINT) AS micro
        FROM tf
        JOIN dft d ON tf.term = d.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats s
    ),
    scored AS (
        -- SUM(BIGINT) is HUGEINT in DuckDB (-> float64 in pandas);
        -- wrap back to BIGINT to hash like Spark's long
        SELECT doc_id, CAST(SUM(micro) AS BIGINT) AS bm25_micro
        FROM per_term GROUP BY doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, bm25_micro,
           CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT doc_id, bm25_micro,
               ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id) AS rk
        FROM scored
    ) WHERE rk <= 20
    """,
    doc="BM25 ranked retrieval (Robertson/Spärck Jones) of the top-20 "
    f"documents for a fixed {len(_BM25_TERMS)}-term query — the "
    "relevance-ranking complement of tfidf_top_terms.  Per-term scores "
    "are rounded to integer micro-units BEFORE the cross-term sum, so "
    "the doc score is an exact BIGINT sum identical in any summation "
    "order — the float-determinism idiom that lets the oracle replay "
    "ranking exactly.  Plan: one tokenize feeds dl and the IN-list-"
    "filtered tf; N/avgdl is a 1-row broadcast",
)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import bm25_scores

    d = load(spark, sf_dir, "documents")
    scored = bm25_scores(d, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B)
    # top-k via orderBy+limit -> TakeOrderedAndProject (per-partition heap,
    # k-row driver merge), then the rank is minted over the 20 survivors
    # with the repo's non-foldable zero partition key — same idiom as
    # q3_shipping_priority_topk: no data-sized global-window sort
    top = scored.orderBy(
        F.col("bm25_micro").desc(), F.col("doc_id")
    ).limit(20)
    w = W.partitionBy(F.col("bm25_micro") * F.lit(0)).orderBy(
        F.col("bm25_micro").desc(), F.col("doc_id")
    )
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "bm25_micro",
            F.col("rk").cast("long").alias("rk"),
        )
    )


# Feature-hashing embedding oracle helpers: dense 64-dim count vectors as
# 64 generated SUM(CASE) columns; dot products / norms as explicit BIGINT
# term sums — exact integer arithmetic, so sqrt/divide/round replay
# bit-identically against Spark's double fold.
_HE_DIM = 64
_HE_SIGN_BIT = 16
_HE_VEC_SQL = ",\n".join(
    f"SUM(CASE WHEN idx = {i} THEN v ELSE 0 END) AS c{i}"
    for i in range(_HE_DIM)
)
_HE_DOT_SQL = " + ".join(f"q.c{i}*e.c{i}" for i in range(_HE_DIM))
_HE_QQ_SQL = " + ".join(f"q.c{i}*q.c{i}" for i in range(_HE_DIM))
_HE_NN_SQL = " + ".join(f"e.c{i}*e.c{i}" for i in range(_HE_DIM))


@register(
    "emb_hashing_topk",
    f"""
    WITH w AS (
        SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS word
        FROM documents
    ),
    t AS (
        SELECT doc_id, ('0x'||substr(md5(word),1,8))::BIGINT AS h
        FROM w WHERE word <> ''
    ),
    e0 AS (
        SELECT doc_id, h % {_HE_DIM} AS idx,
               CASE WHEN (h >> {_HE_SIGN_BIT}) & 1 = 1 THEN 1 ELSE -1 END AS s
        FROM t
    ),
    g AS (SELECT doc_id, idx, SUM(s) AS v FROM e0 GROUP BY doc_id, idx),
    vec AS (SELECT doc_id, {_HE_VEC_SQL} FROM g GROUP BY doc_id),
    q AS (SELECT * FROM vec WHERE doc_id % 50 = 0),
    sims AS (
        SELECT q.doc_id AS qid, e.doc_id AS nid,
               ROUND(CAST({_HE_DOT_SQL} AS DOUBLE)
                     / (sqrt(CAST({_HE_QQ_SQL} AS DOUBLE))
                        * sqrt(CAST({_HE_NN_SQL} AS DOUBLE))), 6) AS sim
        FROM q CROSS JOIN vec e
        WHERE q.doc_id <> e.doc_id
          AND ({_HE_QQ_SQL}) > 0 AND ({_HE_NN_SQL}) > 0
    )
    SELECT qid, nid, CAST(rk AS BIGINT) AS rk FROM (
        SELECT qid, nid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sim DESC, nid) AS rk
        FROM sims
    ) WHERE rk <= 5
    """,
    doc="Text-driven ANN end-to-end: feature-hashing (hashing-trick) "
    f"{_HE_DIM}-dim document embeddings — ±1 per token occurrence into "
    "bucket shingle_hash(word) %% dim, sign from a hash bit; no model "
    "runtime — then exact cosine top-5 per query doc.  Embeddings stay "
    "integer-valued (cosine is scale-invariant) so every dot product and "
    "norm is exact and the oracle replays the full text→vector→rank "
    "path bit-identically",
)
def emb_hashing_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import dot, hash_embed

    emb = hash_embed(
        load(spark, sf_dir, "documents"), dim=_HE_DIM, sign_bit=_HE_SIGN_BIT
    ).transform(spread)
    nrm2 = dot(F.col("embedding"), F.col("embedding"))
    q = emb.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("qid"),
        F.col("embedding").alias("qv"),
        nrm2.alias("qq"),
    )
    joined = (
        F.broadcast(q)
        .crossJoin(
            emb.select(
                F.col("doc_id").alias("nid"),
                F.col("embedding").alias("nv"),
                nrm2.alias("nn"),
            )
        )
        .filter(
            (F.col("qid") != F.col("nid"))
            & (F.col("qq") > 0)
            & (F.col("nn") > 0)
        )
    )
    sims = joined.select(
        "qid",
        "nid",
        F.round(
            dot(F.col("qv"), F.col("nv"))
            / (F.sqrt(F.col("qq")) * F.sqrt(F.col("nn"))),
            6,
        ).alias("sim"),
    )
    w = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("qid", "nid", F.col("rk").cast("long").alias("rk"))
    )


@register(
    "simhash64_near_dup",
    f"""
    WITH w AS (
        SELECT doc_id,
               unnest(list_distinct(string_split({_NORM_SQL}, ' '))) AS word
        FROM documents
    ),
    h AS (SELECT doc_id, {_H64_SQL} AS h FROM w),
    bits AS (SELECT doc_id, {_SIMHASH64_BITSUM_SQL} FROM h GROUP BY doc_id),
    sh AS (
        SELECT doc_id, CAST({_SIMHASH64_RECON_SQL} AS BIGINT) AS simhash
        FROM bits
    ),
    b AS (
        SELECT doc_id, simhash, bi, (simhash >> (16 * bi)) & 65535 AS bv
        FROM sh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS bi)
    ),
    stats AS (
        SELECT bi, bv, count(*) AS n, min(doc_id) AS rep
        FROM b GROUP BY bi, bv
    ),
    bs AS (
        SELECT b.doc_id, b.bi, b.bv, s.n, s.rep
        FROM b JOIN stats s ON b.bi = s.bi AND b.bv = s.bv
    ),
    cand AS (
        SELECT a.doc_id AS id_a, c.doc_id AS id_b
        FROM bs a JOIN bs c ON a.bi = c.bi AND a.bv = c.bv
        WHERE a.doc_id < c.doc_id AND a.n <= 1000
        UNION
        SELECT rep AS id_a, doc_id AS id_b FROM bs
        WHERE n > 1000 AND doc_id <> rep
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
    FROM cand
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
    """,
    doc="64-bit SimHash near-dup — the large-shard scale path of "
    "simhash_near_dup: the 64-bit word hash (shingle_hash64) makes all "
    "four 16-bit slices carry real entropy (65 536 buckets each vs 256 "
    "at 32/4), collapsing candidate volume ~256x for the same corpus; "
    "hamming <= 3 verify on the full 64-bit hashes, recall exact by "
    "pigeonhole.  The oracle replays the HUGEINT-wrapped hash, the "
    "sign-bit reconstruction, slicing, hot-slice guard, and verify",
)
def simhash64_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import simhash_near_dup

    d = load(spark, sf_dir, "documents")
    return simhash_near_dup(d, bits=64, n_bands=4).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )


@register(
    "simhash_docs",
    f"""
    WITH w AS (
        SELECT doc_id,
               unnest(list_distinct(string_split({_NORM_SQL}, ' '))) AS word
        FROM documents
    ),
    h AS (
        SELECT doc_id, CAST('0x' || substr(md5(word), 1, 8) AS BIGINT) AS h
        FROM w
    ),
    bits AS (SELECT doc_id, {_SIMHASH_BITSUM_SQL} FROM h GROUP BY doc_id)
    SELECT doc_id, CAST({_SIMHASH_RECON_SQL} AS BIGINT) AS simhash FROM bits
    """,
    doc="32-bit SimHash per document over distinct words (portable bit math)",
)
def simhash_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import simhash

    d = load(spark, sf_dir, "documents")
    return simhash(d).select("doc_id", F.col("simhash").cast("long").alias("simhash"))


# ===========================================================================
# Wave 3: rollups, translation oracle, lang-id, sessionization, S7 windows
# ===========================================================================
@register(
    "a3_rollup_counts",
    f"""
    WITH v AS ({_VARIANT_SQL})
    SELECT COALESCE(chrom, 'ALL') AS chrom, CAST(COUNT(*) AS BIGINT) AS n
    FROM v GROUP BY ROLLUP (chrom)
    """,
    doc="A3: per-chromosome counts + grand total via ROLLUP",
)
def a3_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _variant_cols(load(spark, sf_dir, "lineitem"))
    return v.rollup("chrom").agg(F.count(F.lit(1)).alias("n")).select(
        F.coalesce(F.col("chrom"), F.lit("ALL")).alias("chrom"), "n"
    )


def _translate_case_sql() -> str:
    """Codon->AA as SQL generated from the SAME table the Spark expression
    uses — a translation oracle with zero hand-maintained cases."""
    from .functions import translate as TR

    duo = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in TR._TWO_BASE.items()
    )
    tri = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in TR._THREE_BASE.items()
    )
    return f"""
        array_to_string(list_transform(range(0, length(dna) // 3), i ->
            CASE substr(dna, i*3+1, 2) {duo}
                 ELSE CASE substr(dna, i*3+1, 3) {tri} ELSE 'X' END
            END), '')
    """


@register(
    "c13_translate",
    f"""
    WITH d AS (
        SELECT doc_id,
               upper(substr(regexp_replace(md5(text), '[^acgt]', '', 'g'), 1, 24))
                   AS dna
        FROM documents
    )
    SELECT doc_id, dna,
           COALESCE({_translate_case_sql()}, '') AS protein
    FROM d
    """,
    doc="C13: JVM-side codon translation vs a generated SQL oracle over "
    "md5-derived DNA (both sides share one codon table)",
)
def c13_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.translate import translate_dna

    d = load(spark, sf_dir, "documents")
    dna = F.upper(
        F.substring(F.regexp_replace(F.md5(F.col("text")), "[^acgt]", ""), 1, 24)
    )
    return d.select(
        "doc_id", dna.alias("dna"), translate_dna(dna).alias("protein")
    )


def _lang_id_sql() -> str:
    from .functions.text import LANG_MARKERS

    score_exprs = {}
    for lang, wordlist in LANG_MARKERS.items():
        parts = " + ".join(
            f"len(list_filter(w, x -> x = '{wd}'))" for wd in wordlist
        )
        score_exprs[lang] = f"CAST({parts} AS BIGINT)"
    # argmax with ties to earlier language name, 'und' when all zero
    langs = sorted(LANG_MARKERS)
    best = "'und'"
    for lang in langs:
        others = [score_exprs[o] for o in langs if o < lang]
        cond_ge = " AND ".join(
            [f"{score_exprs[lang]} > {o}" for o in others]
            + [
                f"{score_exprs[lang]} >= {score_exprs[o]}"
                for o in langs
                if o > lang
            ]
        ) or "TRUE"
        best = (
            f"CASE WHEN {score_exprs[lang]} > 0 AND ({cond_ge}) "
            f"THEN '{lang}' ELSE {best} END"
        )
    cols = ", ".join(f"{score_exprs[l]} AS score_{l}" for l in langs)
    return f"""
    WITH d AS (
        SELECT doc_id,
               CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = ''
                    THEN [] 
                    ELSE string_split(trim(regexp_replace(lower(text),
                         '[^a-z0-9]+', ' ', 'g')), ' ') END AS w
        FROM documents
    )
    SELECT doc_id, {cols}, {best} AS lang_pred FROM d
    """


@register(
    "lang_id_scores",
    _lang_id_sql(),
    doc="Language-ID by marker-word scoring with deterministic argmax "
    "(both sides share the marker table)",
)
def lang_id_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .transform(spread)
        # Hoist the tokenization: one regexp_replace+split per row.  The
        # projection boundary survives Catalyst's CollapseProject because
        # `_w` is non-cheap and referenced by every score — without it,
        # each language score would re-tokenize the document.
        .withColumn("_w", text.words(F.col("text")))
    )
    scores = text.lang_scores(F.col("text"), words_col=F.col("_w"))
    return d.select(
        "doc_id",
        *[scores[f"score_{l}"].alias(f"score_{l}") for l in sorted(text.LANG_MARKERS)],
        text.lang_id_from_scores(scores).alias("lang_pred"),
    )


@register(
    "events_sessionize",
    """
    WITH e AS (
        SELECT user_id, ts, value,
               CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                         OR LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    s AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM e
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(value), 6) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, session_id
    """,
    doc="W4-style gap sessionization: lag + running sum of session breaks "
    "(30-minute gap), the windowed form of the sorted-stream flush loop",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    df = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            W.partitionBy("user_id").orderBy("ts").rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
        ),
    )
    return df.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


@register(
    "s7_running_state_scan",
    """
    WITH ranked AS (
        SELECT l_orderkey AS okey, l_linenumber AS lnum, l_partkey, l_suppkey,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber, l_partkey, l_suppkey)
                   AS rn
        FROM lineitem
    ),
    lines AS (
        SELECT okey, lnum, rn,
               CASE WHEN rn = 1 THEN l_partkey END AS decl_start,
               CASE WHEN rn = 1 THEN 1 + l_suppkey % 3 END AS decl_step
        FROM ranked
    ),
    filled AS (
        SELECT okey, lnum, rn,
               LAST_VALUE(decl_start IGNORE NULLS) OVER
                   (PARTITION BY okey ORDER BY rn
                    ROWS UNBOUNDED PRECEDING) AS start,
               LAST_VALUE(decl_step IGNORE NULLS) OVER
                   (PARTITION BY okey ORDER BY rn
                    ROWS UNBOUNDED PRECEDING) AS step
        FROM lines
    )
    SELECT okey, lnum, CAST(start + step * (rn - 1) AS BIGINT) AS position
    FROM filled
    """,
    doc="S7: wiggle-style running-state reconstruction — the first row per "
    "group (deterministic rank) is the declaration setting (start, step); "
    "positions via last-non-null window + rank, no sorted-stream loop",
)
def s7_running_state_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    wr = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    ranked = li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lnum"),
        "l_partkey",
        "l_suppkey",
        F.row_number().over(wr).alias("rn"),
    )
    decl_start = F.when(F.col("rn") == 1, F.col("l_partkey"))
    decl_step = F.when(F.col("rn") == 1, 1 + F.col("l_suppkey") % 3)
    wf = W.partitionBy("okey").orderBy("rn").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return ranked.select(
        "okey",
        "lnum",
        (
            F.last(decl_start, ignorenulls=True).over(wf)
            + F.last(decl_step, ignorenulls=True).over(wf) * (F.col("rn") - 1)
        ).cast("long").alias("position"),
    )


@register(
    "j5_null_tolerant_dedup",
    """
    WITH o AS (
        SELECT o_orderkey AS okey, o_custkey AS ckey,
               NULLIF(o_orderstatus, 'O') AS status,
               NULLIF(o_orderpriority, '3-MEDIUM') AS prio
        FROM orders
    )
    SELECT status, prio,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(okey) AS BIGINT) AS first_okey
    FROM o GROUP BY status, prio
    """,
    doc="J5: null-tolerant (eqNullSafe-style) grouping/dedup — NULL keys "
    "form their own groups exactly as the ClinVar dedup treats null alleles",
)
def j5_null_tolerant_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            F.col("o_orderkey").alias("okey"),
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status"),
            F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("prio"),
        )
        .groupBy("status", "prio")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("okey").alias("first_okey"),
        )
    )


@register(
    "c21_vcf_render",
    f"""
    WITH v AS ({_VARIANT_SQL})
    SELECT okey, lnum,
           chrom || chr(9) || CAST(pos AS VARCHAR) || chr(9) || '.' || chr(9)
                 || ref || chr(9) || var || chr(9) || '.' || chr(9) || '.'
                 || chr(9) || 'DP=' || CAST(cnt_a + cnt_c + cnt_g + cnt_t AS VARCHAR)
               AS vcf_line
    FROM v
    """,
    doc="C21/K2: VCF data-line rendering as tab-joined string build",
)
def c21_vcf_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _variant_cols(load(spark, sf_dir, "lineitem"))
    dp = F.col("cnt_a") + F.col("cnt_c") + F.col("cnt_g") + F.col("cnt_t")
    return v.select(
        "okey",
        "lnum",
        F.concat_ws(
            "\t",
            F.col("chrom"),
            F.col("pos").cast("string"),
            F.lit("."),
            F.col("ref"),
            F.col("var"),
            F.lit("."),
            F.lit("."),
            F.concat(F.lit("DP="), dp.cast("string")),
        ).alias("vcf_line"),
    )


# Wave-4/5 registrations (must come last: shares this module registry)
from . import queries_ext  # noqa: E402,F401
from . import queries_corpus  # noqa: E402,F401
from . import queries_events  # noqa: E402,F401
from . import queries_tpch  # noqa: E402,F401
from . import queries_wave6  # noqa: E402,F401
from . import queries_wave7  # noqa: E402,F401
from . import queries_wave8  # noqa: E402,F401
from . import queries_wave9  # noqa: E402,F401
from . import queries_wave10  # noqa: E402,F401
from . import queries_wave11  # noqa: E402,F401
from . import queries_wave12  # noqa: E402,F401
