"""Embedding clustering for corpus curation: deterministic integer
k-means (Lloyd's algorithm, fixed iterations) and SemDeDup-style
within-cluster semantic dedup [Abbas et al. 2023 — public].

Exactness design: vectors are quantized to integer milli-units
(floor(x*1000)) so every distance is exact BIGINT arithmetic, centroid
updates are floor-of-mean integers, and tie-breaks are by smallest
cluster id — the whole fit is bit-reproducible, engine-portable, and a
DuckDB oracle can replay it CTE-by-CTE.  (Float k-means converges to the
same clusters but its argmin ties are not portable.)

Scale: the per-iteration work is one assignment pass (k distance
expressions, pure JVM codegen — centroids ride into the plan as
literals, the broadcast-of-model pattern) and one centroid update
(explode to (cluster, dim), one groupBy, k*dim tiny rows to the driver —
model state, not data).  Cluster count k is the model size; data never
cross-joins.  SemDeDup's candidate pairs are an equi-join on the cluster
id — the clustering is exactly what bounds the O(n^2) pair blowup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def int_vectors(
    vec_col: Column, scale: int = 1000
) -> Column:
    """Quantize a float vector to exact integer milli-units:
    floor(double(x) * scale) per element.  float->double widening is
    exact, so both engines produce identical longs."""
    return F.transform(
        vec_col,
        lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
    )


def _dist2(qv: Column, centroid: list[int]) -> Column:
    c = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with(qv, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[tuple[int, list[int]]],
    qv_col: str = "qv",
) -> DataFrame:
    """Adds (cluster, dist_sq): argmin exact squared distance over the
    centroid list, ties to the SMALLEST cluster id (centroids must be
    sorted by id; array_position returns the first minimum)."""
    cents = sorted(centroids)
    dists = F.array(*[_dist2(F.col(qv_col), c) for _, c in cents])
    pos = F.array_position(dists, F.array_min(dists)).cast("int")
    cl_arr = F.array(*[F.lit(int(cl)) for cl, _ in cents])
    return df.withColumn("dist_sq", F.array_min(dists)).withColumn(
        "cluster", F.element_at(cl_arr, pos)
    )


def kmeans_fit_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Deterministic Lloyd's k-means over integer-quantized vectors:
    seeds = the k rows with smallest id, exactly ``iters`` centroid
    updates, output = the final assignment (id, qv, cluster, dist_sq).

    Centroid state (k*dim ints) is collected to the driver each round —
    that is the MODEL, not the data, the same legitimacy class as a
    broadcast join build side.  Empty clusters simply drop out (their id
    never re-seeds), matching the SQL oracle's semantics.
    """
    base = df.select(
        F.col(id_col), int_vectors(F.col(vec_col), scale).alias("qv")
    ).persist()
    seed_rows = base.orderBy(id_col).limit(k).collect()
    cents = [(i, list(r["qv"])) for i, r in enumerate(seed_rows)]
    for _ in range(iters):
        assigned = assign_clusters(base, cents)
        upd = (
            assigned.select("cluster", F.posexplode("qv").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cl: dict[int, dict[int, int]] = {}
        for r in upd:
            # floor-of-mean in exact arithmetic: Python // floors toward
            # -inf, identical to floor(sum::double/count) in the oracle
            by_cl.setdefault(r["cluster"], {})[r["dim"]] = r["s"] // r["n"]
        dim = len(cents[0][1])
        cents = [
            (cl, [dims[d] for d in range(dim)])
            for cl, dims in sorted(by_cl.items())
        ]
    return assign_clusters(base, cents)


def semdedup_pairs(
    assigned: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    qv_col: str = "qv",
    round_dp: int = 6,
) -> DataFrame:
    """SemDeDup [Abbas et al. 2023]: semantic near-duplicate pairs found
    ONLY within a k-means cluster — the clustering bounds candidate
    generation to an equi-join on the cluster id, trading recall for
    never materializing the global O(n^2) pair space (pairs whose
    members land in different clusters are missed by design; raise k to
    shrink clusters, lower it to raise recall).

    Cosine over the integer qv vectors: dot/norms are exact longs (so
    any summation order agrees), only the final divide/sqrt/round is
    float — engine-portable.  Output: (cluster, id_a, id_b, sim).
    """
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    side = lambda tag: assigned.select(
        F.col("cluster"),
        F.col(id_col).alias(f"id_{tag}"),
        F.col(qv_col).alias(f"qv_{tag}"),
        dot(F.col(qv_col), F.col(qv_col)).alias(f"nn_{tag}"),
    )
    pairs = (
        side("a")
        .join(side("b"), "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
    )
    sim = F.round(
        dot(F.col("qv_a"), F.col("qv_b")).cast("double")
        / (F.sqrt(F.col("nn_a")) * F.sqrt(F.col("nn_b"))),
        round_dp,
    )
    return (
        pairs.withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("cluster", "id_a", "id_b", "sim")
    )
