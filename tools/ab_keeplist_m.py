"""Interleaved A/B for corpus_dedup_keeplist (VERDICT r13 #6): is the
`m` persist (exact-canon map, consumed twice) a win or a cost at sf0.1,
and how does the query's time split construct vs execute?

Protocol: R interleaved repeats, each repeat runs BOTH variants
back-to-back (A = shipped operator with `m` persisted, B = identical
plan without the persist) in alternating order, fresh plan + clearCache
per run, noop sink, construct/execute timed separately.  Interleaving
means a host slow-phase lands on both variants equally (VERDICT #5's
point about this host's 0.16x-6x identical-code swings).

Usage: PYTHONPATH=/root/repo python tools/ab_keeplist_m.py [--repeats N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window as W  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def keeplist_m_nopersist(docs, threshold=0.8, text_col="text", id_col="doc_id"):
    """corpus_keeplist with the ONE change under test: `m` not persisted.
    Everything else (near_dup_pairs' internal persists, components'
    checkpoints) is the shared shipped code."""
    from variant_load_pipeline_spark.functions.text import normalize_text
    from variant_load_pipeline_spark.operators.dedup import (
        connected_components,
        near_dup_pairs,
    )

    fps = docs.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fp")
    ).filter(F.col("fp").isNotNull())
    m = fps.select(
        F.col(id_col),
        F.min(id_col).over(W.partitionBy("fp")).alias("exact_canon"),
    )
    exact_kept = docs.join(
        m.filter(F.col(id_col) == F.col("exact_canon")).select(id_col), id_col
    )
    pairs = near_dup_pairs(
        exact_kept, text_col=text_col, id_col=id_col, threshold=threshold
    ).select("id_a", "id_b")
    comp = connected_components(pairs).select(
        F.col("id").alias("exact_canon"), F.col("comp").alias("near_canon")
    )
    return (
        m.join(comp, "exact_canon", "left")
        .select(
            id_col,
            F.coalesce("near_canon", "exact_canon").alias("canonical_id"),
        )
        .select(
            id_col,
            "canonical_id",
            F.when(F.col(id_col) == F.col("canonical_id"), F.lit("T"))
            .otherwise(F.lit("F"))
            .alias("keep"),
        )
    )


def main() -> None:
    repeats = 5
    args = sys.argv[1:]
    if "--repeats" in args:
        repeats = int(args[args.index("--repeats") + 1])

    from variant_load_pipeline_spark.operators.dedup import corpus_keeplist
    from variant_load_pipeline_spark.queries import load
    from variant_load_pipeline_spark.session import get_spark

    spark = get_spark(app_name="vlp-ab-keeplist")

    def build(variant: str):
        d = load(spark, SF, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
        fn = corpus_keeplist if variant == "A" else keeplist_m_nopersist
        return fn(d, threshold=0.8).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("canonical_id").cast("long").alias("canonical_id"),
            "keep",
        )

    # warm-up (JVM/codegen), not recorded
    spark.sparkContext.setJobDescription("ab warmup")
    build("A").write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    res: dict[str, dict[str, list[float]]] = {
        v: {"construct": [], "execute": []} for v in ("A", "B")
    }
    for r in range(repeats):
        order = ("A", "B") if r % 2 == 0 else ("B", "A")
        for v in order:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"keeplist {v} rep{r}")
            t0 = time.time()
            df = build(v)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            res[v]["construct"].append(round(t1 - t0, 3))
            res[v]["execute"].append(round(t2 - t1, 3))
            print(
                f"rep{r} {v}: construct={t1-t0:.2f}s execute={t2-t1:.2f}s",
                flush=True,
            )
    for v in ("A", "B"):
        c = res[v]["construct"]
        e = res[v]["execute"]
        tot = [a + b for a, b in zip(c, e)]
        print(
            f"{v} ({'persist m' if v == 'A' else 'no persist'}): "
            f"construct med={statistics.median(c):.2f} {c} | "
            f"execute med={statistics.median(e):.2f} {e} | "
            f"total med={statistics.median(tot):.2f} min={min(tot):.2f}"
        )


if __name__ == "__main__":
    main()
