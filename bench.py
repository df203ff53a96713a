"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion via a `noop`-format write, which
materializes EVERY column of EVERY row (unlike count(), which lets Catalyst
prune unreferenced projections down to an empty-schema FileScan — under
count(), a pure-projection query like c13_translate measured parquet
row-counting, not codon translation).  Results are not collected to the
driver.

Each query runs REPEATS times and reports the per-query MEDIAN (total =
sum of medians), so single-run noise (~±30% observed round-over-round)
can't masquerade as a regression.  The plan is rebuilt from scratch every
repeat — re-executing one DataFrame instance would skip already-computed
shuffle map stages and time only the tail.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: one per operator family; keep stable across rounds
HEADLINE = [
    "q1_pricing_summary",
    "q5_region_revenue",
    "j1_interval_overlap",
    "j4_dedup_upsert_ids",
    "zygosity_snv",
    "a5_alleles_per_position",
    "w6_first_match_wins",
    "dedup_exact",
    "near_dup_pairs",
    "ann_cosine_topk",
    "c13_translate",
    "events_hourly_rollup",
    "events_sessionize",
    "j6_j8_transcript_features",
    "emb_near_dup_cosine",
    "ann_ivf_topk",
    "doc_fingerprint_rolling",
    "q3_shipping_priority_topk",
    "q6_forecast_revenue",
    "a8_feature_counts_cube",
    "s3_s4_vcf_field_parse",
    "bpe_token_counts",
    "lang_id_scores",
    "p29_annotate_chunked",
]


def main() -> None:
    from variant_load_pipeline_spark import queries as Q
    from variant_load_pipeline_spark.session import get_spark

    spark = get_spark(app_name="vlp-bench")
    reg = Q.registry()
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    def materialize(df) -> None:
        # noop sink: full pipeline + all output columns execute, nothing is
        # persisted or collected.  Pruning-proof, unlike count().
        df.write.format("noop").mode("overwrite").save()

    # untimed warm-up: JVM/codegen/parquet-footer costs land here, not on
    # whichever query happens to run first
    materialize(reg["q6_forecast_revenue"].spark_fn(spark, SF_DIR))

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in reg:
            continue
        runs = []
        for _ in range(repeats):
            # fresh plan per repeat: same-instance re-execution would skip
            # completed shuffle map stages and under-time the query
            df = reg[name].spark_fn(spark, SF_DIR)
            t0 = time.time()
            materialize(df)
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "repeats": repeats,
                "aggregation": "median",
            }
        )
    )


if __name__ == "__main__":
    main()
