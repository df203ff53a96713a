"""Generate PLANS.md — formatted physical plans for a representative
query per operator family, with the scale-relevant markers called out.

This is the plan-shape evidence the plan-audit tests assert,
materialized for human review: filter pushdown into the parquet scan,
pruned ReadSchema, broadcast-vs-shuffle join choice, window partition
keys, and the absence of cartesian products / Python evaluators.

Usage:  PYTHONPATH=/root/repo python tools/gen_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
)

# one per family: (query, what the plan should show)
SHOWCASE = [
    ("q1_pricing_summary",
     "pushdown + pruning: every predicate in PushedFilters, ReadSchema "
     "carries only referenced columns, single partial+final agg"),
    ("q3_shipping_priority_topk",
     "top-k without a global sort: TakeOrderedAndProject + broadcast "
     "filtered dimension"),
    ("j1_interval_overlap",
     "interval join as binned BroadcastHashJoin — no nested loop over "
     "the range predicate"),
    ("j14_five_way_missense",
     "star join: every dimension side broadcast, fact scanned once"),
    ("near_dup_pairs",
     "LSH banding: candidate pairs from an equi join on (band_idx, "
     "band_hash), never an all-pairs product"),
    ("ann_ivf_persisted_topk",
     "persisted index probe: PartitionFilters prune the invlist "
     "partitions at the scan"),
    ("events_asof_join",
     "as-of join as union + window sweep: zero join nodes"),
    ("bucketed_join_revenue",
     "bucketed SMB join: zero Exchange above the bucketed scans"),
    ("dsir_importance_weights",
     "token-stream shape: explode, broadcast 256-row ratio table, "
     "one groupBy on doc"),
    ("quality_lr_train",
     "distributed GD: broadcast weight joins per step, shuffles bounded "
     "by the nonzero-feature count"),
    ("events_sessionize",
     "sessionization: user-partitioned windows only (no partition-less "
     "specs)"),
    ("c13_translate",
     "codon translation as a generated JVM CASE expression — no Python "
     "evaluator in the plan"),
    ("rerank_quality_topk",
     "retrieve -> rerank: PartitionFilters on the probed IVF lists, "
     "broadcast 20-row candidate joins, GD scalar joins on the "
     "allowlist — the corpus never meets the expensive model"),
    ("orc_roundtrip_scan",
     "second columnar format: the lang filter lands in the ORC reload "
     "scan's PartitionFilters — pruning is format-independent"),
    ("contrastive_triplets_ivf",
     "batch IVF probe: per-anchor list choice is codegen array algebra "
     "over centroid literals (no join node for probe selection); "
     "candidate fetch is a broadcast equi-join on list_id with dynamic "
     "partition pruning on the persisted invlist store"),
    ("ivf_compact_probe_parity",
     "post-compaction probe: the folded lists store answers through the "
     "same broadcast equi-join + partition-pruned scan as the seed "
     "index — the delta fold is invisible to the plan shape as well as "
     "to results"),
    ("decontaminate",
     "gate-before-shuffle: the training gram stream meets the broadcast "
     "benchmark grams in a map-side LeftSemi BEFORE the per-doc "
     "distinct, so only contaminated grams ever reach an Exchange — "
     "the corpus-sized gram table is never shuffled or persisted"),
    ("allpairs_jaccard_join",
     "exact all-pairs: prefix-token equi join with length + positional "
     "filters IN the join condition — candidates pruned before the "
     "distinct and the array-verify, no cartesian anywhere"),
    ("ann_filtered_topk",
     "filtered vector search: the metadata predicate (vec_id % 3 = 0) "
     "lands in the SAME probed-lists scan as the probe's list_id "
     "partition prune — PushedFilters carries the predicate, "
     "PartitionFilters carries the probe, candidates die at the "
     "parquet reader before any cosine is computed"),
    ("maxsim_rerank_ivf",
     "two-stage late interaction: candidate docs come from the "
     "partition-pruned rep-index scan (single-vector first stage); "
     "only candidate token pairs reach the MaxSim max/sum aggregation "
     "tree — equi joins throughout, no token cross product"),
    ("bm25_compact_probe_only",
     "the FOLDED lexical store's steady state: the postings scan "
     "prunes to the query terms' buckets (PartitionFilters) with the "
     "term IN-list pushed down, ONE stats row, no delta-tree union "
     "anywhere in the plan — the fold restored the build-once shape"),
    ("kmv_overlap_probe_only",
     "sketch-only set operations: every input scan reads the persisted "
     "O(sources x k) sketch store — documents.parquet appears NOWHERE "
     "in the plan; the only joins are the bounded source-pair frame "
     "and per-pair window bottom-k with group limits"),
]

MARKERS = [
    ("PushedFilters: \\[[^\\]]*[A-Za-z][^\\]]*\\]", "filter pushdown"),
    ("PartitionFilters: \\[[^\\]]*[A-Za-z][^\\]]*\\]", "partition pruning"),
    ("BroadcastHashJoin", "broadcast hash join"),
    ("SortMergeJoin", "sort-merge join"),
    ("TakeOrderedAndProject", "distributed top-k"),
    ("CartesianProduct", "!! cartesian product"),
    ("BroadcastNestedLoopJoin", "!! nested-loop join"),
    ("BatchEvalPython", "!! row-at-a-time Python"),
    ("ArrowEvalPython", "pandas UDF"),
]


def main() -> None:
    from variant_load_pipeline_spark import queries as Q
    from variant_load_pipeline_spark.session import get_spark

    spark = get_spark()
    reg = Q.registry()
    lines = [
        "# PLANS — physical-plan evidence, one query per operator family",
        "",
        "Generated by `tools/gen_plans.py` (formatted explain at sf0.01).",
        "Markers summarize what each plan proves; `!!` markers never appear",
        "outside the documented exact-baseline allowlist "
        "(tests/test_plan_audit.py).",
        "",
    ]
    for name, why in SHOWCASE:
        df = reg[name].spark_fn(spark, SF)
        plan = spark._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        found = []
        for pat, label in MARKERS:
            n = len(re.findall(pat, plan))
            if n:
                found.append(f"{label} x{n}")
        # keep the operator tree head (before the per-node detail section)
        tree = plan.split("\n\n")[0]
        # cap very long trees
        tl = tree.splitlines()
        if len(tl) > 60:
            tree = "\n".join(tl[:60]) + f"\n... ({len(tl) - 60} more lines)"
        lines += [
            f"## {name}",
            "",
            f"*{why}*",
            "",
            f"Markers: {', '.join(found) if found else '(none)'}",
            "",
            "```",
            tree,
            "```",
            "",
        ]
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}: {len(SHOWCASE)} plans")


if __name__ == "__main__":
    main()
