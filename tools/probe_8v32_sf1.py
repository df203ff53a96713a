"""8-vs-32-core scaling probe at the 10x scale (VERDICT r13 #7).

The driver's 8v32 ratios at sf0.1 were all ~1 or below because every
query is <7 s there — job-scheduling and fixed overheads dominate and
extra threads only add coordination cost.  This probe re-asks the
question where it is meaningful: at the 10x replica (/tmp/vlp_sf1,
tools/make_sfx.py) on the shuffle-heavy shapes VERDICT named —
interval join, LSH banding, keeplist window chain.

One process per core count (the master is baked into the session), same
session profile as the bench (get_spark reads SPARK_GRAFT_CPUS; 4 MiB
input splits in local mode, shuffle.partitions = cpus), noop sink,
eager-construct queries timed through construction, median of R.

Usage:
    python tools/make_sfx.py --replicas 10 --out /tmp/vlp_sf1
    SPARK_GRAFT_CPUS=32 python tools/probe_8v32_sf1.py [--repeats N] [q ...]
    SPARK_GRAFT_CPUS=8  python tools/probe_8v32_sf1.py [--repeats N] [q ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/vlp_sf1")

DEFAULT_QUERIES = [
    "j1_interval_overlap",     # binned interval equi-join
    "near_dup_pairs",          # shingle scan + LSH band self-join
    "corpus_dedup_keeplist",   # fp window + LSH + components chain
]


def main() -> None:
    repeats = 3
    args = sys.argv[1:]
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    names = [a for a in args if not a.startswith("-")] or DEFAULT_QUERIES

    from bench import EAGER_CONSTRUCT
    from variant_load_pipeline_spark import queries as Q
    from variant_load_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count())
    spark = get_spark(app_name=f"vlp-probe-{cpus}c")
    reg = Q.registry()

    # warm-up at the probe scale (JVM, codegen, parquet footers)
    spark.sparkContext.setJobDescription("warmup")
    reg["q6_forecast_revenue"].spark_fn(spark, SF1).write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for name in names:
        runs = []
        for r in range(repeats):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} {cpus}c rep{r}")
            if name in EAGER_CONSTRUCT:
                t0 = time.time()
                df = reg[name].spark_fn(spark, SF1)
            else:
                df = reg[name].spark_fn(spark, SF1)
                t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 2))
            print(f"{name} @{cpus}c rep{r}: {runs[-1]}s", flush=True)
        out[name] = statistics.median(runs)
        print(f"{name} @{cpus}c: median={out[name]:.2f} runs={runs}", flush=True)
    print({"cpus": cpus, "sf": "10x", "medians": out})


if __name__ == "__main__":
    main()
