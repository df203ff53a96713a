"""Dump `.explain("formatted")` for registry queries to plans/r13/<name>_<tag>.txt.

Usage:  PYTHONPATH=/root/repo python tools/dump_plan.py before q1 q2 ...
        (first arg = tag: "before" or "after"; --sf DIR optional)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    tag = args.pop(0)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            i += 1
            sf_dir = args[i]
        else:
            names.append(args[i])
        i += 1

    from variant_load_pipeline_spark import queries as Q
    from variant_load_pipeline_spark.session import get_spark

    spark = get_spark(app_name="vlp-dump-plan")
    reg = Q.registry()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = reg[name].spark_fn(spark, sf_dir)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_exch = txt.count("Exchange")
        print(f"{name}: wrote {path} ({n_exch} Exchange mentions)")


if __name__ == "__main__":
    main()
