"""Dump `.explain("formatted")` for registry queries to
plans/$SPARK_GRAFT_PLAN_DIR/<name>_<tag>.txt (default r14).

Usage:  PYTHONPATH=/root/repo python tools/dump_plan.py before q1 q2 ...
        (first arg = tag: "before" or "after"; --sf DIR optional)

--ckpt additionally intercepts every DataFrame.localCheckpoint() made
while constructing each query and writes the PRE-checkpoint plan to
<name>_ckpt<N>_<tag>.txt: checkpoint-truncated queries hide their real
work from the final plan (the checkpointed subtree executes at
construction), so this is where replicated-subtree evidence lives.
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
    want_ckpt = False
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            i += 1
            sf_dir = args[i]
        elif args[i] == "--ckpt":
            want_ckpt = True
        else:
            names.append(args[i])
        i += 1

    from variant_load_pipeline_spark import queries as Q
    from variant_load_pipeline_spark.session import get_spark

    spark = get_spark(app_name="vlp-dump-plan")
    reg = Q.registry()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_DIR", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)

    def fmt(df) -> str:
        return spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    # Spark 4: the concrete class (whose localCheckpoint the queries
    # resolve) lives in pyspark.sql.classic; the pyspark.sql.dataframe
    # name is the abstract base and patching it is a no-op
    try:
        from pyspark.sql.classic import dataframe as _dfmod
    except ImportError:  # Spark 3.x fallback
        from pyspark.sql import dataframe as _dfmod

    orig_ckpt = _dfmod.DataFrame.localCheckpoint
    for name in names:
        state = {"n": 0}
        if want_ckpt:
            def patched(self, eager=True, _name=name, _state=state):
                p = os.path.join(
                    out_dir, f"{_name}_ckpt{_state['n']}_{tag}.txt"
                )
                with open(p, "w") as f:
                    f.write(fmt(self))
                print(f"  {_name}: checkpoint #{_state['n']} plan -> {p}")
                _state["n"] += 1
                return orig_ckpt(self, eager)

            _dfmod.DataFrame.localCheckpoint = patched
        try:
            df = reg[name].spark_fn(spark, sf_dir)
        finally:
            _dfmod.DataFrame.localCheckpoint = orig_ckpt
        txt = fmt(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_exch = txt.count("Exchange")
        print(f"{name}: wrote {path} ({n_exch} Exchange mentions)")


if __name__ == "__main__":
    main()
