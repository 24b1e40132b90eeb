"""Dump .explain("formatted") plans for bench/registry queries to files.

Usage: python scripts/dump_plans.py <out_dir> <suffix> [sf_dir] [names...]

Writes <out_dir>/<name>_<suffix>.txt per query. Names resolve first in the
bench headline/extra registries (per-operator functions, what bench.py
times), then in the driver registry (__spark_entry__.queries()).
Optimization-round deliverable: plans/r14/<query>_before|after.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.1"
    names = [a for a in rest if not os.path.isdir(a)]

    from flinkrealtimedatawarehouse_spark.session import get_spark
    from flinkrealtimedatawarehouse_spark.benchqueries import pipeline, tpch, warehouse as wh
    import __spark_entry__ as entry_mod
    import bench

    fns = dict(bench._headline())
    fns.update({
        "tpch7_trade": tpch.q_tpch7, "tpch9_profit": tpch.q_tpch9,
        "tpch18_bigqty": tpch.q_tpch18, "tpch21_waiting": tpch.q_tpch21,
        "tpch2_mincost": tpch.q_tpch2, "tpch11_important": tpch.q_tpch11,
        "tpch20_potential": tpch.q_tpch20, "tpch17_smallqty": tpch.q_tpch17,
        "tpch16_supplier_cnt": tpch.q_tpch16, "tpch4_semijoin": tpch.q_tpch4,
        "dp15s_span_dedup": pipeline.q_span_dedup,
        "dp25_bm25": pipeline.q_bm25_batch,
        "a8f_funnel": wh.q_a8f, "a8t_retention": wh.q_a8t,
    })
    registry = entry_mod.queries()

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    for name in names or sorted(fns):
        fn = fns.get(name) or registry.get(name)
        if fn is None:
            print(f"{name}: not found", file=sys.stderr)
            continue
        df = fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
